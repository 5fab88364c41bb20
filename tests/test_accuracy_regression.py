"""Fixed-seed accuracy regression (SURVEY.md §4b "accuracy regression").

A budgeted 2-class train on the v3 generator must reach the high-SNR gate —
catches silent breakage of the generator/model/training-loop composition
(the full 11-class curve is proven on-chip by scripts/train_eval_full.py and
recorded in artifacts/summary_rml11.json; this is the CI-sized canary).
"""
import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides
from modulationdetectioncnn_tpu.data import synthetic
from modulationdetectioncnn_tpu.train import loop


def test_two_class_budgeted_training_reaches_gate():
    cfg = apply_overrides(AmcConfig(), [
        "data.classes=BPSK,QPSK",
        "model.num_classes=2",
        "data.frames_per_class_per_snr=100",
        "data.snr_db_min=10", "data.snr_db_max=18", "data.snr_db_step=4",
        "train.num_steps=120", "train.batch_size=128",
        "train.eval_every=120",
    ])
    x, y, s = synthetic.make_dataset(cfg.data)
    (xtr, ytr, _), (xte, yte, _) = synthetic.train_test_split(x, y, s)
    params, history = loop.train(cfg, (xtr, ytr), (xte, yte))
    model_eval = loop.make_eval_step(
        __import__("modulationdetectioncnn_tpu.models",
                   fromlist=["VTCNN2"]).VTCNN2.from_config(cfg.model)
    )
    import jax.numpy as jnp

    preds = np.asarray(model_eval(params, jnp.asarray(xte[:512])))
    acc = float((preds == yte[:512]).mean())
    # Gate: well above chance on a 120-step budget (full runs reach ~0.95,
    # verify-skill drive); 0.85 leaves headroom for seed/platform jitter.
    assert acc >= 0.85, f"budgeted 2-class accuracy regressed: {acc:.3f}"
