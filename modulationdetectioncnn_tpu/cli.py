"""CLI entry points (SURVEY.md T5): train / eval / stream / bench.

Replaces the reference's host feeder demo app (SURVEY.md §2a L4 [ARCHETYPE]).
Usage:  python -m modulationdetectioncnn_tpu <cmd> [key=value ...]
e.g.    python -m modulationdetectioncnn_tpu train train.num_steps=500 \
            data.classes=BPSK,QPSK model.num_classes=2
"""
from __future__ import annotations

import json
import logging
import sys

import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)
log = logging.getLogger("amc")


def _build_dataset(cfg: AmcConfig, snrs=None):
    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.data.radioml import load_dataset

    if snrs is not None:
        x, y, s = synthetic.make_dataset(cfg.data, snrs=snrs)
        classes = cfg.data.classes
    else:
        x, y, s, classes = load_dataset(cfg.data)
    return x, y, s, classes


def cmd_train(cfg: AmcConfig, snrs=None):
    from modulationdetectioncnn_tpu.data.synthetic import train_test_split
    from modulationdetectioncnn_tpu.train import loop

    x, y, s, classes = _build_dataset(cfg, snrs)
    log.info("dataset: %s frames, %d classes", x.shape, len(classes))
    (xtr, ytr, _), (xte, yte, ste) = train_test_split(x, y, s, test_frac=0.2)
    params, history = loop.train(cfg, (xtr, ytr), (xte, yte))
    return params, history, (xte, yte, ste), classes


def cmd_eval(cfg: AmcConfig, out_path: str = "results.json"):
    import jax.numpy as jnp

    from modulationdetectioncnn_tpu.eval import harness
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.loop import make_eval_step
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    if not cfg.train.checkpoint_dir:
        raise SystemExit("eval requires train.checkpoint_dir=<dir> with a checkpoint")
    mgr = ckpt.make_manager(cfg.train.checkpoint_dir)
    restored = ckpt.restore(mgr)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {cfg.train.checkpoint_dir}")
    params, _, step = restored
    log.info("restored checkpoint step %d", step)
    x, y, s, classes = _build_dataset(cfg)
    model = VTCNN2.from_config(cfg.model)
    eval_step = make_eval_step(model)
    result = harness.snr_sweep(
        lambda xb: eval_step(params, jnp.asarray(xb)), x, y, s, classes
    )
    harness.save_results(result, out_path)
    print(harness.format_curve(result))
    print(json.dumps(result["headline"]))
    return result


def cmd_stream(cfg: AmcConfig):
    from modulationdetectioncnn_tpu.dsp import pipeline

    return pipeline.run_stream_demo(cfg)


def cmd_bench(cfg: AmcConfig):
    import bench as bench_mod  # repo-root bench.py is the canonical harness

    return bench_mod.run(cfg)


def main(argv: list[str] | None = None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, *overrides = argv
    if cmd not in ("train", "eval", "stream", "bench"):
        raise SystemExit(f"unknown command {cmd!r}; use train/eval/stream/bench")
    try:
        cfg = apply_overrides(AmcConfig(), [o for o in overrides if "=" in o])
    except (KeyError, ValueError, TypeError) as e:
        raise SystemExit(f"bad override: {e}") from e
    from modulationdetectioncnn_tpu.utils.device import warm_transfer_async

    warm_transfer_async()
    if cmd == "train":
        cmd_train(cfg)
    elif cmd == "eval":
        cmd_eval(cfg)
    elif cmd == "stream":
        cmd_stream(cfg)
    elif cmd == "bench":
        cmd_bench(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
