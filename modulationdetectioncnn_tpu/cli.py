"""CLI entry points (SURVEY.md T5): train / eval / quantize / qat / stream /
bench / scaling.

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


def _restore_params(cfg: AmcConfig):
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    if not cfg.train.checkpoint_dir:
        raise SystemExit("this command requires train.checkpoint_dir=<dir>")
    mgr = ckpt.make_manager(cfg.train.checkpoint_dir)
    restored = ckpt.restore(mgr)
    if restored is None:
        # Close the manager's async machinery before exiting — otherwise
        # orbax's background threads die in interpreter teardown with a
        # spurious C++ 'terminate called' after the clean message.
        mgr.close()
        raise SystemExit(f"no checkpoint found in {cfg.train.checkpoint_dir}")
    params, _, step = restored
    log.info("restored checkpoint step %d", step)
    return params


def _make_predict_fn(cfg: AmcConfig, params=None):
    """Prediction backend per cfg.eval.backend (SURVEY.md N19: the harness is
    implementation-agnostic across flax/int8/golden)."""
    import jax
    import jax.numpy as jnp

    from modulationdetectioncnn_tpu.models import VTCNN2

    backend = cfg.eval.backend
    if backend == "flax":
        from modulationdetectioncnn_tpu.train.loop import make_eval_step

        model = VTCNN2.from_config(cfg.model)
        eval_step = make_eval_step(model)
        return lambda xb: eval_step(params, jnp.asarray(xb))
    if backend == "golden":
        from modulationdetectioncnn_tpu.golden import cnn as gcnn

        import numpy as np

        p = jax.tree.map(np.asarray, params)
        return lambda xb: gcnn.vtcnn2_predict(p, xb)
    if backend == "int8":
        from modulationdetectioncnn_tpu.ops.infer import make_int8_predict
        from modulationdetectioncnn_tpu.train.quant import QuantizedModel
        from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

        if not cfg.eval.int8_artifact:
            raise SystemExit("eval.backend=int8 requires eval.int8_artifact=<dir>")
        qm = QuantizedModel.from_tree(ckpt.load_tree(cfg.eval.int8_artifact))
        classify = make_int8_predict(qm, cfg.eval.int8_kernel)
        return lambda xb: classify(jnp.asarray(xb))
    raise SystemExit(f"unknown eval.backend {backend!r}; use flax/int8/golden")


def cmd_eval(cfg: AmcConfig):
    from modulationdetectioncnn_tpu.eval import harness

    params = _restore_params(cfg) if cfg.eval.backend != "int8" else None
    predict = _make_predict_fn(cfg, params)
    x, y, s, classes = _build_dataset(cfg)
    result = harness.snr_sweep(
        predict, x, y, s, classes, batch_size=cfg.eval.batch_size
    )
    harness.save_results(result, cfg.eval.results_path)
    print(harness.format_curve(result))
    print(json.dumps(result["headline"]))
    return result


def cmd_quantize(cfg: AmcConfig, out_dir: str | None = None):
    """PTQ: checkpoint -> int8 artifact + float-vs-int8 parity report."""
    import jax

    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.golden import quant as gq
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.quant import quantize
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    params = _restore_params(cfg)
    model = VTCNN2.from_config(cfg.model)
    calib_x, _, _ = synthetic.make_dataset(
        cfg.data,
        frames_per_class_per_snr=max(
            1, cfg.quant.calib_frames // (len(cfg.data.classes) * 3)
        ),
        snrs=[0, 10, 18],
        seed=cfg.data.seed + 99,
    )
    qm = quantize(model, params, calib_x, percentile=cfg.quant.act_percentile)
    out_dir = out_dir or (cfg.train.checkpoint_dir.rstrip("/") + "_int8")
    ckpt.save_tree(out_dir, qm.tree())
    # Parity check on a held-out slice (golden int8 vs float model).
    import numpy as np

    xs = calib_x[:1024]
    pred_q = gq.int8_predict(qm, xs)
    import jax.numpy as jnp

    pred_f = np.asarray(
        jax.jit(lambda xb: model.apply(params, xb).argmax(-1))(jnp.asarray(xs))
    )
    agree = float((pred_q == pred_f).mean())
    log.info("int8 artifact saved to %s; int8-vs-float agreement %.4f", out_dir, agree)
    print(json.dumps({"int8_artifact": out_dir, "agreement_vs_float": agree}))
    return out_dir, agree


def cmd_stream(cfg: AmcConfig):
    from modulationdetectioncnn_tpu.dsp import pipeline

    return pipeline.run_stream_demo(cfg)


def cmd_bench(cfg: AmcConfig):
    import bench as bench_mod  # repo-root bench.py is the canonical harness

    return bench_mod.run(cfg)


def cmd_scaling(cfg: AmcConfig):
    """Scaling-efficiency report: measured 1-chip rate + audited projection."""
    from modulationdetectioncnn_tpu.eval.scaling import scaling_report

    import bench as bench_mod

    rate = bench_mod.run(cfg, quiet=True)["value"]
    report = scaling_report(cfg, measured_chip_rate=float(rate))
    print(json.dumps(report, indent=1))
    return report


def cmd_qat(cfg: AmcConfig):
    """QAT fine-tune from the float checkpoint, then re-export int8."""
    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.train.qat import finetune_qat
    from modulationdetectioncnn_tpu.train.quant import calibrate_activations
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    params = _restore_params(cfg)
    model = VTCNN2.from_config(cfg.model)
    x, y, _, _ = _build_dataset(cfg)
    calib = x[:: max(1, len(x) // cfg.quant.calib_frames)]
    scales = calibrate_activations(
        model, params, calib, cfg.quant.act_percentile
    )
    tuned = finetune_qat(
        params, scales, x, y,
        num_steps=cfg.train.num_steps, batch_size=cfg.train.batch_size,
        learning_rate=cfg.train.learning_rate, seed=cfg.train.seed,
        dropout_rate=cfg.model.dropout_rate,
    )
    out_dir = cfg.train.checkpoint_dir.rstrip("/") + "_qat"
    mgr = ckpt.make_manager(out_dir)
    import optax

    ckpt.save(mgr, 0, tuned, optax.adam(1e-4).init(tuned))
    mgr.wait_until_finished()
    log.info("QAT-tuned checkpoint saved to %s", out_dir)
    print(json.dumps({"qat_checkpoint": out_dir}))
    return out_dir


def main(argv: list[str] | None = None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, *overrides = argv
    commands = ("train", "eval", "quantize", "qat", "stream", "bench", "scaling")
    if cmd not in commands:
        raise SystemExit(
            f"unknown command {cmd!r}; use {'/'.join(commands)}"
        )
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
    elif cmd == "quantize":
        cmd_quantize(cfg)
    elif cmd == "qat":
        cmd_qat(cfg)
    elif cmd == "stream":
        cmd_stream(cfg)
    elif cmd == "bench":
        cmd_bench(cfg)
    elif cmd == "scaling":
        cmd_scaling(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
