"""Benchmark harness (SURVEY.md N20): classified IQ samples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "backend",
"fallback"} where vs_baseline is measured-value / 1e9 (the BASELINE.json:5
target of 1 GS/s classified IQ per v5e chip) and "backend" names the code
path actually measured (no silent substitution — if the requested backend
fails, the fallback is stamped with fallback=true and the error goes to
stderr). Run on the real chip:  python bench.py [backend|stream]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

TARGET_SAMPLES_PER_SEC = 1.0e9  # BASELINE.json:5

# Verified code paths, fastest-first preference for the headline number.
# (pallas_bf16_v4 exists but is excluded: its Mosaic compile exceeds 9 min
# through this platform's remote compiler — select it explicitly to retry.)
BACKENDS = ("pallas_int8_v10", "pallas_int8_v7", "pallas_int8_v9",
            "pallas_int8_v6", "pallas_int8_v4", "pallas_int8_v3",
            "pallas_int8", "pallas_bf16", "xla_bf16", "xla_int8")


def make_classifier(cfg, backend: str, batch: int):
    """(jitted argmax classifier, input batch) for a named backend.

    Weights are random-initialized (+PTQ for int8 paths) — throughput is
    weight-value-independent; accuracy is judged separately (eval/harness).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    frame_len = cfg.data.frame_len
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, 2, frame_len)).astype(np.float32)
    )

    if backend.startswith("xla_bf16"):
        from modulationdetectioncnn_tpu.models import VTCNN2

        model = VTCNN2.from_config(cfg.model)
        params = model.init(
            jax.random.key(0), jnp.zeros((2, 2, frame_len), jnp.float32)
        )
        classify = jax.jit(lambda xb: model.apply(params, xb).argmax(-1))
        return classify, (x,)

    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.quant import quantize

    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, frame_len)))
    if backend == "pallas_bf16_v4":
        from modulationdetectioncnn_tpu.ops.infer import make_bf16_classifier_v4

        return make_bf16_classifier_v4(params), (x,)
    if backend == "pallas_bf16":
        from modulationdetectioncnn_tpu.ops.infer import make_bf16_forward_v2

        fwd = make_bf16_forward_v2(params)
    else:
        calib = rng.standard_normal((256, 2, frame_len)).astype(np.float32)
        qm = quantize(model, params, calib)
        if backend in ("pallas_int8_v3", "pallas_int8_v4", "pallas_int8_v5",
                       "pallas_int8_v6", "pallas_int8_v7", "pallas_int8_v9",
                       "pallas_int8_v10"):
            from modulationdetectioncnn_tpu.ops import infer as _inf

            make = {"pallas_int8_v3": _inf.make_int8_classifier_v3,
                    "pallas_int8_v4": _inf.make_int8_classifier_v4,
                    "pallas_int8_v5": _inf.make_int8_classifier_v5,
                    "pallas_int8_v6": _inf.make_int8_classifier_v6,
                    "pallas_int8_v7": _inf.make_int8_classifier_v7,
                    "pallas_int8_v9": _inf.make_int8_classifier_v9,
                    "pallas_int8_v10": _inf.make_int8_classifier_v10}[backend]
            return make(qm), (x,)  # emits labels directly
        if backend == "xla_int8":
            from modulationdetectioncnn_tpu.ops.infer_xla import (
                make_int8_forward_xla,
            )

            fwd = make_int8_forward_xla(qm)
        elif backend == "pallas_int8":
            from modulationdetectioncnn_tpu.ops.infer import make_int8_forward_v2

            fwd = make_int8_forward_v2(qm)
        else:
            raise ValueError(f"unknown bench backend {backend!r}")

    @jax.jit
    def classify(xb):
        return jnp.argmax(fwd(xb), axis=-1)

    return classify, (x,)


def _measure(fwd, args, bc, frame_len):
    """Chained in-program timing (utils/timing.py): each iteration's input
    carries a data dependency on the previous iteration's output, so the
    number is immune to cross-dispatch overlap in the runtime (observed on
    this tunneled platform: unchained back-to-back dispatches can read up
    to ~2x faster than physically possible — honesty beats flattery)."""
    import jax
    import jax.numpy as jnp

    from modulationdetectioncnn_tpu.utils.timing import (
        measure_per_iter_chained_samples,
    )

    (x0,) = args if len(args) == 1 else (args[-1],)
    fixed = args[:-1]

    def body(xc):
        out = fwd(*fixed, xc)
        probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
        return xc + probe * jnp.float32(1e-38)

    # 5 repeats (not the default 3): the tunnel occasionally yields a wildly
    # low (T2-T1) pair (observed 375 us for a 1170 us kernel, 2026-08-21) —
    # a 5-sample median survives two glitched samples.
    samples = sorted(measure_per_iter_chained_samples(
        body, x0, n1=bc.warmup_iters, n2=bc.warmup_iters + bc.timed_iters,
        repeats=5,
    ))
    # Headline = MEDIAN timing sample (VERDICT r3 weak #5 / next #7): the
    # defensible round-over-round number. The min (least-perturbed sample)
    # stays in the stderr spread.
    sec_per_iter = samples[len(samples) // 2]
    frames_per_sec = bc.batch_size / sec_per_iter
    return frames_per_sec, frames_per_sec * frame_len, {
        "samples_per_sec_min": round(bc.batch_size * frame_len / samples[0]),
        "timing_samples_us": [round(s * 1e6, 1) for s in samples],
    }


def run(cfg=None, quiet: bool = False, backend: str | None = None,
        fallback_from: str | None = None) -> dict:
    import jax

    from modulationdetectioncnn_tpu.config import AmcConfig

    cfg = cfg or AmcConfig()
    bc = cfg.bench
    backend = backend or bc.backend

    # Start the one-time transfer-channel init now so it overlaps compiles
    # (see utils/device.py; harmless no-op on direct-attached TPUs).
    from modulationdetectioncnn_tpu.utils.device import warm_transfer_async

    warm_transfer_async()

    if bc.mode == "stream":
        # Pass the RESOLVED backend so a failing stream backend falls back
        # to a different code path instead of re-running itself (ADVICE r2 #2).
        return run_stream_bench(cfg, quiet=quiet, backend=backend)

    # Per-session kernel calibration (VERDICT r4 next #7): short interleaved
    # A/B across the candidate kernels in THIS session's tunnel phase; the
    # winner becomes the headline. Skipped for explicit backend requests
    # and fallback reruns.
    # Each candidate gets the FULL 5-repeat median measurement (a short
    # 3-pair pre-screen measured v10 at 645.8 us in a session where its
    # true median was 1159.7 — quick pairs glitch too often to pick a
    # winner by); the winner's own measurement IS the headline, so
    # calibration adds compiles but no re-measurement.
    measured: dict[str, tuple] = {}
    if (fallback_from is None and backend == bc.backend
            and getattr(bc, "calibrate", False)
            and backend in getattr(bc, "calibration_candidates", ())
            and len(bc.calibration_candidates) > 1):
        for cand in bc.calibration_candidates:
            try:
                fwd_c, args_c = make_classifier(cfg, cand, bc.batch_size)
                measured[cand] = _measure(fwd_c, args_c, bc,
                                          cfg.data.frame_len)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"calibration_skip": cand,
                                  "error": repr(e)[:160]}), file=sys.stderr)
        if measured:
            backend = max(measured, key=lambda k: measured[k][1])
            print(json.dumps({
                "kernel_calibration": {
                    k: v[2]["timing_samples_us"][len(v[2]["timing_samples_us"]) // 2]
                    for k, v in measured.items()},
                "winner": backend}), file=sys.stderr)

    if backend in measured:
        frames_per_sec, samples_per_sec, spread = measured[backend]
    else:
        fwd, args = make_classifier(cfg, backend, bc.batch_size)
        frames_per_sec, samples_per_sec, spread = _measure(
            fwd, args, bc, cfg.data.frame_len)
    result = {
        "metric": "classified_iq_samples_per_sec_per_chip",
        "value": round(samples_per_sec),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / TARGET_SAMPLES_PER_SEC, 4),
        "backend": backend,
        "fallback": fallback_from is not None,
    }
    if fallback_from:
        result["fallback_from"] = fallback_from
    if not quiet:
        print(json.dumps(result))
        from modulationdetectioncnn_tpu.utils.profiler import roofline

        extra = {
            "backend": backend,
            "batch": bc.batch_size,
            "frames_per_sec": round(frames_per_sec),
            "device": str(jax.devices()[0]),
            **roofline(samples_per_sec).as_dict(),
            **spread,
        }
        if fallback_from:
            extra["fallback_from"] = fallback_from
        print(json.dumps(extra), file=sys.stderr)
    return result


def run_stream_bench(cfg, quiet: bool = False,
                     backend: str | None = None) -> dict:
    """Config-4 number: the FULL chain (channelize -> normalize -> frame ->
    int8 CNN) on continuous wideband IQ, samples/s/chip, chained timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from modulationdetectioncnn_tpu.dsp import pipeline
    from modulationdetectioncnn_tpu.golden.dsp import design_prototype
    from modulationdetectioncnn_tpu.utils.timing import (
        measure_per_iter_chained_samples,
    )

    backend = backend or cfg.bench.backend
    sc = cfg.stream
    m = sc.num_subbands
    assert sc.frame_len == cfg.data.frame_len, (
        "stream.frame_len must match the CNN input length (data.frame_len)"
    )
    # Size the wideband block so the CNN sees ~bench.batch_size frames/iter.
    t_len = cfg.bench.batch_size * sc.frame_len  # total samples/iter
    align = m * sc.frame_hop * max(sc.resample_down, 1)
    t_len = (t_len // align) * align
    h = design_prototype(m, sc.taps_per_branch)
    hj = jnp.asarray(np.asarray(h, np.float32))
    n_frames = pipeline.total_frames(sc, t_len) * m
    classify, _ = make_classifier(cfg, backend, cfg.bench.batch_size)

    @jax.jit
    def chain(xiq):
        fr = pipeline.subband_frames(xiq, hj, sc)  # (M, F, 2, frame_len)
        mm, ff = fr.shape[0], fr.shape[1]
        labels = classify(fr.reshape(mm * ff, 2, fr.shape[-1]))
        return labels

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, t_len)).astype(np.float32))

    def body(xc):
        labels = chain(xc)
        probe = labels.ravel()[0].astype(jnp.float32)
        return xc + probe * jnp.float32(1e-38)

    # Median of 5 pairs, same methodology as the cnn-mode headline: a
    # single glitched pair once read the stream chain at 942 MS/s when the
    # CNN alone runs 1077 us/iter — physically impossible, median-proof.
    samples = sorted(measure_per_iter_chained_samples(
        body, x0, n1=cfg.bench.warmup_iters,
        n2=cfg.bench.warmup_iters + cfg.bench.timed_iters, repeats=5,
    ))
    sec = samples[len(samples) // 2]
    samples_per_sec = t_len / sec
    result = {
        "metric": "streamed_iq_samples_per_sec_per_chip",
        "value": round(samples_per_sec),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / TARGET_SAMPLES_PER_SEC, 4),
        "backend": backend,
        "fallback": False,
    }
    if not quiet:
        print(json.dumps(result))
        extra = {
            "mode": "stream", "subbands": m, "block_samples": t_len,
            "frames_per_iter": n_frames, "backend": backend,
        }
        print(json.dumps(extra), file=sys.stderr)
    return result


if __name__ == "__main__":
    from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides

    cfg = AmcConfig()
    overrides = []
    for arg in sys.argv[1:]:
        if arg == "stream":
            overrides.append("bench.mode=stream")
        elif "=" in arg:
            overrides.append(arg)
        else:
            overrides.append(f"bench.backend={arg}")
    cfg = apply_overrides(cfg, overrides)
    try:
        run(cfg)
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        # The tunneled remote Mosaic compiler occasionally drops a request
        # ("response body closed before all bytes were read" — observed
        # 2026-08-21 on a kernel that compiles fine on retry). One transient
        # failure must not turn the headline into the bf16 fallback: retry
        # the REQUESTED backend once before falling back.
        try:
            print(json.dumps({"transient_retry_after": repr(e)[:200]}),
                  file=sys.stderr)
            run(cfg)
        except Exception as e2:  # noqa: BLE001
            traceback.print_exc()
            # Never substitute silently: report the error, then measure the
            # XLA bf16 path with fallback stamped.
            if cfg.bench.backend != "xla_bf16":
                print(
                    json.dumps({"fallback_error": repr(e2),
                                "failed_backend": cfg.bench.backend}),
                    file=sys.stderr,
                )
                run(cfg, backend="xla_bf16", fallback_from=cfg.bench.backend)
            else:
                raise
    # The judged metric is "IQ samples/s classified" and the product is the
    # streaming chain, so every recorded bench also carries the config-4
    # stream number (stderr; the contract stdout line stays cnn-mode).
    # Wall-clock-boxed: the stream chain's Mosaic/XLA compile through the
    # tunneled platform can exceed several minutes; the contract line is
    # already on stdout, so a slow compile must never turn a good headline
    # run into a timeout. SIGALRM only fires here, after the headline.
    if cfg.bench.mode != "stream" and cfg.bench.stream_extra:
        import signal

        budget = int(os.environ.get("BENCH_STREAM_EXTRA_BUDGET_S", "420"))

        def _timeout(signum, frame):
            raise TimeoutError(f"stream_extra exceeded {budget}s budget")

        old = signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(budget)
        try:
            sres = run_stream_bench(cfg, quiet=True)
            sres["mode"] = "stream_extra"
            print(json.dumps(sres), file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stream_extra_error": repr(e)}),
                  file=sys.stderr)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
