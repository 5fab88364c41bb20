"""Per-stage bench breakdown artifact (VERDICT r2 next #1c).

Measures, on the real chip with chained timing, every stage of the headline
int8 path and writes artifacts/bench_r4.json with each stage's share and
%-of-measured-ceiling so the verdict can see where the remaining time goes.
The ceiling is the MEASURED int8 dot rate from artifacts/bench_r2.json
(460.6 TOPS at 2048^3 on this chip), not the nominal spec
(VERDICT r2 weak #1).

Usage: python scripts/bench_breakdown.py [out.json]
"""
from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

MEASURED_INT8_TOPS = 460.6e12   # artifacts/bench_r2.json kernel_ceilings
BATCH = 4096
T_IN = 128

# Padded MACs/frame. v9 (conv2 N=256 lane-offset packing) meets the r3
# verdict's padded_macs <= 22.5M gate at 21.5M — but under the r4
# fixed-point requantize spec the HEADLINE is v7 (N=384, no rolls,
# 29.9M padded): interleaved head-to-head (probe r4l) shows v7 faster by
# 3-7% because the padding was never the binder once requantize went
# integer. Both accountings are recorded below.
CONV_MACS_V9 = T_IN * (8 + 2 * 128) * 512
DENSE_MACS = T_IN * 128 * 256 + 256 * 128
CONV_MACS_V7 = T_IN * (8 + 3 * 128) * 512
PADDED_V9 = CONV_MACS_V9 + DENSE_MACS
PADDED_V7 = CONV_MACS_V7 + DENSE_MACS
USEFUL_MACS = 126 * 6 * 256 + 124 * 1536 * 80 + 9920 * 256 + 256 * 11


def _chain(fn, x0, honest_sum: bool = False):
    jfn = jax.jit(fn)

    def body(xc):
        out = jfn(xc)
        if honest_sum:
            # full-output reduction defeats XLA slice-DCE on pure-XLA stages
            probe = jnp.sum(out.astype(jnp.float32) * jnp.float32(1e-30))
            return xc + (probe * jnp.float32(1e-8)).astype(xc.dtype)
        probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
        return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)

    pilot = measure_per_iter_chained(body, x0, n1=4, n2=16)
    delta = max(32, min(2000, int(0.06 / max(pilot, 1e-6))))
    # 3-sample median (r5 methodology: single chained pairs glitch up to
    # 3x low on this tunnel — sol_audit_r5.json methodology_note).
    samples = sorted(
        measure_per_iter_chained(body, x0, n1=8, n2=8 + delta)
        for _ in range(3)
    )
    return samples[1]


def main(out_path: str = "/root/repo/artifacts/bench_r4.json") -> None:
    from modulationdetectioncnn_tpu.config import AmcConfig
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.train.quant import quantize

    warm_transfer_async().wait(timeout=900)
    rng = np.random.default_rng(0)
    cfg = AmcConfig()
    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, T_IN)))
    calib = rng.standard_normal((256, 2, T_IN)).astype(np.float32)
    qm = quantize(model, params, calib)
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))

    stages: dict[str, dict] = {}

    def record(name, sec, padded_macs_per_frame=None, note=None):
        entry: dict = {
            "us_per_iter": round(sec * 1e6, 1),
            "samples_per_sec": round(BATCH * T_IN / sec),
        }
        if padded_macs_per_frame:
            tops = 2 * padded_macs_per_frame * BATCH / sec
            entry["padded_tops"] = round(tops / 1e12, 1)
            entry["pct_of_measured_int8_ceiling"] = round(
                100 * tops / MEASURED_INT8_TOPS, 1)
        if note:
            entry["note"] = note
        stages[name] = entry
        print(name, json.dumps(entry), flush=True)
        return sec

    # ---- headline kernel (v7 under the fixed-point requantize spec;
    # probe r4l) and the v9 padding-cut reference, then the v9 stage split
    classify7 = infer.make_int8_classifier_v7(qm)
    record("v7_full_headline", _chain(classify7, x0), PADDED_V7)
    classify9 = infer.make_int8_classifier_v9(qm)
    sec_full = record("v9_full_reference", _chain(classify9, x0), PADDED_V9)

    c2 = qm.m2.shape[0]
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2r = infer.pack_conv2_weights_lane256(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    inv_sx = float(1.0 / qm.s_x)

    def _spec(a):
        s = np.asarray(a).shape
        return pl.BlockSpec(
            s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))

    w1f = infer.expand_conv1_weights_v9f(qm)
    conv9_consts = [jnp.asarray(w1f).astype(jnp.bfloat16),
                    jnp.asarray(w2r), jnp.asarray(m2p), jnp.asarray(o2p)]

    def conv9(x):
        return pl.pallas_call(
            functools.partial(infer._conv_stage_int8_v9_kernel, chunk=16,
                              co=c2, inv_sx=inv_sx),
            grid=(BATCH // 64,),
            in_specs=[pl.BlockSpec((64, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(a) for a in conv9_consts],
            out_specs=pl.BlockSpec((64, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *conv9_consts)

    sec_conv = record(
        "conv_stage_v9", _chain(conv9, x0), CONV_MACS_V9,
        note="in-kernel quantize + bf16-folded conv1 rq + N=256 conv2 "
             "with lane-roll shift-add")

    w3p = infer.pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN)
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (w3p, qm.m3, qm.o3, w4, s4, b4)]
    h0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T_IN * 128), np.int32).astype(np.int8))

    def dense(hb):
        return pl.pallas_call(
            functools.partial(infer._dense_argmax_int8_kernel, nc=11),
            grid=(BATCH // 512,),
            in_specs=[pl.BlockSpec((512, T_IN * 128), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((512, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense_consts)

    sec_dense = record("dense_argmax_stage", _chain(dense, h0), DENSE_MACS)

    glue = sec_full - sec_conv - sec_dense
    record("reshape_glue_residual", max(glue, 0.0),
           note="(B,128,128)->(B,16384) reshape + inter-kernel HBM + "
                "dispatch glue (neither kernel has a separate prologue: "
                "quantize + tap build live in the conv kernel)")

    out = {
        "date": "2026-08-21",
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "measured_int8_ceiling_tops": MEASURED_INT8_TOPS / 1e12,
        "padded_macs_per_frame_headline_v7": PADDED_V7,
        "padded_macs_per_frame_v9": PADDED_V9,
        "useful_macs_per_frame": USEFUL_MACS,
        "padding_overhead_x_headline_v7": round(PADDED_V7 / USEFUL_MACS, 3),
        "padding_overhead_x_v9": round(PADDED_V9 / USEFUL_MACS, 3),
        "note": ("v9 satisfies the r3 verdict's <=22.5M padded-MAC gate "
                 "(21.5M) but v7 is FASTER under the fixed-point requantize "
                 "spec (probe r4l head-to-head) — padding was not the "
                 "binder; per-dot fixed costs + VPU passes are."),
        "stages": stages,
        "stage_shares_of_full": {
            "conv_incl_prologue": round(sec_conv / sec_full, 3),
            "dense": round(sec_dense / sec_full, 3),
            "glue": round(max(glue, 0.0) / sec_full, 3),
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
