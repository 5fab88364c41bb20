"""Consolidated kernel/perf probe suite (replaces kbench{,2,2b,3,4,5,6}.py,
tail_probe.py, vpu_probe.py, hybrid_probe.py — VERDICT r1 hygiene #8).

Chained in-program timing throughout (utils/timing.py): every probe's
iteration input data-depends on the previous output through ONE scalar
probe-add (constant, probe-independent overhead — ADVICE r1 #1), so numbers
are immune to cross-dispatch overlap on the tunneled platform.

Probes (select by name; default runs the production breakdown):
  ceil       int8/bf16 dot ceilings at 2048^3 (contractive feedback,
             ADVICE r1 #3)
  stage      production int8 path breakdown: prologue / conv stage / dense
             stage / argmax / full forward
  conv       conv-stage layout hypotheses: conv2-only, current 240-lane
             shift-add, taps-on-N 128-padded, taps-on-K
  prologue   XLA quantize+expand variants: (B*t1,8) vs (B,8,t1) tap-planes
  dense      dense-stage variants: current, +fused argmax, multi-dim
             contraction ((t,c) x (t,c,n)) feasibility
  batch      full-forward batch-size sweep

Usage: python scripts/probe.py [probe ...]
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulationdetectioncnn_tpu.ops.cnn_kernels import requantize
from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

rng = np.random.default_rng(0)
BATCH = 4096
T_IN, C2 = 128, 80
T1, T2 = T_IN - 2, T_IN - 4
BB, CH = 64, 16


def report(name, sec, work=None, unit="TOPS", batch=BATCH):
    rate = f"  {work / sec / 1e12:7.2f} {unit}" if work else ""
    ns_per_frame = sec / batch * 1e9
    print(f"{name:46s} {sec*1e6:9.1f} us{rate}  {ns_per_frame:7.1f} ns/frame",
          flush=True)


def chain(name, fn, x0, work=None, n1=8, n2=40, unit="TOPS", batch=BATCH):
    """Time fn(x) with a constant-cost data-dependent carry (scalar probe)."""
    jfn = jax.jit(fn)

    def body(xc):
        out = jfn(xc)
        probe = jax.tree.leaves(out)[0].ravel()[0]
        if probe.dtype != xc.dtype:
            probe = probe.astype(jnp.float32)
            return (xc.astype(jnp.float32) + probe * 1e-38).astype(xc.dtype)
        return xc + probe * jnp.asarray(1e-38 if xc.dtype == jnp.float32
                                        else 0, xc.dtype)

    sec = measure_per_iter_chained(body, x0, n1=n1, n2=n2)
    report(name, sec, work, unit, batch)
    return sec


def _spec(a):
    s = np.asarray(a).shape
    return pl.BlockSpec(
        s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0))
    )


def _qm():
    from modulationdetectioncnn_tpu.config import AmcConfig
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.quant import quantize

    cfg = AmcConfig()
    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
    calib = rng.standard_normal((256, 2, 128)).astype(np.float32)
    return quantize(model, params, calib)


# --------------------------------------------------------------------- ceil
def probe_ceil():
    for dt, acc, down in [
        (jnp.int8, jnp.int32, lambda y: (y & 127).astype(jnp.int8)),
        # contractive feedback: values stay finite (ADVICE r1 #3)
        (jnp.bfloat16, jnp.float32,
         lambda y: (y * (1.0 / 2048.0)).astype(jnp.bfloat16)),
    ]:
        a0 = jnp.asarray(rng.integers(-100, 100, (2048, 2048))).astype(dt)
        b0 = jnp.asarray(rng.integers(-100, 100, (2048, 2048))).astype(dt)

        def body(c, b0=b0, acc=acc, down=down):
            y = jax.lax.dot_general(c, b0, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            return down(y)

        sec = measure_per_iter_chained(body, a0, n1=50, n2=250)
        kind = "TOP" if dt == jnp.int8 else "TFLOP"
        print(f"{dt.__name__} dot 2048^3 ceiling: "
              f"{2 * 2048**3 / sec / 1e12:.1f} {kind}/s", flush=True)


# -------------------------------------------------------------------- stage
def probe_stage():
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v2_kernel, _dense_stage_int8_kernel, expand_taps,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))

    def prologue(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        return expand_taps(x_i8, T1).reshape(x.shape[0] * T1, 8)

    chain("prologue quantize+expand (XLA)", prologue, x0)

    w1e = infer.expand_conv1_weights(qm.w1p)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, qm.w2p,
                                            qm.m2, qm.o2)]
    xe0 = jnp.asarray(rng.integers(-127, 127, (BATCH * T1, 8), np.int32)
                      .astype(np.int8))

    def conv_stage(xe):
        return pl.pallas_call(
            functools.partial(_conv_stage_int8_v2_kernel, chunk=CH, t1=T1,
                              c2=C2),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB * T1, 8), lambda i: (i, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((BB, T2, C2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T2, C2), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xe, *conv_consts)

    chain("conv stage (current v2)", conv_stage, xe0,
          work=2 * BATCH * T1 * (8 + 3 * C2) * 512)

    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]
    h0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T2 * C2), np.int32).astype(np.int8))

    def dense_stage(hb, dbb=256):
        return pl.pallas_call(
            _dense_stage_int8_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T2 * C2), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense_consts)

    chain("dense stage dbb=256", dense_stage, h0,
          work=2 * BATCH * (T2 * C2 * 256 + 256 * 128))
    chain("dense stage dbb=1024", functools.partial(dense_stage, dbb=1024),
          h0, work=2 * BATCH * (T2 * C2 * 256 + 256 * 128))

    l0 = jnp.asarray(rng.standard_normal((BATCH, 128)).astype(np.float32))
    chain("argmax (B,128) XLA", lambda v: jnp.argmax(v, axis=-1), l0)

    fwd = infer.make_int8_forward_v2(qm)
    chain("full int8 v2 forward+argmax",
          lambda xb: jnp.argmax(fwd(xb), axis=-1), x0,
          work=2 * BATCH * 18_000_000 // 1)


# --------------------------------------------------------------------- conv
def probe_conv():
    """Layout hypotheses for the conv stage (kbench6 lineage)."""

    def run_conv(kernel, consts, name, slots, out_lanes=C2, in_lanes=512,
                 bb=BB, in_dtype=np.int8):
        a0 = jnp.asarray(
            rng.integers(0, 127, (BATCH * T1, in_lanes)).astype(in_dtype))
        cj = [jnp.asarray(c) for c in consts]

        def fn(carry):
            return pl.pallas_call(
                functools.partial(kernel, chunk=CH),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb * T1, in_lanes), lambda i: (i, 0))]
                + [_spec(c) for c in cj],
                out_specs=pl.BlockSpec((bb, T2, out_lanes),
                                       lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, T2, out_lanes),
                                               jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(carry, *cj)

        chain(name, fn, a0, work=2 * BATCH * slots, n1=4, n2=20)

    w2 = rng.integers(-100, 100, (512, 240)).astype(np.int8)

    def k_conv2_sa(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * T1: (ci + 1) * chunk * T1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, T1, 240)
            s = (z[:, 0:T2, 0:C2] + z[:, 1:T2+1, C2:2*C2]
                 + z[:, 2:T2+2, 2*C2:3*C2])
            o_ref[ci * chunk: (ci + 1) * chunk] = (s >> 9).astype(jnp.int8)

    run_conv(k_conv2_sa, [w2], "conv2 mm 240 + 80-lane shiftadd (current)",
             T1 * 512 * 256)

    w2p = rng.integers(-100, 100, (512, 384)).astype(np.int8)

    def k_padn(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * T1: (ci + 1) * chunk * T1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, T1, 384)
            s = (z[:, 0:T2, 0:128] + z[:, 1:T2+1, 128:256]
                 + z[:, 2:T2+2, 256:384])
            o_ref[ci * chunk: (ci + 1) * chunk] = (s >> 9).astype(jnp.int8)

    run_conv(k_padn, [w2p], "conv2 taps-on-N 128-pad + shiftadd",
             T1 * 512 * 384, out_lanes=128)

    w2k = rng.integers(-100, 100, (3 * 512, 128)).astype(np.int8)

    def k_tapk(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        m = chunk * T1 - 2
        for ci in range(tb // chunk):
            base = ci * chunk * T1
            acc = None
            for k in range(3):
                a1 = a_ref[base + k: base + k + m]
                d = jax.lax.dot_general(
                    a1, w_ref[k * 512: (k + 1) * 512],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
            z = jnp.pad(acc, ((0, 2), (0, 0))).reshape(chunk, T1, 128)
            o_ref[ci * chunk: (ci + 1) * chunk] = (
                z[:, :T2] >> 9).astype(jnp.int8)

    run_conv(k_tapk, [w2k], "conv2 taps-on-K 3-dot accum N=128",
             3 * T1 * 512 * 128, out_lanes=128)

    # taps-on-K with requantize epilogue (the real-chain candidate)
    m2 = rng.random(128).astype(np.float32) * 1e-3
    o2 = rng.random(128).astype(np.float32)

    def k_tapk_rq(a_ref, w_ref, m_ref, o2_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        m = chunk * T1 - 2
        for ci in range(tb // chunk):
            base = ci * chunk * T1
            acc = None
            for k in range(3):
                a1 = a_ref[base + k: base + k + m]
                d = jax.lax.dot_general(
                    a1, w_ref[k * 512: (k + 1) * 512],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
            z = jnp.pad(acc, ((0, 2), (0, 0))).reshape(chunk, T1, 128)
            o_ref[ci * chunk: (ci + 1) * chunk] = requantize(
                z[:, :T2], m_ref[:], o2_ref[:], relu=True)

    run_conv(k_tapk_rq, [w2k, m2, o2], "conv2 taps-on-K + requantize",
             3 * T1 * 512 * 128, out_lanes=128)


# ----------------------------------------------------------------- prologue
def probe_prologue():
    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    from modulationdetectioncnn_tpu.ops.infer import expand_taps

    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))

    def p_current(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        return expand_taps(x_i8, T1).reshape(x.shape[0] * T1, 8)

    chain("prologue (B*t1,8) current", p_current, x0)

    def p_planes(x):
        """Tap-planes layout (B, 8, t1): sublane-stack, no lane transpose."""
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        cols = [x_i8[:, h, k: k + T1] for h in range(2) for k in range(3)]
        xe = jnp.stack(cols, axis=-2)  # (B, 6, t1)
        return jnp.pad(xe, [(0, 0), (0, 2), (0, 0)])

    chain("prologue (B,8,t1) tap-planes", p_planes, x0)

    def p_quant_only(x):
        return jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)

    chain("prologue quantize only", p_quant_only, x0)

    # f32 expand for the bf16 path comparison
    def p_bf16(x):
        xe = expand_taps(x.astype(jnp.bfloat16), T1)
        xe = xe.at[..., 6].set(jnp.bfloat16(1.0))
        return xe.reshape(x.shape[0] * T1, 8)

    chain("prologue bf16 expand (v2 bf16 path)", p_bf16, x0)


# -------------------------------------------------------------------- dense
def probe_dense():
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import _dense_stage_int8_kernel

    qm = _qm()
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]
    h0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T2 * C2), np.int32).astype(np.int8))
    dbb = 512

    def d_current(hb):
        return pl.pallas_call(
            _dense_stage_int8_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T2 * C2), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense_consts)

    chain("dense current (logits out)", d_current, h0,
          work=2 * BATCH * (T2 * C2 * 256 + 256 * 128))

    def _dense_argmax_kernel(h_ref, w3_ref, m3_ref, o3_ref, w4_ref, s4_ref,
                             b4_ref, o_ref):
        acc3 = jax.lax.dot_general(
            h_ref[:], w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a3 = requantize(acc3, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3, w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        # 11 real classes; padded lanes carry s4=b4=0 -> logits 0; real
        # logits can be negative, so mask pads to -inf before the argmax.
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 127)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True).astype(jnp.int32)

    def d_argmax(hb):
        return pl.pallas_call(
            _dense_argmax_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T2 * C2), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense_consts)

    chain("dense + fused argmax", d_argmax, h0,
          work=2 * BATCH * (T2 * C2 * 256 + 256 * 128))

    # feasibility: multi-dim contraction (t,c)x(t,c,n) in one dot_general
    w3_3d = jnp.asarray(np.asarray(qm.w3).reshape(T2, C2, 256))
    h3 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T2, C2), np.int32).astype(np.int8))

    def _dense_md_kernel(h_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            h_ref[:], w_ref[:], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = acc

    def d_md(hb):
        return pl.pallas_call(
            _dense_md_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T2, C2), lambda i: (i, 0, 0)),
                      pl.BlockSpec((T2, C2, 256), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((dbb, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, w3_3d)

    try:
        chain("dense1 multi-dim contract (t,c)x(t,c,n)", d_md, h3,
              work=2 * BATCH * T2 * C2 * 256)
    except Exception as e:  # noqa: BLE001
        print(f"dense1 multi-dim contract: NOT LOWERABLE ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


# -------------------------------------------------------------------- batch
def probe_batch():
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    fwd = infer.make_int8_forward_v2(qm)
    for b in (2048, 4096, 8192, 16384):
        x0 = jnp.asarray(rng.standard_normal((b, 2, 128)).astype(np.float32))
        sec = chain(f"full int8 v2 fwd+argmax B={b}",
                    lambda xb: jnp.argmax(fwd(xb), axis=-1), x0, batch=b,
                    n1=4, n2=20)
        print(f"   -> {b * 128 / sec / 1e6:.1f} MS/s", flush=True)


PROBES = {
    "ceil": probe_ceil,
    "stage": probe_stage,
    "conv": probe_conv,
    "prologue": probe_prologue,
    "dense": probe_dense,
    "batch": probe_batch,
}

if __name__ == "__main__":
    warm_transfer_async().wait(timeout=900)
    print("warm", flush=True)
    names = sys.argv[1:] or ["stage"]
    for n in names:
        print(f"=== {n}", flush=True)
        PROBES[n]()
