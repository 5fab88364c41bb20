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

from modulationdetectioncnn_tpu.ops.cnn_kernels import requantize as _rq_prod
from modulationdetectioncnn_tpu.utils.device import warm_transfer_async


def requantize(acc, mult, offset, *, relu: bool = True):
    """Archive shim: the production requantize became integer add/shift
    (2026-08-21, fixed-point spec). Probes recorded before that pass
    synthetic f32 mult/offset — replay those with the f32-era formula so
    every measured experiment in this archive stays re-runnable; int
    (shift, offset) consts route to the production spec."""
    import jax.numpy as _jnp
    if relu and _jnp.issubdtype(_jnp.asarray(mult).dtype, _jnp.floating):
        v = acc.astype(_jnp.float32) * mult + (offset + 0.5)
        return _jnp.clip(v, 0.0, 127.0).astype(_jnp.int8)
    return _rq_prod(acc, mult, offset, relu=relu)
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


def chain(name, fn, x0, work=None, n1=None, n2=None, unit="TOPS",
          batch=BATCH):
    """Time fn(x) with a constant-cost data-dependent carry (scalar probe).

    The carry bump is (probe_f32 * 1e-38) cast to the carry dtype — a
    DYNAMIC zero XLA cannot fold away (a literal-0 multiply gets constant-
    folded and the whole loop body DCE'd: measured as negative timings).
    Iteration counts auto-scale from a pilot run so the two-length delta
    is >= ~60 ms, well above tunnel RPC jitter.
    """
    jfn = jax.jit(fn)

    def body(xc):
        out = jfn(xc)
        probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
        bump = (probe * jnp.float32(1e-38)).astype(xc.dtype)
        return xc + bump

    if n1 is None or n2 is None:
        pilot = measure_per_iter_chained(body, x0, n1=4, n2=16)
        pilot = max(pilot, 1e-6)
        delta = max(32, min(3000, int(0.06 / pilot)))
        n1, n2 = 8, 8 + delta
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

        chain(name, fn, a0, work=2 * BATCH * slots)

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


# ------------------------------------------------------------------- repack
def probe_repack():
    """Is the int32->int8 tile repack (4-sublane pack) the conv-stage
    binder? Isolated costs of the candidate epilogues + chunk sweep."""
    BRQ = 16
    m1 = rng.random(512).astype(np.float32) * 1e-3
    o1 = rng.random(512).astype(np.float32)
    cj = [jnp.asarray(m1), jnp.asarray(o1)]
    a0 = jnp.asarray(
        rng.integers(0, 1 << 20, (BATCH * T1, 512), np.int32))

    def k_rq_i8(a_ref, m_ref, o_ref, out_ref):
        out_ref[:] = requantize(a_ref[:], m_ref[:], o_ref[:], relu=True)

    def f_rq(out_dtype):
        def f(a):
            def k(a_ref, m_ref, o_ref, out_ref):
                v = a_ref[:].astype(jnp.float32) * m_ref[:] + (o_ref[:] + 0.5)
                out_ref[:] = jnp.clip(v, 0.0, 127.0).astype(out_dtype)

            return pl.pallas_call(
                k,
                grid=(BATCH // BRQ,),
                in_specs=[pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0))]
                + [_spec(c) for c in cj],
                out_specs=pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH * T1, 512), out_dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(a, *cj)

        return f

    # NOTE: isolated whole-tensor requant probes removed: they are
    # HBM-bound (1 GB of i32 traffic) and do not isolate the in-kernel
    # (VMEM-resident) epilogue cost. In-situ premium: tapK vs tapK+rq.
    # conv2-only from a resident i8 activation, chunk sweep (no conv1/rq)
    w2 = rng.integers(-100, 100, (512, 240)).astype(np.int8)
    wj = jnp.asarray(w2)
    a8 = jnp.asarray(
        rng.integers(0, 127, (BATCH * T1, 512), np.int32).astype(np.int8))

    def f_c2(chunk):
        def k(a_ref, w_ref, o_ref):
            tb = a_ref.shape[0] // T1
            for ci in range(tb // chunk):
                a1 = a_ref[ci * chunk * T1: (ci + 1) * chunk * T1]
                z = jax.lax.dot_general(
                    a1, w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                o_ref[ci * chunk * T1: (ci + 1) * chunk * T1] = (
                    z >> 9).astype(jnp.int8)

        def f(a):
            return pl.pallas_call(
                k,
                grid=(BATCH // BRQ,),
                in_specs=[pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0)),
                          _spec(w2)],
                out_specs=pl.BlockSpec((BRQ * T1, 240), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH * T1, 240), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(a, wj)

        return f

    for chunk in (4, 16):  # chunk=16 == one (2016,512)x(512,240) dot/block
        chain(f"conv2 mm only (i8 in, >>9 i8 out) chunk={chunk}",
              f_c2(chunk), a8, work=2 * BATCH * T1 * 512 * 240)


# ---------------------------------------------------------------------- rq2
def probe_rq2():
    """Cheaper conv1 epilogues: f32 affine (current) vs integer pow2-shift
    requant vs relu-only; plus i16 x i8 MXU feasibility (would remove the
    conv1 requant entirely via per-tensor scales)."""
    BRQ = 16
    a0 = jnp.asarray(rng.integers(0, 90000, (BATCH * T1, 512), np.int32))
    m1 = rng.random(512).astype(np.float32) * 1e-3
    o1 = rng.random(512).astype(np.float32)
    cj = [jnp.asarray(m1), jnp.asarray(o1)]

    def run(name, kernel, consts, out_dtype=jnp.int8):
        def f(a):
            return pl.pallas_call(
                kernel,
                grid=(BATCH // BRQ,),
                in_specs=[pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0))]
                + [_spec(np.asarray(c)) for c in consts],
                out_specs=pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH * T1, 512), out_dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(a, *consts)

        chain(name, f, a0, work=BATCH * T1 * 512, unit="Telt")

    def k_f32(a_ref, m_ref, o_ref, out_ref):
        out_ref[:] = requantize(a_ref[:], m_ref[:], o_ref[:], relu=True)

    run("rq f32 affine i32->i8 (current)", k_f32, cj)

    def k_shift(a_ref, out_ref):
        v = jax.lax.shift_right_arithmetic(a_ref[:] + 64, 7)
        out_ref[:] = jnp.clip(v, 0, 127).astype(jnp.int8)

    run("rq pow2 shift i32->i8", k_shift, [])

    def k_relu16(a_ref, out_ref):
        out_ref[:] = jnp.clip(a_ref[:], 0, 32767).astype(jnp.int16)

    run("relu-only i32->i16", k_relu16, [], out_dtype=jnp.int16)

    # i16 x i8 dot feasibility + speed
    a16 = jnp.asarray(
        rng.integers(0, 20000, (BATCH * T1, 512), np.int32).astype(np.int16))
    w2 = jnp.asarray(rng.integers(-100, 100, (512, 240)).astype(np.int8))

    def k_i16dot(a_ref, w_ref, o_ref):
        chunk = 16
        tb = a_ref.shape[0] // T1
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * T1: (ci + 1) * chunk * T1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[ci * chunk * T1: (ci + 1) * chunk * T1] = (
                z >> 9).astype(jnp.int8)

    def f_i16(a):
        return pl.pallas_call(
            k_i16dot,
            grid=(BATCH // BRQ,),
            in_specs=[pl.BlockSpec((BRQ * T1, 512), lambda i: (i, 0)),
                      _spec(np.zeros((512, 240)))],
            out_specs=pl.BlockSpec((BRQ * T1, 240), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH * T1, 240), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(a, w2)

    try:
        chain("conv2 mm i16 x i8 -> i32", f_i16, a16,
              work=2 * BATCH * T1 * 512 * 240)
    except Exception as e:  # noqa: BLE001
        print(f"i16 x i8 dot: FAILS ({str(e)[:150]})", flush=True)


# ----------------------------------------------------------------------- v3
def probe_v3():
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    for b in (1024, 2048, 4096):
        classify = infer.make_int8_classifier_v3(qm)
        x0 = jnp.asarray(rng.standard_normal((b, 2, 128)).astype(np.float32))
        try:
            sec = chain(f"v3 classifier B={b}", classify, x0, batch=b)
            print(f"   -> {b * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v3 B={b}: FAILS ({str(e)[:150]})", flush=True)
    # v2 small-batch reference points
    fwd = infer.make_int8_forward_v2(qm)
    for b in (512, 1024):
        x0 = jnp.asarray(rng.standard_normal((b, 2, 128)).astype(np.float32))
        try:
            sec = chain(f"v2 fwd+argmax B={b}",
                        lambda xb: jnp.argmax(fwd(xb), axis=-1), x0, batch=b)
            print(f"   -> {b * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v2 B={b}: FAILS ({str(e)[:150]})", flush=True)


# -------------------------------------------------------------------- convT
def probe_convT():
    """Where should the tap-expand transpose live? Candidates:
    (a) in-kernel Mosaic transpose of the (BB, 8, t1) tap-planes input;
    (b) LHS-dim0-contracted matmul ((8, N) x (8, 512)) per frame;
    (c) full conv1 from tap-planes: transpose + matmul + requantize.
    """
    w1e = rng.integers(-100, 100, (8, 512)).astype(np.int8)
    m1 = rng.random(512).astype(np.float32) * 1e-3
    o1 = rng.random(512).astype(np.float32)
    xt0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, 128), np.int32).astype(np.int8))

    def k_xpose(x_ref, o_ref):
        # (BB, 8, 128) -> (BB, 128, 8) pure relayout cost
        o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

    def f_xpose(x):
        return pl.pallas_call(
            k_xpose,
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 8, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((BB, 128, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 128, 8), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)

    try:
        chain("in-kernel transpose (BB,8,128)->(BB,128,8)", f_xpose, xt0)
    except Exception as e:  # noqa: BLE001
        print(f"in-kernel transpose: FAILS ({str(e)[:120]})", flush=True)

    cj = [jnp.asarray(w1e), jnp.asarray(m1), jnp.asarray(o1)]

    def k_conv1_from_planes(x_ref, w_ref, m_ref, o1_ref, o_ref, *, chunk):
        # (BB, 8, 128) tap-planes -> transpose -> conv1 matmul -> requant
        tb = x_ref.shape[0]
        for ci in range(tb // chunk):
            xt = x_ref[ci * chunk: (ci + 1) * chunk]      # (chunk, 8, 128)
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * 128, 8)
            a1 = jax.lax.dot_general(
                xe, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[ci * chunk * 128: (ci + 1) * chunk * 128] = requantize(
                a1, m_ref[:], o1_ref[:], relu=True)

    def f_c1p(x):
        return pl.pallas_call(
            functools.partial(k_conv1_from_planes, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 8, 128), lambda i: (i, 0, 0))]
            + [_spec(c) for c in cj],
            out_specs=pl.BlockSpec((BB * 128, 512), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH * 128, 512), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *cj)

    try:
        chain("conv1 from tap-planes (xpose+mm+rq)", f_c1p, xt0,
              work=2 * BATCH * 128 * 8 * 512)
    except Exception as e:  # noqa: BLE001
        print(f"conv1 from tap-planes: FAILS ({str(e)[:120]})", flush=True)

    # LHS-contract-dim-0 lowering check: (8, N)x(8, 512) per chunk
    def k_lhsT(x_ref, w_ref, m_ref, o1_ref, o_ref, *, chunk):
        tb = x_ref.shape[0]
        for ci in range(tb // chunk):
            xt = x_ref[ci * chunk]  # ONE frame (8, 128)
            a1 = jax.lax.dot_general(
                xt, w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (128, 512)
            o_ref[ci * 128: ci * 128 + 128] = requantize(
                a1, m_ref[:], o1_ref[:], relu=True)

    def f_lhsT(x):
        bb2 = BB
        return pl.pallas_call(
            functools.partial(k_lhsT, chunk=1),
            grid=(BATCH // bb2,),
            in_specs=[pl.BlockSpec((bb2, 8, 128), lambda i: (i, 0, 0))]
            + [_spec(c) for c in cj],
            out_specs=pl.BlockSpec((bb2 * 128, 512), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH * 128, 512), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *cj)

    try:
        chain("conv1 per-frame LHS-dim0 contract", f_lhsT, xt0,
              work=2 * BATCH * 128 * 8 * 512)
    except Exception as e:  # noqa: BLE001
        print(f"conv1 LHS-dim0 contract: FAILS ({str(e)[:120]})", flush=True)


# ----------------------------------------------------------------------- nk
def probe_nk():
    """M/N/K scaling law for in-kernel int8 dots with an i8 store epilogue:
    which axis starves the MXU at conv2's shape (2016, 512, 240)?"""

    def run_dot(m_rows, k, n, name=None, brq_frames=None):
        brq = brq_frames or max(1, m_rows // T1)
        w = jnp.asarray(rng.integers(-100, 100, (k, n)).astype(np.int8))
        a = jnp.asarray(
            rng.integers(0, 127, (BATCH * T1, k), np.int32).astype(np.int8))

        def kern(a_ref, w_ref, o_ref):
            z = jax.lax.dot_general(
                a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = (z >> 9).astype(jnp.int8)

        def f(av):
            return pl.pallas_call(
                kern,
                grid=(BATCH // brq,),
                in_specs=[pl.BlockSpec((brq * T1, k), lambda i: (i, 0)),
                          pl.BlockSpec((k, n), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((brq * T1, n), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH * T1, n), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(av, w)

        label = name or f"dot M={brq*T1} K={k} N={n}"
        try:
            chain(label, f, a, work=2 * BATCH * T1 * k * n)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILS ({str(e)[:100]})", flush=True)

    for n in (128, 256, 512, 1024):
        run_dot(2016, 512, n)
    run_dot(4032, 512, 240, brq_frames=32)
    run_dot(2016, 512, 240)
    run_dot(2016, 1536, 128)
    run_dot(2016, 128, 240)

    # bf16 comparison at conv2's exact shape
    wb = jnp.asarray(rng.integers(-8, 8, (512, 240)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    ab = jnp.asarray(
        rng.integers(0, 16, (BATCH * T1, 512), np.int32).astype(np.float32)
    ).astype(jnp.bfloat16)

    def kern_b(a_ref, w_ref, o_ref):
        z = jax.lax.dot_general(
            a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (jnp.maximum(z, 0.0) * 0.001).astype(jnp.bfloat16)

    def f_b(av):
        return pl.pallas_call(
            kern_b,
            grid=(BATCH // 16,),
            in_specs=[pl.BlockSpec((16 * T1, 512), lambda i: (i, 0)),
                      pl.BlockSpec((512, 240), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((16 * T1, 240), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH * T1, 240), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(av, wb)

    chain("dot bf16 M=2016 K=512 N=240 (relu out)", f_b, ab,
          work=2 * BATCH * T1 * 512 * 240, unit="TFLOPS")




# ----------------------------------------------------------------------- v4
def probe_v4():
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    for b in (1024, 2048, 4096):
        for chunk in (16, 32):
            classify = infer.make_int8_classifier_v4(qm, chunk=chunk)
            x0 = jnp.asarray(
                rng.standard_normal((b, 2, 128)).astype(np.float32))
            try:
                sec = chain(f"v4 classifier B={b} chunk={chunk}", classify,
                            x0, batch=b)
                print(f"   -> {b * 128 / sec / 1e6:.1f} MS/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"v4 B={b} chunk={chunk}: FAILS ({str(e)[:120]})",
                      flush=True)


# ----------------------------------------------------------------------- r3
def probe_r3():
    """Round-3 breakdown + v5 hypotheses (VERDICT r2 missing #1 / next #1).

    Measures, on-chip with chained timing:
      1. v4 per-stage: XLA prologue / conv stage / dense+argmax stage / full;
      2. conv-stage variants: grid-per-chunk pipelining, a1-requantize share
         (astype lower bound), bf16 requantize, fused f32-in prologue (v5);
      3. dense-stage dbb sweep;
      4. achieved HBM copy bandwidth at the (B,128,128) int8 intermediate.
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v4_kernel, _dense_argmax_int8_kernel,
        expand_conv1_weights, expand_tap_planes, pack_conv2_weights_tap384,
        pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    w3p = pack_dense1_weights_v3(qm.w3, T2, c2, T_IN)
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (w3p, qm.m3, qm.o3, w4, s4, b4)]

    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    dense_work = 2 * BATCH * (T_IN * 128 * 256 + 256 * 128)

    # ---- 1. v4 per-stage
    def prologue4(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        return expand_tap_planes(x_i8)

    chain("r3 v4 prologue (XLA quant+planes)", prologue4, x0)

    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def conv4(xp, bb=BB, ch=CH, kern=_conv_stage_int8_v4_kernel,
              semantics="parallel"):
        return pl.pallas_call(
            functools.partial(kern, chunk=ch),
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,)),
        )(xp, *conv_consts)

    chain("r3 conv v4 (bb=64 ch=16)", conv4, xp0, work=conv_work)

    h0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T_IN * 128), np.int32).astype(np.int8))

    def dense4(hb, dbb=256):
        return pl.pallas_call(
            functools.partial(_dense_argmax_int8_kernel, nc=11),
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN * 128), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense_consts)

    chain("r3 dense+argmax v4 (dbb=256)", dense4, h0, work=dense_work)

    classify = infer.make_int8_classifier_v4(qm)
    chain("r3 full v4 classifier", classify, x0,
          work=conv_work + dense_work)

    # ---- 2. conv-stage variants
    for bb, ch in ((16, 16), (32, 32), (128, 16), (64, 32)):
        try:
            chain(f"r3 conv v4 bb={bb} ch={ch}",
                  functools.partial(conv4, bb=bb, ch=ch), xp0,
                  work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"conv bb={bb} ch={ch}: FAILS ({str(e)[:100]})", flush=True)

    def _conv_norq_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, o_ref, *, chunk):
        """TIMING ONLY (wrong math): a1 requantize replaced by a 1-pass
        astype — isolates the VPU share of the a1 epilogue."""
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        for ci in range(tb // chunk):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            a1q = a1.astype(jnp.int8)  # 1 pass instead of requantize
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    chain("r3 conv a1-rq->astype (VPU share)",
          functools.partial(conv4, kern=_conv_norq_kernel), xp0,
          work=conv_work)

    def _conv_bf16rq_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                            o2_ref, o_ref, *, chunk):
        """TIMING ONLY: a1 requantize computed in bf16 (2x packed VPU)."""
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        m1b = m1_ref[:].astype(jnp.bfloat16)
        o1b = (o1_ref[:] + 0.5).astype(jnp.bfloat16)
        for ci in range(tb // chunk):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            v = a1.astype(jnp.bfloat16) * m1b + o1b
            a1q = jnp.clip(v, 0.0, 127.0).astype(jnp.int8)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    chain("r3 conv a1-rq in bf16", functools.partial(conv4,
          kern=_conv_bf16rq_kernel), xp0, work=conv_work)

    # v5: fused f32-in prologue; conv1 as 3 sublane-offset K=8 dots.
    w1k = np.zeros((24, 512), np.int8)
    w1p = np.asarray(qm.w1p)  # (3, 256) int8
    for k in range(3):
        for h in range(2):
            w1k[k * 8 + h, h * 256 : (h + 1) * 256] = w1p[k]
    v5_consts = [jnp.asarray(a) for a in (w1k, qm.m1, qm.o1, w2k, m2p, o2p)]

    def _conv_v5_kernel(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                        o2_ref, o_ref, *, chunk, inv_sx):
        tb = x_ref.shape[0]
        t_len = x_ref.shape[2]
        m = chunk * t_len
        for ci in range(tb // chunk):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]  # (chunk, 2, T) f32
            xt = jnp.swapaxes(xb, 1, 2).reshape(m, 2)
            xq = jnp.clip(jnp.round(xt * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            xq = jnp.pad(xq, ((0, 2), (0, 6)))  # (m+2, 8)
            a1 = None
            for k in range(3):
                d = jax.lax.dot_general(
                    xq[k : k + m], w1_ref[k * 8 : (k + 1) * 8],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                a1 = d if a1 is None else a1 + d
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    def conv5(x, bb=BB, ch=CH):
        return pl.pallas_call(
            functools.partial(_conv_v5_kernel, chunk=ch, inv_sx=inv_sx),
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(a) for a in v5_consts],
            out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *v5_consts)

    try:
        chain("r3 conv v5 fused-prologue (f32 in)", conv5, x0,
              work=conv_work)
        chain("r3 conv v5 bb=32 ch=32",
              functools.partial(conv5, bb=32, ch=32), x0, work=conv_work)
    except Exception as e:  # noqa: BLE001
        print(f"conv v5: FAILS ({str(e)[:200]})", flush=True)

    # ---- 3. dense dbb sweep
    for dbb in (512, 1024):
        try:
            chain(f"r3 dense+argmax dbb={dbb}",
                  functools.partial(dense4, dbb=dbb), h0, work=dense_work)
        except Exception as e:  # noqa: BLE001
            print(f"dense dbb={dbb}: FAILS ({str(e)[:100]})", flush=True)

    # ---- 4. achieved HBM bandwidth at the intermediate's shape
    def _copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    def hbm_copy(hb, bb=256):
        return pl.pallas_call(
            _copy_kernel,
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, T_IN * 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((bb, T_IN * 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN * 128), jnp.int8),
        )(hb)

    sec = chain("r3 hbm copy (B,16384) int8", hbm_copy, h0)
    gb = 2 * BATCH * T_IN * 128 / 1e9
    print(f"   -> achieved HBM r+w bandwidth {gb / sec:.1f} GB/s", flush=True)


# ----------------------------------------------------------------- r3stream
def probe_r3stream():
    """Stream-chain per-stage costs at bench shapes (VERDICT r2 next #4):
    which of channelize / relayouts / framing / power / CFO / timing eats
    the 28% overhead vs CNN-only."""
    from modulationdetectioncnn_tpu.config import AmcConfig
    from modulationdetectioncnn_tpu.dsp import channelizer, framer, normalize
    from modulationdetectioncnn_tpu.dsp import pipeline
    from modulationdetectioncnn_tpu.golden.dsp import design_prototype
    from modulationdetectioncnn_tpu.ops import infer

    cfg = AmcConfig()
    sc = cfg.stream
    m = sc.num_subbands
    t_len = BATCH * 128  # 524288 wideband samples/iter, as in bench stream
    h = design_prototype(m, sc.taps_per_branch)
    hj = jnp.asarray(np.asarray(h, np.float32))
    x0 = jnp.asarray(rng.standard_normal((2, t_len)).astype(np.float32))

    def report_rate(name, sec):
        print(f"   -> {name}: {t_len / sec / 1e6:.1f} MS/s-equivalent",
              flush=True)

    sec = chain("s3 channelize (FIR+DFT)",
                lambda x: channelizer.channelize(x, hj, m), x0, batch=BATCH)
    report_rate("channelize", sec)

    def chan_move(x):
        sub = channelizer.channelize(x, hj, m)
        return jnp.moveaxis(sub, -1, -3)

    sec = chain("s3 channelize+moveaxis", chan_move, x0, batch=BATCH)
    report_rate("channelize+moveaxis", sec)

    def chan_frame(x):
        sub = jnp.moveaxis(channelizer.channelize(x, hj, m), -1, -3)
        fr = framer.frames_from_stream(sub, sc.frame_len, sc.frame_hop)
        return jnp.swapaxes(fr, -2, -3)

    sec = chain("s3 chan+move+frame+swap", chan_frame, x0, batch=BATCH)
    report_rate("through framing", sec)

    def chan_frame_pow(x):
        return normalize.power_normalize(chan_frame(x))

    sec = chain("s3 ..+power_normalize", chan_frame_pow, x0, batch=BATCH)
    report_rate("through power", sec)

    fr0 = jnp.asarray(
        rng.standard_normal((m, t_len // m // 128, 2, 128)).astype(np.float32))

    sec = chain("s3 cfo est+correct (frames)",
                lambda fr: normalize.correct_cfo(
                    fr, normalize.estimate_cfo(fr)), fr0, batch=BATCH)
    report_rate("cfo", sec)

    sec = chain("s3 timing est+correct (frames)",
                lambda fr: normalize.correct_timing(
                    fr, normalize.estimate_timing(fr, sc.sps), sc.sps,
                    sc.timing_phases), fr0, batch=BATCH)
    report_rate("timing", sec)

    qm = _qm()
    classify = infer.make_int8_classifier_v5(qm)
    sec = chain("s3 classify v5 only (B=4096)",
                lambda x: classify(x),
                jnp.asarray(rng.standard_normal((BATCH, 2, 128))
                            .astype(np.float32)), batch=BATCH)
    report_rate("classify v5", sec)

    def full_chain(x):
        fr = pipeline.subband_frames(x, hj, sc)  # (M, F, 2, flen)
        mm, ff = fr.shape[0], fr.shape[1]
        return classify(fr.reshape(mm * ff, 2, fr.shape[-1]))

    sec = chain("s3 FULL stream chain (cfo on)", full_chain, x0, batch=BATCH)
    report_rate("full chain", sec)


# ----------------------------------------------------------------------- r3b
def probe_r3b():
    """Round-3 probe 2, driven by r3 findings (a1-rq = 324us VPU; extra
    dots ~200us each; dense cheap; full-vs-stages gap ~275us):
      A. honest XLA prologue cost (sum-output defeats slice-DCE) + layouts;
      B. software-pipelined conv kernel (next chunk's conv1 dot adjacent to
         this chunk's VPU requantize -> scheduler can overlap MXU/VPU);
      C. conv2 N=512 vs N=384 (in-kernel flatness);
      D. rq pass-cost calibration (drop the min-127 pass, timing only);
      E. multi-dim (t,c)x(t,c,n) dense1 contraction compile test;
      F. if E lowers: whole-network single kernel (labels out).
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v4_kernel, expand_conv1_weights, expand_tap_planes,
        pack_conv2_weights_tap384, pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512

    # ---- A. honest prologue costs (carry bump uses a FULL-output sum so
    # XLA cannot slice away the computation)
    def chain_sum(name, fn, x0c, batch=BATCH):
        jfn = jax.jit(fn)

        def body(xc):
            out = jfn(xc)
            probe = jnp.sum(out.astype(jnp.float32) * jnp.float32(1e-30))
            return xc + (probe * jnp.float32(1e-8)).astype(xc.dtype)

        pilot = measure_per_iter_chained(body, x0c, n1=4, n2=16)
        delta = max(32, min(3000, int(0.06 / max(pilot, 1e-6))))
        sec = measure_per_iter_chained(body, x0c, n1=8, n2=8 + delta)
        report(name, sec, None, batch=batch)
        return sec

    def pro_cur(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        return expand_tap_planes(x_i8)

    chain_sum("r3b prologue (B,8,T) honest", pro_cur, x0)

    def pro_pof(x):
        """Planes-outermost (8, B, T): each plane a clean (B, T) tile write."""
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        t1 = x.shape[-1] - 2
        cols = [
            jnp.pad(x_i8[:, h, k : k + t1], [(0, 0), (0, 2)])
            for h in range(2) for k in range(3)
        ]
        xp = jnp.stack(cols, axis=0)  # (6, B, T)
        return jnp.pad(xp, [(0, 2), (0, 0), (0, 0)])

    chain_sum("r3b prologue (8,B,T) planes-outer", pro_pof, x0)

    def pro_quant(x):
        return jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)

    chain_sum("r3b prologue quantize only", pro_quant, x0)

    # ---- B. software-pipelined conv kernel
    def _conv_pipe_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, o_ref, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        for ci in range(n):
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            if ci + 1 < n:
                a1 = dot1(ci + 1)  # independent MXU work beside the VPU rq
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def conv_run(kern, consts, bb=128, ch=16, out_lanes=128):
        def f(xp):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                + [_spec(a) for a in consts],
                out_specs=pl.BlockSpec((bb, T_IN, out_lanes),
                                       lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, out_lanes),
                                               jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xp, *consts)
        return f

    for bb, ch in ((128, 16), (64, 16), (128, 32)):
        try:
            chain(f"r3b conv PIPELINED bb={bb} ch={ch}",
                  conv_run(_conv_pipe_kernel, conv_consts, bb, ch), xp0,
                  work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"pipe bb={bb} ch={ch}: FAILS ({str(e)[:120]})", flush=True)

    # ---- C. conv2 N=512 (pure pad) vs N=384: in-kernel flatness
    w2k512 = np.zeros((512, 512), np.int8)
    w2k512[:, :384] = np.asarray(w2k)
    consts512 = [jnp.asarray(a) for a in
                 (w1e, qm.m1, qm.o1, w2k512, m2p, o2p)]

    def _conv_n512_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, o_ref, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        for ci in range(tb // chunk):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 4 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    try:
        chain("r3b conv2 N=512 (flatness test)",
              conv_run(_conv_n512_kernel, consts512, 64, 16), xp0,
              work=conv_work)
    except Exception as e:  # noqa: BLE001
        print(f"N=512: FAILS ({str(e)[:120]})", flush=True)

    # ---- D. rq pass-cost: drop the min-127 pass (timing only, wrong math)
    def _conv_rq4_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                         o2_ref, o_ref, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        for ci in range(tb // chunk):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            v = a1.astype(jnp.float32) * m1_ref[:] + (o1_ref[:] + 0.5)
            a1q = jnp.maximum(v, 0.0).astype(jnp.int8)  # no min pass
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    chain("r3b conv rq-no-min (pass cost)",
          conv_run(_conv_rq4_kernel, conv_consts, 64, 16), xp0,
          work=conv_work)

    # ---- E. multi-dim dense1 contraction on-chip
    w3_3d = jnp.asarray(
        np.asarray(pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN))
        .reshape(T_IN, 128, 256))
    h3 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T_IN, 128), np.int32).astype(np.int8))

    def _md_kernel(h_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            h_ref[:], w_ref[:], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)

    def d_md(hb, dbb=256):
        return pl.pallas_call(
            _md_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((dbb, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, w3_3d)

    md_ok = False
    try:
        chain("r3b dense1 3D contract (t,c)x(t,c,n)", d_md, h3,
              work=2 * BATCH * T_IN * 128 * 256)
        md_ok = True
    except Exception as e:  # noqa: BLE001
        print(f"3D contract: FAILS ({str(e)[:160]})", flush=True)

    # ---- F. whole-network single kernel (conv + dense1 via per-chunk 3D
    # contract + dense2 + argmax -> labels), if E lowers
    if md_ok:
        w4 = infer._pad_cols(qm.w4)
        s4 = infer._pad_cols(qm.s4)
        b4 = infer._pad_cols(qm.b4)
        full_consts = [jnp.asarray(a) for a in
                       (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
        dense_full = [w3_3d] + [jnp.asarray(a) for a in
                                (qm.m3, qm.o3, w4, s4, b4)]

        def _whole_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, w3_ref, m3_ref, o3_ref, w4_ref, s4_ref,
                          b4_ref, o_ref, *, chunk):
            tb = xp_ref.shape[0]
            t_len = xp_ref.shape[2]
            for ci in range(tb // chunk):
                xt = xp_ref[ci * chunk : (ci + 1) * chunk]
                xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
                a1 = jax.lax.dot_general(
                    xe, w1_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
                z = jax.lax.dot_general(
                    a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(chunk, t_len, 3 * 128)
                s = (z[:, 0 : t_len - 2, 0:128]
                     + z[:, 1 : t_len - 1, 128:256]
                     + z[:, 2:t_len, 256:384])
                s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
                sq = requantize(s, m2_ref[:], o2_ref[:], relu=True)
                acc3 = jax.lax.dot_general(
                    sq, w3_ref[:], (((1, 2), (0, 1)), ((), ())),
                    preferred_element_type=jnp.int32)
                a3 = requantize(acc3, m3_ref[:], o3_ref[:], relu=True)
                acc4 = jax.lax.dot_general(
                    a3, w4_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
                lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(lane < 11, logits, -jnp.inf)
                mx = jnp.max(logits, axis=-1, keepdims=True)
                idx = jnp.where(logits >= mx, lane, 128)
                o_ref[ci * chunk : (ci + 1) * chunk] = jnp.min(
                    idx, axis=-1, keepdims=True)

        def whole(xp, bb=64, ch=16):
            return pl.pallas_call(
                functools.partial(_whole_kernel, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                + [_spec(a) for a in full_consts]
                + [pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))]
                + [_spec(a) for a in dense_full[1:]],
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xp, *full_consts, *dense_full)

        for bb, ch in ((64, 16), (128, 16)):
            try:
                chain(f"r3b WHOLE-NET kernel bb={bb} ch={ch}",
                      functools.partial(whole, bb=bb, ch=ch), xp0,
                      work=conv_work + 2 * BATCH * (T_IN * 128 * 256
                                                    + 256 * 128))
            except Exception as e:  # noqa: BLE001
                print(f"whole bb={bb} ch={ch}: FAILS ({str(e)[:140]})",
                      flush=True)


# ----------------------------------------------------------------------- r3c
def probe_r3c():
    """Round-3 probe 3: dense-stage options to kill the ~260us flatten copy
    (r3b: (B,128,128)->(B,16384) int8 reshape is a physical re-tile), and
    deeper conv pipelining.
      A. pipe2 conv (both epilogues interleaved with both dots);
      B. copy+dense end-to-end (confirms the copy cost);
      C. batched dot_general over t (compile feasibility + rate);
      D. per-t unrolled dense from the 3D tensor;
      E. v6-now end-to-end (prologue + pipe conv + copy + dense dbb=512).
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _dense_argmax_int8_kernel, expand_conv1_weights, expand_tap_planes,
        pack_conv2_weights_tap384, pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    w3p = pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN)
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (w3p, qm.m3, qm.o3, w4, s4, b4)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    dense_work = 2 * BATCH * (T_IN * 128 * 256 + 256 * 128)
    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))
    h3 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T_IN, 128), np.int32).astype(np.int8))

    # ---- A. pipe2: 2-deep software pipeline
    def _conv_pipe2_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                           o2_ref, o_ref, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
        z_prev = jax.lax.dot_general(
            a1q, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if n > 1:
            a1 = dot1(1)
        for ci in range(n):
            z = z_prev.reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            if ci + 1 < n:
                a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
                z_prev = jax.lax.dot_general(
                    a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            if ci + 2 < n:
                a1 = dot1(ci + 2)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    def conv_run(kern, consts, bb=64, ch=16):
        def f(xp):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                + [_spec(a) for a in consts],
                out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xp, *consts)
        return f

    # pipe2 measured WORSE than pipe1 (1078us vs 751us — the held z_prev
    # inflates live VMEM and defeats the scheduler); skip unless asked.
    if "--pipe2" in sys.argv:
        for bb, ch in ((64, 16), (64, 8), (32, 16)):
            try:
                chain(f"r3c conv pipe2 bb={bb} ch={ch}",
                      conv_run(_conv_pipe2_kernel, conv_consts, bb, ch), xp0,
                      work=conv_work)
            except Exception as e:  # noqa: BLE001
                print(f"pipe2 bb={bb} ch={ch}: FAILS ({str(e)[:120]})",
                      flush=True)

    # ---- B. copy + dense end-to-end (the v4 dense path from the 3D tensor)
    # dbb=512 with the in-jit reshape carry VMEM-OOMs (24.2M scoped); 256.
    def dense4(hb, dbb=256):
        h2 = hb.reshape(BATCH, T_IN * 128)
        return pl.pallas_call(
            functools.partial(_dense_argmax_int8_kernel, nc=11),
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN * 128), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(h2, *dense_consts)

    try:
        chain("r3c copy+dense (3D in, reshape, dense)", dense4, h3,
              work=dense_work)
    except Exception as e:  # noqa: BLE001
        print(f"copy+dense: FAILS ({str(e)[:140]})", flush=True)

    # ---- C. batched dot_general over t
    w3_3d = jnp.asarray(np.asarray(w3p).reshape(T_IN, 128, 256))
    h3t = jnp.asarray(
        rng.integers(0, 80, (T_IN, BATCH // 32, 128), np.int32)
        .astype(np.int8))

    def _bdot_kernel(h_ref, w_ref, o_ref):
        p = jax.lax.dot_general(
            h_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)  # (T, bb, 256)
        o_ref[:] = jnp.sum(p, axis=0)

    def bdot(hb, bbt=32):
        return pl.pallas_call(
            _bdot_kernel,
            grid=((BATCH // 32) // bbt,),
            in_specs=[pl.BlockSpec((T_IN, bbt, 128), lambda i: (0, i, 0)),
                      pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((bbt, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH // 32, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, w3_3d)

    try:
        chain("r3c batched-dot dense1 (t batch dim)", bdot, h3t,
              work=2 * (BATCH // 32) * T_IN * 128 * 256, batch=BATCH // 32)
    except Exception as e:  # noqa: BLE001
        print(f"batched dot: FAILS ({str(e)[:160]})", flush=True)

    # ---- D. per-t unrolled dense from 3D (no copy)
    def _dense3d_kernel(h_ref, w3_ref, m3_ref, o3_ref, w4_ref, s4_ref,
                        b4_ref, o_ref):
        acc = None
        for t in range(T_IN):
            d = jax.lax.dot_general(
                h_ref[:, t, :], w3_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        a3 = requantize(acc, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3, w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    dense3d_consts = [w3_3d] + [jnp.asarray(a) for a in
                                (qm.m3, qm.o3, w4, s4, b4)]

    def dense3d(hb, dbb=256):
        return pl.pallas_call(
            _dense3d_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))]
            + [_spec(a) for a in dense3d_consts[1:]],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(hb, *dense3d_consts)

    for dbb in (256, 128):
        try:
            chain(f"r3c dense3d per-t dots dbb={dbb}",
                  functools.partial(dense3d, dbb=dbb), h3, work=dense_work)
            break
        except Exception as e:  # noqa: BLE001
            print(f"dense3d dbb={dbb}: FAILS ({str(e)[:140]})", flush=True)

    # ---- E. v6-now end-to-end: prologue + pipe conv + copy + dense
    def _conv_pipe_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, o_ref, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        for ci in range(n):
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            if ci + 1 < n:
                a1 = dot1(ci + 1)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m2_ref[:], o2_ref[:], relu=True)

    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    convp = conv_run(_conv_pipe_kernel, conv_consts, 64, 16)

    def v6_now(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        xp = expand_tap_planes(x_i8)
        out2 = convp(xp)
        return dense4(out2)

    try:
        chain("r3c v6-now full (pipe conv + copy + dense)", v6_now, x0,
              work=conv_work + dense_work)
    except Exception as e:  # noqa: BLE001
        print(f"v6-now: FAILS ({str(e)[:140]})", flush=True)

    def v6_3d(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        xp = expand_tap_planes(x_i8)
        out2 = convp(xp)
        return dense3d(out2)

    try:
        chain("r3c v6-3d full (pipe conv + dense3d)", v6_3d, x0,
              work=conv_work + dense_work)
    except Exception as e:  # noqa: BLE001
        print(f"v6-3d: FAILS ({str(e)[:120]})", flush=True)


# ----------------------------------------------------------------------- r3d
def probe_r3d():
    """Round-3 probe 4: the t-major whole-network kernel (enabled by r3c's
    finding that batched dot_general over t LOWERS), vs the production v6
    two-kernel path. Rows are (t, f) instead of (f, t) so dense1 runs as a
    t-batched MXU contraction on the conv output IN-KERNEL — no flatten
    copy, no dense-stage HBM round-trip, labels leave the kernel."""
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        expand_conv1_weights, expand_tap_planes, pack_conv2_weights_tap384,
        pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    w3p = pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN)
    w3_3d = jnp.asarray(np.asarray(w3p).reshape(T_IN, 128, 256))
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    all_consts = [jnp.asarray(a) for a in
                  (w1e, qm.m1, qm.o1, w2k, m2p, o2p)] + [w3_3d] + [
                  jnp.asarray(a) for a in (qm.m3, qm.o3, w4, s4, b4)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    dense_work = 2 * BATCH * (T_IN * 128 * 256 + 256 * 128)
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))

    # ---- production v6 (dbb=512) end-to-end
    classify6 = infer.make_int8_classifier_v6(qm)
    sec = chain("r3d v6 production classifier", classify6, x0,
                work=conv_work + dense_work)
    print(f"   -> v6: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)

    # ---- v7 whole-net t-major kernel
    def _whole_v7_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                         o2_ref, w3_ref, m3_ref, o3_ref, w4_ref, s4_ref,
                         b4_ref, o_ref, a3_scr, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]  # (chunk, 8, T)
            xe = jnp.transpose(xt, (2, 0, 1)).reshape(t_len * chunk, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        for ci in range(n):
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            if ci + 1 < n:
                a1 = dot1(ci + 1)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(t_len, chunk, 3 * 128)
            s = (z[0 : t_len - 2, :, 0:128]
                 + z[1 : t_len - 1, :, 128:256]
                 + z[2:t_len, :, 256:384])
            s = jnp.pad(s, ((0, 2), (0, 0), (0, 0)))
            sq = requantize(s, m2_ref[:], o2_ref[:], relu=True)
            p = jax.lax.dot_general(
                sq, w3_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (T, chunk, 256)
            d1 = jnp.sum(p, axis=0)
            a3_scr[ci * chunk : (ci + 1) * chunk] = requantize(
                d1, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3_scr[:], w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    def whole7(bb=64, ch=16):
        specs = ([pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                 + [_spec(a) for a in all_consts[:6]]
                 + [pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))]
                 + [_spec(a) for a in all_consts[7:]])

        def f(x):
            x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0
                            ).astype(jnp.int8)
            xp = expand_tap_planes(x_i8)
            return pl.pallas_call(
                functools.partial(_whole_v7_kernel, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=specs,
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bb, 256), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(xp, *all_consts)
        return f

    for bb, ch in ((64, 16), (64, 8), (128, 16), (256, 32)):
        try:
            sec = chain(f"r3d v7 WHOLE-NET t-major bb={bb} ch={ch}",
                        whole7(bb, ch), x0, work=conv_work + dense_work)
            print(f"   -> v7: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v7 bb={bb} ch={ch}: FAILS ({str(e)[:160]})", flush=True)

    # ---- gather-free normalize re-measure
    from modulationdetectioncnn_tpu import config as _cfgmod
    from modulationdetectioncnn_tpu.dsp import normalize

    sc = _cfgmod.AmcConfig().stream
    fr0 = jnp.asarray(
        rng.standard_normal((16, BATCH // 16, 2, 128)).astype(np.float32))
    sec = chain("r3d cfo est+correct (gather-free)",
                lambda fr: normalize.correct_cfo(
                    fr, normalize.estimate_cfo(fr)), fr0, batch=BATCH)
    sec = chain("r3d timing est+correct (gather-free)",
                lambda fr: normalize.correct_timing(
                    fr, normalize.estimate_timing(fr, sc.sps), sc.sps,
                    sc.timing_phases), fr0, batch=BATCH)


# ----------------------------------------------------------------------- r3e
def probe_r3e():
    """Round-3 probe 5: v8 whole-net (f-major conv, sublane-only transpose
    before a t-batched dense1 dot — v7 lost to its LANE-relayout input
    transpose) + localization of v6-full's ~540us gap beyond its parts."""
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v6_kernel, _dense_argmax_int8_kernel,
        expand_conv1_weights, expand_tap_planes, pack_conv2_weights_tap384,
        pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    w3p = pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN)
    w3_3d = jnp.asarray(np.asarray(w3p).reshape(T_IN, 128, 256))
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (w3p, qm.m3, qm.o3, w4, s4, b4)]
    all_consts = conv_consts + [w3_3d] + [jnp.asarray(a) for a in
                                          (qm.m3, qm.o3, w4, s4, b4)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    dense_work = 2 * BATCH * (T_IN * 128 * 256 + 256 * 128)
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def conv6(xp, bb=64, ch=16):
        return pl.pallas_call(
            functools.partial(_conv_stage_int8_v6_kernel, chunk=ch),
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xp, *conv_consts)

    def dense(h2, dbb=512):
        return pl.pallas_call(
            functools.partial(_dense_argmax_int8_kernel, nc=11),
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN * 128), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(h2, *dense_consts)

    # ---- localization
    try:
        chain("r3e conv alone (re-confirm)", conv6, xp0, work=conv_work)
        chain("r3e prologue+conv",
              lambda x: conv6(expand_tap_planes(
                  jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0
                           ).astype(jnp.int8))), x0, work=conv_work)
        chain("r3e conv+reshape+dense (xp in)",
              lambda xp: dense(conv6(xp).reshape(BATCH, T_IN * 128)), xp0,
              work=conv_work + dense_work)
        h0 = jnp.asarray(
            rng.integers(0, 80, (BATCH, T_IN * 128), np.int32)
            .astype(np.int8))
        chain("r3e dense alone dbb=512 (re-confirm)", dense, h0,
              work=dense_work)
    except Exception as e:  # noqa: BLE001
        print(f"localization: FAILS ({str(e)[:140]})", flush=True)

    # ---- v8 whole-net kernel
    def _whole_v8_kernel(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                         o2_ref, w3_ref, m3_ref, o3_ref, w4_ref, s4_ref,
                         b4_ref, o_ref, a3_scr, *, chunk):
        tb = xp_ref.shape[0]
        t_len = xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        for ci in range(n):
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            if ci + 1 < n:
                a1 = dot1(ci + 1)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            sq = requantize(s, m2_ref[:], o2_ref[:], relu=True)
            sqT = jnp.transpose(sq, (1, 0, 2))  # sublane-only permutation
            p = jax.lax.dot_general(
                sqT, w3_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (T, chunk, 256)
            d1 = jnp.sum(p, axis=0)
            a3_scr[ci * chunk : (ci + 1) * chunk] = requantize(
                d1, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3_scr[:], w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    def whole8(bb=64, ch=16, semantics="arbitrary"):
        specs = ([pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                 + [_spec(a) for a in all_consts[:6]]
                 + [pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))]
                 + [_spec(a) for a in all_consts[7:]])

        def f(x):
            x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0
                            ).astype(jnp.int8)
            xp = expand_tap_planes(x_i8)
            return pl.pallas_call(
                functools.partial(_whole_v8_kernel, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=specs,
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bb, 256), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(semantics,)),
            )(xp, *all_consts)
        return f

    for bb, ch in ((64, 16), (64, 8), (128, 16)):
        try:
            sec = chain(f"r3e v8 WHOLE-NET bb={bb} ch={ch}",
                        whole8(bb, ch), x0, work=conv_work + dense_work)
            print(f"   -> v8: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v8 bb={bb} ch={ch}: FAILS ({str(e)[:160]})", flush=True)


# ----------------------------------------------------------------------- r3f
def probe_r3f():
    """Round-3 probe 6 (final perf probe): prologue-layout variants feeding
    the real conv kernel (the XLA prologue costs ~169us WHEN FEEDING the
    custom call — the standalone honest number was 13us — because the
    tap-plane build + tiled->dense operand copy fuse badly), plus a
    same-process plain-vs-pipelined conv pair to resolve the 751-vs-1003
    process variance, and a B=8192 v6."""
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v4_kernel, _conv_stage_int8_v6_kernel,
        expand_conv1_weights, expand_tap_planes, pack_conv2_weights_tap384,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def conv_run(kern, bb=64, ch=16):
        def f(xp):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))]
                + [_spec(a) for a in conv_consts],
                out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xp, *conv_consts)
        return f

    # same-process variance pair
    chain("r3f conv PLAIN (v4 kernel)", conv_run(_conv_stage_int8_v4_kernel),
          xp0, work=conv_work)
    chain("r3f conv PIPELINED (v6 kernel)",
          conv_run(_conv_stage_int8_v6_kernel), xp0, work=conv_work)

    convp = conv_run(_conv_stage_int8_v6_kernel)

    # f1: current prologue formulation
    def pro_stack(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        return expand_tap_planes(x_i8)

    chain("r3f pro(stack)+conv", lambda x: convp(pro_stack(x)), x0,
          work=conv_work)

    # f2: build planes by padding the quantized input and concatenating
    # precomputed zero-shifted copies via jnp.concatenate on axis 1
    def pro_concat(x):
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        t1 = x.shape[-1] - 2
        cols = [
            jnp.pad(x_i8[:, h : h + 1, k : k + t1], [(0, 0), (0, 0), (0, 2)])
            for h in range(2) for k in range(3)
        ]
        zeros = jnp.zeros((x.shape[0], 2, x.shape[-1]), jnp.int8)
        return jnp.concatenate(cols + [zeros], axis=1)

    chain("r3f pro(concat)+conv", lambda x: convp(pro_concat(x)), x0,
          work=conv_work)

    # f3: pallas prologue kernel writing the dense operand directly
    def _pro_kernel(x_ref, o_ref, *, inv):
        xq = jnp.clip(jnp.round(x_ref[:] * inv), -127.0, 127.0
                      ).astype(jnp.int8)  # (bb, 2, T)
        t_len = x_ref.shape[2]
        t1 = t_len - 2
        for h in range(2):
            for k in range(3):
                plane = xq[:, h, k : k + t1]
                o_ref[:, h * 3 + k, :] = jnp.pad(plane, ((0, 0), (0, 2)))
        o_ref[:, 6, :] = jnp.zeros_like(xq[:, 0, :])
        o_ref[:, 7, :] = jnp.zeros_like(xq[:, 0, :])

    def pro_pallas(x, bb=256):
        return pl.pallas_call(
            functools.partial(_pro_kernel, inv=inv_sx),
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 8, T_IN), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)

    try:
        chain("r3f pro(pallas)+conv", lambda x: convp(pro_pallas(x)), x0,
              work=conv_work)
    except Exception as e:  # noqa: BLE001
        print(f"pro(pallas): FAILS ({str(e)[:140]})", flush=True)

    # f4: full v6 at B=8192
    classify6 = infer.make_int8_classifier_v6(qm)
    x8 = jnp.asarray(
        rng.standard_normal((8192, 2, 128)).astype(np.float32))
    sec = chain("r3f v6 full B=8192", classify6, x8, batch=8192,
                work=2 * conv_work)
    print(f"   -> v6 B=8192: {8192 * 128 / sec / 1e6:.1f} MS/s", flush=True)
    sec = chain("r3f v6 full B=4096 (same process)", classify6, x0,
                work=conv_work)
    print(f"   -> v6 B=4096: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)


# ----------------------------------------------------------------------- r3h
def probe_r3h():
    """Round-3 probe 8: WHY doesn't the v6 'pipelining' overlap MXU/VPU?
    (r3f: v6 gains only 34us over plain v4 — conv sits at 1065us vs the
    599us all-MXU floor.) Hypothesis: v6 issues dot1(ci+1) AFTER rq1(ci),
    so the MXU idles through the 324us-per-batch requantize anyway. Probes:
      base   v6 as-is (order: rq1 -> dot1(ci+1) -> dot2)
      early  dot1(ci+1) issued BEFORE rq1(ci)
      epi    2-deep: chunk ci's epilogue (shift-add+rq2+store) and the rq1
             for chunk ci+1 both placed AFTER the next two MXU dots issue
      norq   rq1 replaced by a cheap int32->int8 truncation (NOT exact;
             bounds the MXU-only cost incl. transposes)
      pro    winner structure reading raw (bb,2,T) f32: quantize + tap
             planes built in-kernel as one pad + 3 sublane-shifted 2-lane
             concats (v9 dot1 formulation) — kills the 182us XLA prologue
      xla    pure-XLA int8 e2e baseline (infer_xla) for the same batch
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        expand_conv1_weights, expand_conv1_weights_v9, expand_tap_planes,
        pack_conv2_weights_tap384,
    )
    from modulationdetectioncnn_tpu.ops.infer_xla import make_int8_forward_xla

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    w1v9 = expand_conv1_weights_v9(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    pro_consts = [jnp.asarray(a) for a in (w1v9, qm.m1, qm.o1, w2k, m2p, o2p)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def shift_add(z, t_len):
        s = (z[:, 0 : t_len - 2, 0:128]
             + z[:, 1 : t_len - 1, 128:256]
             + z[:, 2:t_len, 256:384])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

    def kern_early(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                   o_ref, *, chunk):
        tb, t_len = xp_ref.shape[0], xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1 = dot1(0)
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None  # MXU first
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)  # VPU
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                shift_add(z, t_len), m2_ref[:], o2_ref[:], relu=True)
            a1 = a1_next

    def kern_epi(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                 o_ref, *, chunk):
        tb, t_len = xp_ref.shape[0], xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None  # MXU
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)                # MXU
            if z_prev is not None:                          # VPU (prev)
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:                         # VPU (next)
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)

    def kern_norq(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                  o_ref, *, chunk):
        tb, t_len = xp_ref.shape[0], xp_ref.shape[2]
        for ci in range(tb // chunk):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            a1q = a1.astype(jnp.int8)  # NOT exact: MXU-only cost bound
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            o_ref[ci * chunk : (ci + 1) * chunk] = shift_add(
                z, t_len).astype(jnp.int8)

    def kern_pro(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                 o_ref, *, chunk):
        tb, t_len = x_ref.shape[0], x_ref.shape[2]
        m = chunk * t_len
        n = tb // chunk

        def dot1(ci):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]
            xt = jnp.swapaxes(xb, 1, 2).reshape(m, 2)
            xq = jnp.clip(jnp.round(xt * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            xqp = jnp.pad(xq, ((0, 2), (0, 6)))
            xe = jnp.concatenate(
                [xqp[0:m, 0:2], xqp[1 : 1 + m, 0:2], xqp[2 : 2 + m, 0:2],
                 xqp[0:m, 2:4]], axis=1)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)

    def run_kern(kern, consts, x, bb, ch, in_spec):
        def f(xin):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[in_spec(bb)] + [_spec(a) for a in consts],
                out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xin, *consts)
        return f

    plane_spec = lambda bb: pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0))
    f32_spec = lambda bb: pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))

    from modulationdetectioncnn_tpu.ops.infer import _conv_stage_int8_v6_kernel
    chain("r3h base v6 ch=16", run_kern(
        _conv_stage_int8_v6_kernel, conv_consts, xp0, 64, 16, plane_spec),
        xp0, work=conv_work)
    for ch in (8, 16, 32):
        try:
            chain(f"r3h early ch={ch}", run_kern(
                kern_early, conv_consts, xp0, 64, ch, plane_spec),
                xp0, work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"early ch={ch}: FAILS ({str(e)[:110]})", flush=True)
    for ch in (8, 16, 32):
        try:
            chain(f"r3h epi   ch={ch}", run_kern(
                kern_epi, conv_consts, xp0, 64, ch, plane_spec),
                xp0, work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"epi ch={ch}: FAILS ({str(e)[:110]})", flush=True)
    try:
        chain("r3h norq ch=16 (MXU bound, inexact)", run_kern(
            kern_norq, conv_consts, xp0, 64, 16, plane_spec),
            xp0, work=conv_work)
    except Exception as e:  # noqa: BLE001
        print(f"norq: FAILS ({str(e)[:110]})", flush=True)
    for ch in (8, 16):
        try:
            chain(f"r3h pro(f32-in) ch={ch}", run_kern(
                kern_pro, pro_consts, x0, 64, ch, f32_spec),
                x0, work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"pro ch={ch}: FAILS ({str(e)[:130]})", flush=True)

    fx = make_int8_forward_xla(qm)
    cls_xla = jax.jit(lambda xb: jnp.argmax(fx(xb), -1))
    sec = chain("r3h XLA int8 e2e", cls_xla, x0, work=conv_work)
    print(f"   -> xla_int8: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)


# ----------------------------------------------------------------------- r3i
def probe_r3i():
    """Round-3 probe 9: push the epi-pipelined conv (r3h: 897us at ch=16,
    norq bound 738us) and find a prologue formulation Mosaic will compile.

      epi bb sweep    block_b 32/64/128 at ch=16 (VMEM pressure vs grid)
      epi-split       rq1 split in column halves, interleaved between the
                      two conv2 N-halves (finer MXU/VPU alternation)
      proK1..proK3    standalone prologue pallas kernels isolating the
                      r3f/r3h compile crash: K1 = int8 lane-slices + single
                      full store; K2 = all-f32 build, quantize last; K3 =
                      per-plane o_ref[:, j, :] stores (r3f's form)
      convC1          conv kernel reading raw f32, tap build in f32 concat
                      then ONE quantize (avoids narrow int8 slice/concat)
      bsweep          best conv variant at B=2048/4096/8192
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        expand_conv1_weights, expand_conv1_weights_v9, expand_tap_planes,
        pack_conv2_weights_tap384,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1e = expand_conv1_weights(qm.w1p)
    w1v9 = expand_conv1_weights_v9(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    pro_consts = [jnp.asarray(a) for a in (w1v9, qm.m1, qm.o1, w2k, m2p, o2p)]
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
    xp0 = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 8, T_IN), np.int32).astype(np.int8))

    def shift_add(z, t_len):
        s = (z[:, 0 : t_len - 2, 0:128]
             + z[:, 1 : t_len - 1, 128:256]
             + z[:, 2:t_len, 256:384])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

    def kern_epi(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                 o_ref, *, chunk):
        tb, t_len = xp_ref.shape[0], xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)

    def kern_episplit(xp_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                      o_ref, *, chunk):
        """epi + conv2 issued as two N=192 halves with the next chunk's rq1
        column-halves interleaved between them."""
        tb, t_len = xp_ref.shape[0], xp_ref.shape[2]
        n = tb // chunk

        def dot1(ci):
            xt = xp_ref[ci * chunk : (ci + 1) * chunk]
            xe = jnp.swapaxes(xt, 1, 2).reshape(chunk * t_len, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def rq_half(a1, h):
            cols = slice(h * 256, (h + 1) * 256)
            return requantize(a1[:, cols], m1_ref[cols], o1_ref[cols],
                              relu=True)

        a1 = dot1(0)
        a1q = jnp.concatenate([rq_half(a1, 0), rq_half(a1, 1)], axis=1)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            zl = jax.lax.dot_general(
                a1q, w2_ref[:, 0:192], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h0 = rq_half(a1_next, 0) if a1_next is not None else None
            zr = jax.lax.dot_general(
                a1q, w2_ref[:, 192:384], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h1 = rq_half(a1_next, 1) if a1_next is not None else None
            z = jnp.concatenate([zl, zr], axis=1).reshape(
                chunk, t_len, 3 * 128)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:
                a1q = jnp.concatenate([h0, h1], axis=1)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)

    def run_conv(kern, consts, bb, ch, in_shape, batch=BATCH):
        def f(xin):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(batch // bb,),
                in_specs=[pl.BlockSpec((bb,) + in_shape,
                                       lambda i: (i, 0, 0))]
                + [_spec(a) for a in consts],
                out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((batch, T_IN, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(xin, *consts)
        return f

    for bb in (32, 64, 128):
        try:
            chain(f"r3i epi ch=16 bb={bb}",
                  run_conv(kern_epi, conv_consts, bb, 16, (8, T_IN)),
                  xp0, work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"epi bb={bb}: FAILS ({str(e)[:110]})", flush=True)
    try:
        chain("r3i episplit ch=16 bb=64",
              run_conv(kern_episplit, conv_consts, 64, 16, (8, T_IN)),
              xp0, work=conv_work)
    except Exception as e:  # noqa: BLE001
        print(f"episplit: FAILS ({str(e)[:110]})", flush=True)

    # ---- prologue kernels: isolate the Mosaic crash
    def proK1(x_ref, o_ref):  # int8 lane-slices, one full store
        xq = jnp.clip(jnp.round(x_ref[:] * inv_sx), -127.0, 127.0
                      ).astype(jnp.int8)                   # (bb, 2, T)
        t_len = x_ref.shape[2]
        t1 = t_len - 2
        cols = [jnp.pad(xq[:, h, k : k + t1], ((0, 0), (0, 2)))
                for h in range(2) for k in range(3)]
        xp = jnp.stack(cols, axis=-2)                      # (bb, 6, T)
        o_ref[:] = jnp.pad(xp, ((0, 0), (0, 2), (0, 0)))

    def proK2(x_ref, o_ref):  # all-f32 build, quantize last
        xf = x_ref[:]                                      # (bb, 2, T) f32
        t_len = x_ref.shape[2]
        t1 = t_len - 2
        cols = [jnp.pad(xf[:, h, k : k + t1], ((0, 0), (0, 2)))
                for h in range(2) for k in range(3)]
        xp = jnp.pad(jnp.stack(cols, axis=-2), ((0, 0), (0, 2), (0, 0)))
        o_ref[:] = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0
                            ).astype(jnp.int8)

    def proK3(x_ref, o_ref):  # r3f's per-plane stores
        xq = jnp.clip(jnp.round(x_ref[:] * inv_sx), -127.0, 127.0
                      ).astype(jnp.int8)
        t_len = x_ref.shape[2]
        t1 = t_len - 2
        for h in range(2):
            for k in range(3):
                o_ref[:, h * 3 + k, :] = jnp.pad(
                    xq[:, h, k : k + t1], ((0, 0), (0, 2)))
        o_ref[:, 6, :] = jnp.zeros_like(xq[:, 0, :])
        o_ref[:, 7, :] = jnp.zeros_like(xq[:, 0, :])

    def run_pro(kern, bb=256):
        def f(x):
            return pl.pallas_call(
                kern, grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((bb, 8, T_IN), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 8, T_IN), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x)
        return f

    for name, k in (("proK1 i8-slices", proK1), ("proK2 f32-build", proK2),
                    ("proK3 per-plane-store", proK3)):
        try:
            chain(f"r3i {name}", run_pro(k), x0, work=None)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:110]})", flush=True)

    # ---- convC1: raw f32 in, taps built in f32, ONE quantize, epi pipeline
    def kern_convC1(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                    o_ref, *, chunk):
        tb, t_len = x_ref.shape[0], x_ref.shape[2]
        m = chunk * t_len
        n = tb // chunk

        def dot1(ci):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]      # (chunk, 2, T) f32
            xt = jnp.swapaxes(xb, 1, 2).reshape(m, 2)
            xtp = jnp.pad(xt, ((0, 2), (0, 6)))
            xe_f = jnp.concatenate(
                [xtp[0:m, 0:2], xtp[1 : 1 + m, 0:2], xtp[2 : 2 + m, 0:2],
                 xtp[0:m, 2:4]], axis=1)                   # (m, 8) f32
            xe = jnp.clip(jnp.round(xe_f * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add(z_prev, t_len), m2_ref[:], o2_ref[:], relu=True)

    for ch in (16,):
        try:
            chain(f"r3i convC1 f32-in ch={ch}",
                  run_conv(kern_convC1, pro_consts, 64, ch, (2, T_IN)),
                  x0, work=conv_work)
        except Exception as e:  # noqa: BLE001
            print(f"convC1: FAILS ({str(e)[:130]})", flush=True)

    # ---- batch sweep of epi ch=16
    for b in (2048, 8192):
        xb = jnp.asarray(rng.integers(-127, 127, (b, 8, T_IN), np.int32
                                      ).astype(np.int8))
        try:
            chain(f"r3i epi ch=16 B={b}",
                  run_conv(kern_epi, conv_consts, 64, 16, (8, T_IN),
                           batch=b),
                  xb, batch=b, work=conv_work * b // BATCH)
        except Exception as e:  # noqa: BLE001
            print(f"B={b}: FAILS ({str(e)[:110]})", flush=True)


# ----------------------------------------------------------------------- r3k
def probe_r3k():
    """Round-3 probe 10: fuse dense1/dense2/argmax INTO the v7 conv kernel.

    bench_r3.json: v7 full = conv 1125us + dense 148us + glue 49us. The
    batched-over-t dense1 lost big (r3e v8: +900us), but a MULTI-DIM
    contraction dot_general (contract (t, c) x (t, c, n) in ONE op, no
    batch dims) may lower better. Probes:
      mdfeas   standalone multi-dim contraction feasibility + rate
      v10      whole-net: v7 conv + per-chunk multi-dim dense1 into a
               VMEM scratch + dense2/argmax at block end
      v7ref    same-process v7 full reference
    """
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        expand_conv1_weights_v9, pack_conv2_weights_tap384,
        pack_dense1_weights_v3,
    )

    qm = _qm()
    inv_sx = float(1.0 / qm.s_x)
    c2 = qm.m2.shape[0]
    w1v9 = expand_conv1_weights_v9(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    w3p = pack_dense1_weights_v3(qm.w3, T_IN - 4, c2, T_IN)
    w3_3d = jnp.asarray(np.asarray(w3p).reshape(T_IN, 128, 256))
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    all_consts = ([jnp.asarray(a) for a in (w1v9, qm.m1, qm.o1, w2k, m2p,
                                            o2p)]
                  + [w3_3d]
                  + [jnp.asarray(a) for a in (qm.m3, qm.o3, w4, s4, b4)])
    conv_work = 2 * BATCH * T_IN * (8 + 3 * 128) * 512
    dense_work = 2 * BATCH * (T_IN * 128 * 256 + 256 * 128)
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, 128)).astype(np.float32))

    # ---- A. multi-dim contraction feasibility: (bb, T, 128) x (T, 128, N)
    def _md_kernel(s_ref, w3_ref, o_ref):
        p = jax.lax.dot_general(
            s_ref[:], w3_ref[:], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = p

    s0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, T_IN, 128), np.int32).astype(np.int8))

    def md(dbb=512):
        return lambda sb: pl.pallas_call(
            _md_kernel,
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, T_IN, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((dbb, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(sb, w3_3d)
    for dbb in (256, 512):
        try:
            chain(f"r3k multi-dim dense1 dbb={dbb}", md(dbb), s0,
                  work=2 * BATCH * T_IN * 128 * 256)
        except Exception as e:  # noqa: BLE001
            print(f"md dbb={dbb}: FAILS ({str(e)[:120]})", flush=True)

    # ---- B. v10 whole-net
    def kern_v10(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                 w3_ref, m3_ref, o3_ref, w4_ref, s4_ref, b4_ref, o_ref,
                 a3_scr, *, chunk):
        tb, t_len = x_ref.shape[0], x_ref.shape[2]
        m = chunk * t_len
        n = tb // chunk

        def dot1(ci):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]
            xp = jnp.concatenate(
                [xb, pltpu.roll(xb, t_len - 1, 2), pltpu.roll(xb, t_len - 2, 2),
                 jnp.zeros_like(xb)], axis=1)
            xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            xe = jnp.swapaxes(xq, 1, 2).reshape(m, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def shift_add(z):
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

        def dense1(ci, sq):
            p = jax.lax.dot_general(
                sq, w3_ref[:], (((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.int32)
            a3_scr[ci * chunk : (ci + 1) * chunk] = requantize(
                p, m3_ref[:], o3_ref[:], relu=True)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 3 * 128)
            if z_prev is not None:
                dense1(ci - 1, requantize(
                    shift_add(z_prev), m2_ref[:], o2_ref[:], relu=True))
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        dense1(n - 1, requantize(
            shift_add(z_prev), m2_ref[:], o2_ref[:], relu=True))
        acc4 = jax.lax.dot_general(
            a3_scr[:], w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    def v10(bb=64, ch=8):
        specs = ([pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))]
                 + [_spec(a) for a in all_consts[:6]]
                 + [pl.BlockSpec((T_IN, 128, 256), lambda i: (0, 0, 0))]
                 + [_spec(a) for a in all_consts[7:]])

        def f(x):
            return pl.pallas_call(
                functools.partial(kern_v10, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=specs,
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bb, 256), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *all_consts)
        return f

    for bb, ch in ((64, 8), (64, 16), (128, 8)):
        try:
            sec = chain(f"r3k v10 WHOLE-NET bb={bb} ch={ch}", v10(bb, ch),
                        x0, work=conv_work + dense_work)
            print(f"   -> v10: {BATCH * 128 / sec / 1e6:.1f} MS/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v10 bb={bb} ch={ch}: FAILS ({str(e)[:130]})", flush=True)

    classify7 = infer.make_int8_classifier_v7(qm)
    sec = chain("r3k v7 full (same-process ref)", classify7, x0,
                work=conv_work + dense_work)
    print(f"   -> v7: {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)


# ----------------------------------------------------------------------- r4
def probe_r4():
    """v8 candidate: TRANSPOSED conv stage — time on lanes (128/frame, zero
    N padding), channels on sublanes (240 = 3 taps x 80, zero M padding).
    Cuts padded MACs 29.9M -> ~19M/frame (VERDICT r3 next #1). Risks probed:
      (a) pltpu.roll on int32 lanes (int8 roll crashes Mosaic, r3i);
      (b) in-kernel (80, chunk, 128) -> (chunk, 80, 128) int8 store swap
          (non-lane axes swap — lane dim untouched, unlike the r2 8<->128
          sublane<->lane relayout);
      (c) transposed dot orientation (240, 512) @ (512, m);
      (d) full v8 conv stage prototype;
      (e) dense from (80, B, 128) via loop-over-co dots (transpose-free alt).
    """
    t_len = 128
    m = CH * t_len  # per-chunk lanes
    inv_sx = np.float32(1.27)
    w1t = jnp.asarray(rng.integers(-100, 100, (512, 8)).astype(np.int8))
    w2s = jnp.asarray(rng.integers(-100, 100, (240, 512)).astype(np.int8))
    m1 = jnp.asarray(rng.random((512, 1)).astype(np.float32) * 1e-3)
    o1 = jnp.asarray(rng.random((512, 1)).astype(np.float32))
    m2 = jnp.asarray(rng.random((80, 1)).astype(np.float32) * 1e-3)
    o2 = jnp.asarray(rng.random((80, 1)).astype(np.float32))
    conv_work = 2 * BATCH * (128 * 8 * 512 + 240 * 512 * 128)

    # (a) int32 lane roll
    def k_roll(x_ref, o_ref):
        o_ref[:] = x_ref[:] + pltpu.roll(x_ref[:], x_ref.shape[1] - 1, 1)

    def f_roll(x):
        return pl.pallas_call(
            k_roll,
            grid=(16,),
            in_specs=[pl.BlockSpec((80, 2048), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((80, 2048), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((16 * 80, 2048), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)

    xr = jnp.asarray(rng.integers(-1000, 1000, (16 * 80, 2048), np.int32))
    try:
        chain("(a) int32 lane roll (80,2048)x16", f_roll, xr, batch=16 * 80)
    except Exception as e:  # noqa: BLE001
        print(f"(a) int32 roll: FAILS ({str(e)[:160]})", flush=True)

    # (b) non-lane-axes swap store
    def k_swap(x_ref, o_ref, *, chunk):
        nci = x_ref.shape[1] // chunk
        for ci in range(nci):
            blk = x_ref[:, ci * chunk : (ci + 1) * chunk, :]
            o_ref[ci * chunk : (ci + 1) * chunk] = jnp.swapaxes(blk, 0, 1)

    def f_swap(x):
        return pl.pallas_call(
            functools.partial(k_swap, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((80, BB, 128), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((BB, 80, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 80, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)

    xs = jnp.asarray(
        rng.integers(-127, 127, (80, BATCH, 128), np.int32).astype(np.int8))
    try:
        chain("(b) swap store (80,B,128)->(B,80,128)", f_swap, xs)
    except Exception as e:  # noqa: BLE001
        print(f"(b) swap store: FAILS ({str(e)[:160]})", flush=True)

    # (c) transposed conv2 dot only: (240,512)@(512,m) + i8 store
    def k_dotT(a_ref, w_ref, o_ref, *, chunk):
        nci = a_ref.shape[1] // (chunk * t_len)
        for ci in range(nci):
            a = a_ref[:, ci * m : (ci + 1) * m]
            z = jax.lax.dot_general(
                w_ref[:], a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:, ci * m : (ci + 1) * m] = (z >> 9).astype(jnp.int8)

    def f_dotT(a):
        return pl.pallas_call(
            functools.partial(k_dotT, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((512, BB * t_len), lambda i: (0, i)),
                      pl.BlockSpec((240, 512), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((240, BB * t_len), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((240, BATCH * t_len), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(a, w2s)

    aT = jnp.asarray(
        rng.integers(0, 127, (512, BATCH * t_len), np.int32).astype(np.int8))
    try:
        chain("(c) dotT (240,512)@(512,2048)/chunk", f_dotT, aT,
              work=2 * BATCH * 240 * 512 * 128)
    except Exception as e:  # noqa: BLE001
        print(f"(c) dotT: FAILS ({str(e)[:160]})", flush=True)

    # (d) full v8 conv stage prototype
    def k_v8(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
             *, chunk):
        nci = x_ref.shape[1] // (chunk * t_len)
        for ci in range(nci):
            xb = x_ref[:, ci * m : (ci + 1) * m]  # (2, m) f32
            xp = jnp.concatenate(
                [xb, pltpu.roll(xb, m - 1, 1), pltpu.roll(xb, m - 2, 1),
                 jnp.zeros_like(xb)], axis=0)  # (8, m): row 2k+h
            xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            a1 = jax.lax.dot_general(
                w1_ref[:], xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (512, m)
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                w2_ref[:], a1q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (240, m)
            s = (z[0:80] + pltpu.roll(z[80:160], m - 1, 1)
                 + pltpu.roll(z[160:240], m - 2, 1))
            out = requantize(s, m2_ref[:], o2_ref[:], relu=True)  # (80, m)
            o_ref[ci * chunk : (ci + 1) * chunk] = jnp.swapaxes(
                out.reshape(80, chunk, t_len), 0, 1)

    consts = [w1t, m1, o1, w2s, m2, o2]

    def f_v8(x):
        return pl.pallas_call(
            functools.partial(k_v8, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((2, BB * t_len), lambda i: (0, i))]
            + [_spec(c) for c in consts],
            out_specs=pl.BlockSpec((BB, 80, t_len), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 80, t_len), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *consts)

    xw = jnp.asarray(
        rng.standard_normal((2, BATCH * t_len)).astype(np.float32))
    try:
        sec = chain("(d) v8 conv stage full", f_v8, xw, work=conv_work)
        print(f"   -> conv-only rate: {BATCH * 128 / sec / 1e6:.1f} MS/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(d) v8 conv: FAILS ({str(e)[:300]})", flush=True)

    # (d2) v8 with 2-deep epilogue pipelining (v7-style order)
    def k_v8p(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
              *, chunk):
        nci = x_ref.shape[1] // (chunk * t_len)

        def dot1(ci):
            xb = x_ref[:, ci * m : (ci + 1) * m]
            xp = jnp.concatenate(
                [xb, pltpu.roll(xb, m - 1, 1), pltpu.roll(xb, m - 2, 1),
                 jnp.zeros_like(xb)], axis=0)
            xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            return jax.lax.dot_general(
                w1_ref[:], xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def epi(z, ci):
            s = (z[0:80] + pltpu.roll(z[80:160], m - 1, 1)
                 + pltpu.roll(z[160:240], m - 2, 1))
            out = requantize(s, m2_ref[:], o2_ref[:], relu=True)
            o_ref[ci * chunk : (ci + 1) * chunk] = jnp.swapaxes(
                out.reshape(80, chunk, t_len), 0, 1)

        a1q = requantize(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(nci):
            a1_next = dot1(ci + 1) if ci + 1 < nci else None
            z = jax.lax.dot_general(
                w2_ref[:], a1q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if z_prev is not None:
                epi(z_prev, ci - 1)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        epi(z_prev, nci - 1)

    def f_v8p(x):
        return pl.pallas_call(
            functools.partial(k_v8p, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((2, BB * t_len), lambda i: (0, i))]
            + [_spec(c) for c in consts],
            out_specs=pl.BlockSpec((BB, 80, t_len), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 80, t_len), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *consts)

    try:
        sec = chain("(d2) v8 conv stage pipelined", f_v8p, xw,
                    work=conv_work)
        print(f"   -> conv-only rate: {BATCH * 128 / sec / 1e6:.1f} MS/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(d2) v8 pipelined: FAILS ({str(e)[:300]})", flush=True)

    # (e) dense variants on the new K=10240 layout
    w3a = jnp.asarray(rng.integers(-100, 100, (80 * 128, 256)
                                   ).astype(np.int8))
    m3 = jnp.asarray(rng.random(256).astype(np.float32) * 1e-3)
    o3 = jnp.asarray(rng.random(256).astype(np.float32))
    w4 = jnp.asarray(rng.integers(-100, 100, (256, 128)).astype(np.int8))
    s4 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    b4 = jnp.asarray(rng.random(128).astype(np.float32))
    dense_work = 2 * BATCH * (80 * 128 * 256 + 256 * 128)

    from modulationdetectioncnn_tpu.ops.infer import _dense_argmax_int8_kernel
    dcs = [w3a, m3, o3, w4, s4, b4]

    def f_dense_flat(h):
        dbb = 256
        return pl.pallas_call(
            functools.partial(_dense_argmax_int8_kernel, nc=11),
            grid=(BATCH // dbb,),
            in_specs=[pl.BlockSpec((dbb, 80 * 128), lambda i: (i, 0))]
            + [_spec(c) for c in dcs],
            out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(h, *dcs)

    hf = jnp.asarray(rng.integers(0, 127, (BATCH, 80 * 128), np.int32
                                  ).astype(np.int8))
    try:
        chain("(e) dense+argmax K=10240 flat", f_dense_flat, hf,
              work=dense_work)
    except Exception as e:  # noqa: BLE001
        print(f"(e) dense flat: FAILS ({str(e)[:160]})", flush=True)


# ---------------------------------------------------------------------- r4b
def probe_r4b():
    """v8b candidate: v7 orientation (activations stream on M, weights
    stationary) with conv2 packed N=384 -> 256 (taps at lane offsets
    0/80/160) and the shift-add done with int32 lane ROLLS (proven 8 ns/frame
    in r4(a)). Cuts conv2 padded MACs 25.2M -> 16.8M/frame.
    Variants: plain, v7-style epilogue pipelining, fused conv+dense.
    """
    t_len = 128
    inv_sx = np.float32(1.27)
    w1e = jnp.asarray(rng.integers(-100, 100, (8, 512)).astype(np.int8))
    w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
    m1 = jnp.asarray(rng.random(512).astype(np.float32) * 1e-3)
    o1 = jnp.asarray(rng.random(512).astype(np.float32))
    m2 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    o2 = jnp.asarray(rng.random(128).astype(np.float32))
    conv_work = 2 * BATCH * t_len * (8 + 256) * 512
    consts = [w1e, m1, o1, w2r, m2, o2]
    xw = jnp.asarray(
        rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))

    def dot1(x_ref, w1_ref, ci, chunk, interp=False):
        m = chunk * t_len
        xb = x_ref[ci * chunk : (ci + 1) * chunk]      # (chunk, 2, T) f32
        xp = jnp.concatenate(
            [xb, pltpu.roll(xb, t_len - 1, 2), pltpu.roll(xb, t_len - 2, 2),
             jnp.zeros_like(xb)], axis=1)              # (chunk, 8, T)
        xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0).astype(jnp.int8)
        xe = jnp.swapaxes(xq, 1, 2).reshape(m, 8)
        return jax.lax.dot_general(
            xe, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def shift_add_roll(z, chunk):
        # z (chunk, T, 256) int32; taps at lane offsets 0/80/160
        r1 = pltpu.roll(z, 256 - 80, 2)
        r2 = pltpu.roll(z, 256 - 160, 2)
        s = (z[:, 0 : t_len - 2, 0:t_len]
             + r1[:, 1 : t_len - 1, 0:t_len]
             + r2[:, 2:t_len, 0:t_len])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))  # (chunk, T, 128)

    # -------- plain v8b conv stage
    def k_v8b(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
              *, chunk):
        tb = x_ref.shape[0]
        for ci in range(tb // chunk):
            a1q = requantize(dot1(x_ref, w1_ref, ci, chunk),
                             m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                shift_add_roll(z, chunk), m2_ref[:], o2_ref[:], relu=True)

    # -------- epilogue-pipelined v8b (v7 order)
    def k_v8bp(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
               *, chunk):
        tb = x_ref.shape[0]
        n = tb // chunk
        a1q = requantize(dot1(x_ref, w1_ref, 0, chunk),
                         m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(x_ref, w1_ref, ci + 1, chunk) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add_roll(z_prev, chunk), m2_ref[:], o2_ref[:],
                    relu=True)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        o_ref[(n - 1) * chunk :] = requantize(
            shift_add_roll(z_prev, chunk), m2_ref[:], o2_ref[:], relu=True)

    def f_conv(kern, bb=BB, ch=CH):
        def f(x):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in consts],
                out_specs=pl.BlockSpec((bb, t_len, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *consts)
        return f

    for name, kern in (("v8b conv plain", k_v8b), ("v8b conv pipelined", k_v8bp)):
        try:
            sec = chain(name, f_conv(kern), xw, work=conv_work)
            print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s conv-only",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:300]})", flush=True)

    # -------- fused conv+dense single kernel (skips the 67MB x2 HBM trip)
    w3a = jnp.asarray(rng.integers(-100, 100, (t_len * 128, 256)
                                   ).astype(np.int8))
    m3 = jnp.asarray(rng.random(256).astype(np.float32) * 1e-3)
    o3 = jnp.asarray(rng.random(256).astype(np.float32))
    w4 = jnp.asarray(rng.integers(-100, 100, (256, 128)).astype(np.int8))
    s4 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    b4 = jnp.asarray(rng.random(128).astype(np.float32))
    fcs = consts + [w3a, m3, o3, w4, s4, b4]
    full_work = conv_work + 2 * BATCH * (t_len * 128 * 256 + 256 * 128)

    def k_fused(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref,
                w3_ref, m3_ref, o3_ref, w4_ref, s4_ref, b4_ref, o_ref,
                h_scr, *, chunk):
        tb = x_ref.shape[0]
        n = tb // chunk
        a1q = requantize(dot1(x_ref, w1_ref, 0, chunk),
                         m1_ref[:], o1_ref[:], relu=True)
        z_prev = None
        for ci in range(n):
            a1_next = dot1(x_ref, w1_ref, ci + 1, chunk) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            if z_prev is not None:
                h_scr[(ci - 1) * chunk : ci * chunk] = requantize(
                    shift_add_roll(z_prev, chunk), m2_ref[:], o2_ref[:],
                    relu=True)
            if a1_next is not None:
                a1q = requantize(a1_next, m1_ref[:], o1_ref[:], relu=True)
            z_prev = z
        h_scr[(n - 1) * chunk :] = requantize(
            shift_add_roll(z_prev, chunk), m2_ref[:], o2_ref[:], relu=True)
        h = h_scr[:].reshape(tb, t_len * 128)
        acc3 = jax.lax.dot_general(
            h, w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a3 = requantize(acc3, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3, w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    def f_fused(bb, ch):
        def f(x):
            return pl.pallas_call(
                functools.partial(k_fused, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in fcs],
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bb, t_len, 128), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *fcs)
        return f

    for bb, ch in ((64, 16), (128, 16), (256, 16)):
        try:
            sec = chain(f"v8b FUSED conv+dense bb={bb} ch={ch}",
                        f_fused(bb, ch), xw, work=full_work)
            print(f"   -> FULL-NET rate: {BATCH * 128 / sec / 1e6:.1f} MS/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fused bb={bb}: FAILS ({str(e)[:300]})", flush=True)


# ---------------------------------------------------------------------- r4c
def probe_r4c():
    """v8b tuning: the conv stage is VPU-bound (rq1 ~324us + rolls), so probe
    scheduling granularity: (bb, chunk) sweep, split-K rq1 interleave (rq the
    two 256-lane halves of a1 between two K=256 half-dots so VPU work slots
    between MXU issues), and the rq-free N=256 MXU bound."""
    t_len = 128
    inv_sx = np.float32(1.27)
    w1e = jnp.asarray(rng.integers(-100, 100, (8, 512)).astype(np.int8))
    w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
    m1 = jnp.asarray(rng.random(512).astype(np.float32) * 1e-3)
    o1 = jnp.asarray(rng.random(512).astype(np.float32))
    m2 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    o2 = jnp.asarray(rng.random(128).astype(np.float32))
    conv_work = 2 * BATCH * t_len * (8 + 256) * 512
    consts = [w1e, m1, o1, w2r, m2, o2]
    xw = jnp.asarray(
        rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))

    def dot1(x_ref, w1_ref, ci, chunk):
        m = chunk * t_len
        xb = x_ref[ci * chunk : (ci + 1) * chunk]
        xp = jnp.concatenate(
            [xb, pltpu.roll(xb, t_len - 1, 2), pltpu.roll(xb, t_len - 2, 2),
             jnp.zeros_like(xb)], axis=1)
        xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0).astype(jnp.int8)
        xe = jnp.swapaxes(xq, 1, 2).reshape(m, 8)
        return jax.lax.dot_general(
            xe, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def shift_add_roll(z, chunk):
        r1 = pltpu.roll(z, 256 - 80, 2)
        r2 = pltpu.roll(z, 256 - 160, 2)
        s = (z[:, 0 : t_len - 2, 0:t_len]
             + r1[:, 1 : t_len - 1, 0:t_len]
             + r2[:, 2:t_len, 0:t_len])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

    def k_plain(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
                *, chunk):
        tb = x_ref.shape[0]
        for ci in range(tb // chunk):
            a1q = requantize(dot1(x_ref, w1_ref, ci, chunk),
                             m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                shift_add_roll(z, chunk), m2_ref[:], o2_ref[:], relu=True)

    def k_early(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
                *, chunk):
        tb = x_ref.shape[0]
        n = tb // chunk
        a1 = dot1(x_ref, w1_ref, 0, chunk)
        for ci in range(n):
            a1_next = dot1(x_ref, w1_ref, ci + 1, chunk) if ci + 1 < n else None
            a1q = requantize(a1, m1_ref[:], o1_ref[:], relu=True)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                shift_add_roll(z, chunk), m2_ref[:], o2_ref[:], relu=True)
            a1 = a1_next

    def k_split(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
                *, chunk):
        """rq1 in 256-lane halves interleaved with K=256 half-dots."""
        tb = x_ref.shape[0]
        n = tb // chunk
        for ci in range(n):
            a1 = dot1(x_ref, w1_ref, ci, chunk)
            qlo = requantize(a1[:, 0:256], m1_ref[0:256], o1_ref[0:256],
                             relu=True)
            zlo = jax.lax.dot_general(
                qlo, w2_ref[0:256], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            qhi = requantize(a1[:, 256:512], m1_ref[256:512],
                             o1_ref[256:512], relu=True)
            zhi = jax.lax.dot_general(
                qhi, w2_ref[256:512], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            z = (zlo + zhi).reshape(chunk, t_len, 256)
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                shift_add_roll(z, chunk), m2_ref[:], o2_ref[:], relu=True)

    def k_norq(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref, o2_ref, o_ref,
               *, chunk):
        tb = x_ref.shape[0]
        for ci in range(tb // chunk):
            a1q = dot1(x_ref, w1_ref, ci, chunk).astype(jnp.int8)  # inexact
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                shift_add_roll(z, chunk) >> 9).astype(jnp.int8)

    def run(name, kern, bb, ch):
        def f(x):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in consts],
                out_specs=pl.BlockSpec((bb, t_len, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *consts)
        try:
            sec = chain(name, f, xw, work=conv_work)
            print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s conv-only",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:200]})", flush=True)

    # Selectable via argv tokens after 'r4c' (each may hang the remote
    # Mosaic compiler — run variants under separate timeouts).
    sel = [a for a in sys.argv[2:]] or ["safe"]
    plans = {
        "safe": [("early bb=64 ch=16", k_early, 64, 16),
                 ("splitK bb=64 ch=16", k_split, 64, 16),
                 ("norq bb=64 ch=16 (MXU bound)", k_norq, 64, 16),
                 ("plain bb=128 ch=16", k_plain, 128, 16)],
        "big": [("plain bb=64 ch=32", k_plain, 64, 32),
                ("plain bb=128 ch=32", k_plain, 128, 32),
                ("early bb=128 ch=32", k_early, 128, 32)],
        "huge": [("plain bb=256 ch=32", k_plain, 256, 32),
                 ("plain bb=128 ch=64", k_plain, 128, 64)],
    }
    for key in sel:
        for name, kern, bb, ch in plans.get(key, []):
            run(name, kern, bb, ch)


# ---------------------------------------------------------------------- r4d
def probe_r4d():
    """v9 candidate: conv1 as a bf16 MXU dot with m1 (constrained pow2) and
    (o1+0.5) (bf16-snapped) FOLDED into the weights/bias-lane — all K-lane
    terms sit on the 2^e[c] integer grid with partial sums < 2^24, so the
    f32 MXU accumulation is exact in any order and rq1 collapses from ~6 VPU
    passes (convert/mul/add/clip2/convert) to clip2+convert. Variants:
    plain / epi-pipelined; N=384 tap384 conv2 (no rolls) and N=256 (rolls).
    Numerics proven separately (test suite); this probes SPEED with synthetic
    weights of the right dtypes."""
    t_len = 128
    inv_sx = np.float32(1.27)
    # bf16 folded conv1 weights: rows (2k+h), row6 = bias, row7 = 0
    w1b = jnp.asarray(
        (rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2k = jnp.asarray(rng.integers(-100, 100, (512, 384)).astype(np.int8))
    w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
    m2 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    o2 = jnp.asarray(rng.random(128).astype(np.float32))
    conv_work = 2 * BATCH * t_len * (8 + 384) * 512
    xw = jnp.asarray(
        rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))

    def dot1_v9(x_ref, w1_ref, ci, chunk):
        m = chunk * t_len
        xb = x_ref[ci * chunk : (ci + 1) * chunk]          # (chunk, 2, T) f32
        q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
        xp = jnp.concatenate(
            [q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
             jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
        xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)
        return jax.lax.dot_general(
            xe, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (m, 512) f32

    def rq1_v9(a1f):
        return jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)

    def shift_add384(z, chunk):
        s = (z[:, 0 : t_len - 2, 0:128]
             + z[:, 1 : t_len - 1, 128:256]
             + z[:, 2:t_len, 256:384])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

    def shift_add_roll(z, chunk):
        r1 = pltpu.roll(z, 256 - 80, 2)
        r2 = pltpu.roll(z, 256 - 160, 2)
        s = (z[:, 0 : t_len - 2, 0:t_len]
             + r1[:, 1 : t_len - 1, 0:t_len]
             + r2[:, 2:t_len, 0:t_len])
        return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

    def make_kern(w2, nlanes, sa, pipelined):
        def k_plain(x_ref, w1_ref, w2_ref, m2_ref, o2_ref, o_ref, *, chunk):
            tb = x_ref.shape[0]
            for ci in range(tb // chunk):
                a1q = rq1_v9(dot1_v9(x_ref, w1_ref, ci, chunk))
                z = jax.lax.dot_general(
                    a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(chunk, t_len, nlanes)
                o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                    sa(z, chunk), m2_ref[:], o2_ref[:], relu=True)

        def k_epi(x_ref, w1_ref, w2_ref, m2_ref, o2_ref, o_ref, *, chunk):
            tb = x_ref.shape[0]
            n = tb // chunk
            a1q = rq1_v9(dot1_v9(x_ref, w1_ref, 0, chunk))
            z_prev = None
            for ci in range(n):
                a1_next = (dot1_v9(x_ref, w1_ref, ci + 1, chunk)
                           if ci + 1 < n else None)
                z = jax.lax.dot_general(
                    a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(chunk, t_len, nlanes)
                if z_prev is not None:
                    o_ref[(ci - 1) * chunk : ci * chunk] = requantize(
                        sa(z_prev, chunk), m2_ref[:], o2_ref[:], relu=True)
                if a1_next is not None:
                    a1q = rq1_v9(a1_next)
                z_prev = z
            o_ref[(n - 1) * chunk :] = requantize(
                sa(z_prev, chunk), m2_ref[:], o2_ref[:], relu=True)

        return k_epi if pipelined else k_plain

    def run(name, w2, nlanes, sa, pipelined, bb=64, ch=16):
        kern = make_kern(w2, nlanes, sa, pipelined)
        consts = [w1b, w2, m2, o2]

        def f(x):
            return pl.pallas_call(
                functools.partial(kern, chunk=ch),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in consts],
                out_specs=pl.BlockSpec((bb, t_len, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *consts)
        try:
            sec = chain(name, f, xw, work=conv_work)
            print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s conv-only",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:200]})", flush=True)

    run("v9 N384 plain", w2k, 384, shift_add384, False)
    run("v9 N384 epi  ", w2k, 384, shift_add384, True)
    run("v9 N256 plain", w2r, 256, shift_add_roll, False)
    run("v9 N256 epi  ", w2r, 256, shift_add_roll, True)


# ---------------------------------------------------------------------- r4e
def probe_r4e():
    """Fused v9 conv+dense in ONE kernel with a fori_loop chunk loop (small
    compiled program -> bigger bb may compile), dense at block granularity
    M=bb. Saves the 67MBx2 HBM round-trip + dense dispatch + glue. Also a
    fori_loop conv-only variant (does Mosaic self-pipeline?)."""
    t_len = 128
    inv_sx = np.float32(1.27)
    w1b = jnp.asarray(
        (rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
    m2 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    o2 = jnp.asarray(rng.random(128).astype(np.float32))
    w3a = jnp.asarray(rng.integers(-100, 100, (t_len * 128, 256)
                                   ).astype(np.int8))
    m3 = jnp.asarray(rng.random(256).astype(np.float32) * 1e-3)
    o3 = jnp.asarray(rng.random(256).astype(np.float32))
    w4 = jnp.asarray(rng.integers(-100, 100, (256, 128)).astype(np.int8))
    s4 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
    b4 = jnp.asarray(rng.random(128).astype(np.float32))
    conv_work = 2 * BATCH * t_len * (8 + 256) * 512
    full_work = conv_work + 2 * BATCH * (t_len * 128 * 256 + 256 * 128)
    xw = jnp.asarray(
        rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))

    def conv_chunk(x_ref, w1_ref, w2_ref, m2_ref, o2_ref, ci, chunk):
        m = chunk * t_len
        xb = x_ref[pl.ds(ci * chunk, chunk)]
        q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
        xp = jnp.concatenate(
            [q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
             jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
        xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)
        a1f = jax.lax.dot_general(
            xe, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a1q = jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)
        z = jax.lax.dot_general(
            a1q, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(chunk, t_len, 256)
        r1 = pltpu.roll(z, 256 - 80, 2)
        r2 = pltpu.roll(z, 256 - 160, 2)
        s = (z[:, 0 : t_len - 2, 0:t_len]
             + r1[:, 1 : t_len - 1, 0:t_len]
             + r2[:, 2:t_len, 0:t_len])
        s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
        return requantize(s, m2_ref[:], o2_ref[:], relu=True)

    def k_conv_fori(x_ref, w1_ref, w2_ref, m2_ref, o2_ref, o_ref, *, chunk):
        n = x_ref.shape[0] // chunk

        def body(ci, _):
            o_ref[pl.ds(ci * chunk, chunk)] = conv_chunk(
                x_ref, w1_ref, w2_ref, m2_ref, o2_ref, ci, chunk)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    def k_fused(x_ref, w1_ref, w2_ref, m2_ref, o2_ref,
                w3_ref, m3_ref, o3_ref, w4_ref, s4_ref, b4_ref, o_ref,
                h_scr, *, chunk):
        n = x_ref.shape[0] // chunk

        def body(ci, _):
            h_scr[pl.ds(ci * chunk, chunk)] = conv_chunk(
                x_ref, w1_ref, w2_ref, m2_ref, o2_ref, ci, chunk)
            return 0

        jax.lax.fori_loop(0, n, body, 0)
        h = h_scr[:].reshape(x_ref.shape[0], t_len * 128)
        acc3 = jax.lax.dot_general(
            h, w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a3 = requantize(acc3, m3_ref[:], o3_ref[:], relu=True)
        acc4 = jax.lax.dot_general(
            a3, w4_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < 11, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.where(logits >= mx, lane, 128)
        o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)

    ccs = [w1b, w2r, m2, o2]
    fcs = ccs + [w3a, m3, o3, w4, s4, b4]

    for bb in (64, 128):
        def f_conv(x, bb=bb):
            return pl.pallas_call(
                functools.partial(k_conv_fori, chunk=CH),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in ccs],
                out_specs=pl.BlockSpec((bb, t_len, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *ccs)
        try:
            sec = chain(f"conv fori bb={bb}", f_conv, xw, work=conv_work)
            print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s conv-only",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"conv fori bb={bb}: FAILS ({str(e)[:160]})", flush=True)

    for bb in (128, 256, 512):
        def f_fused(x, bb=bb):
            return pl.pallas_call(
                functools.partial(k_fused, chunk=CH),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
                + [_spec(c) for c in fcs],
                out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bb, t_len, 128), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, *fcs)
        try:
            sec = chain(f"FUSED fori bb={bb}", f_fused, xw, work=full_work)
            print(f"   -> FULL-NET: {BATCH * 128 / sec / 1e6:.1f} MS/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FUSED fori bb={bb}: FAILS ({str(e)[:160]})", flush=True)


# ---------------------------------------------------------------------- r4f
def probe_r4f():
    """Post-v9 micro-levers on the PRODUCTION kernel: batch sweep (amortize
    per-iter fixed costs), dense block size, and an rq2 variant where m2 is
    pow2 so the epilogue runs as integer add+shift+clip (no f32 converts)."""
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    # v9 full classifier batch sweep
    for b in (2048, 4096, 8192, 16384):
        x0 = jnp.asarray(
            rng.standard_normal((b, 2, 128)).astype(np.float32))
        try:
            c9 = infer.make_int8_classifier_v9(qm)
            sec = chain(f"v9 full B={b}", c9, x0, batch=b)
            print(f"   -> {b * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v9 B={b}: FAILS ({str(e)[:140]})", flush=True)

    # dense block-size sweep at K=16384
    for dbb in (128, 256, 512, 1024):
        try:
            c9 = infer.make_int8_classifier_v9(qm, dense_block_b=dbb)
            x0 = jnp.asarray(
                rng.standard_normal((BATCH, 2, 128)).astype(np.float32))
            sec = chain(f"v9 full dbb={dbb}", c9, x0)
            print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"v9 dbb={dbb}: FAILS ({str(e)[:140]})", flush=True)

    # rq2-as-integer variant (speed only; synthetic pow2 m2): epilogue
    # (z + o2i) >> k, clip, int8 convert — no f32 converts on the
    # (chunk,128,128) i32 conv2 output.
    t_len = 128
    inv_sx = np.float32(1.27)
    w1b = jnp.asarray(
        (rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
    o2i = jnp.asarray(rng.integers(0, 1 << 12, (1, 128)).astype(np.int32))
    k2 = jnp.asarray(np.full((1, 128), 9, np.int32))
    consts = [w1b, w2r, o2i, k2]
    xw = jnp.asarray(
        rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))
    conv_work = 2 * BATCH * t_len * (8 + 256) * 512

    def k_rq2int(x_ref, w1_ref, w2_ref, o2_ref, k2_ref, o_ref, *, chunk):
        tb = x_ref.shape[0]
        m = chunk * t_len
        for ci in range(tb // chunk):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]
            q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
            xp = jnp.concatenate(
                [q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
                 jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
            xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)
            a1f = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a1q = jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 256)
            r1 = pltpu.roll(z, 256 - 80, 2)
            r2 = pltpu.roll(z, 256 - 160, 2)
            s = (z[:, 0 : t_len - 2, 0:t_len]
                 + r1[:, 1 : t_len - 1, 0:t_len]
                 + r2[:, 2:t_len, 0:t_len])
            s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            v = jax.lax.shift_right_arithmetic(
                s + o2_ref[:][None], jnp.broadcast_to(k2_ref[:][None], s.shape))
            o_ref[ci * chunk : (ci + 1) * chunk] = jnp.clip(
                v, 0, 127).astype(jnp.int8)

    def f_rq2int(x):
        return pl.pallas_call(
            functools.partial(k_rq2int, chunk=CH),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 2, t_len), lambda i: (i, 0, 0))]
            + [_spec(c) for c in consts],
            out_specs=pl.BlockSpec((BB, t_len, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *consts)

    try:
        sec = chain("v9 conv rq2-integer (pow2 m2)", f_rq2int, xw,
                    work=conv_work)
        print(f"   -> {BATCH * 128 / sec / 1e6:.1f} MS/s conv-only",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"rq2int: FAILS ({str(e)[:240]})", flush=True)

    # timing-correction kernel standalone (the r4 normalize.py rewrite)
    from modulationdetectioncnn_tpu.dsp import normalize
    xfr = jnp.asarray(
        rng.standard_normal((BATCH, 2, 128)).astype(np.float32))

    def f_timing(x):
        tau = normalize.estimate_timing(x, 8)
        return normalize.correct_timing(x, tau, 8, 32)

    try:
        sec = chain("timing est+correct (pallas) B=4096", f_timing, xfr)
        print(f"   -> {sec*1e6:.0f} us/iter", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"timing: FAILS ({str(e)[:240]})", flush=True)


# ------------------------------------------------------------- r4 addenda
# Post-r4f ad-hoc experiments (run 2026-08-21 from /tmp scripts mirroring
# the production v9 kernel; recorded here as measured provenance):
#
# r4g — is the integer-rq2 conv speedup sensitive to 1-D vs (1, N) const
#   refs or per-lane-varying vs uniform shifts?  NO: all four combinations
#   measure 956–978 us. (This also exposed r4f's 577 us rq2-int figure as
#   a timing glitch — it was below the 737 us rq-free bound; the real
#   integer-rq2 conv stage is ~907 us vs 1026 us with the f32 affine.)
# r4h — v9 (bb, chunk) sweep: (64,16) 1158, (64,8) 1166, (32,8) 1132,
#   (96,24) 1150, (128,8) 1099→re-run 1179 (tunnel noise ±3–5% swamps the
#   spread; defaults kept), (64,4) 1214; bb=256 crashes the compile helper.
# r4i — "v11" block-level tap-build + conv1 hoisting (tap/quantize once
#   per block, chunked conv2): 971–1034 us conv-only — WORSE than the
#   interleaved per-chunk structure (907 us); big VPU bursts schedule
#   against the MXU worse than fine-grained interleave.
# r4j — unrolled FUSED conv+dense single kernel with integer epilogues
#   (skips the 67 MB×2 HBM round-trip + dense dispatch): bb=128 1144 us
#   full-net (458 MS/s) vs split 1157 us (452) — within noise; bb=192
#   1344 us; not adopted (no reliable win, one more program at the compile
#   helper's size ceiling).
# r4 timing profile (dsp/normalize.py rewrite): estimate_timing 0.3 us,
#   cbig build 10.7 us, pad/reshape ~0, Pallas roll-MAC kernel 105 us at
#   B=4096 (bb=2048 exceeds the 16 MB scoped-vmem limit; bb=512 used);
#   chain delta 232 us — the 17-tap interpolator's VPU pass count is the
#   inherent cost (config.py StreamConfig.normalize_timing).

# ------------------------------------------------------------- r5 addenda
# All measured 2026-08-21 on-chip. HEADLINE LESSON: single two-length
# chained pairs glitch LOW often enough to mislead a whole round — every
# decision below rests on >=3 interleaved samples (probe_r5ab/r5c2).
#
# r5conv — conv-stage restructure matrix (single pairs, see r5c2 for the
#   corrected medians): v7 904.5 / v9 965.0; taps-on-K conv2 (sublane-
#   offset int8 activation slices) 1059-1422 us across chunk/grid/pipe
#   variants — int8 sublane-offset slicing relayouts on the VPU, REJECTED;
#   l384+folded-conv1+pipe 1186.9 (f32 conv1 dot + 384-wide epilogue
#   schedule badly together); l256+fold+pipe read 750.5 — later exposed
#   as a glitched pair (r5c2: same program 985-1011 over 6 samples).
# r5full — v10(l256+fold+pipe) full-net: ch16 1241/1219/1214 (dbb256/
#   dbb512/bb128), ch8 990.0 (also later shown glitch-assisted, r5ab);
#   BATCH SWEEP (VERDICT r4 next #6): v10 B=8192 2683 us (327.5 ns/fr) and
#   B=16384 5266.7 (321.5 ns/fr) vs 242-296 ns/fr at B=4096; v7 B=8192
#   2395.7 (292.4 ns/fr) vs 266 at 4096 — larger batches are WORSE
#   per-frame on this platform (HBM input residency + no dispatch
#   amortization to win); B=4096 confirmed as the headline batch.
# r5ab — 3-sample interleaved full-net medians: v7 1091.2 us
#   [1127.7/1091.2/1087.4] vs v10 ch8 1213.8, ch8 bb32 1242.5, ch4 1254.5,
#   ch8 dbb512 1194.4 — v7 wins full-net by ~9-13%, tight samples.
# r5c2 — 3-sample interleaved conv-stage medians: v7conv 900.4
#   [903.3/900.4/860.5]; l256+fold+pipe ch16 arb 1001.0, ch16 par 995.3,
#   ch8 arb 1010.4, ch8 par 992.7. CONCLUSION: no admissible conv2
#   structure (N=256 lane-roll / N=384 sublane-add / taps-on-K; folded or
#   int8 conv1; chunk 4-64; 64-256 grid steps; pipelined or not; parallel
#   or arbitrary semantics) beats v7's 900 us; the v7 two-kernel structure
#   is the measured per-chip optimum of this program family. v10 is kept
#   as a selectable kernel + calibration candidate (bench.py measures all
#   three per session and headlines the winner).
# r5d2 — last levers, 3-sample medians: dense dbb sweep FLAT at the HBM
#   floor (128: 165.0 / 256: 152.5 / 512: 148.8 — no VMEM-pressure win;
#   the stage is bound by its 67 MB input read); v7 conv epilogue
#   pipelining depth sweep: depth1 (prod) 863.7, depth2 895.6, depth3
#   876.5, depth2+bb128 854.7 — deeper deferral buys nothing outside the
#   ±4% session band. Both stages confirmed at their measured floors;
#   sol_audit_r5.json stands.
# r5cfo — CFO cost decomposition, 3-sample medians @ B=4096: the whole
#   normalize measures TINY standalone (estimate_cfo 25.6 us, est+correct
#   23.8, x^4+DFT+|Z|^2 22.9, peak+parabola 20.1, pad2 est 19.3), yet the
#   stream A/B charges CFO 6-12% of the chain (~75-145 us). Same family
#   as the r3 timing mystery: XLA's fusion decisions at full-chain shapes
#   materialize intermediates the standalone graphs fuse away. A fused
#   Pallas peak kernel would cut <20 us of a cost that lives in
#   cross-fusion, so it was NOT built; the honest statement stays in
#   config.py (CFO ON at a measured 6-12% chain cost).
# r5cfo2 — rank ruled out too: est+correct on the chain's 4-D (M,F,2,T)
#   frames 26.2 us vs 3-D 23.7; pre-flattening saves ~1.5 us. The chain
#   cost is a whole-graph fusion interaction with the channelizer/framer
#   producers (and partly the A/B's own 88-94% same-session spread), not
#   a localizable op.

# ---------------------------------------------------------------------- r5
def _r5_consts():
    """Shared packings for the r5 conv-stage candidates (real qm)."""
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    c2 = qm.m2.shape[0]
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    return {
        "qm": qm,
        "infer": infer,
        "inv_sx": float(1.0 / qm.s_x),
        "w1f": jnp.asarray(infer.expand_conv1_weights_v9f(qm)
                           ).astype(jnp.bfloat16),
        "w2_tapk": jnp.asarray(infer.pack_conv2_weights_tapk(w2)),   # (1536,128)
        "w2_l256": jnp.asarray(infer.pack_conv2_weights_lane256(w2)),
        "w2_l384": jnp.asarray(infer.pack_conv2_weights_tap384(w2)),
        "m2p": jnp.asarray(infer._pad_cols(qm.m2)),
        "o2p": jnp.asarray(infer._pad_cols(qm.o2)),
        "c2": c2,
    }


def _r5_make_conv(cc, *, form, bb, chunk, pipe, split1=1, sem="arbitrary"):
    """Conv-stage candidate factory: folded-bf16 conv1 (v9f trick) + conv2
    in one of three forms:
      tapk  3 accumulated (m-2,512)@(512,128) dots, taps via sublane-offset
            activation slices -> NO shift-add pass, narrow (m,128) epilogue
      l256  v9 packing: one (m,512)@(512,256) dot + int32 lane rolls
      l384  v7 packing: one (m,512)@(512,384) dot + sublane-offset adds
    pipe=True replicates v7's 2-deep epilogue pipelining across chunks."""
    inv_sx = cc["inv_sx"]
    w2 = {"tapk": cc["w2_tapk"], "l256": cc["w2_l256"],
          "l384": cc["w2_l384"]}[form]
    consts = [cc["w1f"], w2, cc["m2p"], cc["o2p"]]
    kdim = 512

    def kern(x_ref, w1_ref, w2_ref, m2_ref, o2_ref, o_ref):
        tb, t_len = x_ref.shape[0], x_ref.shape[2]
        m = chunk * t_len
        n = tb // chunk

        def taps(ci):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]
            q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
            xp = jnp.concatenate(
                [q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
                 jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
            return jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)

        def d1(xe):
            if split1 == 1:
                return jax.lax.dot_general(
                    xe, w1_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            ms = m // split1
            return [jax.lax.dot_general(
                xe[s * ms : (s + 1) * ms], w1_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) for s in range(split1)]

        def rq1(a1f):
            if split1 == 1:
                return jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)
            return jnp.concatenate(
                [jnp.clip(p, 0.0, 127.0).astype(jnp.int8) for p in a1f],
                axis=0)

        def conv2(a1q):
            if form == "tapk":
                acc = None
                for k in range(3):
                    d = jax.lax.dot_general(
                        a1q[k : k + m - 2],
                        w2_ref[k * kdim : (k + 1) * kdim],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = d if acc is None else acc + d
                return acc
            return jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def epilogue(z):
            if form == "tapk":
                s = jnp.pad(z, ((0, 2), (0, 0))).reshape(chunk, t_len, 128)
            elif form == "l256":
                zz = z.reshape(chunk, t_len, 256)
                r1 = pltpu.roll(zz, 256 - 80, 2)
                r2 = pltpu.roll(zz, 256 - 160, 2)
                s = (zz[:, 0 : t_len - 2, 0:128]
                     + r1[:, 1 : t_len - 1, 0:128] + r2[:, 2:t_len, 0:128])
                s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            else:
                zz = z.reshape(chunk, t_len, 384)
                s = (zz[:, 0 : t_len - 2, 0:128]
                     + zz[:, 1 : t_len - 1, 128:256]
                     + zz[:, 2:t_len, 256:384])
                s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
            return _rq_prod(s, m2_ref[:], o2_ref[:], relu=True)

        if not pipe:
            for ci in range(n):
                o_ref[ci * chunk : (ci + 1) * chunk] = epilogue(
                    conv2(rq1(d1(taps(ci)))))
            return
        a1q = rq1(d1(taps(0)))
        z_prev = None
        for ci in range(n):
            a1f_next = d1(taps(ci + 1)) if ci + 1 < n else None
            z = conv2(a1q)
            if z_prev is not None:
                o_ref[(ci - 1) * chunk : ci * chunk] = epilogue(z_prev)
            if a1f_next is not None:
                a1q = rq1(a1f_next)
            z_prev = z
        o_ref[(n - 1) * chunk :] = epilogue(z_prev)

    def f(x):
        return pl.pallas_call(
            kern,
            grid=(BATCH // bb,),
            in_specs=[pl.BlockSpec((bb, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(c) for c in consts],
            out_specs=pl.BlockSpec((bb, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem,)),
        )(x, *consts)

    return f


def probe_r5conv():
    """r5 verdict #1: conv-stage restructure candidates, interleaved with
    the v7/v9 production conv stages in ONE session. The decision matrix:
    conv2 form (tapk/l256/l384, all with the v9f folded conv1) x chunk size
    x grid shape x epilogue pipelining."""
    from modulationdetectioncnn_tpu.ops import infer

    cc = _r5_consts()
    qm = cc["qm"]
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))

    # production v7 conv stage baseline (int8 conv1 + integer rq1)
    w1e = infer.expand_conv1_weights_v9(qm.w1p)
    v7_consts = [jnp.asarray(a) for a in
                 (w1e, qm.m1, qm.o1, np.asarray(cc["w2_l384"]),
                  np.asarray(cc["m2p"]), np.asarray(cc["o2p"]))]

    def f_v7conv(x):
        return pl.pallas_call(
            functools.partial(infer._conv_stage_int8_v7_kernel, chunk=CH,
                              inv_sx=cc["inv_sx"]),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(c) for c in v7_consts],
            out_specs=pl.BlockSpec((BB, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *v7_consts)

    v9_consts = [cc["w1f"], cc["w2_l256"], cc["m2p"], cc["o2p"]]

    def f_v9conv(x):
        return pl.pallas_call(
            functools.partial(infer._conv_stage_int8_v9_kernel, chunk=CH,
                              co=cc["c2"], inv_sx=cc["inv_sx"]),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(c) for c in v9_consts],
            out_specs=pl.BlockSpec((BB, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *v9_consts)

    cases = [
        ("v7conv prod bb64 ch16 pipe", f_v7conv),
        ("v9conv prod bb64 ch16", f_v9conv),
        ("tapk bb64 ch16 pipe",
         _r5_make_conv(cc, form="tapk", bb=64, chunk=16, pipe=True)),
        ("tapk bb64 ch16",
         _r5_make_conv(cc, form="tapk", bb=64, chunk=16, pipe=False)),
        ("tapk bb16 ch16 (256 steps)",
         _r5_make_conv(cc, form="tapk", bb=16, chunk=16, pipe=False)),
        ("tapk bb32 ch32 (128 steps)",
         _r5_make_conv(cc, form="tapk", bb=32, chunk=32, pipe=False)),
        ("tapk bb64 ch32",
         _r5_make_conv(cc, form="tapk", bb=64, chunk=32, pipe=False)),
        ("tapk bb64 ch32 pipe",
         _r5_make_conv(cc, form="tapk", bb=64, chunk=32, pipe=True)),
        ("tapk bb64 ch64 split2",
         _r5_make_conv(cc, form="tapk", bb=64, chunk=64, pipe=False,
                       split1=2)),
        ("l384 bb64 ch16 pipe (v7+fold)",
         _r5_make_conv(cc, form="l384", bb=64, chunk=16, pipe=True)),
        ("l256 bb64 ch16 pipe (v9+pipe)",
         _r5_make_conv(cc, form="l256", bb=64, chunk=16, pipe=True)),
    ]
    for name, f in cases:
        try:
            sec = chain(name, f, x0)
            print(f"   -> {BATCH * T_IN / sec / 1e6:.1f} MS/s conv-only",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:160]})", flush=True)


def probe_r5dot():
    """r5 verdict #1 (audit leg): the IN-VMEM dot law. The r4 nk probe
    streamed 1 MB/step activations from HBM, so its 'per-dot fixed cost'
    conflated DMA with dispatch. Here: (a) R repeated dots per grid step on
    the SAME resident block (distinct weight slices, accumulated) -> the
    time slope over R is the pure per-dot_general cost; (b) M sweep at one
    dot/step -> per-grid-step cost amortization."""

    def run(mfr, k, n, reps):
        m = mfr * T_IN
        w = jnp.asarray(
            rng.integers(-100, 100, (reps * k, n)).astype(np.int8))
        a = jnp.asarray(
            rng.integers(0, 127, (BATCH * T_IN, k), np.int32).astype(np.int8))

        def kern(a_ref, w_ref, o_ref):
            z = None
            for r in range(reps):
                d = jax.lax.dot_general(
                    a_ref[:], w_ref[r * k : (r + 1) * k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                z = d if z is None else z + d
            o_ref[:] = (z >> 9).astype(jnp.int8)

        def f(av):
            return pl.pallas_call(
                kern,
                grid=(BATCH // mfr,),
                in_specs=[pl.BlockSpec((m, k), lambda i: (i, 0)),
                          pl.BlockSpec((reps * k, n), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((m, n), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH * T_IN, n), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(av, w)

        label = (f"dot M={m} K={k} N={n} reps={reps} "
                 f"steps={BATCH // mfr}")
        try:
            chain(label, f, a, work=2 * BATCH * T_IN * k * n * reps)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILS ({str(e)[:120]})", flush=True)

    # (a) per-dot slope at fixed M=2048 (v7's dot shape family)
    for n in (128, 256, 384):
        for reps in (1, 2, 4):
            run(16, 512, n, reps)
    # (b) per-step amortization: M sweep at one dot/step
    for n in (128, 256, 384):
        for mfr in (32, 64, 128):
            run(mfr, 512, n, 1)
    # (c) K sweep: does K=1536 (taps-on-K single dot) pay?
    run(16, 1536, 128, 1)
    run(32, 1536, 128, 1)

    # (d) dispatch/fixed floor: a trivial copy kernel at the conv stage's
    # exact in/out shapes — the pure pallas_call + DMA cost any conv
    # structure pays before doing a single MAC.
    xs = jnp.asarray(
        rng.integers(-127, 127, (BATCH, 2, T_IN), np.int32).astype(np.int8))

    def copy_kern(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(
            x_ref[:, :1, :].astype(jnp.int8), o_ref.shape)

    def f_copy(av):
        return pl.pallas_call(
            copy_kern,
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 2, T_IN), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((BB, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(av)

    try:
        chain("dispatch floor: conv-shaped copy kernel", f_copy, xs)
    except Exception as e:  # noqa: BLE001
        print(f"copy kernel: FAILS ({str(e)[:120]})", flush=True)

    # (e) the 2048^3 int8 ceiling, same session (contrastable with (a)/(b))
    a2k = jnp.asarray(
        rng.integers(-100, 100, (2048, 2048), np.int32).astype(np.int8))
    w2k = jnp.asarray(
        rng.integers(-100, 100, (2048, 2048), np.int32).astype(np.int8))

    def ceil_kern(a_ref, w_ref, o_ref):
        z = jax.lax.dot_general(
            a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = (z >> 9).astype(jnp.int8)

    def f_ceil(av):
        return pl.pallas_call(
            ceil_kern,
            in_specs=[pl.BlockSpec((2048, 2048), lambda: (0, 0)),
                      pl.BlockSpec((2048, 2048), lambda: (0, 0))],
            out_specs=pl.BlockSpec((2048, 2048), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((2048, 2048), jnp.int8),
        )(av, w2k)

    try:
        chain("ceiling 2048^3 int8 (i8 store)", f_ceil, a2k,
              work=2 * 2048 ** 3, batch=2048)
    except Exception as e:  # noqa: BLE001
        print(f"ceiling: FAILS ({str(e)[:120]})", flush=True)


def probe_r5full():
    """v10 full-net A/B vs v7 (interleaved), dense-block and chunk
    variants, and the batch sweep (VERDICT r4 next #2/#6)."""
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))

    cases = [
        ("v7 full (baseline)", infer.make_int8_classifier_v7(qm)),
        ("v10 full dbb256", infer.make_int8_classifier_v10(qm)),
        ("v10 full dbb512",
         infer.make_int8_classifier_v10(qm, dense_block_b=512)),
        ("v10 full ch8", infer.make_int8_classifier_v10(qm, chunk=8)),
        ("v10 full ch16 bb128",
         infer.make_int8_classifier_v10(qm, block_b=128)),
    ]
    for name, f in cases:
        try:
            sec = chain(name, f, x0)
            print(f"   -> {BATCH * T_IN / sec / 1e6:.1f} MS/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:160]})", flush=True)

    # batch sweep on v10 (and v7 for reference at 8192)
    for b in (8192, 16384):
        xb = jnp.asarray(
            rng.standard_normal((b, 2, T_IN)).astype(np.float32))
        for name, mk in (("v10", infer.make_int8_classifier_v10),
                         ("v7", infer.make_int8_classifier_v7)):
            if name == "v7" and b == 16384:
                continue
            try:
                sec = chain(f"{name} full B={b}", mk(qm), xb, batch=b)
                print(f"   -> {b * T_IN / sec / 1e6:.1f} MS/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} B={b}: FAILS ({str(e)[:160]})", flush=True)


def probe_r5ab():
    """Definitive interleaved multi-sample A/B around the r5full findings:
    3 round-robin chained samples per case (a single two-length pair can
    glitch 3x low on this tunnel — memory/probe r4g)."""
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))
    cases = [
        ("v7 full", infer.make_int8_classifier_v7(qm)),
        ("v10 ch8 bb64", infer.make_int8_classifier_v10(qm)),
        ("v10 ch8 bb32", infer.make_int8_classifier_v10(qm, block_b=32)),
        ("v10 ch4 bb64", infer.make_int8_classifier_v10(qm, chunk=4)),
        ("v10 ch8 dbb512",
         infer.make_int8_classifier_v10(qm, dense_block_b=512)),
    ]
    res = {name: [] for name, _ in cases}
    for rnd in range(3):
        for name, f in cases:
            try:
                sec = chain(f"{name} [{rnd}]", f, x0)
                res[name].append(sec * 1e6)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILS ({str(e)[:120]})", flush=True)
    for name, v in res.items():
        if v:
            med = sorted(v)[len(v) // 2]
            print(f"MEDIAN {name:20s} {med:8.1f} us "
                  f"{BATCH * T_IN / med:.1f} MS/s "
                  f"samples={[round(s, 1) for s in v]}", flush=True)


def probe_r5c2():
    """Conv-stage-only multi-sample A/B: was r5conv's l256-pipe 750.5 us a
    single-pair glitch, and does 'parallel' vs 'arbitrary' semantics (or a
    trailing dense consumer) change the picture?"""
    from modulationdetectioncnn_tpu.ops import infer

    cc = _r5_consts()
    qm = cc["qm"]
    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))

    w1e = infer.expand_conv1_weights_v9(qm.w1p)
    v7_consts = [jnp.asarray(a) for a in
                 (w1e, qm.m1, qm.o1, np.asarray(cc["w2_l384"]),
                  np.asarray(cc["m2p"]), np.asarray(cc["o2p"]))]

    def f_v7conv(x):
        return pl.pallas_call(
            functools.partial(infer._conv_stage_int8_v7_kernel, chunk=CH,
                              inv_sx=cc["inv_sx"]),
            grid=(BATCH // BB,),
            in_specs=[pl.BlockSpec((BB, 2, T_IN), lambda i: (i, 0, 0))]
            + [_spec(c) for c in v7_consts],
            out_specs=pl.BlockSpec((BB, T_IN, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, T_IN, 128), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, *v7_consts)

    cases = [
        ("v7conv", f_v7conv),
        ("l256p ch16 arb",
         _r5_make_conv(cc, form="l256", bb=64, chunk=16, pipe=True)),
        ("l256p ch16 par",
         _r5_make_conv(cc, form="l256", bb=64, chunk=16, pipe=True,
                       sem="parallel")),
        ("l256p ch8 arb",
         _r5_make_conv(cc, form="l256", bb=64, chunk=8, pipe=True)),
        ("l256p ch8 par",
         _r5_make_conv(cc, form="l256", bb=64, chunk=8, pipe=True,
                       sem="parallel")),
    ]
    res = {name: [] for name, _ in cases}
    for rnd in range(3):
        for name, f in cases:
            try:
                sec = chain(f"{name} [{rnd}]", f, x0)
                res[name].append(sec * 1e6)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILS ({str(e)[:120]})", flush=True)
    for name, v in res.items():
        if v:
            med = sorted(v)[len(v) // 2]
            print(f"MEDIAN {name:18s} {med:8.1f} us conv-only "
                  f"samples={[round(s, 1) for s in v]}", flush=True)


def probe_r5d2():
    """Last two levers inside the audit frame, 3-sample interleaved medians:
    (a) dense-stage dbb sweep — at dbb=256 the double-buffered 4 MB input
    blocks + 4 MB resident W3 sit near the 16 MB VMEM limit, possibly
    blocking DMA overlap (dense measures 149 us vs its 82 us HBM floor);
    (b) v7 conv with 3-deep epilogue pipelining (defer the epilogue two
    chunks back — a wider MXU/VPU overlap window for +3 MB z VMEM)."""
    from modulationdetectioncnn_tpu.ops import infer

    qm = _qm()
    c2 = qm.m2.shape[0]
    nc = qm.b4.shape[0]
    t_in = T_IN

    # ---- (a) dense-only dbb sweep
    w3p = infer.pack_dense1_weights_v3(qm.w3, t_in - 4, c2, t_in)
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (w3p, qm.m3, qm.o3, w4, s4, b4)]
    h0 = jnp.asarray(
        rng.integers(0, 80, (BATCH, t_in * 128), np.int32).astype(np.int8))

    def make_dense(dbb):
        def f(hb):
            return pl.pallas_call(
                functools.partial(infer._dense_argmax_int8_kernel, nc=nc),
                grid=(BATCH // dbb,),
                in_specs=[pl.BlockSpec((dbb, t_in * 128), lambda i: (i, 0))]
                + [_spec(a) for a in dense_consts],
                out_specs=pl.BlockSpec((dbb, 1), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(hb, *dense_consts)
        return f

    # ---- (b) v7 conv, 3-deep epilogue pipelining
    w1e = infer.expand_conv1_weights_v9(qm.w1p)
    cin = qm.w2p.shape[0] // 2
    w2 = np.asarray(qm.w2p).reshape(2, cin, 3, c2).transpose(0, 2, 1, 3)
    w2k = infer.pack_conv2_weights_tap384(w2)
    m2p = infer._pad_cols(qm.m2)
    o2p = infer._pad_cols(qm.o2)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, w2k, m2p, o2p)]
    inv_sx = float(1.0 / qm.s_x)

    def v7deep_kernel(x_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                      o2_ref, o_ref, *, chunk, depth):
        tb, t_len = x_ref.shape[0], x_ref.shape[2]
        m = chunk * t_len
        n = tb // chunk

        def dot1(ci):
            xb = x_ref[ci * chunk : (ci + 1) * chunk]
            xp = jnp.concatenate(
                [xb, pltpu.roll(xb, t_len - 1, 2),
                 pltpu.roll(xb, t_len - 2, 2), jnp.zeros_like(xb)], axis=1)
            xq = jnp.clip(jnp.round(xp * inv_sx), -127.0, 127.0
                          ).astype(jnp.int8)
            xe = jnp.swapaxes(xq, 1, 2).reshape(m, 8)
            return jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def shift_add(z):
            s = (z[:, 0 : t_len - 2, 0:128]
                 + z[:, 1 : t_len - 1, 128:256]
                 + z[:, 2:t_len, 256:384])
            return jnp.pad(s, ((0, 0), (0, 2), (0, 0)))

        a1q = _rq_prod(dot1(0), m1_ref[:], o1_ref[:], relu=True)
        zq = []  # deferred epilogues, oldest first
        for ci in range(n):
            a1_next = dot1(ci + 1) if ci + 1 < n else None
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t_len, 384)
            if len(zq) >= depth:
                cj = ci - len(zq)
                o_ref[cj * chunk : (cj + 1) * chunk] = _rq_prod(
                    shift_add(zq.pop(0)), m2_ref[:], o2_ref[:], relu=True)
            if a1_next is not None:
                a1q = _rq_prod(a1_next, m1_ref[:], o1_ref[:], relu=True)
            zq.append(z)
        for j, z in enumerate(zq):
            cj = n - len(zq) + j
            o_ref[cj * chunk : (cj + 1) * chunk] = _rq_prod(
                shift_add(z), m2_ref[:], o2_ref[:], relu=True)

    def make_v7deep(depth, bb=64, chunk=16):
        def f(x):
            return pl.pallas_call(
                functools.partial(v7deep_kernel, chunk=chunk, depth=depth),
                grid=(BATCH // bb,),
                in_specs=[pl.BlockSpec((bb, 2, t_in), lambda i: (i, 0, 0))]
                + [_spec(a) for a in conv_consts],
                out_specs=pl.BlockSpec((bb, t_in, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, t_in, 128), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x, *conv_consts)
        return f

    x0 = jnp.asarray(rng.standard_normal((BATCH, 2, t_in)).astype(np.float32))
    cases = (
        [(f"dense dbb={d}", make_dense(d), h0) for d in (128, 256, 512)]
        + [("v7conv depth1 (prod)", make_v7deep(1), x0),
           ("v7conv depth2", make_v7deep(2), x0),
           ("v7conv depth3", make_v7deep(3), x0),
           ("v7conv depth2 bb128", make_v7deep(2, bb=128), x0)]
    )
    res = {name: [] for name, _, _ in cases}
    for rnd in range(3):
        for name, f, xin in cases:
            try:
                sec = chain(f"{name} [{rnd}]", f, xin)
                res[name].append(sec * 1e6)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILS ({str(e)[:120]})", flush=True)
    for name, v in res.items():
        if v:
            med = sorted(v)[len(v) // 2]
            print(f"MEDIAN {name:22s} {med:8.1f} us "
                  f"samples={[round(s, 1) for s in v]}", flush=True)


def probe_r5cfo():
    """Decompose the measured 6-12% CFO chain cost (VERDICT r4 next #3)
    into its components at B=4096: x^4 power, the (T,512) f32 DFT matmuls,
    the spectrum passes (spec2/argmax/3x masked magnitudes), and the
    cos/sin correction — to size a fused Pallas peak-search kernel."""
    from modulationdetectioncnn_tpu.dsp import normalize

    x0 = jnp.asarray(
        rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))

    def f_est(x):
        return normalize.estimate_cfo(x)

    def f_est_pad2(x):
        return normalize.estimate_cfo(x, pad_factor=2)

    def f_full(x):
        return normalize.correct_cfo(x, normalize.estimate_cfo(x))

    def f_corr(x):
        cfo = jnp.mean(x[:, 0], axis=-1) * 1e-6  # cheap stand-in estimate
        return normalize.correct_cfo(x, cfo)

    def f_x4dft(x):
        xr, xi = x[..., 0, :], x[..., 1, :]
        pr, pi = xr * xr - xi * xi, 2 * xr * xi
        pr, pi = pr * pr - pi * pi, 2 * pr * pi
        cos_m, sin_m = (jnp.asarray(a)
                        for a in normalize._padded_dft_matrices(T_IN, 512))
        zr = pr @ cos_m - pi @ sin_m
        zi = pi @ cos_m + pr @ sin_m
        return zr * zr + zi * zi

    def f_peak(s2):
        n = s2.shape[-1]
        k = jnp.argmax(s2, axis=-1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, s2.shape, s2.ndim - 1)

        def mag_at(idx):
            sel = (idx % n)[..., None] == lanes
            return jnp.sqrt(jnp.max(jnp.where(sel, s2, 0.0), axis=-1))

        alpha, beta, gamma = mag_at(k - 1), mag_at(k), mag_at(k + 1)
        denom = alpha - 2 * beta + gamma
        delta = jnp.where(jnp.abs(denom) > 1e-30,
                          0.5 * (alpha - gamma) / denom, 0.0)
        return (k + delta) / n

    s2_0 = jnp.asarray(
        rng.standard_normal((BATCH, 512)).astype(np.float32) ** 2)
    cases = [("estimate_cfo pad4 (XLA)", f_est, x0),
             ("estimate_cfo pad2 (XLA)", f_est_pad2, x0),
             ("est+correct full", f_full, x0),
             ("correct only (cos/sin+cmul)", f_corr, x0),
             ("x^4 + DFT + |Z|^2 only", f_x4dft, x0),
             ("peak+parabola only", f_peak, s2_0)]
    res = {name: [] for name, _, _ in cases}
    for rnd in range(3):
        for name, f, xin in cases:
            try:
                sec = chain(f"{name} [{rnd}]", f, xin)
                res[name].append(sec * 1e6)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILS ({str(e)[:120]})", flush=True)
    for name, v in res.items():
        if v:
            med = sorted(v)[len(v) // 2]
            print(f"MEDIAN {name:28s} {med:8.1f} us "
                  f"samples={[round(s, 1) for s in v]}", flush=True)


def probe_r5cfo2():
    """Is the chain's CFO cost a RANK effect? The stream chain normalizes
    (M, F, 2, T) 4-D frames; the standalone probe used 3-D (B, 2, T).
    Also A/B the full power+CFO normalize at both ranks."""
    from modulationdetectioncnn_tpu.dsp import normalize

    x3 = jnp.asarray(
        rng.standard_normal((BATCH, 2, T_IN)).astype(np.float32))
    x4 = jnp.asarray(
        rng.standard_normal((16, BATCH // 16, 2, T_IN)).astype(np.float32))

    def f_est3(x):
        return normalize.correct_cfo(x, normalize.estimate_cfo(x))

    def f_est4(x):
        return normalize.correct_cfo(x, normalize.estimate_cfo(x))

    def f_norm3(x):
        x = normalize.power_normalize(x)
        return normalize.correct_cfo(x, normalize.estimate_cfo(x))

    def f_norm4(x):
        x = normalize.power_normalize(x)
        return normalize.correct_cfo(x, normalize.estimate_cfo(x))

    def f_norm4_flat(x):
        lead = x.shape[:-2]
        xf = x.reshape((-1,) + x.shape[-2:])
        xf = normalize.power_normalize(xf)
        out = normalize.correct_cfo(xf, normalize.estimate_cfo(xf))
        return out.reshape(lead + out.shape[-2:])

    cases = [("est+corr 3-D (B,2,T)", f_est3, x3),
             ("est+corr 4-D (M,F,2,T)", f_est4, x4),
             ("power+cfo 3-D", f_norm3, x3),
             ("power+cfo 4-D", f_norm4, x4),
             ("power+cfo 4-D flattened", f_norm4_flat, x4)]
    res = {name: [] for name, _, _ in cases}
    for rnd in range(3):
        for name, f, xin in cases:
            try:
                sec = chain(f"{name} [{rnd}]", f, xin)
                res[name].append(sec * 1e6)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILS ({str(e)[:120]})", flush=True)
    for name, v in res.items():
        if v:
            med = sorted(v)[len(v) // 2]
            print(f"MEDIAN {name:26s} {med:8.1f} us "
                  f"samples={[round(s, 1) for s in v]}", flush=True)


PROBES = {
    "r5cfo": probe_r5cfo,
    "r5cfo2": probe_r5cfo2,
    "r5conv": probe_r5conv,
    "r5full": probe_r5full,
    "r5ab": probe_r5ab,
    "r5c2": probe_r5c2,
    "r5d2": probe_r5d2,
    "r5dot": probe_r5dot,
    "r4": probe_r4,
    "r4b": probe_r4b,
    "r4c": probe_r4c,
    "r4d": probe_r4d,
    "r4e": probe_r4e,
    "r4f": probe_r4f,
    "r3k": probe_r3k,
    "r3i": probe_r3i,
    "r3h": probe_r3h,
    "r3": probe_r3,
    "r3b": probe_r3b,
    "r3c": probe_r3c,
    "r3d": probe_r3d,
    "r3e": probe_r3e,
    "r3f": probe_r3f,
    "r3stream": probe_r3stream,
    "ceil": probe_ceil,
    "convT": probe_convT,
    "repack": probe_repack,
    "rq2": probe_rq2,
    "v4": probe_v4,
    "nk": probe_nk,
    "v3": probe_v3,
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


