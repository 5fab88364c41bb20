"""Focused microbenchmarks: isolate conv-stage vs dense-stage vs raw-dot
costs in the v2 int8 path (follow-up to kbench.py, which timed out).

Usage: python scripts/kbench2.py [batch]
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from modulationdetectioncnn_tpu.utils.timing import measure_per_iter

INT8_PEAK = 394e12


def report(name, sec, macs, extra=""):
    tops = 2 * macs / sec / 1e12
    print(
        f"{name:46s} {sec*1e6:9.1f} us  {tops:7.2f} TOPS "
        f"({100*2*macs/sec/INT8_PEAK:5.1f}% int8 peak) {extra}"
    )


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t_in, c1, c2, d, nc = 128, 256, 80, 256, 11
    t1, t2 = t_in - 2, t_in - 4
    rng = np.random.default_rng(0)

    from modulationdetectioncnn_tpu.config import AmcConfig
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.quant import quantize
    from modulationdetectioncnn_tpu.ops import infer
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v2_kernel,
        _dense_stage_int8_kernel,
        expand_conv1_weights,
        expand_taps,
        requantize,
        _shift_add,
    )

    cfg = AmcConfig()
    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, t_in)))
    calib = rng.standard_normal((256, 2, t_in)).astype(np.float32)
    qm = quantize(model, params, calib)
    x = jnp.asarray(rng.standard_normal((batch, 2, t_in)).astype(np.float32))

    macs_conv = batch * t1 * (8 + 3 * c2) * 512  # as computed on MXU (v2)
    macs_dense = batch * (t2 * c2 * d + d * 128)

    w1e = expand_conv1_weights(qm.w1p)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, qm.w2p,
                                            qm.m2, qm.o2)]

    def _spec(a):
        s = a.shape
        return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))

    inv_sx = float(1.0 / qm.s_x)
    xe_np = np.asarray(
        expand_taps(
            jnp.clip(jnp.round(x * inv_sx), -127, 127).astype(jnp.int8), t1
        ).reshape(batch * t1, 8)
    )
    xe = jnp.asarray(xe_np)

    # ---- A: v2 conv stage alone (from prebuilt xe)
    def conv_stage_v2(xe_in, block_b=128, chunk=8):
        b = batch
        return pl.pallas_call(
            functools.partial(_conv_stage_int8_v2_kernel, chunk=chunk,
                              t1=t1, c2=c2),
            grid=(b // block_b,),
            in_specs=[pl.BlockSpec((block_b * t1, 8), lambda i: (i, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, t2, c2), jnp.int8),
        )(xe_in, *conv_consts)

    for chunk, blk in ((8, 128), (8, 64), (16, 128)):
        f = jax.jit(functools.partial(conv_stage_v2, block_b=blk, chunk=chunk))
        sec = measure_per_iter(f, (xe,))
        report(f"A conv v2 chunk={chunk} blk={blk}", sec, macs_conv)

    # ---- B: conv stage, conv2 dot ONLY (no conv1 dot, no requants)
    def _dot_only_kernel(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 3 * c2)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                _shift_add(z, t2, c2).astype(jnp.int8)
            )

    a1q = jnp.asarray(rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
    w2 = jnp.asarray(qm.w2p)

    def dot_only(a, block_b=128, chunk=8):
        return pl.pallas_call(
            functools.partial(_dot_only_kernel, chunk=chunk),
            grid=(batch // block_b,),
            in_specs=[pl.BlockSpec((block_b * t1, 512), lambda i: (i, 0)),
                      pl.BlockSpec(w2.shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, t2, c2), jnp.int8),
        )(a, w2)

    for chunk in (8, 16):
        f = jax.jit(functools.partial(dot_only, chunk=chunk))
        sec = measure_per_iter(f, (a1q,))
        report(f"B conv2 dot+shiftadd only chunk={chunk}", sec,
               batch * t1 * 512 * 3 * c2)

    # ---- C: requant cost alone: (B*t1, 512) int32 -> int8
    acc = jnp.asarray(rng.integers(0, 1 << 20, (batch * t1, 512)).astype(np.int32))
    m1j, o1j = jnp.asarray(qm.m1), jnp.asarray(qm.o1)

    def _rq_kernel(a_ref, m_ref, o_ref, out_ref):
        out_ref[:] = requantize(a_ref[:], m_ref[:], o_ref[:], relu=True)

    def rq(a, rows=128 * t1):
        return pl.pallas_call(
            _rq_kernel,
            grid=(batch * t1 // rows,),
            in_specs=[pl.BlockSpec((rows, 512), lambda i: (i, 0)),
                      _spec(qm.m1), _spec(qm.o1)],
            out_specs=pl.BlockSpec((rows, 512), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((batch * t1, 512), jnp.int8),
        )(a, m1j, o1j)

    sec = measure_per_iter(jax.jit(rq), (acc,))
    print(f"{'C requant1 alone (B*126,512)':46s} {sec*1e6:9.1f} us  "
          f"({batch*t1*512/sec/1e9:.1f} Gel/s)")

    # ---- D: dense stage alone
    h = jnp.asarray(rng.integers(0, 127, (batch, t2 * c2)).astype(np.int8))
    w4 = infer._pad_cols(qm.w4); s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]

    def dense_stage(hb, dbb=256):
        return pl.pallas_call(
            _dense_stage_int8_kernel,
            grid=(batch // dbb,),
            in_specs=[pl.BlockSpec((dbb, t2 * c2), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        )(hb, *dense_consts)

    for dbb in (256, 1024):
        f = jax.jit(functools.partial(dense_stage, dbb=dbb))
        sec = measure_per_iter(f, (h,))
        report(f"D dense stage blk={dbb}", sec, macs_dense)

    # ---- E: XLA int8 dot at conv2 shape + ideal shape
    f = jax.jit(lambda a: jax.lax.dot_general(
        a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    sec = measure_per_iter(f, (a1q,))
    report("E XLA int8 dot (B*126,512)@(512,240)", sec,
           batch * t1 * 512 * 3 * c2)

    aa = jnp.asarray(rng.integers(-127, 127, (8192, 2048)).astype(np.int8))
    bb = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))
    f = jax.jit(lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    sec = measure_per_iter(f, (aa, bb))
    report("E2 XLA int8 dot 8192x2048x2048", sec, 8192 * 2048 * 2048)

    # ---- F: XLA prologue cost (quantize + expand_taps)
    f = jax.jit(lambda xb: expand_taps(
        jnp.clip(jnp.round(xb * inv_sx), -127, 127).astype(jnp.int8), t1
    ).reshape(batch * t1, 8))
    sec = measure_per_iter(f, (x,))
    print(f"{'F XLA prologue quantize+expand_taps':46s} {sec*1e6:9.1f} us")


if __name__ == "__main__":
    main()
