"""Kernel microbenchmarks: dissect the int8 forward to find the bottleneck.

Measures (overhead-cancelled, utils/timing.py) each stage of the fused int8
path plus idealized MXU shapes, so optimization targets the real hot spot
(SURVEY.md §6: conv2 must reach ~71% int8 MXU utilization for 1 GS/s).

Usage: python scripts/kbench.py [batch]
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

from modulationdetectioncnn_tpu.utils.timing import measure_per_iter

INT8_PEAK = 394e12  # v5e int8 TOPS
BF16_PEAK = 197e12


def report(name: str, sec: float, macs: int, extra: str = ""):
    tops = 2 * macs / sec / 1e12
    print(
        f"{name:42s} {sec*1e6:9.1f} us  {tops:7.2f} TOPS "
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
        make_int8_forward,
        make_int8_forward_v2,
        _conv_stage_int8_kernel,
        _dense_stage_int8_kernel,
    )

    cfg = AmcConfig()
    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, t_in)))
    calib = rng.standard_normal((256, 2, t_in)).astype(np.float32)
    qm = quantize(model, params, calib)

    x = jnp.asarray(rng.standard_normal((batch, 2, t_in)).astype(np.float32))

    macs_conv1 = batch * 2 * t1 * c1 * 3
    macs_conv2 = batch * t2 * c2 * 2 * 3 * c1
    macs_conv2_padded = batch * t1 * 512 * 240  # as-computed by tap-packing
    macs_dense = batch * (t2 * c2 * d + d * nc)
    macs_total = macs_conv1 + macs_conv2 + macs_dense

    # ---- V0: full fused int8 forward
    fwd = make_int8_forward(qm)
    f0 = jax.jit(lambda xb: jnp.argmax(fwd(xb), axis=-1))
    sec = measure_per_iter(f0, (x,))
    report("V0 full int8 fwd+argmax", sec, macs_total,
           f"-> {batch*t_in/sec/1e9:.3f} GS/s")

    # ---- V0b: v2 fused forward (conv1 on MXU via tap-stacked input)
    for chunk in (4, 8, 16):
        fwd2 = make_int8_forward_v2(qm, chunk=chunk)
        f0b = jax.jit(lambda xb, f=fwd2: jnp.argmax(f(xb), axis=-1))
        sec = measure_per_iter(f0b, (x,))
        report(f"V0b v2 int8 fwd+argmax chunk={chunk}", sec, macs_total,
               f"-> {batch*t_in/sec/1e9:.3f} GS/s")

    # ---- V1: conv stage only (both layers fused)
    def conv_stage(xb, block_b=128, chunk=16):
        b = xb.shape[0]
        conv_consts = [jnp.asarray(a) for a in
                       (qm.w1p, qm.m1, qm.o1, qm.w2p, qm.m2, qm.o2)]

        def _spec(a):
            s = a.shape
            return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))

        return pl.pallas_call(
            functools.partial(_conv_stage_int8_kernel, chunk=chunk, t_in=t_in,
                              c2=c2, inv_sx=float(1.0 / qm.s_x)),
            grid=(b // block_b,),
            in_specs=[pl.BlockSpec((block_b, 2, t_in), lambda i: (i, 0, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, t2, c2), jnp.int8),
        )(xb, *conv_consts)

    for chunk in (8, 16, 32):
        for block_b in (128, 256):
            if chunk > block_b:
                continue
            f1 = jax.jit(functools.partial(conv_stage, block_b=block_b, chunk=chunk))
            sec = measure_per_iter(f1, (x,))
            report(f"V1 conv stage chunk={chunk} blk={block_b}", sec,
                   macs_conv1 + macs_conv2)

    # ---- V2: dense stage only
    h = jnp.asarray(
        rng.integers(0, 127, size=(batch, t2 * c2)).astype(np.int8)
    )
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]

    def dense_stage(hb, dense_block_b=256):
        b = hb.shape[0]

        def _spec(a):
            s = a.shape
            return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))

        return pl.pallas_call(
            _dense_stage_int8_kernel,
            grid=(b // dense_block_b,),
            in_specs=[pl.BlockSpec((dense_block_b, t2 * c2), lambda i: (i, 0))]
            + [_spec(a) for a in dense_consts],
            out_specs=pl.BlockSpec((dense_block_b, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        )(hb, *dense_consts)

    for dbb in (256, 512):
        f2 = jax.jit(functools.partial(dense_stage, dense_block_b=dbb))
        sec = measure_per_iter(f2, (h,))
        report(f"V2 dense stage blk={dbb}", sec, macs_dense)

    # ---- V3: conv2 dot only (the roofline kernel): (B*t1, 512) @ (512, 240)
    a1 = jnp.asarray(rng.integers(0, 127, size=(batch * t1, 512)).astype(np.int8))
    w2 = jnp.asarray(qm.w2p)

    def conv2_dot(a):
        return jax.lax.dot_general(a, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    sec = measure_per_iter(jax.jit(conv2_dot), (a1,))
    report("V3 XLA int8 dot (B*126,512)@(512,240)", sec, macs_conv2_padded)

    # ---- V4: ideal big int8 dot for calibration: (8192, 2048) @ (2048, 2048)
    aa = jnp.asarray(rng.integers(-127, 127, size=(8192, 2048)).astype(np.int8))
    bb = jnp.asarray(rng.integers(-127, 127, size=(2048, 2048)).astype(np.int8))
    f4 = jax.jit(lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    sec = measure_per_iter(f4, (aa, bb))
    report("V4 XLA int8 dot 8192x2048x2048", sec, 8192 * 2048 * 2048)

    # bf16 variant of V4
    aab = aa.astype(jnp.bfloat16)
    bbb = bb.astype(jnp.bfloat16)
    f4b = jax.jit(lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    sec = measure_per_iter(f4b, (aab, bbb))
    tflops = 2 * 8192 * 2048 * 2048 / sec / 1e12
    print(f"{'V4b bf16 dot 8192x2048x2048':42s} {sec*1e6:9.1f} us  "
          f"{tflops:7.2f} TFLOPS ({100*tflops*1e12/BF16_PEAK:5.1f}% bf16 peak)")

    # ---- V5: XLA-only bf16 full forward (the non-Pallas reference path)
    apply = jax.jit(lambda xb: model.apply(params, xb).argmax(-1))
    sec = measure_per_iter(apply, (x,))
    report("V5 XLA bf16 flax fwd+argmax", sec, macs_total,
           f"-> {batch*t_in/sec/1e9:.3f} GS/s")

    # ---- V6: input-quantize cost: (B,2,128) f32 -> int8 elementwise
    f6 = jax.jit(lambda xb: jnp.clip(
        jnp.round(xb * 12.7), -127, 127).astype(jnp.int8))
    sec = measure_per_iter(f6, (x,))
    print(f"{'V6 input f32->int8 quantize (XLA)':42s} {sec*1e6:9.1f} us")


if __name__ == "__main__":
    main()
