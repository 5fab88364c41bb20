"""Chained (serialization-proof) microbenchmarks: true MXU ceilings + fused
conv-stage variants. Every measurement iterates inside ONE program via
fori_loop carry dependencies (utils/timing.py::measure_per_iter_chained).
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

warm_transfer_async().wait(timeout=600)
print("transfer warm", flush=True)

rng = np.random.default_rng(0)
batch = 4096
t_in, c2 = 128, 80
t1, t2 = t_in - 2, t_in - 4


def report(name, sec, macs):
    tops = 2 * macs / sec / 1e12
    print(f"{name:52s} {sec*1e6:9.1f} us  {tops:7.2f} TOPS", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

# ---- 1/2: true MXU ceilings, square dots chained through the input
if which in ("all", "ceil"):
    a0 = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))
    b0 = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))

    def body_i8(c):
        y = jax.lax.dot_general(c, b0, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y & 127).astype(jnp.int8)

    sec = measure_per_iter_chained(body_i8, a0, n1=400, n2=2000)
    report("1 chained int8 dot 2048^3", sec, 2048**3)

    a0b = a0.astype(jnp.bfloat16)
    b0b = b0.astype(jnp.bfloat16)

    def body_bf16(c):
        y = jax.lax.dot_general(c, b0b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * 1e-4).astype(jnp.bfloat16)

    sec = measure_per_iter_chained(body_bf16, a0b, n1=400, n2=2000)
    report("2 chained bf16 dot 2048^3", sec, 2048**3)

# ---- 3: conv2-shape dot, chained through the WEIGHTS (input too big to chain)
if which in ("all", "ceil"):
    a1q = jnp.asarray(rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
    w0 = jnp.asarray(rng.integers(-127, 127, (512, 240)).astype(np.int8))

    def body_conv2(w):
        y = jax.lax.dot_general(a1q, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y[:512] & 127).astype(jnp.int8)

    sec = measure_per_iter_chained(body_conv2, w0, n1=40, n2=200)
    report("3 chained XLA int8 dot (516k,512)@(512,240)", sec,
           batch * t1 * 512 * 240)

# ---- 4: fused v2 conv stage, chained through the input planes
if which in ("all", "fused"):
    from modulationdetectioncnn_tpu.config import AmcConfig
    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.quant import quantize
    from modulationdetectioncnn_tpu.ops.infer import (
        _conv_stage_int8_v2_kernel, expand_conv1_weights, expand_taps,
    )

    cfg = AmcConfig()
    model = VTCNN2.from_config(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, t_in)))
    calib = rng.standard_normal((256, 2, t_in)).astype(np.float32)
    qm = quantize(model, params, calib)
    w1e = expand_conv1_weights(qm.w1p)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, qm.w2p,
                                            qm.m2, qm.o2)]

    def _spec(a):
        s = a.shape
        return pl.BlockSpec(
            s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0))
        )

    def conv_stage(xe_in, block_b, chunk):
        return pl.pallas_call(
            functools.partial(_conv_stage_int8_v2_kernel, chunk=chunk,
                              t1=t1, c2=c2),
            grid=(batch // block_b,),
            in_specs=[pl.BlockSpec((block_b * t1, 8), lambda i: (i, 0))]
            + [_spec(a) for a in conv_consts],
            out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, t2, c2), jnp.int8),
        )(xe_in, *conv_consts)

    xe0 = jnp.asarray(rng.integers(-127, 127, (batch * t1, 8)).astype(np.int8))
    macs_conv = batch * t1 * (8 + 3 * c2) * 512

    for blk, chunk in ((64, 8), (32, 8), (64, 16)):
        def body(c, blk=blk, chunk=chunk):
            out = conv_stage(c, blk, chunk)  # (B, t2, c2) int8
            # fold output back into the input (cheap: one elementwise pass)
            probe = out[0, 0, 0].astype(jnp.int8)
            return (c ^ probe).astype(jnp.int8)

        sec = measure_per_iter_chained(body, xe0, n1=20, n2=100)
        report(f"4 chained fused conv stage blk={blk} chunk={chunk}",
               sec, macs_conv)
