"""Remaining microbenchmarks, highest-value first, with transfer prewarm.

Order: E2 (true int8 MXU ceiling), E (XLA dot at conv2 shape), C (requant
throughput), D (dense stage), F (XLA prologue).
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
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter

INT8_PEAK = 394e12

warm_transfer_async().wait(timeout=600)
print("transfer warm", flush=True)


def report(name, sec, macs, extra=""):
    tops = 2 * macs / sec / 1e12
    print(
        f"{name:46s} {sec*1e6:9.1f} us  {tops:7.2f} TOPS "
        f"({100*2*macs/sec/INT8_PEAK:5.1f}% int8 peak) {extra}",
        flush=True,
    )


batch = 4096
t_in, c2, d = 128, 80, 256
t1, t2 = t_in - 2, t_in - 4
rng = np.random.default_rng(0)

# ---- E2: true int8 MXU ceiling, big square dot
aa = jnp.asarray(rng.integers(-127, 127, (8192, 2048)).astype(np.int8))
bb = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))
f = jax.jit(lambda p, q: jax.lax.dot_general(
    p, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
sec = measure_per_iter(f, (aa, bb), repeats=1)
report("E2 XLA int8 dot 8192x2048x2048", sec, 8192 * 2048 * 2048)

# bf16 same shape for the ratio
f = jax.jit(lambda p, q: jax.lax.dot_general(
    p.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
sec = measure_per_iter(f, (aa, bb), repeats=1)
report("E2b XLA bf16 dot 8192x2048x2048(cast)", sec, 8192 * 2048 * 2048)

# ---- E: XLA int8 dot at the conv2 shape
a1q = jnp.asarray(rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
w2 = jnp.asarray(rng.integers(-127, 127, (512, 240)).astype(np.int8))
f = jax.jit(lambda a: jax.lax.dot_general(
    a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
sec = measure_per_iter(f, (a1q,), repeats=1)
report("E XLA int8 dot (B*126,512)@(512,240)", sec, batch * t1 * 512 * 240)

# ---- C: requant throughput
from modulationdetectioncnn_tpu.ops.infer import requantize

acc = jnp.asarray(rng.integers(0, 1 << 20, (batch * t1, 512)).astype(np.int32))
m1 = jnp.asarray(rng.random(512).astype(np.float32) * 1e-3)
o1 = jnp.asarray(rng.random(512).astype(np.float32))


def _rq_kernel(a_ref, m_ref, o_ref, out_ref):
    out_ref[:] = requantize(a_ref[:], m_ref[:], o_ref[:], relu=True)


def rq(a, rows=64 * t1):
    return pl.pallas_call(
        _rq_kernel,
        grid=(batch * t1 // rows,),
        in_specs=[pl.BlockSpec((rows, 512), lambda i: (i, 0)),
                  pl.BlockSpec((512,), lambda i: (0,)),
                  pl.BlockSpec((512,), lambda i: (0,))],
        out_specs=pl.BlockSpec((rows, 512), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * t1, 512), jnp.int8),
    )(a, m1, o1)


sec = measure_per_iter(jax.jit(rq), (acc,), repeats=1)
print(f"{'C requant1 alone (B*126,512) i32->i8':46s} {sec*1e6:9.1f} us  "
      f"({batch*t1*512/sec/1e9:.1f} Gel/s)", flush=True)

# ---- D: dense stage (reusing a random quantized model's shapes)
from modulationdetectioncnn_tpu.ops.infer import _dense_stage_int8_kernel

h = jnp.asarray(rng.integers(0, 127, (batch, t2 * c2)).astype(np.int8))
w3 = jnp.asarray(rng.integers(-127, 127, (t2 * c2, d)).astype(np.int8))
m3 = jnp.asarray(rng.random(d).astype(np.float32) * 1e-3)
o3 = jnp.asarray(rng.random(d).astype(np.float32))
w4 = jnp.asarray(rng.integers(-127, 127, (d, 128)).astype(np.int8))
s4 = jnp.asarray(rng.random(128).astype(np.float32))
b4 = jnp.asarray(rng.random(128).astype(np.float32))
dense_consts = [w3, m3, o3, w4, s4, b4]


def _spec(a):
    s = a.shape
    return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))


def dense_stage(hb, dbb=512):
    return pl.pallas_call(
        _dense_stage_int8_kernel,
        grid=(batch // dbb,),
        in_specs=[pl.BlockSpec((dbb, t2 * c2), lambda i: (i, 0))]
        + [_spec(a) for a in dense_consts],
        out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
    )(hb, *dense_consts)


sec = measure_per_iter(jax.jit(dense_stage), (h,), repeats=1)
report("D dense stage blk=512", sec, batch * (t2 * c2 * d + d * 128))

# ---- F: XLA prologue (quantize + expand_taps)
from modulationdetectioncnn_tpu.ops.infer import expand_taps

x = jnp.asarray(rng.standard_normal((batch, 2, t_in)).astype(np.float32))
f = jax.jit(lambda xb: expand_taps(
    jnp.clip(jnp.round(xb * 12.7), -127, 127).astype(jnp.int8), t1
).reshape(batch * t1, 8))
sec = measure_per_iter(f, (x,), repeats=1)
print(f"{'F XLA prologue quantize+expand_taps':46s} {sec*1e6:9.1f} us", flush=True)
