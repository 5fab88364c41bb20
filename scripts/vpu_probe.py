"""Direct VPU/MXU rate probes: fori_loop inside ONE Pallas kernel over
VMEM-resident data — no HBM, no dispatch overhead, pure compute rates.

Answers (for the conv-stage shapes):
- VPU: effective elementwise ops/s for the requant pattern (fma+relu+cvt).
- MXU: back-to-back small-dot rate for (2016,512)@(512,256) in bf16/int8,
  and the K=8 small-K dot (the conv1 tap matmul) to quantify K-pad tax.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import make_sync

warm_transfer_async().wait(timeout=600)
print("warm", flush=True)

M, K, N = 2016, 512, 256
ITERS = 2000


def timed(fn, *args):
    out = fn(*args)
    sync = make_sync(out)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---- A: VPU fma+relu rate on (M, 512) f32
def _vpu_kernel(x_ref, o_ref, *, iters):
    def body(i, acc):
        return jnp.maximum(acc * 1.0001 + 0.1, 0.0)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])


x = jnp.asarray(np.random.default_rng(0).random((M, 512)).astype(np.float32))
f = jax.jit(lambda xx: pl.pallas_call(
    functools.partial(_vpu_kernel, iters=ITERS),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, 512), jnp.float32),
)(xx))
sec = timed(f, x)
el_ops = M * 512 * ITERS * 2  # fma + max per element per iter
print(f"A VPU fma+relu: {sec*1e6:9.1f} us for {ITERS} iters -> "
      f"{el_ops/sec/1e12:.2f} T el-ops/s", flush=True)


# ---- B: MXU bf16 dot rate, conv2 shape, VMEM-resident
def _mxu_kernel(a_ref, w_ref, o_ref, *, iters, out_dtype):
    def body(i, acc):
        z = jax.lax.dot_general(
            acc, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return z[:, :a_ref.shape[1]].astype(a_ref.dtype)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, a_ref[:]).astype(out_dtype)


a_bf = jnp.asarray(np.random.default_rng(1).random((M, K)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
w_bf = jnp.asarray(np.random.default_rng(2).random((K, K)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
ITERS_B = 400
f = jax.jit(lambda aa, ww: pl.pallas_call(
    functools.partial(_mxu_kernel, iters=ITERS_B, out_dtype=jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
)(aa, ww))
sec = timed(f, a_bf, w_bf)
macs = M * K * K * ITERS_B
print(f"B MXU bf16 (2016,512)@(512,512): {2*macs/sec/1e12:.1f} TFLOP/s",
      flush=True)


# ---- C: MXU int8 dot rate, same shape
def _mxu_i8_kernel(a_ref, w_ref, o_ref, *, iters):
    def body(i, acc):
        z = jax.lax.dot_general(
            acc, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (z[:, :a_ref.shape[1]] & 63).astype(jnp.int8)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, a_ref[:])


a_i8 = jnp.asarray(np.random.default_rng(3).integers(-4, 4, (M, K)).astype(np.int8))
w_i8 = jnp.asarray(np.random.default_rng(4).integers(-4, 4, (K, K)).astype(np.int8))
f = jax.jit(lambda aa, ww: pl.pallas_call(
    functools.partial(_mxu_i8_kernel, iters=ITERS_B),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
)(aa, ww))
sec = timed(f, a_i8, w_i8)
print(f"C MXU int8 same shape (incl &63+cvt epilogue): "
      f"{2*macs/sec/1e12:.1f} TOP/s", flush=True)


# ---- D: small-K dot tax: (M, 8) @ (8, 512) bf16, chained via slice
def _smallk_kernel(a_ref, w_ref, o_ref, *, iters):
    def body(i, acc):
        z = jax.lax.dot_general(
            acc, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M, 512)
        return z[:, :8].astype(jnp.bfloat16)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, a_ref[:]).astype(jnp.bfloat16)


a_s = jnp.asarray(np.random.default_rng(5).random((M, 8)).astype(np.float32)).astype(jnp.bfloat16)
w_s = jnp.asarray(np.random.default_rng(6).random((8, 512)).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda aa, ww: pl.pallas_call(
    functools.partial(_smallk_kernel, iters=ITERS_B),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.bfloat16),
)(aa, ww))
sec = timed(f, a_s, w_s)
per_dot_us = sec / ITERS_B * 1e6
print(f"D small-K dot (2016,8)@(8,512) bf16: {per_dot_us:.2f} us/dot "
      f"(vs full-K ideal {2*M*8*512/188e12*1e6:.3f} us; "
      f"K128-padded {2*M*128*512/188e12*1e6:.2f} us)", flush=True)
