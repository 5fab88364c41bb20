"""Hybrid-pipeline probe: XLA conv1(+fused requant) feeding a Pallas fused
int8 conv2+dense — plus batch-size sweep of the XLA bf16 baseline.

Decides the headline inference architecture for bench.py.
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

from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

warm_transfer_async().wait(timeout=600)
print("warm", flush=True)

from modulationdetectioncnn_tpu.config import AmcConfig
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.train.quant import quantize
from modulationdetectioncnn_tpu.ops import infer
from modulationdetectioncnn_tpu.ops.infer import (
    _dense_stage_int8_kernel, _shift_add, expand_conv1_weights, expand_taps,
)
from modulationdetectioncnn_tpu.ops.cnn_kernels import requantize

cfg = AmcConfig()
model = VTCNN2.from_config(cfg.model)
rng = np.random.default_rng(0)
params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
calib = rng.standard_normal((256, 2, 128)).astype(np.float32)
qm = quantize(model, params, calib)
t_in, c2 = 128, 80
t1, t2 = t_in - 2, t_in - 4


def chained(name, fn, x0, n1=20, n2=100):
    def body(xc):
        out = fn(xc)
        probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
        return xc + probe * jnp.float32(1e-38)

    try:
        sec = measure_per_iter_chained(body, x0, n1=n1, n2=n2)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {str(e)[:90]}", flush=True)
        return None
    b = x0.shape[0] if x0.ndim == 3 else x0.shape[0] // t1
    print(f"{name:34s} {sec*1e6:9.1f} us  {b*128/sec/1e6:8.1f} MS/s",
          flush=True)
    return sec


# ---- 1: XLA bf16 batch sweep
for b in (8192, 16384):
    x0 = jnp.asarray(rng.standard_normal((b, 2, 128)).astype(np.float32))
    f = jax.jit(lambda xb: model.apply(params, xb).argmax(-1))
    chained(f"xla_bf16 batch={b}", f, x0, n1=10, n2=50)

# ---- 2: XLA conv1 + fused requant alone (via the tap-stack matmul, which
# XLA also prefers over its Cin=1 conv path)
batch = 4096
x0 = jnp.asarray(rng.standard_normal((batch, 2, 128)).astype(np.float32))
w1e = jnp.asarray(expand_conv1_weights(qm.w1p))
m1, o1 = jnp.asarray(qm.m1), jnp.asarray(qm.o1)
inv_sx = float(1.0 / qm.s_x)


@jax.jit
def conv1_quant_xla(x):
    x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
    xe = expand_taps(x_i8, t1).reshape(x.shape[0] * t1, 8)
    a1 = jax.lax.dot_general(
        xe, w1e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return requantize(a1, m1, o1, relu=True)  # (B*t1, 512) int8


chained("xla conv1+requant", conv1_quant_xla, x0)

# ---- 3: Pallas fused conv2(+requant)+dense from a1q
w2, m2, o2 = jnp.asarray(qm.w2p), jnp.asarray(qm.m2), jnp.asarray(qm.o2)
w4 = infer._pad_cols(qm.w4)
s4 = infer._pad_cols(qm.s4)
b4 = infer._pad_cols(qm.b4)
dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]


def _spec(a):
    s = a.shape
    return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))


def _conv2_kernel(a_ref, w_ref, m_ref, o_ref, out_ref, *, chunk):
    tb = out_ref.shape[0]
    for ci in range(tb // chunk):
        a = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
        z = jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(chunk, t1, 3 * c2)
        out_ref[ci * chunk : (ci + 1) * chunk] = requantize(
            _shift_add(z, t2, c2), m_ref[:], o_ref[:], relu=True
        )


def conv2_dense(a1q, block_b=64, chunk=16, dbb=256):
    b = a1q.shape[0] // t1
    out2 = pl.pallas_call(
        functools.partial(_conv2_kernel, chunk=chunk),
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b * t1, 512), lambda i: (i, 0)),
                  _spec(np.asarray(qm.w2p)), _spec(qm.m2), _spec(qm.o2)],
        out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t2, c2), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(a1q, w2, m2, o2)
    h = out2.reshape(b, t2 * c2)
    return pl.pallas_call(
        _dense_stage_int8_kernel,
        grid=(b // dbb,),
        in_specs=[pl.BlockSpec((dbb, t2 * c2), lambda i: (i, 0))]
        + [_spec(np.asarray(a)) for a in dense_consts],
        out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(h, *dense_consts)


a1q0 = jnp.asarray(rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
f3 = jax.jit(lambda a: jnp.argmax(conv2_dense(a), axis=-1))
chained("pallas conv2+dense (from a1q)", f3, a1q0)

# ---- 4: the full hybrid end to end
f4 = jax.jit(lambda xb: jnp.argmax(conv2_dense(conv1_quant_xla(xb)), axis=-1))
chained("HYBRID xla-conv1 + pallas-rest", f4, x0)
