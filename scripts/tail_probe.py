"""Where does the non-conv ~1.2ms of the int8 forward go? Chained probes of
the prologue (quantize+expand_taps), dense stage, and argmax."""
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
    _dense_stage_int8_kernel, expand_taps,
)

cfg = AmcConfig()
model = VTCNN2.from_config(cfg.model)
rng = np.random.default_rng(0)
params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
calib = rng.standard_normal((256, 2, 128)).astype(np.float32)
qm = quantize(model, params, calib)
batch, t_in, c2 = 4096, 128, 80
t1, t2 = t_in - 2, t_in - 4


def chained_f32carry(name, fn, x0, n1=20, n2=100):
    def body(xc):
        out = fn(xc)
        probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
        return xc + probe * jnp.float32(1e-38)

    sec = measure_per_iter_chained(body, x0, n1=n1, n2=n2)
    print(f"{name:34s} {sec*1e6:9.1f} us", flush=True)
    return sec


# ---- prologue
x0 = jnp.asarray(rng.standard_normal((batch, 2, 128)).astype(np.float32))
inv_sx = float(1.0 / qm.s_x)


@jax.jit
def prologue(x):
    x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
    return expand_taps(x_i8, t1).reshape(x.shape[0] * t1, 8)


chained_f32carry("prologue quantize+expand", prologue, x0)

# ---- dense stage (carry must stay f32: use an f32 input that we cast)
w4 = infer._pad_cols(qm.w4)
s4 = infer._pad_cols(qm.s4)
b4 = infer._pad_cols(qm.b4)
dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]


def _spec(a):
    s = np.asarray(a).shape
    return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))


def dense_stage(hf32, dbb):
    hb = hf32.astype(jnp.int8)
    return pl.pallas_call(
        _dense_stage_int8_kernel,
        grid=(batch // dbb,),
        in_specs=[pl.BlockSpec((dbb, t2 * c2), lambda i: (i, 0))]
        + [_spec(a) for a in dense_consts],
        out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(hb, *dense_consts)


h0 = jnp.asarray(rng.integers(0, 80, (batch, t2 * c2)).astype(np.float32))
for dbb in (256, 1024):
    chained_f32carry(f"dense stage (+cast) dbb={dbb}",
                     functools.partial(dense_stage, dbb=dbb), h0)

# ---- argmax
l0 = jnp.asarray(rng.standard_normal((batch, 128)).astype(np.float32))
chained_f32carry("argmax (B,128)",
                 jax.jit(lambda v: jnp.argmax(v, axis=-1)), l0)
