"""Backend shootout on the real chip: chained samples/s for every forward
implementation. Picks the headline path for bench.py."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

warm_transfer_async().wait(timeout=600)
print("warm", flush=True)

from modulationdetectioncnn_tpu.config import AmcConfig
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.train.quant import quantize
from modulationdetectioncnn_tpu.ops.infer import (
    make_bf16_forward, make_bf16_forward_v2, make_int8_forward_v2,
)
from modulationdetectioncnn_tpu.ops.infer_xla import make_int8_forward_xla

batch = 4096
cfg = AmcConfig()
model = VTCNN2.from_config(cfg.model)
rng = np.random.default_rng(0)
params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
calib = rng.standard_normal((256, 2, 128)).astype(np.float32)
qm = quantize(model, params, calib)
x0 = jnp.asarray(rng.standard_normal((batch, 2, 128)).astype(np.float32))


def run(name, fwd):
    f = jax.jit(lambda xb: jnp.argmax(fwd(xb), axis=-1))

    def body(xc):
        probe = f(xc).ravel()[0].astype(jnp.float32)
        return xc + probe * jnp.float32(1e-38)

    try:
        sec = measure_per_iter_chained(body, x0, n1=20, n2=100)
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s} FAILED: {str(e)[:100]}", flush=True)
        return
    print(f"{name:24s} {sec*1e6:9.1f} us/iter  "
          f"{batch*128/sec/1e6:8.1f} MS/s", flush=True)


which = sys.argv[1:] or ["xla_int8", "pallas_bf16", "pallas_int8"]
if "xla_int8" in which:
    run("xla_int8", make_int8_forward_xla(qm))
if "pallas_bf16" in which:
    run("pallas_bf16", make_bf16_forward(params))
if "pallas_bf16_v2" in which:
    run("pallas_bf16_v2", make_bf16_forward_v2(params))
if "pallas_int8" in which:
    run("pallas_int8", make_int8_forward_v2(qm))
if "xla_bf16" in which:
    apply_fn = lambda xb: model.apply(params, xb)  # noqa: E731
    run("xla_bf16", apply_fn)
