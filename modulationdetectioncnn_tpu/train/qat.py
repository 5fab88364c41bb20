"""Quantization-aware training (SURVEY.md N13 'optional QAT fake-quant pass').

PTQ already holds the SNR curve within ~0.5% absolute (results_int8.json),
so QAT is the fallback lever for when a future model/quant config degrades
(SURVEY.md §7 hard-part #3: 'if the 0 dB point degrades >1%, fall back to
QAT'). Design:

- **Fake-quant with straight-through estimator (STE)**: forward applies the
  deployment quantizer (per-channel symmetric int8 weights, per-tensor
  activation scales, the same multiply-by-reciprocal input quantizer as
  golden/quant.py); backward passes gradients through unchanged.
- **Pure-function forward over the VTCNN2 param pytree** (no separate module
  class): `qat_apply(params, x, scales, ...)` consumes/produces exactly the
  tree `models/vtcnn2.py` trains and `train/quant.py::quantize` exports, so
  the flow is: train float -> calibrate scales -> `finetune_qat` a few
  hundred steps -> PTQ-export as usual.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _ste(x: jnp.ndarray, qdq: jnp.ndarray) -> jnp.ndarray:
    """Straight-through: forward qdq(x), backward identity."""
    return x + jax.lax.stop_gradient(qdq - x)


def fake_quant_weight(w: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Per-out-channel symmetric int8 quantize-dequantize with STE."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis % w.ndim)
    s = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    qdq = jnp.clip(jnp.round(w / s), -127, 127) * s
    return _ste(w, qdq)


def fake_quant_act(
    x: jnp.ndarray, scale: float, relu_domain: bool = True
) -> jnp.ndarray:
    """Per-tensor int8 quantize-dequantize with STE (scale frozen)."""
    inv = np.float32(1.0 / np.float64(np.float32(scale)))
    lo = 0.0 if relu_domain else -127.0
    qdq = jnp.clip(jnp.round(x * inv), lo, 127.0) * np.float32(scale)
    return _ste(x, qdq)


def qat_apply(
    params: Any,
    x: jnp.ndarray,
    scales: dict,
    *,
    train: bool = False,
    dropout_key=None,
    dropout_rate: float = 0.5,
) -> jnp.ndarray:
    """Fake-quant VT-CNN2 forward on the standard Flax param tree.

    params: {'params': {'Conv1': {...}, ...}} as produced by VTCNN2.init.
    scales: {'s_x', 'a1', 'a2', 'a3'} from quant.calibrate_activations.
    """
    p = params["params"] if "params" in params else params
    x = fake_quant_act(x.astype(jnp.float32), scales["s_x"], relu_domain=False)
    h = x[..., None]  # (B, 2, T, 1) NHWC

    def dropout(h, key_idx):
        if not train or dropout_rate == 0.0:
            return h
        k = jax.random.fold_in(dropout_key, key_idx)
        keep = jax.random.bernoulli(k, 1.0 - dropout_rate, h.shape)
        return jnp.where(keep, h / (1.0 - dropout_rate), 0.0)

    h = jax.lax.conv_general_dilated(
        h, fake_quant_weight(p["Conv1"]["kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["Conv1"]["bias"]
    h = fake_quant_act(jax.nn.relu(h), scales["a1"])
    h = dropout(h, 1)

    h = jax.lax.conv_general_dilated(
        h, fake_quant_weight(p["Conv2"]["kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["Conv2"]["bias"]
    h = fake_quant_act(jax.nn.relu(h), scales["a2"])
    h = dropout(h, 2)

    h = h.reshape((h.shape[0], -1))
    h = h @ fake_quant_weight(p["Dense1"]["kernel"]) + p["Dense1"]["bias"]
    h = fake_quant_act(jax.nn.relu(h), scales["a3"])
    h = dropout(h, 3)

    return (
        h @ fake_quant_weight(p["Dense2"]["kernel"]) + p["Dense2"]["bias"]
    ).astype(jnp.float32)


def finetune_qat(
    params: Any,
    scales: dict,
    data_x: np.ndarray,
    data_y: np.ndarray,
    *,
    num_steps: int = 300,
    batch_size: int = 1024,
    learning_rate: float = 1e-4,
    dropout_rate: float = 0.5,
    seed: int = 0,
) -> Any:
    """Fine-tune float params under deployment-exact fake-quant.

    Device-resident data (same pattern as train/loop.py). Returns the
    fine-tuned param tree (same structure as input).
    """
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    dx = jax.device_put(jnp.asarray(data_x, jnp.float32))
    dy = jax.device_put(jnp.asarray(data_y, jnp.int32))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key):
        ik, dk = jax.random.split(key)
        idx = jax.random.randint(ik, (batch_size,), 0, dx.shape[0])
        xb, yb = jnp.take(dx, idx, axis=0), jnp.take(dy, idx, axis=0)

        def loss_fn(p):
            logits = qat_apply(
                p, xb, scales, train=True, dropout_key=dk,
                dropout_rate=dropout_rate,
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed)
    loss = None
    for _ in range(num_steps):
        key, sk = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sk)
    jax.block_until_ready(loss)
    return params
