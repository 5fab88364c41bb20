"""Pure-XLA int8 forward — the same integer chain as ops/infer.py but
expressed as XLA ops so the compiler owns fusion/scheduling.

Purpose (SURVEY.md §6): a strong software baseline for the hand-written
Pallas path. XLA's bf16 Flax forward measures 54% of bf16 peak on this
chip (377 MS/s); if its int8 dot + fused requant epilogues schedule as
well, this path bounds what the Pallas kernels must beat. Bit-exactness:
identical arithmetic to golden/quant.py (same tap-stacked conv1 matmul,
tap-packed conv2 matmul + shift-add, round-half-up requantize).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.ops.cnn_kernels import requantize
from modulationdetectioncnn_tpu.ops.infer import (
    _pad_cols,
    _shift_add,
    expand_conv1_weights,
    expand_taps,
)


def make_int8_forward_xla(qm):
    """Fused-by-XLA int8 forward: (B,2,T) f32 -> (B,NC) f32 logits."""
    c2 = qm.m2.shape[0]
    nc = qm.b4.shape[0]
    w1e = jnp.asarray(expand_conv1_weights(qm.w1p))
    m1, o1 = jnp.asarray(qm.m1), jnp.asarray(qm.o1)
    w2, m2, o2 = jnp.asarray(qm.w2p), jnp.asarray(qm.m2), jnp.asarray(qm.o2)
    w3, m3, o3 = jnp.asarray(qm.w3), jnp.asarray(qm.m3), jnp.asarray(qm.o3)
    w4 = jnp.asarray(_pad_cols(qm.w4))
    s4 = jnp.asarray(_pad_cols(qm.s4))
    b4 = jnp.asarray(_pad_cols(qm.b4))
    inv_sx = float(1.0 / qm.s_x)

    @jax.jit
    def forward(x):
        b, _, t_in = x.shape
        t1, t2 = t_in - 2, t_in - 4
        x_i8 = jnp.clip(jnp.round(x * inv_sx), -127.0, 127.0).astype(jnp.int8)
        xe = expand_taps(x_i8, t1).reshape(b * t1, 8)
        a1 = jax.lax.dot_general(
            xe, w1e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        a1q = requantize(a1, m1, o1, relu=True)
        z = jax.lax.dot_general(
            a1q, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(b, t1, 3 * c2)
        a2 = requantize(_shift_add(z, t2, c2), m2, o2, relu=True)
        h = a2.reshape(b, t2 * c2)
        acc3 = jax.lax.dot_general(
            h, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        a3 = requantize(acc3, m3, o3, relu=True)
        acc4 = jax.lax.dot_general(
            a3, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        logits = acc4.astype(jnp.float32) * s4 + b4
        return logits[:, :nc]

    return forward
