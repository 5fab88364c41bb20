"""Flax VT-CNN2-family conv-conv-dense model (SURVEY.md N11).

TPU-first redesign of the reference's fixed-point HDL datapath
(BASELINE.json:5 "HDL conv/MAC arrays -> Pallas conv kernels"): same
conv-conv-dense topology (BASELINE.json:8), but as a functional Flax module
with a bf16 compute / fp32 param dtype policy, NHWC layout (XLA's preferred
conv layout on TPU), and static shapes throughout so XLA tiles everything
onto the MXU.

The hot inference path has a second implementation as hand-written Pallas
kernels in :mod:`modulationdetectioncnn_tpu.ops`; this module is the
autodiff-friendly training definition and the parity oracle's JAX twin.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from modulationdetectioncnn_tpu.config import ModelConfig


class VTCNN2(nn.Module):
    """Conv(f1,(1,3))+ReLU -> Conv(f2,(2,3))+ReLU -> Dense(d)+ReLU -> Dense(C).

    Input: (B, 2, T) float IQ frames (I row 0, Q row 1). Valid padding:
    T=128 -> conv1 width 126 -> conv2 width 124 -> flatten 124*f2.
    Dropout(0.5) after each hidden layer, as in the VT-CNN2 lineage
    (SURVEY.md §2a [LINEAGE]).
    """

    num_classes: int = 11
    conv1_filters: int = 256
    conv2_filters: int = 80
    dense_units: int = 256
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "VTCNN2":
        return cls(
            num_classes=cfg.num_classes,
            conv1_filters=cfg.conv1_filters,
            conv2_filters=cfg.conv2_filters,
            dense_units=cfg.dense_units,
            dropout_rate=cfg.dropout_rate,
            dtype=jnp.dtype(cfg.dtype),
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = x.astype(self.dtype)[..., None]  # (B, 2, T, 1) NHWC
        h = nn.Conv(
            self.conv1_filters, (1, 3), padding="VALID", dtype=self.dtype,
            name="Conv1",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Conv(
            self.conv2_filters, (2, 3), padding="VALID", dtype=self.dtype,
            name="Conv2",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = h.reshape((h.shape[0], -1))
        h = nn.Dense(self.dense_units, dtype=self.dtype, name="Dense1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.num_classes, dtype=self.dtype, name="Dense2")(h)
        # Logits in fp32 for a numerically stable softmax/xent.
        return h.astype(jnp.float32)
