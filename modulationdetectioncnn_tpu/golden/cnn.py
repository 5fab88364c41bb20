"""NumPy CPU golden CNN forward (SURVEY.md N3, BASELINE.json:7).

This is THE equivalence oracle: pure float64/float32 NumPy, no JAX. It plays
the role the reference's Python float model plays for its SystemVerilog
testbenches (SURVEY.md §4a) — every JAX/Pallas stage is tolerance-tested
against it. It consumes the *same* parameter pytree the Flax model produces
(``{'params': {'Conv1': {'kernel', 'bias'}, ...}}``) so tests pass trained
params straight through both paths.

Topology (BASELINE.json:8 "2x128 IQ, conv-conv-dense"):
  (B,2,128,1) -conv(1,3)x256,valid,relu-> (B,2,126,256)
              -conv(2,3)x80,valid,relu->  (B,1,124,80)
              -flatten-> (B,9920) -dense256,relu-> -dense11-> logits
"""
from __future__ import annotations

import numpy as np


def conv2d_valid(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """NHWC valid 2D convolution (cross-correlation, as in Flax/lax).

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout); b: (Cout,).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    out = np.zeros((B, Ho, Wo, Cout), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            # Accumulate tap (i, j): slice once and matmul over channels.
            patch = x[:, i : i + Ho, j : j + Wo, :].astype(np.float64)
            tap = w[i, j].astype(np.float64)  # (Cin, Cout)
            out += patch @ tap
    return out + b.astype(np.float64)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def vtcnn2_forward(params: dict, x: np.ndarray) -> np.ndarray:
    """Golden forward pass. x: (B, 2, T) float -> logits (B, num_classes)."""
    p = params["params"] if "params" in params else params
    h = x.astype(np.float64)[..., None]  # (B, 2, T, 1) NHWC
    h = relu(conv2d_valid(h, np.asarray(p["Conv1"]["kernel"]), np.asarray(p["Conv1"]["bias"])))
    h = relu(conv2d_valid(h, np.asarray(p["Conv2"]["kernel"]), np.asarray(p["Conv2"]["bias"])))
    h = h.reshape(h.shape[0], -1)  # row-major (H, W, C) flatten, matches Flax
    h = relu(h @ np.asarray(p["Dense1"]["kernel"], dtype=np.float64) + np.asarray(p["Dense1"]["bias"]))
    return h @ np.asarray(p["Dense2"]["kernel"], dtype=np.float64) + np.asarray(p["Dense2"]["bias"])


def vtcnn2_predict(params: dict, x: np.ndarray) -> np.ndarray:
    return np.argmax(vtcnn2_forward(params, x), axis=-1)
