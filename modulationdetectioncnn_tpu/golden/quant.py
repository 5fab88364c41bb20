"""NumPy golden int8 inference chain (SURVEY.md §4b: "int8 = match golden
int8 requantize exactly — integer arithmetic is deterministic").

Mirrors ops/cnn_kernels.py + ops/infer.py operation-for-operation: int32
accumulation, the same fixed-point integer requantize
((acc + offset) >> shift — pure integer arithmetic, exact and order-free),
the same stacked/tap-packed layouts. The Pallas int8 kernels must
reproduce these int8 activations bit-for-bit.
"""
from __future__ import annotations

import numpy as np


def _requant(acc_i32: np.ndarray, shift: np.ndarray, offset: np.ndarray, relu=True):
    """relu=True spec is classic fixed-point round-half-up:
    clip((acc + offset) >> shift, 0, 127) with int32 per-channel shift and
    an int32 offset that folds bias AND the +0.5 rounding term (see
    train/quant.py). Pure integer arithmetic — exact and order-free.
    Matches ops/cnn_kernels.py::requantize; keep in lockstep."""
    if relu:
        v = (acc_i32 + offset.astype(np.int32)) >> shift.astype(np.int32)
        return np.clip(v, 0, 127).astype(np.int8)
    if not np.issubdtype(np.asarray(shift).dtype, np.floating):
        # Lockstep with ops/cnn_kernels.requantize (ADVICE r4 #2): the
        # legacy branch treats ``shift`` as an f32 multiplier.
        raise TypeError(
            "_requant(relu=False) expects legacy f32 (mult, offset); got "
            f"integer dtype {np.asarray(shift).dtype}"
        )
    v = np.round(acc_i32.astype(np.float32) * shift + offset)
    return np.clip(v, -127.0, 127.0).astype(np.int8)


def quantize_input(x: np.ndarray, s_x: float) -> np.ndarray:
    """The quantizer SPEC is multiply-by-f32-reciprocal (what the Pallas
    kernels execute on the VPU), not divide — divide differs by 1 LSB at
    round-boundary inputs (~1/65k frames), so golden must match the
    deployed arithmetic exactly."""
    inv = np.float32(1.0 / np.float64(np.float32(s_x)))
    return np.clip(np.round(x.astype(np.float32) * inv), -127, 127).astype(
        np.int8
    )


def conv1_int8(x_i8: np.ndarray, w1p: np.ndarray, m1, o1) -> np.ndarray:
    """(B,2,T) int8 -> (B,T-2,2C) int8 stacked."""
    b, _, t = x_i8.shape
    c = w1p.shape[1]
    t_out = t - 2
    x32 = x_i8.astype(np.int32)
    w32 = w1p.astype(np.int32)
    halves = []
    for h in range(2):
        acc = np.zeros((b, t_out, c), np.int32)
        for k in range(3):
            acc += x32[:, h, k : k + t_out, None] * w32[k][None, None, :]
        halves.append(acc)
    acc2 = np.concatenate(halves, axis=-1)
    return _requant(acc2, m1, o1)


def conv2_int8(a1s_i8: np.ndarray, w2p: np.ndarray, m2, o2) -> np.ndarray:
    """(B,T,2C) int8 -> (B,T-2,Co) int8 via tap-packed z + shift-add."""
    b, t_in, _ = a1s_i8.shape
    co = w2p.shape[1] // 3
    z = a1s_i8.astype(np.int32).reshape(b * t_in, -1) @ w2p.astype(np.int32)
    z = z.reshape(b, t_in, 3 * co)
    t_out = t_in - 2
    acc = (
        z[:, 0:t_out, 0:co]
        + z[:, 1 : t_out + 1, co : 2 * co]
        + z[:, 2 : t_out + 2, 2 * co : 3 * co]
    )
    return _requant(acc, m2, o2)


def dense_int8(a_i8: np.ndarray, w_i8: np.ndarray, mult, offset) -> np.ndarray:
    acc = a_i8.astype(np.int32) @ w_i8.astype(np.int32)
    return _requant(acc, mult, offset)


def int8_forward(qm, x: np.ndarray) -> np.ndarray:
    """Full golden int8 forward: (B,2,T) float -> (B, n_classes) f32 logits."""
    x_i8 = quantize_input(x, float(qm.s_x))
    a1 = conv1_int8(x_i8, qm.w1p, qm.m1, qm.o1)
    a2 = conv2_int8(a1, qm.w2p, qm.m2, qm.o2)
    b = a2.shape[0]
    a2f = a2.reshape(b, -1)
    a3 = dense_int8(a2f, qm.w3, qm.m3, qm.o3)
    acc4 = a3.astype(np.int32) @ qm.w4.astype(np.int32)
    return acc4.astype(np.float32) * qm.s4 + qm.b4


def int8_predict(qm, x: np.ndarray) -> np.ndarray:
    return np.argmax(int8_forward(qm, x), axis=-1)
