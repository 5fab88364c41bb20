"""Pallas conv kernels for the VT-CNN2 topology (SURVEY.md N8/N9).

TPU-native replacements for the reference's HDL conv/MAC engines
(BASELINE.json:5 "HDL conv/MAC arrays -> Pallas conv kernels"). The key
design decisions (SURVEY.md §7 hard-part #1):

- **conv1** (1x3, Cin=1, Cout=256): K=3 is hopeless on the MXU, but conv1 is
  ~1% of MACs — it runs as 3 shifted broadcast-multiply-accumulates on the
  VPU, emitting activations directly in the (T, h*256+c) "stacked" layout
  conv2 consumes (no transpose between layers).

- **conv2** (2x3, Cin=256, Cout=80) == a 1D conv over T with Cin=512 once
  the two input rows are stacked. Rather than im2col (6x memory blow-up) or
  per-tap matmuls (N=80 wastes 38% of the MXU's 128 lanes), it is ONE matmul
  against the tap-packed weight  W2p[(h*256+cin), (k*80+co)]  of shape
  (512, 240):  z = a1s @ W2p, then  out[t, co] = sum_k z[t+k, k*80+co]
  — three VPU shift-adds. K=512 = 4 full MXU tiles; N=240 of 256 lanes
  (94% packed); MAC overhead vs the true conv is 126/124 = 1.6%.

- **int8 path**: int8 x int8 -> int32 on the MXU, exact int32 tap-sums, then
  a per-channel FIXED-POINT requantize (acc + offset) >> shift with the
  quantizer constraining every scale to 2^-shift and folding bias + the 0.5
  rounding term into the int32 offset; ReLU folds into the [0,127] clip.
  Matches the NumPy golden (golden/quant.py) integer-exactly — and is the
  same arithmetic the reference archetype's HDL datapath used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_conv1_weights(w1: np.ndarray) -> np.ndarray:
    """Flax Conv1 kernel (1, 3, 1, 256) -> (3, 256)."""
    return np.asarray(w1).reshape(3, -1)


def pack_conv2_weights(w2: np.ndarray) -> np.ndarray:
    """Flax Conv2 kernel (2, 3, Cin, Co) -> (2*Cin, 3*Co) tap-packed:
    W2p[h*Cin + cin, k*Co + co] = w2[h, k, cin, co]."""
    w2 = np.asarray(w2)
    kh, kw, cin, co = w2.shape
    return w2.transpose(0, 2, 1, 3).reshape(kh * cin, kw * co)


# ---------------------------------------------------------------- conv1 core


def conv1_accumulate(x, w, t_out: int, acc_dtype):
    """Shared conv1 math: x (TB, 2, T), w (3, C) -> stacked (TB, t_out, 2C).

    Uses explicit lax.broadcast_in_dim (newaxis-broadcast lowers to an
    unsupported >2D gather in Mosaic; verified on-TPU this session).
    """
    tb = x.shape[0]
    cout = w.shape[1]
    halves = []
    for h in range(2):
        acc = jnp.zeros((tb, t_out, cout), acc_dtype)
        for k in range(3):
            xk = jax.lax.broadcast_in_dim(
                x[:, h, k : k + t_out], (tb, t_out, cout), (0, 1)
            )
            wk = jax.lax.broadcast_in_dim(w[k], (tb, t_out, cout), (2,))
            acc = acc + xk * wk
        halves.append(acc)
    return jnp.concatenate(halves, axis=-1)


# ---------------------------------------------------------------- conv1 bf16


def _conv1_kernel(x_ref, w_ref, b_ref, o_ref, *, t_out, cout):
    """x (TB, 2, T) -> a1s (TB, t_out, 2*cout) stacked: [.., h*cout + c].

    b_ref is the host-duplicated (2*cout,) bias — 1D in-kernel concatenate
    doesn't lower in Mosaic."""
    x = x_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)  # (3, cout)
    out = conv1_accumulate(x, w, t_out, jnp.float32) + b_ref[:]
    o_ref[:] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "out_dtype", "interpret"))
def conv1_stacked(
    x: jnp.ndarray,
    w1p: jnp.ndarray,
    b1: jnp.ndarray,
    *,
    block_b: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """ReLU conv1, stacked output. x: (B, 2, T) f32; w1p: (3, C); b1: (C,).

    Returns (B, T-2, 2C) with [..., t, h*C + c] = relu(conv1)[b, h, t, c].
    """
    b, two, t_len = x.shape
    assert two == 2
    cout = w1p.shape[1]
    t_out = t_len - 2
    bp = -(-b // block_b) * block_b
    if bp != b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])
    b1d = jnp.concatenate([b1, b1])
    out = pl.pallas_call(
        functools.partial(_conv1_kernel, t_out=t_out, cout=cout),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 2, t_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, cout), lambda i: (0, 0)),
            pl.BlockSpec((2 * cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, t_out, 2 * cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_out, 2 * cout), out_dtype),
        interpret=interpret,
    )(x.astype(jnp.float32), w1p, b1d)
    return out[:b]


# ---------------------------------------------------------------- conv2 bf16


def _conv2_kernel(a_ref, w_ref, b_ref, o_ref, *, t_in, co):
    """a1s (TB, t_in, 2Cin) -> relu(conv2) (TB, t_in-2, co) via z shift-add."""
    tb = a_ref.shape[0]
    a = a_ref[:].reshape(tb * t_in, a_ref.shape[2])
    z = jax.lax.dot_general(
        a, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(tb, t_in, 3 * co)
    t_out = t_in - 2
    out = (
        z[:, 0:t_out, 0:co]
        + z[:, 1 : t_out + 1, co : 2 * co]
        + z[:, 2 : t_out + 2, 2 * co : 3 * co]
        + b_ref[:][None, None, :]
    )
    o_ref[:] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "out_dtype", "interpret"))
def conv2_stacked(
    a1s: jnp.ndarray,
    w2p: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    block_b: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """ReLU conv2 on stacked activations. a1s: (B, T, 2Cin); w2p: (2Cin, 3Co).

    Returns (B, T-2, Co).
    """
    b, t_in, _ = a1s.shape
    co = w2p.shape[1] // 3
    bp = -(-b // block_b) * block_b
    if bp != b:
        a1s = jnp.pad(a1s, [(0, bp - b), (0, 0), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_conv2_kernel, t_in=t_in, co=co),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, t_in, a1s.shape[2]), lambda i: (i, 0, 0)),
            pl.BlockSpec(w2p.shape, lambda i: (0, 0)),
            pl.BlockSpec((co,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, t_in - 2, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_in - 2, co), out_dtype),
        interpret=interpret,
    )(a1s, w2p, b2)
    return out[:b]


# ---------------------------------------------------------------- int8 requant


def requantize(acc, shift, offset, *, relu: bool = True):
    """Per-channel fixed-point int32 -> int8 (the requantize SPEC).

    relu=True (the whole hot chain): classic fixed-point round-half-up —
        clip((acc + offset) >> shift, 0, 127)
    with per-channel int32 ``shift`` (the quantizer constrains every
    requantize scale to 2^-shift) and int32 ``offset`` that already folds
    the bias AND the +0.5 rounding term: offset = round((bias/s_out + 0.5)
    * 2^shift). ReLU folds into the 0 clip; arithmetic shift floors
    negatives, which the clip sends to 0 exactly like the ReLU would.

    Measured rationale (scripts/probe.py r4f/r4g, 2026-08-21): the f32
    affine (convert/mul/add/clip/convert) on conv2's int32 output is pure
    VPU work the MXU waits on — the integer path runs the v9 conv stage at
    907 us vs 1026 us at B=4096 (r4f's 577 us sample was a timing glitch,
    see the r4 addenda). It is also EXACT integer arithmetic (the f32 form
    rounded accumulators above 2^24), so golden parity is strengthened.
    relu=False: legacy f32 round-half-even + symmetric clip (off the hot
    path, float mult/offset).
    Golden twin: golden/quant.py::_requant — keep in lockstep.
    """
    if relu:
        v = jnp.right_shift(acc + offset, shift)
        return jnp.clip(v, 0, 127).astype(jnp.int8)
    if not jnp.issubdtype(jnp.result_type(shift), jnp.floating):
        # The legacy branch multiplies by ``shift`` as an f32 scale; feeding
        # it the fixed-point int32 shift counts would scale the accumulator
        # by the shift COUNT (ADVICE r4 #2 — a loaded trap, no live caller).
        raise TypeError(
            "requantize(relu=False) expects legacy f32 (mult, offset); got "
            f"integer dtype {jnp.result_type(shift)} — use the relu=True "
            "fixed-point path or dequantize explicitly"
        )
    v = jnp.round(acc.astype(jnp.float32) * shift + offset)
    return jnp.clip(v, -127.0, 127.0).astype(jnp.int8)


# ---------------------------------------------------------------- conv1 int8


def _conv1_int8_kernel(x_ref, w_ref, m_ref, o_ref, out_ref, *, t_out, cout):
    x = x_ref[:].astype(jnp.int32)  # (TB, 2, T) from int8
    w = w_ref[:].astype(jnp.int32)  # (3, cout)
    acc2 = conv1_accumulate(x, w, t_out, jnp.int32)
    out_ref[:] = requantize(acc2, m_ref[:], o_ref[:], relu=True)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def conv1_stacked_int8(
    x_i8: jnp.ndarray,
    w1p_i8: jnp.ndarray,
    mult: jnp.ndarray,
    offset: jnp.ndarray,
    *,
    block_b: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 conv1, stacked int8 output. mult/offset: (2C,) fp32 requant
    (duplicated per half so per-channel scales stay general)."""
    b, two, t_len = x_i8.shape
    assert two == 2
    cout = w1p_i8.shape[1]
    t_out = t_len - 2
    bp = -(-b // block_b) * block_b
    if bp != b:
        x_i8 = jnp.pad(x_i8, [(0, bp - b), (0, 0), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_conv1_int8_kernel, t_out=t_out, cout=cout),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 2, t_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, cout), lambda i: (0, 0)),
            pl.BlockSpec((2 * cout,), lambda i: (0,)),
            pl.BlockSpec((2 * cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, t_out, 2 * cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_out, 2 * cout), jnp.int8),
        interpret=interpret,
    )(x_i8, w1p_i8, mult, offset)
    return out[:b]


# ---------------------------------------------------------------- conv2 int8


def _conv2_int8_kernel(a_ref, w_ref, m_ref, o_ref, out_ref, *, t_in, co):
    tb = a_ref.shape[0]
    a = a_ref[:].reshape(tb * t_in, a_ref.shape[2])
    z = jax.lax.dot_general(
        a, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(tb, t_in, 3 * co)
    t_out = t_in - 2
    acc = (
        z[:, 0:t_out, 0:co]
        + z[:, 1 : t_out + 1, co : 2 * co]
        + z[:, 2 : t_out + 2, 2 * co : 3 * co]
    )
    out_ref[:] = requantize(acc, m_ref[:], o_ref[:], relu=True)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def conv2_stacked_int8(
    a1s_i8: jnp.ndarray,
    w2p_i8: jnp.ndarray,
    mult: jnp.ndarray,
    offset: jnp.ndarray,
    *,
    block_b: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 conv2. a1s_i8: (B, T, 2Cin) int8; w2p_i8: (2Cin, 3Co) int8;
    mult/offset: (Co,) fp32. Returns (B, T-2, Co) int8."""
    b, t_in, _ = a1s_i8.shape
    co = w2p_i8.shape[1] // 3
    bp = -(-b // block_b) * block_b
    if bp != b:
        a1s_i8 = jnp.pad(a1s_i8, [(0, bp - b), (0, 0), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_conv2_int8_kernel, t_in=t_in, co=co),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, t_in, a1s_i8.shape[2]), lambda i: (i, 0, 0)),
            pl.BlockSpec(w2p_i8.shape, lambda i: (0, 0)),
            pl.BlockSpec((co,), lambda i: (0,)),
            pl.BlockSpec((co,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, t_in - 2, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_in - 2, co), jnp.int8),
        interpret=interpret,
    )(a1s_i8, w2p_i8, mult, offset)
    return out[:b]
