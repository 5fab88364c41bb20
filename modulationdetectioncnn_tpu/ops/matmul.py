"""Pallas tiled matmul kernels for the MXU (SURVEY.md N8-N10 building block).

These are the TPU-native replacement for the reference's dense/FC MAC
engines (SURVEY.md §2a "Dense/FC engines", BASELINE.json:5 "HDL conv/MAC
arrays -> Pallas conv kernels"): a K-accumulating tiled matmul with the
contraction on the MXU's 128-lane axis, fp32 (bf16 inputs) or int32 (int8
inputs) accumulation, and optional fused bias+ReLU epilogue so activations
never round-trip HBM between layers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = _cdiv(size, mult) * mult - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k, acc_dtype, epilogue):
    """Grid (M/bm, N/bn, K/bk); K innermost so the fp32/int32 accumulator
    lives in VMEM scratch across K steps (standard MXU pipeline shape)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = epilogue(acc_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "relu", "out_dtype", "interpret"),
)
def matmul(
    a: jnp.ndarray,
    b: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    relu: bool = False,
    out_dtype=None,
    block_m: int = 128,
    block_n: int = 128,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``relu(a @ b + bias)`` with MXU-tiled Pallas.

    a: (M, K), b: (K, N). bf16/f32 inputs accumulate in fp32; int8 inputs
    accumulate in int32 (bias must then be int32 and is added pre-epilogue).
    Shapes are padded to tile multiples internally; output is unpadded.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    is_int = a.dtype == jnp.int8
    acc_dtype = jnp.int32 if is_int else jnp.float32
    out_dtype = out_dtype or (jnp.int32 if is_int else a.dtype)

    block_m = min(block_m, _cdiv(m, 8) * 8)
    block_k = min(block_k, _cdiv(k, 128) * 128)
    block_n = min(block_n, _cdiv(n, 128) * 128)

    ap = _pad_to(_pad_to(a, 0, block_m), 1, block_k)
    bp = _pad_to(_pad_to(b, 0, block_k), 1, block_n)
    mp, kp = ap.shape
    _, np_ = bp.shape
    n_k = kp // block_k

    if bias is not None:
        bias_p = _pad_to(bias.reshape(1, -1), 1, block_n)

        def epilogue_fn(acc, bias_tile):
            out = acc + bias_tile
            return jnp.maximum(out, 0) if relu else out

    else:

        def epilogue_fn(acc):
            return jnp.maximum(acc, 0) if relu else acc

    grid = (mp // block_m, np_ // block_n, n_k)
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
    ]
    operands = [ap, bp]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        operands.append(bias_p)

        def kernel(a_ref, b_ref, bias_ref, o_ref, acc_ref):
            _matmul_kernel(
                a_ref,
                b_ref,
                o_ref,
                acc_ref,
                n_k=n_k,
                acc_dtype=acc_dtype,
                epilogue=lambda acc: epilogue_fn(acc, bias_ref[:]),
            )

    else:

        def kernel(a_ref, b_ref, o_ref, acc_ref):
            _matmul_kernel(
                a_ref,
                b_ref,
                o_ref,
                acc_ref,
                n_k=n_k,
                acc_dtype=acc_dtype,
                epilogue=epilogue_fn,
            )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=ap.size * ap.dtype.itemsize
            + bp.size * bp.dtype.itemsize
            + mp * np_ * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n]
