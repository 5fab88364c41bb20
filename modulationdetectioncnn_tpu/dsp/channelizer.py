"""Polyphase filter-bank channelizer in JAX (SURVEY.md N4).

Splits a wideband IQ stream into M critically-sampled subbands
(BASELINE.json:5 "channelizing FFT"). TPU-first design notes:

- The per-phase FIR is unrolled over the (static, small) tap count as
  shifted multiply-accumulates on the VPU — complex-safe, fuses into one
  XLA loop, no gather and no dynamic shapes.
- The phase->subband transform is a single batched jnp.fft.ifft along the
  last (lane) axis.
- Everything is shape-static; under jit the whole channelizer is one fused
  HLO with the FFT, so subband data stays resident in VMEM-sized tiles for
  the CNN that follows (SURVEY.md §7 hard-part #4).

Golden reference: modulationdetectioncnn_tpu/golden/dsp.py::pfb_channelize.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.golden.dsp import design_prototype  # noqa: F401


def channelize(x: jnp.ndarray, h: np.ndarray, num_subbands: int) -> jnp.ndarray:
    """Critically-sampled PFB analysis.

    x: (..., T) complex64, T % M == 0. h: prototype (M*taps,) float.
    Returns (..., T//M, M) complex64; subband k centered at k/M cyc/sample.
    """
    m = num_subbands
    taps = len(h) // m
    t_len = x.shape[-1]
    assert t_len % m == 0, "stream length must be a multiple of num_subbands"
    n_blocks = t_len // m
    xp = x.reshape(x.shape[:-1] + (n_blocks, m))
    # h_poly[t, p] = h[t*M + p]  (jnp so traced filters work under shard_map)
    h_poly = jnp.asarray(h, jnp.float32).reshape(taps, m)
    # Causal FIR along the block axis, unrolled over taps (static):
    # v[n, p] = sum_t h_poly[t, p] * xp[n - t, p]
    pad = [(0, 0)] * (xp.ndim - 2) + [(taps - 1, 0), (0, 0)]
    xpad = jnp.pad(xp, pad)
    v = jnp.zeros_like(xp)
    for t in range(taps):
        # xp[n - t] == xpad[taps - 1 - t + n]
        start = taps - 1 - t
        v = v + h_poly[t] * jax_slice(xpad, start, n_blocks)
    return jnp.fft.fft(v, axis=-1).astype(jnp.complex64)


def jax_slice(xpad: jnp.ndarray, start: int, length: int) -> jnp.ndarray:
    """Static slice of the second-to-last axis."""
    return xpad[..., start : start + length, :]


def subband_center_freqs(num_subbands: int) -> np.ndarray:
    """Center frequency of each subband in cycles/sample (FFT convention)."""
    k = np.arange(num_subbands)
    f = k / num_subbands
    f[f > 0.5] -= 1.0
    return f
