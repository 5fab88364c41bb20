"""Polyphase filter-bank channelizer in JAX (SURVEY.md N4).

Splits a wideband IQ stream into M critically-sampled subbands
(BASELINE.json:5 "channelizing FFT"). TPU-first design notes:

- **Real-valued I/Q-plane representation throughout**: TPUs have no complex
  hardware, and this environment's TPU backend rejects every complex-dtype
  HLO (verified on-chip 2026-08-18: fft, complex mul, complex dot all
  UNIMPLEMENTED). The device-side convention is ``(..., 2, T)`` float32 —
  identical to the CNN's input layout, so the whole streaming chain is
  complex-free end to end. Complex arrays exist only host-side (golden
  oracle, data synthesis).
- The per-phase FIR is unrolled over the (static, small) tap count as
  shifted multiply-accumulates on the VPU.
- The phase->subband transform is an M-point DFT **as a matmul on the MXU**
  (two real (M, M) matrices mixing the I/Q planes). For channelizer-sized M
  (8-64) this is faster than an FFT butterfly network on TPU — one fused
  (NB, M) @ (M, M) contraction instead of log2(M) strided passes — and it
  is the only option on a backend with no complex FFT.
- Everything is shape-static; under jit the FIR + DFT fuse into one HLO
  so subband data stays resident for the CNN that follows (SURVEY.md §7
  hard-part #4).

Golden reference: modulationdetectioncnn_tpu/golden/dsp.py::pfb_channelize
(complex NumPy; tests compare against its I/Q planes).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.golden.dsp import design_prototype  # noqa: F401


@functools.lru_cache(maxsize=16)
def dft_matrices(m: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the M-point DFT matrix F[p, k] = exp(-2pi*i*pk/M)."""
    pk = np.outer(np.arange(m), np.arange(m)).astype(np.float64)
    ang = -2.0 * np.pi * pk / m
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def dft_iq(v: jnp.ndarray, axis_m: int | None = None) -> jnp.ndarray:
    """M-point DFT over the last axis of an I/Q-plane array.

    v: (..., 2, N, M) float32 -> (..., 2, N, M): out[..., 0] + i*out[..., 1]
    = FFT(v[..., 0] + i*v[..., 1]) along the last axis, as two MXU matmuls.
    """
    m = v.shape[-1]
    fr, fi = (jnp.asarray(a) for a in dft_matrices(m))
    vr, vi = v[..., 0, :, :], v[..., 1, :, :]
    zr = vr @ fr - vi @ fi
    zi = vr @ fi + vi @ fr
    return jnp.stack([zr, zi], axis=-3)


def channelize(x: jnp.ndarray, h: np.ndarray, num_subbands: int) -> jnp.ndarray:
    """Critically-sampled PFB analysis on I/Q planes.

    x: (..., 2, T) float32, T % M == 0. h: prototype (M*taps,) float.
    Returns (..., 2, T//M, M) float32; subband k centered at k/M cyc/sample.
    Matches golden pfb_channelize (complex) plane-for-plane.
    """
    m = num_subbands
    taps = len(h) // m
    t_len = x.shape[-1]
    assert x.shape[-2] == 2, "expected I/Q planes (..., 2, T)"
    assert t_len % m == 0, "stream length must be a multiple of num_subbands"
    n_blocks = t_len // m
    xp = x.reshape(x.shape[:-1] + (n_blocks, m))  # (..., 2, NB, M)
    # h_poly[t, p] = h[t*M + p]  (jnp so traced filters work under shard_map)
    h_poly = jnp.asarray(h, jnp.float32).reshape(taps, m)
    # Causal FIR along the block axis, unrolled over taps (static):
    # v[n, p] = sum_t h_poly[t, p] * xp[n - t, p]   (identical on each plane)
    pad = [(0, 0)] * (xp.ndim - 2) + [(taps - 1, 0), (0, 0)]
    xpad = jnp.pad(xp, pad)
    v = jnp.zeros_like(xp)
    for t in range(taps):
        # xp[n - t] == xpad[taps - 1 - t + n]
        start = taps - 1 - t
        v = v + h_poly[t] * xpad[..., start : start + n_blocks, :]
    return dft_iq(v)


def subband_center_freqs(num_subbands: int) -> np.ndarray:
    """Center frequency of each subband in cycles/sample (FFT convention)."""
    k = np.arange(num_subbands)
    f = k / num_subbands
    f[f > 0.5] -= 1.0
    return f
