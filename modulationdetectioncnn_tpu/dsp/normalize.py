"""Carrier/timing normalization on raw IQ in JAX (SURVEY.md N6).

Classical DSP, pure jnp, fully batched and shape-static so it fuses under
jit: CFO estimate via FFT-of-x^4 (collapses PSK modulation; BASELINE.json:5
"carrier/timing normalization on raw IQ"), parabolic peak interpolation,
Oerder&Meyr square-law timing. Golden: golden/dsp.py.
"""
from __future__ import annotations

import jax.numpy as jnp


def estimate_cfo(x: jnp.ndarray, order: int = 4, pad_factor: int = 4) -> jnp.ndarray:
    """CFO in cycles/sample for each frame. x: (..., T) complex -> (...)."""
    xo = x.astype(jnp.complex64) ** order
    n = x.shape[-1] * pad_factor
    spec = jnp.abs(jnp.fft.fft(xo, n=n, axis=-1))
    k = jnp.argmax(spec, axis=-1)
    alpha = jnp.take_along_axis(spec, ((k - 1) % n)[..., None], -1)[..., 0]
    beta = jnp.take_along_axis(spec, k[..., None], -1)[..., 0]
    gamma = jnp.take_along_axis(spec, ((k + 1) % n)[..., None], -1)[..., 0]
    denom = alpha - 2 * beta + gamma
    delta = jnp.where(
        jnp.abs(denom) > 1e-30, 0.5 * (alpha - gamma) / denom, 0.0
    )
    freq = (k + delta) / n
    freq = jnp.where(freq > 0.5, freq - 1.0, freq)
    return freq / order


def correct_cfo(x: jnp.ndarray, cfo: jnp.ndarray) -> jnp.ndarray:
    """Remove the estimated CFO. cfo broadcasts over leading axes of x."""
    n = jnp.arange(x.shape[-1])
    rot = jnp.exp(-2j * jnp.pi * cfo[..., None] * n)
    return (x * rot).astype(jnp.complex64)


def estimate_timing(x: jnp.ndarray, sps: int) -> jnp.ndarray:
    """Oerder&Meyr symbol-timing estimate in samples, range [0, sps)."""
    e = jnp.abs(x.astype(jnp.complex64)) ** 2
    n = jnp.arange(x.shape[-1])
    c = jnp.sum(e * jnp.exp(-2j * jnp.pi * n / sps), axis=-1)
    tau = (-jnp.angle(c) / (2 * jnp.pi)) * sps
    return tau % sps


def power_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Unit average power per frame (last axis)."""
    p = jnp.mean(jnp.abs(x) ** 2, axis=-1, keepdims=True) + 1e-30
    return (x / jnp.sqrt(p)).astype(x.dtype)
