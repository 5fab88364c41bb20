"""Carrier/timing normalization on raw IQ in JAX (SURVEY.md N6).

Classical DSP, pure jnp, fully batched and shape-static so it fuses under
jit: CFO estimate via FFT-of-x^4 (collapses PSK modulation; BASELINE.json:5
"carrier/timing normalization on raw IQ"), parabolic peak interpolation,
Oerder&Meyr square-law timing. Golden: golden/dsp.py (complex NumPy).

All device functions use the real I/Q-plane convention ``(..., 2, T)``
float32 (see dsp/channelizer.py: this TPU backend has no complex support,
and plane arithmetic is the TPU-native form anyway). The padded DFT inside
``estimate_cfo`` is two (T, n) real matmuls on the MXU instead of an FFT —
for T=128, n=512 that is ~0.26 MMACs/frame, noise next to the CNN's 18M.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmul(ar, ai, br, bi):
    """Complex multiply on planes: (ar+i*ai)*(br+i*bi)."""
    return ar * br - ai * bi, ar * bi + ai * br


@functools.lru_cache(maxsize=16)
def _padded_dft_matrices(t: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin of the (T, n) padded-DFT matrix: F[t, f] = exp(-2pi*i*t*f/n)."""
    tf = np.outer(np.arange(t), np.arange(n)).astype(np.float64)
    ang = -2.0 * np.pi * tf / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def estimate_cfo(x: jnp.ndarray, order: int = 4, pad_factor: int = 4) -> jnp.ndarray:
    """CFO in cycles/sample for each frame. x: (..., 2, T) f32 -> (...)."""
    xr, xi = x[..., 0, :].astype(jnp.float32), x[..., 1, :].astype(jnp.float32)
    # x**order via repeated squaring on planes (order is a small static int).
    pr, pi = jnp.ones_like(xr), jnp.zeros_like(xi)
    br, bi = xr, xi
    o = order
    while o > 0:
        if o & 1:
            pr, pi = _cmul(pr, pi, br, bi)
        o >>= 1
        if o:
            br, bi = _cmul(br, bi, br, bi)
    t = x.shape[-1]
    n = t * pad_factor
    cos_m, sin_m = (jnp.asarray(a) for a in _padded_dft_matrices(t, n))
    # Z = sum_t p[t] * exp(-2pi*i*t*f/n), with cos_m/sin_m already holding
    # cos/sin of the NEGATIVE angle: Z = (pr + i*pi) * (cos_m + i*sin_m).
    zr = pr @ cos_m - pi @ sin_m
    zi = pi @ cos_m + pr @ sin_m
    spec2 = zr * zr + zi * zi  # |Z|^2: same argmax as |Z|
    k = jnp.argmax(spec2, axis=-1)
    # Parabolic interpolation needs |Z| (not |Z|^2) at k-1, k, k+1 to match
    # the golden's magnitude-domain parabola. Gather-free: minor-dim
    # take_along_axis lowers as a pathologically slow gather on this TPU
    # backend (measured on the timing path, scripts/probe.py r3stream), so
    # select via masked row-reductions instead — 3 cheap passes over spec2.
    lanes = jax.lax.broadcasted_iota(jnp.int32, spec2.shape, spec2.ndim - 1)

    def mag_at(idx):
        sel = (idx % n)[..., None] == lanes
        return jnp.sqrt(jnp.max(jnp.where(sel, spec2, 0.0), axis=-1))

    alpha, beta, gamma = mag_at(k - 1), mag_at(k), mag_at(k + 1)
    denom = alpha - 2 * beta + gamma
    delta = jnp.where(
        jnp.abs(denom) > 1e-30, 0.5 * (alpha - gamma) / denom, 0.0
    )
    freq = (k + delta) / n
    freq = jnp.where(freq > 0.5, freq - 1.0, freq)
    return freq / order


def correct_cfo(x: jnp.ndarray, cfo: jnp.ndarray) -> jnp.ndarray:
    """Remove the estimated CFO: x * exp(-2pi*i*cfo*t) on planes.

    cfo broadcasts over the leading axes of x (..., 2, T).
    """
    t = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ang = -2.0 * jnp.pi * cfo[..., None] * t
    c, s = jnp.cos(ang), jnp.sin(ang)
    xr, xi = x[..., 0, :], x[..., 1, :]
    yr, yi = _cmul(xr, xi, c, s)
    return jnp.stack([yr, yi], axis=-2).astype(jnp.float32)


def estimate_timing(x: jnp.ndarray, sps: int) -> jnp.ndarray:
    """Oerder&Meyr symbol-timing estimate in samples, range [0, sps).

    x: (..., 2, T) f32 -> (...).
    """
    e = x[..., 0, :] ** 2 + x[..., 1, :] ** 2
    t = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ang = -2.0 * jnp.pi * t / sps
    cr = jnp.sum(e * jnp.cos(ang), axis=-1)
    ci = jnp.sum(e * jnp.sin(ang), axis=-1)
    tau = (-jnp.arctan2(ci, cr) / (2 * jnp.pi)) * sps
    return tau % sps


@functools.lru_cache(maxsize=8)
def _interp_bank(n_phases: int, taps_per_phase: int) -> np.ndarray:
    """(P, taps+1) causal phase filters g_p[i] = h[i*P + p] of the golden
    interpolator prototype (golden/dsp.py::design_interp), zero-padded."""
    from modulationdetectioncnn_tpu.golden.dsp import design_interp

    p_n, t_n = n_phases, taps_per_phase
    h = design_interp(p_n, t_n)
    g = np.zeros((p_n, t_n + 1), dtype=np.float64)
    for p in range(p_n):
        gp = h[p::p_n]
        g[p, : len(gp)] = gp
    return g.astype(np.float32)


def correct_timing(
    x: jnp.ndarray, tau: jnp.ndarray, sps: int, n_phases: int = 32,
    taps_per_phase: int = 8,
) -> jnp.ndarray:
    """Batched symbol-timing correction: y[n] ~= x(n + tau_c) per frame, with
    tau_c = tau wrapped to [-sps/2, sps/2). Golden twin:
    golden/dsp.py::correct_timing (polyphase fractional delay).

    x: (..., 2, T) f32 planes; tau: (...) samples. TPU-native formulation
    (r3: the earlier all-phases grouped conv materialized a (B, 2P, T+taps)
    bank — ~142 MB at stream-bench shapes, measured 4.4 ms/iter,
    scripts/probe.py r3stream): per frame only ONE phase filter is ever
    used, so gather that phase's taps+1 weights (a (B, taps+1) table
    lookup), apply the integer delay with one take_along_axis, and run the
    fractional-delay FIR as taps+1 shifted multiply-accumulates with
    per-frame scalar weights — ~10 light passes over the frames instead of
    a 32x-inflated bank.
    """
    p_n, t_n = n_phases, taps_per_phase
    g = _interp_bank(p_n, t_n)  # (P, taps+1)
    t_len = x.shape[-1]
    lead = x.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    ln = p_n * t_n + 1
    c = (ln - 1) // 2
    tau_c = ((tau + sps / 2.0) % sps) - sps / 2.0
    s = jnp.round(tau_c * p_n).astype(jnp.int32) + c
    d, p = s // p_n, s % p_n  # integer delay + phase per frame
    d = d.reshape(b)
    lhs = x.reshape(b, 2, t_len).astype(jnp.float32)
    # grev[p, i] == the reversed phase filter the conv formulation applied:
    # y[n] = sum_i x_pad[n + d + i] * grev[p, i],  x_pad = pad(x, t_n each).
    # Gather-free formulation (minor-dim gathers are pathologically slow on
    # this backend): fold the integer delay d into the filter by scattering
    # the taps+1 phase weights into a 2*t_n+1-tap per-frame filter
    # c[j] = w[j - d], then run 2*t_n+1 shifted scalar-broadcast MACs.
    # The phase-table lookup is a one-hot (b, P) @ (P, taps+1) matmul.
    grev = jnp.asarray(np.ascontiguousarray(g[:, ::-1]))  # (P, taps+1)
    ph = jax.nn.one_hot(p.reshape(b), p_n, dtype=jnp.float32)
    w = ph @ grev  # (b, taps+1)
    n_big = 2 * t_n + 1
    jlane = jnp.arange(n_big, dtype=jnp.int32)[None, :]  # (1, 2t+1)
    cbig = jnp.zeros((b, n_big), jnp.float32)
    for i in range(t_n + 1):
        cbig = cbig + jnp.where(
            jlane == (d[:, None] + i), w[:, i][:, None], 0.0
        )
    xp = jnp.pad(lhs, [(0, 0), (0, 0), (t_n, t_n)])  # (b, 2, T + 2*t_n)
    # The 2*t_n+1 shifted MACs as ONE memory pass. As plain XLA ops they do
    # NOT fuse at stream-bench shapes: 17 separate full-HBM passes over the
    # padded stream measured as the whole 15.6% "timing cost" of r3
    # (VERDICT r3 weak #3 — the ~60us probe figure came from shapes where
    # XLA did fuse them). The Pallas kernel keeps the block in VMEM and
    # applies the shifts as lane rolls (8 ns/frame class, probe r4(a)):
    # wrapped lanes land at index >= t_len and are never read back.
    tp = t_len + 2 * t_n
    x2 = xp.reshape(b * 2, tp)
    c2 = jnp.repeat(cbig, 2, axis=0)  # (b*2, 2*t_n+1); rows (frame, plane)
    bb = 512
    rows = b * 2
    rp = -(-rows // bb) * bb
    if rp != rows:
        x2 = jnp.pad(x2, [(0, rp - rows), (0, 0)])
        c2 = jnp.pad(c2, [(0, rp - rows), (0, 0)])
    interpret = jax.default_backend() == "cpu"

    def kern(x_ref, c_ref, o_ref):
        acc = jnp.zeros((bb, t_len), jnp.float32)
        xv = x_ref[:]
        for j in range(n_big):
            rolled = (jnp.roll(xv, -j, 1) if interpret
                      else pltpu.roll(xv, (tp - j) % tp, 1))
            acc = acc + rolled[:, :t_len] * c_ref[:, j][:, None]
        o_ref[:] = acc

    out = pl.pallas_call(
        kern,
        grid=(rp // bb,),
        in_specs=[pl.BlockSpec((bb, tp), lambda i: (i, 0)),
                  pl.BlockSpec((bb, n_big), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bb, t_len), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, t_len), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, c2)
    return out[:rows].reshape(lead + (2, t_len)).astype(jnp.float32)


def power_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Unit average power per frame. x: (..., 2, T) f32 (power over both
    planes and time, i.e. mean |x|^2 of the complex frame)."""
    p = jnp.mean(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=-2, keepdims=True),
        axis=-1,
        keepdims=True,
    ) + 1e-30
    return (x / jnp.sqrt(p)).astype(jnp.float32)
