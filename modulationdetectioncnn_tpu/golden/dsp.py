"""NumPy golden DSP chain (SURVEY.md N3): the float oracle for every JAX/XLA
front-end stage (channelizer N4, resampler N5, normalization N6, framer N7).

Pure NumPy float64 — no JAX anywhere (BASELINE.json:7 "NumPy CPU reference
chain"). The JAX implementations in modulationdetectioncnn_tpu/dsp/ are
tolerance-tested against these, exactly as the reference's SystemVerilog
engines were tested against a Python float model (SURVEY.md §4a).
"""
from __future__ import annotations

import numpy as np


def design_prototype(num_subbands: int, taps_per_branch: int, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed-sinc lowpass prototype for the PFB channelizer.

    Length M*taps, cutoff 1/(2M) (critically sampled), unit DC gain per branch.
    """
    m, t = num_subbands, taps_per_branch
    n = np.arange(m * t, dtype=np.float64)
    center = (m * t - 1) / 2.0
    arg = (n - center) / m  # sinc argument in units of the subband rate
    h = np.sinc(arg) * np.kaiser(m * t, beta)
    return h / h.sum()


def pfb_channelize(x: np.ndarray, h: np.ndarray, num_subbands: int) -> np.ndarray:
    """Critically-sampled polyphase filter-bank channelizer.

    x: (T,) complex, T divisible by M. h: prototype of length M*taps.
    Returns (T//M, M) complex: subband k is centered at f = k/M cycles/sample
    (FFT bin convention), decimated by M.

    Math: x_p[n] = x[nM + p]; v_p[n] = (h_p * x_p)[n] with h_p[t] = h[tM+p];
    y[n, k] = FFT_p->k(v_p[n])  (FFT so bin k <-> +k/M; unit tone gain with
    the unit-DC prototype from design_prototype).
    """
    m = num_subbands
    t = len(h) // m
    assert len(x) % m == 0, "stream length must be a multiple of num_subbands"
    n_blocks = len(x) // m
    xp = x.reshape(n_blocks, m)  # xp[n, p] = x[n*M + p]
    v = np.zeros((n_blocks, m), dtype=np.complex128)
    for p in range(m):
        hp = h[p::m]  # h_p[t] = h[t*M + p]
        # causal FIR along the block axis
        v[:, p] = np.convolve(xp[:, p].astype(np.complex128), hp)[:n_blocks]
    del t
    return np.fft.fft(v, axis=-1)


def fir_resample(x: np.ndarray, h: np.ndarray, up: int, down: int) -> np.ndarray:
    """Rational P/Q polyphase resampling: zero-stuff by ``up``, FIR ``h``,
    keep every ``down``-th output. Matches a causal direct-form implementation.
    """
    xc = x.astype(np.complex128)
    upsampled = np.zeros(len(xc) * up, dtype=np.complex128)
    upsampled[::up] = xc
    y = np.convolve(upsampled, h.astype(np.float64))[: len(upsampled)]
    return y[::down]


def estimate_cfo(x: np.ndarray, order: int = 4, pad_factor: int = 4) -> float:
    """CFO estimate in cycles/sample via the FFT-of-x^order method (for
    PSK-family signals; order=4 collapses QPSK modulation). Parabolic
    interpolation refines the peak.
    """
    xo = x.astype(np.complex128) ** order
    n = len(xo) * pad_factor
    spec = np.abs(np.fft.fft(xo, n=n))
    k = int(np.argmax(spec))
    # Parabolic interpolation around the peak (wraps via modular indexing).
    alpha, beta_, gamma = spec[(k - 1) % n], spec[k], spec[(k + 1) % n]
    denom = alpha - 2 * beta_ + gamma
    delta = 0.5 * (alpha - gamma) / denom if abs(denom) > 1e-30 else 0.0
    freq = (k + delta) / n
    if freq > 0.5:
        freq -= 1.0
    return float(freq / order)


def correct_cfo(x: np.ndarray, cfo: float) -> np.ndarray:
    n = np.arange(len(x))
    return x.astype(np.complex128) * np.exp(-2j * np.pi * cfo * n)


def estimate_timing(x: np.ndarray, sps: int) -> float:
    """Oerder&Meyr square-law symbol-timing estimate, in samples [0, sps)."""
    e = np.abs(x.astype(np.complex128)) ** 2
    n = np.arange(len(e))
    c = np.sum(e * np.exp(-2j * np.pi * n / sps))
    tau = (-np.angle(c) / (2 * np.pi)) * sps
    return float(tau % sps)


def design_interp(n_phases: int, taps_per_phase: int = 8, beta: float = 8.0) -> np.ndarray:
    """Polyphase fractional-delay interpolator prototype.

    Kaiser-windowed sinc at the ``n_phases``-times-upsampled rate, odd length
    P*taps+1 (integer center -> exact zero-delay phase), DC gain ~1 per phase.
    """
    p, t = n_phases, taps_per_phase
    ln = p * t + 1
    n = np.arange(ln, dtype=np.float64)
    center = (ln - 1) / 2.0
    h = np.sinc((n - center) / p) * np.kaiser(ln, beta)
    return h / h[int(center)]  # unit gain for the zero-delay phase


def correct_timing(
    x: np.ndarray, tau: float, sps: int, n_phases: int = 32,
    taps_per_phase: int = 8,
) -> np.ndarray:
    """Remove a symbol-timing offset: y[n] ~= x(n + tau_c), where tau_c is
    ``tau`` wrapped to [-sps/2, sps/2) (nearest symbol-grid alignment, which
    minimizes edge loss on short frames). Polyphase interpolation: zero-stuff
    by P, lowpass, pick the phase closest to tau_c*P. Same length as input.
    """
    p = n_phases
    h = design_interp(p, taps_per_phase)
    ln = len(h)
    c = (ln - 1) // 2
    tau_c = ((tau + sps / 2.0) % sps) - sps / 2.0
    s = int(round(tau_c * p)) + c
    xc = x.astype(np.complex128)
    xu = np.zeros(len(xc) * p, dtype=np.complex128)
    xu[::p] = xc
    y = np.convolve(xu, h)  # y[j] ~= x((j - c)/P)
    idx = np.arange(len(xc)) * p + s
    idx = np.clip(idx, 0, len(y) - 1)
    return y[idx]


def power_normalize(x: np.ndarray) -> np.ndarray:
    p = np.mean(np.abs(x) ** 2) + 1e-30
    return x / np.sqrt(p)


def overlap_save_blocks(x: np.ndarray, block_len: int, halo: int) -> np.ndarray:
    """Split a stream into overlap-save blocks.

    Block i is x[i*B - halo : i*B + B] with zero-padding on the left of block
    0 (and on the right of the final partial block). After a causal FIR of
    length <= halo+1 is applied per block, outputs [halo:] are exact —
    concatenating them reproduces the full-stream filtering (SURVEY.md N7).

    Returns (num_blocks, halo + block_len).
    """
    n_blocks = int(np.ceil(len(x) / block_len))
    padded = np.concatenate(
        [
            np.zeros(halo, dtype=x.dtype),
            x,
            np.zeros(n_blocks * block_len - len(x), dtype=x.dtype),
        ]
    )
    out = np.empty((n_blocks, halo + block_len), dtype=x.dtype)
    for i in range(n_blocks):
        out[i] = padded[i * block_len : i * block_len + halo + block_len]
    return out


def fir_filter(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Causal FIR, same length as input (the 'batch' reference the
    overlap-save streamed path must match bit-for-bit in fp64)."""
    return np.convolve(x.astype(np.complex128), h)[: len(x)]


def overlap_save_filter(x: np.ndarray, h: np.ndarray, block_len: int) -> np.ndarray:
    """Streamed FIR via overlap-save; equals fir_filter(x, h) exactly."""
    halo = len(h) - 1
    blocks = overlap_save_blocks(x.astype(np.complex128), block_len, halo)
    outs = []
    for b in blocks:
        y = np.convolve(b, h.astype(np.float64))[: len(b)]
        outs.append(y[halo:])
    return np.concatenate(outs)[: len(x)]
