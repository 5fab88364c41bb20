"""Polyphase FIR filtering / rational resampling in JAX (SURVEY.md N5).

``lax.conv_general_dilated`` with ``lhs_dilation=up`` (zero-stuffing) and
``window_strides=down`` is the TPU-native polyphase trick (SURVEY.md N5):
XLA lowers the dilated/strided conv directly, so no Python-level phase
bookkeeping is needed. Complex IQ is carried as a 2-channel real depthwise
conv (I and Q filtered identically) because TPU convs are real.

Golden reference: golden/dsp.py::fir_resample / fir_filter (causal,
zero initial state).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal


def design_lowpass(num_taps: int, cutoff: float, beta: float = 6.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass; cutoff in cycles/sample (0..0.5)."""
    return sp_signal.firwin(num_taps, cutoff * 2, window=("kaiser", beta)).astype(
        np.float64
    )


def _conv_iq(xiq: jnp.ndarray, h: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Causal depthwise conv on (..., 2, T) real IQ with dilation/stride.

    Produces exactly ceil(T*up/down) outputs (right-padded so the strided
    window count matches the golden's truncate-then-decimate definition).
    """
    taps = h.shape[0]
    t_in = xiq.shape[-1]
    out_len = -(-t_in * up // down)
    dilated = (t_in - 1) * up + 1
    pad_right = max(0, down * (out_len - 1) + 1 - dilated)
    lead = xiq.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    lhs = xiq.reshape(b, 2, t_in).astype(jnp.float32)
    # rhs layout OIW, depthwise: O=2, I=1, W=taps; flip for cross-correlation
    # conv semantics so the result matches direct-form convolution.
    rhs = jnp.broadcast_to(h[::-1].astype(jnp.float32), (2, 1, taps))
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(taps - 1, pad_right)],
        lhs_dilation=(up,),
        feature_group_count=2,
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return out.reshape(lead + (2, out.shape[-1]))


def _to_iq(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([x.real, x.imag], axis=-2)


def _from_iq(xiq: jnp.ndarray) -> jnp.ndarray:
    return (xiq[..., 0, :] + 1j * xiq[..., 1, :]).astype(jnp.complex64)


def fir_filter_iq(xiq: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """Causal FIR on I/Q planes, output length == input length.

    xiq: (..., 2, T) float32 — the device-side representation (complex
    dtypes never reach the TPU; see dsp/channelizer.py).
    """
    hj = jnp.asarray(h, jnp.float32)
    return _conv_iq(xiq, hj, up=1, down=1)


def _resample_window_matrix(
    h: np.ndarray, up: int, down: int, r_tile: int, k_pad: int, halo: int
) -> np.ndarray:
    """Polyphase weights (k_pad, r_tile*up) for the windows-matmul resampler:
    W[k, q] = h[q*down + (halo - k)*up] (zero outside the tap range), so that
    y[m*R*up + q] = sum_k W[k, q] * x[m*R*down - halo + k]."""
    taps = len(h)
    w = np.zeros((k_pad, r_tile * up), np.float32)
    for q in range(r_tile * up):
        for k in range(k_pad):
            l = q * down + (halo - k) * up
            if 0 <= l < taps:
                w[k, q] = h[l]
    return w


def fir_resample_iq(
    xiq: jnp.ndarray, h: np.ndarray, up: int, down: int
) -> jnp.ndarray:
    """Rational up/down resampling on I/Q planes (..., 2, T). Output length
    ceil(T*up/down), matching the golden (full conv truncated to T*up, then
    ::down; golden/dsp.py::fir_resample).

    MXU formulation (VERDICT r3 next #4): the depthwise dilated-conv form
    uses 2 of 128 vector lanes (batch-1, 2-channel) and measured 128 MS/s
    end-to-end. Instead, outputs are produced in tiles of R*up from
    overlapping input windows of K = R*down + halo samples (halo =
    ceil((taps-1)/up) causal history), as ONE f32 matmul
    (n_tiles*2, K) @ (K, R*up) against the precomputed polyphase weight
    matrix. Windows are built gather-free from two shifted reshapes of the
    zero-padded stream. Zero left-pad == the golden's causal zero history;
    right zero-pad only feeds outputs past the truncation point (the conv
    is causal, so valid outputs never read it).
    """
    taps = len(h)
    t_in = xiq.shape[-1]
    out_len = -(-t_in * up // down)  # ceil
    halo = -(-(taps - 1) // up)
    k_pad = 256 if (128 + halo) <= 256 else -(-(128 + halo) // 128) * 128
    r_tile = (k_pad - halo) // down
    if r_tile < 1 or k_pad - r_tile * down > r_tile * down:
        # Degenerate geometry (huge taps vs tile): keep the conv form.
        hj = jnp.asarray(h, jnp.float32)
        y = _conv_iq(xiq, hj, up=up, down=down)
        return y[..., :out_len]
    s = r_tile * down
    n_tiles = -(-out_len // (r_tile * up))
    lead = xiq.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    x = xiq.reshape(b, t_in).astype(jnp.float32)
    total = (n_tiles + 1) * s
    x_pad = jnp.pad(x, [(0, 0), (halo, total - halo - t_in)])
    w1 = x_pad[:, : n_tiles * s].reshape(b, n_tiles, s)
    w2 = x_pad[:, s : (n_tiles + 1) * s].reshape(b, n_tiles, s)[
        :, :, : k_pad - s
    ]
    windows = jnp.concatenate([w1, w2], axis=-1).reshape(
        b * n_tiles, k_pad
    )
    wmat = jnp.asarray(
        _resample_window_matrix(np.asarray(h, np.float64), up, down,
                                r_tile, k_pad, halo)
    )
    y = jax.lax.dot_general(
        windows, wmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, n_tiles * r_tile * up)
    return y[:, :out_len].reshape(lead + (out_len,))


def fir_filter(x: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """Complex-array convenience wrapper (HOST/CPU only — .real/.imag are
    complex HLOs this TPU backend rejects). x: (..., T) complex."""
    return _from_iq(fir_filter_iq(_to_iq(x), h))


def fir_resample(x: jnp.ndarray, h: np.ndarray, up: int, down: int) -> jnp.ndarray:
    """Complex-array convenience wrapper (HOST/CPU only)."""
    return _from_iq(fir_resample_iq(_to_iq(x), h, up, down))
