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


def fir_resample_iq(
    xiq: jnp.ndarray, h: np.ndarray, up: int, down: int
) -> jnp.ndarray:
    """Rational up/down resampling on I/Q planes (..., 2, T). Output length
    ceil(T*up/down), matching the golden (full conv truncated to T*up, then
    ::down)."""
    hj = jnp.asarray(h, jnp.float32)
    y = _conv_iq(xiq, hj, up=up, down=down)
    out_len = -(-xiq.shape[-1] * up // down)  # ceil
    return y[..., :out_len]


def fir_filter(x: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """Complex-array convenience wrapper (HOST/CPU only — .real/.imag are
    complex HLOs this TPU backend rejects). x: (..., T) complex."""
    return _from_iq(fir_filter_iq(_to_iq(x), h))


def fir_resample(x: jnp.ndarray, h: np.ndarray, up: int, down: int) -> jnp.ndarray:
    """Complex-array convenience wrapper (HOST/CPU only)."""
    return _from_iq(fir_resample_iq(_to_iq(x), h, up, down))
