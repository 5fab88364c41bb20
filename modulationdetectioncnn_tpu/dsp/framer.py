"""Overlap-save framer in JAX (SURVEY.md N7, config 4 of BASELINE.json).

The continuous-stream -> blocks transform that makes streaming classification
equal batch classification (the §4b exact-match test), and — sharded over the
'time' mesh axis — the workload's context-parallel analog (SURVEY.md §5
long-context row): each device gets contiguous blocks plus a ``halo`` of
history samples; parallel/halo.py exchanges the halos via ppermute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def overlap_save_blocks(x: jnp.ndarray, block_len: int, halo: int) -> jnp.ndarray:
    """(..., T) -> (..., ceil(T/B), halo + B). Zero left-history for block 0;
    final partial block zero-padded on the right. Matches golden/dsp.py
    exactly. Leading axes (e.g. the (2,) I/Q plane axis) pass through."""
    t_len = x.shape[-1]
    n_blocks = -(-t_len // block_len)
    pad_right = n_blocks * block_len - t_len
    pad = [(0, 0)] * (x.ndim - 1) + [(halo, pad_right)]
    padded = jnp.pad(x, pad)
    starts = jnp.arange(n_blocks) * block_len
    blocks = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(
            padded, s, halo + block_len, axis=-1
        )
    )(starts)
    return jnp.moveaxis(blocks, 0, -2)


def trim_halo(blocks: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Drop the (invalid after filtering) halo prefix of each block."""
    return blocks[..., halo:]


def concat_blocks(blocks: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Inverse of overlap_save_blocks∘trim_halo: reassemble the stream."""
    flat = blocks.reshape(blocks.shape[:-2] + (-1,))
    return flat[..., :out_len]


def frames_from_stream(
    x: jnp.ndarray, frame_len: int, hop: int | None = None
) -> jnp.ndarray:
    """(..., T) -> (..., T//hop_or_frame, frame_len) classification frames.

    Default hop = frame_len (non-overlapping, the reference's single-frame
    streaming mode, SURVEY.md CS-2). Trailing remainder is dropped.
    """
    hop = hop or frame_len
    t_len = x.shape[-1]
    n_frames = (t_len - frame_len) // hop + 1 if t_len >= frame_len else 0
    if n_frames <= 0:
        shape = x.shape[:-1] + (0, frame_len)
        return jnp.zeros(shape, x.dtype)
    # Fast paths (measured: the gather formulation costs ~116us/iter at
    # stream-bench shapes, scripts/probe.py r3stream): when hop divides
    # frame_len, framing is pure reshapes — frame i = q*r + s (r = flen/hop)
    # comes from the length-flen reshape of x shifted by s*hop, interleaved
    # back on a new axis. hop == frame_len degenerates to ONE reshape.
    if frame_len % hop == 0:
        r = frame_len // hop
        if r == 1:
            n_full = t_len // frame_len
            out = x[..., : n_full * frame_len].reshape(
                x.shape[:-1] + (n_full, frame_len)
            )
            return out[..., :n_frames, :]
        qs = []
        for s in range(r):
            xs = x[..., s * hop :]
            q = (xs.shape[-1]) // frame_len
            qs.append(q)
        q_min = min(qs)
        parts = [
            x[..., s * hop : s * hop + q_min * frame_len].reshape(
                x.shape[:-1] + (q_min, frame_len)
            )
            for s in range(r)
        ]
        out = jnp.stack(parts, axis=-2)  # (..., q_min, r, flen)
        out = out.reshape(x.shape[:-1] + (q_min * r, frame_len))
        if out.shape[-2] < n_frames:
            # ragged tail frames the interleave missed: gather just those
            starts = jnp.arange(out.shape[-2], n_frames) * hop
            tail = jnp.moveaxis(
                jax.vmap(
                    lambda s: jax.lax.dynamic_slice_in_dim(
                        x, s, frame_len, axis=-1)
                )(starts), 0, -2)
            out = jnp.concatenate([out, tail], axis=-2)
        return out[..., :n_frames, :]
    starts = jnp.arange(n_frames) * hop
    return jnp.moveaxis(
        jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(x, s, frame_len, axis=-1)
        )(starts),
        0,
        -2,
    )


def iq_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """Complex frames (..., N, T) -> float32 (..., N, 2, T) CNN input.

    HOST-SIDE ONLY: complex dtypes never reach the TPU (see channelizer.py);
    use to_planes at the host->device boundary, then stay in planes.
    """
    return jnp.stack([frames.real, frames.imag], axis=-2).astype(jnp.float32)


def to_planes(x) -> jnp.ndarray:
    """Complex (..., T) -> I/Q planes (..., 2, T) float32 (host boundary)."""
    import numpy as np

    x = np.asarray(x)
    return jnp.asarray(
        np.stack([x.real, x.imag], axis=-2).astype(np.float32)
    )


def from_planes(xiq) -> "np.ndarray":
    """I/Q planes (..., 2, T) -> complex64 (..., T) (host-side, for tests)."""
    import numpy as np

    xiq = np.asarray(xiq)
    return (xiq[..., 0, :] + 1j * xiq[..., 1, :]).astype(np.complex64)
