"""Streaming classification pipeline (SURVEY.md CS-C, config 4).

Continuous wideband IQ -> overlap-save blocks -> polyphase channelizer ->
per-subband per-frame normalization -> 128-sample frames -> CNN classifier.
Replaces the reference's single-board streaming (one 2x128 frame at a time
over a CPU<->FPGA bus, SURVEY.md CS-2) with a whole-block, all-subbands
batched flow on the MXU.

The load-bearing invariant (SURVEY.md §4b): classifying a stream block-by-
block with halo'd overlap-save MUST produce exactly the labels of
classifying the whole stream at once. ``halo_wideband`` gives the required
history: (taps-1) subband steps of channelizer FIR state = (taps-1)*M
wideband samples.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, StreamConfig
from modulationdetectioncnn_tpu.dsp import channelizer, framer, normalize
from modulationdetectioncnn_tpu.golden.dsp import design_prototype


def halo_wideband(sc: StreamConfig) -> int:
    """Wideband samples of history a block needs for seamless channelizing."""
    return (sc.taps_per_branch - 1) * sc.num_subbands


def subband_frames(
    x: jnp.ndarray, h: np.ndarray, sc: StreamConfig
) -> jnp.ndarray:
    """Wideband I/Q planes (..., 2, T) -> (..., M, F, 2, 128) normalized IQ
    frames. Complex-free: plane-DFT channelizer + plane normalization (see
    dsp/channelizer.py — this TPU backend has no complex support)."""
    sub = channelizer.channelize(x, h, sc.num_subbands)  # (..., 2, T/M, M)
    sub = jnp.moveaxis(sub, -1, -3)  # (..., M, 2, T/M)
    fr = framer.frames_from_stream(sub, sc.frame_hop)  # (..., M, 2, F, 128)
    fr = jnp.swapaxes(fr, -2, -3)  # (..., M, F, 2, 128)
    fr = normalize.power_normalize(fr)
    if sc.normalize_cfo:
        cfo = normalize.estimate_cfo(fr)
        fr = normalize.correct_cfo(fr, cfo)
    return fr


def classify_stream(
    x: jnp.ndarray,
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    sc: StreamConfig,
    h: np.ndarray | None = None,
) -> jnp.ndarray:
    """Classify every subband frame of a wideband stream at once (the
    'batch' reference for the streamed path). x: (2, T) I/Q planes.
    Returns (M, F) int labels."""
    h = h if h is not None else design_prototype(sc.num_subbands, sc.taps_per_branch)
    iq = subband_frames(x, h, sc)  # (M, F, 2, 128)
    m, f = iq.shape[0], iq.shape[1]
    labels = predict_fn(iq.reshape(m * f, 2, iq.shape[-1]))
    return labels.reshape(m, f)


def classify_stream_blocked(
    x: jnp.ndarray,
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    sc: StreamConfig,
    h: np.ndarray | None = None,
) -> jnp.ndarray:
    """Streamed classification via overlap-save blocks; label-exact vs
    classify_stream. x: (2, T) I/Q planes. Block length must be a multiple
    of M*frame_hop so frame boundaries align across blocks."""
    h = h if h is not None else design_prototype(sc.num_subbands, sc.taps_per_branch)
    m = sc.num_subbands
    block = sc.block_len
    assert block % (m * sc.frame_hop) == 0, "block must align to subband frames"
    halo = halo_wideband(sc)
    t_len = x.shape[-1]
    n_blocks = -(-t_len // block)
    # (2, nb, halo+block) -> (nb, 2, halo+block)
    blocks = jnp.swapaxes(framer.overlap_save_blocks(x, block, halo), 0, 1)
    sub = channelizer.channelize(blocks, h, m)  # (nb, 2, (halo+block)/M, M)
    sub = jnp.moveaxis(sub, -1, -3)  # (nb, M, 2, (halo+block)/M)
    sub = framer.trim_halo(sub, halo // m)  # (nb, M, 2, block/M)
    fr = framer.frames_from_stream(sub, sc.frame_hop)  # (nb, M, 2, F_b, 128)
    fr = jnp.swapaxes(fr, -2, -3)  # (nb, M, F_b, 2, 128)
    fr = normalize.power_normalize(fr)
    if sc.normalize_cfo:
        fr = normalize.correct_cfo(fr, normalize.estimate_cfo(fr))
    nb, _, fb = fr.shape[:3]
    labels = predict_fn(fr.reshape(nb * m * fb, 2, fr.shape[-1]))
    labels = labels.reshape(nb, m, fb)
    # (nb, M, F_b) -> (M, nb*F_b), dropping frames past the true stream end.
    labels = jnp.swapaxes(labels, 0, 1).reshape(m, nb * fb)
    total_frames = (t_len // m) // sc.frame_hop
    return labels[:, :total_frames]


def run_stream_demo(cfg: AmcConfig):
    """``amc stream``: synthesize a wideband signal carrying modulated
    subcarriers in a few subbands, classify every subband frame, report
    occupancy and throughput."""
    from modulationdetectioncnn_tpu.data import synthetic

    sc = cfg.stream
    m = sc.num_subbands
    rng = np.random.default_rng(0)
    t_len = sc.block_len * 4
    n_sub_samples = t_len // m

    # Build wideband: 3 occupied subbands with BPSK/QPSK/QAM16 at their
    # centers, plus noise floor.
    occupied = {1: "BPSK", 5: "QPSK", 11: "QAM16"} if m >= 12 else {1: "BPSK"}
    wide = 0.02 * (
        rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)
    )
    n = np.arange(t_len)
    for k, mod in occupied.items():
        frames = synthetic.generate_frames(
            rng, mod, 1, snr_db=30.0,
            cfg=cfg.data.__class__(frame_len=n_sub_samples),
        )[0]
        up = np.zeros(t_len, dtype=np.complex128)
        up[::m] = frames  # sparse upsample: subband-rate signal
        # Interpolate to the wideband rate via the same prototype lowpass.
        h = design_prototype(m, sc.taps_per_branch)
        up = np.convolve(up, h * m)[:t_len]
        wide = wide + up * np.exp(2j * np.pi * (k / m) * n)
    wide = wide.astype(np.complex64)

    # Classifier: trained-from-scratch quick model would be ideal; for the
    # demo use an untrained model (labels meaningless) unless a checkpoint
    # is configured — throughput/occupancy reporting is the point here.
    predict = _make_predictor(cfg)
    wide_iq = framer.to_planes(wide)  # host boundary: complex -> (2, T) f32
    t0 = time.time()
    labels = np.asarray(classify_stream_blocked(wide_iq, predict, sc))
    dt = time.time() - t0
    sub = channelizer.channelize(
        wide_iq, design_prototype(m, sc.taps_per_branch), m
    )  # (2, T/M, M)
    power = np.asarray(jnp.mean(sub[0] ** 2 + sub[1] ** 2, axis=0))
    print("subband  power     top-label")
    for k in range(m):
        from collections import Counter

        top = Counter(labels[k].tolist()).most_common(1)[0][0]
        mark = "*" if k in occupied else " "
        print(f"  {k:3d}{mark}   {power[k]:8.4f}  {top}")
    print(
        f"classified {labels.size} frames ({t_len} wideband samples) "
        f"in {dt:.2f}s wall (incl. compile)"
    )
    return labels


def _make_predictor(cfg: AmcConfig):
    import jax.random as jr

    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.train.loop import make_eval_step
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    model = VTCNN2.from_config(cfg.model)
    if cfg.train.checkpoint_dir:
        mgr = ckpt.make_manager(cfg.train.checkpoint_dir)
        restored = ckpt.restore(mgr)
        if restored is not None:
            params = restored[0]
        else:
            params = model.init(jr.key(0), jnp.zeros((2, 2, cfg.data.frame_len)))
    else:
        params = model.init(jr.key(0), jnp.zeros((2, 2, cfg.data.frame_len)))
    eval_step = make_eval_step(model)
    return lambda xb: eval_step(params, xb)
