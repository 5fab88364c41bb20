"""Post-training int8 quantization (SURVEY.md N13, config 5).

The TPU analog of the reference's float->fixed-point weight export
(SURVEY.md §2a "Weight quantizer/exporter"): per-channel symmetric int8
weights, per-tensor activation scales from percentile calibration, and the
requantize constants precomputed as FIXED-POINT (per-channel pow2 shift +
int32 offset folding bias and the rounding term) so inference kernels only
do  clip((acc + offset) >> shift, 0, 127).

The packed artifact (``QuantizedModel``) is a plain pytree — saved via
utils/checkpoint.py::save_tree, the analog of the reference's ROM images.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.ops.cnn_kernels import (
    pack_conv1_weights,
    pack_conv2_weights,
)


@dataclass
class QuantizedModel:
    """All arrays are NumPy; layouts match ops/cnn_kernels.py."""

    s_x: np.ndarray          # () input scale
    w1p: np.ndarray          # (3, C1) int8
    m1: np.ndarray           # (2*C1,) int32 requant SHIFT (scale = 2^-m1)
    o1: np.ndarray           # (2*C1,) int32 offset incl. the +0.5 round term
    w2p: np.ndarray          # (2*C1, 3*C2) int8 tap-packed
    m2: np.ndarray           # (C2,) int32 shift
    o2: np.ndarray           # (C2,) int32 offset
    w3: np.ndarray           # (T2*C2, D) int8
    m3: np.ndarray           # (D,) int32 shift
    o3: np.ndarray           # (D,) int32 offset
    w4: np.ndarray           # (D, n_classes) int8
    s4: np.ndarray           # (n_classes,) f32 dequant scale (s_a3 * s_w4)
    b4: np.ndarray           # (n_classes,) f32

    def tree(self) -> dict[str, Any]:
        return {k: np.asarray(v) for k, v in self.__dict__.items()}

    @classmethod
    def from_tree(cls, t: dict[str, Any]) -> "QuantizedModel":
        return cls(**{k: np.asarray(v) for k, v in t.items()})


def _per_channel_scale(w: np.ndarray, reduce_axes: tuple[int, ...]) -> np.ndarray:
    s = np.abs(w).max(axis=reduce_axes) / 127.0
    return np.maximum(s, 1e-12)


def _quant_w(w: np.ndarray, scale: np.ndarray, bcast) -> np.ndarray:
    q = np.round(w / scale[bcast])
    return np.clip(q, -127, 127).astype(np.int8)


def calibrate_activations(
    model, params, calib_x: np.ndarray, percentile: float = 99.99
) -> dict[str, float]:
    """Run the float model on calibration frames and extract activation
    scales: input absmax and post-ReLU percentiles of conv1/conv2/dense1.

    Percentiles are reduced ON DEVICE and only 3 scalars are fetched — the
    full intermediates would be ~66 MB, a multi-minute transfer through this
    environment's tunneled TPU (utils/device.py)."""

    @jax.jit
    def scales(xb):
        _, inter = model.apply(params, xb, capture_intermediates=True)
        inter = inter["intermediates"]
        out = []
        for layer in ("Conv1", "Conv2", "Dense1"):
            pre = inter[layer]["__call__"][0].astype(jnp.float32)
            out.append(jnp.percentile(jnp.maximum(pre, 0.0), percentile))
        return jnp.stack(out)

    a1, a2, a3 = np.asarray(scales(jnp.asarray(calib_x)))
    return {
        "s_x": float(np.abs(calib_x).max()) / 127.0,
        "a1": float(a1) / 127.0,
        "a2": float(a2) / 127.0,
        "a3": float(a3) / 127.0,
    }


def quantize(model, params, calib_x: np.ndarray, percentile: float = 99.99) -> QuantizedModel:
    """Float Flax params -> packed int8 deployment artifact."""
    scales = calibrate_activations(model, params, calib_x, percentile)
    p = jax.tree.map(np.asarray, params["params"])
    s_x, s_a1, s_a2, s_a3 = (
        scales["s_x"], scales["a1"], scales["a2"], scales["a3"],
    )

    # Every hot-chain requantize scale is CONSTRAINED to a power of two
    # (s_in*s_w[c]/s_out = 2^-shift[c], snapped UP so the re-quantized int
    # weights never clip; worst case the channel uses 1/sqrt(2)... 1/2 of
    # the int8 range) and the offset folds bias + the 0.5 rounding term as
    # an int32 on the same grid. Two measured/exactness reasons:
    #   1. requantize becomes pure integer add+shift+clip — measured 120us
    #      faster per iter on the v9 conv stage at B=4096 (907 vs 1026 us,
    #      scripts/probe.py r4f/r4g + bench_r4.json), and integer math is
    #      exact where the f32 path rounded accumulators above 2^24;
    #   2. conv1's requantize folds into bf16 MXU weights exactly
    #      (ops/infer.py make_int8_classifier_v9): with w1_i8 * 2^e bf16-
    #      exact and the bias on the same 2^e grid (8-bit significand),
    #      every product/partial sum is an integer multiple of 2^e below
    #      2^24, so the f32 MXU accumulation is exact in ANY order.
    # This is also the reference archetype's own arithmetic (SURVEY.md §2a:
    # fixed-point saturating requantize in the HDL datapath).
    def _pow2_requant(s_in, s_w, s_out, bias, significand_bits=None):
        e = np.ceil(np.log2(np.maximum(s_in * s_w / s_out, 1e-30)))
        assert np.all(e <= 0), "requantize scale >= 1 unsupported"
        shift = (-e).astype(np.int32)
        s_w_eff = (2.0 ** e) * s_out / s_in
        off = (bias / s_out + 0.5) * 2.0 ** (-e)
        if significand_bits is not None:
            mag = np.maximum(np.abs(off), 1e-30)
            grid = 2.0 ** np.maximum(
                np.floor(np.log2(mag)) - (significand_bits - 1), 0.0
            )
            off = np.round(off / grid) * grid
        off = np.round(off)
        assert np.all(np.abs(off) < 2 ** 28), "bias too large for int32 fold"
        return shift, off.astype(np.int32), s_w_eff

    # conv1: kernel (1,3,1,C1); offset additionally snapped to an 8-bit
    # significand so the v9 bias K-lane is bf16-exact.
    w1 = p["Conv1"]["kernel"].astype(np.float64)
    b1 = p["Conv1"]["bias"].astype(np.float64)
    s_w1 = _per_channel_scale(w1, (0, 1, 2))
    sh1, o1_half, s_w1_eff = _pow2_requant(s_x, s_w1, s_a1, b1,
                                           significand_bits=8)
    w1p = pack_conv1_weights(
        _quant_w(w1, s_w1_eff, (None, None, None, slice(None)))
    )
    m1 = np.concatenate([sh1, sh1])
    o1 = np.concatenate([o1_half, o1_half])

    # conv2: kernel (2,3,C1,C2); scale per out-channel co (shared across taps
    # so the int32 tap-sum stays in one unit).
    w2 = p["Conv2"]["kernel"].astype(np.float64)
    b2 = p["Conv2"]["bias"].astype(np.float64)
    s_w2 = _per_channel_scale(w2, (0, 1, 2))
    m2, o2, s_w2_eff = _pow2_requant(s_a1, s_w2, s_a2, b2)
    w2p = pack_conv2_weights(
        _quant_w(w2, s_w2_eff, (None, None, None, slice(None)))
    )

    # dense1: (T2*C2, D)
    w3 = p["Dense1"]["kernel"].astype(np.float64)
    b3 = p["Dense1"]["bias"].astype(np.float64)
    s_w3 = _per_channel_scale(w3, (0,))
    m3, o3, s_w3_eff = _pow2_requant(s_a2, s_w3, s_a3, b3)
    w3q = _quant_w(w3, s_w3_eff, (None, slice(None)))

    # dense2: logits dequantized to f32 (argmax needs true affine).
    w4 = p["Dense2"]["kernel"].astype(np.float64)
    b4 = p["Dense2"]["bias"].astype(np.float64)
    s_w4 = _per_channel_scale(w4, (0,))
    w4q = _quant_w(w4, s_w4, (None, slice(None)))
    s4 = (s_a3 * s_w4).astype(np.float32)

    return QuantizedModel(
        s_x=np.float32(s_x),
        w1p=w1p, m1=m1, o1=o1,
        w2p=w2p, m2=m2, o2=o2,
        w3=w3q, m3=m3, o3=o3,
        w4=w4q, s4=s4, b4=b4.astype(np.float32),
    )
