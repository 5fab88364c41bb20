"""SNR-sweep evaluation harness (SURVEY.md N19; BASELINE.json:2,9).

Produces the judged artifacts: per-SNR accuracy curve over -20..+18 dB, the
headline accuracies at 0/10/18 dB, and per-SNR confusion matrices, written as
machine-readable ``results.json``.
"""
from __future__ import annotations

import json
from typing import Callable

import numpy as np


def confusion_matrix(pred: np.ndarray, true: np.ndarray, n_classes: int) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    np.add.at(cm, (true, pred), 1)
    return cm


def predict_all(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    x: np.ndarray,
    batch_size: int = 2048,
) -> np.ndarray:
    """Batched argmax predictions with a padded static-shape tail batch."""
    preds = []
    for i in range(0, len(x), batch_size):
        xb = x[i : i + batch_size]
        k = len(xb)
        if k < batch_size:
            xb = np.concatenate(
                [xb, np.zeros((batch_size - k,) + xb.shape[1:], xb.dtype)]
            )
        preds.append(np.asarray(predict_fn(xb))[:k])
    return np.concatenate(preds)


def snr_sweep(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    x: np.ndarray,
    y: np.ndarray,
    snr: np.ndarray,
    classes: tuple[str, ...],
    batch_size: int = 2048,
) -> dict:
    """Evaluate per-SNR accuracy + confusion matrices.

    predict_fn: (B, 2, T) float32 -> (B,) int predictions (any backend:
    golden NumPy, Flax bf16, or the Pallas int8 path — the harness is
    implementation-agnostic so all three produce comparable curves).
    """
    pred = predict_all(predict_fn, x, batch_size)
    snrs = sorted(int(s) for s in np.unique(snr))
    curve = {}
    conf = {}
    for s in snrs:
        m = snr == s
        curve[s] = float((pred[m] == y[m]).mean())
        conf[s] = confusion_matrix(pred[m], y[m], len(classes)).tolist()
    overall = float((pred == y).mean())
    result = {
        "classes": list(classes),
        "overall_accuracy": overall,
        "snr_accuracy": {str(s): curve[s] for s in snrs},
        "headline": {
            "acc_at_0dB": curve.get(0),
            "acc_at_10dB": curve.get(10),
            "acc_at_18dB": curve.get(18),
        },
        "confusion": {str(s): conf[s] for s in snrs},
    }
    return result


def save_results(result: dict, path: str):
    with open(path, "w") as f:
        json.dump(result, f, indent=1)


def format_curve(result: dict) -> str:
    lines = ["SNR(dB)  accuracy"]
    for s, a in sorted(result["snr_accuracy"].items(), key=lambda kv: int(kv[0])):
        lines.append(f"{int(s):7d}  {a:.4f}")
    lines.append(f"overall  {result['overall_accuracy']:.4f}")
    return "\n".join(lines)
