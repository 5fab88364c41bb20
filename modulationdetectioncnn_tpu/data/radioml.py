"""RML2016.10a pickle loader (SURVEY.md N2).

The reference's training layer loads the public RadioML-2016.10a pickle — a
dict keyed by ``(modulation: str, snr: int)`` mapping to float32 arrays of
shape (1000, 2, 128) [LINEAGE, SURVEY.md §2a]. This loader reads that exact
format when a file is present and otherwise synthesizes an equivalent dataset
via :mod:`modulationdetectioncnn_tpu.data.synthetic` (no network here).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from modulationdetectioncnn_tpu.config import DataConfig
from modulationdetectioncnn_tpu.data import synthetic


def load_radioml_pickle(path: str):
    """Load an RML2016.10a-format pickle.

    Returns ``(x, y, snr, classes)`` with x float32 (N, 2, 128).
    """
    with open(path, "rb") as f:
        # The public pickle is python2-era; latin1 handles its byte strings.
        data = pickle.load(f, encoding="latin1")
    keys = sorted(data.keys())
    classes = tuple(sorted({k[0] for k in keys}))
    cls_index = {c: i for i, c in enumerate(classes)}
    xs, ys, ss = [], [], []
    for (mod, snr), frames in data.items():
        arr = np.asarray(frames, dtype=np.float32)
        if arr.ndim != 3 or arr.shape[1] != 2:
            raise ValueError(f"unexpected frame shape {arr.shape} for {(mod, snr)}")
        xs.append(arr)
        ys.append(np.full(len(arr), cls_index[mod], dtype=np.int32))
        ss.append(np.full(len(arr), int(snr), dtype=np.int32))
    x = np.concatenate(xs, axis=0)
    y = np.concatenate(ys, axis=0)
    s = np.concatenate(ss, axis=0)
    return x, y, s, classes


def load_dataset(cfg: DataConfig):
    """Load the configured dataset: real pickle when available, else synthetic.

    Returns ``(x, y, snr, classes)``.
    """
    if cfg.radioml_pickle and os.path.exists(cfg.radioml_pickle):
        return load_radioml_pickle(cfg.radioml_pickle)
    x, y, s = synthetic.make_dataset(cfg)
    return x, y, s, cfg.classes
