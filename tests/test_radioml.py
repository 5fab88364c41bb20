"""RML2016.10a pickle-loader round-trip (SURVEY.md N2, VERDICT r1 #7).

Builds a tiny pickle in the dataset's exact on-disk format — a dict keyed by
``(modulation: str, snr: int)`` of float32 (N, 2, 128) arrays — from the
synthetic generator, then loads it back through the production loader.
"""
import pickle

import numpy as np
import pytest

from modulationdetectioncnn_tpu.config import ChannelConfig, DataConfig
from modulationdetectioncnn_tpu.data import radioml, synthetic


@pytest.fixture(scope="module")
def tiny_pickle(tmp_path_factory):
    rng = np.random.default_rng(7)
    cfg = DataConfig(channel=ChannelConfig(snr_db=10.0))
    mods = ("BPSK", "QPSK", "QAM16")
    snrs = (-2, 10)
    n = 5
    data = {}
    for mod in mods:
        for snr in snrs:
            frames = synthetic.generate_frames(
                rng, mod, n, snr_db=float(snr), cfg=cfg
            )
            iq = np.stack([frames.real, frames.imag], axis=1).astype(
                np.float32
            )
            assert iq.shape == (n, 2, 128)
            data[(mod, snr)] = iq
    path = tmp_path_factory.mktemp("rml") / "rml_tiny.pkl"
    # protocol=2 mirrors the python2-era public file.
    path.write_bytes(pickle.dumps(data, protocol=2))
    return str(path), data, mods, snrs, n


def test_load_radioml_pickle_roundtrip(tiny_pickle):
    path, data, mods, snrs, n = tiny_pickle
    x, y, s, classes = radioml.load_radioml_pickle(path)
    assert classes == tuple(sorted(mods))
    assert x.shape == (len(mods) * len(snrs) * n, 2, 128)
    assert x.dtype == np.float32
    assert set(np.unique(s)) == set(snrs)
    assert set(np.unique(y)) == set(range(len(mods)))
    # Frame payloads survive the round trip exactly, with the right label.
    for (mod, snr), frames in data.items():
        mask = (y == classes.index(mod)) & (s == snr)
        assert mask.sum() == n
        got = x[mask]
        # order within a key is preserved by the loader's concatenation
        np.testing.assert_array_equal(
            np.sort(got.reshape(n, -1), axis=0),
            np.sort(frames.reshape(n, -1), axis=0),
        )


def test_load_dataset_prefers_pickle(tiny_pickle):
    path, _, mods, snrs, n = tiny_pickle
    cfg = DataConfig(radioml_pickle=path)
    x, y, s, classes = radioml.load_dataset(cfg)
    assert len(x) == len(mods) * len(snrs) * n
    assert classes == tuple(sorted(mods))


def test_load_dataset_falls_back_to_synthetic():
    cfg = DataConfig(
        classes=("BPSK", "QPSK"),
        frames_per_class_per_snr=2,
        snr_db_min=0,
        snr_db_max=2,
        radioml_pickle=None,
    )
    x, y, s, classes = radioml.load_dataset(cfg)
    assert classes == ("BPSK", "QPSK")
    assert x.shape[1:] == (2, 128)
    assert len(x) == 2 * 2 * 2  # classes * snrs * frames
