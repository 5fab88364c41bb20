"""Sanity tests for the synthetic RadioML-style generator (SURVEY.md N1)."""
import numpy as np
import pytest

from modulationdetectioncnn_tpu.config import ChannelConfig, DataConfig
from modulationdetectioncnn_tpu.data import synthetic


@pytest.mark.parametrize("mod", synthetic.MODULATIONS)
def test_frames_shape_and_power(mod, rng):
    cfg = DataConfig()
    x = synthetic.generate_frames(rng, mod, 16, snr_db=18.0, cfg=cfg)
    assert x.shape == (16, 128)
    assert x.dtype == np.complex64
    assert np.all(np.isfinite(x.view(np.float32)))
    # Signal normalized to ~unit power; at 18 dB SNR total power ~1.016.
    p = (np.abs(x) ** 2).mean()
    assert 0.7 < p < 1.4


def test_snr_controls_noise(rng):
    cfg = DataConfig()
    hi = synthetic.generate_frames(rng, "BPSK", 64, snr_db=18.0, cfg=cfg)
    lo = synthetic.generate_frames(rng, "BPSK", 64, snr_db=-20.0, cfg=cfg)
    # At -20 dB the frame is noise-dominated: power ~101x the signal.
    assert (np.abs(lo) ** 2).mean() > 30 * (np.abs(hi) ** 2).mean()


def test_bpsk_constellation_clean():
    """With impairments off, BPSK at symbol instants is close to +/-1."""
    cfg = DataConfig(
        channel=ChannelConfig(
            snr_db=50.0, max_cfo=0.0, max_sro=0.0,
            random_phase=False, random_timing=False,
        )
    )
    rng = np.random.default_rng(7)
    x = synthetic.generate_frames(rng, "BPSK", 8, snr_db=50.0, cfg=cfg)
    # Imag part should be tiny for BPSK without phase rotation.
    assert np.abs(x.imag).mean() < 0.1 * np.abs(x.real).mean()


def test_make_dataset_shapes():
    cfg = DataConfig(frames_per_class_per_snr=4)
    x, y, s = synthetic.make_dataset(cfg, snrs=[0, 18], classes=("BPSK", "QPSK"))
    assert x.shape == (2 * 2 * 4, 2, 128)
    assert x.dtype == np.float32
    assert set(np.unique(y)) == {0, 1}
    assert set(np.unique(s)) == {0, 18}


def test_classes_distinguishable_at_high_snr():
    """Different constellations should differ in simple moment statistics."""
    rng = np.random.default_rng(3)
    cfg = DataConfig(
        channel=ChannelConfig(snr_db=30.0, max_cfo=0.0, random_phase=False)
    )
    bpsk = synthetic.generate_frames(rng, "BPSK", 64, 30.0, cfg)
    qpsk = synthetic.generate_frames(rng, "QPSK", 64, 30.0, cfg)
    # E[x^2] is ~1 for BPSK, ~0 for QPSK (classic moment discriminator).
    m_b = np.abs((bpsk**2).mean())
    m_q = np.abs((qpsk**2).mean())
    assert m_b > 0.5
    assert m_q < 0.2
