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
            snr_db=50.0, max_cfo=0.0, cfo_walk_std=0.0, max_sro=0.0,
            random_phase=False, random_timing=False, multipath=False,
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
        channel=ChannelConfig(snr_db=30.0, max_cfo=0.0, cfo_walk_std=0.0,
                              random_phase=False, multipath=False)
    )
    bpsk = synthetic.generate_frames(rng, "BPSK", 64, 30.0, cfg)
    qpsk = synthetic.generate_frames(rng, "QPSK", 64, 30.0, cfg)
    # E[x^2] is ~1 for BPSK, ~0 for QPSK (classic moment discriminator).
    m_b = np.abs((bpsk**2).mean())
    m_q = np.abs((qpsk**2).mean())
    assert m_b > 0.5
    assert m_q < 0.2


def test_analog_silence_collapse():
    """During speech pauses WBFM and AM-DSB are both a bare carrier — the
    property behind the literature's WBFM<->AM-DSB confusion ceiling
    (VERDICT r2 missing #2). A pause-frame of either class must be nearly
    constant-envelope AND nearly constant-frequency, i.e. the classes are
    not separable on those frames."""
    rng = np.random.default_rng(11)
    cfg = DataConfig(
        channel=ChannelConfig(snr_db=50.0, max_cfo=0.0, cfo_walk_std=0.0,
                              max_sro=0.0, random_phase=False,
                              random_timing=False, multipath=False)
    )
    n = 400

    def carrier_like(x):
        """Per-frame: envelope ripple AND instantaneous-freq spread, both
        ~0 only for a bare carrier."""
        env = np.abs(x)
        ripple = env.std(axis=-1) / (env.mean(axis=-1) + 1e-12)
        dphi = np.angle(x[:, 1:] * np.conj(x[:, :-1]))
        return (ripple < 0.02) & (dphi.std(axis=-1) < 0.02)

    for mod in ("WBFM", "AM-DSB"):
        x = synthetic.generate_frames(rng, mod, n, 50.0, cfg)
        # A substantial fraction of frames must be pause frames that are
        # indistinguishable from a bare carrier — for BOTH classes, which
        # is exactly why no classifier can separate them on those frames.
        frac_pause = carrier_like(x).mean()
        assert 0.1 < frac_pause < 0.5, (mod, frac_pause)


def test_audio_source_has_amplitude_bursts():
    """Active-speech frames vary in level (syllabic envelope)."""
    rng = np.random.default_rng(5)
    src = synthetic._audio_source(rng, 512, 160)
    rms = np.sqrt((src**2).mean(axis=-1))
    active = rms[rms > 0.1]
    assert active.std() / active.mean() > 0.3
