"""Golden (NumPy) vs JAX DSP front-end parity (SURVEY.md §4b, N4-N7).

The device-side DSP API is real I/Q planes (..., 2, T) float32 — complex
dtypes never reach the TPU (dsp/channelizer.py). Tests drive the plane API
(what ships) and compare against the complex NumPy golden via to_planes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from modulationdetectioncnn_tpu.dsp import channelizer, fir, framer, normalize
from modulationdetectioncnn_tpu.dsp.framer import from_planes, to_planes
from modulationdetectioncnn_tpu.golden import dsp as gold


@pytest.fixture(scope="module")
def stream(rng=None):
    r = np.random.default_rng(5)
    n = 4096
    # A couple of tones + noise, complex64-representable.
    t = np.arange(n)
    x = (
        np.exp(2j * np.pi * 0.07 * t)
        + 0.5 * np.exp(2j * np.pi * -0.21 * t)
        + 0.1 * (r.standard_normal(n) + 1j * r.standard_normal(n))
    )
    return x.astype(np.complex64)


def _planes(x_complex: np.ndarray) -> np.ndarray:
    return np.stack([x_complex.real, x_complex.imag], axis=-2).astype(
        np.float32
    )


def test_channelizer_matches_golden(stream):
    m, taps = 16, 8
    h = gold.design_prototype(m, taps)
    want = gold.pfb_channelize(stream.astype(np.complex128), h, m)
    got = np.asarray(channelizer.channelize(to_planes(stream), h, m))
    assert got.shape == (2, len(stream) // m, m)
    np.testing.assert_allclose(got[0], want.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], want.imag, rtol=2e-4, atol=2e-4)


def test_dft_iq_matches_numpy_fft():
    r = np.random.default_rng(2)
    v = r.standard_normal((2, 64, 16)).astype(np.float32)
    got = np.asarray(channelizer.dft_iq(jnp.asarray(v)))
    want = np.fft.fft(v[0] + 1j * v[1], axis=-1)
    np.testing.assert_allclose(got[0], want.real, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1], want.imag, rtol=2e-5, atol=2e-5)


def test_channelizer_isolates_tone():
    """A pure tone at a subband center lands (almost) entirely in that bin."""
    m, taps = 8, 8
    h = gold.design_prototype(m, taps)
    t = np.arange(2048)
    k_target = 3
    x = np.exp(2j * np.pi * (k_target / m) * t).astype(np.complex64)
    y = np.asarray(channelizer.channelize(to_planes(x), h, m))
    power = (y[0] ** 2 + y[1] ** 2)[taps:].mean(axis=0)  # skip ramp-in
    assert power.argmax() == k_target
    assert power[k_target] > 50 * (power.sum() - power[k_target])


def test_fir_filter_matches_golden(stream):
    h = gold.design_prototype(4, 8)  # any real FIR works here
    want = gold.fir_filter(stream, h)
    got = np.asarray(fir.fir_filter_iq(to_planes(stream), h))
    np.testing.assert_allclose(got, _planes(want), rtol=2e-4, atol=2e-4)
    # complex host-side wrapper agrees
    got_c = np.asarray(fir.fir_filter(jnp.asarray(stream), h))
    np.testing.assert_allclose(got_c, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("up,down", [(1, 2), (2, 1), (3, 2), (2, 3)])
def test_fir_resample_matches_golden(stream, up, down):
    h = fir.design_lowpass(33, 0.5 / max(up, down) * 0.8)
    want = gold.fir_resample(stream, h, up, down)
    got = np.asarray(fir.fir_resample_iq(to_planes(stream), h, up, down))
    assert got.shape == _planes(want).shape
    np.testing.assert_allclose(got, _planes(want), rtol=3e-4, atol=3e-4)


def test_cfo_estimate_pad2_accuracy():
    """The half-size spectral search (stream.cfo_pad_factor=2) keeps CFO
    estimation accuracy at production frame length: parabolic peak
    refinement recovers the coarser pre-interpolation grid (measured errs
    <= 4.3e-5 cycles/sample vs pad4's 2.3e-5 — both far inside the 2e-4
    band that matters for classification). VERDICT r4 next #3."""
    r = np.random.default_rng(11)
    n = 128
    for true_cfo in (3.7e-3, 1e-2, -2e-3, 2e-5):
        syms = r.integers(0, 4, n)
        x = np.exp(1j * (np.pi / 2 * syms + np.pi / 4)) * np.exp(
            2j * np.pi * true_cfo * np.arange(n)
        )
        x = (x + 0.05 * (r.standard_normal(n) + 1j * r.standard_normal(n))
             ).astype(np.complex64)
        for pf in (2, 4):
            got = float(normalize.estimate_cfo(to_planes(x), pad_factor=pf))
            assert abs(got - true_cfo) < 2e-4, (pf, true_cfo, got)


def test_cfo_estimate_and_correct():
    r = np.random.default_rng(11)
    true_cfo = 3.7e-3
    n = 1024
    syms = r.integers(0, 4, n)
    x = np.exp(1j * (np.pi / 2 * syms + np.pi / 4))  # QPSK at 1 sps
    x = x * np.exp(2j * np.pi * true_cfo * np.arange(n))
    x = (x + 0.05 * (r.standard_normal(n) + 1j * r.standard_normal(n))).astype(
        np.complex64
    )
    want = gold.estimate_cfo(x)
    got = float(normalize.estimate_cfo(to_planes(x)))
    assert abs(want - true_cfo) < 2e-4
    assert abs(got - want) < 5e-5
    fixed = from_planes(normalize.correct_cfo(to_planes(x), jnp.float32(got)))
    resid = gold.estimate_cfo(fixed)
    assert abs(resid) < 2e-4


def test_timing_estimate_matches_golden():
    r = np.random.default_rng(13)
    from modulationdetectioncnn_tpu.data.synthetic import rrc_filter

    sps = 8
    syms = (r.integers(0, 2, 256) * 2 - 1).astype(np.float64)
    up = np.zeros(len(syms) * sps)
    up[::sps] = syms
    x = np.convolve(up, rrc_filter(0.35, sps, 6))[: len(up)].astype(np.complex64)
    want = gold.estimate_timing(x, sps)
    got = float(normalize.estimate_timing(to_planes(x), sps))
    assert abs(got - want) < 1e-3 * sps


def test_timing_correct_matches_golden():
    r = np.random.default_rng(21)
    t_len, sps = 128, 8
    xs = (
        r.standard_normal((6, t_len)) + 1j * r.standard_normal((6, t_len))
    ).astype(np.complex64)
    taus = np.array([0.0, 1.3, 7.9, 4.0, 6.25, 2.5])
    want = np.stack(
        [gold.correct_timing(x, t, sps) for x, t in zip(xs, taus)]
    )
    got = np.asarray(
        normalize.correct_timing(
            jnp.asarray(_planes(xs)), jnp.asarray(taus), sps
        )
    )
    np.testing.assert_allclose(got[:, 0], want.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[:, 1], want.imag, rtol=1e-4, atol=1e-4)


def test_timing_correct_zeroes_the_estimate():
    """Correcting the O&M estimate must leave ~zero residual offset."""
    from modulationdetectioncnn_tpu.data.synthetic import rrc_filter

    r = np.random.default_rng(23)
    sps = 8
    frames = []
    for shift in (1, 3, 5):
        syms = (r.integers(0, 2, 80) * 2 - 1).astype(np.float64)
        up = np.zeros(len(syms) * sps)
        up[::sps] = syms
        x = np.convolve(up, rrc_filter(0.35, sps, 6))[: 512 + shift]
        frames.append(x[shift:].astype(np.complex64))
    pl = jnp.asarray(_planes(np.stack(frames)))
    tau = normalize.estimate_timing(pl, sps)
    fixed = normalize.correct_timing(pl, tau, sps)
    resid = np.asarray(normalize.estimate_timing(fixed, sps))
    resid = np.minimum(resid % sps, sps - resid % sps)
    assert np.all(resid < 0.15), resid


def test_power_normalize_planes():
    r = np.random.default_rng(17)
    x = (r.standard_normal((5, 128)) + 1j * r.standard_normal((5, 128))) * 3.0
    got = np.asarray(normalize.power_normalize(to_planes(x)))
    p = (got**2).sum(axis=-2).mean(axis=-1)
    np.testing.assert_allclose(p, 1.0, rtol=1e-5)
    want = np.stack([gold.power_normalize(f) for f in x])
    np.testing.assert_allclose(from_planes(got), want, rtol=1e-4, atol=1e-4)


def test_overlap_save_blocks_match_golden(stream):
    blocks_g = gold.overlap_save_blocks(stream, block_len=512, halo=64)
    blocks_j = np.asarray(framer.overlap_save_blocks(jnp.asarray(stream), 512, 64))
    np.testing.assert_array_equal(blocks_j, blocks_g)
    # plane form: leading (2,) axis passes through
    blocks_p = np.asarray(
        framer.overlap_save_blocks(to_planes(stream), 512, 64)
    )
    assert blocks_p.shape == (2, blocks_g.shape[0], blocks_g.shape[1])
    np.testing.assert_allclose(blocks_p[0], blocks_g.real, rtol=1e-6)


def test_overlap_save_filter_streamed_equals_batch(stream):
    """The §4b exact-match invariant, at the FIR level (fp32)."""
    h = fir.design_lowpass(33, 0.2)
    batch = np.asarray(fir.fir_filter_iq(to_planes(stream), h))
    halo = len(h) - 1
    blocks = framer.overlap_save_blocks(to_planes(stream), 512, halo)
    # (2, nb, halo+B) -> (nb, 2, halo+B) so the FIR sees (..., 2, T)
    filtered = fir.fir_filter_iq(jnp.swapaxes(blocks, 0, 1), h)
    streamed = np.asarray(
        framer.concat_blocks(
            jnp.swapaxes(framer.trim_halo(filtered, halo), 0, 1), len(stream)
        )
    )
    np.testing.assert_allclose(streamed, batch, rtol=1e-5, atol=1e-5)


def test_frames_from_stream():
    x = jnp.arange(1000) + 0j
    fr = np.asarray(framer.frames_from_stream(x, 128))
    assert fr.shape == (7, 128)
    np.testing.assert_array_equal(fr[2].real, np.arange(256, 384))
    iq = np.asarray(framer.iq_frames(framer.frames_from_stream(x, 128)))
    assert iq.shape == (7, 2, 128)
    assert iq.dtype == np.float32


def test_frames_from_stream_fast_paths_match_gather():
    """The reshape fast paths (hop == frame_len, hop | frame_len) must equal
    the general dynamic-slice formulation frame-for-frame."""
    import jax
    import jax.numpy as jnp

    from modulationdetectioncnn_tpu.dsp import framer

    rng = np.random.default_rng(123)
    x = jnp.asarray(rng.standard_normal((3, 2, 517)).astype(np.float32))

    def reference(xa, flen, hop):
        t_len = xa.shape[-1]
        n = (t_len - flen) // hop + 1
        starts = jnp.arange(n) * hop
        return jnp.moveaxis(
            jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(
                xa, s, flen, axis=-1))(starts), 0, -2)

    for flen, hop in [(128, 128), (128, 64), (128, 32), (64, 16), (100, 7)]:
        got = framer.frames_from_stream(x, flen, hop)
        want = reference(x, flen, hop)
        assert got.shape == want.shape, (flen, hop, got.shape, want.shape)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
