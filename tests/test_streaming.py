"""Streamed-vs-batch exact-match test (SURVEY.md §4b, the load-bearing
overlap-save invariant) plus pipeline shape checks."""
import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.config import StreamConfig
from modulationdetectioncnn_tpu.dsp import pipeline
from modulationdetectioncnn_tpu.golden.dsp import design_prototype
from modulationdetectioncnn_tpu.models import VTCNN2


def _wideband(t_len: int, seed: int = 3) -> np.ndarray:
    r = np.random.default_rng(seed)
    n = np.arange(t_len)
    x = (
        np.exp(2j * np.pi * 0.13 * n)
        + 0.5 * np.exp(2j * np.pi * 0.31 * n + 0.7j)
        + 0.3 * (r.standard_normal(t_len) + 1j * r.standard_normal(t_len))
    )
    return x.astype(np.complex64)


def _predictor(num_classes=11):
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))

    @jax.jit
    def predict(xb):
        return model.apply(params, xb).argmax(-1)

    return predict


def test_streamed_equals_batch_labels():
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(num_subbands=8, taps_per_branch=8, block_len=8 * 128 * 2)
    t_len = sc.block_len * 3 + sc.block_len // 2  # non-multiple: ragged tail
    x = to_planes(_wideband(t_len))
    predict = _predictor()
    batch = np.asarray(pipeline.classify_stream(x, predict, sc))
    streamed = np.asarray(pipeline.classify_stream_blocked(x, predict, sc))
    assert streamed.shape[0] == 8
    # Exact agreement frame-for-frame (SURVEY.md §4b "exact-prediction match")
    f = streamed.shape[1]
    np.testing.assert_array_equal(streamed, batch[:, :f])
    # and the streamed path must cover (almost) the whole stream
    assert f >= batch.shape[1] - 1


def test_streamed_equals_batch_overlapping_frames():
    """hop < frame_len: overlapping classification frames across block
    boundaries must match the batch path frame-for-frame (VERDICT r1 #4)."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(
        num_subbands=8, taps_per_branch=8, frame_hop=32,
        block_len=8 * 128 * 2,
    )
    t_len = sc.block_len * 3 + sc.block_len // 2
    x = to_planes(_wideband(t_len))
    predict = _predictor()
    batch = np.asarray(pipeline.classify_stream(x, predict, sc))
    streamed = np.asarray(pipeline.classify_stream_blocked(x, predict, sc))
    assert streamed.shape == batch.shape == (8, pipeline.total_frames(sc, t_len))
    np.testing.assert_array_equal(streamed, batch)


def test_streamed_equals_batch_with_resampling():
    """Wideband P/Q resampling wired into the chain (SURVEY.md N5): the
    blocked overlap-save path with the composed halo must still match the
    batch path exactly."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    for up, down in ((1, 2), (2, 3)):
        sc = StreamConfig(
            num_subbands=4, taps_per_branch=8, resample_up=up,
            resample_down=down, fir_taps=33,
            block_len=4 * 128 * 2 * 3,  # *3 keeps blocks down-aligned
        )
        t_len = sc.block_len * 3
        x = to_planes(_wideband(t_len, seed=7))
        predict = _predictor()
        batch = np.asarray(pipeline.classify_stream(x, predict, sc))
        streamed = np.asarray(pipeline.classify_stream_blocked(x, predict, sc))
        f = pipeline.total_frames(sc, t_len)
        assert f > 4
        assert streamed.shape == (4, f)
        np.testing.assert_array_equal(streamed, batch[:, :f])


def test_resampled_chain_matches_golden_frames():
    """channelize->resample chain parity: the JAX front-end frames equal the
    NumPy golden chain (resample -> pfb -> frame -> normalize) (VERDICT #4
    'a test channelizes→resamples→classifies and matches golden')."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes
    from modulationdetectioncnn_tpu.golden import dsp as gold

    sc = StreamConfig(
        num_subbands=4, taps_per_branch=8, resample_up=1, resample_down=2,
        normalize_cfo=False, normalize_timing=False,
    )
    t_len = 4 * 128 * 8 * 2
    xc = _wideband(t_len, seed=9)
    # golden chain (complex float64)
    hr = pipeline.design_resampler(sc)
    xr = gold.fir_resample(xc, hr, sc.resample_up, sc.resample_down)
    xr = xr[: len(xr) - len(xr) % sc.num_subbands]
    h = gold.design_prototype(sc.num_subbands, sc.taps_per_branch)
    sub = gold.pfb_channelize(xr, h, sc.num_subbands)  # (T/M, M)
    want = []
    for k in range(sc.num_subbands):
        s = sub[:, k]
        n_fr = (len(s) - sc.frame_len) // sc.frame_hop + 1
        fr = np.stack(
            [s[i * sc.frame_hop : i * sc.frame_hop + sc.frame_len]
             for i in range(n_fr)]
        )
        want.append(np.stack([gold.power_normalize(f) for f in fr]))
    want = np.stack(want)  # (M, F, frame_len) complex
    got = np.asarray(pipeline.subband_frames(to_planes(xc), h, sc))
    assert got.shape == want.shape[:2] + (2, sc.frame_len)
    np.testing.assert_allclose(got[..., 0, :], want.real, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[..., 1, :], want.imag, rtol=2e-3, atol=2e-3)


def test_streamed_equals_batch_with_timing_normalization():
    """Per-frame timing correction on: streamed == batch stays exact."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(
        num_subbands=8, taps_per_branch=8, block_len=8 * 128 * 2,
        normalize_timing=True,
    )
    t_len = sc.block_len * 2 + sc.block_len // 2
    x = to_planes(_wideband(t_len, seed=11))
    predict = _predictor()
    batch = np.asarray(pipeline.classify_stream(x, predict, sc))
    streamed = np.asarray(pipeline.classify_stream_blocked(x, predict, sc))
    np.testing.assert_array_equal(streamed, batch)


def test_subband_frames_shapes():
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    # cfo/timing off: the unit-power property holds right after the power
    # stage (timing's fractional-delay FIR perturbs frame power at edges).
    sc = StreamConfig(num_subbands=8, taps_per_branch=8,
                      normalize_cfo=False, normalize_timing=False)
    x = to_planes(_wideband(8 * 128 * 4))
    h = design_prototype(8, 8)
    iq = pipeline.subband_frames(x, h, sc)
    assert iq.shape == (8, 4, 2, 128)
    assert iq.dtype == jnp.float32
    # per-frame unit power after normalization
    p = np.asarray((iq**2).sum(axis=2).mean(axis=-1))
    np.testing.assert_allclose(p, 1.0, rtol=1e-3)
