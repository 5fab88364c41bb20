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


def test_subband_frames_shapes():
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(num_subbands=8, taps_per_branch=8)
    x = to_planes(_wideband(8 * 128 * 4))
    h = design_prototype(8, 8)
    iq = pipeline.subband_frames(x, h, sc)
    assert iq.shape == (8, 4, 2, 128)
    assert iq.dtype == jnp.float32
    # per-frame unit power after normalization
    p = np.asarray((iq**2).sum(axis=2).mean(axis=-1))
    np.testing.assert_allclose(p, 1.0, rtol=1e-3)
