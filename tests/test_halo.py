"""Distributed halo-exchange tests on the 8-device CPU mesh (§4b(a))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from modulationdetectioncnn_tpu.config import StreamConfig
from modulationdetectioncnn_tpu.dsp import pipeline
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.parallel import halo


def _wideband(t_len, seed=9):
    r = np.random.default_rng(seed)
    n = np.arange(t_len)
    x = (
        np.exp(2j * np.pi * 0.19 * n)
        + 0.4 * (r.standard_normal(t_len) + 1j * r.standard_normal(t_len))
    )
    return x.astype(np.complex64)


def _predictor():
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(1), jnp.zeros((1, 2, 128)))

    def predict(xb):  # pure jnp fn, safe inside shard_map
        return model.apply(params, xb).argmax(-1)

    return predict


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_equals_single_device(n_dev):
    """Halo exchange yields identical labels vs the unsharded path."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(num_subbands=8, taps_per_branch=8, block_len=8 * 128)
    t_local = 8 * 128 * 2
    x = to_planes(_wideband(n_dev * t_local))
    predict = _predictor()
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev), ("time",))
    got = np.asarray(halo.classify_stream_sharded(x, predict, sc, mesh))
    want = np.asarray(pipeline.classify_stream(x, predict, sc))
    assert got.shape[0] == 8
    f = got.shape[1]
    np.testing.assert_array_equal(got, want[:, :f])
    assert f >= want.shape[1] - 1


def test_left_halo_exchange_values():
    """The exchanged halo is exactly the left neighbor's tail."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev), ("time",))
    t_local, h = 16, 3
    x = jnp.arange(n_dev * t_local, dtype=jnp.float32)

    fn = shard_map(
        lambda xl: halo.left_halo_exchange(xl, h, "time")[None],
        mesh=mesh,
        in_specs=(P("time"),),
        out_specs=P("time"),
        check_vma=False,
    )
    out = np.asarray(jax.jit(fn)(x))  # (n_dev, h + t_local)
    for d in range(n_dev):
        if d == 0:
            np.testing.assert_array_equal(out[d, :h], np.zeros(h))
        else:
            np.testing.assert_array_equal(
                out[d, :h], np.arange(d * t_local - h, d * t_local)
            )
        np.testing.assert_array_equal(
            out[d, h:], np.arange(d * t_local, (d + 1) * t_local)
        )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_equals_single_device_with_resampler(n_dev):
    """The COMPOSED halo (resampler tail + channelizer state + frame reach)
    stays label-exact under time sharding with 2:3 resampling in front —
    exercises the r4 MXU windows-matmul resampler inside shard_map."""
    from modulationdetectioncnn_tpu.dsp.framer import to_planes

    sc = StreamConfig(num_subbands=8, taps_per_branch=8,
                      resample_up=2, resample_down=3, fir_taps=33,
                      block_len=8 * 128 * 3)
    t_local = 8 * 128 * 3
    x = to_planes(_wideband(n_dev * t_local))
    predict = _predictor()
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev), ("time",))
    got = np.asarray(halo.classify_stream_sharded(x, predict, sc, mesh))
    want = np.asarray(pipeline.classify_stream(x, predict, sc))
    f = got.shape[1]
    np.testing.assert_array_equal(got, want[:, :f])
    assert f >= want.shape[1] - 1
