"""Channel-sharding (TP-analog) correctness (SURVEY.md N15, §4b(c)):
model-axis-sharded forward must equal the unsharded forward, and train()
must honor MeshConfig(model=k) end-to-end (VERDICT r1 #5)."""
import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, MeshConfig, apply_overrides
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.parallel import mesh as pmesh


def _params_and_input(seed=0, batch=64):
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(seed), jnp.zeros((1, 2, 128)))
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((batch, 2, 128)),
        jnp.float32,
    )
    return model, params, x


def test_model_sharded_forward_matches_unsharded():
    """SURVEY.md §4b(c): channel-sharded forward == unsharded, fp32 tol."""
    model, params, x = _params_and_input()
    want = np.asarray(jax.jit(model.apply)(params, x))
    for mc in (MeshConfig(data=1, model=8), MeshConfig(data=2, model=4)):
        mesh = pmesh.make_mesh(mc)
        ps = pmesh.shard_params(params, mesh)
        xs = jax.device_put(x, pmesh.batch_sharding(mesh))
        got = np.asarray(jax.jit(model.apply)(ps, xs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shard_params_places_on_model_axis():
    """Conv1 filters and Dense1 columns actually live on the model axis."""
    _, params, _ = _params_and_input()
    mesh = pmesh.make_mesh(MeshConfig(data=1, model=4))
    ps = pmesh.shard_params(params, mesh)
    p = ps["params"]
    c1 = p["Conv1"]["kernel"]
    assert c1.sharding.spec == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    # each shard holds 1/4 of the filters
    shard_shape = c1.sharding.shard_shape(c1.shape)
    assert shard_shape[-1] == c1.shape[-1] // 4
    d1 = p["Dense1"]["kernel"]
    assert d1.sharding.shard_shape(d1.shape)[1] == d1.shape[1] // 4


def test_train_honors_mesh_config_model_axis():
    """train(cfg) with mesh.model=2 shards params and still learns."""
    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.train import loop

    cfg = apply_overrides(
        AmcConfig(),
        [
            "data.classes=BPSK,QPSK",
            "model.num_classes=2",
            "model.conv1_filters=32",
            "model.conv2_filters=16",
            "model.dense_units=32",
            "model.dtype=float32",
            "model.dropout_rate=0.1",
            "train.batch_size=64",
            "train.num_steps=150",
            "train.eval_every=50",
            "train.warmup_steps=5",
            "mesh.data=2",
            "mesh.model=2",
        ],
    )
    x, y, _ = synthetic.make_dataset(
        cfg.data, snrs=[18], frames_per_class_per_snr=128
    )
    params, history = loop.train(cfg, (x, y))
    assert history[0]["loss"] > history[-1]["loss"]
    assert history[-1]["train_acc"] > 0.7
    c1 = params["params"]["Conv1"]["kernel"]
    assert "model" in str(c1.sharding.spec)


def test_train_model_sharded_matches_data_parallel():
    """Same seed: (data=2, model=2) training equals pure-DP within fp tol."""
    from modulationdetectioncnn_tpu.data import synthetic
    from modulationdetectioncnn_tpu.train import loop

    base = [
        "data.classes=BPSK,QPSK",
        "model.num_classes=2",
        "model.conv1_filters=32",
        "model.conv2_filters=16",
        "model.dense_units=32",
        "model.dtype=float32",
        "model.dropout_rate=0.1",
        "train.batch_size=64",
        "train.num_steps=60",
        "train.eval_every=30",
        "train.warmup_steps=5",
    ]
    cfg_tp = apply_overrides(AmcConfig(), base + ["mesh.data=2", "mesh.model=2"])
    cfg_dp = apply_overrides(AmcConfig(), base + ["mesh.data=4"])
    x, y, _ = synthetic.make_dataset(
        cfg_tp.data, snrs=[18], frames_per_class_per_snr=96
    )
    p_tp, _ = loop.train(cfg_tp, (x, y))
    p_dp, _ = loop.train(cfg_dp, (x, y))
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
        )
