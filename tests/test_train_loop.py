"""Training-loop, eval-harness, and checkpoint tests (CPU, SURVEY.md §4b)."""
import numpy as np

from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides
from modulationdetectioncnn_tpu.data import synthetic
from modulationdetectioncnn_tpu.eval import harness


def _tiny_cfg(**over):
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
        ]
        + [f"{k}={v}" for k, v in over.items()],
    )
    return cfg


def _tiny_data(cfg, n=128, snrs=(18,)):
    x, y, s = synthetic.make_dataset(
        cfg.data, snrs=list(snrs), frames_per_class_per_snr=n
    )
    return x, y, s


def test_train_loss_decreases():
    from modulationdetectioncnn_tpu.train import loop

    cfg = _tiny_cfg()
    x, y, _ = _tiny_data(cfg)
    params, history = loop.train(cfg, (x, y))
    assert history[0]["loss"] > history[-1]["loss"]
    assert history[-1]["train_acc"] > 0.7  # BPSK-vs-QPSK at 18 dB is easy


def test_train_dp_matches_more_devices_seeded():
    """DP on 8 virtual devices trains to a sane state (SURVEY.md §4b(b))."""
    import jax

    from modulationdetectioncnn_tpu.train import loop

    cfg = _tiny_cfg()
    x, y, _ = _tiny_data(cfg)
    mesh1 = loop.make_mesh(1)
    mesh8 = loop.make_mesh(8)
    # Both runs use the device-resident path: the PRNG-driven batch index
    # stream is identical regardless of device count, so the math matches
    # up to reduction order.
    p1, h1 = loop.train(cfg, (x, y), mesh=mesh1)
    p8, h8 = loop.train(cfg, (x, y), mesh=mesh8)
    # Same seed + same data order -> identical math up to reduction order.
    l1 = jax.tree.leaves(p1)
    l8 = jax.tree.leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
        )


def test_train_device_resident_data():
    """The HBM-resident data path (default on one chip) trains equivalently."""
    from modulationdetectioncnn_tpu.train import loop

    cfg = _tiny_cfg()
    x, y, _ = _tiny_data(cfg)
    mesh1 = loop.make_mesh(1)
    params, history = loop.train(cfg, (x, y), mesh=mesh1, device_data=True)
    assert history[0]["loss"] > history[-1]["loss"]
    assert history[-1]["train_acc"] > 0.7


def test_train_resume_from_checkpoint(tmp_path):
    """Interrupted training resumes at the saved step (SURVEY.md §5)."""
    from modulationdetectioncnn_tpu.train import loop

    ckdir = str(tmp_path / "ck")
    cfg = _tiny_cfg(**{
        "train.num_steps": "60",
        "train.checkpoint_dir": ckdir,
        "train.checkpoint_every": "30",
        "train.eval_every": "30",
    })
    x, y, _ = _tiny_data(cfg, n=64)
    mesh = loop.make_mesh(1)
    # "crash" after 30 steps
    cfg30 = _tiny_cfg(**{
        "train.num_steps": "30",
        "train.checkpoint_dir": ckdir,
        "train.checkpoint_every": "30",
        "train.eval_every": "30",
    })
    loop.train(cfg30, (x, y), mesh=mesh)
    # restart with the full budget: must resume at 31, not 1
    params, history = loop.train(cfg, (x, y), mesh=mesh)
    steps = [h["step"] for h in history]
    assert steps and min(steps) > 30 and max(steps) == 60


def test_snr_sweep_harness():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 2, 128)).astype(np.float32)
    y = rng.integers(0, 3, 100).astype(np.int32)
    s = np.repeat([0, 10], 50).astype(np.int32)
    # A fake oracle predictor.
    result = harness.snr_sweep(
        lambda xb: np.zeros(len(xb), dtype=np.int64), x, y, s, ("a", "b", "c"),
        batch_size=32,
    )
    assert set(result["snr_accuracy"]) == {"0", "10"}
    want = float((y == 0).mean())
    assert abs(result["overall_accuracy"] - want) < 1e-9
    assert result["headline"]["acc_at_18dB"] is None
    cm = np.asarray(result["confusion"]["0"])
    assert cm.sum() == 50


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from modulationdetectioncnn_tpu.models import VTCNN2
    from modulationdetectioncnn_tpu.utils import checkpoint as ckpt

    model = VTCNN2(
        num_classes=2, conv1_filters=8, conv2_filters=4, dense_units=8,
        dtype=jnp.float32,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))
    mgr = ckpt.make_manager(str(tmp_path / "ck"))
    ckpt.save(mgr, 7, params, {"count": jnp.zeros(())})
    mgr.wait_until_finished()
    restored_params, _, step = ckpt.restore(mgr)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_donated_buffers_are_not_reusable():
    """Buffer donation really happens (SURVEY.md §5 donation-aliasing row):
    after a train step, the donated params buffer is deleted — reusing it
    must raise, proving no silent aliasing."""
    import jax
    import jax.numpy as jnp
    import pytest

    from modulationdetectioncnn_tpu.train import loop

    cfg = _tiny_cfg()
    from modulationdetectioncnn_tpu.models import VTCNN2
    import optax

    model = VTCNN2.from_config(cfg.model)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
    opt_state = tx.init(params)
    step = loop.make_device_train_step(model, tx, batch_size=32)
    x = jnp.zeros((64, 2, 128), jnp.float32)
    y = jnp.zeros((64,), jnp.int32)
    new_params, *_ = step(params, opt_state, x, y, jax.random.key(1))
    jax.block_until_ready(new_params)
    leaf = jax.tree.leaves(params)[0]
    with pytest.raises(Exception):
        _ = float(jnp.sum(leaf))
