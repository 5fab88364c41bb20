"""Golden NumPy CNN vs Flax/JAX model parity (SURVEY.md §4b)."""
import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.golden import cnn as golden
from modulationdetectioncnn_tpu.models import VTCNN2


def _init(model, batch=4, t=128, seed=0):
    x = jnp.zeros((batch, 2, t), jnp.float32)
    return model.init(jax.random.key(seed), x)


def test_flax_fp32_matches_golden():
    model = VTCNN2(dtype=jnp.float32)
    params = _init(model)
    x = np.random.default_rng(0).standard_normal((8, 2, 128)).astype(np.float32)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    want = golden.vtcnn2_forward(jax.tree.map(np.asarray, params), x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flax_bf16_close_to_golden():
    model = VTCNN2(dtype=jnp.bfloat16)
    params = _init(model)
    x = np.random.default_rng(1).standard_normal((8, 2, 128)).astype(np.float32)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    want = golden.vtcnn2_forward(jax.tree.map(np.asarray, params), x)
    # bf16 tolerance per SURVEY.md §4b (<=2e-2); logits are O(1) at init.
    assert np.max(np.abs(got - want)) < 2e-2
    # argmax agreement is what actually matters downstream
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8


def test_output_shapes():
    model = VTCNN2(dtype=jnp.float32)
    params = _init(model)
    p = params["params"]
    assert p["Conv1"]["kernel"].shape == (1, 3, 1, 256)
    assert p["Conv2"]["kernel"].shape == (2, 3, 256, 80)
    assert p["Dense1"]["kernel"].shape == (124 * 80, 256)
    assert p["Dense2"]["kernel"].shape == (256, 11)
    out = model.apply(params, jnp.zeros((3, 2, 128)))
    assert out.shape == (3, 11)
    assert out.dtype == jnp.float32
