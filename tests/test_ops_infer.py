"""Fused inference kernels vs golden chains (interpret mode, §4b)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulationdetectioncnn_tpu.golden import cnn as gcnn
from modulationdetectioncnn_tpu.golden import quant as gq
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.ops import infer


@pytest.fixture(scope="module")
def setup():
    model = VTCNN2(dtype=jnp.float32)
    params = jax.tree.map(
        np.asarray, model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))
    )
    x = np.random.default_rng(7).standard_normal((16, 2, 128)).astype(np.float32)
    return model, params, x


def test_fused_bf16_matches_golden(setup):
    _, params, x = setup
    fwd = infer.make_bf16_forward(params, block_b=8, chunk=4, interpret=True)
    got = np.asarray(fwd(jnp.asarray(x)))
    want = gcnn.vtcnn2_forward(params, x)
    assert got.shape == (16, 11)
    # bf16 weights/activations, fp32 accum (SURVEY §4b: bf16 tol 2e-2).
    assert np.max(np.abs(got - want)) < 5e-2
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8


def test_fused_int8_matches_golden_exactly(setup):
    model, params, x = setup
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(np.float32)
    qm = quantize(model, params, calib)
    fwd = infer.make_int8_forward(qm, block_b=8, chunk=4, interpret=True)
    got = np.asarray(fwd(jnp.asarray(x)))
    want = gq.int8_forward(qm, x)
    assert got.shape == (16, 11)
    # Integer path is deterministic; fp32 dequant of identical int32 logits.
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
