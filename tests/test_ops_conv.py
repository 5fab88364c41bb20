"""Pallas conv kernels vs golden NumPy (interpret mode on CPU, §4b)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulationdetectioncnn_tpu.golden import cnn as gcnn
from modulationdetectioncnn_tpu.golden import quant as gq
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.ops import cnn_kernels as ck


@pytest.fixture(scope="module")
def float_params():
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))
    return model, jax.tree.map(np.asarray, params)


def _golden_conv1_stacked(p, x):
    h = gcnn.relu(
        gcnn.conv2d_valid(
            x.astype(np.float64)[..., None], p["Conv1"]["kernel"], p["Conv1"]["bias"]
        )
    )  # (B, 2, 126, 256)
    return np.concatenate([h[:, 0], h[:, 1]], axis=-1)  # (B, 126, 512)


def test_conv1_stacked_matches_golden(float_params):
    _, params = float_params
    p = params["params"]
    x = np.random.default_rng(0).standard_normal((5, 2, 128)).astype(np.float32)
    got = np.asarray(
        ck.conv1_stacked(
            jnp.asarray(x),
            jnp.asarray(ck.pack_conv1_weights(p["Conv1"]["kernel"])),
            jnp.asarray(p["Conv1"]["bias"]),
            out_dtype=jnp.float32,
            block_b=4,
            interpret=True,
        )
    )
    want = _golden_conv1_stacked(p, x)
    assert got.shape == (5, 126, 512)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2_stacked_matches_golden(float_params):
    _, params = float_params
    p = params["params"]
    x = np.random.default_rng(1).standard_normal((5, 2, 128)).astype(np.float32)
    a1s = _golden_conv1_stacked(p, x).astype(np.float32)
    got = np.asarray(
        ck.conv2_stacked(
            jnp.asarray(a1s),
            jnp.asarray(ck.pack_conv2_weights(p["Conv2"]["kernel"]).astype(np.float32)),
            jnp.asarray(p["Conv2"]["bias"]),
            out_dtype=jnp.float32,
            block_b=4,
            interpret=True,
        )
    )
    want = gcnn.relu(
        gcnn.conv2d_valid(
            gcnn.relu(
                gcnn.conv2d_valid(
                    x.astype(np.float64)[..., None],
                    p["Conv1"]["kernel"],
                    p["Conv1"]["bias"],
                )
            ),
            p["Conv2"]["kernel"],
            p["Conv2"]["bias"],
        )
    )[:, 0]  # (B, 124, 80)
    assert got.shape == (5, 124, 80)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def quantized(float_params):
    from modulationdetectioncnn_tpu.train.quant import quantize

    model, params = float_params
    calib = (
        np.random.default_rng(3).standard_normal((64, 2, 128)).astype(np.float32)
    )
    qm = quantize(model, params, calib)
    return qm, calib


def test_conv1_int8_kernel_exact(quantized):
    qm, calib = quantized
    x_i8 = gq.quantize_input(calib[:6], float(qm.s_x))
    want = gq.conv1_int8(x_i8, qm.w1p, qm.m1, qm.o1)
    got = np.asarray(
        ck.conv1_stacked_int8(
            jnp.asarray(x_i8),
            jnp.asarray(qm.w1p),
            jnp.asarray(qm.m1),
            jnp.asarray(qm.o1),
            block_b=4,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_conv2_int8_kernel_exact(quantized):
    qm, calib = quantized
    x_i8 = gq.quantize_input(calib[:6], float(qm.s_x))
    a1 = gq.conv1_int8(x_i8, qm.w1p, qm.m1, qm.o1)
    want = gq.conv2_int8(a1, qm.w2p, qm.m2, qm.o2)
    got = np.asarray(
        ck.conv2_stacked_int8(
            jnp.asarray(a1),
            jnp.asarray(qm.w2p),
            jnp.asarray(qm.m2),
            jnp.asarray(qm.o2),
            block_b=4,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_int8_golden_close_to_float(quantized, float_params):
    """PTQ int8 logits track float logits (argmax agreement on random x)."""
    qm, calib = quantized
    _, params = float_params
    logits_q = gq.int8_forward(qm, calib)
    logits_f = gcnn.vtcnn2_forward(params, calib)
    agree = (logits_q.argmax(-1) == logits_f.argmax(-1)).mean()
    assert agree > 0.9
