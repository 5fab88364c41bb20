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


def test_fused_bf16_v2_matches_golden(setup):
    """v2 bf16 (conv1 on MXU, bias in K-lane 6) within bf16 tolerance."""
    _, params, x = setup
    fwd = infer.make_bf16_forward_v2(
        params, block_b=8, chunk=4, dense_block_b=16, interpret=True
    )
    got = np.asarray(fwd(jnp.asarray(x)))
    want = gcnn.vtcnn2_forward(params, x)
    assert got.shape == (16, 11)
    assert np.max(np.abs(got - want)) < 5e-2


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


def test_expand_taps_layout():
    """X6[b, t, h*3+k] == x[b, h, t+k]; lanes 6,7 zero."""
    r = np.random.default_rng(3)
    x = r.integers(-127, 127, (2, 2, 16)).astype(np.int8)
    xe = np.asarray(infer.expand_taps(jnp.asarray(x), 14))
    assert xe.shape == (2, 14, 8)
    for h in range(2):
        for k in range(3):
            np.testing.assert_array_equal(xe[:, :, h * 3 + k], x[:, h, k : k + 14])
    assert (xe[..., 6:] == 0).all()


def test_expand_conv1_weights_blockdiag():
    w = np.arange(3 * 4, dtype=np.int8).reshape(3, 4)
    we = infer.expand_conv1_weights(w)
    assert we.shape == (8, 8)
    for h in range(2):
        for k in range(3):
            np.testing.assert_array_equal(we[h * 3 + k, h * 4 : (h + 1) * 4], w[k])
    assert we.sum() == 2 * w.sum()


def test_int8_v3_ragged_batch(setup):
    """v3 pads ragged batches internally and returns exactly B labels."""
    model, params, x = setup
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    qm = quantize(model, params, calib)
    classify = infer.make_int8_classifier_v3(
        qm, block_b=8, chunk=4, dense_block_b=16, interpret=True
    )
    got = np.asarray(classify(jnp.asarray(x[:5])))
    full = np.asarray(classify(jnp.asarray(x)))
    assert got.shape == (5,)
    np.testing.assert_array_equal(got, full[:5])


def test_fused_bf16_v4_classifier_agrees_with_golden(setup):
    """bf16 v4 classifier labels agree with the float golden argmax
    (bf16 rounding may flip genuine near-ties, hence >=, not ==)."""
    _, params, x = setup
    classify = infer.make_bf16_classifier_v4(
        params, block_b=8, chunk=4, dense_block_b=16, interpret=True
    )
    got = np.asarray(classify(jnp.asarray(x)))
    want = gcnn.vtcnn2_forward(params, x).argmax(-1)
    assert got.shape == (16,)
    assert (got == want).mean() >= 0.85


def test_expand_conv1_weights_tapk_layout():
    w = np.arange(3 * 4, dtype=np.int8).reshape(3, 4)
    wk = infer.expand_conv1_weights_tapk(w)
    assert wk.shape == (24, 8)
    for k in range(3):
        for h in range(2):
            np.testing.assert_array_equal(
                wk[k * 8 + h, h * 4 : (h + 1) * 4], w[k]
            )
    assert wk.sum() == 2 * w.sum()


@pytest.mark.parametrize("version", ["v1", "v2", "v3", "v4", "v5", "v6",
                                     "v7", "v9", "v10"])
def test_make_int8_predict_all_versions_agree(setup, version):
    """Every selectable eval kernel version produces golden labels
    (interpret mode; on-chip parity is proven by scripts/train_eval_full)."""
    model, params, x = setup
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    qm = quantize(model, params, calib)
    classify = infer.make_int8_predict(qm, version, interpret=True)
    got = np.asarray(classify(jnp.asarray(x)))
    want = gq.int8_forward(qm, x).argmax(-1)
    np.testing.assert_array_equal(got, want)


def test_pack_conv2_weights_lane256_layout():
    """Tap k's Co columns sit at lane offset k*Co; lanes 3*Co..256 zero."""
    r = np.random.default_rng(5)
    w2 = r.integers(-127, 127, (2, 3, 4, 5)).astype(np.int8)  # Co=5
    out = infer.pack_conv2_weights_lane256(w2)
    assert out.shape == (8, 256)
    for k in range(3):
        np.testing.assert_array_equal(
            out[:, k * 5 : (k + 1) * 5], w2[:, k].reshape(8, 5)
        )
    assert (out[:, 15:] == 0).all()


def test_expand_conv1_weights_v9f_contract(setup):
    """Folded conv1 weights: rows (2k+h) = w1_i8 * 2^-shift1; bias lane 6 =
    o1 * 2^-shift1; everything bf16-exact (quantize() fixed-point
    contract). The bf16 dot then reproduces the integer requantize spec
    exactly (parametrized e2e test proves the labels)."""
    model, params, _ = setup
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    qm = quantize(model, params, calib)
    assert np.issubdtype(np.asarray(qm.m1).dtype, np.integer)
    assert np.issubdtype(np.asarray(qm.o2).dtype, np.integer)
    w = infer.expand_conv1_weights_v9f(qm)
    assert w.shape == (8, 512)
    m1 = 2.0 ** (-np.asarray(qm.m1, np.float64))
    c = qm.w1p.shape[1]
    for k in range(3):
        for h in range(2):
            np.testing.assert_allclose(
                w[2 * k + h, h * c : (h + 1) * c],
                (np.asarray(qm.w1p[k], np.float64)
                 * m1[h * c : (h + 1) * c]).astype(np.float32),
            )
    np.testing.assert_allclose(
        w[6], (np.asarray(qm.o1, np.float64) * m1).astype(np.float32)
    )
    assert (w[7] == 0).all()
    # the 8-bit-significand offset snap keeps the bias lane bf16-exact
    assert np.all(np.asarray(w.astype(jnp.bfloat16), np.float32) == w)


@pytest.mark.parametrize("version", ["v7", "v9", "v10"])
def test_conv_stage_full_activation_parity(setup, version):
    """FULL conv2 activation map bit-matches the golden int8 chain (not
    just the argmax labels — ADVICE r4 #4): every valid (frame, t, channel)
    int8 activation of the fused conv stage equals golden
    quantize_input -> conv1_int8 -> conv2_int8."""
    model, params, x = setup
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    qm = quantize(model, params, calib)
    conv = infer.make_conv_stage(qm, version, block_b=8, chunk=4,
                                 interpret=True)
    got = np.asarray(conv(jnp.asarray(x)))  # (16, 128, 128) int8
    x_i8 = gq.quantize_input(x, qm.s_x)
    a1 = gq.conv1_int8(x_i8, qm.w1p, qm.m1, qm.o1)      # (16, 126, 512)
    a2 = gq.conv2_int8(a1, qm.w2p, qm.m2, qm.o2)        # (16, 124, 80)
    co = a2.shape[-1]
    np.testing.assert_array_equal(got[:, : a2.shape[1], :co], a2)


def test_xla_int8_reference_matches_golden_exactly(setup):
    """The XLA-fused int8 reference path follows the same fixed-point
    requantize spec bit-for-bit (it shares ops/cnn_kernels.requantize)."""
    model, params, x = setup
    from modulationdetectioncnn_tpu.ops.infer_xla import make_int8_forward_xla
    from modulationdetectioncnn_tpu.train.quant import quantize

    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    qm = quantize(model, params, calib)
    got = np.asarray(make_int8_forward_xla(qm)(jnp.asarray(x)))
    want = gq.int8_forward(qm, x)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
