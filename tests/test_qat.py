"""QAT fake-quant pass (SURVEY.md N13): deployment-arithmetic consistency."""
import jax
import jax.numpy as jnp
import numpy as np

from modulationdetectioncnn_tpu.golden import quant as gq
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.train import qat
from modulationdetectioncnn_tpu.train.quant import (
    calibrate_activations,
    quantize,
)


def _setup():
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))
    x = np.random.default_rng(7).standard_normal((64, 2, 128)).astype(np.float32)
    return model, params, x


def test_fake_quant_weight_roundtrip():
    r = np.random.default_rng(0)
    w = jnp.asarray(r.standard_normal((3, 3, 4, 8)).astype(np.float32))
    qdq = qat.fake_quant_weight(w)
    # dequantized weights lie on the per-channel int8 grid
    s = np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0
    steps = np.asarray(qdq) / s
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
    # STE: gradient of sum(qdq) wrt w is all-ones
    g = jax.grad(lambda ww: qat.fake_quant_weight(ww).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_qat_forward_tracks_int8_chain():
    """Fake-quant logits should predict like the real int8 deployment path."""
    model, params, x = _setup()
    scales = calibrate_activations(model, params, x)
    qm = quantize(model, params, x)
    logits_qat = np.asarray(qat.qat_apply(params, jnp.asarray(x), scales))
    logits_int8 = gq.int8_forward(qm, x)
    agree = (logits_qat.argmax(-1) == logits_int8.argmax(-1)).mean()
    assert agree >= 0.9, f"QAT/int8 prediction agreement {agree}"


def test_finetune_qat_improves_fit():
    """A few QAT steps must run and reduce the fake-quant loss."""
    import optax

    model, params, _ = _setup()
    r = np.random.default_rng(3)
    x = r.standard_normal((512, 2, 128)).astype(np.float32)
    y = r.integers(0, 11, 512)
    scales = calibrate_activations(model, params, x[:64])

    def loss_of(p):
        logits = qat.qat_apply(p, jnp.asarray(x[:256]), scales)
        return float(
            optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y[:256])
            ).mean()
        )

    before = loss_of(params)
    tuned = qat.finetune_qat(
        params, scales, x, y, num_steps=30, batch_size=128,
        learning_rate=1e-3, dropout_rate=0.0,
    )
    after = loss_of(tuned)
    assert after < before, (before, after)
    # tree structure unchanged -> PTQ exporter accepts it
    qm2 = quantize(model, tuned, x[:64])
    assert qm2.w1p.shape == (3, 256)
