"""The product stream path runs the benched int8 Pallas kernel
(VERDICT r4 next #4): ``_make_predictor`` prefers the int8 deployment
artifact, invokes ``make_int8_predict`` (interpret mode off-TPU), and its
labels bit-match the golden int8 chain; without an artifact it falls back
to float with a loud warning."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulationdetectioncnn_tpu.config import AmcConfig
from modulationdetectioncnn_tpu.dsp import pipeline
from modulationdetectioncnn_tpu.golden import quant as gq
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.train.quant import quantize
from modulationdetectioncnn_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def qm():
    model = VTCNN2(dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 128)))
    calib = np.random.default_rng(8).standard_normal((64, 2, 128)).astype(
        np.float32
    )
    return quantize(model, params, calib)


def test_stream_predictor_invokes_int8_pallas_kernel(qm, tmp_path, monkeypatch):
    art = str(tmp_path / "int8_artifact")
    ckpt.save_tree(art, qm.tree())
    cfg = AmcConfig()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, int8_artifact=art)
    )

    from modulationdetectioncnn_tpu.ops import infer

    calls = {}
    real = infer.make_int8_predict

    def spy(qm_, version, *, interpret=False):
        calls["version"] = version
        calls["interpret"] = interpret
        return real(qm_, version, interpret=interpret)

    monkeypatch.setattr(infer, "make_int8_predict", spy)
    predict, trained = pipeline._make_predictor(cfg, report_trained=True)
    assert trained
    assert calls["version"] == cfg.eval.int8_kernel
    assert calls["interpret"] is True  # CPU backend -> interpret mode

    x = np.random.default_rng(3).standard_normal((8, 2, 128)).astype(
        np.float32
    )
    got = np.asarray(predict(jnp.asarray(x)))
    want = gq.int8_forward(qm, x).argmax(-1)
    np.testing.assert_array_equal(got, want)


def test_stream_predictor_float_fallback_warns(capsys):
    cfg = AmcConfig()  # no artifact, no checkpoint
    predict, trained = pipeline._make_predictor(cfg, report_trained=True)
    assert not trained
    assert "FLOAT XLA forward" in capsys.readouterr().out
    x = np.random.default_rng(3).standard_normal((4, 2, 128)).astype(
        np.float32
    )
    labels = np.asarray(predict(jnp.asarray(x)))
    assert labels.shape == (4,)
