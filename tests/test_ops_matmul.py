"""Pallas matmul kernel vs jnp reference (interpret mode on CPU, §4b)."""
import jax.numpy as jnp
import numpy as np
import pytest

from modulationdetectioncnn_tpu.ops.matmul import matmul


@pytest.mark.parametrize(
    "m,k,n",
    [(128, 512, 128), (256, 1536, 80), (32, 9920, 256), (100, 130, 50), (8, 256, 11)],
)
def test_matmul_f32(m, k, n):
    r = np.random.default_rng(0)
    a = r.standard_normal((m, k)).astype(np.float32)
    b = r.standard_normal((k, n)).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), interpret=True))
    want = a @ b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_matmul_bias_relu():
    r = np.random.default_rng(1)
    a = r.standard_normal((64, 300)).astype(np.float32)
    b = r.standard_normal((300, 70)).astype(np.float32)
    bias = r.standard_normal(70).astype(np.float32)
    got = np.asarray(
        matmul(jnp.asarray(a), jnp.asarray(b), jnp.asarray(bias), relu=True,
               interpret=True)
    )
    want = np.maximum(a @ b + bias, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_matmul_int8_exact():
    r = np.random.default_rng(2)
    a = r.integers(-127, 128, (96, 700), dtype=np.int8)
    b = r.integers(-127, 128, (700, 150), dtype=np.int8)
    bias = r.integers(-1000, 1000, 150, dtype=np.int32)
    got = np.asarray(
        matmul(jnp.asarray(a), jnp.asarray(b), jnp.asarray(bias), interpret=True)
    )
    want = a.astype(np.int32) @ b.astype(np.int32) + bias
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32


def test_matmul_bf16():
    r = np.random.default_rng(3)
    a = r.standard_normal((128, 512)).astype(np.float32)
    b = r.standard_normal((512, 128)).astype(np.float32)
    got = np.asarray(
        matmul(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
               out_dtype=jnp.float32, interpret=True)
    )
    # Reference with the same bf16 input quantization, f64 accumulation:
    # the kernel's fp32 accumulate should then agree to ~1e-5.
    a16 = np.asarray(jnp.asarray(a, jnp.bfloat16).astype(jnp.float64))
    b16 = np.asarray(jnp.asarray(b, jnp.bfloat16).astype(jnp.float64))
    want = a16 @ b16
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0)) < 1e-4
