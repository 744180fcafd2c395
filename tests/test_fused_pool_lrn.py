"""Parity for the fused bias+relu+pool+LRN Pallas experiment
(ops/fused_pool_lrn.py — measured-negative on v5e, kept pinned so the
kernel stays correct if revisited on other hardware).

The Pallas path runs under the interpreter on the CPU test backend; the
reference path is the plain jnp chain with identical f32-internal math.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from svision_tpu.ops import fused_pool_lrn as F
from svision_tpu.models.alexnet import _maxpool, lrn


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)


@pytest.mark.parametrize("h,c", [(55, 96), (27, 256)])
def test_kernel_matches_reference(h, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, h, h, c).astype(np.float32) * 2,
                    jnp.bfloat16)
    b = jnp.asarray(rng.randn(c).astype(np.float32), jnp.bfloat16)
    got = np.float32(F.bias_relu_pool_lrn(x, b, use_pallas=True))
    want = np.float32(F._reference(x, b))
    assert got.shape == (3, (h - 3) // 2 + 1, (h - 3) // 2 + 1, c)
    np.testing.assert_array_equal(got, want)


def test_reference_matches_model_chain():
    """The experiment's reference path agrees with the production
    relu->maxpool->lrn chain (f32, where orders coincide exactly up to
    the windowed-sum association)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 27, 27, 96).astype(np.float32))
    b = jnp.asarray(rng.randn(96).astype(np.float32))
    got = np.asarray(F._reference(x, b))
    want = np.asarray(lrn(_maxpool(jnp.maximum(x + b, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
