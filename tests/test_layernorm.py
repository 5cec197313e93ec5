"""Fused Pallas LayerNorm (ops/layernorm.py): parity with the jnp
fp32-stats form across dtypes, block shapes, and the fallback path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.models.vision_encoder import _layernorm
from cogstream_tpu.ops.layernorm import pallas_layernorm

EPS = 1e-6


def _ref(x, scale, bias):
    return _layernorm(x, {"scale": scale, "bias": bias}, EPS)


@pytest.mark.parametrize("n,h,dtype", [
    (256, 1152, jnp.bfloat16),   # vision-tower shape (9x128 lanes)
    (1024, 256, jnp.bfloat16),   # multiple grid steps
    (128, 384, jnp.float32),
])
def test_pallas_layernorm_matches_jnp(n, h, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2.0, (n, h)) + 1.5, dtype)
    scale = jnp.asarray(rng.normal(1, 0.2, (h,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (h,)), jnp.float32)
    got = pallas_layernorm(x, scale, bias, EPS, interpret=True)
    want = _ref(x, scale, bias)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_fallback_on_odd_shapes():
    """Non-128-multiple lanes and tiny rows route to the jnp form."""
    rng = np.random.default_rng(1)
    for shape in [(5, 72), (3, 1152)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        scale = jnp.ones((shape[1],), jnp.float32)
        bias = jnp.zeros((shape[1],), jnp.float32)
        got = pallas_layernorm(x, scale, bias, EPS, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(x, scale, bias)),
                                   atol=1e-5)


def test_padding_rows_do_not_nan():
    """All-zero (padded) rows must produce finite output — rsqrt(eps)
    keeps them bounded, as the encoder relies on before slicing pads."""
    x = jnp.zeros((128, 256), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = pallas_layernorm(x, scale, bias, EPS, interpret=True)
    assert np.isfinite(np.asarray(got, np.float32)).all()
