"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.ops.normalization import group_norm_fp32
from vqgan_tpu.ops.pallas.groupnorm import fused_group_norm


@pytest.mark.parametrize("c,g", [(64, 32), (256, 32), (128, 16)])
def test_fused_groupnorm_matches_reference(c, g):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    ref = group_norm_fp32(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), g)
    got = fused_group_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), g, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_groupnorm_swish():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 64).astype(np.float32)
    scale = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)
    ref = group_norm_fp32(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32)
    ref = ref * jax.nn.sigmoid(ref)
    got = fused_group_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32,
        with_swish=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_groupnorm_bf16_io():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    out = fused_group_norm(x, scale, bias, 32, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = group_norm_fp32(x, scale, bias, 32)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


def test_fused_groupnorm_odd_spatial():
    # spatial not a power of two: tile picker must still divide it
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 10, 64).astype(np.float32))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    out = fused_group_norm(x, scale, bias, 32, interpret=True)
    ref = group_norm_fp32(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_blocks_pallas_flag_consistency():
    """FP32GroupNorm(use_pallas) must match the plain path."""
    from vqgan_tpu.models.blocks import FP32GroupNorm

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 4, 4, 64).astype(np.float32))
    plain = FP32GroupNorm(fused_swish=True, use_pallas=False)
    fused = FP32GroupNorm(fused_swish=True, use_pallas=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y1 = plain.apply(params, x)
    y2 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-6)
