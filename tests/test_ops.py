"""Unit tests for the core ops, with golden values computed by torch-side
reimplementations of the reference's math (wavelet, heatmap, area resize)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.ops.gradnorm import gradnorm
from vqgan_tpu.ops.heatmap import blurriness_heatmap
from vqgan_tpu.ops.normalization import group_norm_fp32
from vqgan_tpu.ops.resize import area_downsample, nearest_upsample_2x
from vqgan_tpu.ops.wavelet import wavelet_transform_multi_channel

torch = pytest.importorskip("torch")


def test_group_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    scale = rng.randn(64).astype(np.float32)
    bias = rng.randn(64).astype(np.float32)
    out = group_norm_fp32(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32)
    t = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        32,
        torch.from_numpy(scale),
        torch.from_numpy(bias),
        1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out), t.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )


def test_group_norm_bf16_fp32_compute():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 32), jnp.bfloat16)
    out = group_norm_fp32(x, jnp.ones((32,)), jnp.zeros((32,)), 32)
    assert out.dtype == jnp.bfloat16


def test_area_downsample_matches_torch():
    x = np.random.RandomState(2).randn(2, 16, 16, 3).astype(np.float32)
    out = area_downsample(jnp.asarray(x), 4)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=0.25, mode="area"
    )
    np.testing.assert_allclose(
        np.asarray(out), t.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6
    )


def test_nearest_upsample_matches_torch():
    x = np.random.RandomState(3).randn(2, 5, 7, 3).astype(np.float32)
    out = nearest_upsample_2x(jnp.asarray(x))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0, mode="nearest"
    )
    np.testing.assert_allclose(np.asarray(out), t.numpy().transpose(0, 2, 3, 1))


def test_wavelet_matches_reference():
    from tests.reference_compat import import_reference_module

    ref_utils = import_reference_module("utils")
    ref_utils.prepare_filter("cpu")
    x = np.random.RandomState(4).randn(2, 3, 16, 16).astype(np.float32)
    ref = ref_utils.wavelet_transform_multi_channel(torch.from_numpy(x)).numpy()
    out = wavelet_transform_multi_channel(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )


def test_blurriness_heatmap_properties():
    # torchvision isn't installed, so golden parity of GaussianBlur isn't
    # testable here; test the documented behavior instead
    # (vae_trainer.py:143-176): range [0,1], threshold zeroing below 0.8,
    # 3-channel broadcast, flat regions ~1 and edges 0.
    rng = np.random.RandomState(5)
    img = np.ones((1, 64, 64, 3), np.float32) * 0.3
    img[:, 20:40, 20:40] = -0.9  # hard edge
    out = np.asarray(blurriness_heatmap(jnp.asarray(img)))
    assert out.shape == (1, 64, 64, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.all((out == 0) | (out >= 0.8))
    assert np.array_equal(out[..., 0], out[..., 1])
    # edge region suppressed relative to flat background
    assert out[0, 30, 20:25].mean() < out[0, 5, 5].mean()


def test_gradnorm_backward():
    x = jnp.asarray(np.random.RandomState(6).randn(4, 8).astype(np.float32))

    def loss(x):
        return jnp.sum(gradnorm(x, 0.5) * 3.0)

    g = jax.grad(loss)(x)
    # incoming cotangent is all-3s; norm = 3*sqrt(32); normalized to 0.5
    expected = 0.5 * 3.0 / (3.0 * np.sqrt(32) + 1e-8)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.linalg.norm(g)), 0.5, rtol=1e-5)


def test_gradnorm_identity_forward():
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(gradnorm(x, 0.123)), np.asarray(x))


def test_ring_attention_matches_dense(eight_devices):
    """Exact full attention with k/v rotating over the mesh ring: forward
    and gradients match jax.nn.dot_product_attention (ops/ring_attention.py)."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    from vqgan_tpu.ops.ring_attention import ring_attention

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("context",))
    rng = np.random.RandomState(0)
    b, n, h, d = 2, 32, 2, 8
    q, k, v = (
        jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)) for _ in range(3)
    )
    ref = jax.nn.dot_product_attention(q, k, v)
    f = jax.jit(
        jax.shard_map(
            functools.partial(ring_attention, axis_name="context"),
            mesh=mesh,
            in_specs=(P(None, "context", None, None),) * 3,
            out_specs=P(None, "context", None, None),
        )
    )
    np.testing.assert_allclose(np.asarray(f(q, k, v)), np.asarray(ref), atol=2e-5)

    co = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))
    g_ref = jax.grad(
        lambda q, k, v: (jax.nn.dot_product_attention(q, k, v) * co).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ring = jax.grad(
        lambda q, k, v: (f(q, k, v) * co).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b_ in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=3e-5)


def test_chunked_attention_matches_dense():
    """Exact chunked (flash-style) attention: forward AND gradients match
    dense SDPA; custom-VJP backward recomputes scores per chunk."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.ops.chunked_attention import chunked_attention

    b, n, h, d = 2, 64, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, n, h, d))
    v = jax.random.normal(ks[2], (b, n, h, d))
    g = jax.random.normal(ks[3], (b, n, h, d))

    def dense(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    for chunk in (16, 32, 64):
        out_c = chunked_attention(q, k, v, chunk)
        out_d = dense(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_d), rtol=2e-5, atol=2e-6
        )
        loss_c = lambda *a: jnp.vdot(chunked_attention(*a, chunk), g)
        loss_d = lambda *a: jnp.vdot(dense(*a), g)
        gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gc, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
            )
    with pytest.raises(ValueError, match="divide"):
        chunked_attention(q, k, v, 48)


def test_flash_attention_pallas_matches_dense():
    """The Pallas TPU flash kernel (interpret mode on CPU): forward and
    gradients match dense SDPA at the TVAE head geometry (head_dim 32)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from vqgan_tpu.ops.flash_attention import flash_attention_tpu

    b, n, h, d = 1, 256, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, n, h, d))
    v = jax.random.normal(ks[2], (b, n, h, d))
    g = jax.random.normal(ks[3], (b, n, h, d))

    out_d = jax.nn.dot_product_attention(q, k, v)
    gd = jax.grad(
        lambda *a: jnp.vdot(jax.nn.dot_product_attention(*a), g),
        argnums=(0, 1, 2),
    )(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out_p = flash_attention_tpu(q, k, v)
        gp = jax.grad(
            lambda *a: jnp.vdot(flash_attention_tpu(*a), g), argnums=(0, 1, 2)
        )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_d), rtol=2e-5, atol=2e-6
    )
    for a, b_ in zip(gp, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


def test_memory_efficient_attention_dispatch():
    """impl="auto" picks lax off-TPU; block-size selection tiles the long-clip
    token count; untileable counts fall back to lax instead of erroring."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.ops import flash_attention as fa

    assert fa.supports_flash(49152)
    bs = fa._block_sizes(49152)
    assert 49152 % bs.block_q == 0 and 49152 % bs.block_k_major == 0
    assert bs.has_backward_blocks
    # 8320 = 65*128: divisible by 128 but not by 256 — picks 128 tiles
    bs_small = fa._block_sizes(8320)
    assert bs_small.block_q == 128
    assert not fa.supports_flash(48)  # not a 128 multiple

    b, n, h, d = 1, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d)) for kk in ks)
    # on the CPU test backend auto must route to the lax path and agree
    out = fa.memory_efficient_attention(q, k, v, 32, impl="auto")
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )
    with pytest.raises(ValueError, match="impl"):
        fa.memory_efficient_attention(q, k, v, 32, impl="cuda")
