"""Shape/init/structure tests for the model families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.config import TVAEConfig, VAEConfig
from vqgan_tpu.models.ae import VAE, init_vae_params
from vqgan_tpu.models.tae import TVAE

TINY = dict(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8)


def _fwd(cfg, x_shape):
    model, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), x_shape)
    dec, z = model.apply(
        {"params": params}, x, rngs={"sample": jax.random.PRNGKey(2)}
    )
    return dec, z, params


def test_vae_shapes():
    cfg = VAEConfig(**TINY)
    dec, z, _ = _fwd(cfg, (2, 32, 32, 3))
    assert z.shape == (2, 16, 16, 8)  # ffactor 2 for 2 levels
    assert dec.shape == (2, 32, 32, 3)


def test_vae_hr_decoder_doubles_resolution():
    cfg = VAEConfig(**TINY, decoder_also_perform_hr=True)
    dec, z, _ = _fwd(cfg, (2, 32, 32, 3))
    assert z.shape == (2, 16, 16, 8)
    assert dec.shape == (2, 64, 64, 3)  # extra upsample level (ae.py:381)


def test_vae_wavelet_shapes():
    cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2, 4), num_res_blocks=1, z_channels=8,
        use_wavelet=True,
    )
    dec, z, params = _fwd(cfg, (2, 32, 32, 3))
    # wavelet halves resolution up-front but skips the level-0 downsample:
    # same total ffactor as the non-wavelet 3-level model
    assert z.shape == (2, 8, 8, 8)
    # conv_in consumes 4*in_ch and emits 2*ch (ae.py:191-194)
    k = params["encoder"]["conv_in"]["kernel"]
    assert k.shape == (3, 3, 12, 64)


def test_vae_gaussian_reg_double_z():
    cfg = VAEConfig(**TINY, reg_type="gaussian")
    dec, z, _ = _fwd(cfg, (2, 32, 32, 3))
    assert z.shape == (2, 16, 16, 16)  # 2*z_channels
    assert dec.shape == (2, 32, 32, 3)


def test_vae_vq_reg():
    cfg = VAEConfig(**TINY, reg_type="vq", vq_codebook_size=64, vq_ema_decay=0.0)
    model = VAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}, x
    )
    dec, z = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert dec.shape == (2, 32, 32, 3)
    zq, aux = model.apply(variables, z, method=VAE.regularize)
    assert zq.shape == z.shape
    assert aux["vq_loss"].shape == ()
    assert float(aux["perplexity"]) > 1.0


def test_init_parity_statistics():
    cfg = VAEConfig(**TINY, use_attn=True)
    _, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    enc = params["encoder"]
    # all conv/GroupNorm biases zero (ae.py:233-237)
    def check_biases(node):
        for k, v in node.items():
            if isinstance(v, dict):
                check_biases(v)
            elif k == "bias":
                assert float(jnp.abs(v).max()) == 0.0

    check_biases(enc)
    check_biases(params["decoder"])
    # near-zero conv2 (ae.py:120-121)
    c2 = enc["down_0"]["block_0"]["conv2"]["kernel"]
    assert float(jnp.abs(c2).max()) < 1e-4
    # torch-default conv_in kernel: U(±1/sqrt(fan_in)) → std ≈ 1/sqrt(3·27)
    k = enc["conv_in"]["kernel"]
    expected_std = 1.0 / np.sqrt(3.0 * 27.0)
    assert abs(float(k.std()) - expected_std) / expected_std < 0.2
    # attn proj_out std = 0.2/sqrt(c) (ae.py:72)
    pk = enc["mid_attn_1"]["proj_out"]["kernel"]
    c = pk.shape[-1]
    assert abs(float(pk.std()) - 0.2 / np.sqrt(c)) / (0.2 / np.sqrt(c)) < 0.2


def test_tvae_shapes():
    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    model = TVAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}, x
    )
    dec, z = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert z.shape == (1, 2, 8, 8, 16)  # 2*z_channels, T/2, H/2, W/2
    assert dec.shape == (1, 4, 16, 16, 3)


def test_vae_remat_policies_match_plain():
    """2D family: remat (both residual policies) is a pure transform —
    identical loss and gradients vs the plain model."""
    import dataclasses

    cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    plain = VAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    params = plain.init(rngs, x)["params"]

    def loss(model, p):
        dec, z = model.apply(
            {"params": p}, x, rngs={"sample": jax.random.PRNGKey(2)}
        )
        return jnp.mean(dec.astype(jnp.float32) ** 2) + jnp.mean(
            z.astype(jnp.float32) ** 2
        )

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    for policy in ("full", "conv"):
        m = VAE(cfg=dataclasses.replace(cfg, remat=True, remat_policy=policy))
        l1, g1 = jax.value_and_grad(lambda p: loss(m, p))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


def test_tvae_remat_matches_plain():
    """remat=True is a pure memory/HBM-traffic transform: identical params
    tree, identical forward, identical gradients."""
    import dataclasses

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    plain = TVAE(cfg=cfg)
    remat = TVAE(cfg=dataclasses.replace(cfg, remat=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    params = plain.init(rngs, x)["params"]
    # same params tree structure (remat is transparent to checkpoints)
    params_r = remat.init(rngs, x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_r
    )

    def loss(model, p):
        dec, z = model.apply(
            {"params": p}, x, rngs={"sample": jax.random.PRNGKey(2)}
        )
        return jnp.mean(dec.astype(jnp.float32) ** 2) + jnp.mean(
            z.astype(jnp.float32) ** 2
        )

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # the "conv" residual policy (save conv outputs, recompute elementwise)
    # is the same pure transform: identical loss and gradients
    remat_conv = TVAE(
        cfg=dataclasses.replace(cfg, remat=True, remat_policy="conv")
    )
    l2, g2 = jax.value_and_grad(lambda p: loss(remat_conv, p))(params)
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_encoder_decoder_separate_apply():
    cfg = VAEConfig(**TINY)
    model, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z = model.apply({"params": params}, x, method=VAE.encode)
    dec = model.apply({"params": params}, z, method=VAE.decode)
    full_dec, full_z = model.apply(
        {"params": params}, x, rngs={"sample": jax.random.PRNGKey(2)}
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(full_z), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dec, np.float32), np.asarray(full_dec, np.float32), rtol=1e-2,
        atol=1e-2,
    )


def test_tvae_ring_attention_matches_dense(eight_devices):
    """TVAE with the T dim sharded over a context axis and ring attention in
    the mid blocks reproduces the dense forward bit-for-bit-ish; param trees
    are identical, so checkpoints interchange freely."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.models.tae import TVAE

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "context"))
    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
        compute_dtype="float32",
    )
    dense = TVAE(cfg=cfg)
    ring = TVAE(cfg=cfg, mesh=mesh, ring_axis="context")
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 16, 16, 3).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    params = dense.init(rngs, x)["params"]
    d1, z1 = dense.apply({"params": params}, x, rngs={"sample": jax.random.PRNGKey(3)})
    with mesh:
        xb = jax.device_put(x, NamedSharding(mesh, P("data", "context")))
        d2, z2 = jax.jit(
            lambda p, xx: ring.apply(
                {"params": p}, xx, rngs={"sample": jax.random.PRNGKey(3)}
            )
        )(params, xb)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=3e-4)


def test_tvae_attn_chunk_matches_dense():
    """attn_chunk is numerics-transparent: same params tree, same forward
    as the dense mid-block attention."""
    import dataclasses

    cfg = TVAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    dense = TVAE(cfg=cfg)
    chunked = TVAE(cfg=dataclasses.replace(cfg, attn_chunk=256))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    params = dense.init(rngs, x)["params"]
    # mid-block tokens: (4/2)·16·16 = 512, chunk 256 → 2 chunks
    z_d = dense.apply({"params": params}, x, method=dense.encode)
    z_c = chunked.apply({"params": params}, x, method=chunked.encode)
    np.testing.assert_allclose(
        np.asarray(z_c), np.asarray(z_d), rtol=2e-5, atol=2e-5
    )


def test_tvae_attn_chunk_rejects_non_divisor():
    """A non-divisible attn_chunk must error at trace time, not silently
    fall back to the dense path whose score matrix the flag exists to avoid."""
    import dataclasses

    cfg = TVAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", attn_chunk=100,  # 512 tokens % 100 != 0
    )
    model = TVAE(cfg=cfg)
    x = jnp.zeros((1, 4, 32, 32, 3))
    with pytest.raises(ValueError, match="attn_chunk"):
        model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x,
        )


def test_tvae_fused_swish_off_matches_on():
    """fused_gn_swish is a pure perf knob: the unfused norm->silu path
    produces the same forward (same params, fp32) as the fused one."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     z_channels=4, compute_dtype="float32")
    m_on = TVAE(cfg=cfg)
    m_off = TVAE(cfg=dataclasses.replace(cfg, fused_gn_swish=False))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}
    params = m_on.init(rngs, x)["params"]
    z_on = m_on.apply({"params": params}, x, method=m_on.encode)
    z_off = m_off.apply({"params": params}, x, method=m_off.encode)
    np.testing.assert_allclose(
        np.asarray(z_on), np.asarray(z_off), rtol=1e-5, atol=1e-5
    )


def test_vae2d_attn_chunk_matches_dense():
    """2D AttnBlock with attn_chunk: memory-efficient attention matches the
    dense path bit-close (same params) — the 2D counterpart of the TVAE's
    long-clip path, for very-high-resolution use_attn configs."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.config import VAEConfig
    from vqgan_tpu.models.ae import VAE

    cfg = VAEConfig(resolution=64, ch=64, ch_mult=(1, 2), num_res_blocks=1,
                    z_channels=8, use_attn=True, enc_dtype="float32",
                    dec_dtype="float32")
    m_dense = VAE(cfg=cfg)
    # mid tokens = (64/2)^2 = 1024; chunk 256 exercises the chunked path
    m_chunk = VAE(cfg=dataclasses.replace(cfg, attn_chunk=256))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}
    params = m_dense.init(rngs, x)["params"]
    z_d = m_dense.apply({"params": params}, x, method=m_dense.encode)
    z_c = m_chunk.apply({"params": params}, x, method=m_chunk.encode)
    np.testing.assert_allclose(
        np.asarray(z_c), np.asarray(z_d), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("impl", ["tap2d", "tap2dfat"])
def test_tvae_conv3d_tap2d_matches_direct(impl):
    """conv3d_impl="tap2d"/"tap2dfat" (temporal-tap batched 2D convs,
    models/tae.py::Conv3DTap2D{,Fat} + the stride-2 Downsample3D
    counterparts, exercised via ch_mult (1,2)) are the same function as the
    direct Conv3d: identical parameter tree, matching forward and gradients
    (fp32, up to summation order)."""
    import dataclasses

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    direct = TVAE(cfg=cfg)
    tap = TVAE(cfg=dataclasses.replace(cfg, conv3d_impl=impl))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    p_direct = direct.init(rngs, x)["params"]
    p_tap = tap.init(rngs, x)["params"]
    assert jax.tree_util.tree_structure(p_direct) == jax.tree_util.tree_structure(p_tap)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_direct), jax.tree_util.tree_leaves(p_tap)
    ):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, p):
        dec, z = model.apply(
            {"params": p}, x, rngs={"sample": jax.random.PRNGKey(2)}
        )
        return jnp.mean(dec.astype(jnp.float32) ** 2) + jnp.mean(
            z.astype(jnp.float32) ** 2
        )

    l0, g0 = jax.value_and_grad(lambda p: loss(direct, p))(p_direct)
    l1, g1 = jax.value_and_grad(lambda p: loss(tap, p))(p_direct)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("impl", ["fused", "dilated"])
def test_vae_fused_upsample_matches_direct(impl):
    """upsample_impl="fused" (subpixel phase convs) and "dilated"
    (lhs-dilated transposed-conv lowering, the round-4 TPU auto default) are
    the same function as the direct nearest-2x + conv3x3 decoder Upsample:
    identical parameter tree, matching forward and gradients."""
    import dataclasses

    cfg = VAEConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                    z_channels=8, enc_dtype="float32", dec_dtype="float32")
    direct = VAE(cfg=cfg)
    fused = VAE(cfg=dataclasses.replace(cfg, upsample_impl=impl))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}
    p0 = direct.init(rngs, x)["params"]
    p1 = fused.init(rngs, x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert a.shape == b.shape

    def loss(model, p):
        dec, z = model.apply({"params": p}, x)
        return jnp.mean(dec.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(direct, p))(p0)
    l1, g1 = jax.value_and_grad(lambda p: loss(fused, p))(p0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("impl", ["fused", "dilated"])
def test_tvae_fused_upsample_matches_direct(impl):
    """3D upsample_impl="fused"/"dilated" (tae.py::SubpixelUpConv3D)
    matches the direct nearest-2x-3D + Conv3d decoder path: same parameter
    tree, forward, and gradients."""
    import dataclasses

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    direct = TVAE(cfg=cfg)
    fused = TVAE(cfg=dataclasses.replace(cfg, upsample_impl=impl))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}
    p0 = direct.init(rngs, x)["params"]
    p1 = fused.init(rngs, x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)

    def loss(model, p):
        dec, z = model.apply(
            {"params": p}, x, rngs={"sample": jax.random.PRNGKey(2)}
        )
        return jnp.mean(dec.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(direct, p))(p0)
    l1, g1 = jax.value_and_grad(lambda p: loss(fused, p))(p0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
