"""Pallas fused-tap conv3d parity (interpret mode on CPU) vs the direct XLA
NDHWC Conv3d — forward, both gradients, clip-boundary taps, and the flax
module wiring (conv3d_impl="pallas"). Hardware numerics are covered by the
TPU-gated suite (tests/test_tpu_hw.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.ops.pallas.conv3d import conv3d_ttap


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _data(b=2, t=5, h=8, w=8, ci=16, co=24, seed=0, dtype=jnp.float32):
    kx, kk = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (b, t, h, w, ci), dtype)
    k = (jax.random.normal(kk, (3, 3, 3, ci, co), jnp.float32) * 0.1).astype(
        dtype
    )
    return x, k


def test_forward_matches_direct_fp32():
    x, k = _data()
    ref = _direct(x, k)
    got = conv3d_ttap(x, k, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_forward_matches_direct_bf16():
    x, k = _data(dtype=jnp.bfloat16)
    ref = _direct(x, k).astype(jnp.float32)
    got = conv3d_ttap(x, k, True).astype(jnp.float32)
    # bf16 inputs, fp32 accumulation both sides; the tap-sum order differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_forward_t_boundaries():
    """T=1 and T=2 clips: every output frame misses at least one tap — the
    clamped duplicate fetch must be masked to exact zero-pad semantics."""
    for t in (1, 2, 3):
        x, k = _data(b=1, t=t, h=8, w=8, ci=8, co=8, seed=t)
        np.testing.assert_allclose(
            np.asarray(conv3d_ttap(x, k, True)),
            np.asarray(_direct(x, k)),
            atol=2e-5,
        )


def test_forward_multiband_halo():
    """Forced small band height (n_hb > 1): the spatial halo rows fetched
    through the narrow prev/next specs, and their top/bottom edge masks,
    must reproduce exact SAME zero padding. _pick_bh never splits at test
    shapes, so this pins the blocked path the 128px hardware levels use."""
    from vqgan_tpu.ops.pallas.conv3d import _conv3d_pallas

    for bh in (8, 16):
        x, k = _data(b=1, t=3, h=32, w=8, ci=8, co=8, seed=bh)
        np.testing.assert_allclose(
            np.asarray(_conv3d_pallas(x, k, True, bh=bh)),
            np.asarray(_direct(x, k)),
            atol=2e-5,
        )


def test_forward_fat_k_branch():
    """Lane-aligned ci defaults to the per-dh im2col path (k_group=3, three
    (bh·W, 3·Ci) dots per tap); non-aligned ci falls back to the nine-dot
    path — the 3-channel conv_in hits it because Mosaic rejects the
    (9·Ci, Co) weight shape cast there. Both must match the direct conv."""
    for ci, co in ((64, 8), (64, 64), (3, 8)):
        x, k = _data(b=1, t=3, h=8, w=8, ci=ci, co=co, seed=ci)
        np.testing.assert_allclose(
            np.asarray(conv3d_ttap(x, k, True)),
            np.asarray(_direct(x, k)),
            atol=2e-5,
        )


def test_forward_all_k_group_geometries():
    """Every explicit MXU geometry (k_group 1/3/9) matches the direct conv
    on the same lane-aligned data, including with multi-band halos."""
    from vqgan_tpu.ops.pallas.conv3d import _conv3d_pallas

    x, k = _data(b=1, t=3, h=16, w=8, ci=64, co=32, seed=5)
    ref = np.asarray(_direct(x, k))
    for k_group in (1, 3, 9):
        np.testing.assert_allclose(
            np.asarray(_conv3d_pallas(x, k, True, bh=8, k_group=k_group)),
            ref,
            atol=2e-5,
        )


def test_gradients_match_direct():
    x, k = _data(b=1, t=4, h=8, w=8, ci=8, co=8)
    dy = jax.random.normal(jax.random.PRNGKey(7), x.shape[:-1] + (8,))

    def loss_ref(x_, k_):
        return jnp.vdot(_direct(x_, k_), dy)

    def loss_got(x_, k_):
        return jnp.vdot(conv3d_ttap(x_, k_, True), dy)

    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_got, gk_got = jax.grad(loss_got, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gk_got), np.asarray(gk_ref), atol=2e-5)


def test_module_matches_fat_impl():
    """conv3d_impl='pallas' module output == the tap2dfat module with the
    SAME parameter tensors (checkpoint compatibility contract)."""
    from vqgan_tpu.models.tae import Conv3DTap2DFat, Conv3DTapPallas

    x, _ = _data(b=1, t=4, h=8, w=8, ci=8, co=8)
    m_fat = Conv3DTap2DFat(features=8, dtype=jnp.float32, fan_in=8 * 27)
    m_pal = Conv3DTapPallas(features=8, dtype=jnp.float32, fan_in=8 * 27)
    params = m_fat.init(jax.random.PRNGKey(0), x)
    ref = m_fat.apply(params, x)
    got = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mixed_impl_resolution_and_parity():
    """conv3d_impl='mixed' resolves per channel count (pallas >=128ch,
    tap2dfat below; stride-2 always fat) and its module output matches
    tap2dfat with the SAME parameter tensors at both branch widths."""
    from vqgan_tpu.models.tae import Conv3DTap2DFat, conv3d

    for ci in (8, 128):
        x, _ = _data(b=1, t=3, h=8, w=8, ci=ci, co=ci)
        m_mix = conv3d(ci, 3, jnp.float32, fan_in=ci * 27, impl="mixed")
        m_fat = Conv3DTap2DFat(features=ci, dtype=jnp.float32, fan_in=ci * 27)
        expected = "Conv3DTapPallas" if ci >= 128 else "Conv3DTap2DFat"
        assert type(m_mix).__name__ == expected, (ci, type(m_mix).__name__)
        params = m_fat.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m_mix.apply(params, x)),
            np.asarray(m_fat.apply(params, x)),
            atol=2e-5,
        )


@pytest.mark.parametrize("remat", [False, True])
def test_tvae_forward_with_pallas_impl(remat):
    """Whole-model smoke at tiny shapes: TVAE(conv3d_impl='pallas') ==
    TVAE(direct) with identical params, incl. under the remat 'conv'
    policy the bench runs with."""
    import dataclasses

    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.models.tae import TVAE

    base = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        z_channels=8, compute_dtype="float32", remat=remat,
        remat_policy="conv" if remat else "full",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 3))
    m_ref = TVAE(cfg=dataclasses.replace(base, conv3d_impl="direct"))
    m_pal = TVAE(cfg=dataclasses.replace(base, conv3d_impl="pallas"))
    params = m_ref.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}, x
    )
    ref, _ = m_ref.apply(params, x, rngs={"sample": jax.random.PRNGKey(3)})
    got, _ = m_pal.apply(params, x, rngs={"sample": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-4
    )
