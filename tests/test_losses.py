"""Loss-function unit tests with torch-side golden values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.losses.gan import (
    disc_accuracy,
    gan_disc_loss,
    generator_gan_loss,
    lecam_penalty,
    update_lecam_anchors,
)
from vqgan_tpu.losses.lpips import LPIPS
from vqgan_tpu.losses.recon import vae_loss_function
from vqgan_tpu.losses.discriminator import PatchDiscriminator

torch = pytest.importorskip("torch")


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_gan_disc_loss_bce_golden():
    real, fake = _rand((4, 16), 1), _rand((4, 16), 2)
    loss, m = gan_disc_loss(jnp.asarray(real), jnp.asarray(fake), "bce")
    tr, tf = torch.from_numpy(real), torch.from_numpy(fake)
    t_loss = 0.5 * (
        torch.nn.functional.binary_cross_entropy_with_logits(tr, torch.ones_like(tr))
        + torch.nn.functional.binary_cross_entropy_with_logits(tf, torch.zeros_like(tf))
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)
    acc_expected = ((real > 0).sum() + (fake < 0).sum()) / (real.size + fake.size)
    np.testing.assert_allclose(float(m["disc_acc"]), acc_expected, rtol=1e-6)


def test_gan_disc_loss_hinge_golden():
    real, fake = _rand((4, 16), 3), _rand((4, 16), 4)
    loss, _ = gan_disc_loss(jnp.asarray(real), jnp.asarray(fake), "hinge")
    t_loss = 0.5 * (
        torch.relu(1 - torch.from_numpy(real)).mean()
        + torch.relu(1 + torch.from_numpy(fake)).mean()
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_generator_gan_loss():
    fake = _rand((4, 16), 5)
    tf = torch.from_numpy(fake)
    np.testing.assert_allclose(
        float(generator_gan_loss(jnp.asarray(fake), "bce")),
        float(
            torch.nn.functional.binary_cross_entropy_with_logits(
                tf, torch.ones_like(tf)
            )
        ),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(generator_gan_loss(jnp.asarray(fake), "hinge")),
        -fake.mean(),
        rtol=1e-5,
    )


def test_lecam():
    real, fake = _rand((4, 8), 6), _rand((4, 8), 7)
    ar, af = update_lecam_anchors(
        jnp.zeros(()), jnp.zeros(()), jnp.asarray(real.mean()), jnp.asarray(fake.mean()),
        beta=0.9,
    )
    np.testing.assert_allclose(float(ar), 0.1 * real.mean(), rtol=1e-5)
    pen = lecam_penalty(jnp.asarray(real), jnp.asarray(fake), ar, af)
    expected = ((real - float(af)) ** 2).mean() + ((fake - float(ar)) ** 2).mean()
    np.testing.assert_allclose(float(pen), expected, rtol=1e-5)


def test_vae_loss_reference_weights():
    """Default weights reproduce the reference's recon·0.0 + 0.1·mean(z²)
    (vae_trainer.py:209)."""
    x = jnp.asarray(_rand((2, 32, 32, 3), 8))
    xr = jnp.asarray(_rand((2, 32, 32, 3), 9))
    z = jnp.asarray(_rand((2, 4, 4, 8), 10))
    loss, m = vae_loss_function(x, xr, z)
    np.testing.assert_allclose(float(loss), 0.1 * float(jnp.mean(z**2)), rtol=1e-6)
    assert float(m["recon_loss"]) == 0.0


def test_vae_loss_pooled_recon():
    x = jnp.asarray(_rand((2, 32, 32, 3), 11))
    xr = jnp.asarray(_rand((2, 32, 32, 3), 12))
    z = jnp.zeros((2, 4, 4, 8))
    loss, m = vae_loss_function(x, xr, z, do_pool=True, recon_weight=1.0, z_reg_weight=0.0)
    tx = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    txr = torch.from_numpy(np.asarray(xr).transpose(0, 3, 1, 2))
    t_recon = (
        torch.nn.functional.interpolate(txr, scale_factor=1 / 16, mode="area")
        - torch.nn.functional.interpolate(tx, scale_factor=1 / 16, mode="area")
    ).abs().mean()
    np.testing.assert_allclose(float(loss), float(t_recon), rtol=1e-5)


def test_lpips_zero_for_identical_and_symmetryish():
    lp = LPIPS()
    x = jnp.asarray(_rand((2, 32, 32, 3), 13))
    y = jnp.asarray(_rand((2, 32, 32, 3), 14))
    params = lp.init(jax.random.PRNGKey(0), x, x)["params"]
    d_xx = lp.apply({"params": params}, x, x)
    assert float(jnp.abs(d_xx).max()) < 1e-10
    d_xy = lp.apply({"params": params}, x, y)
    d_yx = lp.apply({"params": params}, y, x)
    np.testing.assert_allclose(np.asarray(d_xy), np.asarray(d_yx), rtol=1e-4)
    assert float(d_xy.min()) > 0


def test_lpips_split_passes_match_concat_and_keep_target_grad():
    """The split-VGG-pass form (target backward prunable) must equal the
    batched concat form value-for-value, and grad w.r.t. the TARGET must
    still be available when a caller differentiates it (the split is a
    backward-pruning enabler, not a stop_gradient)."""
    from vqgan_tpu.losses.vgg import VGG16Features

    lp = LPIPS()
    x = jnp.asarray(_rand((2, 32, 32, 3), 23))
    y = jnp.asarray(_rand((2, 32, 32, 3), 24))
    params = lp.init(jax.random.PRNGKey(0), x, x)["params"]
    shift = jnp.array([-0.030, -0.088, -0.188])
    scale = jnp.array([0.458, 0.448, 0.450])

    def concat_form(x_, y_):
        b = x_.shape[0]
        scaled = (jnp.concatenate([x_, y_], axis=0) - shift) / scale
        taps = VGG16Features().apply({"params": params["vgg"]}, scaled)
        total = None
        for k, tap in enumerate(taps):
            f = tap.astype(jnp.float32)
            f = f / (jnp.sqrt(jnp.sum(f * f, -1, keepdims=True)) + 1e-10)
            d = jnp.square(f[:b] - f[b:])
            v = jnp.einsum("bhwc,c->bhw", d, params[f"lin_{k}"]).mean((1, 2))
            total = v if total is None else total + v
        return total[:, None]

    got = lp.apply({"params": params}, x, y)
    ref = concat_form(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)

    gy = jax.grad(lambda y_: lp.apply({"params": params}, x, y_).sum())(y)
    gy_ref = jax.grad(lambda y_: concat_form(x, y_).sum())(y)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), rtol=5e-4,
                               atol=1e-7)


def test_discriminator_patch_count_matches_reference():
    """Every head must land on the same patch grid so the sum is aligned:
    16×16=256 patches at 256² input, 32×32=1024 at 512² (utils.py:195)."""
    disc = PatchDiscriminator()
    for res, n in ((256, 256), (128, 64)):
        x = jnp.zeros((1, res, res, 3))
        params = disc.init(jax.random.PRNGKey(0), x)["params"]
        out = disc.apply({"params": params}, x)
        assert out.shape == (1, n)


def test_lpips_torch_conversion_shapes():
    """convert_torch_lpips maps a synthetic vgg.pth-style state_dict."""
    from vqgan_tpu.losses.lpips import convert_torch_lpips
    from vqgan_tpu.losses.vgg import TORCHVISION_CONV_INDICES, VGG16_LAYOUT

    sd = {}
    cin = 3
    convs = [c for c in VGG16_LAYOUT if c != "M"]
    for idx, cout in zip(TORCHVISION_CONV_INDICES, convs):
        sd[f"net.slice1.{idx}.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"net.slice1.{idx}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    for k, c in enumerate((64, 128, 256, 512, 512)):
        sd[f"lin{k}.model.1.weight"] = np.full((1, c, 1, 1), 0.5, np.float32)
    params = convert_torch_lpips(sd)
    assert params["vgg"]["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["lin_4"].shape == (512,)
    np.testing.assert_allclose(params["lin_0"], 0.5)


def test_psnr_ssim_properties():
    """PSNR/SSIM eval metrics: identity, known PSNR value, monotone SSIM."""
    from vqgan_tpu.losses.metrics import psnr, ssim

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    # identical images: PSNR capped by the 1e-12 floor, SSIM exactly ~1
    assert float(psnr(a, a)) > 100.0
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    # known value: uniform squared error eps^2 -> PSNR = -20 log10(eps)
    eps = 0.1
    b = jnp.clip(a + eps, 0, 1)
    mse = float(jnp.mean((a - b) ** 2))
    np.testing.assert_allclose(float(psnr(a, b)), -10 * np.log10(mse), rtol=1e-5)
    # more noise -> lower SSIM, and strictly below identity
    n1 = jnp.clip(a + 0.05 * jnp.asarray(rng.randn(*a.shape)), 0, 1)
    n2 = jnp.clip(a + 0.20 * jnp.asarray(rng.randn(*a.shape)), 0, 1)
    s1, s2 = float(ssim(a, n1)), float(ssim(a, n2))
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_blur_precision_is_highest():
    """The SSIM window convs MUST request Precision.HIGHEST: the TPU's
    DEFAULT conv precision is bf16, and the ``blur(a*a) - mu**2`` variance
    cancellation then yields negative variances bigger than the c2
    stabilizer — the SSIM map escapes [-1, 1] (observed 4.5/-2.4 on a
    flagship hardware run). Pin the precision in the lowered jaxpr so a
    refactor can't silently drop it; the CPU test backend can't reproduce
    the numeric blowup itself."""
    from vqgan_tpu.losses.metrics import ssim

    a = jnp.zeros((1, 16, 16, 3), jnp.float32)
    jaxpr = str(jax.make_jaxpr(ssim)(a, a))
    n_conv = jaxpr.count("conv_general_dilated")
    assert n_conv >= 5  # mu_a, mu_b, a*a, b*b, a*b
    assert jaxpr.count("HIGHEST") >= n_conv


def test_ssim_bounded_under_variance_cancellation():
    """Flat bright patches maximize the mu^2-vs-blur(a*a) cancellation; the
    clamped variances must keep SSIM within its mathematical range."""
    from vqgan_tpu.losses.metrics import ssim

    rng = np.random.RandomState(3)
    a = np.full((2, 32, 32, 3), 0.997, np.float32)
    b = np.clip(a + 1e-3 * rng.randn(*a.shape).astype(np.float32), 0, 1)
    s = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= s <= 1.0


def test_ssim_matches_skimage_if_available():
    from vqgan_tpu.losses.metrics import ssim

    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        import pytest

        pytest.skip("skimage not in image")
    rng = np.random.RandomState(1)
    a = rng.rand(48, 48, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(48, 48, 3).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))
    ref = structural_similarity(
        a, b, channel_axis=-1, data_range=1.0, gaussian_weights=True,
        sigma=1.5, use_sample_covariance=False,
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_fetch_lpips_npz_end_to_end(tmp_path, monkeypatch):
    """tools/fetch_lpips.py's conversion path with a locally generated
    vgg.pth (random weights, reference layout): produces .npz files that
    load through load_lpips_params and load_disc_backbone and change the
    respective param trees — the exact drop-in path for real pretrained
    weights once a machine with egress runs the tool."""
    import sys

    import jax
    import torch

    from tests.reference_compat import (
        import_reference_module,
        install_random_vgg16,
    )

    install_random_vgg16(seed=5)
    monkeypatch.chdir(tmp_path)
    torch.save({}, "vgg.pth")  # reference LPIPS() torch.load()s one (strict=False)
    ref_utils = import_reference_module("utils")
    # reference-layout vgg.pth: the LPIPS module's own state dict (net.slice*
    # + lin heads), exactly what the heibox file contains
    lp = ref_utils.LPIPS()
    torch.save(lp.state_dict(), tmp_path / "vgg.pth")

    sys.path.insert(0, "/root/repo/tools")
    try:
        import fetch_lpips
    finally:
        sys.path.pop(0)

    out = fetch_lpips.fetch_lpips(str(tmp_path))  # vgg.pth exists -> no egress
    from vqgan_tpu.losses.lpips import load_lpips_params

    loaded = load_lpips_params(out, jax.random.PRNGKey(0), image_size=32)
    fresh = load_lpips_params(None, jax.random.PRNGKey(0), image_size=32)
    l0 = jax.tree_util.tree_leaves(loaded)
    f0 = jax.tree_util.tree_leaves(fresh)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(l0, f0)
    ), "converted weights did not replace the fresh init"

    # discriminator backbone: reference-layout torchvision features weights
    from vqgan_tpu.losses.discriminator import load_disc_backbone
    from vqgan_tpu.losses.vgg import convert_torch_vgg16

    tv_features = {
        k[len("net."):]: v for k, v in lp.state_dict().items()
        if k.startswith("net.")
    }
    params = {"vgg": convert_torch_vgg16(tv_features)}
    dst = str(tmp_path / "vgg16_features.npz")
    fetch_lpips._flat_npz(params, dst)
    disc = PatchDiscriminator()
    d0 = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    d1 = load_disc_backbone(d0, dst)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(d0["vgg"]),
            jax.tree_util.tree_leaves(d1["vgg"]),
        )
    )
    # heads keep their fresh init (reference: heads are newly built)
    for head in ("bc1", "bc2", "bc3", "bc4", "bc5"):
        if head in d0:
            for a, b in zip(
                jax.tree_util.tree_leaves(d0[head]),
                jax.tree_util.tree_leaves(d1[head]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tubelet_discriminator_identity_init_equals_frame_disc():
    """TubeletDiscriminator's temporal mixers are identity-initialized, so a
    fresh tubelet disc computes EXACTLY the per-frame PatchDiscriminator on
    each frame (same backbone + head params — the backbone tree is shared
    layout, so --disc_backbone_weights drops in unchanged)."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.losses.discriminator import (
        PatchDiscriminator,
        TubeletDiscriminator,
    )

    b, t, res = 2, 3, 64
    clip = jax.random.uniform(
        jax.random.PRNGKey(0), (b, t, res, res, 3), minval=-1, maxval=1
    )
    tub = TubeletDiscriminator(dtype=jnp.float32)
    p_tub = tub.init(jax.random.PRNGKey(1), clip)["params"]
    # same non-mixer params into the frame disc
    frame = PatchDiscriminator(dtype=jnp.float32)
    p_frame = {k: v for k, v in p_tub.items() if not k.startswith("tmix")}
    out_tub = tub.apply({"params": p_tub}, clip)
    out_frame = frame.apply(
        {"params": p_frame}, clip.reshape(b * t, res, res, 3)
    )
    assert out_tub.shape == (b, out_frame.shape[1] * t)
    np.testing.assert_allclose(
        np.asarray(out_tub),
        np.asarray(out_frame).reshape(b, -1),
        rtol=1e-5, atol=1e-5,
    )
    # the mixers exist and are trainable: at init every head's FINAL conv is
    # zero (reference design), which zeroes all upstream grads — perturb the
    # finals to nonzero first, then the mixers must receive gradient
    p_live = jax.tree_util.tree_map(lambda a: a, p_tub)
    for head in ("bc1_conv1", "bc2_conv1", "bc3_conv1", "bc4_conv0", "bc5_conv0"):
        p_live[head] = dict(
            p_live[head],
            kernel=jnp.full_like(p_live[head]["kernel"], 0.01),
        )

    def loss(p):
        return jnp.sum(tub.apply({"params": p}, clip) ** 2)

    g = jax.grad(loss)(p_live)
    gmix = sum(
        float(jnp.abs(l).sum())
        for k, v in g.items() if k.startswith("tmix")
        for l in jax.tree_util.tree_leaves(v)
    )
    assert gmix > 0.0
