"""Inference pipeline tests."""

import numpy as np

import jax

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.inference import VAEPipeline
from vqgan_tpu.models.ae import init_vae_params
from vqgan_tpu.train.checkpoint import save_weights_torch

TINY = dict(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    enc_dtype="float32", dec_dtype="float32",
)


def test_pipeline_roundtrip(tmp_path):
    cfg = VAEConfig(**TINY)
    _, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "w.pt")
    save_weights_torch(jax.device_get(params), path)

    pipe = VAEPipeline.from_checkpoint(path, cfg)
    imgs = (np.random.RandomState(0).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    z = pipe.encode(imgs)
    assert z.shape == (2, 16, 16, 8)
    assert float(abs(np.asarray(z)).max()) <= 8.0  # clamp
    recon = pipe.decode(z)
    assert recon.shape == (2, 32, 32, 3)
    assert recon.min() >= 0.0 and recon.max() <= 1.0
    full = pipe.reconstruct(imgs)
    np.testing.assert_allclose(full, recon, atol=1e-5)


def test_pipeline_single_image_and_float_input(tmp_path):
    cfg = VAEConfig(**TINY)
    _, params = init_vae_params(cfg, jax.random.PRNGKey(1))
    pipe = VAEPipeline(cfg, params)
    img = np.random.RandomState(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    z = pipe.encode(img)
    assert z.shape == (1, 16, 16, 8)


def test_pipeline_gaussian_reg_takes_mean(tmp_path):
    cfg = VAEConfig(**TINY, reg_type="gaussian")
    _, params = init_vae_params(cfg, jax.random.PRNGKey(2))
    pipe = VAEPipeline(cfg, params)
    imgs = (np.random.RandomState(2).rand(1, 32, 32, 3) * 255).astype(np.uint8)
    z = pipe.encode(imgs)
    assert z.shape == (1, 16, 16, 8)  # mean half of 2*z_channels
    recon = pipe.decode(z)
    assert recon.shape == (1, 32, 32, 3)


def test_pipeline_vq_quantizes(tmp_path):
    """VQ pipeline: encode returns nearest-code embeddings (every latent
    vector is a codebook row)."""
    from vqgan_tpu.models.ae import VAE

    cfg = VAEConfig(**TINY, reg_type="vq", vq_codebook_size=32)
    model = VAE(cfg=cfg)
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(5)
    variables = model.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 32, 32, 3))
    )
    pipe = VAEPipeline(cfg, variables["params"], vq_ema=variables["vq_ema"])
    imgs = (np.random.RandomState(5).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    z = np.asarray(pipe.encode(imgs))
    codebook = np.asarray(variables["params"]["reg"]["codebook"])
    dists = ((z.reshape(-1, 8)[:, None, :] - codebook[None]) ** 2).sum(-1)
    assert float(dists.min(axis=1).max()) < 1e-9
    # missing vq_ema is a clear error, not a crash at apply time
    import pytest

    with pytest.raises(ValueError, match="vq_ema"):
        VAEPipeline(cfg, variables["params"])
    # serving a VQ checkpoint under a non-vq config must fail loudly, not
    # silently skip quantization
    with pytest.raises(ValueError, match="codebook"):
        VAEPipeline(VAEConfig(**TINY), variables["params"])


def test_tvae_pipeline_matches_export(tmp_path):
    """TVAEPipeline (checkpoint-based video inference) matches the exported
    artifact's deterministic encode/decode on identical params."""
    import jax.numpy as jnp

    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.export import ExportedTVAE, export_tvae
    from vqgan_tpu.inference import TVAEPipeline
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    model = TVAE(cfg=cfg)
    rng = jax.random.PRNGKey(7)
    params = model.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 4, 16, 16, 3))
    )["params"]
    pipe = TVAEPipeline(cfg, params)
    clips = (np.random.RandomState(7).rand(2, 4, 16, 16, 3) * 255).astype(
        np.uint8
    )
    recon_pipe = pipe.reconstruct(clips)
    assert recon_pipe.shape == (2, 4, 16, 16, 3)
    export_tvae(cfg, params, str(tmp_path), frames=4, platforms=("cpu",))
    recon_art = ExportedTVAE.load(str(tmp_path)).reconstruct(clips)
    np.testing.assert_allclose(recon_pipe, recon_art, atol=1e-5)
    # single-clip (T,H,W,3) input is auto-batched
    one = pipe.reconstruct(clips[0])
    np.testing.assert_allclose(one[0], recon_pipe[0], atol=1e-6)


def test_tvae_pipeline_vq_ema(tmp_path):
    """TVAEPipeline with an EMA-codebook VQ model: requires the vq_ema
    collection (clear error without it), quantizes identically to the
    decay-0 module with the same codebook."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.inference import TVAEPipeline
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.9,
    )
    model = TVAE(cfg=cfg)
    rng = jax.random.PRNGKey(11)
    variables = model.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 4, 16, 16, 3))
    )
    with pytest.raises(ValueError, match="vq_ema"):
        TVAEPipeline(cfg, variables["params"])
    pipe = TVAEPipeline(
        cfg, variables["params"], vq_ema=variables["vq_ema"]
    )
    clips = (np.random.RandomState(11).rand(1, 4, 16, 16, 3) * 255).astype(
        np.uint8
    )
    z = pipe.encode(clips)
    codebook = np.asarray(variables["params"]["reg"]["codebook"])
    dists = (
        (np.asarray(z).reshape(-1, 8)[:, None, :] - codebook[None]) ** 2
    ).sum(-1)
    assert float(dists.min(axis=1).max()) < 1e-9  # every vector is a code
    # decay-0 module with the same weights quantizes identically
    pipe0 = TVAEPipeline(
        dataclasses.replace(cfg, vq_ema_decay=0.0), variables["params"]
    )
    np.testing.assert_allclose(
        np.asarray(pipe0.encode(clips)), np.asarray(z), atol=2e-5
    )
