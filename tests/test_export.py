"""Serving-export tests: jax.export artifacts roundtrip and match the
inference pipeline (vqgan_tpu/export.py)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.export import ExportedVAE, export_vae
from vqgan_tpu.inference import VAEPipeline
from vqgan_tpu.models.ae import init_vae_params

TINY = dict(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    enc_dtype="float32", dec_dtype="float32",
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = VAEConfig(**TINY)
    _, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    out = tmp_path_factory.mktemp("artifact")
    export_vae(cfg, params, str(out), platforms=("cpu",))
    return cfg, params, str(out)


def test_exported_matches_pipeline(artifact):
    cfg, params, out = artifact
    pipe = VAEPipeline(cfg, params)
    loaded = ExportedVAE.load(out)
    imgs = (np.random.RandomState(0).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    z_ref = np.asarray(pipe.encode(imgs))
    z_exp = loaded.encode(imgs)
    np.testing.assert_allclose(z_exp, z_ref, atol=1e-5)
    np.testing.assert_allclose(loaded.decode(z_exp), pipe.decode(z_ref), atol=1e-5)


def test_exported_symbolic_batch(artifact):
    _, _, out = artifact
    loaded = ExportedVAE.load(out)
    for b in (1, 3):
        imgs = (np.random.RandomState(b).rand(b, 32, 32, 3) * 255).astype(np.uint8)
        z = loaded.encode(imgs)
        assert z.shape == (b, 16, 16, 8)
        assert float(np.abs(z).max()) <= 8.0  # baked-in clamp
        recon = loaded.decode(z)
        assert recon.shape == (b, 32, 32, 3)
        assert recon.min() >= 0.0 and recon.max() <= 1.0


def test_exported_manifest(artifact):
    cfg, _, out = artifact
    with open(f"{out}/manifest.json") as f:
        m = json.load(f)
    assert m["format"] == "vqgan_tpu.export/v1"
    assert m["vae_config"]["ch"] == cfg.ch
    assert m["encode_input"] == ["b", 32, 32, 3]
    assert m["decode_output"] == ["b", 32, 32, 3]


def test_exported_gaussian_reg_returns_mean(tmp_path):
    cfg = VAEConfig(**TINY, reg_type="gaussian")
    _, params = init_vae_params(cfg, jax.random.PRNGKey(2))
    export_vae(cfg, params, str(tmp_path), platforms=("cpu",))
    loaded = ExportedVAE.load(str(tmp_path))
    imgs = (np.random.RandomState(2).rand(1, 32, 32, 3) * 255).astype(np.uint8)
    z = loaded.encode(imgs)
    assert z.shape == (1, 16, 16, 8)  # mean half of 2*z_channels


def test_export_rejects_pallas_and_missing_vq_ema(tmp_path):
    cfg = VAEConfig(**TINY, use_pallas_gn=True)
    _, params = init_vae_params(VAEConfig(**TINY), jax.random.PRNGKey(3))
    with pytest.raises(ValueError):
        export_vae(cfg, params, str(tmp_path))
    with pytest.raises(ValueError, match="vq_ema"):
        export_vae(VAEConfig(**TINY, reg_type="vq"), params, str(tmp_path))


def test_exported_vq_quantizes(tmp_path):
    """VQ export bakes in nearest-code quantization: every encoded latent
    vector is exactly a codebook row, and decode round-trips."""
    from vqgan_tpu.models.ae import VAE

    cfg = VAEConfig(**TINY, reg_type="vq", vq_codebook_size=32)
    model = VAE(cfg=cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    rng = jax.random.PRNGKey(4)
    variables = model.init({"params": rng, "sample": rng}, x0)
    export_vae(
        cfg, variables["params"], str(tmp_path),
        vq_ema=variables["vq_ema"], platforms=("cpu",),
    )
    loaded = ExportedVAE.load(str(tmp_path))
    assert loaded.manifest["reg_type"] == "vq"
    imgs = (np.random.RandomState(4).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    z = loaded.encode(imgs)
    assert z.shape == (2, 16, 16, 8)
    codebook = np.asarray(variables["params"]["reg"]["codebook"])
    flat = z.reshape(-1, 8)
    dists = ((flat[:, None, :] - codebook[None]) ** 2).sum(-1)
    assert float(dists.min(axis=1).max()) < 1e-9  # every vector is a code
    recon = loaded.decode(z)
    assert recon.shape == (2, 32, 32, 3)


def test_exported_tvae_roundtrip(tmp_path):
    """3D video export: artifact matches the module's deterministic decode
    (posterior mean), with a symbolic batch over static clip geometry."""
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.export import ExportedTVAE, export_tvae
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    model = TVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 4, 16, 16, 3))
    params = model.init({"params": rng, "sample": rng}, x0)["params"]
    export_tvae(cfg, params, str(tmp_path), frames=4, platforms=("cpu",))

    loaded = ExportedTVAE.load(str(tmp_path))
    assert loaded.manifest["format"] == "vqgan_tpu.export/v1-video"
    for b in (1, 2):
        clips = (np.random.RandomState(b).rand(b, 4, 16, 16, 3) * 255).astype(
            np.uint8
        )
        z = loaded.encode(clips)
        assert z.shape == (b, 2, 8, 8, 8)
        recon = loaded.decode(z)
        assert recon.shape == (b, 4, 16, 16, 3)
        assert recon.min() >= 0.0 and recon.max() <= 1.0
    # parity vs the module: encode → mean → decode
    x = jnp.asarray(clips.astype(np.float32) / 127.5 - 1.0)
    z_full = model.apply({"params": params}, x, method=model.encode)
    mean = jnp.split(z_full.astype(jnp.float32), 2, axis=-1)[0]
    dec = model.apply({"params": params}, mean, method=model.decode)
    ref = np.clip(np.asarray(dec, np.float32) * 0.5 + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(recon, ref, atol=1e-5)


def test_exported_tvae_rejects_bad_geometry(tmp_path):
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.export import export_tvae

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    )
    with pytest.raises(ValueError, match="frames"):
        export_tvae(cfg, {}, str(tmp_path), frames=3, platforms=("cpu",))


def test_exported_tvae_vq(tmp_path):
    """VQ TVAE export (loss-based codebook, decay 0): encode bakes in
    nearest-code quantization; EMA-codebook configs need the vq_ema
    collection (rejected upfront without it, exported fine with it)."""
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.export import ExportedTVAE, export_tvae
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.0,
    )
    model = TVAE(cfg=cfg)
    rng = jax.random.PRNGKey(9)
    params = model.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 4, 16, 16, 3))
    )["params"]
    export_tvae(cfg, params, str(tmp_path), frames=4, platforms=("cpu",))
    loaded = ExportedTVAE.load(str(tmp_path))
    clips = (np.random.RandomState(9).rand(1, 4, 16, 16, 3) * 255).astype(
        np.uint8
    )
    z = loaded.encode(clips)
    codebook = np.asarray(params["reg"]["codebook"])
    dists = ((z.reshape(-1, 8)[:, None, :] - codebook[None]) ** 2).sum(-1)
    assert float(dists.min(axis=1).max()) < 1e-9  # every vector is a code
    import dataclasses

    ema_cfg = dataclasses.replace(cfg, vq_ema_decay=0.99)
    with pytest.raises(ValueError, match="vq_ema"):
        export_tvae(
            ema_cfg, params, str(tmp_path), frames=4, platforms=("cpu",)
        )
    # with the stats collection provided, EMA-VQ exports and quantizes the
    # same (the codebook lives in params; the train step folds EMA stats in)
    ema_model = TVAE(cfg=ema_cfg)
    variables = ema_model.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 4, 16, 16, 3))
    )
    ema_params = dict(variables["params"])
    ema_params["reg"] = {"codebook": params["reg"]["codebook"]}
    ema_dir = str(tmp_path / "ema")
    export_tvae(
        ema_cfg, ema_params, ema_dir, frames=4, platforms=("cpu",),
        vq_ema=variables["vq_ema"],
    )
    z_ema = ExportedTVAE.load(ema_dir).encode(clips)
    np.testing.assert_allclose(np.asarray(z_ema), np.asarray(z), atol=2e-5)
