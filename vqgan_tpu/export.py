"""Serving export: self-contained StableHLO artifacts via ``jax.export``.

The reference's deployment story is "upload the .pt to HuggingFace and have
consumers rebuild the torch module around it" (tester_upload.sh:1-2,
README.hf.md:28-53). The TPU-native equivalent is an ahead-of-time exported
program: weights baked in as constants, batch dimension symbolic, lowered for
both CPU and TPU — a single directory a serving process can load and call
with zero framework code (no flax, no model definition, no config plumbing).

    from vqgan_tpu.export import export_vae, ExportedVAE
    export_vae(cfg, params, "artifact/")         # writes encode/decode + manifest
    vae = ExportedVAE.load("artifact/")          # anywhere, any process
    z = vae.encode(images)                       # (B,H,W,3) uint8/float -> latents
    recon = vae.decode(z)                        # latents -> float images in [0,1]

Semantics match ``inference.VAEPipeline``: encode clamps to ±clamp_th like the
published AuraEquiVAE (README.hf.md:40) and returns the mean for the real
Gaussian regularizer; decode maps to [0,1].

CLI: ``python -m vqgan_tpu.export --checkpoint vae.pt --out_dir artifact/``
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.models.ae import VAE

_MANIFEST = "manifest.json"
_ENCODE = "encode.jaxexport"
_DECODE = "decode.jaxexport"

# cpu lowering makes artifacts testable/servable off-accelerator; tpu is the
# deployment target. (Multi-platform export requires platform-portable HLO —
# hence the pallas-kernel guard below.)
_DEFAULT_PLATFORMS = ("cpu", "tpu")


def export_vae(
    cfg: VAEConfig,
    params,
    out_dir: str,
    *,
    do_clamp: bool = True,
    clamp_th: float = 8.0,
    platforms: Sequence[str] = _DEFAULT_PLATFORMS,
    vq_ema=None,
) -> None:
    """Write a self-contained serving artifact for ``VAE(cfg)`` + ``params``.

    The batch dimension is symbolic — one artifact serves any batch size.
    Spatial dims are static at ``cfg.resolution`` (stride-2 conv shapes are
    resolution-dependent; export one artifact per serving resolution).

    VQ models: ``encode`` bakes in nearest-code quantization (returns the
    quantized embeddings); pass the train state's ``vq_ema`` collection when
    ``cfg.vq_ema_decay > 0`` (its stats variables are part of the module).
    """
    if cfg.use_pallas_gn:
        raise ValueError(
            "export requires platform-portable HLO; re-instantiate the "
            "config with use_pallas_gn=False (weights are unaffected)"
        )
    if cfg.reg_type == "vq" and cfg.vq_ema_decay > 0 and vq_ema is None:
        raise ValueError(
            "exporting an EMA-codebook VQ model requires the train state's "
            "vq_ema collection (pass vq_ema=state.vq_ema)"
        )
    # canonical lowering for the artifact: "auto" impl knobs resolve by the
    # EXPORTING host's backend at trace time, which would make the artifact's
    # HLO depend on where it was built; the direct form is the reference
    # computation and lowers on every platform (math identical either way)
    if cfg.upsample_impl != "direct":
        cfg = dataclasses.replace(cfg, upsample_impl="direct")
    from vqgan_tpu.inference import check_reg_matches_params

    check_reg_matches_params(cfg, params)
    model = VAE(cfg=cfg)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if vq_ema is not None:
        variables["vq_ema"] = jax.tree_util.tree_map(jnp.asarray, vq_ema)

    def encode_fn(x):
        z = model.apply(variables, x, method=model.encode)
        if do_clamp:
            z = jnp.clip(z, -clamp_th, clamp_th)
        if cfg.reg_type == "gaussian":
            z = jnp.split(z, 2, axis=-1)[0]  # mean
        elif cfg.reg_type == "vq":
            z, _ = model.apply(variables, z, False, method=model.regularize)
        return z.astype(jnp.float32)

    def decode_fn(z):
        dec = model.apply(variables, z, method=model.decode)
        return jnp.clip(dec.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    (b,) = jax_export.symbolic_shape("b")
    res = cfg.resolution
    latent_res = res // cfg.ffactor
    out_res = res * (2 if cfg.decoder_also_perform_hr else 1)
    x_spec = jax.ShapeDtypeStruct((b, res, res, cfg.in_channels), jnp.float32)
    z_spec = jax.ShapeDtypeStruct(
        (b, latent_res, latent_res, cfg.z_channels), jnp.float32
    )
    exp_enc = jax_export.export(jax.jit(encode_fn), platforms=list(platforms))(x_spec)
    exp_dec = jax_export.export(jax.jit(decode_fn), platforms=list(platforms))(z_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _ENCODE), "wb") as f:
        f.write(exp_enc.serialize())
    with open(os.path.join(out_dir, _DECODE), "wb") as f:
        f.write(exp_dec.serialize())
    manifest = {
        "format": "vqgan_tpu.export/v1",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "vae_config": dataclasses.asdict(cfg),
        "reg_type": cfg.reg_type,
        "do_clamp": do_clamp,
        "clamp_th": clamp_th,
        "encode_input": ["b", res, res, cfg.in_channels],
        "encode_output": ["b", latent_res, latent_res, cfg.z_channels],
        "decode_input": ["b", latent_res, latent_res, cfg.z_channels],
        "decode_output": ["b", out_res, out_res, cfg.out_ch],
        "io_dtype": "float32",
        "image_range_in": "[-1, 1] (uint8 accepted by ExportedVAE.encode)",
        "image_range_out": "[0, 1]",
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def export_tvae(
    cfg,
    params,
    out_dir: str,
    *,
    frames: int,
    platforms: Sequence[str] = _DEFAULT_PLATFORMS,
    vq_ema=None,
) -> None:
    """Write a serving artifact for the 3D video VAE (``TVAE(cfg)``).

    Batch is symbolic; clip length (``frames``) and resolution are static —
    stride-2 Conv3d shapes depend on both (export one artifact per serving
    clip geometry). Encode returns the posterior mean (gaussian) or the
    quantized embeddings (vq); decode maps to [0, 1].
    """
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.models.tae import TVAE

    assert isinstance(cfg, TVAEConfig), cfg
    # a Pallas call baked into the StableHLO would make the artifact
    # TPU-only; the lax chunked path is exact and lowers on every platform
    if cfg.attn_impl != "lax":
        cfg = dataclasses.replace(cfg, attn_impl="lax")
    # canonical Conv3d/upsample lowering (see export_vae: "auto" resolves by
    # the exporting host's backend; keep artifacts host-independent)
    if cfg.conv3d_impl != "direct" or cfg.upsample_impl != "direct":
        cfg = dataclasses.replace(
            cfg, conv3d_impl="direct", upsample_impl="direct"
        )
    if cfg.reg_type == "vq" and cfg.vq_ema_decay > 0 and vq_ema is None:
        raise ValueError(
            "exporting an EMA-codebook VQ TVAE requires the train state's "
            "vq_ema collection (pass vq_ema=state.vq_ema) — serving reads "
            "the codebook from params (the train step folds the EMA stats "
            "in every step) but the module declares the stats variables"
        )
    model = TVAE(cfg=cfg)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if vq_ema is not None:
        variables["vq_ema"] = jax.tree_util.tree_map(jnp.asarray, vq_ema)

    def encode_fn(x):
        z = model.apply(variables, x, method=model.encode)
        z = model.apply(variables, z, method=model.deterministic_latent)
        return z.astype(jnp.float32)

    def decode_fn(z):
        dec = model.apply(variables, z, method=model.decode)
        return jnp.clip(dec.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    (b,) = jax_export.symbolic_shape("b")
    res = cfg.resolution
    f = 2 ** (len(cfg.ch_mult) - 1)
    if frames % f or res % f:
        raise ValueError(
            f"frames {frames} and resolution {res} must divide the "
            f"spatio-temporal factor {f} (2^(len(ch_mult)-1))"
        )
    t_lat, s_lat = frames // f, res // f
    x_spec = jax.ShapeDtypeStruct((b, frames, res, res, 3), jnp.float32)
    z_spec = jax.ShapeDtypeStruct(
        (b, t_lat, s_lat, s_lat, cfg.z_channels), jnp.float32
    )
    exp_enc = jax_export.export(jax.jit(encode_fn), platforms=list(platforms))(x_spec)
    exp_dec = jax_export.export(jax.jit(decode_fn), platforms=list(platforms))(z_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _ENCODE), "wb") as f_:
        f_.write(exp_enc.serialize())
    with open(os.path.join(out_dir, _DECODE), "wb") as f_:
        f_.write(exp_dec.serialize())
    manifest = {
        "format": "vqgan_tpu.export/v1-video",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "tvae_config": dataclasses.asdict(cfg),
        "reg_type": cfg.reg_type,
        "encode_input": ["b", frames, res, res, 3],
        "encode_output": ["b", t_lat, s_lat, s_lat, cfg.z_channels],
        "decode_input": ["b", t_lat, s_lat, s_lat, cfg.z_channels],
        "decode_output": ["b", frames, res, res, cfg.out_ch],
        "io_dtype": "float32",
        "image_range_in": "[-1, 1] (uint8 accepted by ExportedTVAE.encode)",
        "image_range_out": "[0, 1]",
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f_:
        json.dump(manifest, f_, indent=2)


class _ExportedArtifact:
    """Shared loader/caller for export artifacts; subclasses pin the
    manifest format and the input normalization."""

    _FORMAT = ""  # subclass responsibility

    def __init__(self, manifest: dict, enc, dec):
        self.manifest = manifest
        self._enc = enc
        self._dec = dec

    @classmethod
    def load(cls, artifact_dir: str):
        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != cls._FORMAT:
            raise ValueError(f"unrecognized artifact format: {manifest.get('format')}")
        with open(os.path.join(artifact_dir, _ENCODE), "rb") as f:
            enc = jax_export.deserialize(f.read())
        with open(os.path.join(artifact_dir, _DECODE), "rb") as f:
            dec = jax_export.deserialize(f.read())
        return cls(manifest, enc, dec)

    @staticmethod
    def _to_model_input(x) -> jax.Array:
        raise NotImplementedError

    def encode(self, x) -> np.ndarray:
        """uint8 [0,255] or float [-1,1] inputs → latents."""
        return np.asarray(self._enc.call(self._to_model_input(x)))

    def decode(self, z) -> np.ndarray:
        """Latents → float outputs in [0,1]."""
        return np.asarray(self._dec.call(jnp.asarray(z, jnp.float32)))

    def reconstruct(self, x) -> np.ndarray:
        return self.decode(self.encode(x))


class ExportedVAE(_ExportedArtifact):
    """Loads and calls an ``export_vae`` artifact — no model code needed.
    encode takes images (B,H,W,3)."""

    _FORMAT = "vqgan_tpu.export/v1"

    @staticmethod
    def _to_model_input(images) -> jax.Array:
        from vqgan_tpu.inference import VAEPipeline

        return jnp.asarray(VAEPipeline._to_model_input(images), jnp.float32)


class ExportedTVAE(_ExportedArtifact):
    """Loads and calls an ``export_tvae`` artifact — no model code needed.
    encode takes clips (B,T,H,W,3)."""

    _FORMAT = "vqgan_tpu.export/v1-video"

    @staticmethod
    def _to_model_input(clips) -> jax.Array:
        arr = np.asarray(clips)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 127.5 - 1.0
        return jnp.asarray(arr, jnp.float32)


def _load_export_weights(checkpoint: str):
    """torch .pt, an orbax weights dir, or a trainer run's CheckpointManager
    dir (picks the latest step; unwraps a full train-state checkpoint down
    to the generator params)."""
    from vqgan_tpu.train.checkpoint import load_weights

    path = checkpoint
    if os.path.isdir(path):
        steps = sorted(
            (int(d) for d in os.listdir(path) if d.isdigit()), reverse=True
        )
        if steps:
            path = os.path.join(path, str(steps[0]))
        if os.path.isdir(os.path.join(path, "default")):
            path = os.path.join(path, "default")
    w = load_weights(path)
    for key in ("params", "g_params"):
        if isinstance(w, dict) and key in w and (
            "opt_state" in w or "step" in w or "g_opt_state" in w
        ):
            return w[key]
    return w


def _main():
    import click

    from vqgan_tpu.inference import build_vae_config, vae_arch_click_options

    @click.command()
    @click.option("--checkpoint", required=True, help="torch .pt or orbax weights dir")
    @click.option("--out_dir", required=True)
    @click.option("--family", type=str, default="vae",
                  help="vae (2D image) | tvae (3D video)")
    @click.option("--frames", type=int, default=16,
                  help="clip length for --family tvae (static in the artifact)")
    @click.option("--attn_chunk", type=int, default=0,
                  help="tvae only: chunked mid-block attention, like the "
                       "train3d flag — required to serve long-clip models "
                       "whose dense score matrix exceeds accelerator memory")
    @click.option("--do_clamp", type=bool, default=True)
    @click.option("--clamp_th", type=float, default=8.0)
    @click.option("--platforms", type=str, default="cpu,tpu")
    @vae_arch_click_options
    def run(checkpoint, out_dir, family, frames, attn_chunk, do_clamp,
            clamp_th, platforms, **kw):
        params = _load_export_weights(checkpoint)
        plats = tuple(p.strip() for p in platforms.split(",") if p.strip())
        if family == "tvae":
            from vqgan_tpu.config import TVAEConfig, parse_ch_mult

            tcfg = TVAEConfig(
                resolution=kw["vae_resolution"],
                ch=kw["vae_ch"],
                ch_mult=parse_ch_mult(kw["vae_ch_mult"]),
                num_res_blocks=kw["vae_num_res_blocks"],
                z_channels=kw["vae_z_channels"],
                reg_type="gaussian" if kw["reg_type"] in (
                    "gaussian", "identity_gaussian") else kw["reg_type"],
                vq_codebook_size=kw["vq_codebook_size"],
                vq_ema_decay=0.0,
                attn_chunk=attn_chunk,
            )
            export_tvae(tcfg, params, out_dir, frames=frames, platforms=plats)
        elif family == "vae":
            cfg = build_vae_config(kw)
            export_vae(
                cfg, params, out_dir,
                do_clamp=do_clamp, clamp_th=clamp_th, platforms=plats,
            )
        else:
            raise click.BadParameter(f"unknown --family {family}")
        click.echo(f"Exported serving artifact to {out_dir}")

    run()


if __name__ == "__main__":
    _main()
