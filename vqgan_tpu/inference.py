"""Inference pipeline: load a checkpoint (ours or a reference torch .pt) and
encode/decode images — the published-artifact usage surface
(reference README.hf.md:28-53 shows exactly this flow for AuraEquiVAE).

    from vqgan_tpu.inference import VAEPipeline
    pipe = VAEPipeline.from_checkpoint("vae.pt", VAEConfig(ch=256, ...))
    z = pipe.encode(images)          # (B,H,W,3) uint8/float → latents
    recon = pipe.decode(z)           # latents → float images in [0,1]

CLI:  python -m vqgan_tpu.inference --checkpoint vae.pt --images 'a.png b.png'
      python -m vqgan_tpu.inference --checkpoint run/orbax --clips 'a.npy' \
          --vae_ch 64 ...   # 3D video pipeline (TVAEPipeline)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.models.ae import VAE


def check_reg_matches_params(cfg: VAEConfig, params) -> None:
    """A VQ-trained checkpoint carries params['reg']['codebook']; serving it
    with a non-vq config would silently skip quantization (flax ignores
    unused subtrees). Fail loudly instead."""
    has_codebook = (
        isinstance(params, dict)
        and isinstance(params.get("reg"), dict)
        and "codebook" in params["reg"]
    )
    if has_codebook and cfg.reg_type != "vq":
        raise ValueError(
            "checkpoint contains a VQ codebook (params['reg']['codebook']) "
            f"but reg_type is '{cfg.reg_type}' — pass --reg_type vq, or the "
            "served latents would silently bypass quantization"
        )
    if cfg.reg_type == "vq" and not has_codebook:
        raise ValueError("reg_type='vq' but the checkpoint has no codebook")


def vae_arch_click_options(fn):
    """The shared --vae_* CLI block for the inference and export commands —
    one source so the two surfaces cannot drift."""
    import click

    opts = [
        click.option("--vae_ch", type=int, default=256),
        click.option("--vae_ch_mult", type=str, default="1,2,4,4"),
        click.option("--vae_z_channels", type=int, default=16),
        click.option("--vae_num_res_blocks", type=int, default=2),
        click.option("--vae_resolution", type=int, default=256),
        click.option("--use_wavelet", type=bool, default=False),
        click.option("--do_attn", type=bool, default=False),
        click.option("--decoder_also_perform_hr", type=bool, default=False),
        click.option("--reg_type", type=str, default="identity_gaussian",
                     help="identity_gaussian | gaussian | vq"),
        click.option("--vq_codebook_size", type=int, default=16384),
    ]
    for o in reversed(opts):
        fn = o(fn)
    return fn


def build_vae_config(kw: dict) -> VAEConfig:
    """VAEConfig from the vae_arch_click_options kwargs. vq_ema_decay is 0
    for serving: quantization then reads the codebook purely from params and
    declares no EMA-stats collection (which checkpoints don't ship)."""
    from vqgan_tpu.config import parse_ch_mult

    return VAEConfig(
        resolution=kw["vae_resolution"],
        ch=kw["vae_ch"],
        ch_mult=parse_ch_mult(kw["vae_ch_mult"]),
        z_channels=kw["vae_z_channels"],
        num_res_blocks=kw["vae_num_res_blocks"],
        use_wavelet=kw["use_wavelet"],
        use_attn=kw["do_attn"],
        decoder_also_perform_hr=kw["decoder_also_perform_hr"],
        reg_type=kw["reg_type"],
        vq_codebook_size=kw["vq_codebook_size"],
        vq_ema_decay=0.0,
    )


class VAEPipeline:
    def __init__(self, cfg: VAEConfig, params, do_clamp: bool = True,
                 clamp_th: float = 8.0, vq_ema=None):
        if cfg.reg_type == "vq" and cfg.vq_ema_decay > 0 and vq_ema is None:
            raise ValueError(
                "an EMA-codebook VQ model needs the train state's vq_ema "
                "collection (pass vq_ema=state.vq_ema)"
            )
        check_reg_matches_params(cfg, params)
        self.cfg = cfg
        self.model = VAE(cfg=cfg)
        self.params = params
        self.vq_ema = vq_ema
        self.do_clamp = do_clamp
        self.clamp_th = clamp_th

        def _vars(p):
            return {"params": p, "vq_ema": vq_ema} if vq_ema is not None else {"params": p}

        self._encode = jax.jit(
            lambda p, x: self.model.apply(_vars(p), x, method=self.model.encode)
        )
        self._decode = jax.jit(
            lambda p, z: self.model.apply(_vars(p), z, method=self.model.decode)
        )
        self._quantize = jax.jit(
            lambda p, z: self.model.apply(
                _vars(p), z, False, method=self.model.regularize
            )[0]
        )

    @classmethod
    def from_checkpoint(
        cls, path: str, cfg: VAEConfig, **kw
    ) -> "VAEPipeline":
        from vqgan_tpu.train.checkpoint import load_weights

        params = jax.tree_util.tree_map(jnp.asarray, load_weights(path))
        return cls(cfg, params, **kw)

    @staticmethod
    def _to_model_input(images: np.ndarray) -> jax.Array:
        x = np.asarray(images)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        if x.ndim == 3:
            x = x[None]
        return jnp.asarray(x)

    def encode(self, images) -> jax.Array:
        """Images (B,H,W,3) uint8 [0,255] or float [-1,1] → latents; clamped
        to ±clamp_th like the published model (README.hf.md:40)."""
        z = self._encode(self.params, self._to_model_input(images))
        if self.do_clamp:
            z = jnp.clip(z, -self.clamp_th, self.clamp_th)
        if self.cfg.reg_type == "gaussian":
            z = jnp.split(z, 2, axis=-1)[0]  # mean
        elif self.cfg.reg_type == "vq":
            z = self._quantize(self.params, z)  # nearest-code embeddings
        return z

    def decode(self, z) -> np.ndarray:
        """Latents → float images in [0,1]."""
        dec = self._decode(self.params, jnp.asarray(z)).astype(jnp.float32)
        return np.asarray(jnp.clip(dec * 0.5 + 0.5, 0.0, 1.0))

    def reconstruct(self, images) -> np.ndarray:
        return self.decode(self.encode(images))


class TVAEPipeline:
    """Checkpoint-based inference for the 3D video VAE — the clip
    counterpart of VAEPipeline (the reference has no video inference; this
    completes the family's train → eval → export → inference surface).
    Latents use TVAE.deterministic_latent (posterior mean / quantized)."""

    def __init__(self, cfg, params, vq_ema=None):
        from vqgan_tpu.models.tae import TVAE

        if cfg.reg_type == "vq" and cfg.vq_ema_decay > 0 and vq_ema is None:
            raise ValueError(
                "an EMA-codebook VQ TVAE needs the train state's vq_ema "
                "collection (pass vq_ema=state.vq_ema)"
            )
        self.cfg = cfg
        self.model = TVAE(cfg=cfg)
        self.params = params
        self.vq_ema = vq_ema

        def _vars(p):
            return (
                {"params": p, "vq_ema": vq_ema}
                if vq_ema is not None
                else {"params": p}
            )

        self._encode = jax.jit(
            lambda p, x: self.model.apply(
                _vars(p),
                self.model.apply(_vars(p), x, method=self.model.encode),
                method=self.model.deterministic_latent,
            )
        )
        self._decode = jax.jit(
            lambda p, z: self.model.apply(
                _vars(p), z, method=self.model.decode
            )
        )

    @classmethod
    def from_checkpoint(cls, path: str, cfg) -> "TVAEPipeline":
        from vqgan_tpu.export import _load_export_weights

        params = jax.tree_util.tree_map(jnp.asarray, _load_export_weights(path))
        return cls(cfg, params)

    @staticmethod
    def _to_model_input(clips: np.ndarray) -> jax.Array:
        x = np.asarray(clips)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        if x.ndim == 4:  # one clip (T,H,W,3)
            x = x[None]
        return jnp.asarray(x)

    def encode(self, clips) -> jax.Array:
        """Clips (B,T,H,W,3) uint8 [0,255] or float [-1,1] → latents."""
        return self._encode(self.params, self._to_model_input(clips))

    def decode(self, z) -> np.ndarray:
        """Latents → float clips in [0,1]."""
        dec = self._decode(self.params, jnp.asarray(z)).astype(jnp.float32)
        return np.asarray(jnp.clip(dec * 0.5 + 0.5, 0.0, 1.0))

    def reconstruct(self, clips) -> np.ndarray:
        return self.decode(self.encode(clips))


def _main():
    import click

    @click.command()
    @click.option("--checkpoint", required=True)
    @click.option("--images", default="", help="space-separated image paths")
    @click.option("--clips", default="",
                  help="space-separated .npy uint8 (T,H,W,3) clip paths — "
                       "runs the 3D (TVAE) pipeline instead of the 2D one")
    @click.option("--attn_chunk", type=int, default=0,
                  help="clips only: chunked mid-block attention for long "
                       "clips (same flag as train3d/export)")
    @click.option("--out_dir", default="./recon")
    @vae_arch_click_options
    def reconstruct(checkpoint, images, clips, attn_chunk, out_dir, **kw):
        import click as _click

        if bool(images) == bool(clips):
            raise _click.UsageError("pass exactly one of --images / --clips")
        os.makedirs(out_dir, exist_ok=True)
        if clips:
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
            tpipe = TVAEPipeline.from_checkpoint(checkpoint, tcfg)
            for path in clips.split():
                clip = np.load(path)
                # an astype cast here would silently mangle non-uint8 clips
                # (floats in [0,1] truncate to all-black, wide ints wrap) —
                # the exact failure decode_clip's strict check exists to
                # prevent; validate instead and let the pipeline's
                # _to_model_input do the one sanctioned uint8→float mapping
                if clip.dtype != np.uint8:
                    raise _click.UsageError(
                        f"{path}: clip dtype {clip.dtype} — --clips expects "
                        f"uint8 (T, H, W, 3) arrays in [0, 255]; convert "
                        f"explicitly (e.g. np.round(x * 255).astype(np.uint8) "
                        f"for floats in [0, 1])"
                    )
                if clip.ndim != 4 or clip.shape[-1] != 3:
                    raise _click.UsageError(
                        f"{path}: clip shape {clip.shape} — expected "
                        f"(T, H, W, 3) uint8"
                    )
                recon = tpipe.reconstruct(clip)[0]
                out_path = os.path.join(
                    out_dir,
                    os.path.splitext(os.path.basename(path))[0] + "_recon.npy",
                )
                np.save(out_path, (recon * 255).astype(np.uint8))
                print(f"{path} -> {out_path}")
            return

        from PIL import Image

        cfg = build_vae_config(kw)
        pipe = VAEPipeline.from_checkpoint(checkpoint, cfg)
        for path in images.split():
            img = Image.open(path).convert("RGB")
            s = cfg.resolution
            img = img.resize((s, s))
            recon = pipe.reconstruct(np.asarray(img, np.uint8))[0]
            out_path = os.path.join(
                out_dir, os.path.splitext(os.path.basename(path))[0] + "_recon.png"
            )
            Image.fromarray((recon * 255).astype(np.uint8)).save(out_path)
            print(f"{path} -> {out_path}")

    reconstruct()


if __name__ == "__main__":
    _main()
