"""Config-space robustness: every flag combination a user can reach from the
CLI must build and run forward with consistent shapes."""

import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.models.ae import VAE

GRID = [
    dict(),  # defaults (tiny-fied below)
    dict(use_attn=True),
    dict(use_wavelet=True, ch_mult=(1, 2, 4)),
    dict(decoder_also_perform_hr=True),
    dict(use_attn=True, use_wavelet=True, decoder_also_perform_hr=True,
         ch_mult=(1, 2, 4)),
    dict(reg_type="gaussian"),
    dict(reg_type="vq", vq_codebook_size=64, vq_ema_decay=0.0),
    dict(reg_type="vq", vq_codebook_size=64, vq_ema_decay=0.9),
    dict(num_res_blocks=3),
    dict(remat=True),
    dict(remat=True, remat_policy="conv"),
    dict(enc_dtype="bfloat16", dec_dtype="bfloat16"),
]


@pytest.mark.parametrize("overrides", GRID, ids=lambda d: ",".join(
    f"{k}={v}" for k, v in d.items()) or "defaults")
def test_config_builds_and_runs(overrides):
    base = dict(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                z_channels=8, enc_dtype="float32", dec_dtype="float32")
    cfg = VAEConfig(**{**base, **overrides})
    model = VAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)}, x
    )
    dec, z = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    f = cfg.ffactor
    out_mult = 2 if cfg.decoder_also_perform_hr else 1
    zc = cfg.z_channels * (2 if cfg.reg_type == "gaussian" else 1)
    assert z.shape == (2, 32 // f, 32 // f, zc)
    assert dec.shape == (2, 32 * out_mult, 32 * out_mult, 3)
    assert bool(jnp.isfinite(dec.astype(jnp.float32)).all())
