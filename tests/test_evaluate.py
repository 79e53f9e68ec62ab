"""Eval-path unit tests: grid tiling and the jitted eval step."""

import numpy as np

import jax
import jax.numpy as jnp

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.models.ae import init_vae_params
from vqgan_tpu.train.evaluate import make_eval_step, tile_grid

TINY = dict(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    enc_dtype="float32", dec_dtype="float32",
)


def test_tile_grid_layout():
    imgs = np.stack(
        [np.full((64, 64, 3), i, np.float32) for i in range(8)]
    )
    grid = tile_grid(imgs, rows=2, cols=4, d=32)
    assert grid.shape == (64, 128, 3)
    # cell (i, j) holds image i*4+j's top-left 32² crop (vae_trainer.py:883-890)
    assert grid[0, 0, 0] == 0
    assert grid[0, 32, 0] == 1
    assert grid[32, 0, 0] == 4
    assert grid[32 + 5, 32 * 3 + 5, 0] == 7


def test_eval_step_flip_invariance_identity():
    """With flip_invariance, eval decodes the double-flipped latent then
    flips the image back (vae_trainer.py:837-855) — for an equivariant model
    this is identity; for any model output shape/range must hold."""
    cfg = TrainConfig(do_clamp=True, clamp_th=8.0, flip_invariance=True)
    vae_cfg = VAEConfig(**TINY)
    model, params = init_vae_params(vae_cfg, jax.random.PRNGKey(0))
    step = make_eval_step(cfg, vae_cfg, model)
    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1
    )
    recon, target = step(params, None, batch)
    assert recon.shape == (2, 32, 32, 3)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(target), np.clip(np.asarray(batch) * 0.5 + 0.5, 0, 1),
        rtol=1e-6,
    )


def test_eval_step_plain():
    cfg = TrainConfig()
    vae_cfg = VAEConfig(**TINY)
    model, params = init_vae_params(vae_cfg, jax.random.PRNGKey(0))
    step = make_eval_step(cfg, vae_cfg, model)
    batch = jnp.zeros((1, 32, 32, 3))
    recon, target = step(params, None, batch)
    assert np.isfinite(np.asarray(recon)).all()


def test_eval_bf16_dtype_parity():
    """cfg.eval_bf16 (default) evaluates with bf16 compute like the
    reference's autocast eval (vae_trainer.py:821,841); results stay close
    to the fp32 eval and finite."""
    vae_cfg = VAEConfig(**TINY)
    model, params = init_vae_params(vae_cfg, jax.random.PRNGKey(0))
    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1
    )
    r_bf16, _ = make_eval_step(TrainConfig(), vae_cfg, model)(params, None, batch)
    r_fp32, _ = make_eval_step(
        TrainConfig(eval_bf16=False), vae_cfg, model
    )(params, None, batch)
    assert np.isfinite(np.asarray(r_bf16)).all()
    # bf16 compute, fp32 GroupNorm: small but nonzero deviation expected
    assert float(np.abs(np.asarray(r_bf16) - np.asarray(r_fp32)).max()) < 0.05
