"""Checkpoint tests: orbax full-state roundtrip, torch-format interop via
the trainer-facing helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.models.ae import VAE
from vqgan_tpu.train.checkpoint import (
    CheckpointManager,
    load_weights,
    save_weights_torch,
)
from vqgan_tpu.train.state import create_train_state

TINY = dict(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    enc_dtype="float32", dec_dtype="float32",
)


def _make_state():
    vae_cfg = VAEConfig(**TINY)
    cfg = TrainConfig(max_steps=10)
    vae = VAE(cfg=vae_cfg)
    rng = jax.random.PRNGKey(0)
    g_params = vae.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 32, 32, 3))
    )["params"]
    state, _, _ = create_train_state(cfg, g_params, None, 32, jax.random.PRNGKey(1))
    return vae, state


def test_orbax_roundtrip(tmp_path):
    vae, state = _make_state()
    mngr = CheckpointManager(str(tmp_path / "orbax"))
    mngr.save(3, jax.device_get(state))
    mngr.wait()
    assert mngr.latest_step() == 3
    restored = mngr.restore(jax.device_get(state))
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_torch_weights_roundtrip(tmp_path):
    vae, state = _make_state()
    path = str(tmp_path / "w.pt")
    save_weights_torch(jax.device_get(state.g_params), path)
    loaded = load_weights(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_load_reference_style_checkpoint(tmp_path):
    """A checkpoint saved by the reference trainer (DDP 'module.' prefix,
    vae_trainer.py:905) loads into our tree."""
    torch = pytest.importorskip("torch")
    vae, state = _make_state()
    path = str(tmp_path / "ref.pt")
    save_weights_torch(jax.device_get(state.g_params), path)
    sd = torch.load(path, weights_only=True)
    sd_ddp = {f"module._orig_mod.{k}": v for k, v in sd.items()}
    torch.save(sd_ddp, str(tmp_path / "ref_ddp.pt"))
    loaded = load_weights(str(tmp_path / "ref_ddp.pt"))
    np.testing.assert_allclose(
        np.asarray(loaded["encoder"]["conv_in"]["kernel"]),
        np.asarray(state.g_params["encoder"]["conv_in"]["kernel"]),
        rtol=1e-6,
    )
