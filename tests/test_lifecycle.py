"""Full checkpoint lifecycle (VERDICT r4 #4, second half): import a
torch-format checkpoint → continue training through the Trainer → the
trainer's torch-format artifact → export a serving artifact → reload it
→ recon parity against the in-process model. This is the exact path the
reference's staged launcher relies on (reference launcher.sh:22-24: each
stage loads the previous stage's .pt; vae_trainer.py:805-910 saves them).
"""

import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.export import ExportedVAE, export_vae
from vqgan_tpu.models.ae import VAE
from vqgan_tpu.train.checkpoint import load_weights
from vqgan_tpu.train.torch_import import save_torch_checkpoint
from vqgan_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow

TINY = dict(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    enc_dtype="float32", dec_dtype="float32",
)


def test_import_continue_export_reload(tmp_path):
    vae_cfg = VAEConfig(**TINY)
    vae = VAE(cfg=vae_cfg)
    rng = jax.random.PRNGKey(7)
    params0 = vae.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 32, 32, 3))
    )["params"]

    # 1. the "pretrained" torch-format checkpoint a previous stage produced
    pre = str(tmp_path / "pretrained.pt")
    save_torch_checkpoint(jax.device_get(params0), pre)

    # 2. continue training from it (--load_path semantics)
    cfg = TrainConfig(
        synthetic_data=True,
        batch_size=8,
        image_size=32,
        max_steps=2,
        num_epochs=1,
        evaluate_every_n_steps=0,
        use_wandb=False,
        ckpt_dir=str(tmp_path / "ckpt"),
        run_name="lc",
        log_every=1,
        load_path=pre,
    )
    trainer = Trainer(cfg, vae_cfg)
    # the import really happened: pre-training params match the checkpoint
    np.testing.assert_allclose(
        np.asarray(trainer.state.g_params["encoder"]["conv_in"]["kernel"]),
        np.asarray(params0["encoder"]["conv_in"]["kernel"]),
        rtol=1e-6,
    )
    trainer.train()

    finals = glob.glob(str(tmp_path / "ckpt" / "lc" / "vae_*_step_2.pt"))
    assert finals, "trainer did not write its torch-format artifact"
    params1 = load_weights(finals[0])
    # ...and training actually moved the weights
    assert not np.allclose(
        np.asarray(params1["encoder"]["conv_in"]["kernel"]),
        np.asarray(params0["encoder"]["conv_in"]["kernel"]),
    )

    # 3. export a serving artifact from the trained .pt, reload it with no
    # model code, and pin recon parity against the in-process model under
    # the same contract (clamp, identity_gaussian reg, [0,1] output)
    art_dir = str(tmp_path / "artifact")
    export_vae(vae_cfg, params1, art_dir, do_clamp=True, clamp_th=8.0)
    art = ExportedVAE.load(art_dir)

    x = np.random.RandomState(0).uniform(-1, 1, (2, 32, 32, 3)).astype(
        np.float32
    )
    recon_art = art.reconstruct(x)

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params1)}
    z = vae.apply(variables, jnp.asarray(x), method=vae.encode)
    z = jnp.clip(z, -8.0, 8.0)
    dec = vae.apply(variables, z, method=vae.decode)
    recon_ref = np.clip(np.asarray(dec, np.float32) * 0.5 + 0.5, 0.0, 1.0)

    assert recon_art.shape == recon_ref.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(recon_art, recon_ref, atol=2e-5)
