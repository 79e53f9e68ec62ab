"""CLI surface tests: every reference flag must exist with the same name
(the public API surface to preserve, SURVEY.md §2.6)."""

from vqgan_tpu.cli import train

REFERENCE_FLAGS = [
    # vae_trainer.py:224-338, all 27 reference click options
    "dataset_url", "test_dataset_url", "num_epochs", "batch_size",
    "do_ganloss", "learning_rate_vae", "learning_rate_disc",
    "vae_resolution", "vae_in_channels", "vae_ch", "vae_ch_mult",
    "vae_num_res_blocks", "vae_z_channels", "run_name", "max_steps",
    "evaluate_every_n_steps", "load_path", "do_clamp", "clamp_th",
    "max_spatial_dim", "do_attn", "decoder_also_perform_hr", "project_name",
    "crop_invariance", "flip_invariance", "do_compile", "use_wavelet",
    "augment_before_perceptual_loss", "downscale_factor", "use_lecam",
    "disc_type",
]


def test_all_reference_flags_present():
    names = {p.name for p in train.params}
    missing = [f for f in REFERENCE_FLAGS if f not in names]
    assert not missing, f"missing reference flags: {missing}"


def test_reference_defaults_preserved():
    defaults = {p.name: p.default for p in train.params}
    assert defaults["batch_size"] == 8
    assert defaults["learning_rate_vae"] == 1e-5
    assert defaults["learning_rate_disc"] == 2e-4
    assert defaults["vae_ch"] == 256
    assert defaults["vae_ch_mult"] == "1,2,4,4"
    assert defaults["vae_z_channels"] == 16
    assert defaults["clamp_th"] == 8.0
    assert defaults["downscale_factor"] == 16
    assert defaults["disc_type"] == "bce"
    assert defaults["evaluate_every_n_steps"] == 250
    assert defaults["project_name"] == "vae_sweep_attn_lr_width"
