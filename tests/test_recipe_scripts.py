"""CI smoke for the L7 recipe scripts (VERDICT r4 #6): run tools/sweep.sh
(one grid cell), tools/launcher.sh (both stages, including the stage-1 →
stage-2 ``--load_path`` checkpoint handoff), and tools/launch_hdr.sh under
the CPU backend with tiny synthetic overrides, so any flag drift between the
scripts and the CLI breaks here instead of rotting silently.

The scripts append ``${EXTRA_FLAGS}`` after their recipe flags; click keeps
the LAST occurrence of a repeated option, so the overrides shrink the run
without touching the recipe's own flag list (which is the thing under test).
Reference: sweep.sh:12-27, launcher.sh:9-24, scripts/launch_hdr.sh:3-30.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

# Shrink every recipe to a 2-step tiny-model synthetic CPU run. The recipe's
# own flags (GAN/LeCam/clamp/wavelet/HR/invariance/schedule) stay in force.
TINY_OVERRIDES = (
    "--synthetic_data true --batch_size 2 --vae_ch 32 --vae_ch_mult 1,2 "
    "--vae_num_res_blocks 1 --vae_z_channels 8 --vae_resolution 32 "
    "--image_size 64 --downscale_factor 2 --max_steps 2 --num_epochs 1 "
    "--evaluate_every_n_steps 0 --use_wandb false --log_every 1 "
    "--num_workers 0 --eval_batches 1"
)


def _run(script, tmp_path, extra_env=None, extra_flags=""):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device; global batch 2 shards
    env["VQGAN_TPU_PLATFORM"] = "cpu"
    env["EXTRA_FLAGS"] = f"{TINY_OVERRIDES} --ckpt_dir {tmp_path} {extra_flags}"
    env.update(extra_env or {})
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", script)],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout[-4000:]}"
    return proc.stdout


def test_sweep_script_one_cell(tmp_path):
    """One sweep grid cell parses and trains (lr 2^-5 × ch override × attn off)."""
    out = _run(
        "sweep.sh",
        tmp_path,
        extra_env={"LOG2LRS": "-5", "CHS": "32", "ATTNS": "False"},
    )
    assert "sweep_lr2e-5_ch32_attnFalse" in out
    run_dir = tmp_path / "sweep_lr2e-5_ch32_attnFalse"
    assert run_dir.exists(), out[-2000:]


def test_launcher_script_two_stages(tmp_path):
    """Staged launch: recon-only stage 1 writes a vae_*.pt that stage 2 (GAN)
    actually loads via --load_path (reference launcher.sh:22-24)."""
    out = _run(
        "launcher.sh", tmp_path, extra_env={"CKPT_DIR": str(tmp_path)}
    )
    stage1 = list((tmp_path / "stage1_recon").glob("vae_*.pt"))
    assert stage1, out[-2000:]
    assert (tmp_path / "stage2_gan").exists(), out[-2000:]


def test_launch_hdr_script(tmp_path):
    """The stage-4 HDR recipe (wavelet encoder + HR decoder + hinge/LeCam GAN
    + flip/crop invariance) runs end to end at smoke scale."""
    _run("launch_hdr.sh", tmp_path, extra_flags="--run_name hdr_stage4")
    assert (tmp_path / "hdr_stage4").exists()
