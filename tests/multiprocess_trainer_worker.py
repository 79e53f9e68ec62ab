"""Worker for tests/test_multiprocess.py::test_two_process_full_trainer:
run the REAL Trainer end-to-end (synthetic data, eval, checkpointing) as one
of two processes in a JAX CPU cluster. This is the orchestration-level
complement to multiprocess_worker.py's step-level test: is_master gating,
per-process batch assembly inside the Trainer, the eval + checkpoint cadence,
and the final state must all survive an actual multi-controller run
(reference contract: torchrun DDP, vae_trainer.py:391-397, rank-0 eval/save
:805-910).

Prints one line:  RESULT <process_id> <param_hash:.8f>
Both processes must print an identical hash (replicated params stay in sync).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count="
    + os.environ.get("MP_HOST_DEVICES", "2")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.parallel.mesh import init_distributed
    from vqgan_tpu.train.trainer import Trainer

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    cfg = TrainConfig(
        synthetic_data=True,
        batch_size=4,  # 2 per process, 1 per virtual device
        image_size=32,
        max_steps=3,
        num_epochs=1,
        evaluate_every_n_steps=2,
        eval_batches=1,
        use_wandb=False,
        ckpt_dir=os.environ["MP_CKPT_DIR"],
        run_name=os.environ.get("MP_RUN_NAME", "mp_trainer"),
        log_every=1,
        # "data=2,fsdp=2" exercises fsdp-sharded params + the eval-time
        # cross-host param allgather on the 2-process cluster
        mesh_shape=os.environ.get("MP_MESH", "data=-1"),
    )
    vae_cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    trainer = Trainer(cfg, vae_cfg)
    trainer.train()

    # host copy works for replicated AND fsdp/tensor-sharded state (the
    # sharded case allgathers across processes — a collective, so every
    # rank takes this path together); hashes must agree bit-for-bit
    host_params = trainer._host_state().g_params
    leaves = jax.tree_util.tree_leaves(host_params)
    h = float(sum(np.float64(np.sum(np.asarray(l))) for l in leaves))
    print(f"RESULT {pid} {h:.8f}", flush=True)


if __name__ == "__main__":
    main()
