"""Worker for tests/test_multiprocess.py::test_two_process_trainer3d_context:
the REAL Trainer3D on a 2-process data=1,context=2 mesh — one clip's T dim
spans the two hosts; the mid-block attention runs as ring attention with
ppermute collectives ACROSS processes, and the context-parallel feed
(trainer3d._ctx_feed) gives both hosts the same clip stream, each
contributing its T half.

Prints:  RESULT <process_id> <param_hash:.8f>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from vqgan_tpu.config import TrainConfig, TVAEConfig
    from vqgan_tpu.parallel.mesh import init_distributed
    from vqgan_tpu.train.trainer3d import Trainer3D

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        synthetic_data=True,
        batch_size=4,
        max_steps=2,
        evaluate_every_n_steps=0,
        eval_batches=0,
        use_wandb=False,
        ckpt_dir=os.environ["MP_CKPT_DIR"],
        run_name="mp3d_ctx",
        log_every=1,
        mesh_shape="data=1,context=2",
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=8)
    assert trainer._ctx_feed is not None, "context feed not engaged"
    trainer.train()

    host_params = trainer._host_state()
    params = (
        host_params["params"] if isinstance(host_params, dict)
        else host_params.g_params
    )
    leaves = jax.tree_util.tree_leaves(params)
    h = float(sum(np.float64(np.sum(np.asarray(l))) for l in leaves))
    print(f"RESULT {pid} {h:.8f}", flush=True)


if __name__ == "__main__":
    main()
