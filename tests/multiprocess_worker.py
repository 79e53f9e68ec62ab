"""Worker for tests/test_multiprocess.py: one of N processes in a real JAX
CPU cluster (Gloo collectives), exercising the framework's actual multi-host
path — init_distributed from env coordinates, per-process data feed through
device_prefetch/make_array_from_process_local_data, and the jitted train
step whose gradient reduction must keep params identical across processes
(the correct-DP contract; the reference's generator DDP bypass violates it,
SURVEY.md §2.5).

Each process feeds DIFFERENT local data; prints one line:
  RESULT <process_id> <loss:.8f> <param_hash:.8f>
Both processes must print identical loss and param_hash.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np

    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.data.loader import device_prefetch
    from vqgan_tpu.data.synthetic import synthetic_dataloader
    from vqgan_tpu.data.tar_stream import split_shards
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        init_distributed,
        replicated,
    )
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    # coordinates come from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID set by the test — the torchrun-style contract
    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    # per-host shard split sanity (wds.split_by_node contract)
    shards = [f"{i:05d}.tar" for i in range(6)]
    mine = split_shards(shards, pid, jax.process_count())
    assert len(mine) == 3 and all(
        int(s[:5]) % 2 == pid for s in mine
    ), mine

    mesh = create_mesh({"data": -1})
    assert mesh.shape["data"] == 4  # 2 procs x 2 virtual devices

    vae_cfg = VAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    cfg = TrainConfig(batch_size=4, image_size=16, max_steps=10)
    rng = jax.random.PRNGKey(0)  # same key on every process → identical init
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, 16, 16, 3))
    g_params = vae.init({"params": rng, "sample": rng}, x0)["params"]
    lpips = LPIPS()
    lpips_params = lpips.init(jax.random.PRNGKey(2), x0, x0)["params"]
    state, g_tx, d_tx = create_train_state(
        cfg, g_params, None, vae_cfg.ch, jax.random.PRNGKey(3)
    )
    state = jax.device_put(state, replicated(mesh))
    lpips_params = jax.device_put(lpips_params, replicated(mesh))

    # DIFFERENT data per process: the metrics/update are global means, so
    # both processes must still end up bit-identical
    local = synthetic_dataloader(cfg.batch_size // 2, 16, seed=100 + pid)
    it = device_prefetch(local, batch_sharding(mesh))

    step = jax.jit(
        make_train_step(cfg, vae_cfg, vae, None, lpips, g_tx, d_tx),
        static_argnums=(3,), donate_argnums=(0,),
    )
    for _ in range(2):
        state, metrics = step(state, next(it), lpips_params, 0)
    loss = float(metrics["overall_vae_loss"])
    phash = float(
        sum(
            float(jnp.sum(jnp.abs(l)))
            for l in jax.tree_util.tree_leaves(state.g_params)
        )
    )
    print(f"RESULT {pid} {loss:.8f} {phash:.8f}", flush=True)


if __name__ == "__main__":
    main()
