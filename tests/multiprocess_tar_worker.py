"""Worker for tests/test_multiprocess.py::test_two_process_trainer_tar_* —
the REAL Trainer as one of two cluster processes reading a REAL tar-shard
dataset through --dataset_url (VERDICT r3 next-#5: the streaming-shards leg
of BASELINE config #5 that the synthetic-only multiprocess tests skip).

Per-host sample consumption is observed by wrapping the train transform:
every decoded image that reaches it is content-hashed. Prints:

  SAMPLES <process_id> <comma-joined sorted md5 hashes>
  RESULT <process_id> <param_hash:.8f>

The parent asserts the two hash sets are DISJOINT (per-host split contract:
shard split in streaming mode, wds.split_by_node semantics
vae_trainer.py:119-140; batch-slot split in indexed mode) and that the final
params agree bit-for-bit (cross-process gradient averaging).
"""

import hashlib
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import vqgan_tpu.data.loader as loader_mod
    import vqgan_tpu.data.native as native_mod
    import vqgan_tpu.data.transforms as transforms_mod
    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.parallel.mesh import init_distributed
    from vqgan_tpu.train.trainer import Trainer

    # force the Python decode path so the recording wrapper sees every image
    native_mod.native_available = lambda: False

    seen = set()
    orig_make = transforms_mod.make_train_transform

    def recording_make(width=512, seed=0, as_uint8=False):
        t = orig_make(width, seed, as_uint8=as_uint8)

        def wrapped(img, rng=None):
            seen.add(hashlib.md5(np.ascontiguousarray(img).tobytes()).hexdigest())
            return t(img, rng=rng)

        wrapped.accepts_rng = True
        return wrapped

    # loader.py binds the name at import time — patch both sites
    transforms_mod.make_train_transform = recording_make
    loader_mod.make_train_transform = recording_make

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    indexed = os.environ.get("MP_INDEXED", "0") == "1"
    cfg = TrainConfig(
        dataset_url=os.environ["MP_DATASET"],
        test_dataset_url=os.environ["MP_DATASET"],
        batch_size=4,  # 2 per process
        image_size=32,
        max_steps=4,
        num_epochs=1,
        evaluate_every_n_steps=0,
        use_wandb=False,
        ckpt_dir=os.environ["MP_CKPT_DIR"],
        run_name=os.environ.get("MP_RUN_NAME", "mp_tar"),
        log_every=1,
        num_workers=1,
        indexed_data=indexed,
        device_normalize=False,
    )
    vae_cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    trainer = Trainer(cfg, vae_cfg)
    trainer.train()

    host_params = trainer._host_state().g_params
    leaves = jax.tree_util.tree_leaves(host_params)
    h = float(sum(np.float64(np.sum(np.asarray(l))) for l in leaves))
    print(f"SAMPLES {pid} {','.join(sorted(seen))}", flush=True)
    print(f"RESULT {pid} {h:.8f}", flush=True)


if __name__ == "__main__":
    main()
