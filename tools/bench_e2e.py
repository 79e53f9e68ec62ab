"""End-to-end throughput: real tar-shard input pipeline + device_prefetch
overlap + the full GAN train step (VERDICT r1 #7 — bench.py measures
synthetic-data compute only; this measures the whole path the Trainer runs).

    python tools/bench_e2e.py [--data-dir /tmp/vqgan_bench_data] [--steps 20]

Generates a reusable local webdataset (JPEG tar shards at --image-size) on
first run, then streams it through create_dataloader (decode workers →
transform → shuffle buffer → batches) and device_prefetch into the jitted
flagship step, reporting images/sec/chip including input. Prints ONE JSON
line. Reference role: the reference's time_taken_till_load vs
time_taken_till_step split (vae_trainer.py:515,526-528) measured end to end.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_dataset(data_dir: str, n_shards: int, per_shard: int, size: int):
    os.makedirs(data_dir, exist_ok=True)
    import numpy as np
    from PIL import Image

    made = 0
    for s in range(n_shards):
        path = os.path.join(data_dir, f"{s:05d}.tar")
        if os.path.exists(path):
            continue
        rng = np.random.RandomState(s)
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                # structured content (gradients + noise) so JPEG decode cost
                # is realistic, not flat-field trivial
                yy, xx = np.mgrid[0:size, 0:size]
                img = np.stack(
                    [
                        (xx * 255 / size),
                        (yy * 255 / size),
                        rng.rand(size, size) * 255,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(name=f"{s:05d}_{i:05d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        made += 1
    return os.path.join(data_dir, "{%05d..%05d}.tar" % (0, n_shards - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/vqgan_bench_data")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--per-shard", type=int, default=200)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--gan", type=lambda s: s != "false", default=True)
    ap.add_argument("--device-normalize", dest="device_normalize",
                    type=lambda s: s != "false", default=True)
    args = ap.parse_args()

    url = ensure_dataset(
        args.data_dir, args.shards, args.per_shard, args.image_size
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.data.loader import create_dataloader, device_prefetch
    from vqgan_tpu.losses.discriminator import PatchDiscriminator
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.parallel.mesh import batch_sharding, create_mesh
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    vae_cfg = VAEConfig(
        resolution=args.res, ch=args.ch,
        enc_dtype="bfloat16", dec_dtype="bfloat16",
    )
    cfg = TrainConfig(
        batch_size=args.batch, image_size=args.image_size, max_steps=10_000,
        do_ganloss=args.gan, disc_type="hinge", use_lecam=True, do_clamp=True,
        num_workers=args.num_workers,
    )
    rng = jax.random.PRNGKey(0)
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, args.res, args.res, 3))
    g_params = vae.init({"params": rng, "sample": rng}, x0)["params"]
    disc = PatchDiscriminator(dtype=jnp.bfloat16)
    d_params = disc.init(jax.random.PRNGKey(1), x0)["params"] if args.gan else None
    lpips = LPIPS(dtype=jnp.bfloat16)
    lpips_params = lpips.init(jax.random.PRNGKey(2), x0, x0)["params"]
    state, g_tx, d_tx = create_train_state(
        cfg, g_params, d_params, vae_cfg.ch, jax.random.PRNGKey(3)
    )
    step = jax.jit(
        make_train_step(cfg, vae_cfg, vae, disc, lpips, g_tx, d_tx),
        static_argnums=(3,), donate_argnums=(0,),
    )

    mesh = create_mesh({"data": -1})
    shard = batch_sharding(mesh)
    loader = create_dataloader(
        url, args.batch, num_workers=args.num_workers, do_shuffle=True,
        just_resize=False, width=args.image_size, seed=0, loop=True,
        device_normalize=args.device_normalize,
    )
    it = device_prefetch(iter(loader), shard, depth=2)

    # warmup: compile + fill prefetch + shuffle buffer (at least one step so
    # compile time stays out of the timed region and `metrics` is defined)
    for _ in range(max(1, args.warmup)):
        state, metrics = step(state, next(it), lpips_params, False)
    float(metrics["overall_vae_loss"])  # sync (axon: block_until_ready no-op)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, next(it), lpips_params, False)
    loss = float(metrics["overall_vae_loss"])
    dt = time.perf_counter() - t0
    loader.close()
    assert np.isfinite(loss), loss

    n_chips = max(1, jax.device_count())
    ips = args.batch * args.steps / dt
    print(json.dumps({
        "metric": f"images/sec/chip END-TO-END ({args.image_size}px JPEG tar -> "
                  f"decode -> transform -> prefetch -> {args.res}px full GAN step)",
        "value": round(ips / n_chips, 3),
        "unit": "images/sec/chip",
        "batch_size": args.batch,
        "step_seconds": round(dt / args.steps, 4),
        "platform": jax.devices()[0].platform,
        "num_workers": args.num_workers,
    }))


if __name__ == "__main__":
    main()
