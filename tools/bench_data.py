"""Host-side input-pipeline throughput benchmark.

Measures images/sec through the tar streamer with the native C++ decode path
vs the cv2/PIL Python path, across worker counts — the instrument for
SURVEY.md §7 hard-part #5 (host decode throughput must exceed the device's
images/sec or the TPU starves).

    python tools/bench_data.py [--images 512] [--size 512]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shards(root: str, n_shards: int, per_shard: int, size: int):
    from PIL import Image

    paths = []
    rng = np.random.RandomState(0)
    for s in range(n_shards):
        p = os.path.join(root, f"{s:05d}.tar")
        with tarfile.open(p, "w") as tf:
            for i in range(per_shard):
                img = Image.fromarray(
                    (rng.rand(size, size, 3) * 255).astype(np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(name=f"{s:05d}_{i:05d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        paths.append(p)
    return paths


def run(paths, transform, workers: int, batch: int, n_images: int) -> float:
    from vqgan_tpu.data.tar_stream import TarImageStream

    stream = TarImageStream(
        paths, transform, batch_size=batch, num_workers=workers,
        do_shuffle=False, loop=True,
    )
    it = iter(stream)
    next(it)  # warm up workers
    t0 = time.perf_counter()
    seen = 0
    while seen < n_images:
        seen += len(next(it))
    dt = time.perf_counter() - t0
    stream.close()
    return seen / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from vqgan_tpu.data.native import native_available
    from vqgan_tpu.data.transforms import (
        make_native_train_transform,
        make_train_transform,
    )

    with tempfile.TemporaryDirectory() as root:
        paths = make_shards(root, 8, 48, args.size)
        for workers in (1, 2, 4, 8):
            py = run(
                paths, make_train_transform(args.width), workers, args.batch,
                args.images,
            )
            line = f"workers={workers}: python/cv2 {py:7.1f} img/s"
            if native_available():
                nat = run(
                    paths,
                    make_native_train_transform(args.width),
                    workers,
                    args.batch,
                    args.images,
                )
                line += f" | native C++ {nat:7.1f} img/s ({nat/py:.2f}x)"
            print(line)


if __name__ == "__main__":
    main()
