"""Dataloader assembly: shard split → decode workers → transform → batches →
device prefetch.

``create_dataloader`` mirrors the reference signature
(vae_trainer.py:119-140) and returns an iterator of (B, W, W, 3) float32
NHWC batches in [-1, 1]. Unlike the reference, the CLI-provided dataset URL
is honored (the reference overwrites it with hardcoded paths,
vae_trainer.py:380-387 — documented deviation).

``device_prefetch`` overlaps host decode with device compute by keeping
``depth`` batches in flight via ``jax.device_put`` with the batch sharding —
the TPU equivalent of pinned-memory + non-blocking H2D copies.
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np

from vqgan_tpu.data.tar_stream import TarImageStream, expand_braces, split_shards
from vqgan_tpu.data.transforms import make_eval_transform, make_train_transform


def create_dataloader(
    url: str,
    batch_size: int,
    num_workers: int = 4,
    do_shuffle: bool = True,
    just_resize: bool = False,
    width: int = 512,
    seed: int = 0,
    loop: bool = True,
    device_normalize: bool = False,
    indexed: bool = False,
    start_step: int = 0,
    process_index: int = None,
    process_count: int = None,
):
    """``device_normalize``: emit uint8 batches and let the (trace-time dtype
    branch in the) train/eval step do the /127.5-1 normalization on device —
    4x less host→device traffic for the same numbers.

    ``indexed``: use the position-addressable dataset (data/indexed.py) —
    per-epoch perfect shuffle, sample-exact resume at ``start_step`` with no
    saved iterator state. ``batch_size`` stays the HOST-LOCAL batch in both
    modes; the indexed dataset derives the global batch from the process
    count. Streaming (default) splits shards per host; indexed splits batch
    slots per host over one global index.

    ``process_index`` / ``process_count`` override the per-host split
    identity (default: this JAX process). Context-parallel multi-host
    trainers pass their batch-row BLOCK index here so every host in a block
    reads the same sample stream (parallel/mesh.py::process_batch_block).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    shards = expand_braces(url)
    if just_resize:
        transform = make_eval_transform(width, as_uint8=device_normalize)
    else:
        # prefer the C++ fused decode+transform pipeline when it builds
        from vqgan_tpu.data.native import native_available
        from vqgan_tpu.data.transforms import make_native_train_transform

        transform = (
            make_native_train_transform(width, seed, as_uint8=device_normalize)
            if native_available()
            else make_train_transform(width, seed, as_uint8=device_normalize)
        )
    if indexed:
        from vqgan_tpu.data.indexed import IndexedTarDataset

        return IndexedTarDataset(
            shards,
            transform,
            global_batch=batch_size * process_count,
            seed=seed,
            start_step=start_step,
            num_workers=num_workers,
            process_index=process_index,
            process_count=process_count,
            do_shuffle=do_shuffle,
        )
    shards = split_shards(shards, process_index, process_count)
    return TarImageStream(
        shards,
        transform,
        batch_size=batch_size,
        num_workers=num_workers,
        do_shuffle=do_shuffle,
        seed=seed,
        loop=loop,
    )


def device_prefetch(
    iterator: Iterator[np.ndarray], sharding=None, depth: int = 2
):
    """Asynchronously stage ``depth`` batches onto device ahead of compute.

    Each host feeds its *process-local* slice of the global batch (the
    ``wds.split_by_node`` contract, reference vae_trainer.py:121), so the
    device arrays are assembled with
    ``jax.make_array_from_process_local_data``: on one host this equals a
    sharded ``device_put``; on a pod it stitches the per-host arrays into one
    global jax.Array of shape ``(local_batch * process_count, ...)`` without
    any cross-host transfer. A plain ``device_put(local, global_sharding)``
    would misinterpret the local array as the global one on multi-host.
    """
    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(batch)
            )
        return jax.device_put(batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) < depth:
            continue
        yield buf.popleft()
    while buf:
        yield buf.popleft()
