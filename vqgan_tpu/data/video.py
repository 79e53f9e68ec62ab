"""Video clip streaming from tar shards, for the 3D (TVAE) trainer.

The reference has no video data path at all — tae.py is a standalone model
(SURVEY.md §2.2) — so this defines the framework's video contract: tar
shards of ``.npy``/``.npz`` clip samples, streamed through the same
webdataset-style machinery as images (data/tar_stream.py — brace expansion,
disjoint per-host shard split, decode workers, shuffle buffer).

Clip sample format: one ``.npy`` per sample holding a uint8 array of shape
(T, H, W, 3) (RGB frames), or an ``.npz`` whose first entry is that array.
``video_transform`` standardizes every clip to a fixed (frames, size, size,
3) float32 tensor in [-1, 1]:

  - temporal: random (or center, for eval) contiguous window of ``frames``;
    clips shorter than ``frames`` are looped,
  - spatial: area-style resize of the short side to ``size`` via integer
    stride subsampling + center crop (uint8-domain, host-cheap),
  - normalize to [-1, 1] (matching the image pipeline's contract).
"""

from __future__ import annotations

import io
from typing import Iterator, Optional

import numpy as np

from vqgan_tpu.data.tar_stream import (
    TarImageStream,
    expand_braces,
    split_shards,
)

_CLIP_EXTS = (".npy", ".npz")


def decode_clip(data: bytes) -> Optional[np.ndarray]:
    """Decode one tar member into a (T, H, W, 3) uint8 clip, or None."""
    try:
        obj = np.load(io.BytesIO(data), allow_pickle=False)
        if hasattr(obj, "files"):  # npz: first entry
            if not obj.files:
                return None
            obj = obj[obj.files[0]]
        arr = np.asarray(obj)
        if arr.ndim != 4 or arr.shape[-1] != 3 or arr.dtype != np.uint8:
            # strict uint8 contract: a silent astype would wrap ints >255
            # and truncate float clips in [0,1] to all-black
            return None
        return arr
    except Exception:
        return None


def video_transform(
    frames: int, size: int, train: bool = True, seed: int = 0
):
    """Clip → (frames, size, size, 3) float32 in [-1, 1].

    Accepts an optional per-call ``rng`` (the transforms.py convention) so a
    position-addressed caller can make the temporal window a pure function
    of sample position."""
    shared_rng = np.random.default_rng(seed)

    def tf(clip: np.ndarray, rng=None) -> np.ndarray:
        rng = shared_rng if rng is None else rng
        t, h, w, _ = clip.shape
        # temporal window (loop short clips)
        if t < frames:
            reps = -(-frames // t)
            clip = np.concatenate([clip] * reps, axis=0)
            t = clip.shape[0]
        start = int(rng.integers(t - frames + 1)) if train else (t - frames) // 2
        clip = clip[start : start + frames]
        # spatial: stride subsample the short side toward `size`, center crop
        stride = max(1, min(h, w) // size)
        clip = clip[:, ::stride, ::stride]
        h2, w2 = clip.shape[1:3]
        if h2 < size or w2 < size:
            raise ValueError(
                f"clip {h}x{w} smaller than target {size} after stride"
            )
        y0, x0 = (h2 - size) // 2, (w2 - size) // 2
        clip = clip[:, y0 : y0 + size, x0 : x0 + size]
        return clip.astype(np.float32) / 127.5 - 1.0

    tf.accepts_rng = True
    return tf


class _CloseableStreamIter:
    """Iterator over a TarImageStream that exposes ``close()`` — a consumer
    that takes only a few batches (e.g. a one-shot eval set) can stop the
    decode worker threads instead of leaving them in a put-retry loop for
    the rest of the process lifetime."""

    def __init__(self, stream: TarImageStream):
        self.stream = stream
        self._it = iter(stream)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        return next(self._it)

    def close(self) -> None:
        self.stream.close()


def create_video_dataloader(
    url: str,
    batch_size: int,
    frames: int,
    size: int,
    num_workers: int = 4,
    do_shuffle: bool = True,
    seed: int = 0,
    loop: bool = True,
    process_index: int = None,
    process_count: int = None,
) -> _CloseableStreamIter:
    """Per-host video batch iterator: (local_batch, frames, size, size, 3)
    float32 in [-1, 1]. Shard assignment is disjoint per host (the same
    ``split_by_node`` contract as images); feed the result through
    ``jax.make_array_from_process_local_data`` for the global batch.

    ``process_index``/``process_count`` override the split identity (the
    context-parallel multi-host feed passes its batch-row block index so
    same-block hosts read identical streams; see trainer.py::_ctx_feed)."""
    import jax

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    shards = split_shards(expand_braces(url), process_index, process_count)
    stream = TarImageStream(
        shards,
        video_transform(frames, size, train=do_shuffle, seed=seed),
        batch_size=batch_size,
        num_workers=num_workers,
        do_shuffle=do_shuffle,
        seed=seed,
        loop=loop,
        exts=_CLIP_EXTS,
        decoder=decode_clip,
    )
    return _CloseableStreamIter(stream)
