"""Indexed tar dataset: sample-exact deterministic data order and resume.

The streaming reader (tar_stream.py) matches webdataset semantics —
shard-sequential reads + a bounded shuffle buffer (reference
vae_trainer.py:119-140) — but its exact sample order depends on
worker/queue timing, so a resumed run can only continue on a *fresh* order
(step-seeded reseed, train/trainer.py). This module is the complementary
production mode:

  - a one-pass index of every member's (shard, data offset, size) — tar
    headers only, ~ms per shard,
  - a per-epoch global permutation that is a pure function of
    (seed, epoch) — a *perfect* shuffle, strictly stronger than the
    streaming buffer's windowed shuffle,
  - batch assembly by position: the batch at step S is THE SAME batch on
    every run, so resume is sample-exact with ZERO saved iterator state
    (global sample index = step · global_batch + slot).

Trade-off vs streaming: random reads within shards (fine on local disk or
page-cached media; keep the streaming default for sequential-only sources).
Enable with ``--indexed_data true``.
"""

from __future__ import annotations

import concurrent.futures
import tarfile
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from vqgan_tpu.data.tar_stream import _IMG_EXTS, _decode_image

IndexEntry = Tuple[str, int, int]  # (shard path, data offset, size)


def build_tar_index(shards: Sequence[str]) -> List[IndexEntry]:
    """Enumerate image members of each shard as (path, offset, size).

    Reads tar headers only. Unreadable shards are skipped (webdataset
    resilience, matching tar_stream._iter_tar_samples); member order is the
    deterministic on-disk order, so every process builds the same index.
    """
    index: List[IndexEntry] = []
    for path in shards:
        try:
            with tarfile.open(path, "r") as tf:
                for m in tf.getmembers():
                    if m.isfile() and m.name.lower().endswith(_IMG_EXTS):
                        index.append((path, m.offset_data, m.size))
        except (tarfile.TarError, OSError):
            continue
    return index


class IndexedTarDataset:
    """Deterministic, position-addressable view over tar shards.

    ``batch_at(step)`` returns the host-local slice of global batch ``step``;
    iteration starts at ``start_step``. All hosts share the one global index
    and permutation; host ``p`` of ``P`` owns slots
    ``[p·B/P, (p+1)·B/P)`` of every global batch — the same per-host split
    contract as the streaming path (wds.split_by_node equivalent).
    """

    def __init__(
        self,
        shards: Sequence[str],
        transform: Callable[[np.ndarray], np.ndarray],
        global_batch: int,
        *,
        seed: int = 0,
        start_step: int = 0,
        num_workers: int = 4,
        process_index: int = 0,
        process_count: int = 1,
        do_shuffle: bool = True,
    ):
        if global_batch % process_count:
            raise ValueError(
                f"global batch {global_batch} must divide by {process_count} hosts"
            )
        self.index = build_tar_index(shards)
        if not self.index:
            raise ValueError(f"no decodable image members in shards {list(shards)[:3]}...")
        self.transform = transform
        self.global_batch = global_batch
        self.seed = seed
        self.start_step = start_step
        self.num_workers = max(1, num_workers)
        self.local_batch = global_batch // process_count
        self.slot_lo = process_index * self.local_batch
        self.do_shuffle = do_shuffle
        self._perm_cache: dict = {}
        self._wants_bytes = bool(getattr(transform, "wants_bytes", False))
        # per-position augmentation rng: transform randomness must be a pure
        # function of (seed, position), not of worker-thread draw order —
        # otherwise batch_at(S) is not reproducible across runs
        self._accepts_rng = bool(getattr(transform, "accepts_rng", False))

    def __len__(self) -> int:
        return len(self.index)

    def _perm(self, epoch: int) -> np.ndarray:
        if epoch not in self._perm_cache:
            if len(self._perm_cache) > 2:  # keep the working set tiny
                self._perm_cache.clear()
            if self.do_shuffle:
                rng = np.random.default_rng((self.seed, epoch))
                self._perm_cache[epoch] = rng.permutation(len(self.index))
            else:
                self._perm_cache[epoch] = np.arange(len(self.index))
        return self._perm_cache[epoch]

    def _read_sample(self, global_pos: int) -> np.ndarray:
        n = len(self.index)
        epoch, pos = divmod(global_pos, n)
        path, offset, size = self.index[self._perm(epoch)[pos]]
        with open(path, "rb") as f:
            f.seek(offset)
            data = f.read(size)
        kw = (
            {"rng": np.random.default_rng((self.seed, global_pos))}
            if self._accepts_rng
            else {}
        )
        if self._wants_bytes:
            return self.transform(data, **kw)
        img = _decode_image(data)
        if img is None:
            # corrupt member: deterministic fallback to the next index slot
            return self._read_sample(global_pos + 1)
        return self.transform(img, **kw)

    def batch_at(self, step: int) -> np.ndarray:
        """Host-local slice of global batch ``step`` — identical across runs."""
        base = step * self.global_batch + self.slot_lo
        positions = range(base, base + self.local_batch)
        if self.num_workers == 1:
            samples = [self._read_sample(p) for p in positions]
        else:
            with concurrent.futures.ThreadPoolExecutor(self.num_workers) as ex:
                samples = list(ex.map(self._read_sample, positions))
        return np.stack(samples)

    def __iter__(self) -> Iterator[np.ndarray]:
        step = self.start_step
        while True:
            yield self.batch_at(step)
            step += 1
