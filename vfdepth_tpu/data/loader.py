"""Host-side data feed: threaded collation + device prefetch.

The TPU replacement for the reference's torch DataLoader worker pool
(``models/vfdepth.py:97-173``): a background thread pool builds numpy batches
while the device computes, and an optional device-prefetch queue overlaps
H2D transfer with the current step (SURVEY.md §7 hard part 7). Sharding for
multi-host data parallelism uses per-host contiguous index ranges like the
reference's DistributedSampler (each epoch reshuffled by a seeded RNG with
``set_epoch`` semantics).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Sequence

import numpy as np


class BatchLoader:
    """Iterable over collated numpy batch dicts.

    Args:
      dataset: object with __len__ and __getitem__ -> Dict[str, np.ndarray],
        or with a ``batch(indices)`` fast path.
      batch_size: per-host batch size.
      shuffle: reshuffle each epoch (seeded; epoch folded into the seed).
      drop_last: drop the trailing partial batch (the reference always does).
      num_workers: prefetch threads (0 = synchronous).
      shard_index/num_shards: this host's shard of the index space.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 2, seed: int = 42,
                 shard_index: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        # propagate to the dataset so per-sample augmentation seeds change
        # across epochs (otherwise every epoch replays identical jitter)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    @property
    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # contiguous per-host shard of the (shuffled) index space
        per = n // self.num_shards
        idx = idx[self.shard_index * per:(self.shard_index + 1) * per]
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def _collate(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        if hasattr(self.dataset, "batch"):
            return self.dataset.batch(list(indices))
        samples = [self.dataset[int(i)] for i in indices]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def __len__(self) -> int:
        return self.steps_per_epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if not self.drop_last and batches and len(batches[-1]) < self.batch_size:
            pass  # keep the partial batch
        if self.num_workers <= 0:
            for b in batches:
                yield self._collate(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        sentinel = object()
        lock = threading.Lock()
        pos = {"i": 0}
        out: Dict[int, Any] = {}
        cond = threading.Condition()

        def worker():
            while True:
                with lock:
                    i = pos["i"]
                    if i >= len(batches):
                        break
                    pos["i"] = i + 1
                # store exceptions as the slot value and re-raise in the
                # consumer — a swallowed worker death would leave the
                # consumer waiting forever on a batch that never arrives
                try:
                    data = self._collate(batches[i])
                except BaseException as e:  # noqa: BLE001
                    data = e
                with cond:
                    out[i] = data
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for i in range(len(batches)):
            with cond:
                while i not in out:
                    cond.wait(timeout=60.0)
                data = out.pop(i)
            if isinstance(data, BaseException):
                raise RuntimeError(
                    f"BatchLoader worker failed on batch {i}") from data
            yield data
        for t in threads:
            t.join()


def device_prefetch(iterator, size: int = 2, put_fn=None):
    """Move batches to device ahead of consumption (jax.device_put pipeline).

    ``put_fn`` overrides the placement (e.g. mesh sharding instead of the
    default single-device put)."""
    import jax
    import collections

    buf = collections.deque()

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
