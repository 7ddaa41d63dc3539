"""Batching data loader with background prefetch.

Replaces torch ``DataLoader`` (reference ``train.py:121-136``) with a
thread-prefetching host pipeline: item assembly (numpy, disk IO) runs in a
worker thread pool while the accelerator computes, and ready batches queue up
ahead of consumption.  Device transfer is left to the caller (the train loop
shards batches onto the mesh via ``nsdp_tpu.parallel``).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    """Iterates batches of collated samples.

    Args:
      dataset: indexable with ``__len__``, ``__getitem__`` and ``collate_fn``.
      batch_size: samples per batch.
      shuffle: reshuffle indices each epoch (numpy RandomState ``seed``).
      drop_last: drop the trailing partial batch (keeps shapes static for
        jit — recommended for training).
      num_workers: worker threads for item assembly (0 = synchronous).
      prefetch: max ready batches queued ahead (only with workers).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        prefetch: int = 2,
        seed: Optional[int] = None,
        collate_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.rng = np.random.RandomState(seed)
        self.collate = collate_fn or dataset.collate_fn

    def _batch_indices(self):
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        end = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start : start + self.batch_size]

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _make_batch(self, idxs):
        return self.collate([self.dataset[int(i)] for i in idxs])

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for idxs in self._batch_indices():
                yield self._make_batch(idxs)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    futures = [
                        pool.submit(self._make_batch, idxs)
                        for idxs in self._batch_indices()
                    ]
                    for fut in futures:
                        out_q.put(fut.result())
            except BaseException as exc:  # surface worker errors to consumer
                out_q.put(exc)
            finally:
                out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        thread.join()
