"""Infinite deterministic sharded sampling.

Reference: lib/sampler.py:8-76 `RepeatedDistSampler` — concatenates
deterministically-seeded permutations of the dataset (seed = repeat index),
truncates to `total_size = ceil(num_imgs / world) * world`, and strides by
rank. The `ba` option repeats each index max(4, world) times (batch-repeat
augmentation, :62-66). Here "rank" is the JAX process index.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Iterator, List

import numpy as np


class RepeatedDistSampler:
    def __init__(
        self,
        dataset_len: int,
        num_imgs: int,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        ba: bool = False,
    ):
        assert dataset_len > 0 and num_imgs > 0
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.num_imgs_rank = -(-num_imgs // num_replicas)  # ceil
        self.total_size = self.num_imgs_rank * num_replicas
        self.num_imgs = num_imgs
        self.shuffle = shuffle
        self.ba = ba

    def indices(self) -> np.ndarray:
        n_repeats = self.num_imgs // self.dataset_len + 1
        chunks: List[np.ndarray] = []
        for n in range(n_repeats):
            if self.shuffle:
                chunks.append(np.random.default_rng(n).permutation(self.dataset_len))
            else:
                chunks.append(np.arange(self.dataset_len))
        indices = np.concatenate(chunks)[: self.total_size]
        assert len(indices) == self.total_size
        if self.ba:
            n_rep = max(4, self.num_replicas)
            len_ind = len(indices) // n_rep + 1
            indices = np.repeat(indices[:len_ind], n_rep)
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_imgs_rank
        return indices

    def __iter__(self) -> Iterator[int]:
        return iter(self.indices().tolist())

    def __len__(self) -> int:
        return self.num_imgs_rank


class InfiniteStream:
    """Endless index stream: re-derives RepeatedDistSampler epochs forever,
    replacing the reference trainers' StopIteration re-init dance
    (tools/train_amp.py:222-238).

    Thread-safe: the loader's decode pool calls __next__ from many worker
    threads at once (loader.py), so the check-refill-pop sequence is one
    critical section. Without it, two threads racing an epoch boundary
    could both refill (duplicating an epoch's samples) or pop from an
    empty buffer (IndexError killing a worker)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self._buf: deque = deque()
        self._lock = threading.Lock()

    def __next__(self) -> int:
        with self._lock:
            if not self._buf:
                if self.shuffle:
                    perm = np.random.default_rng(
                        self.seed + self._epoch
                    ).permutation(self.dataset_len)
                else:
                    perm = np.arange(self.dataset_len)
                self._buf = deque(
                    perm[self.rank :: self.num_replicas].tolist()
                )
                self._epoch += 1
            return self._buf.popleft()

    def __iter__(self):
        return self
