"""Infinite rank-strided shuffled index stream.

Contract parity with the reference's InfiniteSampler
(reference: torch_utils/misc.py:117-148): an endless shuffled permutation of
dataset indices, strided by (rank, num_replicas) for data parallelism, with
window-swap reshuffling.  This is the data-sharding mechanism for the 'data'
mesh axis: each process draws its own rank's stride of the same deterministic
stream, so no cross-host coordination is needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class InfiniteSampler:
    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0,
                 window_size: float = 0.5):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1
