"""Multi-dataset batch sampling with temperature-weighted task choice.

Rebuild of the reference's MultiTaskBatchSampler
(external/data_sampler.py:175-313): each batch is drawn from a single
dataset, chosen from a temperature-flattened multinomial over dataset
sizes; indices are sharded across data-parallel ranks and reshuffled
per epoch with a deterministic seed. Pure numpy.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


class MultiTaskBatchSampler:
    """Yields (dataset-local) global index batches over a ConcatDataset layout.

    Indices are offsets into the concatenation of the datasets in order,
    matching torch.utils.data.ConcatDataset semantics so the same code
    drives either loader.
    """

    def __init__(self, dataset_sizes: Sequence[int], batch_size: int,
                 temperature: float = 3.0, rank: int = 0, world_size: int = 1,
                 seed: int = 42):
        self.dataset_sizes = list(dataset_sizes)
        self.batch_size = batch_size
        self.temperature = temperature
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.epoch = 0
        self.offsets = np.cumsum([0] + self.dataset_sizes[:-1])
        # shard each dataset across ranks
        self._shard_sizes = [s // world_size for s in self.dataset_sizes]
        total = sum(self._shard_sizes)
        self._num_batches = total // batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def generate_tasks_distribution(self) -> np.ndarray:
        """Temperature-smoothed sampling weights (reference:
        data_sampler.py:244-263): p_i ∝ (n_i / N) ** (1/T)."""
        sizes = np.asarray(self.dataset_sizes, dtype=np.float64)
        p = sizes / sizes.sum()
        p = p ** (1.0 / self.temperature)
        return p / p.sum()

    def __len__(self) -> int:
        return self._num_batches

    def __iter__(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed + self.epoch * 1000 + self.rank)
        dist = self.generate_tasks_distribution()
        # per-epoch, per-rank shuffled index pools
        pools, cursors = [], []
        for i, size in enumerate(self.dataset_sizes):
            perm = np.random.default_rng(self.seed + self.epoch).permutation(size)
            shard = perm[self.rank::self.world_size]
            pools.append(shard)
            cursors.append(0)

        for _ in range(self._num_batches):
            task = int(rng.choice(len(self.dataset_sizes), p=dist))
            pool, cur = pools[task], cursors[task]
            if cur + self.batch_size > len(pool):
                pools[task] = np.random.default_rng(
                    rng.integers(2**31)).permutation(self.dataset_sizes[task])[self.rank::self.world_size]
                pool, cur = pools[task], 0
            batch = pool[cur:cur + self.batch_size]
            cursors[task] = cur + self.batch_size
            yield batch + self.offsets[task]
