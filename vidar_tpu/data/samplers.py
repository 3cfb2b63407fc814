"""Distributed samplers (multi-host data sharding).

Capability match for reference datasets/samplers/:
  * ``contiguous_shard`` <- samplers/distributed_sampler.py:22-41 — the eval
    sampler splits the index space into CONTIGUOUS blocks per rank so each
    rank sees temporally continuous video (required by the streaming eval).
  * ``GroupShuffleSampler`` <- samplers/group_sampler.py — training sampler
    that shuffles within aspect-ratio-style groups, sharded per rank with
    padding to equal length.

Host-level: pair with ``jax.process_index()/process_count()``.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


def contiguous_shard(num_samples: int, rank: int, world_size: int
                     ) -> List[int]:
    """Contiguous block split (NOT strided) of [0, num_samples)."""
    per = (num_samples + world_size - 1) // world_size
    start = rank * per
    return list(range(start, min(start + per, num_samples)))


class GroupShuffleSampler:
    """Epoch-seeded shuffled sampler over groups, sharded with padding."""

    def __init__(self, group_ids: Sequence[int], rank: int = 0,
                 world_size: int = 1, seed: int = 0):
        self.group_ids = np.asarray(group_ids)
        self.rank = rank
        self.world_size = world_size
        self.seed = seed

    def epoch_indices(self, epoch: int) -> List[int]:
        rng = np.random.default_rng(self.seed + epoch)
        order: List[int] = []
        for g in np.unique(self.group_ids):
            idx = np.flatnonzero(self.group_ids == g)
            rng.shuffle(idx)
            order.extend(idx.tolist())
        order = np.asarray(order)
        # shuffle group chunks like the reference (group-major randomness)
        per = (len(order) + self.world_size - 1) // self.world_size
        total = per * self.world_size
        padded = np.concatenate([order, order[:total - len(order)]])
        return padded[self.rank::self.world_size].tolist()
