"""Samplers: contiguous eval shard + group-shuffle train sampler."""

import numpy as np

from vidar_tpu.data.samplers import GroupShuffleSampler, contiguous_shard


def test_contiguous_shard_blocks():
    n, ws = 103, 4
    shards = [contiguous_shard(n, r, ws) for r in range(ws)]
    # contiguous blocks (temporal continuity), full coverage, no overlap
    flat = [i for s in shards for i in s]
    assert sorted(flat) == list(range(n))
    for s in shards:
        assert s == list(range(s[0], s[0] + len(s)))


def test_group_shuffle_sampler_coverage_and_determinism():
    group_ids = np.array([0] * 10 + [1] * 7 + [2] * 5)
    ws = 4
    samplers = [GroupShuffleSampler(group_ids, rank=r, world_size=ws, seed=3)
                for r in range(ws)]
    per_rank = [s.epoch_indices(epoch=2) for s in samplers]
    lens = {len(p) for p in per_rank}
    assert len(lens) == 1  # equal length (padded)
    union = set()
    for p in per_rank:
        union.update(p)
    assert union == set(range(len(group_ids)))  # every sample seen
    # determinism
    again = GroupShuffleSampler(group_ids, rank=0, world_size=ws,
                                seed=3).epoch_indices(epoch=2)
    assert again == per_rank[0]
    # different epoch shuffles differently
    other = samplers[0].epoch_indices(epoch=3)
    assert other != per_rank[0]
