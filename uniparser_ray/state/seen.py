"""Sharded URL-seen filter actors — the frontier's anti-join.

The seen set is the crawl's single piece of global mutable state; Ray
Data cannot express a streaming test-and-set, so it lives in a fixed
pool of ``SeenShard`` actors, sharded by the top bits of the 64-bit
canonical-URL hash (shard routing is pure arithmetic — no lookup
table, no shuffle).  Test-and-set is idempotent, which makes fetch
retries safe: re-adding a hash simply returns "already seen".

Scale math (north rule, 10^10 URLs): exact sets don't fit, so shards
switch to bloom mode — 10 bits/URL = 12.5 GB across the cluster, ~256
shards → ~50 MB/shard, FP ~0.8% (a false positive means a URL is
wrongly skipped; the cuckoo-filter alternative gives exactness at
similar memory if required).  At test scale shards run exact+bloom in
tandem and count divergences, so the bloom path is continuously
verified against ground truth.

The client batches hashes per shard and issues one RPC per shard per
batch — RPC count is O(shards), not O(urls).
"""

from __future__ import annotations

from collections import defaultdict
from typing import List, Sequence

import numpy as np
import ray

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


class SeenShard:
    """One shard: exact set, bloom, and/or cuckoo filter over uint64
    hashes.  Modes: exact | bloom | cuckoo | tandem (exact + bloom,
    divergence-counted) | tandem_cuckoo (exact + cuckoo)."""

    def __init__(self, mode: str = "tandem", capacity: int = 1_000_000):
        self.mode = mode
        self.exact = (set() if mode in ("exact", "tandem", "tandem_cuckoo")
                      else None)
        self.bloom = (BloomFilter(capacity)
                      if mode in ("bloom", "tandem") else None)
        if mode in ("cuckoo", "tandem_cuckoo"):
            self.bloom = CuckooFilter(capacity)
        self.divergences = 0
        self.added = 0

    def add_batch(self, hashes: Sequence[int]):
        """Test-and-set: True = newly seen (caller should fetch).

        Accepts a list or a numpy uint64 array (workers ship arrays —
        zero-copy through the object store) and returns a numpy bool
        array.  Within-batch DUPLICATES keep exact sequential
        semantics at every mode: the batch dedups first (np.unique),
        only the first occurrence can be new.  Pure-bloom mode rides
        the vectorized test-and-set (BloomFilter.add_batch_unique);
        cuckoo keeps its per-key loop (stateful eviction)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if not h.size:
            return np.zeros(0, dtype=bool)
        uniq, first_idx, inv = np.unique(
            h, return_index=True, return_inverse=True)
        use_vec_bloom = (self.bloom is not None
                         and isinstance(self.bloom, BloomFilter))
        if self.exact is not None:
            ex = self.exact
            new_uniq = np.fromiter((int(u) not in ex for u in uniq),
                                   dtype=bool, count=uniq.size)
            ex.update(int(u) for u in uniq[new_uniq])
            if self.bloom is not None:
                if use_vec_bloom:
                    bl = self.bloom.add_batch_unique(uniq)
                else:
                    bl = np.fromiter((self.bloom.add(int(u)) for u in uniq),
                                     dtype=bool, count=uniq.size)
                self.divergences += int((bl != new_uniq).sum())
        elif use_vec_bloom:
            new_uniq = self.bloom.add_batch_unique(uniq)
        else:
            new_uniq = np.fromiter((self.bloom.add(int(u)) for u in uniq),
                                   dtype=bool, count=uniq.size)
        self.added += int(new_uniq.sum())
        # only the FIRST occurrence of a duplicated key may be new
        first_mask = np.zeros(h.size, dtype=bool)
        first_mask[first_idx] = True
        return new_uniq[inv] & first_mask

    def contains_batch(self, hashes: Sequence[int]) -> List[bool]:
        if self.exact is not None:
            return [int(h) in self.exact for h in hashes]
        return [int(h) in self.bloom for h in hashes]

    def stats(self) -> dict:
        return {"added": self.added, "divergences": self.divergences,
                "mode": self.mode,
                "bloom_bytes": self.bloom.approx_bytes if self.bloom else 0}


SeenShardActor = ray.remote(num_cpus=0.01)(SeenShard)


class SeenFilter:
    """Client over 2^shard_bits SeenShard actors."""

    def __init__(self, shard_bits: int = 3, mode: str = "tandem",
                 capacity_per_shard: int = 1_000_000):
        self.shard_bits = shard_bits
        self.num_shards = 1 << shard_bits
        self.shards = [
            SeenShardActor.remote(mode=mode, capacity=capacity_per_shard)
            for _ in range(self.num_shards)
        ]

    def _shard_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes >> np.uint64(64 - self.shard_bits)).astype(np.int64)

    def add_batch(self, hashes: Sequence[int]) -> np.ndarray:
        """Vector test-and-set preserving input order; one RPC/shard."""
        arr = np.asarray(hashes, dtype=np.uint64)
        if arr.size == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._shard_of(arr)
        groups = defaultdict(list)
        for idx, sid in enumerate(shard_ids):
            groups[int(sid)].append(idx)
        futures = {}
        for sid, idxs in groups.items():
            futures[sid] = self.shards[sid].add_batch.remote(arr[idxs])
        out = np.zeros(arr.size, dtype=bool)
        for sid, idxs in groups.items():
            res = ray.get(futures[sid])
            out[idxs] = res
        return out

    def stats(self) -> dict:
        shard_stats = ray.get([s.stats.remote() for s in self.shards])
        return {
            "added": sum(s["added"] for s in shard_stats),
            "divergences": sum(s["divergences"] for s in shard_stats),
            "shards": self.num_shards,
        }
