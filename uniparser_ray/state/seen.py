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

    def add_batch(self, hashes: Sequence[int]) -> List[bool]:
        """Test-and-set: True = newly seen (caller should fetch)."""
        out = []
        for h in hashes:
            h = int(h)
            if self.exact is not None:
                new_exact = h not in self.exact
                if new_exact:
                    self.exact.add(h)
                if self.bloom is not None:
                    new_bloom = self.bloom.add(h)
                    if new_bloom != new_exact:
                        self.divergences += 1
                new = new_exact
            else:
                new = self.bloom.add(h)
            if new:
                self.added += 1
            out.append(new)
        return out

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
            futures[sid] = self.shards[sid].add_batch.remote(
                arr[idxs].tolist())
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
