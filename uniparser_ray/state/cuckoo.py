"""Cuckoo filter over 64-bit hashes — the exactness-leaning
alternative to the bloom filter for the URL-seen shards.

Standard partial-key cuckoo hashing from the public literature
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014, see PAPERS.md): b=4 slots per bucket, f-bit fingerprints, the
alternate bucket derived by XOR with the fingerprint's hash, bounded
kickout chains.  Compared to bloom at the same bits/key it supports
deletion and a lower false-positive rate (~2^-(f-3) for b=4); at the
north rule's 10^10 keys a 16-bit fingerprint costs 2 bytes/key plus
slack — ~25 GB cluster-wide across shards.

The input is already a 64-bit blake2 digest (urlutil.url_hash64), so
fingerprint and bucket index come from disjoint bit ranges of the key
rather than a fresh hash pass.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, fingerprint_bits: int = 16,
                 seed: int = 0x9E3779B9):
        # size to ~84% max load => buckets >= capacity / (slots * 0.84)
        need = max(16, int(capacity / (_SLOTS * 0.84)) + 1)
        self.num_buckets = 1 << max(4, (need - 1).bit_length())
        self.fp_bits = fingerprint_bits
        self.fp_mask = (1 << fingerprint_bits) - 1
        self.seed = seed
        # 0 = empty slot
        self.table = np.zeros((self.num_buckets, _SLOTS), dtype=np.uint16
                              if fingerprint_bits <= 16 else np.uint32)
        self.count = 0
        self._rng = np.random.RandomState(seed & 0x7FFFFFFF)
        # graceful-degradation stash for items whose kickout chain
        # failed (~84%+ load): (canonical_bucket, fp) pairs.  Lookups
        # consult it, so an overfull filter degrades to a slightly
        # slower exact-ish set instead of killing the crawl round —
        # and the last evicted fingerprint is never silently dropped
        # (which would be a false negative -> re-fetch loop).
        self.overflow: set = set()

    def _fingerprint(self, h: int) -> int:
        fp = (h >> 48) & self.fp_mask
        return fp or 1  # 0 means empty

    def _index(self, h: int) -> int:
        return h & (self.num_buckets - 1)

    def _alt_index(self, i: int, fp: int) -> int:
        # alternate bucket = i XOR hash(fp) (multiply-shift mix)
        return (i ^ ((fp * self.seed) & 0xFFFFFFFF)) & (self.num_buckets - 1)

    def _canonical(self, i: int, fp: int) -> tuple:
        return (min(i, self._alt_index(i, fp)), fp)

    def __contains__(self, h: int) -> bool:
        h = int(h)
        fp = self._fingerprint(h)
        i1 = self._index(h)
        if fp in self.table[i1]:
            return True
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i2]:
            return True
        return bool(self.overflow) and self._canonical(i1, fp) in self.overflow

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(_SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, h: int) -> bool:
        """Test-and-set: True if (probably) new.  Raises RuntimeError
        when the filter is overfull (caller sizes capacity)."""
        h = int(h)
        if h in self:
            return False
        fp = self._fingerprint(h)
        i1 = self._index(h)
        i2 = self._alt_index(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            self.count += 1
            return True
        # kickout loop
        i = i1 if self._rng.rand() < 0.5 else i2
        for _ in range(_MAX_KICKS):
            s = self._rng.randint(_SLOTS)
            fp, self.table[i][s] = int(self.table[i][s]), fp
            i = self._alt_index(i, fp)
            if self._insert_at(i, fp):
                self.count += 1
                return True
        # overfull: the new item made it into the table along the
        # chain; the currently-displaced fingerprint is stashed in the
        # overflow set (graceful degradation, no false negative, no
        # crash mid-round — the caller should still size capacity up)
        self.overflow.add(self._canonical(i, fp))
        self.count += 1
        return True

    def delete(self, h: int) -> bool:
        h = int(h)
        fp = self._fingerprint(h)
        for i in (self._index(h), self._alt_index(self._index(h), fp)):
            row = self.table[i]
            for s in range(_SLOTS):
                if row[s] == fp:
                    row[s] = 0
                    self.count -= 1
                    return True
        key = self._canonical(self._index(h), fp)
        if key in self.overflow:
            self.overflow.discard(key)
            self.count -= 1
            return True
        return False

    def add_batch(self, hashes) -> list:
        return [self.add(int(h)) for h in hashes]

    @property
    def approx_bytes(self) -> int:
        return self.table.nbytes
