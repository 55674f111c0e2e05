"""Deduplication operators over document tables.

Five families, each idiomatic Ray Data:

* **exact** — content-hash inside ``map_batches`` (vectorized md5),
  then ``groupby(hash)`` keeping the smallest doc_id.  The groupby is
  the only shuffle, over (hash, doc_id) pairs — never the text.
* **MinHash + LSH** — per-batch shingling → minhash signatures →
  explode to (band_id, band_hash, doc_id) rows → shuffle is a
  ``groupby`` over tiny band rows → candidate pairs inside groups →
  verified by exact shingle-Jaccard.
* **SimHash** — 64-bit simhash, bucket by rotated prefixes, verify
  Hamming distance inside buckets.
* **n-gram Jaccard** — the verifier used by LSH, exposed standalone
  for small candidate sets.
* **embedding cosine** — near-dup via normalized-embedding matmul
  against LSH-ish random-hyperplane buckets.

At 100 TB: signatures are ~100 bytes/doc, so every shuffle here moves
signatures — not documents; the band groupby fans in >=1000x smaller
data than the input.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_int(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_text_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    hashes = [_md5_int(t) for t in batch[column].to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup_groups(ds, text_column: str = "text", id_column: str = "doc_id"):
    """(text_hash, keeper_id, dup_count): one row per distinct content."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pa.array([_md5_int(t) for t in b[text_column].to_pylist()],
                      pa.string()), b[id_column]],
            names=["text_hash", id_column]),
        batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min(id_column, alias_name="keeper_id"),
        Count(alias_name="dup_count"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def _shingles(text: str, k: int = 3) -> List[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _hash64(s: str) -> np.uint64:
    return np.uint64(int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"))


class MinHashStage:
    """Per-batch minhash signatures + banded LSH keys.

    Emits (doc_id, band_id, band_hash) rows — num_bands per doc."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16,
                 shingle_k: int = 3, seed: int = 42):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        base = np.fromiter((_hash64(s) for s in sh), dtype=np.uint64,
                           count=len(sh))
        # vectorized (a*x + b) mod p over the shingle x permutation grid
        vals = (base[:, None] * self.a[None, :] + self.b[None, :]) \
            % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = self.signature(text)
            for band in range(self.num_bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(int.from_bytes(bh, "big") >> 1)
        return pa.Table.from_arrays([
            pa.array(doc_ids, pa.int64()),
            pa.array(band_ids, pa.int32()),
            pa.array(band_hashes, pa.int64()),
        ], names=["doc_id", "band_id", "band_hash"])


def minhash_candidate_pairs(ds, num_perm: int = 64, num_bands: int = 16,
                            concurrency: int = 4):
    """documents -> distinct candidate (doc_a, doc_b) pairs via LSH.

    The groupby moves only (band, doc_id) rows; candidate pairs emerge
    per bucket and are distinct-ed by a second tiny groupby."""
    bands = ds.map_batches(
        MinHashStage, batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands},
        concurrency=concurrency)

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs_of_group, batch_format="pandas")
    from ray.data.aggregate import Count
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands"))


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_neardup_pairs(ds, threshold: float = 0.7, num_perm: int = 64,
                          num_bands: int = 16, concurrency: int = 4):
    """Full near-dup pipeline: LSH candidates -> exact-Jaccard verify.

    The verify stage broadcasts the candidate doc texts via ``ray.put``
    (the candidate set is orders of magnitude smaller than the corpus);
    at larger candidate volumes swap for a hash-bucketed self-join."""
    import ray

    cands = minhash_candidate_pairs(ds, num_perm, num_bands, concurrency)
    cand_tbl = cands.to_pandas()
    if not len(cand_tbl):
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard_sim": pa.array([], pa.float64())})
    need_ids = set(cand_tbl["doc_a"]) | set(cand_tbl["doc_b"])
    texts = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for doc_id, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if doc_id in need_ids:
                texts[doc_id] = text
    texts_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        sims = [jaccard(tx[a], tx[b])
                for a, b in zip(batch["doc_a"].to_pylist(),
                                batch["doc_b"].to_pylist())]
        out = batch.append_column("jaccard_sim",
                                  pa.array(np.round(sims, 6), pa.float64()))
        return out.filter(pa.array([s >= threshold for s in sims]))

    import ray.data as rd
    verified = rd.from_pandas(cand_tbl).map_batches(verify,
                                                    batch_format="pyarrow")
    out = verified.to_pandas().sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out[["doc_a", "doc_b", "jaccard_sim"]],
                                preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_neardup_pairs(ds, max_hamming: int = 3, concurrency: int = 4):
    """SimHash + 4-block bucketing (pigeonhole: any pair within Hamming
    distance 3 shares at least one of 4 16-bit blocks)."""
    from .text import simhash_batch

    sims = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def blocks(batch: pa.Table) -> pa.Table:
        doc_ids, block_ids, keys, hashes = [], [], [], []
        for doc_id, sh in zip(batch["doc_id"].to_pylist(),
                              batch["simhash"].to_pylist()):
            u = np.uint64(sh).item() & 0xFFFFFFFFFFFFFFFF
            for blk in range(4):
                doc_ids.append(doc_id)
                block_ids.append(blk)
                keys.append((u >> (16 * blk)) & 0xFFFF)
                hashes.append(sh)
        return pa.Table.from_arrays([
            pa.array(doc_ids, pa.int64()), pa.array(block_ids, pa.int32()),
            pa.array(keys, pa.int64()), pa.array(hashes, pa.int64())],
            names=["doc_id", "block_id", "block_key", "simhash"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"], g["simhash"])))
        out_a, out_b, dist = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((np.uint64(rows[i][1]).item() & 0xFFFFFFFFFFFFFFFF)
                        ^ (np.uint64(rows[j][1]).item() & 0xFFFFFFFFFFFFFFFF)
                        ).count("1")
                if d <= max_hamming:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
                    dist.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": dist})

    from ray.data.aggregate import Min
    return sims.map_batches(blocks, batch_format="pyarrow") \
        .groupby(["block_id", "block_key"]) \
        .map_groups(pairs, batch_format="pandas") \
        .groupby(["doc_a", "doc_b"]).aggregate(Min("hamming",
                                                   alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(ds, threshold: float = 0.95, num_planes: int = 8,
                            seed: int = 42):
    """Near-dup vectors via random-hyperplane buckets + in-bucket
    cosine verify (the scale path for embedding dedup: the shuffle
    moves (bucket, id, vec) rows, buckets shrink candidate sets
    ~2^planes-fold)."""
    rng = np.random.RandomState(seed)
    planes = None

    def bucketize(batch: pa.Table) -> pa.Table:
        nonlocal planes
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        if planes is None:
            planes_local = np.random.RandomState(seed).randn(
                vecs.shape[1], num_planes)
        else:
            planes_local = planes
        signs = (vecs @ planes_local) > 0
        buckets = (signs * (1 << np.arange(num_planes))).sum(axis=1)
        return pa.Table.from_arrays([
            batch["vec_id"], pa.array(buckets, pa.int64()),
            batch["embedding"]],
            names=["vec_id", "bucket", "embedding"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].tolist()
        vecs = np.array(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        unit = vecs / norms
        sim = unit @ unit.T
        out_a, out_b, sims = [], [], []
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if sim[i, j] >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    sims.append(round(float(sim[i, j]), 6))
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b,
                             "cosine_sim": sims})

    from ray.data.aggregate import Max
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas") \
        .groupby(["vec_a", "vec_b"]).aggregate(
            Max("cosine_sim", alias_name="cosine_sim"))
