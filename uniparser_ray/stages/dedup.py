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

Sketch designs are from the public literature: MinHash (Broder, "On
the resemblance and containment of documents", 1997), banded LSH
(Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3), SimHash
(Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002; Manku et al., WWW 2007 for the Hamming-block
trick), and the bloom-filter collections / vacuum-filter VLDB papers
listed in PAPERS.md.
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
    """(text_hash, keeper_id, dup_count): one row per distinct content.
    Only (hash, id) pairs shuffle — never the text."""
    from .combine import grouped_aggregate

    hashed = ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pa.array([_md5_int(t) for t in b[text_column].to_pylist()],
                      pa.string()), b[id_column]],
            names=["text_hash", id_column]),
        batch_format="pyarrow")
    return grouped_aggregate(hashed, ["text_hash"],
                             {"keeper_id": (id_column, "min"),
                              "dup_count": (id_column, "count")})


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

    Shuffles only (band, doc_id) rows, bucketed by band hash; pairs
    emerge from a vectorized per-bucket self-merge and are distinct-ed
    by a second bucketed aggregate."""
    from .combine import grouped_aggregate, hash_bucket_combine

    from .taskcache import cached_stage
    bands = ds.map_batches(
        cached_stage(MinHashStage, num_perm=num_perm, num_bands=num_bands),
        batch_format="pyarrow")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"doc_a": m["doc_id_x"].to_numpy(),
                             "doc_b": m["doc_id_y"].to_numpy()})

    pairs = hash_bucket_combine(bands, ["band_id", "band_hash"],
                                pairs_of_bucket)
    return grouped_aggregate(pairs, ["doc_a", "doc_b"],
                             {"n_bands": ("doc_a", "count")})


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
    need_ref = ray.put(need_ids)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"].isin(ray.get(need_ref))]

    # stream the corpus against the candidate-id broadcast — only the
    # candidates' texts ever reach the driver
    cand_texts = ds.map_batches(pick, batch_format="pandas").to_pandas()
    texts = dict(zip(cand_texts["doc_id"], cand_texts["text"]))
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


def popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (unpackbits over bytes)."""
    bytes_view = arr.astype(np.uint64).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


def hamming_block_pairs(ds, id_col: str, hash_col: str, max_hamming: int,
                        num_blocks: int = 4, out_prefix: str = "doc"):
    """Generic Hamming-near-dup over a 64-bit signature column: bucket
    by 16-bit signature blocks (pigeonhole: any pair within distance
    num_blocks-1 shares a block), verify distance vectorized inside
    buckets, distinct via bucketed aggregate."""
    from .combine import grouped_aggregate, hash_bucket_combine

    a_col, b_col = f"{out_prefix}_a", f"{out_prefix}_b"
    width = 64 // num_blocks
    mask = (1 << width) - 1

    def blocks(df: pd.DataFrame) -> pd.DataFrame:
        u = df[hash_col].to_numpy().astype(np.uint64)
        frames = []
        for blk in range(num_blocks):
            frames.append(pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "block_id": blk,
                "block_key": ((u >> np.uint64(width * blk))
                              & np.uint64(mask)).astype(np.int64),
                hash_col: df[hash_col].to_numpy(),
            }))
        return pd.concat(frames, ignore_index=True)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col, "block_id", "block_key"])
        m = g.merge(g, on=["block_id", "block_key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if not len(m):
            return pd.DataFrame({a_col: [], b_col: [], "hamming": []})
        xor = (m[f"{hash_col}_x"].to_numpy().astype(np.uint64)
               ^ m[f"{hash_col}_y"].to_numpy().astype(np.uint64))
        d = popcount64(xor)
        keep = d <= max_hamming
        return pd.DataFrame({a_col: m[f"{id_col}_x"].to_numpy()[keep],
                             b_col: m[f"{id_col}_y"].to_numpy()[keep],
                             "hamming": d[keep]})

    candidates = ds.map_batches(blocks, batch_format="pandas")
    pairs = hash_bucket_combine(candidates, ["block_id", "block_key"],
                                pairs_of_bucket)
    return grouped_aggregate(pairs, [a_col, b_col],
                             {"hamming": ("hamming", "min")})


def simhash_neardup_pairs(ds, max_hamming: int = 3, concurrency: int = 4):
    """SimHash + 4-block bucketing (pigeonhole: any pair within Hamming
    distance 3 shares at least one of 4 16-bit blocks)."""
    from .text import simhash_batch

    sims = ds.map_batches(simhash_batch, batch_format="pyarrow")
    return hamming_block_pairs(sims, "doc_id", "simhash", max_hamming)


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
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        vecs = np.array(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        unit = vecs / norms
        sim = unit @ unit.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sim[ii, jj] >= threshold
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame({"vec_a": ids[ii], "vec_b": ids[jj],
                             "cosine_sim": np.round(sim[ii, jj], 6)})

    from .combine import grouped_aggregate
    bucketed = ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
    return grouped_aggregate(bucketed, ["vec_a", "vec_b"],
                             {"cosine_sim": ("cosine_sim", "max")})


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted-index join (SQL-checkable)
# ---------------------------------------------------------------------------


def jaccard_pairs(ds, threshold: float = 0.5, shingle_k: int = 3):
    """All pairs with shingle-Jaccard >= threshold, computed exactly:

    1. explode docs into distinct (shingle_hash, doc_id) rows — the
       inverted index; only ~8-byte hashes + ids shuffle, never text;
    2. bucket by shingle hash, self-merge per bucket -> per-shingle
       co-occurring pairs, then a global grouped sum -> n_shared;
    3. jaccard = n_shared / (|A| + |B| - n_shared) with per-doc
       shingle counts broadcast (tiny).

    This is the exact twin of the MinHash+LSH pipeline (same shingles)
    and is verified value-for-value against a DuckDB oracle.
    """
    import ray
    from .combine import grouped_aggregate, hash_bucket_combine

    def shingle_rows(batch: pa.Table) -> pa.Table:
        doc_ids, hashes = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for s in set(_shingles(text, shingle_k)):
                doc_ids.append(doc_id)
                hashes.append(int(_hash64(s)))
        return pa.Table.from_arrays([
            pa.array(doc_ids, pa.int64()),
            pa.array(hashes, pa.uint64())],
            names=["doc_id", "shingle_hash"])

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow")

    # per-doc distinct-shingle counts (tiny: one row per doc)
    counts = grouped_aggregate(sh, ["doc_id"],
                               {"c": ("shingle_hash", "count")}).to_pandas()
    count_of = dict(zip(counts["doc_id"], counts["c"]))
    counts_ref = ray.put(count_of)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle_hash")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"], sort=False) \
            .size().reset_index(name="n_shared")
        return out.rename(columns={"doc_id_x": "doc_a",
                                   "doc_id_y": "doc_b"})

    partial_pairs = hash_bucket_combine(sh, ["shingle_hash"],
                                        pairs_of_bucket)
    pairs = grouped_aggregate(partial_pairs, ["doc_a", "doc_b"],
                              {"n_shared": ("n_shared", "sum")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cnt = ray.get(counts_ref)
        ca = df["doc_a"].map(cnt).to_numpy(dtype=np.float64)
        cb = df["doc_b"].map(cnt).to_numpy(dtype=np.float64)
        n = df["n_shared"].to_numpy(dtype=np.float64)
        sim = n / (ca + cb - n)
        df = df.assign(jaccard_sim=np.round(sim, 6))
        df = df[sim >= threshold]
        df["doc_a"] = df["doc_a"].astype("int64")
        df["doc_b"] = df["doc_b"].astype("int64")
        return df[["doc_a", "doc_b", "jaccard_sim"]]

    return pairs.map_batches(finish, batch_format="pandas")
