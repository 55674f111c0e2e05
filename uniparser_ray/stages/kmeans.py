"""Integer-exact distributed k-means (Lloyd's algorithm) + SemDeDup-style
cluster-then-dedup over the ``embeddings`` table.

The whole computation is carried out in INTEGER arithmetic so that the
DuckDB oracle reproduces it bit-for-bit — the float version's argmin
can flip on summation-order ulps, which no rounding discipline fixes
once centroid updates feed back into the next iteration:

* quantize:  q_i = floor(1000 * x_i + 0.5) + OFFSET  (OFFSET makes all
  coordinates non-negative, so integer floor-division below is the
  same operation in numpy ``//`` and DuckDB ``//`` — both truncate,
  and truncation == floor for non-negatives.  Shifting every vector by
  a constant leaves all pairwise distances, and therefore k-means,
  unchanged.)
* assign:    argmin_j  sum_i (q_i - c_ji)^2   (exact int64; ties break
  to the smallest cluster id)
* update:    c_ji = (2*S_ji + n_j) // (2*n_j)  — the rounded-to-nearest
  integer mean computed without any float division; empty clusters
  keep their previous centroid.

Distributed shape (the one that holds at 100 TB): centroids are tiny
(k x dim ints) and live on the driver; every iteration is ONE
shuffle-free ``map_batches`` pass emitting per-batch partial sums
(k rows per batch), combined on the driver.  No vector ever moves
between workers; only k x dim partial sums do.  Lloyd's algorithm and
SemDeDup (Abbas et al. 2023) are public literature.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

QUANT_SCALE = 1000      # k-means coordinate quantization
QUANT_OFFSET = 4000     # makes quantized coords non-negative (|x| < 4)
COS_SCALE = 100         # semdedup cosine quantization (keeps all the
                        # integer products below 2**63)


def quantize(vecs: np.ndarray, scale: int, offset: int = 0) -> np.ndarray:
    """floor(scale*x + 0.5) + offset as int64 — float->double is exact,
    scale/floor are IEEE ops both engines share."""
    q = np.floor(vecs.astype(np.float64) * scale + 0.5).astype(np.int64)
    return q + offset


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, dist2) per row: exact int64 argmin, ties -> smallest j."""
    d = q[:, None, :] - cents[None, :, :]
    d2 = np.einsum("bjd,bjd->bj", d, d)
    cl = np.argmin(d2, axis=1)          # first minimum = smallest j
    return cl.astype(np.int64), d2[np.arange(len(q)), cl].astype(np.int64)


def update_centroids(sums: np.ndarray, counts: np.ndarray,
                     prev: np.ndarray) -> np.ndarray:
    """Rounded integer mean (2S + n) // (2n); empty clusters keep the
    previous centroid.  All values non-negative, so // == floor."""
    out = prev.copy()
    nz = counts > 0
    n = counts[nz][:, None]
    out[nz] = (2 * sums[nz] + n) // (2 * n)
    return out


def batch_quantized(batch: pa.Table,
                    dim: int = None) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    if not len(ids):
        # an empty block's list column collapses to shape (0,) — keep
        # the (0, dim) 2-d contract the assign kernel needs
        return ids, np.zeros((0, dim or 0), np.int64)
    vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, quantize(vecs, QUANT_SCALE, QUANT_OFFSET)


def make_partial_fn(cents_ref) -> Callable[[pa.Table], pa.Table]:
    """Per-batch partial sums for one Lloyd iteration: k rows of
    (cluster, coordinate sums, member count) — the only thing that
    crosses the wire."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        _, q = batch_quantized(batch, dim=cents.shape[1])
        cl, _ = _assign(q, cents)
        k, dim = cents.shape
        sums = np.zeros((k, dim), np.int64)
        np.add.at(sums, cl, q)
        counts = np.bincount(cl, minlength=k).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.arange(k), pa.int64()),
             pa.array(sums.tolist(), pa.list_(pa.int64())),
             pa.array(counts, pa.int64())],
            names=["cluster", "vec_sum", "n"])

    return partial


def make_assign_fn(cents_ref, keep_vec: bool = False
                   ) -> Callable[[pa.Table], pa.Table]:
    """Final labeling pass: (vec_id, cluster, dist2) — dist2 is an
    exact integer, so the oracle hash-matches it."""
    import ray

    def label(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        ids, q = batch_quantized(batch, dim=cents.shape[1])
        cl, d2 = _assign(q, cents)
        cols = [pa.array(ids, pa.int64()), pa.array(cl, pa.int64()),
                pa.array(d2, pa.int64())]
        names = ["vec_id", "cluster", "dist2"]
        if keep_vec:
            # the COSINE-scale quantization rides along for semdedup's
            # in-cluster pass (no second read of the vector table)
            if len(ids):
                vecs = np.array(batch["embedding"].to_pylist(),
                                dtype=np.float64)
                qcos = quantize(vecs, COS_SCALE)
            else:
                qcos = np.zeros((0, cents.shape[1]), np.int64)
            cols.append(pa.array(qcos.tolist(), pa.list_(pa.int64())))
            names.append("qv")
        return pa.Table.from_arrays(cols, names=names)

    return label


def combine_partials(parts, k: int, dim: int,
                     prev: np.ndarray) -> np.ndarray:
    """Driver-side fold of the per-batch partial rows (k rows per
    batch — bytes, not data)."""
    sums = np.zeros((k, dim), np.int64)
    counts = np.zeros(k, np.int64)
    for row in parts:
        j = int(row["cluster"])
        sums[j] += np.asarray(row["vec_sum"], dtype=np.int64)
        counts[j] += int(row["n"])
    return update_centroids(sums, counts, prev)


# ---------------------------------------------------------------------------
# product quantization (Jégou et al. 2011, public literature): the
# dim-d vector splits into nsub contiguous subvectors, each quantized
# by its OWN integer-Lloyd codebook; a vector compresses to nsub small
# codes and search runs in the compressed domain (ADC: per-query
# distance lookup tables over the codebooks, summed across subspaces).
# All arithmetic stays in the same int64 quantized domain as k-means,
# so codes, LUTs and ADC distances are bit-identical in the SQL twin.


def make_pq_partial_fn(cents_ref) -> Callable[[pa.Table], pa.Table]:
    """One Lloyd iteration for ALL subspaces in one pass: rows of
    (sub, cluster, coordinate sums, member count) — nsub x ksub rows
    per batch cross the wire, never a vector."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)          # (nsub, ksub, subdim)
        nsub, ksub, sd = cents.shape
        _, q = batch_quantized(batch, dim=nsub * sd)
        subs, cls, sums_l, ns = [], [], [], []
        for s in range(nsub):
            qs = q[:, s * sd:(s + 1) * sd]
            cl, _ = _assign(qs, cents[s])
            sums = np.zeros((ksub, sd), np.int64)
            np.add.at(sums, cl, qs)
            subs.append(np.full(ksub, s, np.int64))
            cls.append(np.arange(ksub, dtype=np.int64))
            sums_l.append(sums)
            ns.append(np.bincount(cl, minlength=ksub).astype(np.int64))
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(subs), pa.int64()),
             pa.array(np.concatenate(cls), pa.int64()),
             pa.array(np.concatenate(sums_l).tolist(),
                      pa.list_(pa.int64())),
             pa.array(np.concatenate(ns), pa.int64())],
            names=["sub", "cluster", "vec_sum", "n"])

    return partial


def make_pq_encode_fn(cents_ref) -> Callable[[pa.Table], pa.Table]:
    """Compression pass: (vec_id, codes list<int64> of length nsub) —
    the raw vector is DROPPED here; everything downstream runs on
    codes (8 ints/vector instead of 64 floats)."""
    import ray

    def encode(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        nsub, ksub, sd = cents.shape
        ids, q = batch_quantized(batch, dim=nsub * sd)
        if not len(ids):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.int64()))],
                names=["vec_id", "codes"])
        codes = np.stack(
            [_assign(q[:, s * sd:(s + 1) * sd], cents[s])[0]
             for s in range(nsub)], axis=1)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(codes.tolist(), pa.list_(pa.int64()))],
            names=["vec_id", "codes"])

    return encode


def pq_luts(q_quant: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(nq, nsub, ksub) int64 ADC lookup tables: exact squared L2 from
    each query's subvector to every codebook entry."""
    nsub, ksub, sd = cents.shape
    nq = len(q_quant)
    luts = np.zeros((nq, nsub, ksub), np.int64)
    for s in range(nsub):
        qs = q_quant[:, s * sd:(s + 1) * sd]
        d = qs[:, None, :] - cents[s][None, :, :]
        luts[:, s, :] = np.einsum("qkd,qkd->qk", d, d)
    return luts


def semdedup_group(df, threshold_bp2: int = 1225) -> "pa.Table":
    """In-cluster near-dup pairs under the QUANTIZED-cosine test:
    dot > 0 and 10000*dot^2 >= threshold_bp2 * |a|^2 * |b|^2
    (threshold_bp2 = (100*tau)^2, default tau=0.35).  Exact integer
    comparison — identical in numpy and the SQL twin."""
    ids = df["vec_id"].to_numpy().astype(np.int64)
    q = np.array(df["qv"].tolist(), dtype=np.int64)
    cluster = int(df["cluster"].iloc[0])
    dots = q @ q.T
    norms = np.einsum("ij,ij->i", q, q)
    lhs = 10000 * dots * dots
    rhs = threshold_bp2 * norms[:, None] * norms[None, :]
    ok = (dots > 0) & (lhs >= rhs)
    ii, jj = np.nonzero(ok & (ids[None, :] > ids[:, None]))
    return pa.Table.from_arrays(
        [pa.array(ids[ii], pa.int64()), pa.array(ids[jj], pa.int64()),
         pa.array(np.full(len(ii), cluster, np.int64), pa.int64())],
        names=["vec_a", "vec_b", "cluster"])
