"""Shared vectorized token/shingle hashing for the text-sketch family.

Every sketch in this repo (minhash, simhash, rolling fingerprint,
jaccard inverted index) hashes *word shingles*.  This module defines
ONE hash construction, chosen so that it is simultaneously

* **vectorizable** — a whole batch of documents is hashed with a few
  numpy passes (no per-document Python loops, no per-shingle digest
  calls: only one md5 per *unique token* in the batch, amortized over
  the corpus' small vocabulary); and
* **oracle-expressible** — DuckDB can compute the identical values
  (``('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647`` plus
  BIGINT Horner folds), so minhash/simhash/rolling-fingerprint
  pipelines get true value-checked SQL oracles.

Construction (all arithmetic mod P = 2**31 - 1, base B = 1000003):

    tok_id(t)       = int(md5(t)[:15 hex], 16) mod P        (60->31 bit)
    shingle(h_0..k) = Horner fold: ((h_0*B + h_1) % P * B + h_2) % P ...
    minhash_i(doc)  = min over shingles s of (a_i*s + b_i) % P
    band_hash       = Horner fold of the band's signature values
    simhash bit j   = sign of sum over shingles of ±1 where
                      ((c_j*s + d_j) % P) & 1
    fp_rolling      = XOR of window (w=8) Horner hashes

The 31-bit domain keeps every product below 2**62, so both numpy
uint64 and DuckDB BIGINT evaluate it exactly.  Docs shorter than the
window/shingle width contribute one fold over all their tokens; empty
docs hash to 0.

Sketch designs from the public literature: MinHash (Broder 1997),
banded LSH (MMDS ch.3), SimHash (Charikar 2002).
"""

from __future__ import annotations

import hashlib
from typing import Sequence, Tuple

import numpy as np

P31 = np.uint64(2147483647)   # 2**31 - 1 (Mersenne prime)
HB = np.uint64(1000003)       # Horner base

MINHASH_SEED = 42
SIMHASH_SEED = 1337


def affine_params(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """n deterministic (a, b) pairs, a in [1, P), b in [0, P) — the
    same values are embedded as literals in the DuckDB oracle SQL."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, int(P31), size=n).astype(np.uint64)
    b = rng.randint(0, int(P31), size=n).astype(np.uint64)
    return a, b


def token_id(token: str) -> int:
    """31-bit md5-derived token id (DuckDB-reproducible)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) \
        % int(P31)


def batch_token_ids(texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """All texts' whitespace tokens hashed to 31-bit ids.

    Returns (flat_ids: uint64[N], offsets: int64[ndocs+1]); only the
    batch's *unique* tokens are md5-hashed (one digest per vocab word).
    """
    toks = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, count=len(toks))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat = [w for ts in toks for w in ts]
    if not flat:
        return np.zeros(0, np.uint64), offsets
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    ids = np.fromiter((token_id(w) for w in uniq), np.uint64, count=len(uniq))
    return ids[inv], offsets


def _horner(ids: np.ndarray, base: np.uint64 = HB) -> int:
    acc = np.uint64(0)
    for v in ids:
        acc = (acc * base + v) % P31
    return int(acc)


HB2 = np.uint64(999983)  # second Horner base (62-bit combined hashes)


def window_hashes(flat: np.ndarray, offsets: np.ndarray,
                  k: int, base: np.uint64 = HB) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc sliding-window Horner hashes of width ``k``.

    Returns (hashes: uint64[M], counts: int64[ndocs]) where doc d's
    hashes are the contiguous slice given by cumsum(counts).  Docs with
    0 < n < k contribute one fold over all n tokens; empty docs 0
    hashes.  Fully vectorized over the batch except the rare short-doc
    patch.
    """
    ndocs = len(offsets) - 1
    lens = np.diff(offsets)
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    N = len(flat)
    if N >= k:
        h = flat[:N - k + 1].copy()
        for i in range(1, k):
            h = (h * base + flat[i:N - k + 1 + i]) % P31
    else:
        h = np.zeros(0, np.uint64)
    out = np.zeros(int(counts.sum()), np.uint64)
    pos = 0
    for d in range(ndocs):
        n = int(lens[d])
        c = int(counts[d])
        if c == 0:
            continue
        if n >= k:
            out[pos:pos + c] = h[offsets[d]:offsets[d] + c]
        else:
            out[pos] = _horner(flat[offsets[d]:offsets[d + 1]], base)
        pos += c
    return out, counts


def shingle_hashes(texts: Sequence[str],
                   k: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes, per-doc counts) for word k-shingles."""
    flat, offsets = batch_token_ids(texts)
    return window_hashes(flat, offsets, k)


def shingle_hashes62(texts: Sequence[str],
                     k: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """62-bit combined shingle hashes (two independent Horner bases)
    for exact-jaccard inverted indexes, where 31-bit collisions would
    perturb reported similarity values."""
    flat, offsets = batch_token_ids(texts)
    h1, counts = window_hashes(flat, offsets, k, HB)
    h2, _ = window_hashes(flat, offsets, k, HB2)
    return (h1 << np.uint64(31)) | h2, counts


def _seg_starts(counts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """reduceat start indices for the non-empty segments."""
    ends = np.cumsum(counts)
    starts = ends - counts
    nz = counts > 0
    return starts[nz], nz


def minhash_signatures(sh: np.ndarray, counts: np.ndarray,
                       num_perm: int = 64,
                       seed: int = MINHASH_SEED) -> np.ndarray:
    """(ndocs, num_perm) uint64 minhash signatures via one numpy grid +
    segmented min; docs with no shingles sign as all-zero."""
    a, b = affine_params(num_perm, seed)
    sig = np.zeros((len(counts), num_perm), np.uint64)
    if len(sh):
        grid = (sh[:, None] * a[None, :] + b[None, :]) % P31
        starts, nz = _seg_starts(counts)
        sig[nz] = np.minimum.reduceat(grid, starts, axis=0)
    return sig


def band_hashes(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(ndocs, num_bands) Horner band keys over the signature rows."""
    ndocs, num_perm = sig.shape
    r = num_perm // num_bands
    chunks = sig.reshape(ndocs, num_bands, r)
    acc = np.zeros((ndocs, num_bands), np.uint64)
    for i in range(r):
        acc = (acc * HB + chunks[:, :, i]) % P31
    return acc


def simhash_values(sh: np.ndarray, counts: np.ndarray,
                   seed: int = SIMHASH_SEED) -> np.ndarray:
    """(ndocs,) uint64 simhash — 64 affine-derived parity bits per
    shingle, per-doc signed sums, bit j set iff sum > 0."""
    c, d = affine_params(64, seed)
    acc = np.zeros((len(counts), 64), np.int64)
    if len(sh):
        bits = (((sh[:, None] * c[None, :] + d[None, :]) % P31)
                & np.uint64(1)).astype(np.int64) * 2 - 1
        starts, nz = _seg_starts(counts)
        acc[nz] = np.add.reduceat(bits, starts, axis=0)
    pows = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return ((acc > 0).astype(np.uint64) * pows).sum(axis=1, dtype=np.uint64)


def rolling_fingerprints(texts: Sequence[str], window: int = 8) -> np.ndarray:
    """(ndocs,) uint64 rolling fingerprint: XOR of width-8 token-window
    Horner hashes (order-sensitive, local-shift tolerant)."""
    flat, offsets = batch_token_ids(texts)
    wh, counts = window_hashes(flat, offsets, window)
    out = np.zeros(len(counts), np.uint64)
    starts, nz = _seg_starts(counts)
    if len(wh):
        out[nz] = np.bitwise_xor.reduceat(wh, starts)
    return out


def to_int64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 values as int64 (two's complement) for
    storage in Arrow int64 columns."""
    return u.astype(np.uint64).view(np.int64)
