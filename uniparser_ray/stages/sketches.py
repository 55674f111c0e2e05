"""Mergeable sketch + rank statistics stages.

Two families a 100 TB training-data pipeline needs beyond plain
aggregates:

* **HyperLogLog distinct-count** (Flajolet et al. 2007): per-batch
  partial registers are tiny (m ints) and merge by elementwise MAX, so
  the shuffle moves O(batches x m) rows no matter how many raw rows
  stream through.  The hash is the repo's md5-derived 31-bit
  construction (`stages/tokenhash.py`), so the registers are
  bit-identical in DuckDB SQL — the approximate sketch itself gets a
  value-checked oracle, not just its exhaustive twin.

* **Exact distributed quantiles** by iterative histogram refinement
  (the classic external-memory selection algorithm): each pass streams
  the column once and keeps only B bucket counts on the driver; the
  target rank's bucket becomes the next pass's range.  When the
  candidate range holds fewer than ``collect_limit`` rows they are
  pulled and selected exactly.  O(log_B(n)) passes, driver state O(B)
  — no global sort, no full materialization.  The grouped form runs
  every (group, q) range through the SAME shared passes, so per-group
  quantiles cost the same number of streaming scans as global ones
  (driver state O(groups x qs x B) — for low-cardinality group keys;
  a high-cardinality key should use the per-bucket sort instead).

Reference repo has no statistics layer; these follow the public
literature only.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd

P31 = 2147483647          # 2**31 - 1, same domain as stages/tokenhash
HLL_BUCKET_BITS = 6       # m = 64 registers
HLL_M = 1 << HLL_BUCKET_BITS
HLL_REM_BITS = 25         # 31-bit hash minus 6 bucket bits
_POW2 = (2 ** np.arange(HLL_REM_BITS + 1)).astype(np.uint64)


def hash31(values) -> np.ndarray:
    """md5-derived 31-bit hash of each value's string form — identical
    to DuckDB ``('0x' || substr(md5(CAST(v AS VARCHAR)),1,15))::BIGINT
    % 2147483647``.  One digest per UNIQUE value in the batch."""
    arr = np.asarray([str(v) for v in values], dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    ids = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:15], 16) % P31
         for u in uniq), np.uint64, count=len(uniq))
    return ids[inv]


def hll_partial(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """31-bit hashes -> (bucket, rho) per hash.

    bucket = h % 64; rem = h // 64 (25 bits); rho = leading zeros of
    rem + 1 = 26 - bit_length(rem), with rem == 0 -> 26.  bit_length
    via exact integer searchsorted (no float log2 rounding risk)."""
    bucket = (hashes % HLL_M).astype(np.int64)
    rem = (hashes // HLL_M).astype(np.uint64)
    bl = np.searchsorted(_POW2, rem, side="right").astype(np.int64)
    rho = (HLL_REM_BITS + 1) - bl
    return bucket, rho


def hll_estimate(registers: np.ndarray, m: int = HLL_M) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction; registers is a dense length-m int array (0 = empty)."""
    regs = np.zeros(m, dtype=np.float64)
    regs[:len(registers)] = registers
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(2.0 ** -regs)
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(raw)


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter partials (Misra & Gries 1982 / the summary
# form of Metwally et al.'s SpaceSaving — public literature)


def mg_compress(keys: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Compress exact per-batch (key, count) pairs to at most
    ``capacity`` entries plus a scalar error bound.

    Keeps the ``capacity`` largest counts; every dropped key's batch
    count is <= ``err`` (the (capacity+1)-th largest), so summing kept
    counts across batches gives a LOWER bound per key and
    sum-of-errs an upper-bound slack E: true(key) <= lower(key) + E
    for every key, including keys dropped in every batch (true <= E).
    Ties break deterministically by key ascending (np.unique emits
    sorted keys; the mergesort is stable)."""
    if len(keys) <= capacity:
        return keys, counts, 0
    order = np.argsort(-counts, kind="mergesort")
    err = int(counts[order[capacity]])
    keep = np.sort(order[:capacity])
    return keys[keep], counts[keep], err


# ---------------------------------------------------------------------------
# exact distributed quantiles (optionally grouped)

_ALL = "__all__"   # sentinel group for the ungrouped form


def exact_quantiles(ds, column: str, qs: Sequence[float], by: str = None,
                    num_hist_buckets: int = 2048,
                    collect_limit: int = 200_000,
                    max_passes: int = 12) -> pd.DataFrame:
    """Exact discrete quantiles of ``ds[column]`` (DuckDB
    ``quantile_disc`` semantics: 0-based rank ``ceil(n*q) - 1`` of the
    sorted column), optionally per group ``by``, without a global sort.

    Each refinement pass is ONE streaming ``map_batches`` over the
    input producing per-batch histogram counts for every still-active
    (group, q) range; the driver folds them (O(B) ints per range) and
    narrows each range to the bucket containing its rank.  Duplicate-
    heavy skew converges too: a bucket whose value min == max holds one
    distinct value and resolves immediately.  The final step filters
    the surviving ranges (``<= collect_limit`` rows each by
    construction) and selects exactly.

    Returns DataFrame (by?, q: float64, value: float64).
    """
    qs = sorted(qs)
    B = num_hist_buckets

    # pass 0: per-group n / min / max (groups assumed low-cardinality)
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df[by] if by else pd.Series(_ALL, index=df.index)
        agg = df.assign(_g=g).groupby("_g", sort=False)[column] \
            .agg(n="size", lo="min", hi="max").reset_index()
        return agg

    st = ds.map_batches(stats, batch_format="pandas").to_pandas() \
        .groupby("_g", sort=True).agg(n=("n", "sum"), lo=("lo", "min"),
                                      hi=("hi", "max"))

    # small-input fast path: when the WHOLE column fits the existing
    # collect_limit driver bound (the same bound the final refinement
    # step already collects under), skip the refinement passes — each
    # one re-executes the upstream read, which at toy scale costs more
    # than the data — and select exactly in one collect.
    if int(st["n"].sum()) <= collect_limit:
        def grab(df: pd.DataFrame) -> pd.DataFrame:
            g = df[by] if by else pd.Series(_ALL, index=df.index)
            return pd.DataFrame({"_g": g.astype(str),
                                 "v": df[column].astype(np.float64)})

        vals = ds.map_batches(grab, batch_format="pandas").to_pandas()
        rows = []
        for g, row in st.iterrows():
            v = np.sort(vals.loc[vals["_g"] == str(g), "v"].to_numpy())
            for q in qs:
                r = max(0, int(np.ceil(len(v) * q)) - 1)
                rows.append((g, q, float(v[r])))
        out = pd.DataFrame(rows, columns=["_by", "q", "value"])
        out["q"] = out["q"].astype(np.float64)
        if by:
            return out.rename(columns={"_by": by})
        return out[["q", "value"]]

    # active[(g, i)] = (lo, hi, GLOBAL-within-group 0-based rank)
    active: dict = {}
    resolved: dict = {}
    for g, row in st.iterrows():
        n = int(row["n"])
        for i, q in enumerate(qs):
            r = max(0, int(np.ceil(n * q)) - 1)
            active[(g, i)] = (float(row["lo"]), float(row["hi"]), r)

    for _ in range(max_passes):
        pending = {}
        for k, (lo, hi, r) in active.items():
            if lo == hi:
                resolved[k] = lo
            else:
                pending[k] = (lo, hi, r)
        if not pending:
            active = {}
            break
        keys = sorted(pending)
        edges = {k: np.linspace(*pending[k][:2], B + 1) for k in keys}

        def hist(df: pd.DataFrame, _edges=edges, _keys=keys) \
                -> pd.DataFrame:
            gcol = df[by].to_numpy() if by else None
            x_all = df[column].to_numpy(np.float64)
            out = []
            for k in _keys:
                g, i = k
                x = x_all if gcol is None else x_all[gcol == g]
                e = _edges[k]
                m = (x >= e[0]) & (x <= e[-1])
                below = int(np.sum(x < e[0]))
                xm = x[m]
                idx = np.clip(np.searchsorted(e, xm, side="right") - 1,
                              0, B - 1)
                counts = np.bincount(idx, minlength=B)
                vmin = np.full(B, np.inf)
                vmax = np.full(B, -np.inf)
                np.minimum.at(vmin, idx, xm)
                np.maximum.at(vmax, idx, xm)
                out.append(pd.DataFrame({
                    "g": g, "qi": np.full(B + 1, i, np.int64),
                    "slot": np.arange(-1, B, dtype=np.int64),
                    "cnt": np.concatenate([[below], counts]),
                    "vmin": np.concatenate([[np.inf], vmin]),
                    "vmax": np.concatenate([[-np.inf], vmax]),
                }))
            return pd.concat(out, ignore_index=True)

        folded = ds.map_batches(hist, batch_format="pandas") \
            .to_pandas().groupby(["g", "qi", "slot"], sort=True) \
            .agg(cnt=("cnt", "sum"), vmin=("vmin", "min"),
                 vmax=("vmax", "max"))

        nxt = {}
        for k in keys:
            g, i = k
            lo, hi, r = pending[k]
            e = edges[k]
            got = folded.loc[(g, i)]
            below = int(got["cnt"].get(-1, 0))
            cnt = np.zeros(B, np.int64)
            cnt[got.index[got.index >= 0]] = \
                got["cnt"][got.index >= 0].to_numpy()
            r_in = r - below   # rank among this group's rows in [lo,hi]
            cum = np.cumsum(cnt)
            b = int(np.searchsorted(cum, r_in + 1, side="left"))
            in_bucket = int(cnt[b])
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            new_r = r_in - (int(cum[b - 1]) if b else 0)
            sel = folded.loc[(g, i, b)]
            if sel["vmin"] == sel["vmax"]:
                resolved[k] = float(sel["vmin"])
                continue
            if in_bucket <= collect_limit:
                nxt[k] = (new_lo, new_hi, new_r, True)
            else:
                # carry the rank as group-global vs rows < new_lo
                glob_below = below + (int(cum[b - 1]) if b else 0)
                nxt[k] = (new_lo, new_hi, new_r + glob_below, False)

        active = {}
        finals = {}
        for k, (lo, hi, r, done) in nxt.items():
            (finals if done else active)[k] = (lo, hi, r)

        if finals:
            fkeys = sorted(finals)
            franges = {k: finals[k][:2] for k in fkeys}

            def collect(df: pd.DataFrame, _r=franges, _f=fkeys):
                import pyarrow as _pa
                gcol = df[by].to_numpy() if by else None
                x_all = df[column].to_numpy(np.float64)
                gs: list = []
                qis: list = []
                vs: list = []
                for k in _f:
                    g, i = k
                    x = x_all if gcol is None else x_all[gcol == g]
                    lo, hi = _r[k]
                    # final bucket is [lo, hi] closed; extra hi-equal
                    # rows from the next bucket sort after and never
                    # shift an in-bucket rank
                    v = x[(x >= lo) & (x <= hi)]
                    gs.extend([str(g)] * len(v))
                    qis.append(np.full(len(v), i, np.int64))
                    vs.append(v)
                # typed Arrow output: a 0-row batch keeps its schema
                # (a 0-row pandas object column trips Ray's estimator)
                return _pa.table({
                    "g": _pa.array(gs, _pa.large_string()),
                    "qi": _pa.array(np.concatenate(qis) if qis
                                    else np.empty(0, np.int64)),
                    "v": _pa.array(np.concatenate(vs) if vs
                                   else np.empty(0, np.float64))})

            vals = ds.map_batches(collect, batch_format="pandas") \
                .to_pandas()
            for k in fkeys:
                g, i = k
                lo, hi, r = finals[k]
                sel = vals[(vals["g"] == str(g)) & (vals["qi"] == i)]
                v = np.sort(sel["v"].to_numpy())
                resolved[k] = float(v[r])
        if not active:
            break

    if active:
        raise RuntimeError(f"quantile refinement did not converge: "
                           f"{active}")

    rows = sorted(resolved)
    out = pd.DataFrame({
        "q": np.array([qs[i] for _g, i in rows], np.float64),
        "value": np.array([resolved[k] for k in rows], np.float64)})
    if by:
        out.insert(0, by, [g for g, _i in rows])
    return out
