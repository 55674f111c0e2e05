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
  — no global sort, no full materialization.

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
# exact distributed quantiles


def exact_quantiles(ds, column: str, qs: Sequence[float],
                    num_hist_buckets: int = 2048,
                    collect_limit: int = 200_000,
                    max_passes: int = 8) -> pd.DataFrame:
    """Exact discrete quantiles of ``ds[column]`` (DuckDB
    ``quantile_disc`` semantics: 0-based rank ``ceil(n*q) - 1`` of the
    sorted column) without a global sort.

    Each refinement pass is ONE streaming ``map_batches`` over the
    column producing per-batch histogram counts for every still-active
    quantile range; the driver folds them (O(B) ints per range) and
    narrows each range to the bucket containing its rank.  Skewed /
    duplicate-heavy columns converge too: a range that stops shrinking
    (all mass on one value) resolves immediately.  Final step filters
    the survivors (``<= collect_limit`` rows per range by
    construction) and selects exactly.

    Returns DataFrame (q: float64, value: float64) sorted by q.
    """
    qs = sorted(qs)

    # pass 0: n / min / max
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        x = df[column].to_numpy()
        return pd.DataFrame({"n": [len(x)],
                             "lo": [np.min(x) if len(x) else np.inf],
                             "hi": [np.max(x) if len(x) else -np.inf]})

    st = ds.map_batches(stats, batch_format="pandas").to_pandas()
    n = int(st["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": np.array(qs, np.float64),
                             "value": np.full(len(qs), np.nan)})
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())

    # active[i] = (lo, hi, rank_in_range) for qs[i]; global 0-based rank
    ranks = [max(0, int(np.ceil(n * q)) - 1) for q in qs]
    active = {i: (glo, ghi, ranks[i]) for i in range(len(qs))}
    resolved: dict[int, float] = {}
    B = num_hist_buckets

    for _ in range(max_passes):
        # resolve degenerate / small ranges without another pass
        pending = {}
        for i, (lo, hi, r) in active.items():
            if lo == hi:
                resolved[i] = lo
            else:
                pending[i] = (lo, hi, r)
        if not pending:
            break
        items = sorted(pending.items())
        ids = [i for i, _ in items]
        edges = {i: np.linspace(lo, hi, B + 1)
                 for i, (lo, hi, _r) in items}

        def hist(df: pd.DataFrame, _edges=edges, _ids=ids) -> pd.DataFrame:
            x = df[column].to_numpy(np.float64)
            out = []
            for i in _ids:
                e = _edges[i]
                m = (x >= e[0]) & (x <= e[-1])
                below = int(np.sum(x < e[0]))
                xm = x[m]
                idx = np.clip(np.searchsorted(e, xm, side="right") - 1,
                              0, B - 1)
                counts = np.bincount(idx, minlength=B)
                # per-bucket value min/max: a bucket whose min == max
                # holds ONE distinct value and resolves without
                # shrinking (duplicate-heavy skew would otherwise
                # never drop under collect_limit)
                vmin = np.full(B, np.inf)
                vmax = np.full(B, -np.inf)
                np.minimum.at(vmin, idx, xm)
                np.maximum.at(vmax, idx, xm)
                out.append(pd.DataFrame({
                    "qi": np.full(B + 1, i, np.int64),
                    "slot": np.arange(-1, B, dtype=np.int64),
                    "cnt": np.concatenate([[below], counts]),
                    "vmin": np.concatenate([[np.inf], vmin]),
                    "vmax": np.concatenate([[-np.inf], vmax]),
                }))
            return pd.concat(out, ignore_index=True)

        folded_df = ds.map_batches(hist, batch_format="pandas") \
            .to_pandas().groupby(["qi", "slot"], sort=True) \
            .agg(cnt=("cnt", "sum"), vmin=("vmin", "min"),
                 vmax=("vmax", "max"))
        folded = folded_df["cnt"]

        nxt = {}
        for i in ids:
            lo, hi, r = pending[i]
            e = edges[i]
            cnt = np.zeros(B, np.int64)
            got = folded.loc[i]
            below = int(got.get(-1, 0))
            for slot, c in got.items():
                if slot >= 0:
                    cnt[slot] = c
            r_in = r - below   # rank among rows in [lo, hi]
            cum = np.cumsum(cnt)
            b = int(np.searchsorted(cum, r_in + 1, side="left"))
            in_bucket = int(cnt[b])
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            new_r = r_in - (int(cum[b - 1]) if b else 0)
            sel = folded_df.loc[(i, b)]
            if sel["vmin"] == sel["vmax"]:
                resolved[i] = float(sel["vmin"])
                continue
            if in_bucket <= collect_limit:
                # final exact selection happens below
                nxt[i] = (new_lo, new_hi, new_r, True)
            else:
                # re-rank against GLOBAL rows < new_lo next pass
                glob_below = below + (int(cum[b - 1]) if b else 0)
                nxt[i] = (new_lo, new_hi, new_r + glob_below, False)

        active = {}
        finals = {}
        for i, (lo, hi, r, done) in nxt.items():
            if done:
                finals[i] = (lo, hi, r)
            else:
                active[i] = (lo, hi, r)

        if finals:
            fids = sorted(finals)
            franges = {i: finals[i][:2] for i in fids}

            def collect(df: pd.DataFrame, _r=franges, _f=fids) \
                    -> pd.DataFrame:
                x = df[column].to_numpy(np.float64)
                out = []
                for i in _f:
                    lo, hi = _r[i]
                    # final bucket is [lo, hi] inclusive-right (last
                    # histogram bucket) / exclusive elsewhere; keeping
                    # the closed interval is safe — extra hi-equal rows
                    # sort after and never shift the in-bucket rank
                    v = x[(x >= lo) & (x <= hi)]
                    out.append(pd.DataFrame({
                        "qi": np.full(len(v), i, np.int64), "v": v}))
                return pd.concat(out, ignore_index=True)

            vals = ds.map_batches(collect, batch_format="pandas") \
                .to_pandas()
            for i in fids:
                lo, hi, r = finals[i]
                v = np.sort(vals.loc[vals["qi"] == i, "v"].to_numpy())
                # rows equal to lo that live in the PREVIOUS bucket
                # boundary are already excluded by the below-count;
                # r indexes within [lo, hi] rows directly
                resolved[i] = float(v[r])
        if not active:
            break

    if active:     # max_passes hit: fall back to exact collect anyway
        raise RuntimeError(f"quantile refinement did not converge: "
                           f"{active}")
    return pd.DataFrame({
        "q": np.array(qs, np.float64),
        "value": np.array([resolved[i] for i in range(len(qs))],
                          np.float64)})
