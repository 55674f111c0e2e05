"""Hash-bucket combine: scalable grouped aggregation for Ray Data.

``Dataset.groupby(keys).aggregate(...)`` in this Ray version pays
~2-3 ms of per-group Python overhead in its sort-based reducer — fine
for a handful of groups, catastrophic for the millions of groups a
dedup or per-key aggregate produces.  The idiomatic fix (and the shape
that scales to 100 TB) is:

1. **partial** per-batch vectorized aggregation (one row per key per
   batch) inside ``map_batches`` — the heavy data never shuffles;
2. **bucket** partials by a deterministic hash of the key columns into
   ``num_buckets`` buckets (#buckets ~ cluster cores, NOT #keys);
3. **combine** each bucket with one vectorized pandas groupby.

The shuffle therefore moves partial rows grouped into O(buckets)
groups, and all per-key work is vectorized — per-group overhead is
gone.  Determinism: ``pandas.util.hash_pandas_object`` is an unseeded
stable hash, so bucket assignment is reproducible across workers and
runs.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np
import pandas as pd


def _bucket_of(df: pd.DataFrame, keys: Sequence[str],
               num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(
        df[list(keys)].astype(str) if any(df[k].dtype == object for k in keys)
        else df[list(keys)], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_bucket_combine(ds, keys: Sequence[str],
                        combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
                        num_buckets: int = 64):
    """Bucket rows by hash(keys), run ``combine_fn`` once per bucket
    (all rows of a key land in one bucket)."""
    keys = list(keys)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, keys, num_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(g.drop(columns=["_bucket"]))

    return ds.map_batches(bucketize, batch_format="pandas") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def grouped_aggregate(ds, keys: Sequence[str], agg_spec: Dict[str, tuple],
                      batch_size: int = 65536, num_buckets: int = 64):
    """Two-phase grouped aggregate with vectorized combine.

    agg_spec: {out_col: (in_col, 'sum'|'count'|'min'|'max')}.
    count combines as sum-of-partial-counts.
    """
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        parts = {}
        for out, (col, how) in agg_spec.items():
            if how == "sum":
                parts[out] = g[col].sum()
            elif how == "count":
                parts[out] = g.size()
            elif how == "min":
                parts[out] = g[col].min()
            elif how == "max":
                parts[out] = g[col].max()
            else:
                raise ValueError(how)
        return pd.DataFrame(parts).reset_index()

    combine_how = {out: ("sum" if how in ("sum", "count") else how)
                   for out, (_c, how) in agg_spec.items()}

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        return g.agg(combine_how).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    return hash_bucket_combine(partials, keys, combine, num_buckets)


def hash_bucket_join(left, right, left_on: str, right_on: str,
                     how: str = "inner", num_buckets: int = 64,
                     left_cols: Sequence[str] = None,
                     right_cols: Sequence[str] = None):
    """Distributed equi-join: both sides bucketed by a stable hash of
    the join key, one vectorized pandas merge per bucket.

    The broadcast join (ray.put the small side) is right for
    dimension lookups; this is the shuffle join for two LARGE sides —
    each side moves once, buckets are O(cluster cores), the merge is
    vectorized per bucket.  Column sets of the two sides must be
    disjoint apart from the join keys (standard star-schema shape).

    Pass ``left_cols``/``right_cols`` when known: ``Dataset.schema()``
    on an unexecuted pipeline EXECUTES it, so sniffing names at plan
    time would run each input twice (once for the sniff, once for the
    join).  Restore dtypes come from each bucket's own Arrow schema at
    merge time, so no plan-time type information is needed at all.
    """
    lcols = list(left_cols) if left_cols is not None \
        else list(left.schema().names)
    rcols = list(right_cols) if right_cols is not None \
        else list(right.schema().names)
    overlap = (set(lcols) & set(rcols)) - {left_on, right_on}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    allcols = lcols + [c for c in rcols if c not in lcols]

    def _canonical_key(k: pd.Series) -> pd.Series:
        """Vectorized canonical join key: integer-kind (incl. the
        object-of-python-ints the padding path produces) casts to
        int64 — an 8-byte shuffle column with no per-row Python —
        everything else casts to str.  Equal values of the same kind
        always canonicalize identically on both sides; keys of
        DIFFERENT kinds (int 1 vs string "1") canonicalize to
        different dtypes, land in different buckets, and never match —
        the same no-cross-type-equijoin semantics as a typed engine."""
        kind = getattr(k.dtype, "kind", "O")
        if kind in ("i", "u"):
            return k.astype("int64")
        if kind == "O":
            try:
                return k.astype("int64")
            except (ValueError, TypeError):
                return k.astype(str)
        return k.astype(str)

    def pad(side: int, key: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_jkey"] = _canonical_key(df[key])
            df["_side"] = np.int8(side)
            for c in allcols:
                if c not in df.columns:
                    # OBJECT dtype padding: a None-padded int64 column
                    # must not promote to float64 in the union/concat —
                    # 64-bit values (e.g. this repo's hashes) above
                    # 2**53 would silently lose precision before the
                    # dtype restore
                    df[c] = pd.Series([None] * len(df), dtype=object,
                                      index=df.index)
            return df[allcols + ["_jkey", "_side"]]
        return fn

    u = left.map_batches(pad(0, left_on), batch_format="pandas").union(
        right.map_batches(pad(1, right_on), batch_format="pandas"))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df, ["_jkey"], num_buckets)
        return df

    def merge(bucket: pa.Table) -> pd.DataFrame:
        import pyarrow as pa_

        # integer_object_nulls: a null-padded int64 column converts to
        # object-of-python-ints instead of float64, so 64-bit values
        # (hash keys) survive the arrow->pandas hop losslessly before
        # the per-side dtype restore
        pdf = bucket.to_pandas(integer_object_nulls=True)

        def restore(side: int, cols):
            sub = pdf[pdf["_side"] == side][cols]
            dt = {}
            for c in cols:
                typ = bucket.schema.field(c).type
                if pa_.types.is_integer(typ):
                    dt[c] = "int64"
                elif pa_.types.is_floating(typ):
                    dt[c] = "float64"
                elif pa_.types.is_timestamp(typ):
                    dt[c] = f"datetime64[{typ.unit}]"
                # null-typed (all-null in this bucket) / string / bool:
                # leave as converted
            return sub.astype(dt)

        l, r = restore(0, lcols), restore(1, rcols)
        return l.merge(r, left_on=left_on, right_on=right_on, how=how)

    return u.map_batches(bucketize, batch_format="pandas") \
        .groupby("_bucket").map_groups(merge, batch_format="pyarrow")
