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

from typing import Callable, Dict, List, Sequence

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
