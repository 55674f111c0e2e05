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
import pyarrow as pa


def _canon_elem(x) -> str:
    """Per-element canonical join key for object-dtype columns — the
    tag + repr scheme of ``_canonical_key`` applied value by value, so
    heterogeneous batches canonicalize each value the same way an
    all-one-kind batch would.  bool is checked before int (bool is an
    int subclass)."""
    if x is None or x is pd.NA:
        return "n:"
    if isinstance(x, (bool, np.bool_)):
        return "b:" + str(bool(x))
    if isinstance(x, (int, np.integer)):
        return "i:" + str(int(x))
    if isinstance(x, (float, np.floating)):
        return "n:" if np.isnan(x) else "f:" + str(float(x))
    return "s:" + str(x)


def _bucket_of(df: pd.DataFrame, keys: Sequence[str],
               num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(
        df[list(keys)].astype(str) if any(df[k].dtype == object for k in keys)
        else df[list(keys)], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _bucket_of_table(t: pa.Table, keys: Sequence[str],
                     num_buckets: int) -> np.ndarray:
    """Bucket assignment for an Arrow batch: only the KEY columns hop
    to pandas for the stable vectorized hash — the payload columns
    stay zero-copy Arrow."""
    return _bucket_of(t.select(list(keys)).to_pandas(), keys, num_buckets)


def hash_bucket_combine(ds, keys: Sequence[str],
                        combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
                        num_buckets: int = 64,
                        driver_limit_rows: int = None,
                        arrow_fn: Callable[[pa.Table], pa.Table] = None):
    """Bucket rows by hash(keys), run the combine once per bucket
    (all rows of a key land in one bucket).

    The shuffle runs on ARROW blocks end to end: bucketize appends the
    ``_bucket`` column to the zero-copy Arrow batch, the groupby sort
    moves Arrow blocks (empty partitions are schema-stable Arrow, not
    the object-dtype pandas frames that used to trip Ray's sampled
    size estimator), and each group lands in the combine as a
    ``pa.Table``.  ``combine_fn`` keeps the pandas contract
    (df -> df) for callers with pandas-shaped logic — the hop happens
    once per BUCKET, not per key; pass ``arrow_fn`` instead for a
    fully Arrow combine (pa.Table -> pa.Table, no pandas hop at all —
    ``grouped_aggregate`` uses this).

    ``driver_limit_rows`` opts into the adaptive no-shuffle fast path
    (same design as the crawl loop's small-round path): the input is
    materialized and counted; at or below the limit the whole input is
    combined in one driver-side call — valid because combine fns only
    assume "all rows of a key are together", which one bucket
    trivially satisfies — skipping a multi-second Ray all-to-all for
    kilobyte inputs.  Above the limit the materialized input flows
    into the normal shuffle.  Callers should pass it only when the
    input is plausibly small (e.g. known row bounds from parquet
    metadata); driver memory is bounded by the limit."""
    keys = list(keys)

    if driver_limit_rows:
        import ray
        import ray.data
        m = ds.materialize()
        if m.count() <= driver_limit_rows:
            if arrow_fn is not None:
                refs = m.to_arrow_refs()
                tbls = [t for t in ray.get(refs) if t.num_rows] \
                    if refs else []
                if not tbls:
                    return m
                t = pa.concat_tables(tbls, promote_options="default")
                return ray.data.from_arrow(
                    arrow_fn(t.combine_chunks()))
            return ray.data.from_pandas(combine_fn(m.to_pandas()))
        ds = m  # reuse: don't re-execute the upstream for the shuffle

    def bucketize(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None).append_column(
            "_bucket", pa.array(_bucket_of_table(t, keys, num_buckets),
                                type=pa.int64()))

    if arrow_fn is not None:
        def per_bucket(g: pa.Table):
            return arrow_fn(
                g.drop_columns(["_bucket"]).combine_chunks())
    else:
        def per_bucket(g: pa.Table):
            out = combine_fn(g.drop_columns(["_bucket"]).to_pandas())
            try:
                from ..blocks import table_from_pandas
                return table_from_pandas(out, preserve_index=False)
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                # combine output holds cells Arrow can't type (rare:
                # ragged ndarrays etc.) — let Ray keep a pandas block
                return out

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def _arrow_group_agg(t: pa.Table, keys: Sequence[str], items) -> pa.Table:
    """One vectorized Arrow hash-aggregation: ``items`` is a list of
    (out_col, in_col, how) with how in sum|count|min|max.  Matches the
    pandas-groupby semantics this replaced: null-valued KEYS drop
    (pandas ``groupby`` default), all-null sums are 0 (min_count=0),
    count counts rows.  ``use_threads=False``: each Ray task owns one
    CPU — threading inside the kernel would oversubscribe."""
    import pyarrow.compute as pc

    keys = list(keys)
    mask = None
    for k in keys:
        v = pc.is_valid(t[k])
        mask = v if mask is None else pc.and_(mask, v)
    if mask is not None and not pc.all(mask).as_py() \
            and t.num_rows:
        t = t.filter(mask)

    data: dict = {k: t[k] for k in keys}
    aggs = []
    sum0 = pc.ScalarAggregateOptions(min_count=0)
    for i, (out, col, how) in enumerate(items):
        name = f"_a{i}"
        if how == "count":
            data[name] = pa.array(np.ones(t.num_rows, dtype=np.int64))
            aggs.append((name, "sum", sum0))
        elif how == "sum":
            data[name] = t[col]
            aggs.append((name, "sum", sum0))
        elif how in ("min", "max"):
            data[name] = t[col]
            aggs.append((name, how))
        else:
            raise ValueError(how)
    g = pa.table(data).group_by(keys, use_threads=False).aggregate(aggs)
    cols = {k: g[k] for k in keys}
    for i, (out, _col, how) in enumerate(items):
        how2 = "sum" if how == "count" else how
        cols[out] = g[f"_a{i}_{how2}"]
    return pa.table(cols)


def grouped_aggregate(ds, keys: Sequence[str], agg_spec: Dict[str, tuple],
                      batch_size: int = 65536, num_buckets: int = 64,
                      driver_limit_rows: int = None):
    """Two-phase grouped aggregate, Arrow end to end.

    agg_spec: {out_col: (in_col, 'sum'|'count'|'min'|'max')}.
    count combines as sum-of-partial-counts.  Both phases are single
    Arrow hash-aggregation kernel calls (``Table.group_by``) — no
    pandas hop anywhere on the path, and every shuffled block is Arrow
    with one stable schema.

    ``driver_limit_rows`` (see ``hash_bucket_combine``) opts the final
    combine into the adaptive no-shuffle fast path.  Pass it when the
    key cardinality is provably small (the partials are bounded by
    blocks x keys): low-cardinality aggregates otherwise pay a 64-way
    all-to-all for kilobytes AND Ray's sort shuffle emits schema-less
    empty partitions when keys << partition count.
    """
    keys = list(keys)
    items = [(out, col, how) for out, (col, how) in agg_spec.items()]
    combine_items = [(out, out, "sum" if how in ("sum", "count") else how)
                     for out, _col, how in items]

    def partial(t: pa.Table) -> pa.Table:
        return _arrow_group_agg(t, keys, items)

    def combine(t: pa.Table) -> pa.Table:
        return _arrow_group_agg(t, keys, combine_items)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    return hash_bucket_combine(partials, keys, None, num_buckets,
                               driver_limit_rows=driver_limit_rows,
                               arrow_fn=combine)


def hash_bucket_join(left, right, left_on: str, right_on: str,
                     how: str = "inner", num_buckets: int = 64,
                     left_cols: Sequence[str] = None,
                     right_cols: Sequence[str] = None,
                     driver_limit_rows: int = None):
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

    ``driver_limit_rows`` opts into the adaptive small-input fast path
    (same contract as ``hash_bucket_combine``): both sides are
    materialized and counted; at or below the limit the padded union
    merges in ONE task — valid because the merge only assumes "all
    rows of a key are together", which one partition trivially
    satisfies — skipping the multi-second all-to-all for kilobyte
    inputs.  Above the limit the materialized inputs flow into the
    normal shuffle.  Pass it only when the inputs are plausibly small.
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
        """Canonical join key: one stable physical type (string) with a
        per-ELEMENT kind tag — ``i:<int>`` / ``f:<float>`` / ``b:<bool>``
        / ``s:<str>`` / ``n:`` (null).  A value's canonical form never
        depends on its batch neighbors (an all-numeric object batch and
        a mixed one tag '101' identically), python ints >= 2**63 never
        overflow (no int64 cast), floats keep their repr (no 1.5 -> 1
        truncation), and the unioned ``_jkey`` column is always string —
        one Arrow schema regardless of the two sides' key dtypes.  Keys
        of different kinds get different tags and never match — the
        no-cross-type-equijoin semantics of a typed engine."""
        kind = getattr(k.dtype, "kind", "O")
        if kind == "i":
            return "i:" + k.astype("int64").astype(str)
        if kind == "u":
            return "i:" + k.astype("uint64").astype(str)
        if kind == "b":
            return "b:" + k.astype(str)
        if kind == "f":
            return ("f:" + k.astype(str)).where(~k.isna(), "n:")
        if kind == "O":
            return k.map(_canon_elem)
        return "s:" + k.astype(str)

    small = False
    type_hints: dict = {}
    if driver_limit_rows:
        left = left.materialize()
        right = right.materialize()
        small = left.count() + right.count() <= driver_limit_rows
        # Materialized inputs make schema() free: collect each side's
        # Arrow types so pad() can emit TYPED nulls for the other
        # side's columns.  Without this, left blocks carry null-typed
        # right columns and vice versa — two distinct schemas flowing
        # into the groupby shuffle, which defeats Ray's block-schema
        # dedup and fires a "different schema" warning per block pair.
        for ds_side in (left, right):
            sch = ds_side.schema(fetch_if_missing=False)
            if sch is None:
                continue
            # Schema.types converts pandas dtypes to Arrow types where
            # possible; non-convertible entries (object dtype) come
            # back as python classes — no hint for those (they fall
            # back to bare null padding, which Arrow unifies)
            for name, typ in zip(sch.names, sch.types):
                if isinstance(typ, pa.DataType) and not pa.types.is_null(typ):
                    type_hints.setdefault(name, typ)

    def pad(side: int, key: str):
        # pandas IN (an object-dtype key batch keeps per-element
        # python kinds for _canonical_key — Arrow would coerce a mixed
        # [1.5, 1] object column to double before we could tag it),
        # Arrow OUT (one explicit schema for the union)
        def fn(df: pd.DataFrame) -> pa.Table:
            n = len(df)
            jkey = _canonical_key(df[key])
            cols = {}
            for c in allcols:
                if c in df.columns:
                    cols[c] = pa.Array.from_pandas(
                        df[c], type=type_hints.get(c))
                else:
                    # typed nulls when the other side's schema is
                    # known; bare null type otherwise (Arrow unifies
                    # null+T -> T at group assembly, at the cost of
                    # mixed block schemas on the streaming path)
                    cols[c] = pa.nulls(n, type=type_hints.get(c))
            cols["_jkey"] = pa.array(jkey, type=pa.string())
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            # pa.table() builds a fresh metadata-free schema, so the
            # pandas metadata blob never enters the shuffle
            return pa.table(cols)
        return fn

    u = left.map_batches(pad(0, left_on), batch_format="pandas").union(
        right.map_batches(pad(1, right_on), batch_format="pandas"))

    def bucketize(t):
        # Arrow in, Arrow out: keeps the groupby shuffle on Arrow
        # blocks, so group assembly uses Arrow schema unification
        # (uint64 + null -> uint64) instead of a pandas->Arrow
        # re-inference that chokes on object-of->2**63-int columns.
        import pyarrow as pa_
        s = t.column("_jkey").to_pandas()
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        # drop the pandas metadata blob: schemas carrying it are
        # unhashable, which defeats Ray's block-schema dedup in the
        # groupby shuffle ("Failed to hash the schemas" warning)
        return t.replace_schema_metadata(None).append_column(
            "_bucket", pa_.array((h % np.uint64(num_buckets)).astype("int64")))

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
                if pa_.types.is_unsigned_integer(typ):
                    dt[c] = "uint64"
                elif pa_.types.is_integer(typ):
                    dt[c] = "int64"
                elif pa_.types.is_floating(typ):
                    dt[c] = "float64"
                elif pa_.types.is_timestamp(typ):
                    dt[c] = f"datetime64[{typ.unit}]"
                # null-typed (all-null in this bucket) / string / bool:
                # leave as converted
            return sub.astype(dt)

        # Merge on the canonical tagged key itself — both sides carry
        # the same string dtype, so a bucket mixing int-kind and
        # str-kind keys merges cleanly (they simply never match) and
        # the restored natural-typed key columns ride through as data.
        l = restore(0, lcols + ["_jkey"])
        r = restore(1, rcols + ["_jkey"])
        if left_on == right_on:
            r = r.rename(columns={right_on: "_rkey_dup"})
            out = l.merge(r, on="_jkey", how=how)
            if how in ("right", "outer"):
                out[left_on] = out[left_on].where(
                    out[left_on].notna(), out["_rkey_dup"])
            out = out.drop(columns=["_rkey_dup", "_jkey"])
        else:
            out = l.merge(r, on="_jkey", how=how).drop(columns=["_jkey"])
        out = out[allcols]
        # Arrow out for EVERY bucket, typed from the bucket's own
        # schema: a mixed pandas(non-empty)/arrow(empty) output stream
        # can never agree on a block schema (PandasBlockSchema !=
        # arrow schema), so each empty bucket used to fire Ray's
        # "different schema" warning; and an empty PANDAS block with
        # object columns additionally trips the sampled size estimator
        arrays = []
        for c in allcols:
            typ = bucket.schema.field(c).type
            if len(out):
                arrays.append(pa_.Array.from_pandas(out[c], type=typ))
            else:
                arrays.append(pa_.array([], typ))
        return pa_.Table.from_arrays(arrays, names=allcols)

    if small:
        # one partition = one "bucket" holding every key: merge once,
        # no shuffle (strip the pandas metadata blob like bucketize
        # does so downstream block schemas stay hashable)
        return u.repartition(1).map_batches(
            lambda t: merge(t.replace_schema_metadata(None)),
            batch_format="pyarrow", batch_size=None)

    return u.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(merge, batch_format="pyarrow")
