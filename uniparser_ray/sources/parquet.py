"""Metadata-clean parquet reads.

pandas-written parquet files carry a ``pandas`` schema-metadata blob;
pyarrow schemas WITH metadata are unhashable (``hash(schema)`` raises
``unhashable type: 'dict'``), which defeats Ray Data's block-schema
deduplication and spams "Failed to hash the schemas" warnings in every
operator that concatenates read blocks into batches.  Stripping the
metadata immediately after the read — one zero-copy, block-at-a-time
map (``batch_size=None`` => no concat, so the strip itself never
triggers the unhashable-unify path) — keeps every downstream stage's
schema hashable.
"""

from __future__ import annotations

import pyarrow as pa


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, columns=None, **kwargs):
    import ray.data as rd
    ds = rd.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(_strip_meta, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
