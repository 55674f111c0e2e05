"""Arrow block hygiene.

``pa.Table.from_pandas`` always attaches a ``pandas`` schema-metadata
blob, and a pyarrow schema WITH metadata is unhashable (``hash(schema)``
raises ``unhashable type: 'dict'``) — which defeats Ray Data's
block-schema deduplication and spams "Failed to hash the schemas"
warnings in every downstream operator that unifies block schemas (see
sources/parquet.py for the read-side twin of this fix).  Every block
or result table the library builds from pandas goes through this
helper so schemas are born clean and hashable.
"""

from __future__ import annotations

import pyarrow as pa


def table_from_pandas(df, **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` minus the pandas schema-metadata blob."""
    return pa.Table.from_pandas(df, **kwargs).replace_schema_metadata(None)
