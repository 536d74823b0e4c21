"""Schema-preserving Dataset→pandas/Arrow conversion.

Ray's ``Dataset.to_pandas()`` builds the frame from ``iter_batches``,
which SKIPS zero-row blocks — so a legitimately-empty result (an empty
join bucket round, a filter that matched nothing) comes back as a
column-less ``(0, 0)`` frame even when every block in the dataset is
schema-pinned.  These helpers reconstruct the typed empty frame from
``ds.schema()`` so empty results keep their columns and dtypes — the
contract every oracle comparison and downstream ``select`` relies on.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _ray_schema_to_arrow(schema) -> pa.Schema:
    """Coerce a Ray ``Schema`` (arrow- or numpy-backed) to ``pa.Schema``."""
    import numpy as np

    fields = []
    for name, t in zip(schema.names, schema.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.ArrowNotImplementedError):
                t = pa.string()
        fields.append((name, t))
    return pa.schema(fields)


def to_pandas(ds: "ray.data.Dataset") -> pd.DataFrame:  # noqa: F821
    """``ds.to_pandas()`` that preserves columns + dtypes when the
    dataset has zero rows (Ray's own conversion drops them)."""
    df = ds.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        schema = ds.schema(fetch_if_missing=True)
        if schema is not None and schema.names:
            return _ray_schema_to_arrow(schema).empty_table().to_pandas()
    return df


def to_arrow(ds: "ray.data.Dataset") -> pa.Table:  # noqa: F821
    """Whole-dataset Arrow table that keeps the schema when empty."""
    tables = [pa.Table.from_pandas(b) if isinstance(b, pd.DataFrame) else b
              for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    tables = [t for t in tables if len(t)]
    if tables:
        return pa.concat_tables(tables, promote_options="default")
    schema = ds.schema(fetch_if_missing=True)
    if schema is not None and schema.names:
        return _ray_schema_to_arrow(schema).empty_table()
    return pa.table({})
