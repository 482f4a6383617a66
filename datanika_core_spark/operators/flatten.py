"""dlt-compatible nested normalization (SURVEY.md §1.2).

The reference's extract step runs dlt's normalizer: nested objects
flatten into the parent row with ``__``-joined column names; nested
arrays become child tables linked by ``_dlt_id``/``_dlt_parent_id``
(+ ``_dlt_list_idx``); internal ``_dlt_*`` tables are excluded from
row counts and catalogs (dlt_runner.py:72-74,
catalog_service.py:32-33). Evidence of nested inputs: MongoDB docs
with dict-in-dict contacts/address (examples/seed_data.py:230-257).

Differences by design:
- Spark keeps the native ``StructType``/``ArrayType`` representation
  as the primary model (better for Catalyst); this module is the
  opt-in parity mode for consumers that expect dlt's flat layout.
- dlt's ``_dlt_id`` is random; ours is **deterministic**
  (md5 of the row's JSON + path) so runs are reproducible and
  results can be golden-tested.

Everything is built-in expressions (to_json/md5/posexplode) — no
Python UDFs, so flattening a 100 TB nested table stays inside
whole-stage codegen.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DLT_ID = "_dlt_id"
DLT_PARENT_ID = "_dlt_parent_id"
DLT_LIST_IDX = "_dlt_list_idx"

#: prefix for internal tables, excluded from counts/catalog.
INTERNAL_PREFIX = "_dlt_"


def is_internal_table(name: str) -> bool:
    return name.startswith(INTERNAL_PREFIX)


def _flatten_structs(df: DataFrame) -> tuple[DataFrame, list[str]]:
    """Flatten all StructType columns into ``parent__child`` scalars
    (recursively). Returns (df, array_columns_left)."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            break
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}__{sub.name}"
                        )
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    arrays = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    return df, arrays


def normalize(
    df: DataFrame, table_name: str, max_depth: int = 8
) -> Iterator[tuple[str, DataFrame]]:
    """Yield ``(table_name, flat_df)`` pairs: the parent first, then one
    child table per nested array (recursive), dlt-layout-compatible.

    The parent ``_dlt_id`` is md5 of the full row JSON (deterministic);
    child ``_dlt_id`` is md5(parent_id ∥ field path ∥ index).
    """
    # Stable row id from the row content itself.
    df = df.withColumn(
        DLT_ID, F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    )
    stack: list[tuple[str, DataFrame, int]] = [(table_name, df, 0)]
    while stack:
        name, cur, depth = stack.pop(0)
        flat, array_cols = _flatten_structs(cur)
        if depth >= max_depth:
            array_cols = []
        for arr in array_cols:
            child_name = f"{name}__{arr}"
            elem = (
                flat.select(
                    F.col(DLT_ID).alias(DLT_PARENT_ID),
                    F.posexplode(F.col(f"`{arr}`")).alias(DLT_LIST_IDX, "value"),
                )
                .withColumn(
                    DLT_ID,
                    F.md5(
                        F.concat_ws(
                            "/",
                            F.col(DLT_PARENT_ID),
                            F.lit(arr),
                            F.col(DLT_LIST_IDX).cast("string"),
                        )
                    ),
                )
            )
            # Scalar array elements keep column name "value"; struct
            # elements get flattened by the recursive visit.
            stack.append((child_name, elem, depth + 1))
        yield name, flat.drop(*array_cols)
