"""Nested-struct flatten + array collapse (SURVEY §2.2 P1/P2).

Reference behavior (normalize_parks_json.py:40-47): ``json_normalize``
turns nested keys into dotted column names and every list cell into a
``", "``-joined string.  Here the same shape is one lazy ``select`` —
Catalyst prunes unused leaves out of the scan, so a 2-leaf projection
of a 1000-leaf document reads 2 columns at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def collapse_array(col: Column, sep: str = ", ") -> Column:
    """``", ".join(map(str, x))`` for an array column
    (normalize_parks_json.py:43-46): elements stringified null-safely,
    joined in element order (arrays keep positional order in Spark).
    """
    return F.array_join(F.transform(col, lambda x: x.cast("string")), sep)


def flatten(df: DataFrame, sep: str = ".", collapse_arrays: bool = True) -> DataFrame:
    """Flatten every nested struct to dotted top-level columns.

    * ``struct.field`` → column literally named ``"struct.field"``
      (json_normalize parity).
    * arrays of scalars → ", "-joined strings when ``collapse_arrays``
      (P2); otherwise kept as arrays.
    * arrays of structs are left intact (positional semantics belong to
      the sessionize/refs operators).
    """
    cols: list[Column] = []

    def walk(prefix: str, dtype: T.DataType, path: Column) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}" if prefix else f.name, f.dataType, path[f.name])
        elif (
            collapse_arrays
            and isinstance(dtype, T.ArrayType)
            and not isinstance(dtype.elementType, (T.StructType, T.ArrayType, T.MapType))
        ):
            cols.append(collapse_array(path).alias(prefix))
        else:
            cols.append(path.alias(prefix))

    for f in df.schema.fields:
        walk(f.name, f.dataType, F.col(f"`{f.name}`"))
    return df.select(cols)
