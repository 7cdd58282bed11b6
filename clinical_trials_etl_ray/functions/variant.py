"""Tagged-variant column codec — the lake representation for
heterogeneously-typed values.

Reference analog (E4): extractors returning ``str | number | list`` for the
same logical field (trials_extractor/extractors/base.py variant results).
Arrow has union types, but Parquet cannot store them, so the lake-portable
representation is a TAGGED STRUCT: ``{kind, str_val, num_val, list_val}``
with exactly one populated branch. ``pack``/``unpack`` cross the
Python-object boundary (inherently per-object — this is the edge of the
vectorized world, used at ingest only); ``variant_kind`` / ``variant_*``
accessors are zero-copy Arrow field reads usable inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VARIANT_TYPE = pa.struct(
    [
        pa.field("kind", pa.string()),  # str | num | list | null
        pa.field("str_val", pa.string()),
        pa.field("num_val", pa.float64()),
        pa.field("list_val", pa.list_(pa.string())),
    ]
)


def pack_variants(values) -> pa.Array:
    """Python objects (str / int / float / bool→num / list[str] / None) →
    tagged-struct array. Raises on unsupported kinds rather than guessing."""
    kinds, svals, nvals, lvals = [], [], [], []
    for v in values:
        if v is None:
            kinds.append("null"); svals.append(None); nvals.append(None); lvals.append(None)
        elif isinstance(v, str):
            kinds.append("str"); svals.append(v); nvals.append(None); lvals.append(None)
        elif isinstance(v, (bool, int, float, np.integer, np.floating)):
            kinds.append("num"); svals.append(None); nvals.append(float(v)); lvals.append(None)
        elif isinstance(v, (list, tuple, np.ndarray)):
            items = list(v)
            if not all(isinstance(x, str) for x in items):
                raise TypeError(
                    "variant list branch holds list[str] only; got "
                    f"{[type(x).__name__ for x in items if not isinstance(x, str)]}"
                )
            kinds.append("list"); svals.append(None); nvals.append(None)
            lvals.append(items)
        else:
            raise TypeError(f"unsupported variant value type: {type(v)!r}")
    return pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(svals, pa.string()),
            pa.array(nvals, pa.float64()),
            pa.array(lvals, pa.list_(pa.string())),
        ],
        fields=list(VARIANT_TYPE),
    )


def unpack_variants(arr) -> list:
    """Tagged-struct array → Python objects (inverse of ``pack_variants``)."""
    out = []
    for row in arr.to_pylist():
        if row is None or row["kind"] == "null":
            out.append(None)
        elif row["kind"] == "str":
            out.append(row["str_val"])
        elif row["kind"] == "num":
            out.append(row["num_val"])
        else:
            out.append(row["list_val"])
    return out


def variant_kind(arr) -> pa.Array:
    """Zero-copy kind accessor (for filtering/grouping by branch)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.field("kind")


def variant_as_string(arr) -> pa.Array:
    """Uniform string rendering of any branch (for display/export): str as
    is, num via cast, list joined with ';', null stays null — vectorized
    per branch, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    kind = arr.field("kind")
    s = arr.field("str_val")
    n = pc.cast(arr.field("num_val"), pa.string())
    joined = pc.binary_join(arr.field("list_val"), ";")
    out = pc.if_else(pc.equal(kind, "str"), s,
                     pc.if_else(pc.equal(kind, "num"), n, joined))
    return pc.if_else(pc.equal(kind, "null"), pa.nulls(len(arr), pa.string()), out)
