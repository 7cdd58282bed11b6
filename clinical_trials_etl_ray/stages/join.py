"""Join strategies, Ray-Data-first.

The reference has no general join operator (SURVEY §2.5) — only point
lookups, filter-scans and a broadcast-dict country canonicalization
(trials_extractor/processors/normalizer.py:134-176) plus an implicit
parent-child FK stamp at flatten time (trials_extractor/exporters/
csv_exporter.py:73-248). This module supplies the general forms a lake-scale
engine needs:

- ``broadcast_join``: small side shipped ONCE (ray.put on the driver, ray.get
  once per actor in __init__ — never re-shipped per batch), merged per batch
  with vectorized pandas. No shuffle. Use when one side fits in worker heap.
- ``copartition_join``: both sides large. One hash-shuffle each: tag rows
  with side + ``bucket = hash(key) % B``, union under a unified schema,
  ``groupby("bucket")`` and an Arrow-native (Acero) hash join per
  co-partition — blocks stay Arrow end-to-end and SQL null semantics come
  from the engine. Skewed keys: pick B ≫ #workers and/or salt a hot key into
  sub-buckets on the build side and replicate the probe row per salt
  (documented, not automatic).

Partitioning assumption: equality keys only; B chosen so one bucket of BOTH
sides fits in a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import bucket_ids


def _key_buckets(table: pa.Table, keys: list, num_buckets: int) -> np.ndarray:
    """Bucket ids from key columns ALREADY cast to the join's unified key
    types (both sides hash identical representations — see ``tag``). Null
    keys get an arbitrary deterministic bucket; they are separated out per
    SQL semantics inside ``merge_bucket``, so their routing never affects
    results."""
    if len(keys) == 1 and pa.types.is_integer(table.schema.field(keys[0]).type):
        v = pc.fill_null(table.column(keys[0]), 0).to_numpy(zero_copy_only=False)
        return ((v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)).astype(
            np.int64
        ) % num_buckets
    parts = [table.column(k).cast(pa.string()).to_pandas().fillna("\0") for k in keys]
    joined = parts[0]
    for p in parts[1:]:
        joined = joined + "\x1f" + p
    return bucket_ids(joined.to_numpy(dtype=object), num_buckets).astype(np.int64)


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as a pa.Schema, whether blocks are Arrow or pandas
    (pandas-block datasets report numpy dtypes; object → string)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        elif np.dtype(t).kind == "O":
            fields.append(pa.field(n, pa.string()))
        else:
            fields.append(pa.field(n, pa.from_numpy_dtype(np.dtype(t))))
    return pa.schema(fields)


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner"):
    """Join a Dataset with a small pandas table without any shuffle."""
    import ray

    ref = ray.put(small_df)
    on_cols = [on] if isinstance(on, str) else list(on)

    class BroadcastJoiner:
        def __init__(self):
            self.small = ray.get(ref)  # fetched once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on_cols, how=how)

    return ds.map_batches(
        BroadcastJoiner, batch_format="pandas", concurrency=(1, 4), batch_size=65536
    )


def copartition_join(
    left,
    right,
    on,
    num_buckets: int = 32,
    how: str = "inner",
    batch_size: int = 65536,
):
    """Explicit partitioned hash join of two Datasets on equality keys.

    ``how`` additionally accepts ``"semi"`` / ``"anti"``: keep left rows
    whose key does / does not appear in right (the general form of the
    reference's V3 ⊆ cross-section check,
    trials_extractor/processors/validator.py:107-149). For these modes the
    right side is projected to its key columns and deduplicated per batch
    BEFORE the exchange, so the shuffled build side is bounded by the number
    of distinct keys, not right's row count.
    """
    on_cols = [on] if isinstance(on, str) else list(on)

    if how in ("semi", "anti"):
        right = right.select_columns(on_cols).map_batches(
            lambda t: t.group_by(on_cols).aggregate([]),
            batch_format="pyarrow",
            batch_size=batch_size,
        )

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    l_only = [n for n in l_names if n not in on_cols]
    r_only = [n for n in r_names if n not in on_cols]
    overlap = set(l_only) & set(r_only)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")

    # Key columns take the LEFT side's type in the unified schema; the right
    # side is cast to it in tag() BEFORE bucketing, so both sides hash the
    # same representation (an int64 key chained through a null-filling join
    # that upcast it to float64 still buckets with its int64 partner). An
    # incompatible pair fails loudly instead of silently dropping matches.
    unified = pa.schema(
        [l_schema.field(n) for n in l_names]
        + [r_schema.field(n) for n in r_only]
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )
    for k in on_cols:
        lt, rt = l_schema.field(k).type, r_schema.field(k).type
        if lt != rt and not (
            (pa.types.is_integer(lt) or pa.types.is_floating(lt))
            and (pa.types.is_integer(rt) or pa.types.is_floating(rt))
        ) and not (pa.types.is_string(lt) and pa.types.is_string(rt)):
            raise TypeError(
                f"join key {k!r} types not cast-compatible: {lt} vs {rt}"
            )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            arrays = {}
            for f in unified:
                if f.name == "__side":
                    arrays[f.name] = pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    )
                elif f.name == "__bucket":
                    continue  # computed below from the CASTED key columns
                elif f.name in t.column_names:
                    try:
                        arrays[f.name] = t.column(f.name).cast(f.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                        raise TypeError(
                            f"join key/column {f.name!r} not losslessly "
                            f"castable to {f.type}: {e}"
                        ) from e
                else:
                    arrays[f.name] = pa.nulls(t.num_rows, f.type)
            key_tbl = pa.Table.from_arrays(
                [arrays[k] for k in on_cols], names=on_cols
            )
            arrays["__bucket"] = pa.array(
                _key_buckets(key_tbl, on_cols, num_buckets)
            )
            return pa.Table.from_arrays(
                [arrays[f.name] for f in unified], schema=unified
            )

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow", batch_size=batch_size).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=batch_size)
    )

    # Arrow-native per-bucket join (pyarrow/Acero hash join): both sides
    # stay Arrow end-to-end — the tagged union's null-filled int columns
    # remain int64-with-nulls (no pandas float64 upcast to repair), and the
    # join already implements SQL null semantics (NULL keys never match;
    # anti/left keep unmatched null-keyed probe rows). Acero rejects NESTED
    # list/struct non-key columns, so those fall back to a pandas merge with
    # the same null semantics enforced manually and Arrow dtypes restored
    # from the unified schema afterwards.
    arrow_how = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]
    payload = on_cols + l_only + (r_only if how not in ("semi", "anti") else [])
    has_nested = any(
        pa.types.is_nested(unified.field(n).type) for n in payload
    )
    out_fields = [unified.field(n) for n in on_cols + l_only] + (
        [unified.field(n) for n in r_only] if how in ("inner", "left") else []
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lf = g.filter(pc.equal(side, 0)).select(on_cols + l_only)
        rf = g.filter(pc.equal(side, 1)).select(
            on_cols if how in ("semi", "anti") else on_cols + r_only
        )
        if not has_nested:
            return lf.join(rf, keys=on_cols, join_type=arrow_how)

        # ArrowDtype round-trip: int64-with-nulls stays int64 (no float64
        # upcast — a ≥2^53 id would silently round) and nested values keep
        # their exact Arrow representation through the merge
        ldf = lf.to_pandas(types_mapper=pd.ArrowDtype)
        rdf = rf.to_pandas(types_mapper=pd.ArrowDtype)
        l_null = ldf[on_cols].isna().any(axis=1)
        ldf_null, ldf = ldf[l_null], ldf[~l_null]
        rdf = rdf[~rdf[on_cols].isna().any(axis=1)]
        if how in ("semi", "anti"):
            keys = rdf[on_cols].drop_duplicates()
            m = ldf.merge(keys, on=on_cols, how="left", indicator=True)
            want = "both" if how == "semi" else "left_only"
            out = m[m["_merge"] == want].drop(columns="_merge")
        else:
            out = ldf.merge(rdf, on=on_cols, how=how)
        # strict conversion back to the unified schema: ArrowDtype preserved
        # the exact types through the merge, so any failure here is a real
        # bug and must raise loudly (a silent dtype downgrade would give
        # this bucket's blocks a different schema from its siblings)
        tbl = pa.Table.from_arrays(
            [pa.Array.from_pandas(out[f.name], type=f.type) for f in out_fields],
            names=[f.name for f in out_fields],
        )
        if how in ("anti", "left") and len(ldf_null):
            # null-keyed probe rows are appended in ARROW (a pandas concat
            # would promote the all-null right columns to float64, rounding
            # big int64 ids — and its all-NA exclusion is deprecated)
            null_arrays = []
            for f in out_fields:
                if f.name in ldf_null.columns:
                    null_arrays.append(
                        pa.Array.from_pandas(ldf_null[f.name], type=f.type)
                    )
                else:
                    null_arrays.append(pa.nulls(len(ldf_null), f.type))
            tbl = pa.concat_tables(
                [tbl, pa.Table.from_arrays(null_arrays, names=tbl.column_names)]
            )
        return tbl

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def copartition_range_join(
    left,
    right,
    on,
    condition,
    num_buckets: int = 32,
    batch_size: int = 65536,
):
    """Range / interval join: equality on ``on`` plus an arbitrary
    row-level ``condition`` (a vectorized pandas-DataFrame → bool-mask
    callable over the joined frame). Implementation: the co-partitioned
    equality join does the heavy lifting (one hash exchange per side), the
    range predicate filters each joined batch — the standard
    equality-key-then-filter range-join plan. Cost note: per-key output is
    the cartesian product of that key's rows before filtering; bound the
    per-key cardinality (or pre-aggregate) exactly as a SQL engine would
    for an inequality join without an interval index."""
    joined = copartition_join(
        left, right, on=on, num_buckets=num_buckets, how="inner",
        batch_size=batch_size,
    )

    def apply_condition(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df[condition(df)]

    return joined.map_batches(apply_condition, batch_format="pandas")


def copartition_asof_join(
    left,
    right,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
    direction: str = "backward",
    batch_size: int = 65536,
):
    """Distributed AS-OF join (inner): for each left row, match the right
    row with the greatest ``right_on`` ≤ ``left_on`` (``direction=
    "backward"``; ``"forward"`` = smallest ≥) sharing the same equality key
    (``left_by`` = ``right_by``).

    Ray Data has no as-of join; the lake-scale shape is the same
    co-partition recipe as ``copartition_join``: ONE hash exchange per side
    on the equality key, then a per-bucket sorted ``pandas.merge_asof``.
    Partitioning assumption: equality keys only; a bucket of both sides
    fits one worker's heap; the ``on`` columns must share one dtype
    (cast beforehand — e.g. date32 → timestamp). Output dtypes are restored
    to the input Arrow types after the pandas round-trip (the inner join
    leaves no null-filled numerics behind).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    l_names = list(l_schema.names)
    r_only = [n for n in r_schema.names if n != right_by]
    overlap = set(l_names) & set(r_only)
    if overlap:
        raise ValueError(f"column names overlap across sides: {sorted(overlap)}")
    if l_schema.field(left_on).type != r_schema.field(right_on).type:
        raise TypeError(
            f"as-of 'on' dtypes differ: {l_schema.field(left_on).type} vs "
            f"{r_schema.field(right_on).type} — cast one side first"
        )

    out_schema = pa.schema(
        [l_schema.field(n) for n in l_names]
        + [r_schema.field(n) for n in r_only]
    )
    unified = pa.schema(
        list(out_schema)
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )
    key_t = l_schema.field(left_by).type

    def tag(side: int, by_col: str, rename: dict):
        def fn(t: pa.Table) -> pa.Table:
            arrays = {}
            for f in unified:
                src = rename.get(f.name, f.name)
                if f.name == "__side":
                    arrays[f.name] = pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    )
                elif f.name == "__bucket":
                    continue
                elif src in t.column_names:
                    arrays[f.name] = t.column(src).cast(f.type)
                else:
                    arrays[f.name] = pa.nulls(t.num_rows, f.type)
            key_tbl = pa.Table.from_arrays(
                [t.column(by_col).cast(key_t)], names=[left_by]
            )
            arrays["__bucket"] = pa.array(
                _key_buckets(key_tbl, [left_by], num_buckets)
            )
            return pa.Table.from_arrays(
                [arrays[f.name] for f in unified], schema=unified
            )

        return fn

    # the right side's by column rides in the LEFT key column slot (cast to
    # its type), so one unified schema serves both sides
    tagged = left.map_batches(
        tag(0, left_by, {}), batch_format="pyarrow", batch_size=batch_size
    ).union(
        right.map_batches(
            tag(1, right_by, {left_by: right_by}),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    )

    r_value_cols = [n for n in r_only]

    def merge_asof_bucket(g: pd.DataFrame) -> pa.Table:
        lf = g[g["__side"] == 0][l_names].sort_values(left_on, kind="mergesort")
        rf = g[g["__side"] == 1][[left_by] + r_value_cols].sort_values(
            right_on, kind="mergesort"
        )
        lf = lf[lf[left_on].notna() & lf[left_by].notna()]
        rf = rf[rf[right_on].notna() & rf[left_by].notna()]
        if lf.empty:
            return out_schema.empty_table()
        if rf.empty:
            m = pd.DataFrame()
        else:
            m = pd.merge_asof(
                lf, rf, left_on=left_on, right_on=right_on,
                by=left_by, direction=direction,
            ).dropna(subset=[right_on])
        if m.empty:
            return out_schema.empty_table()
        arrays = []
        for f in out_schema:
            col = pa.Array.from_pandas(m[f.name])
            if col.type != f.type:
                col = col.cast(f.type)
            arrays.append(col)
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return tagged.groupby("__bucket").map_groups(
        merge_asof_bucket, batch_format="pandas"
    )
