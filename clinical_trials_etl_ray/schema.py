"""Canonical Arrow schemas for the CDC/incremental-ingest engine.

The lake table models multi-turn conversation transcripts keyed by
``(conv_id, turn_idx)``; the change-event (binlog) schema layers an LSN total
order and an op column on top. This is the Ray-Data-native generalization of
the reference's keyed-upsert data model: MongoDB's unique index on
``header.euct_number`` plus ``update_one({key}, {"$set": doc}, upsert=True)``
(reference: trials_extractor/storage/mongodb_storage.py:87-92, 229-231) is
last-writer-wins keyed upsert; here the key is composite and the writer order
is the deterministic ``(ts, lsn)`` pair instead of racy arrival order
(reference: trials_extractor/utils/batch_utils.py:54-65 drains an
as_completed pool nondeterministically).
"""

from __future__ import annotations

import pyarrow as pa

# The user-facing lake table (BASELINE.json input_hint shape).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),       # upsert key part 1
        pa.field("turn_idx", pa.int32()),       # upsert key part 2
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),          # per-turn equality invariant
        pa.field("tool", pa.string()),          # nullable; schema-evolution column
        pa.field("ts", pa.timestamp("us")),     # LWW tiebreaker before lsn
    ]
)

# Change-event (binlog) rows. Files are LSN-range shards.
EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),            # unique, totally ordered
        pa.field("op", pa.string()),            # insert | update | delete
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),          # null for deletes
        pa.field("text", pa.string()),          # null for deletes
        pa.field("tool", pa.string()),          # appears mid-stream (evolution)
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Early-epoch event schema, before the additive ``tool`` column appears.
EVENT_SCHEMA_V0 = pa.schema([f for f in EVENT_SCHEMA if f.name != "tool"])

# Physical lake-file schema: base and delta files both carry the full event
# payload so that LWW can be re-resolved across base + deltas at read time
# (merge-on-read). ``op`` is retained so delete tombstones survive until
# compaction.
LAKE_FILE_SCHEMA = EVENT_SCHEMA

KEY_COLUMNS = ["conv_id", "turn_idx"]
ORDER_COLUMNS = ["ts", "lsn"]          # LWW winner = max over this pair
PAYLOAD_COLUMNS = ["role", "text", "tool"]

OPS = ("insert", "update", "delete")


def unify_to_schema(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``target``, null-filling absent columns.

    Additive schema evolution for ANY Arrow type including nested
    struct/list/map payload columns (SURVEY §1.2 maps the reference's
    4-level nested documents, trials_extractor/extractors/locations.py:
    114-130, to nested Arrow columns): a shard written before a column
    existed gains an all-null column of the target type; same-name columns
    are cast (raises on lossy casts rather than corrupting)."""
    if table.schema.equals(target):  # steady-state fast path: zero-copy
        return table
    arrays = []
    for field in target:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(table.num_rows, field.type))
    return pa.Table.from_arrays(arrays, schema=target)


def unify_to_event_schema(table: pa.Table) -> pa.Table:
    """Project ``table`` onto EVENT_SCHEMA, null-filling absent columns.

    Implements additive schema evolution: early binlog shards lack ``tool``
    (the reference analog is dropped-empty-keys dynamic schema,
    trials_extractor/processors/cleaner.py:92-125 — we keep nulls instead of
    dropping keys, so every block shares one unified schema).
    """
    return unify_to_schema(table, EVENT_SCHEMA)


def schema_to_b64(s: pa.Schema) -> str:
    """Serialize a schema (IPC + base64) for embedding in the manifest."""
    import base64

    return base64.b64encode(s.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(b: str) -> pa.Schema:
    import base64

    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(b)))


def union_event_schema(schemas) -> pa.Schema:
    """EVENT_SCHEMA plus every additional field seen in ``schemas``, in
    first-seen order — the additive-evolution union the replay path unifies
    all shards onto. Re-typed core columns are NOT allowed to widen the
    canonical types (they cast to EVENT_SCHEMA's); extra columns keep their
    shard-declared type, nested types included, and must agree across
    shards."""
    fields = list(EVENT_SCHEMA)
    seen = {f.name: f.type for f in EVENT_SCHEMA}
    for s in schemas:
        for f in s:
            if f.name not in seen:
                fields.append(pa.field(f.name, f.type))
                seen[f.name] = f.type
            elif f.name not in EVENT_SCHEMA.names and seen[f.name] != f.type:
                raise TypeError(
                    f"evolved column {f.name!r} declared with conflicting "
                    f"types: {seen[f.name]} vs {f.type}"
                )
    return pa.schema(fields)
