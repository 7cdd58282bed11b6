"""External-format binlog ingestion: JSONL / CSV change logs → parquet shards.

Timestamps in foreign shards must be ISO-8601 strings (or native
timestamps); bare epoch integers are rejected EXPLICITLY (an int64→us cast
would silently misread epoch-milliseconds as microseconds).

The replay hot path is parquet-only on purpose (footer LSN stats drive
chunk planning and resume pruning), so foreign formats are converted ONCE,
shard-for-shard — each source file becomes one parquet shard with the same
stem, preserving the producer's LSN locality so the chunk planner sees the
same ranges it would have seen natively. Conversion runs as parallel Ray
tasks (one per shard; pyarrow's json/csv readers release the GIL).

Reference analog: the HTML-directory reader front-end
(trials_extractor/utils/batch_utils.py:45-51 — one file, one task) rebuilt
as a format adapter in front of the CDC engine.
"""

from __future__ import annotations

import os

import pyarrow as pa

_EXTS = {"jsonl": (".jsonl", ".ndjson", ".json"), "csv": (".csv",)}


def _read_one(path: str, fmt: str) -> pa.Table:
    if fmt == "jsonl":
        import pyarrow.json as pj

        t = pj.read_json(path)
    elif fmt == "csv":
        import pyarrow.csv as pcsv

        # empty CSV cells are NULL (not ''), matching the native parquet
        # representation of delete tombstones / pre-evolution rows
        t = pcsv.read_csv(
            path,
            convert_options=pcsv.ConvertOptions(strings_can_be_null=True),
        )
    else:
        raise ValueError(f"unsupported binlog format {fmt!r}")
    if "ts" in t.column_names and pa.types.is_integer(t.schema.field("ts").type):
        raise ValueError(
            f"{path!r}: ts is a bare epoch integer — emit ISO-8601 strings "
            "or native timestamps (epoch ms vs us is ambiguous)"
        )
    # normalize inferred column types onto the event schema (JSON infers
    # ints for timestamps-as-epoch etc.); extra columns ride along for
    # additive evolution
    from ..schema import union_event_schema, unify_to_schema

    target = union_event_schema([t.schema])
    return unify_to_schema(t, target)


def convert_binlog_shards(
    src_dir: str, out_dir: str, fmt: str = "jsonl", parallel: bool | None = None
) -> list:
    """Convert every ``fmt`` shard in ``src_dir`` to a parquet shard of the
    same stem under ``out_dir``. Returns the written paths. A ``_meta.json``
    disorder-bound sidecar, if present, is copied along."""
    import shutil

    import ray

    exts = _EXTS[fmt]
    names = sorted(
        f for f in os.listdir(src_dir)
        if f.endswith(exts) and not f.startswith("_")  # skip sidecars
    )
    if not names:
        raise FileNotFoundError(f"no .{fmt} shards under {src_dir!r}")
    stems = [os.path.splitext(n)[0] for n in names]
    dupes = {x for x in stems if stems.count(x) > 1}
    if dupes:
        raise ValueError(
            f"source shards collide on parquet stems {sorted(dupes)} — "
            "rename them; a silent overwrite would drop a shard's events"
        )
    os.makedirs(out_dir, exist_ok=True)
    meta = os.path.join(src_dir, "_meta.json")
    if os.path.exists(meta):
        shutil.copy(meta, os.path.join(out_dir, "_meta.json"))

    def _convert(name: str) -> str:
        import pyarrow.parquet as pq

        t = _read_one(os.path.join(src_dir, name), fmt)
        stem = os.path.splitext(name)[0]
        dst = os.path.join(out_dir, f"{stem}.parquet")
        pq.write_table(t, dst)
        return dst

    if parallel is None:
        parallel = ray.is_initialized() and len(names) > 1
    if not parallel:
        return [_convert(n) for n in names]

    task = ray.remote(_convert)
    return sorted(ray.get([task.remote(n) for n in names]))


def replay_external(
    src_dir: str, lake_dir: str, fmt: str = "jsonl", work_dir: str | None = None,
    **replay_kwargs,
):
    """Convenience: convert a foreign-format binlog then replay it. The
    converted parquet copy is removed after the replay when this function
    created the temp dir (pass ``work_dir`` to keep it)."""
    import shutil

    from ..functions.scratch import scratch_dir
    from ..pipelines.replay import replay

    out = work_dir or scratch_dir("binlog_pq_")
    try:
        convert_binlog_shards(src_dir, out, fmt=fmt)
        return replay(out, lake_dir, **replay_kwargs)
    finally:
        if work_dir is None:
            shutil.rmtree(out, ignore_errors=True)
