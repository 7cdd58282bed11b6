"""Incremental materialized-view maintenance over the CDC lake.

A materialized view here is a per-conversation aggregate table
(``conv_id → n_turns, n_tool, text_chars, last_ts``) kept continuously
consistent with the lake by *incremental refresh*: only buckets whose
manifest gained files with ``max_lsn`` above the view's recorded watermark
are recomputed — O(touched partitions), never O(lake) — and the result is
published through the same exactly-once ``Manifest`` commit protocol as the
lake itself (optimistic-concurrency version files, content-hash-named
immutable parquet, time travel via retained versions).

Why this is bucket-local (shuffle-free): the view's group key is
``conv_id``, the lake's hash-partitioning key, so every group's rows live in
one bucket when ``salt_factor == 1``. Salted lakes spread a conversation's
turns over ``salt_factor`` buckets, so each bucket stores *mergeable
partials* (sum/sum/sum/max are all associative) and ``read_matview``
finishes with one small groupby over ~``n_convs × salt_factor`` partial
rows — exchange volume is the view, not the lake.

Scale shape at 100 TB: refresh cost is driven by the CHANGE RATE, not the
table size. A poll loop (``pipelines.replay.follow`` + ``refresh_matview``)
touches only the buckets the last commits wrote into; all other buckets are
skipped from manifest metadata alone (no file I/O at all).

Reference analog: the Streamlit dashboard re-runs its Mongo aggregation
pipelines from scratch on every page load
(st_trial_analytics.py:207-243,346-454); this is the incremental
re-expression — the aggregate is maintained, not recomputed.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import Manifest, bucket_dir
from .merge import _write_immutable, live_rows, resolve_bucket

MV_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int64()),
        pa.field("n_tool", pa.int64()),
        pa.field("text_chars", pa.int64()),
        pa.field("last_ts", pa.timestamp("us")),
    ]
)


@dataclass
class MatviewRefreshReport:
    """What one refresh did — the observability contract mirroring
    ``ReplayReport`` (buckets skipped purely from manifest metadata are the
    incremental win)."""

    buckets_total: int = 0
    buckets_refreshed: int = 0
    rows_written: int = 0
    mv_version: int = 0
    as_of_watermark: int = -1


def conv_partials(live: pa.Table) -> pa.Table:
    """Per-bucket partial aggregate of live transcript rows, grouped by
    conv_id (vectorized Arrow groupby — no Python row loop). Partials are
    exact totals when the lake is unsalted; mergeable via
    ``merge_partials`` otherwise."""
    if live.num_rows == 0:
        return MV_SCHEMA.empty_table()
    t = pa.table(
        {
            "conv_id": live["conv_id"],
            "tool": live["tool"].cast(pa.string())
            if "tool" in live.column_names
            else pa.nulls(live.num_rows, pa.string()),
            # cast first: an all-null column may arrive null-typed (e.g.
            # evolution gaps), and coalesce(null, string) has no kernel
            "text_chars": pc.cast(
                pc.utf8_length(
                    pc.coalesce(
                        live["text"].cast(pa.string()),
                        pa.scalar("", pa.string()),
                    )
                ),
                pa.int64(),
            ),
            "ts": live["ts"],
        }
    )
    g = t.group_by("conv_id").aggregate(
        [
            ("conv_id", "count"),
            ("tool", "count"),
            ("text_chars", "sum"),
            ("ts", "max"),
        ]
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "n_turns": g["conv_id_count"],
            "n_tool": g["tool_count"],
            "text_chars": g["text_chars_sum"],
            "last_ts": g["ts_max"],
        }
    ).cast(MV_SCHEMA)


def merge_partials(partials: pa.Table) -> pa.Table:
    """Combine per-bucket partials that share a conv_id (salted lakes):
    counts/sums add, last_ts maxes — the standard partial/final combine."""
    if partials.num_rows == 0:
        return MV_SCHEMA.empty_table()
    g = partials.group_by("conv_id").aggregate(
        [("n_turns", "sum"), ("n_tool", "sum"), ("text_chars", "sum"), ("last_ts", "max")]
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "n_turns": g["n_turns_sum"],
            "n_tool": g["n_tool_sum"],
            "text_chars": g["text_chars_sum"],
            "last_ts": g["last_ts_max"],
        }
    ).cast(MV_SCHEMA)


def _files_fingerprint(files: list) -> str:
    """Order-insensitive digest of a bucket's committed file list. Content
    hashes name the immutable files, so equal fingerprints ⇒ byte-identical
    inputs ⇒ identical resolved state."""
    import hashlib

    ids = sorted(f.get("content_hash") or f["path"] for f in files)
    return hashlib.sha1("\n".join(ids).encode()).hexdigest()


def refresh_matview(
    lake_dir: str, mv_dir: str, full: bool = False
) -> MatviewRefreshReport:
    """Bring the view up to the lake's committed state.

    Incremental by manifest metadata: a bucket's resolved state is a pure
    function of its committed file list (LWW is deterministic), so bucket
    ``b`` is recomputed only when the fingerprint of its lake file list
    differs from the one recorded at the view's last refresh — exact for
    ordered AND out-of-order binlogs (an LSN-watermark test would re-refresh
    everything forever under a conservative ``disorder_bound`` tail
    watermark, since committed files legitimately carry LSNs above it).
    Compaction changes the file list without changing state and so triggers
    a harmless one-time re-refresh of the folded buckets. Recomputation is
    one Ray task per touched bucket — resolve LWW winners, drop tombstones,
    Arrow groupby — with NO shuffle; the driver then publishes one atomic
    ``Manifest`` commit swapping exactly the touched buckets' view files
    (crash-safe/exactly-once like the lake: losers of a concurrent race get
    ``ConcurrentWriterError``, retries rewrite identical content hashes).

    ``full=True`` forces a complete rebuild (used to seed a new view — and
    as the equivalence oracle for the incremental path in tests)."""
    import ray

    lake_man = Manifest.load(lake_dir)
    mv_man = Manifest.load_or_create(
        mv_dir, lake_man.num_buckets, salt_factor=lake_man.salt_factor
    )
    report = MatviewRefreshReport(
        buckets_total=lake_man.num_buckets,
        mv_version=mv_man.version,
        as_of_watermark=mv_man.global_watermark(),
    )

    prior_fps = mv_man.metrics.get("bucket_fps", {})
    todo = []
    fps = {}
    for b in range(lake_man.num_buckets):
        files = lake_man.files_for_bucket(b)
        fps[str(b)] = _files_fingerprint(files)
        if full or fps[str(b)] != prior_fps.get(str(b)):
            todo.append((b, files))
    if not todo:
        return report

    @ray.remote
    def _recompute(bucket: int, files: list):
        from ..functions.hashing import content_hash

        agg = conv_partials(
            live_rows(resolve_bucket(lake_dir, bucket, files))
        )
        if agg.num_rows == 0:
            return bucket, None
        h = content_hash(agg)
        path = _write_immutable(agg, bucket_dir(mv_dir, bucket), f"agg-{h}.parquet")
        import os

        return bucket, {
            "path": os.path.relpath(path, mv_dir),
            "kind": "mv",
            "content_hash": h,
            "row_count": agg.num_rows,
            "min_lsn": -1,
            "max_lsn": -1,
        }

    replace = {}
    rows = 0
    for bucket, info in ray.get([_recompute.remote(b, fs) for b, fs in todo]):
        replace[bucket] = [info] if info else []
        rows += info["row_count"] if info else 0

    mv_man = mv_man.commit(
        [],
        new_watermark_lsn=lake_man.global_watermark(),
        replace_buckets=replace,
        metrics={
            "matview_refresh": True,
            "lake_version": lake_man.version,
            "buckets_refreshed": len(todo),
            "rows_written": rows,
            # full per-bucket fingerprint map (refreshed + carried-forward)
            # — the next refresh's skip oracle
            "bucket_fps": fps,
        },
    )
    report.buckets_refreshed = len(todo)
    report.rows_written = rows
    report.mv_version = mv_man.version
    report.as_of_watermark = mv_man.global_watermark()
    return report


def build_matview(lake_dir: str, mv_dir: str) -> MatviewRefreshReport:
    """Seed a view directory with a full build (= forced refresh)."""
    return refresh_matview(lake_dir, mv_dir, full=True)


def read_matview(mv_dir: str, version: int | None = None):
    """Ray Dataset of the view. Unsalted lakes read the stored partials
    verbatim (already exact, zero shuffle); salted lakes finish with one
    groupby over the view-sized partials (``merge_partials`` per group)."""
    import os

    import ray.data

    man = Manifest.load(mv_dir) if version is None else Manifest.load_version(
        mv_dir, version
    )
    paths = sorted(os.path.join(mv_dir, p) for p in man.all_files())
    if not paths:
        return ray.data.from_arrow(MV_SCHEMA.empty_table())
    # partitioning=None: the bucket=NNNNN layout is lake plumbing, not a
    # hive partition column of the view
    ds = ray.data.read_parquet(paths, partitioning=None)
    if man.salt_factor == 1:
        return ds
    return ds.groupby("conv_id").map_groups(merge_partials, batch_format="pyarrow")
