"""CDC correctness-harness queries over the driver's testdata tables.

The driver compares each Ray pipeline against ANSI SQL run by DuckDB on the
same parquet views, so the CDC engine is exercised through a binlog derived
DETERMINISTICALLY from the ``events`` table with arithmetic that both numpy
and DuckDB compute identically (integer modular arithmetic only — no
float rounding, no platform hashes):

    lsn      = event_id
    op       = purchase→delete, view/signup→insert, else update
    conv_id  = 'c' || (user_id % 100)
    turn_idx = event_id % 50
    role     = event_id % 4 → user/assistant/system/tool
    text     = props || ':' || event_type
    tool     = event_type when event_id % 10 >= 7 else NULL  (evolution col)
    ts       = ts + ((event_id * 2654435761) % 97) hours     (LWW jitter)

The ts jitter makes the LWW winner by (ts, lsn) differ from the max-lsn
event, exercising the deterministic tie-break (SURVEY §2.9). The SQL oracle
expresses final-table replay as a window: winner per key = row_number()=1
ordered by (ts DESC, lsn DESC); live rows are winners whose op != 'delete'.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scratch import scratch_dir

from ..schema import EVENT_SCHEMA

_ROLE_NAMES = np.array(["user", "assistant", "system", "tool"])

# ---------------------------------------------------------------------------
# Ray side
# ---------------------------------------------------------------------------


def events_to_binlog(batch: pa.Table) -> pa.Table:
    """Vectorized events→change-events derivation (map_batches, pyarrow)."""
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    et = batch.column("event_type")
    props = batch.column("props")

    is_del = pc.equal(et, "purchase")
    is_ins = pc.is_in(et, value_set=pa.array(["view", "signup"]))
    op = pc.if_else(is_del, "delete", pc.if_else(is_ins, "insert", "update"))

    conv = pc.binary_join_element_wise("c", pa.array((uid % 100).astype("U")), "")
    turn = pa.array((eid % 50).astype(np.int32))
    role = pa.array(_ROLE_NAMES[eid % 4])
    text = pc.binary_join_element_wise(props, et, ":")
    tool = pc.if_else(pa.array(eid % 10 >= 7), et, pa.nulls(len(eid), pa.string()))

    ts = batch.column("ts").to_numpy(zero_copy_only=False)
    jitter_h = (eid * 2654435761) % 97
    ts2 = ts + jitter_h * np.timedelta64(3_600_000_000, "us")

    return pa.Table.from_arrays(
        [
            pa.array(eid),
            op,
            conv,
            turn,
            role,
            text,
            tool,
            pa.array(ts2, type=pa.timestamp("us")),
        ],
        schema=EVENT_SCHEMA,
    )


def derived_binlog_ds(sf_dir: str):
    """Ray Dataset of the derived binlog for a testdata dir."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return ds.map_batches(events_to_binlog, batch_format="pyarrow")


def run_cdc_replay(
    sf_dir: str,
    num_buckets: int = 16,
    files_per_chunk: int = 4,
    compact_first: bool = False,
    conv_range: tuple | None = None,
    ts_min=None,
    delete_conv_range: tuple | None = None,
    rebucket_to: tuple | None = None,
):
    """Full engine E2E: derive binlog → write shards → chunked replay with
    manifest commits → shuffle-free final-table read. Returns the final
    transcript table as a pyarrow Table.

    ``compact_first`` folds every bucket to a sorted, stats-carrying base
    file before the read; ``conv_range`` / ``ts_min`` exercise the
    manifest-pruned predicate-pushdown read paths
    (stages/merge.read_final_table)."""
    from ..pipelines.replay import compact, replay
    from ..stages.merge import read_final_table

    work = scratch_dir("cdc_replay_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    replay(binlog_dir, lake_dir, num_buckets=num_buckets, files_per_chunk=files_per_chunk)
    if delete_conv_range is not None:
        from .retention import delete_where

        delete_where(lake_dir, conv_range=delete_conv_range)
    if compact_first:
        compact(lake_dir)
    if rebucket_to is not None:
        from .retention import rebucket

        new_buckets, new_salt = rebucket_to
        rebucket(lake_dir, new_buckets, new_salt_factor=new_salt)
    final = read_final_table(lake_dir, conv_range=conv_range, ts_min=ts_min)
    # materialize before cleaning the temp lake (result is ~#keys rows, small
    # relative to the log; the heavy work happened in the replay above)
    from ..schema import TRANSCRIPT_SCHEMA

    table = pa.concat_tables(
        list(final.iter_batches(batch_format="pyarrow"))
        or [TRANSCRIPT_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


# ---------------------------------------------------------------------------
# SQL side (DuckDB oracle)
# ---------------------------------------------------------------------------

BINLOG_CTE = """
  SELECT
    event_id AS lsn,
    CASE WHEN event_type = 'purchase' THEN 'delete'
         WHEN event_type IN ('view', 'signup') THEN 'insert'
         ELSE 'update' END AS op,
    'c' || CAST(user_id % 100 AS VARCHAR) AS conv_id,
    CAST(event_id % 50 AS INTEGER) AS turn_idx,
    CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
         WHEN 2 THEN 'system' ELSE 'tool' END AS role,
    props || ':' || event_type AS text,
    CASE WHEN event_id % 10 >= 7 THEN event_type ELSE NULL END AS tool,
    ts + to_hours(CAST((event_id * 2654435761) % 97 AS BIGINT)) AS ts
  FROM events
"""

SQL_BINLOG = f"SELECT * FROM ({BINLOG_CTE})"

SQL_WINNERS = f"""
WITH binlog AS ({BINLOG_CTE}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM binlog
)
SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1
"""

SQL_FINAL = f"""
WITH binlog AS ({BINLOG_CTE}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM binlog
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""

SQL_FINAL_BY_ROLE = f"""
WITH final AS ({SQL_FINAL})
SELECT role, COUNT(*) AS n_turns, COUNT(tool) AS n_tool
FROM final GROUP BY role
"""


# ---------------------------------------------------------------------------
# queries() callables
# ---------------------------------------------------------------------------


def q_cdc_binlog_derive(sf_dir: str):
    return derived_binlog_ds(sf_dir)


def q_cdc_lww_winners(sf_dir: str):
    """Distributed winners incl. tombstones: derive → in-batch dedupe →
    bucket groupby → per-group LWW (associative combine, like the engine)."""
    from ..functions.hashing import bucket_ids
    from ..stages.dedupe import dedupe_batch, lww_winners

    ds = derived_binlog_ds(sf_dir)
    ds = ds.map_batches(dedupe_batch, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(bucket_ids(t["conv_id"], 16), pa.int32()))

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(
        lambda g: lww_winners(g).drop_columns(["bucket"]), batch_format="pyarrow"
    )
    return out


def q_cdc_replay_final(sf_dir: str):
    return run_cdc_replay(sf_dir)


def q_cdc_rebucket_final(sf_dir: str):
    """In-place re-partitioning is state-preserving (round-4 `rebucket`,
    pipelines/retention.py): replay → major compaction (sorted bases) →
    rebucket 16→24 buckets with salt 1→2 → read on the NEW layout. Oracle:
    the same SQL_FINAL as cdc_replay_final — the layout change must not
    alter a single row."""
    return run_cdc_replay(
        sf_dir, compact_first=True, rebucket_to=(24, 2)
    )


def q_cdc_final_by_role(sf_dir: str):
    """Aggregate over the engine's final table (read path + groupby)."""
    import ray.data
    from ray.data.aggregate import Count

    table = run_cdc_replay(sf_dir)
    ds = ray.data.from_arrow(table)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["role", "tool"]).to_pandas()
        g = df.groupby("role", as_index=False).agg(
            n_turns=("role", "size"), n_tool=("tool", "count")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("role").aggregate(
        Sum("n_turns", alias_name="n_turns"), Sum("n_tool", alias_name="n_tool")
    )

    def cast_back(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("n_tool"),
            "n_tool",
            t.column("n_tool").cast(pa.int64()),
        ).set_column(
            t.column_names.index("n_turns"),
            "n_turns",
            t.column("n_turns").cast(pa.int64()),
        )

    return out.map_batches(cast_back, batch_format="pyarrow")


def q_cdc_final_conv_filter(sf_dir: str):
    """Non-key access path to the lake (the secondary-index analog,
    reference: mongodb_storage.py:94-134): replay → compact (sorts each
    bucket by (conv_id, turn_idx) and records per-file conv min/max in the
    manifest) → predicate-pushdown read of one conv_id range, pruning files
    from manifest stats before any I/O. The range is lexicographic on the
    string key (matches 'c1', 'c10'..'c19', 'c2'); byte-wise string
    comparison agrees between Arrow and DuckDB."""
    return run_cdc_replay(sf_dir, compact_first=True, conv_range=("c1", "c2"))


SQL_FINAL_CONV_FILTER = f"""
WITH final AS ({SQL_FINAL})
SELECT * FROM final WHERE conv_id >= 'c1' AND conv_id <= 'c2'
"""


def _events_ts_mid_us(sf_dir: str) -> int:
    """min + (max−min)//2 of the events table's ts in epoch µs, from parquet
    row-group statistics (O(row groups) driver I/O; falls back to a
    single-column read only if a writer omitted stats). Must stay
    arithmetically identical to the SQL oracle's expression."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    f = pq.ParquetFile(path)
    md = f.metadata
    idx = md.schema.to_arrow_schema().get_field_index("ts")
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            t = pq.read_table(path, columns=["ts"])
            mm = pc.min_max(t["ts"].cast(pa.int64())).as_py()
            return mm["min"] + (mm["max"] - mm["min"]) // 2
        mins.append(st.min)
        maxs.append(st.max)

    def us(v):
        return pa.scalar(v, pa.timestamp("us")).cast(pa.int64()).as_py()

    lo, hi = min(us(v) for v in mins), max(us(v) for v in maxs)
    return lo + (hi - lo) // 2


def q_cdc_final_ts_filter(sf_dir: str):
    """Event-time access path to the lake: replay → compact (records
    per-file ts ranges in the manifest) → read with ``ts_min`` at the
    events-table ts midpoint — files wholly below the cut are pruned from
    manifest stats before any I/O (the sound prune argued in
    stages/merge.read_final_table), then rows are filtered post-LWW."""
    return run_cdc_replay(
        sf_dir, compact_first=True, ts_min=_events_ts_mid_us(sf_dir)
    )


SQL_FINAL_TS_FILTER = f"""
WITH final AS ({SQL_FINAL})
SELECT * FROM final WHERE epoch_us(ts) >= (
  SELECT epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2
  FROM events)
"""


def q_cdc_delete_where(sf_dir: str):
    """Write-side predicate delete (pipelines/retention.delete_where):
    replay → tombstone every live row in a conv range through the same
    exactly-once commit path as ingest → read the final table. The match
    scan is projection-pushed (only LWW key columns decoded) and
    manifest-pruned. Oracle: LWW final state minus the range (lexicographic
    string compare agrees between Arrow and DuckDB).

    Reference analog: delete-by-query + re-export
    (trials_extractor/storage/mongodb_storage.py:154-245)."""
    return run_cdc_replay(sf_dir, delete_conv_range=("c3", "c5"))


SQL_DELETE_WHERE = f"""
WITH final AS ({SQL_FINAL})
SELECT * FROM final WHERE conv_id < 'c3' OR conv_id > 'c5'
"""


def q_cdc_upsert_corrections(sf_dir: str):
    """Out-of-band correction batch (pipelines/retention.upsert_table —
    the lake's MERGE INTO): replay, then rewrite conversation c7's text to
    'corrected:'||role via a point-lookup-pruned read of its current
    winners (same ts ⇒ the engine-allocated LSN above every committed row
    decides), one shuffle-free upsert commit, read the final table.
    Oracle: SQL_FINAL with the same CASE rewrite."""
    from ..pipelines.retention import upsert_table
    from ..pipelines.replay import replay
    from ..stages.merge import read_final_table
    from ..schema import TRANSCRIPT_SCHEMA

    work = scratch_dir("cdc_upsert_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    replay(binlog_dir, lake_dir, num_buckets=16, files_per_chunk=4)

    def fix(t: pa.Table) -> pa.Table:
        fixed = pc.binary_join_element_wise("corrected:", t["role"], "")
        return t.set_column(t.column_names.index("text"), "text", fixed)

    corr = read_final_table(lake_dir, conv_id="c7").map_batches(
        fix, batch_format="pyarrow"
    )
    upsert_table(lake_dir, corr)
    final = read_final_table(lake_dir)
    table = pa.concat_tables(
        list(final.iter_batches(batch_format="pyarrow"))
        or [TRANSCRIPT_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


SQL_UPSERT_CORRECTIONS = f"""
WITH final AS ({SQL_FINAL})
SELECT conv_id, turn_idx, role,
       CASE WHEN conv_id = 'c7' THEN 'corrected:' || role ELSE text END AS text,
       tool, ts
FROM final
"""


def q_heavy_hitter_convs(sf_dir: str):
    """Exact phi-heavy conversations of the change log WITHOUT a global
    groupby (stages/sketch.heavy_hitters): a Misra-Gries candidate sketch
    pass (tiny mergeable partials, guaranteed no false negatives at
    k >= phi_denom) + an exact recount of candidates only — the 10^10-event
    shape for "which conversations dominate the log". phi = 1/200 (0.5%).
    Oracle: plain GROUP BY ... HAVING with the same integer threshold."""
    from ..stages.sketch import heavy_hitters

    return heavy_hitters(derived_binlog_ds(sf_dir), "conv_id", phi_denom=200)


SQL_HEAVY_HITTER_CONVS = f"""
WITH binlog AS ({BINLOG_CTE})
SELECT conv_id AS key, COUNT(*) AS n
FROM binlog
GROUP BY conv_id
HAVING COUNT(*) * 200 >= (SELECT COUNT(*) FROM binlog)
"""


def q_cdc_conv_gaps(sf_dir: str):
    """Transcript integrity QA over the lake: conversations with MISSING
    turns (holes in the 0..max(turn_idx) sequence after replay — deletes
    and never-arrived events both leave gaps). The scan is the keys-only
    projected read (columns=[] — at transcript scale the text column never
    leaves disk), per-batch partials (count, max turn per conv) combine
    through one tiny pre-aggregated groupby — the partial/final shape, no
    full-row shuffle. Oracle: GROUP BY/HAVING over the SQL final state."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    from ..pipelines.replay import replay
    from ..stages.merge import read_final_table

    work = scratch_dir("cdc_gaps_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    replay(binlog_dir, lake_dir, num_buckets=16, files_per_chunk=4)

    keys = read_final_table(lake_dir, columns=[])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["conv_id", "turn_idx"]).to_pandas()
        g = df.groupby("conv_id", as_index=False).agg(
            n_turns=("turn_idx", "size"), max_turn=("turn_idx", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        keys.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n_turns", alias_name="n_turns"),
                   Max("max_turn", alias_name="max_turn"))
    )

    def finish(t: pa.Table) -> pa.Table:
        miss = pc.subtract(
            pc.add(t["max_turn"].cast(pa.int64()), 1),
            t["n_turns"].cast(pa.int64()),
        )
        keep = pc.greater(miss, 0)
        out = pa.table({
            "conv_id": t["conv_id"],
            "n_missing": miss,
        }).filter(keep)
        return out

    result = agg.map_batches(finish, batch_format="pyarrow")
    table = pa.concat_tables(
        list(result.iter_batches(batch_format="pyarrow"))
        or [pa.table({"conv_id": pa.array([], pa.string()),
                      "n_missing": pa.array([], pa.int64())})]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


SQL_CONV_GAPS = f"""
WITH final AS ({SQL_FINAL})
SELECT conv_id, CAST(MAX(turn_idx) + 1 - COUNT(*) AS BIGINT) AS n_missing
FROM final
GROUP BY conv_id
HAVING MAX(turn_idx) + 1 - COUNT(*) > 0
"""


def q_cdc_bootstrap_handoff(sf_dir: str):
    """Snapshot → streaming handoff (pipelines/bootstrap.py): replay the
    first half of the derived binlog into a staging lake, export its
    CDC-aware snapshot (winners incl. tombstones at the watermark cut),
    bootstrap a FRESH lake from the snapshot (different bucket count —
    re-partitioning is allowed), then replay the FULL binlog into it.
    Pre-cut chunks are watermark-skipped, straddling rows stale-filtered.
    Oracle: the from-scratch full-replay final state (SQL_FINAL) — the
    handoff must be observationally equivalent to never having
    bootstrapped at all."""
    from ..pipelines.bootstrap import bootstrap_lake, export_snapshot
    from ..pipelines.replay import replay
    from ..stages.merge import read_final_table
    from ..schema import TRANSCRIPT_SCHEMA

    work = scratch_dir("cdc_bootstrap_")
    binlog_dir = os.path.join(work, "binlog")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    shards = sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )
    staging = os.path.join(work, "staging")
    replay(shards[: max(1, len(shards) // 2)], staging, num_buckets=16)
    snap = os.path.join(work, "snapshot")
    export_snapshot(staging, snap)
    lake = os.path.join(work, "lake")
    bootstrap_lake(snap, lake, num_buckets=8)
    replay(binlog_dir, lake, num_buckets=8)
    final = read_final_table(lake)
    table = pa.concat_tables(
        list(final.iter_batches(batch_format="pyarrow"))
        or [TRANSCRIPT_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


def _events_lsn_bounds(sf_dir: str) -> tuple[int, int]:
    """(min, max) of events.event_id (= binlog lsn) from parquet row-group
    statistics — O(row groups) driver I/O."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("event_id")
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            t = pq.read_table(path, columns=["event_id"])
            mm = pc.min_max(t["event_id"]).as_py()
            return mm["min"], mm["max"]
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def q_cdc_change_feed(sf_dir: str):
    """Incremental consumption (the downstream half of CDC): replay the
    derived binlog into a lake, then read the NET-CHANGE FEED for the
    middle half of the LSN span — collapsed change rows including delete
    tombstones, exactly what a consumer polling "changes since my
    watermark" applies to its copy.

    The binlog is staged in three lsn partitions split AT the window cuts
    and replayed with files_per_chunk=1, so no ingest chunk straddles a
    cut — at watermark-aligned cuts the collapsed feed equals the SQL LWW
    over the raw in-window rows exactly (the same watermark-exactness
    contract as ``as_of_lsn`` time travel; the apply-invariant at
    ARBITRARY cuts is pytest-pinned in test_round3)."""
    from ..pipelines.replay import replay
    from ..stages.merge import read_change_feed

    mn, mx = _events_lsn_bounds(sf_dir)
    s = mn + (mx - mn) // 4
    u = mn + (3 * (mx - mn)) // 4

    work = scratch_dir("cdc_feed_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    ds = derived_binlog_ds(sf_dir)
    for lo, hi in ((None, s), (s, u), (u, None)):
        def cut(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            if lo is not None:
                t = t.filter(pc.greater(t["lsn"], lo))
            if hi is not None:
                t = t.filter(pc.less_equal(t["lsn"], hi))
            return t

        ds.map_batches(cut, batch_format="pyarrow").write_parquet(binlog_dir)
    replay(binlog_dir, lake_dir, num_buckets=16, files_per_chunk=1)
    from ..schema import EVENT_SCHEMA

    feed = read_change_feed(lake_dir, since_lsn=s, until_lsn=u)
    table = pa.concat_tables(
        list(feed.iter_batches(batch_format="pyarrow"))
        or [EVENT_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


SQL_CHANGE_FEED = f"""
WITH binlog AS ({BINLOG_CTE}),
bounds AS (SELECT min(event_id) AS mn, max(event_id) AS mx FROM events),
win AS (
  SELECT b.* FROM binlog b, bounds
  WHERE b.lsn > mn + (mx - mn) // 4
    AND b.lsn <= mn + (3 * (mx - mn)) // 4
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM win
)
SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1
"""


def q_cdc_replica_final(sf_dir: str):
    """CDC fan-out (pipelines/replay.sync_replica): replay HALF the derived
    binlog into a source lake → sync a replica (re-partitioned: 16 source
    buckets → 5 replica buckets, non-power-of-two) → replay the rest →
    second INCREMENTAL sync (the change feed is manifest-pruned to the
    deltas committed since the first sync) → read the REPLICA's final
    table. Oracle: the same SQL_FINAL as cdc_replay_final — replica state
    ≡ source state at the synced watermark regardless of how many syncs
    the history was split into. Registered beyond the driver's 50-query
    window; the oracle comparison runs in pytest
    (test_round3.test_displaced_window_queries_match_oracle,
    test_replica.py)."""
    from ..pipelines.replay import replay, sync_replica
    from ..schema import TRANSCRIPT_SCHEMA
    from ..stages.merge import read_final_table

    work = scratch_dir("cdc_replica_")
    binlog_dir = os.path.join(work, "binlog")
    src_lake = os.path.join(work, "src_lake")
    replica = os.path.join(work, "replica")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    shards = sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )
    half = max(1, len(shards) // 2)
    replay(shards[:half], src_lake, num_buckets=16, files_per_chunk=4)
    sync_replica(src_lake, replica, num_buckets=5)
    replay(shards, src_lake, num_buckets=16, files_per_chunk=4)
    sync_replica(src_lake, replica)
    final = read_final_table(replica)
    table = pa.concat_tables(
        list(final.iter_batches(batch_format="pyarrow"))
        or [TRANSCRIPT_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


def q_mv_conv_stats(sf_dir: str):
    """Incremental materialized-view maintenance (stages/matview.py): replay
    HALF the derived binlog → full MV build → replay the rest (manifest
    resume applies only the new chunks) → INCREMENTAL refresh (only buckets
    whose manifest gained higher-LSN files recompute) → read the view.
    The result must equal a from-scratch grouped aggregate over the final
    table — which is exactly what the SQL oracle computes. Registered beyond
    the driver's 50-query window; the oracle comparison runs in pytest
    (test_matview) instead."""
    from ..pipelines.replay import replay
    from ..stages.matview import (
        MV_SCHEMA,
        build_matview,
        read_matview,
        refresh_matview,
    )

    work = scratch_dir("cdc_mv_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    mv_dir = os.path.join(work, "mv")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    shards = sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )
    half = max(1, len(shards) // 2)
    replay(shards[:half], lake_dir, num_buckets=16, files_per_chunk=4)
    build_matview(lake_dir, mv_dir)
    replay(shards, lake_dir, num_buckets=16, files_per_chunk=4)
    refresh_matview(lake_dir, mv_dir)
    mv = read_matview(mv_dir)
    table = pa.concat_tables(
        list(mv.iter_batches(batch_format="pyarrow"))
        or [MV_SCHEMA.empty_table()]
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


SQL_MV_CONV_STATS = f"""
WITH final AS ({SQL_FINAL})
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(count(tool) AS BIGINT) AS n_tool,
  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS text_chars,
  max(ts) AS last_ts
FROM final GROUP BY conv_id
"""


def q_mv_role_hourly(sf_dir: str):
    """Event-time TUMBLING-WINDOW aggregate, maintained incrementally — the
    streaming windowed aggregate (stages/matview.py ViewSpec.time_col/
    window_s): replay half the derived binlog → build a role × hour view
    (win_start = floor(ts to the hour)) → replay the rest → incremental
    refresh touches only changed buckets, late/out-of-order events simply
    re-resolve their window's partials. The view read must equal a
    from-scratch role × hour grouped aggregate over the final table — the
    SQL oracle below. Windows are derived by exact epoch-μs integer floor
    division on both sides. Registered beyond the driver's 50-query window;
    the oracle comparison runs in pytest (test_matview.py)."""
    from ..pipelines.replay import replay
    from ..stages.matview import (
        ViewAgg,
        ViewSpec,
        build_matview,
        read_matview,
        refresh_matview,
    )

    spec = ViewSpec(
        key="role",
        aggs=(
            ViewAgg("n_turns", "count"),
            ViewAgg("text_chars", "sum_utf8_len", "text"),
        ),
        time_col="ts",
        window_s=3600,
    )
    work = scratch_dir("cdc_mv_win_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    mv_dir = os.path.join(work, "mv")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    shards = sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )
    half = max(1, len(shards) // 2)
    replay(shards[:half], lake_dir, num_buckets=16, files_per_chunk=4)
    build_matview(lake_dir, mv_dir, spec=spec)
    replay(shards, lake_dir, num_buckets=16, files_per_chunk=4)
    refresh_matview(lake_dir, mv_dir)
    mv = read_matview(mv_dir)
    batches = list(mv.iter_batches(batch_format="pyarrow"))
    empty = pa.schema(
        [
            pa.field("role", pa.string()),
            pa.field("win_start", pa.timestamp("us")),
            pa.field("n_turns", pa.int64()),
            pa.field("text_chars", pa.int64()),
        ]
    ).empty_table()
    table = pa.concat_tables(batches or [empty])
    shutil.rmtree(work, ignore_errors=True)
    return table


def q_text_search_index(sf_dir: str):
    """Incremental inverted text index over the lake (stages/textindex.py):
    replay half the derived binlog → full index build → replay the rest →
    INCREMENTAL refresh (only buckets with new committed files recompute
    their postings) → token search resolved from posting lists alone
    (token-sorted postings + parquet row-group stats ⇒ storage-level
    pruning; no corpus scan). Must equal the from-scratch SQL token scan
    over the final table. Registered beyond the driver's 50-query window;
    oracle runs in pytest (test_textindex.py drives it by name)."""
    from ..pipelines.replay import replay
    from ..stages.textindex import (
        build_text_index,
        refresh_text_index,
        search_text_index,
    )

    work = scratch_dir("cdc_tidx_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    idx_dir = os.path.join(work, "tidx")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    shards = sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )
    half = max(1, len(shards) // 2)
    replay(shards[:half], lake_dir, num_buckets=16, files_per_chunk=4)
    build_text_index(lake_dir, idx_dir)
    replay(shards, lake_dir, num_buckets=16, files_per_chunk=4)
    refresh_text_index(lake_dir, idx_dir)
    table = search_text_index(
        idx_dir, ["87}:error", "3}:view"], mode="any"
    )
    shutil.rmtree(work, ignore_errors=True)
    return table


def q_bm25_rank(sf_dir: str):
    """BM25 ranked retrieval from the inverted index
    (stages/textindex.rank_text_index): same build/refresh flow as
    ``text_search_index``, then score the probed tokens' matched
    conversations with BM25 (k1=1.2, b=0.75) — postings carry
    conversation-level term frequencies, doclen files carry dl, and the
    corpus constants (N, avgdl) come from the doclen files, so ranking
    never touches the corpus. ALL matched convs are returned (no top-k
    cut) with scores rounded to 1e-6 so the SQL oracle's float-sum-order
    differences can't flip a boundary. Registered beyond the driver's
    50-query window; oracle runs in pytest (test_textindex.py)."""
    from ..pipelines.replay import replay
    from ..stages.textindex import build_text_index, rank_text_index

    work = scratch_dir("cdc_bm25_")
    binlog_dir = os.path.join(work, "binlog")
    lake_dir = os.path.join(work, "lake")
    idx_dir = os.path.join(work, "tidx")
    derived_binlog_ds(sf_dir).write_parquet(binlog_dir)
    replay(binlog_dir, lake_dir, num_buckets=16, files_per_chunk=4)
    build_text_index(lake_dir, idx_dir)
    table = rank_text_index(
        idx_dir, ["87}:error", "3}:view"], k=10**9
    )
    out = table.set_column(
        1, "score", pa.compute.round(table["score"], 6)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


SQL_BM25_RANK = f"""
WITH final AS ({SQL_FINAL}),
toks AS (
  SELECT conv_id,
         unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
  FROM final
),
toks2 AS (SELECT conv_id, tok FROM toks WHERE tok <> ''),
dl AS (SELECT conv_id, count(*) AS dl FROM toks2 GROUP BY conv_id),
consts AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
),
tf AS (
  SELECT conv_id, tok, count(*) AS tf FROM toks2
  WHERE tok IN ('87}}:error', '3}}:view') GROUP BY conv_id, tok
),
df AS (SELECT tok, count(DISTINCT conv_id) AS df FROM tf GROUP BY tok)
SELECT tf.conv_id,
  round(sum(
    ln(1 + (consts.n_docs - df.df + 0.5) / (df.df + 0.5))
    * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / consts.avgdl))
  ), 6) AS score
FROM tf
JOIN df USING (tok) JOIN dl USING (conv_id) CROSS JOIN consts
GROUP BY tf.conv_id
"""


SQL_TEXT_SEARCH_INDEX = f"""
WITH final AS ({SQL_FINAL}),
toks AS (
  SELECT conv_id,
         unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
  FROM final
)
SELECT DISTINCT conv_id FROM toks
WHERE tok IN ('87}}:error', '3}}:view')
"""


SQL_MV_ROLE_HOURLY = f"""
WITH final AS ({SQL_FINAL})
SELECT role,
  make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS win_start,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS text_chars
FROM final GROUP BY role, win_start
"""


def q_render_conversations(sf_dir: str):
    """Conversation assembly — the IMPLODE counterpart of the explode/
    flatten operators (reference assembles one document from extracted
    sections, trials_extractor/main.py:214-243; exporters shred it back,
    csv_exporter.py:49-250): replay the derived binlog, then group the
    final table's turn rows into one row per conversation with a
    deterministic rendered transcript (turns ordered by turn_idx — unique
    per conv since it is the upsert key). One groupby over the final table;
    on an unsalted lake the same render runs shuffle-free inside the
    per-bucket read tasks (conversations are bucket-local). Registered
    beyond the driver's 50-query window; oracle runs in pytest."""
    import ray.data

    table = run_cdc_replay(sf_dir)
    ds = ray.data.from_arrow(table)

    def render(df):
        import pandas as pd

        df = df.sort_values("turn_idx", kind="mergesort")
        lines = df["role"].astype(str) + ": " + df["text"].fillna("")
        return pd.DataFrame(
            {
                "conv_id": [df["conv_id"].iloc[0]],
                "n_turns": pd.array([len(df)], dtype="int64"),
                "transcript": ["\n".join(lines)],
            }
        )

    return ds.groupby("conv_id").map_groups(render, batch_format="pandas")


SQL_RENDER_CONVERSATIONS = f"""
WITH final AS ({SQL_FINAL})
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  string_agg(role || ': ' || coalesce(text, ''), chr(10)
             ORDER BY turn_idx) AS transcript
FROM final GROUP BY conv_id
"""


def q_validate_events(sf_dir: str):
    """Per-row validation verdicts over the derived binlog — (lsn, valid,
    n_issues), SQL-checkable; the full issue lists + quarantine split are
    the stages/validate.py operators (V4 analog, validator.py:151-216).
    Registered beyond the driver's 50-query window; the oracle comparison
    runs in pytest (test_cdc_queries) instead."""
    from ..stages.validate import validate_events

    v = validate_events(derived_binlog_ds(sf_dir))

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["lsn"],
                t["valid"],
                pc.cast(pc.list_value_length(t["issues"]), pa.int64()),
            ],
            names=["lsn", "valid", "n_issues"],
        )

    return v.map_batches(project, batch_format="pyarrow")


SQL_VALIDATE_EVENTS = f"""
WITH binlog AS ({BINLOG_CTE}),
flags AS (
  SELECT lsn,
    (conv_id IS NULL) AS f1,
    (turn_idx IS NULL) AS f2,
    coalesce(turn_idx < 0, FALSE) AS f3,
    (coalesce(op, '') NOT IN ('insert', 'update', 'delete')) AS f4,
    (ts IS NULL) AS f5,
    (role IS NULL AND coalesce(op, '') <> 'delete') AS f6,
    (regexp_replace(coalesce(text, ''), '^\\s+|\\s+$', '', 'g') = ''
       AND coalesce(op, '') <> 'delete') AS f7
  FROM binlog
)
SELECT lsn,
  NOT (f1 OR f2 OR f3 OR f4 OR f5 OR f6 OR f7) AS valid,
  CAST(f1 AS BIGINT) + CAST(f2 AS BIGINT) + CAST(f3 AS BIGINT)
  + CAST(f4 AS BIGINT) + CAST(f5 AS BIGINT) + CAST(f6 AS BIGINT)
  + CAST(f7 AS BIGINT) AS n_issues
FROM flags
"""


QUERIES = {
    "cdc_binlog_derive": q_cdc_binlog_derive,
    "cdc_lww_winners": q_cdc_lww_winners,
    "cdc_replay_final": q_cdc_replay_final,
    "cdc_final_by_role": q_cdc_final_by_role,
    "cdc_final_conv_filter": q_cdc_final_conv_filter,
    "cdc_final_ts_filter": q_cdc_final_ts_filter,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_bootstrap_handoff": q_cdc_bootstrap_handoff,
    "cdc_upsert_corrections": q_cdc_upsert_corrections,
    "heavy_hitter_convs": q_heavy_hitter_convs,
    "cdc_conv_gaps": q_cdc_conv_gaps,
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_replica_final": q_cdc_replica_final,
    "mv_conv_stats": q_mv_conv_stats,
    "mv_role_hourly": q_mv_role_hourly,
    "text_search_index": q_text_search_index,
    "bm25_rank": q_bm25_rank,
    "render_conversations": q_render_conversations,
    "validate_events": q_validate_events,
    "cdc_rebucket_final": q_cdc_rebucket_final,
}

ORACLE_SQL = {
    "cdc_binlog_derive": SQL_BINLOG,
    "cdc_lww_winners": SQL_WINNERS,
    "cdc_replay_final": SQL_FINAL,
    "cdc_final_by_role": SQL_FINAL_BY_ROLE,
    "cdc_final_conv_filter": SQL_FINAL_CONV_FILTER,
    "cdc_final_ts_filter": SQL_FINAL_TS_FILTER,
    "cdc_delete_where": SQL_DELETE_WHERE,
    "cdc_bootstrap_handoff": SQL_FINAL,
    "cdc_upsert_corrections": SQL_UPSERT_CORRECTIONS,
    "heavy_hitter_convs": SQL_HEAVY_HITTER_CONVS,
    "cdc_conv_gaps": SQL_CONV_GAPS,
    "cdc_change_feed": SQL_CHANGE_FEED,
    "cdc_replica_final": SQL_FINAL,
    "mv_conv_stats": SQL_MV_CONV_STATS,
    "mv_role_hourly": SQL_MV_ROLE_HOURLY,
    "text_search_index": SQL_TEXT_SEARCH_INDEX,
    "bm25_rank": SQL_BM25_RANK,
    "render_conversations": SQL_RENDER_CONVERSATIONS,
    "validate_events": SQL_VALIDATE_EVENTS,
    "cdc_rebucket_final": SQL_FINAL,
}
