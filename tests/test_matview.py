"""Incremental materialized-view maintenance (stages/matview.py).

Pins: incremental refresh ≡ full rebuild; a targeted trickle of new events
refreshes ONLY the touched buckets (manifest-metadata skip); refresh with
nothing new is a zero-bucket no-op; salted lakes merge per-bucket partials
to the same view as an unsalted lake.
"""

import pyarrow as pa
import pytest

from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.schema import EVENT_SCHEMA
from clinical_trials_etl_ray.stages.matview import (
    MV_SCHEMA,
    build_matview,
    read_matview,
    refresh_matview,
)
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

SPEC = BinlogSpec(n_events=8_000, n_convs=120, max_turns=16, seed=7,
                  delete_rate=0.06, update_rate=0.3, evolution_frac=0.5)


def _mv_sorted(mv_dir: str, version=None) -> pa.Table:
    ds = read_matview(mv_dir, version=version)
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow"))
        or [MV_SCHEMA.empty_table()]
    )
    return t.cast(MV_SCHEMA).sort_by([("conv_id", "ascending")])


@pytest.fixture(scope="module")
def binlog_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mv_binlog")
    write_binlog_shards(SPEC, str(d), n_shards=8)
    return str(d)


def _shards(binlog_dir: str) -> list:
    import os

    return sorted(
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith(".parquet")
    )


def test_incremental_refresh_equals_full_rebuild(ray_session, binlog_dir, tmp_path):
    lake = str(tmp_path / "lake")
    shards = _shards(binlog_dir)
    replay(shards[:4], lake, num_buckets=16, files_per_chunk=2)
    mv_inc = str(tmp_path / "mv_inc")
    r1 = build_matview(lake, mv_inc)
    assert r1.buckets_refreshed > 0 and r1.rows_written > 0

    replay(shards, lake, num_buckets=16, files_per_chunk=2)
    r2 = refresh_matview(lake, mv_inc)
    assert r2.buckets_refreshed > 0
    assert r2.mv_version == r1.mv_version + 1

    mv_full = str(tmp_path / "mv_full")
    build_matview(lake, mv_full)
    assert _mv_sorted(mv_inc).equals(_mv_sorted(mv_full))

    # time travel: the pre-refresh view version still reads exactly the
    # half-log build (retained manifest snapshots, like the lake)
    old = _mv_sorted(mv_inc, version=r1.mv_version)
    lake_half = str(tmp_path / "lake_half")
    replay(shards[:4], lake_half, num_buckets=16, files_per_chunk=2)
    mv_half = str(tmp_path / "mv_half")
    build_matview(lake_half, mv_half)
    assert old.equals(_mv_sorted(mv_half))


def test_noop_and_targeted_refresh(ray_session, binlog_dir, tmp_path):
    lake = str(tmp_path / "lake")
    replay(binlog_dir, lake, num_buckets=16, files_per_chunk=2,
           disorder_bound=0)
    mv = str(tmp_path / "mv")
    r1 = build_matview(lake, mv)

    # nothing new committed → refresh skips every bucket from metadata alone
    r2 = refresh_matview(lake, mv)
    assert r2.buckets_refreshed == 0
    assert r2.mv_version == r1.mv_version  # no commit published

    # same must hold under a conservative out-of-order tail watermark
    # (max_lsn − disorder_bound): committed files carry LSNs above the
    # watermark forever, so a watermark-based skip would re-refresh every
    # bucket on every poll — the fingerprint skip must not
    lake_d = str(tmp_path / "lake_disordered")
    replay(binlog_dir, lake_d, num_buckets=16, files_per_chunk=2,
           disorder_bound=500)
    mv_d = str(tmp_path / "mv_disordered")
    build_matview(lake_d, mv_d)
    rd = refresh_matview(lake_d, mv_d)
    assert rd.buckets_refreshed == 0

    # a trickle touching ONE conv_id refreshes only that key's bucket(s)
    import pyarrow.parquet as pq

    trickle_dir = tmp_path / "trickle"
    trickle_dir.mkdir()
    top_lsn = 10_000_000
    trickle = pa.table(
        {
            "lsn": pa.array([top_lsn, top_lsn + 1], pa.int64()),
            "op": ["update", "insert"],
            "conv_id": ["conv_00001", "conv_00001"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "assistant"],
            "text": ["patched text", "new turn"],
            "tool": [None, "search"],
            "ts": pa.array([top_lsn, top_lsn + 1], pa.timestamp("us")),
        }
    ).cast(EVENT_SCHEMA)
    pq.write_table(trickle, trickle_dir / "shard.parquet")
    replay(str(trickle_dir), lake, num_buckets=16, files_per_chunk=1)

    r3 = refresh_matview(lake, mv)
    assert 1 <= r3.buckets_refreshed < 16 // 2  # touched buckets only
    mv_full = str(tmp_path / "mv_full")
    build_matview(lake, mv_full)
    assert _mv_sorted(mv).equals(_mv_sorted(mv_full))
    got = _mv_sorted(mv)
    row = got.filter(pa.compute.equal(got["conv_id"], "conv_00001")).to_pylist()
    assert row and row[0]["n_turns"] >= 2


def test_follow_keeps_matview_fresh(ray_session, binlog_dir, tmp_path):
    """follow(matview_dir=...) = the streaming loop: every ingest round ends
    with an incrementally refreshed view; a later trickle refreshes only its
    touched buckets."""
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.replay import follow
    from clinical_trials_etl_ray.state.manifest import Manifest

    import shutil

    grow_dir = tmp_path / "growing"
    grow_dir.mkdir()
    for f in _shards(binlog_dir):
        shutil.copy(f, grow_dir)
    lake = str(tmp_path / "lake")
    mv = str(tmp_path / "mv")
    follow(str(grow_dir), lake, poll_interval_s=0.05, idle_rounds=1,
           matview_dir=mv, num_buckets=16, files_per_chunk=2,
           disorder_bound=0)
    mv_full = str(tmp_path / "mv_full")
    build_matview(lake, mv_full)
    assert _mv_sorted(mv).equals(_mv_sorted(mv_full))

    top_lsn = 20_000_000
    trickle = pa.table(
        {
            "lsn": pa.array([top_lsn], pa.int64()),
            "op": ["insert"],
            "conv_id": ["conv_00002"],
            "turn_idx": pa.array([99], pa.int32()),
            "role": ["user"],
            "text": ["late arrival"],
            "tool": [None],
            "ts": pa.array([top_lsn], pa.timestamp("us")),
        }
    ).cast(EVENT_SCHEMA)
    pq.write_table(trickle, grow_dir / "zz_trickle.parquet")
    follow(str(grow_dir), lake, poll_interval_s=0.05, idle_rounds=1,
           matview_dir=mv, num_buckets=16, files_per_chunk=2,
           disorder_bound=0)
    m = Manifest.load(mv)
    assert m.metrics.get("buckets_refreshed", 99) <= 2
    mv_full2 = str(tmp_path / "mv_full2")
    build_matview(lake, mv_full2)
    assert _mv_sorted(mv).equals(_mv_sorted(mv_full2))


def test_role_keyed_view_spec(ray_session, binlog_dir, tmp_path):
    """Generalized spec: a view keyed by a NON-partition column (role) —
    per-bucket partials merged at read — equals the single-process oracle's
    grouped aggregate; a conflicting spec on the same view dir fails."""
    import pandas as pd
    import pytest as pt

    from clinical_trials_etl_ray.oracle import oracle_final_table
    from clinical_trials_etl_ray.stages.matview import ViewAgg, ViewSpec
    from clinical_trials_etl_ray.synth import generate_events

    spec = ViewSpec(
        key="role",
        aggs=(
            ViewAgg("n_turns", "count"),
            ViewAgg("chars", "sum_utf8_len", "text"),
            ViewAgg("first_ts", "min", "ts"),
            ViewAgg("n_tool", "nn_count", "tool"),
        ),
    )
    lake = str(tmp_path / "lake")
    replay(binlog_dir, lake, num_buckets=16, files_per_chunk=2)
    mv = str(tmp_path / "mv")
    build_matview(lake, mv, spec=spec)

    got = (
        read_matview(mv)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    final = oracle_final_table(generate_events(SPEC)).to_pandas()
    want = (
        final.groupby("role", as_index=False)
        .agg(
            n_turns=("role", "size"),
            chars=("text", lambda s: int(s.fillna("").str.len().sum())),
            first_ts=("ts", "min"),
            n_tool=("tool", "count"),
        )
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["role", "n_turns", "chars", "first_ts", "n_tool"]],
        want,
        check_dtype=False,
    )

    # stored spec governs spec-less refresh; a conflicting spec fails loudly
    assert refresh_matview(lake, mv).buckets_refreshed == 0
    with pt.raises(ValueError, match="different spec"):
        refresh_matview(lake, mv, spec=ViewSpec(key="conv_id"))

    # a spec naming a column the live rows don't carry fails up front with
    # the offending name (lsn/op are projected away before aggregation)
    with pt.raises(ValueError, match=r"\['lsn'\]"):
        build_matview(
            lake,
            str(tmp_path / "mv_bad"),
            spec=ViewSpec(key="role", aggs=(ViewAgg("x", "max", "lsn"),)),
        )


def test_refresh_after_compaction_is_equal_and_reconverges(
    ray_session, binlog_dir, tmp_path
):
    """Compaction rewrites file lists without changing state: the next
    refresh re-renders the folded buckets (documented one-time cost) to the
    SAME view, and the refresh after that is a no-op again."""
    from clinical_trials_etl_ray.pipelines.replay import compact

    lake = str(tmp_path / "lake")
    replay(binlog_dir, lake, num_buckets=16, files_per_chunk=2)
    mv = str(tmp_path / "mv")
    build_matview(lake, mv)
    before = _mv_sorted(mv)

    compact(lake)
    r = refresh_matview(lake, mv)
    assert r.buckets_refreshed > 0  # file lists changed
    assert _mv_sorted(mv).equals(before)  # state did not
    assert refresh_matview(lake, mv).buckets_refreshed == 0  # reconverged


def test_salted_lake_partials_merge(ray_session, binlog_dir, tmp_path):
    plain_lake = str(tmp_path / "plain")
    salted_lake = str(tmp_path / "salted")
    replay(binlog_dir, plain_lake, num_buckets=16, files_per_chunk=2)
    replay(binlog_dir, salted_lake, num_buckets=16, files_per_chunk=2,
           hot_key_salt=3)
    mv_plain = str(tmp_path / "mv_plain")
    mv_salted = str(tmp_path / "mv_salted")
    build_matview(plain_lake, mv_plain)
    build_matview(salted_lake, mv_salted)
    # stored partials differ (per-bucket splits), the merged view does not
    assert _mv_sorted(mv_plain).equals(_mv_sorted(mv_salted))


def test_windowed_view_incremental_and_late_events(
    ray_session, binlog_dir, tmp_path
):
    """Tumbling-window spec (time_col/window_s): the incrementally
    maintained role × hour view equals a full rebuild AND a from-scratch
    pandas window aggregate over the oracle final table; a late
    out-of-order event lands in ITS OWN (event-time) window on the next
    refresh, not the arrival-time one. Also pins the salted-lake merge
    for windowed specs ("mv_role_hourly" drives the same spec through the
    driver contract in test_round3)."""
    import pandas as pd

    from clinical_trials_etl_ray.oracle import oracle_final_table
    from clinical_trials_etl_ray.stages.matview import ViewAgg, ViewSpec
    from clinical_trials_etl_ray.synth import generate_events

    spec = ViewSpec(
        key="role",
        aggs=(
            ViewAgg("n_turns", "count"),
            ViewAgg("chars", "sum_utf8_len", "text"),
        ),
        time_col="ts",
        window_s=3600,
    )

    def _read(mv_dir: str) -> pd.DataFrame:
        return (
            read_matview(mv_dir)
            .to_pandas()
            .sort_values(["role", "win_start"])
            .reset_index(drop=True)[["role", "win_start", "n_turns", "chars"]]
        )

    lake = str(tmp_path / "lake")
    shards = _shards(binlog_dir)
    replay(shards[:4], lake, num_buckets=16, files_per_chunk=2)
    mv_inc = str(tmp_path / "mv_inc")
    build_matview(lake, mv_inc, spec=spec)

    # stream the remaining shards, refresh incrementally (stored spec
    # governs — no restatement needed)
    replay(shards, lake, num_buckets=16, files_per_chunk=2)
    rep = refresh_matview(lake, mv_inc)
    assert 0 < rep.buckets_refreshed

    mv_full = str(tmp_path / "mv_full")
    build_matview(lake, mv_full, spec=spec)
    pd.testing.assert_frame_equal(_read(mv_inc), _read(mv_full))

    # oracle: single-process final table, windows floored to the hour
    final = oracle_final_table(generate_events(SPEC)).to_pandas()
    final["win_start"] = final["ts"].dt.floor("h")
    want = (
        final.groupby(["role", "win_start"], as_index=False)
        .agg(
            n_turns=("role", "size"),
            chars=("text", lambda s: int(s.fillna("").str.len().sum())),
        )
        .sort_values(["role", "win_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_read(mv_inc), want, check_dtype=False)

    # a LATE event: arrives after everything else (max lsn) but carries an
    # old event time far below every existing window — the refresh must
    # add it to its event-time window
    import pyarrow as pa

    from clinical_trials_etl_ray.schema import EVENT_SCHEMA

    late_ts = pd.Timestamp("1999-12-31 23:30:00")
    late = pa.table(
        {
            "lsn": pa.array([10**9], pa.int64()),
            "op": ["insert"],
            "conv_id": ["late-conv"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["late!"],
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([late_ts], pa.timestamp("us")),
        }
    ).cast(EVENT_SCHEMA)
    late_shard = str(tmp_path / "late.parquet")
    import pyarrow.parquet as pq

    pq.write_table(late, late_shard)
    replay([late_shard], lake, num_buckets=16, files_per_chunk=1)
    rep2 = refresh_matview(lake, mv_inc)
    assert rep2.buckets_refreshed >= 1  # only the late event's bucket
    got = _read(mv_inc)
    row = got[got.win_start == late_ts.floor("h")]
    assert len(row) == 1 and row.iloc[0].n_turns == 1
    assert row.iloc[0].chars == len("late!")
