"""CDC fan-out: sync_replica (pipelines/replay.py) — a downstream replica
lake maintained purely from the incremental change feed.

Invariants pinned here:
  * replica final table ≡ source final table at every synced watermark,
    including re-partitioning (different bucket count, non-power-of-two)
    and a salted, compacted source;
  * syncs are incremental (the second sync reads only post-watermark
    deltas) and idempotent (a no-change sync is a skipped no-op that does
    not advance the replica version);
  * additive schema evolution on the source propagates to the replica;
  * a crash between staging and commit leaves the replica consistent —
    the rerun converges to the same state.
"""

import os

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import (
    compact,
    replay,
    sync_replica,
)
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _final(lake: str) -> pd.DataFrame:
    df = read_final_table(lake).to_pandas()
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture()
def src_binlog(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=6_000, n_convs=60, seed=11, duplicate_rate=0.05,
        shuffle_window=64,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    return binlog


def test_replica_matches_source_with_repartitioning(src_binlog, tmp_path):
    """Default stable cut ≡ source as-of the watermark (the binlog's
    disorder bound keeps the watermark behind the max committed LSN);
    a sealed 'committed' sync then catches the replica fully up."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    replay(src_binlog, src, num_buckets=8, files_per_chunk=2)
    r = sync_replica(src, dst, num_buckets=5)  # non-power-of-two re-bucket
    assert r.chunks_applied == 1 and r.delta_rows_written > 0
    wm = Manifest.load(src).global_watermark()
    want_stable = (
        read_final_table(src, as_of_lsn=wm)
        .to_pandas()
        .pipe(lambda d: d[sorted(d.columns)])
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_final(dst), want_stable)
    assert Manifest.load(dst).num_buckets == 5

    sync_replica(src, dst, cut="committed")  # source is quiesced now
    pd.testing.assert_frame_equal(_final(dst), _final(src))


def test_replica_incremental_and_idempotent(src_binlog, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    shards = sorted(
        os.path.join(src_binlog, f)
        for f in os.listdir(src_binlog)
        if f.endswith(".parquet")
    )
    def _src_at_replica_wm() -> pd.DataFrame:
        wm = Manifest.load(dst).global_watermark()
        d = read_final_table(src, as_of_lsn=wm).to_pandas()
        return (
            d[sorted(d.columns)]
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    replay(shards[:2], src, num_buckets=8, files_per_chunk=2)
    r1 = sync_replica(src, dst)
    pd.testing.assert_frame_equal(_final(dst), _src_at_replica_wm())
    wm1 = Manifest.load(dst).global_watermark()

    replay(shards, src, num_buckets=8, files_per_chunk=2)
    r2 = sync_replica(src, dst)
    pd.testing.assert_frame_equal(_final(dst), _src_at_replica_wm())
    # the second sync's feed window starts at the first sync's watermark
    man = Manifest.load(dst)
    assert man.global_watermark() > wm1
    assert r1.chunks_applied == 1 and r2.chunks_applied == 1

    # no-change stable sync: skipped no-op, version unchanged
    v = man.version
    r3 = sync_replica(src, dst)
    assert r3.chunks_skipped == 1 and r3.chunks_applied == 0
    assert Manifest.load(dst).version == v

    # source quiesced: one sealed sync catches the replica fully up,
    # and a sealed re-sync is again a no-op
    sync_replica(src, dst, cut="committed")
    pd.testing.assert_frame_equal(_final(dst), _final(src))
    r5 = sync_replica(src, dst, cut="committed")
    assert r5.chunks_skipped == 1


def test_replica_from_salted_compacted_source(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=4_000, n_convs=10, seed=5, duplicate_rate=0.1,
        shuffle_window=32,
    )
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    replay(binlog, src, num_buckets=8, files_per_chunk=1, hot_key_salt=4)
    compact(src)  # feed then reads from compacted bases
    sync_replica(src, dst, num_buckets=6, hot_key_salt=2, cut="committed")
    pd.testing.assert_frame_equal(_final(dst), _final(src))
    assert Manifest.load(dst).salt_factor == 2


def test_replica_schema_evolution_propagates(ray_session, tmp_path):
    """A column BEYOND the base event schema (nested list<struct>) appears
    in the source mid-stream; the replica synced before the evolution lacks
    it, and the next sync carries it through additively (null-backfilled
    for pre-evolution rows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    nested_t = pa.list_(pa.struct([pa.field("name", pa.string())]))

    def _shard(rows, path, with_nested):
        cols = {
            "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
            "op": pa.array(["insert"] * len(rows), pa.string()),
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([f"t{r['lsn']}" for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(10**6 * (1_700_000_000 + r["lsn"]), "us")
                 for r in rows], pa.timestamp("us")),
        }
        if with_nested:
            cols["tool_calls"] = pa.array(
                [r.get("tool_calls") for r in rows], nested_t
            )
        pq.write_table(pa.table(cols), path)

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    _shard(
        [{"lsn": i, "conv_id": f"c{i % 3}", "turn_idx": i} for i in range(6)],
        str(binlog / "s0.parquet"), with_nested=False,
    )
    s1 = [
        {"lsn": 6 + i, "conv_id": f"c{i % 3}", "turn_idx": 6 + i,
         "tool_calls": [{"name": f"fn{i}"}]}
        for i in range(6)
    ]
    _shard(s1, str(binlog / "s1.parquet"), with_nested=True)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    replay([str(binlog / "s0.parquet")], src, num_buckets=4)
    sync_replica(src, dst)
    assert "tool_calls" not in Manifest.load(dst).schema_names

    replay([str(binlog / p) for p in ("s0.parquet", "s1.parquet")],
           src, num_buckets=4)
    sync_replica(src, dst)
    assert "tool_calls" in Manifest.load(dst).schema_names
    got, want = _final(dst), _final(src)
    pd.testing.assert_frame_equal(got, want)
    assert got["tool_calls"].notna().any()
    assert got["tool_calls"].isna().any()  # pre-evolution rows null-backfilled


def test_follow_keeps_replica_synced(src_binlog, tmp_path):
    """follow(replica_dir=...) = continuous fan-out: every ingest round
    ends with the replica synced to the new stable watermark; sealing with
    cut='committed' after the producer quiesces catches it fully up."""
    import shutil

    from clinical_trials_etl_ray.pipelines.replay import follow

    grow_dir = tmp_path / "growing"
    grow_dir.mkdir()
    shards = sorted(
        os.path.join(src_binlog, f) for f in os.listdir(src_binlog)
    )
    for f in shards[:2]:
        shutil.copy(f, grow_dir)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    follow(str(grow_dir), src, poll_interval_s=0.05, idle_rounds=1,
           replica_dir=dst, num_buckets=8, files_per_chunk=2)
    wm = Manifest.load(dst).global_watermark()
    assert wm > -1  # a sync ran and advanced the replica

    for f in shards[2:]:
        shutil.copy(f, grow_dir)
    follow(str(grow_dir), src, poll_interval_s=0.05, idle_rounds=1,
           replica_dir=dst, num_buckets=8, files_per_chunk=2)
    assert Manifest.load(dst).global_watermark() > wm
    assert (
        Manifest.load(dst).global_watermark()
        == Manifest.load(src).global_watermark()
    )

    sync_replica(src, dst, cut="committed")  # seal
    pd.testing.assert_frame_equal(_final(dst), _final(src))


def test_replica_crash_between_stage_and_commit_recovers(
    src_binlog, tmp_path, monkeypatch
):
    """Kill the sync after delta files are staged but before the manifest
    commit: the replica manifest is unchanged (orphans only), and the rerun
    converges to the same final state as an uninterrupted sync."""
    import clinical_trials_etl_ray.state.manifest as manifest_mod

    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    replay(src_binlog, src, num_buckets=8, files_per_chunk=2)

    real_commit = manifest_mod.Manifest.commit

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before replica commit")

    monkeypatch.setattr(manifest_mod.Manifest, "commit", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sync_replica(src, dst, num_buckets=5, cut="committed")
    monkeypatch.setattr(manifest_mod.Manifest, "commit", real_commit)

    man = Manifest.load(dst)
    assert man.global_watermark() == -1  # nothing committed
    assert all(not man.files_for_bucket(b) for b in range(man.num_buckets))

    r = sync_replica(src, dst, cut="committed")
    assert r.chunks_applied == 1
    pd.testing.assert_frame_equal(_final(dst), _final(src))
