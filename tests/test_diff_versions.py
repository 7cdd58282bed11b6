"""Version-based audit diff (stages/merge.diff_versions): the rows that
turn the v_old state into the v_new state, including out-of-band writes
and physical purges that no LSN-based feed can see."""

import pandas as pd
import pyarrow as pa
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.pipelines.retention import (
    delete_where,
    purge_conv,
    upsert_table,
)
from clinical_trials_etl_ray.stages.merge import diff_versions, read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


@pytest.fixture()
def lake(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=5_000, n_convs=40, seed=31, delete_rate=0.08,
        duplicate_rate=0.03, shuffle_window=32,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    return lake


def _live(lake_dir, version=None) -> pd.DataFrame:
    return (
        read_final_table(lake_dir, version=version)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _apply_diff(old_live: pd.DataFrame, diff: pd.DataFrame) -> pd.DataFrame:
    """Reference applier: upserts replace/insert, deletes and purges
    remove."""
    state = {
        (r.conv_id, r.turn_idx): r for r in old_live.itertuples(index=False)
    }
    payload_cols = [c for c in old_live.columns]
    for r in diff.itertuples(index=False):
        k = (r.conv_id, r.turn_idx)
        if r.op in ("delete", "purge"):
            state.pop(k, None)
        else:
            state[k] = r
    rows = [
        {c: getattr(v, c) for c in payload_cols} for v in state.values()
    ]
    return (
        pd.DataFrame(rows, columns=payload_cols)
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_diff_apply_invariant_across_mixed_writes(lake, tmp_path):
    """v_old → (late replay + out-of-band delete + upsert + compaction)
    → v_new: applying diff_versions(v_old) onto the v_old live state
    reproduces the v_new live state exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    v_old = Manifest.load(lake).version
    old_live = _live(lake)

    # out-of-band delete + correction
    delete_where(lake, conv_range=("c1", "c12"))
    victim = old_live[~old_live["conv_id"].between("c1", "c12")].iloc[0]
    corr = pa.table({
        "conv_id": pa.array([victim["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(victim["turn_idx"])], pa.int32()),
        "role": pa.array([victim["role"]], pa.string()),
        "text": pa.array(["diff-corrected"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([victim["ts"].to_datetime64()], pa.timestamp("us")),
    })
    upsert_table(lake, corr)
    # a late producer event creating a brand-new key
    late = pa.table({
        "lsn": pa.array([99_999], pa.int64()),
        "op": pa.array(["insert"], pa.string()),
        "conv_id": pa.array(["znew"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["fresh"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([np.datetime64("2031-01-01", "us")], pa.timestamp("us")),
    })
    shard = tmp_path / "late"
    shard.mkdir()
    pq.write_table(late, str(shard / "s.parquet"))
    replay(str(shard), lake, num_buckets=8)
    compact(lake)  # fingerprints change but state doesn't — diff unaffected

    new_live = _live(lake)
    diff = diff_versions(lake, v_old).to_pandas()
    assert len(diff) > 0
    got = _apply_diff(old_live, diff[new_live.columns.tolist() + ["op"]])
    pd.testing.assert_frame_equal(got, new_live, check_dtype=False)


def test_diff_sees_physical_purge(lake):
    v_old = Manifest.load(lake).version
    victim = str(_live(lake)["conv_id"].iloc[0])
    purge_conv(lake, victim)
    diff = diff_versions(lake, v_old).to_pandas()
    assert set(diff[diff["conv_id"] == victim]["op"]) == {"purge"}
    # applying the purge rows removes the conv
    got = _apply_diff(_live(lake, version=v_old), diff)
    pd.testing.assert_frame_equal(got, _live(lake), check_dtype=False)


def test_diff_identical_versions_is_empty_and_pruned(lake):
    v = Manifest.load(lake).version
    d = diff_versions(lake, v, v)
    assert d.count() == 0


def test_diff_small_commit_touches_small_diff(lake):
    """A one-conversation correction produces a diff confined to that
    conversation (bucket fingerprint skip keeps untouched buckets out)."""
    v_old = Manifest.load(lake).version
    row = _live(lake).iloc[0]
    corr = pa.table({
        "conv_id": pa.array([row["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(row["turn_idx"])], pa.int32()),
        "role": pa.array([row["role"]], pa.string()),
        "text": pa.array(["tiny"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([row["ts"].to_datetime64()], pa.timestamp("us")),
    })
    upsert_table(lake, corr)
    diff = diff_versions(lake, v_old).to_pandas()
    assert len(diff) == 1
    assert diff.iloc[0]["conv_id"] == row["conv_id"]
    assert diff.iloc[0]["text"] == "tiny"
