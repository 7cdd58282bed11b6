"""Exactly-once under failures for the lifecycle write paths: a crash
between staging and commit leaves only unreferenced orphans (readers see
the prior state), and a re-run converges to the single-run result."""

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.pipelines.retention import delete_where, upsert_table
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


@pytest.fixture()
def lake(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=3_000, n_convs=25, seed=17, delete_rate=0.05,
                      shuffle_window=16)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)
    return lake


def _final(lake_dir) -> pd.DataFrame:
    return (
        read_final_table(lake_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _inject_commit_crash(monkeypatch):
    real_commit = Manifest.commit

    def failing_commit(self, *a, **k):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(Manifest, "commit", failing_commit)
    return lambda: monkeypatch.setattr(Manifest, "commit", real_commit)


def test_delete_crash_before_commit_then_rerun(lake, monkeypatch):
    before = _final(lake)
    v_before = Manifest.load(lake).version

    restore = _inject_commit_crash(monkeypatch)
    with pytest.raises(RuntimeError, match="injected"):
        delete_where(lake, conv_range=("c1", "c19"))
    restore()

    # staged tombstone deltas are invisible: state and version unchanged
    assert Manifest.load(lake).version == v_before
    pd.testing.assert_frame_equal(_final(lake), before)

    # re-run converges to the single-run result (identical content-hash
    # files: the crashed attempt's orphans are re-targeted, not duplicated)
    rep = delete_where(lake, conv_range=("c1", "c19"))
    assert rep.matched_rows > 0
    after = _final(lake)
    want = before[~before["conv_id"].between("c1", "c19")].reset_index(drop=True)
    pd.testing.assert_frame_equal(after, want)


def test_upsert_crash_before_commit_then_rerun(lake, monkeypatch):
    import pyarrow as pa

    before = _final(lake)
    v_before = Manifest.load(lake).version
    row = before.iloc[0]
    corr = pa.table({
        "conv_id": pa.array([row["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(row["turn_idx"])], pa.int32()),
        "role": pa.array([row["role"]], pa.string()),
        "text": pa.array(["crash fix"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([row["ts"].to_datetime64()], pa.timestamp("us")),
    })

    restore = _inject_commit_crash(monkeypatch)
    with pytest.raises(RuntimeError, match="injected"):
        upsert_table(lake, corr)
    restore()

    assert Manifest.load(lake).version == v_before
    pd.testing.assert_frame_equal(_final(lake), before)

    rep = upsert_table(lake, corr)
    assert rep.rows_applied == 1
    got = _final(lake)
    hit = got[(got["conv_id"] == row["conv_id"])
              & (got["turn_idx"] == row["turn_idx"])]
    assert hit.iloc[0]["text"] == "crash fix"


def test_purge_crash_before_commit_preserves_state(lake, monkeypatch):
    from clinical_trials_etl_ray.pipelines.retention import purge_conv

    before = _final(lake)
    v_before = Manifest.load(lake).version
    victim = str(before["conv_id"].iloc[0])

    restore = _inject_commit_crash(monkeypatch)
    with pytest.raises(RuntimeError, match="injected"):
        purge_conv(lake, victim)
    restore()

    # rewritten files are orphans; the manifest still references the
    # originals, so readers see the victim untouched
    assert Manifest.load(lake).version == v_before
    pd.testing.assert_frame_equal(_final(lake), before)

    rep = purge_conv(lake, victim)
    assert rep.rows_purged > 0
    assert victim not in set(_final(lake)["conv_id"])
