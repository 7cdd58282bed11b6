"""Exactly-once under failures: crash between staging and commit leaves only
unreferenced orphans; cleanup removes them; resumed replay converges.
"""

import os

import pyarrow as pa
import pytest

from clinical_trials_etl_ray.oracle import oracle_final_table
from clinical_trials_etl_ray.pipelines import replay as replay_mod
from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.schema import TRANSCRIPT_SCHEMA
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, generate_events, write_binlog_shards

SPEC = BinlogSpec(n_events=6000, n_convs=100, seed=31, delete_rate=0.05,
                  duplicate_rate=0.02, shuffle_window=64)


def _final(lake):
    t = pa.concat_tables(
        list(read_final_table(lake).iter_batches(batch_format="pyarrow"))
        or [TRANSCRIPT_SCHEMA.empty_table()]
    )
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_crash_before_commit_leaves_only_orphans(ray_session, tmp_path, monkeypatch):
    binlog = str(tmp_path / "binlog")
    write_binlog_shards(SPEC, binlog, n_shards=8)
    lake = str(tmp_path / "lake")

    # crash injection: fail the run after deltas are staged, before commit
    real_commit = Manifest.commit
    calls = {"n": 0}

    def failing_commit(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # chunk 2 stages files, then "crashes"
            raise RuntimeError("injected crash before manifest commit")
        return real_commit(self, *a, **k)

    monkeypatch.setattr(Manifest, "commit", failing_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        replay(binlog, lake, num_buckets=8, files_per_chunk=2, disorder_bound=64)
    monkeypatch.setattr(Manifest, "commit", real_commit)

    # the staged-but-uncommitted chunk-2 deltas are invisible to readers
    man = Manifest.load(lake)
    assert man.version == 1
    partial = _final(lake)

    # orphan cleanup removes exactly the unreferenced files
    removed = man.cleanup_orphans()
    assert len(removed) > 0
    assert _final(lake).equals(partial), "cleanup must not change visible state"

    # resume converges to the oracle
    replay(binlog, lake, num_buckets=8, files_per_chunk=2, disorder_bound=64)
    oracle = oracle_final_table(generate_events(SPEC))
    assert _final(lake).equals(oracle)


def test_retried_merge_task_is_idempotent(tmp_path):
    """A retried merge task (same input batch, same watermarks) stages the
    SAME content-hash paths — os.replace makes the second write harmless —
    and Manifest.commit deduplicates re-reported paths."""
    from clinical_trials_etl_ray.stages.merge import make_direct_delta_writer, prep_batch

    lake = str(tmp_path / "lake")
    man = Manifest.create(lake, num_buckets=8)
    events = generate_events(SPEC)
    batch = prep_batch(events, num_buckets=8, min_lsn_exclusive=-1)

    writer = make_direct_delta_writer(lake, man.watermarks())
    s1 = writer(batch)
    s2 = writer(batch)  # retry
    assert s1.column("path").to_pylist() == s2.column("path").to_pylist()
    assert s1.column("content_hash").to_pylist() == s2.column("content_hash").to_pylist()

    rows = s1.to_pylist()
    man2 = man.commit(rows, new_watermark_lsn=SPEC.n_events - 1)
    man3 = man2.commit(rows, new_watermark_lsn=SPEC.n_events - 1)  # re-report
    for b in range(8):
        paths = [f["path"] for f in man3.files_for_bucket(b)]
        assert len(paths) == len(set(paths)), "duplicate manifest entries"
    assert man3.all_files() == man2.all_files()


def test_full_replay_after_crash_equals_single_run(ray_session, tmp_path):
    """Crash + resume produces byte-identical state to an uninterrupted
    replay (exactly-once observable effect)."""
    binlog = str(tmp_path / "binlog")
    write_binlog_shards(SPEC, binlog, n_shards=8)
    clean_lake = str(tmp_path / "clean")
    replay(binlog, clean_lake, num_buckets=8, files_per_chunk=2, disorder_bound=64)
    oracle = oracle_final_table(generate_events(SPEC))
    assert _final(clean_lake).equals(oracle)


def test_crash_during_compaction_is_safe(ray_session, tmp_path, monkeypatch):
    """A crash after compacted base files are staged but BEFORE the
    compaction commit must leave the lake readable at its prior state; the
    staged bases are unreferenced and a later compaction converges."""
    import pandas as pd

    from clinical_trials_etl_ray.pipelines.replay import compact, replay
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    write_binlog_shards(
        BinlogSpec(n_events=4_000, n_convs=40, seed=8, shuffle_window=32),
        binlog, n_shards=4, parallel=False,
    )
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    before = read_final_table(lake).to_pandas()
    v_before = Manifest.load(lake).version

    real_commit = Manifest.commit

    def failing_commit(self, *a, **kw):
        if kw.get("metrics", {}).get("compaction"):
            raise RuntimeError("injected crash before compaction commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(Manifest, "commit", failing_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact(lake)
    monkeypatch.setattr(Manifest, "commit", real_commit)

    # lake still serves the pre-compaction state
    assert Manifest.load(lake).version == v_before
    key = ["conv_id", "turn_idx"]
    mid = read_final_table(lake).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        mid.sort_values(key).reset_index(drop=True),
    )

    # retried compaction converges (idempotent content-hash staging)
    compact(lake)
    after = read_final_table(lake).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        after.sort_values(key).reset_index(drop=True),
    )
