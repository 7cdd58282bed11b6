"""Bounded-memory streaming bucket resolution (stages/merge.py
iter_resolve_bucket) — the round-4 removal of the last per-task O(bucket)
materialization on the read path.

Pinned here:
  - winner-set identity: streaming k-way merge ≡ eager resolve_bucket, on
    the realistic steady state (sorted compacted base + unsorted fresh
    deltas), under tombstones, filters (as_of_lsn / conv_range) and
    projection pushdown;
  - bounded memory: with a tiny stream batch size the merge never holds
    more than a small fraction of the bucket's rows (stats['peak_rows']);
  - read_final_table end-to-end equality when the streaming path is forced
    via CTE_STREAM_RESOLVE_MIN_ROWS=1 (generator UDF slabs).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.stages.merge import (
    iter_resolve_bucket,
    read_final_table,
    resolve_bucket,
)
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _sorted_eager(t: pa.Table) -> pa.Table:
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


def _stream_concat(slabs: list, like: pa.Table) -> pa.Table:
    if not slabs:
        return like.schema.empty_table()
    return pa.concat_tables(slabs)


def _final(lake: str) -> pd.DataFrame:
    df = read_final_table(lake).to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def steady_lake(ray_session, tmp_path_factory):
    """Sorted base (major compaction of gen 1) + unsorted gen-2 deltas on
    top — the steady state the streaming merge is designed for."""
    tmp_path = tmp_path_factory.mktemp("stream_resolve")
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=8_000, n_convs=60, seed=31, delete_rate=0.08,
        duplicate_rate=0.05, shuffle_window=32,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)
    compact(lake)  # major → one SORTED base per bucket

    # gen 2: same conv universe, LSNs shifted above gen 1 → fresh deltas
    raw = str(tmp_path / "binlog2_raw")
    spec2 = BinlogSpec(
        n_events=3_000, n_convs=60, seed=32, delete_rate=0.08,
        shuffle_window=32,
    )
    write_binlog_shards(spec2, raw, n_shards=2, parallel=False)
    binlog2 = str(tmp_path / "binlog2")
    os.makedirs(binlog2)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pc.add(t.column("lsn"), pa.scalar(100_000))
            )
            pq.write_table(t, os.path.join(binlog2, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(binlog2, name))
    replay(binlog2, lake, num_buckets=4, files_per_chunk=1)
    return lake


def test_manifest_flags_compacted_files_sorted(steady_lake):
    man = Manifest.load(steady_lake)
    kinds = {}
    for b in range(man.num_buckets):
        for f in man.files_for_bucket(b):
            kinds.setdefault(f["kind"], set()).add(bool(f.get("sorted")))
    assert kinds["base"] == {True}      # compaction output is flagged
    assert False in kinds["delta"]      # raw ingest deltas are not


def test_stream_matches_eager_with_tombstones(steady_lake):
    man = Manifest.load(steady_lake)
    checked = 0
    for b in range(man.num_buckets):
        files = man.files_for_bucket(b)
        eager = _sorted_eager(resolve_bucket(steady_lake, b, files))
        stats = {}
        got = _stream_concat(
            list(
                iter_resolve_bucket(
                    steady_lake, b, files, stream_rows=64, stats=stats
                )
            ),
            eager,
        )
        assert got.schema == eager.schema
        assert got.equals(eager), f"bucket {b} winner mismatch"
        # winners include tombstones (op='delete' survives to the reader)
        if "delete" in set(got["op"].to_pylist()):
            checked += 1
        # bounded memory: never held more than a fraction of the bucket
        total = sum(int(f.get("row_count") or 0) for f in files)
        assert stats["peak_rows"] < total, (stats, total)
        assert stats["peak_rows"] < 0.6 * total
    assert checked >= 1  # the synth log's deletes reached winners


def test_stream_matches_eager_under_filters(steady_lake):
    man = Manifest.load(steady_lake)
    # a mid-stream LSN cut (time travel) and a conv range prune
    all_lsns = []
    for b in range(man.num_buckets):
        for f in man.files_for_bucket(b):
            all_lsns.append(int(f["max_lsn"]))
    as_of = sorted(all_lsns)[len(all_lsns) // 2]
    for b in range(man.num_buckets):
        files = man.files_for_bucket(b)
        for kwargs in (
            {"as_of_lsn": as_of},
            {"conv_range": ("c1", "c3")},  # lexicographic: c1, c10..c29, c3
            {"columns": ["role"]},
            {"as_of_lsn": as_of, "columns": ["text"]},
        ):
            eager = _sorted_eager(resolve_bucket(steady_lake, b, files, **kwargs))
            got = _stream_concat(
                list(
                    iter_resolve_bucket(
                        steady_lake, b, files, stream_rows=64, **kwargs
                    )
                ),
                eager,
            )
            assert got.equals(eager), (b, kwargs)


def test_stream_handles_unsorted_only_and_sorted_only(ray_session, tmp_path):
    """Fresh lake (no compaction → no sorted files) and fully compacted lake
    (sorted base only) both resolve identically through the streaming API."""
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=2_000, n_convs=20, seed=33, delete_rate=0.1)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=2, files_per_chunk=1)

    def check():
        man = Manifest.load(lake)
        for b in range(man.num_buckets):
            files = man.files_for_bucket(b)
            eager = _sorted_eager(resolve_bucket(lake, b, files))
            got = _stream_concat(
                list(iter_resolve_bucket(lake, b, files, stream_rows=32)),
                eager,
            )
            assert got.equals(eager)

    check()          # unsorted-only (raw deltas)
    compact(lake)
    check()          # sorted-only (single base per bucket)


def test_streaming_compaction_matches_eager(steady_lake):
    """_compact_bucket_streaming writes the same winner rows (same order)
    as the eager compact_bucket, with a sorted-flagged fileinfo and sound
    stats — and bounded memory."""
    from clinical_trials_etl_ray.stages.merge import (
        _compact_bucket_streaming,
        compact_bucket,
    )

    man = Manifest.load(steady_lake)
    for b in range(man.num_buckets):
        files = man.files_for_bucket(b)
        stats = {}
        got = _compact_bucket_streaming(
            steady_lake, b, files, None, "base", stream_rows=64, stats=stats
        )
        want = compact_bucket(steady_lake, b, files)
        t_got = pq.read_table(os.path.join(steady_lake, got["path"]))
        t_want = pq.read_table(os.path.join(steady_lake, want["path"]))
        assert t_got.equals(t_want), f"bucket {b}"
        assert got["sorted"] is True
        for k in ("row_count", "min_lsn", "max_lsn", "conv_min", "conv_max",
                  "ts_us_min", "ts_us_max"):
            assert got[k] == want[k], (b, k)
        total = sum(int(f.get("row_count") or 0) for f in files)
        assert stats["peak_rows"] < total
        # the streamed base joins the live merge path correctly: Bloom has
        # no false negatives for every key actually present
        from clinical_trials_etl_ray.functions.bloom import bloom_might_contain
        from clinical_trials_etl_ray.functions.hashing import hash_strings

        convs = t_got["conv_id"].to_pylist()[:50]
        for h in hash_strings(convs):
            assert bloom_might_contain(got["conv_bloom"], int(h))
        # idempotent retry: re-running lands on the same content-hash name
        again = _compact_bucket_streaming(
            steady_lake, b, files, None, "base", stream_rows=64
        )
        assert again["path"] == got["path"]
        assert again["content_hash"] == got["content_hash"]


def test_streaming_compaction_tombstone_horizon(steady_lake):
    """The ts-stats-derived cutoff drops exactly the tombstones the eager
    horizon path drops (max winner ts == max file ts stat)."""
    from clinical_trials_etl_ray.stages.merge import (
        _compact_bucket_streaming,
        compact_bucket,
    )

    man = Manifest.load(steady_lake)
    horizon = 1  # µs — drops every tombstone except one at the exact max ts
    dropped_any = False
    for b in range(man.num_buckets):
        files = man.files_for_bucket(b)
        got = _compact_bucket_streaming(
            steady_lake, b, files, horizon, "base", stream_rows=64
        )
        want = compact_bucket(steady_lake, b, files, tombstone_horizon_us=horizon)
        t_got = pq.read_table(os.path.join(steady_lake, got["path"]))
        t_want = pq.read_table(os.path.join(steady_lake, want["path"]))
        assert t_got.equals(t_want), f"bucket {b}"
        full = compact_bucket(steady_lake, b, files)
        if want["row_count"] < full["row_count"]:
            dropped_any = True
    assert dropped_any  # the horizon actually exercised tombstone dropping


def test_change_feed_streaming_forced(steady_lake, monkeypatch):
    """The change feed (full replica syncs / rebucket read everything via
    since_lsn=-1) streams through the same k-way merge when forced."""
    from clinical_trials_etl_ray.stages.merge import read_change_feed

    key = ["conv_id", "turn_idx", "lsn"]

    def _feed(**kw) -> pd.DataFrame:
        df = read_change_feed(steady_lake, **kw).to_pandas()
        return (
            df[sorted(df.columns)]
            .sort_values(key, kind="mergesort")
            .reset_index(drop=True)
        )

    want_full = _feed(since_lsn=-1)
    man = Manifest.load(steady_lake)
    mid = sorted(
        int(f["max_lsn"])
        for b in range(man.num_buckets)
        for f in man.files_for_bucket(b)
    )[2]
    want_win = _feed(since_lsn=mid)
    monkeypatch.setenv("CTE_STREAM_RESOLVE_MIN_ROWS", "1")
    pd.testing.assert_frame_equal(_feed(since_lsn=-1), want_full)
    pd.testing.assert_frame_equal(_feed(since_lsn=mid), want_win)


def test_diff_versions_streaming_forced(steady_lake, monkeypatch):
    """Version audits stream too: the forced paired-slab diff equals the
    eager two-table diff (changed rows AND purge rows)."""
    from clinical_trials_etl_ray.stages.merge import diff_versions

    versions = Manifest._versions_on_disk(steady_lake)
    v_old = versions[len(versions) // 2]

    def _diff() -> pd.DataFrame:
        df = diff_versions(steady_lake, v_old).to_pandas()
        key = ["conv_id", "turn_idx", "lsn", "op"]
        return (
            df[sorted(df.columns)]
            .sort_values(key, kind="mergesort")
            .reset_index(drop=True)
        )

    want = _diff()
    assert len(want) > 0  # the fixture's gen-2 ingest changed winners
    monkeypatch.setenv("CTE_STREAM_RESOLVE_MIN_ROWS", "1")
    got = _diff()
    pd.testing.assert_frame_equal(got, want)


def test_read_final_table_streaming_forced(steady_lake, monkeypatch):
    want = _final(steady_lake)
    monkeypatch.setenv("CTE_STREAM_RESOLVE_MIN_ROWS", "1")
    got = _final(steady_lake)
    pd.testing.assert_frame_equal(got, want)
    # projection pushdown through the streaming path too
    monkeypatch.setenv("CTE_STREAM_RESOLVE_MIN_ROWS", "1")
    got_proj = read_final_table(steady_lake, columns=["role"]).to_pandas()
    monkeypatch.delenv("CTE_STREAM_RESOLVE_MIN_ROWS")
    want_proj = read_final_table(steady_lake, columns=["role"]).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got_proj.sort_values(key, kind="mergesort").reset_index(drop=True),
        want_proj.sort_values(key, kind="mergesort").reset_index(drop=True),
    )
