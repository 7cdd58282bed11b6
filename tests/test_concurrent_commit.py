"""Multi-writer commit coordination (round-4 VERDICT item 5): losing a
manifest version race now retries with rebase instead of failing, for the
provably-safe cases — appends (LWW-associative winner deltas) and
consumed-path-aware replaces (compaction/purge). Unsafe rebases still
raise ConcurrentWriterError: wholesale replace without a consumed set, and
any commit across a concurrent layout change (rebucket).

Pinned here:
  - pure manifest-level rebase: two stale-based appenders both land, files
    and watermark merged, schema unioned additively;
  - refusal cases;
  - compaction committing AFTER a newer ingest commit keeps the new deltas
    (the (current − consumed) + outputs merge);
  - the two-thread end-to-end: concurrent replay of disjoint-LSN binlogs
    into one lake == the serialized replay (VERDICT's done-criterion).
"""

import os
import threading

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import (
    ConcurrentWriterError,
    Manifest,
)
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _fi(path, lo, hi, rows=10, kind="delta"):
    return {
        "path": path, "kind": kind, "content_hash": path, "row_count": rows,
        "min_lsn": lo, "max_lsn": hi, "conv_min": None, "conv_max": None,
        "ts_us_min": None, "ts_us_max": None, "conv_bloom": None,
    }


def _nf(bucket, path, lo, hi):
    return {"bucket": bucket, **_fi(path, lo, hi)}


def test_manifest_append_rebase(tmp_path):
    lake = str(tmp_path / "lake")
    Manifest.create(lake, num_buckets=2)
    a = Manifest.load(lake)
    b = Manifest.load(lake)  # same base version — the race

    a2 = a.commit([_nf(0, "data/bucket=00000/delta-a.parquet", 0, 10)], 10)
    assert a2.version == 1
    # b's commit targets v1 too — loses the race, rebases, lands as v2
    b2 = b.commit([_nf(1, "data/bucket=00001/delta-b.parquet", 200, 300)], 300)
    assert b2.version == 2
    cur = Manifest.load(lake)
    paths = cur.all_files()
    assert "data/bucket=00000/delta-a.parquet" in paths
    assert "data/bucket=00001/delta-b.parquet" in paths
    assert cur.global_watermark() == 300  # max of both (total-order claim)


def test_manifest_rebase_refusals(tmp_path):
    lake = str(tmp_path / "lake")
    Manifest.create(lake, num_buckets=2)
    a = Manifest.load(lake)
    b = Manifest.load(lake)
    a.commit([_nf(0, "data/bucket=00000/delta-a.parquet", 0, 10)], 10)

    # wholesale replace without consumed_paths: cannot merge safely
    with pytest.raises(ConcurrentWriterError):
        b.commit(
            [], 10,
            replace_buckets={0: [_fi("data/bucket=00000/base-x.parquet", 0, 10, kind="base")]},
        )

    # layout changed underneath (rebucket): staged files are mis-routed
    c = Manifest.load(lake)
    Manifest.load(lake).commit_layout(4, 2, {}, new_watermark_lsn=10)
    with pytest.raises(ConcurrentWriterError):
        c.commit([_nf(0, "data/bucket=00000/delta-c.parquet", 11, 20)], 20)

    # retries are bounded: a writer that keeps losing eventually raises
    d = Manifest.load(lake)
    d_stale = Manifest.load(lake)
    d.commit([_nf(0, "data/bucket=00000/delta-d.parquet", 21, 30)], 30)
    with pytest.raises(ConcurrentWriterError):
        d_stale.commit(
            [_nf(0, "data/bucket=00000/delta-e.parquet", 31, 40)], 40,
            max_retries=0,
        )


def test_compaction_rebase_keeps_concurrent_deltas(ray_session, tmp_path):
    """A compaction whose commit lands AFTER a newer ingest commit must not
    drop the deltas that ingest added — the consumed-paths merge."""
    from clinical_trials_etl_ray.stages.merge import compact_bucket

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=3_000, n_convs=30, seed=51, delete_rate=0.05)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=2, files_per_chunk=1)

    man0 = Manifest.load(lake)
    # driver-side compaction plan against man0's file lists
    replace, consumed = {}, set()
    for b in range(man0.num_buckets):
        files = man0.files_for_bucket(b)
        info = compact_bucket(lake, b, files)
        replace[b] = [info] if info else []
        consumed.update(f["path"] for f in files)

    # a second generation of ingest commits BEFORE compaction's commit
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    raw = str(tmp_path / "binlog2_raw")
    write_binlog_shards(
        BinlogSpec(n_events=1_000, n_convs=30, seed=52), raw,
        n_shards=1, parallel=False,
    )
    binlog2 = str(tmp_path / "binlog2")
    os.makedirs(binlog2)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(i, "lsn", pc.add(t.column("lsn"), pa.scalar(50_000)))
            pq.write_table(t, os.path.join(binlog2, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(binlog2, name))
    replay(binlog2, lake, num_buckets=2, files_per_chunk=1)
    want = read_final_table(lake).to_pandas()

    # compaction's stale-based commit rebases and keeps gen-2 deltas
    man2 = man0.commit(
        [], new_watermark_lsn=man0.global_watermark(),
        replace_buckets=replace, consumed_paths=consumed,
        metrics={"compaction": True},
    )
    assert man2.version == Manifest.load(lake).version
    cur = Manifest.load(lake)
    kinds = [
        f["kind"] for b in range(cur.num_buckets) for f in cur.files_for_bucket(b)
    ]
    assert "base" in kinds and "delta" in kinds  # folded gen-1 + live gen-2

    got = read_final_table(lake).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(want.columns)],
    )


def test_crashed_low_range_producer_rerun_delivers(ray_session, tmp_path):
    """Round-5 ADVICE (medium): a low-range producer that crashed before
    delivering anything re-runs AFTER a concurrent high-range producer
    advanced the combined watermark past its entire range. Seeded from the
    combined watermark, the re-run would skip every chunk (chunk_max_lsn ≤
    global watermark) and the delta writer would stale-filter any rows —
    silent data loss while the watermark claims delivery. With producer
    ids, the re-run seeds from ITS OWN ledger entry (-1: never delivered)
    and lands its range; a second re-run then skips via the ledger."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lo_log = str(tmp_path / "binlog_lo")
    write_binlog_shards(
        BinlogSpec(n_events=2_000, n_convs=20, seed=71, delete_rate=0.05),
        lo_log, n_shards=2, parallel=False,
    )
    raw = str(tmp_path / "binlog_hi_raw")
    write_binlog_shards(
        BinlogSpec(n_events=2_000, n_convs=20, seed=72, delete_rate=0.05),
        raw, n_shards=2, parallel=False,
    )
    hi_log = str(tmp_path / "binlog_hi")
    os.makedirs(hi_log)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pc.add(t.column("lsn"), pa.scalar(1_000_000))
            )
            pq.write_table(t, os.path.join(hi_log, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(hi_log, name))

    lake = str(tmp_path / "lake")
    Manifest.create(lake, num_buckets=2)

    # producer "lo" crashes before delivering ANYTHING; producer "hi"
    # completes its whole (higher) range, advancing the combined watermark
    r_hi = replay(hi_log, lake, num_buckets=2, files_per_chunk=1,
                  producer="hi")
    assert r_hi.chunks_applied == r_hi.chunks_total
    man = Manifest.load(lake)
    assert man.global_watermark() >= 1_000_000
    assert man.producer_watermark("hi") >= 1_000_000
    assert man.producer_watermark("lo") == -1

    # the documented crash remedy — "re-run with its own range" — must
    # actually deliver, not no-op
    r_lo = replay(lo_log, lake, num_buckets=2, files_per_chunk=1,
                  producer="lo")
    assert r_lo.chunks_skipped == 0
    assert r_lo.delta_rows_written > 0

    serial = str(tmp_path / "serial")
    replay(lo_log, serial, num_buckets=2, files_per_chunk=1)
    replay(hi_log, serial, num_buckets=2, files_per_chunk=1)
    key = ["conv_id", "turn_idx"]
    got = read_final_table(lake).to_pandas()
    want = read_final_table(serial).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(want.columns)],
    )

    # idempotence: a THIRD run of "lo" resumes from its ledger and skips all
    r_again = replay(lo_log, lake, num_buckets=2, files_per_chunk=1,
                     producer="lo")
    assert r_again.chunks_applied == 0
    assert r_again.chunks_skipped == r_again.chunks_total
    # ledger persisted and monotone for both producers
    man2 = Manifest.load(lake)
    assert man2.producer_watermark("lo") >= 0
    assert man2.producer_watermark("hi") >= 1_000_000


def test_two_thread_replay_disjoint_ranges(ray_session, tmp_path):
    """VERDICT item 5's done-criterion: two producers feeding disjoint LSN
    ranges replay CONCURRENTLY into one lake; both commit chains land, and
    the final state equals the serialized replay."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lo_log = str(tmp_path / "binlog_lo")
    write_binlog_shards(
        BinlogSpec(n_events=3_000, n_convs=25, seed=61, delete_rate=0.05),
        lo_log, n_shards=3, parallel=False,
    )
    raw = str(tmp_path / "binlog_hi_raw")
    write_binlog_shards(
        BinlogSpec(n_events=3_000, n_convs=25, seed=62, delete_rate=0.05),
        raw, n_shards=3, parallel=False,
    )
    hi_log = str(tmp_path / "binlog_hi")
    os.makedirs(hi_log)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pc.add(t.column("lsn"), pa.scalar(1_000_000))
            )
            pq.write_table(t, os.path.join(hi_log, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(hi_log, name))

    lake = str(tmp_path / "lake")
    Manifest.create(lake, num_buckets=2)

    errs = []
    barrier = threading.Barrier(2)

    def run(log):
        try:
            barrier.wait()
            replay(log, lake, num_buckets=2, files_per_chunk=1)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=run, args=(l,)) for l in (lo_log, hi_log)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    serial = str(tmp_path / "serial")
    replay(lo_log, serial, num_buckets=2, files_per_chunk=1)
    replay(hi_log, serial, num_buckets=2, files_per_chunk=1)

    key = ["conv_id", "turn_idx"]
    got = read_final_table(lake).to_pandas()
    want = read_final_table(serial).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(want.columns)],
    )
