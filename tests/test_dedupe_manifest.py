"""Unit tests for the LWW winner kernel, bucketing, and the manifest log."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clinical_trials_etl_ray.functions.hashing import bucket_ids, content_hash, hash_strings
from clinical_trials_etl_ray.oracle import replay_events
from clinical_trials_etl_ray.schema import EVENT_SCHEMA
from clinical_trials_etl_ray.stages.dedupe import lww_winners
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, generate_events


def test_lww_winners_matches_oracle():
    t = generate_events(BinlogSpec(n_events=5000, duplicate_rate=0.1, seed=11))
    w = lww_winners(t)
    # one row per key
    keys = list(zip(w["conv_id"].to_pylist(), w["turn_idx"].to_pylist()))
    assert len(keys) == len(set(keys))
    # winner per key equals oracle state (tombstones included)
    state = replay_events(t)
    got = {(r["conv_id"], r["turn_idx"]): r["lsn"] for r in w.to_pylist()}
    want = {k: v["lsn"] for k, v in state.items()}
    assert got == want


def test_lww_winners_associative():
    """Partial dedupe then re-dedupe == one-shot dedupe (safety of per-batch
    combine + per-bucket merge + salting)."""
    t = generate_events(BinlogSpec(n_events=4000, seed=13))
    one_shot = lww_winners(t)
    parts = [t.slice(0, 1500), t.slice(1500, 1500), t.slice(3000)]
    recombined = lww_winners(pa.concat_tables([lww_winners(p) for p in parts]))
    a = one_shot.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    b = recombined.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a.equals(b)


def test_bucket_ids_stable_and_spread():
    convs = pa.array([f"c{i}" for i in range(1000)])
    b1 = bucket_ids(convs, 64)
    b2 = bucket_ids(convs, 64)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 64
    counts = np.bincount(b1, minlength=64)
    assert (counts > 0).sum() > 48  # reasonable spread
    # same conv → same bucket regardless of array context
    single = bucket_ids(pa.array(["c7"]), 64)
    assert single[0] == b1[7]


def test_content_hash_order_invariant():
    t = generate_events(BinlogSpec(n_events=500, seed=17))
    perm = np.random.default_rng(0).permutation(t.num_rows)
    assert content_hash(t) == content_hash(t.take(pa.array(perm)))
    assert content_hash(t) != content_hash(t.slice(0, 400))


def test_manifest_commit_load_roundtrip(tmp_path):
    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=8)
    assert m.global_watermark() == -1
    files = [
        {"bucket": 3, "path": "data/bucket=00003/delta-abc.parquet", "kind": "delta",
         "content_hash": "abc", "row_count": 10, "min_lsn": 0, "max_lsn": 99},
    ]
    m2 = m.commit(files, new_watermark_lsn=99, schema_names=["lsn", "op"])
    assert m2.version == 1
    loaded = Manifest.load(lake)
    assert loaded.version == 1
    assert loaded.watermark(3) == 99
    assert loaded.watermark(0) == 99  # watermark advances every bucket
    assert loaded.files_for_bucket(3)[0]["content_hash"] == "abc"
    # idempotent re-commit of the same file path doesn't duplicate
    m3 = loaded.commit(files, new_watermark_lsn=99)
    assert len(m3.files_for_bucket(3)) == 1


def test_manifest_cleanup_orphans(tmp_path):
    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=4)
    bdir = os.path.join(lake, "data", "bucket=00001")
    os.makedirs(bdir)
    ref = os.path.join(bdir, "delta-ref.parquet")
    orphan = os.path.join(bdir, "delta-orphan.parquet")
    open(ref, "w").write("x")
    open(orphan, "w").write("x")
    m2 = m.commit(
        [{"bucket": 1, "path": "data/bucket=00001/delta-ref.parquet", "kind": "delta",
          "content_hash": "r", "row_count": 1, "min_lsn": 0, "max_lsn": 0}],
        new_watermark_lsn=0,
    )
    removed = m2.cleanup_orphans()
    assert removed == ["data/bucket=00001/delta-orphan.parquet"]
    assert os.path.exists(ref) and not os.path.exists(orphan)


def test_cleanup_orphans_data_age_gate(tmp_path):
    """With ``min_data_age_sec`` set (the compact-under-follow mode), a
    FRESH unreferenced data file — possibly a concurrent replay's
    staged-but-uncommitted delta — survives the sweep; only aged orphans
    (crash leftovers) are collected. Deleting the fresh file would let the
    concurrent writer's rebased commit publish references to deleted files
    (round-5 ADVICE)."""
    import time

    from clinical_trials_etl_ray.state.manifest import ORPHAN_DATA_MIN_AGE_SEC

    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=4)
    bdir = os.path.join(lake, "data", "bucket=00001")
    os.makedirs(bdir)
    fresh = os.path.join(bdir, "delta-inflight.parquet")
    stale = os.path.join(bdir, "delta-crashleft.parquet")
    open(fresh, "w").write("x")
    open(stale, "w").write("x")
    old = time.time() - ORPHAN_DATA_MIN_AGE_SEC - 60
    os.utime(stale, (old, old))
    removed = m.cleanup_orphans(min_data_age_sec=ORPHAN_DATA_MIN_AGE_SEC)
    assert removed == ["data/bucket=00001/delta-crashleft.parquet"]
    assert os.path.exists(fresh), "in-flight staged delta must survive"
    # the default (explicit maintenance, concurrency excluded) still
    # collects immediately
    removed2 = m.cleanup_orphans()
    assert removed2 == ["data/bucket=00001/delta-inflight.parquet"]


def test_cleanup_orphans_age_gates_manifest_temps(tmp_path):
    """A FRESH manifest .tmp. file may be a live concurrent writer's
    in-flight publish — cleanup must leave it alone (deleting it turns that
    writer's ConcurrentWriterError into FileNotFoundError). Only stale temps
    (crash leftovers) are swept."""
    from clinical_trials_etl_ray.state.manifest import (
        MANIFEST_DIR,
        ORPHAN_TMP_MIN_AGE_SEC,
    )

    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=4)
    mdir = os.path.join(lake, MANIFEST_DIR)
    fresh = os.path.join(mdir, "v000002.json.tmp.1234")
    stale = os.path.join(mdir, "v000001.json.tmp.999")
    open(fresh, "w").write("{}")
    open(stale, "w").write("{}")
    import time

    old = time.time() - ORPHAN_TMP_MIN_AGE_SEC - 60
    os.utime(stale, (old, old))
    removed = m.cleanup_orphans()
    assert os.path.join(MANIFEST_DIR, "v000001.json.tmp.999") in removed
    assert os.path.exists(fresh), "live writer temp must survive cleanup"
    assert not os.path.exists(stale)


def test_concurrent_commit_rebases_not_overwrites(tmp_path):
    import pytest
    """Two writers holding the same manifest version: the first commit wins
    the version race (create-exclusive version file IS the commit point);
    since round 4 the second writer REBASES onto it and lands as the next
    version — never silently replacing lineage, never losing either
    writer's files. The raw race is still observable with max_retries=0,
    and a crash retry that re-publishes byte-identical content is
    accepted."""
    from clinical_trials_etl_ray.state.manifest import (
        ConcurrentWriterError,
        Manifest,
    )

    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=4)
    a = Manifest.load(lake)
    b = Manifest.load(lake)
    b_norebase = Manifest.load(lake)

    fa = [{"bucket": 0, "path": "data/bucket=00000/delta-a.parquet",
           "kind": "delta", "content_hash": "a", "row_count": 1,
           "min_lsn": 0, "max_lsn": 0}]
    fb = [{"bucket": 1, "path": "data/bucket=00001/delta-b.parquet",
           "kind": "delta", "content_hash": "b", "row_count": 1,
           "min_lsn": 0, "max_lsn": 0}]
    a2 = a.commit(fa, new_watermark_lsn=0)

    # the raw race (rebase disabled): loser raises, lineage intact
    with pytest.raises(ConcurrentWriterError):
        b_norebase.commit(fb, new_watermark_lsn=0, max_retries=0)
    cur = Manifest.load(lake)
    assert cur.version == a2.version
    assert "data/bucket=00001/delta-b.parquet" not in cur.all_files()

    # default: the loser rebases and lands with BOTH writers' files
    b2 = b.commit(fb, new_watermark_lsn=0)
    assert b2.version == a2.version + 1
    cur = Manifest.load(lake)
    assert "data/bucket=00000/delta-a.parquet" in cur.all_files()
    assert "data/bucket=00001/delta-b.parquet" in cur.all_files()

    # idempotent identical re-publish does not raise
    b2._publish()


def test_manifest_summary(tmp_path):
    lake = str(tmp_path / "lake")
    m = Manifest.create(lake, num_buckets=4)
    m = m.commit(
        [
            {"bucket": 0, "path": "data/bucket=00000/delta-a.parquet",
             "kind": "delta", "content_hash": "a", "row_count": 7,
             "min_lsn": 0, "max_lsn": 9},
            {"bucket": 2, "path": "data/bucket=00002/base-b.parquet",
             "kind": "base", "content_hash": "b", "row_count": 5,
             "min_lsn": 0, "max_lsn": 9},
        ],
        new_watermark_lsn=9,
        schema_names=["lsn", "op"],
        metrics={"events_read": 12},
    )
    s = m.summary()
    assert s["version"] == 1
    assert s["versions_retained"] == [0, 1]
    assert s["buckets_nonempty"] == 2
    assert s["files_by_kind"] == {
        "delta": {"files": 1, "rows": 7},
        "base": {"files": 1, "rows": 5},
    }
    assert s["total_rows"] == 12
    assert s["watermark_min"] == s["watermark_max"] == 9
    assert s["last_commit_metrics"]["events_read"] == 12
