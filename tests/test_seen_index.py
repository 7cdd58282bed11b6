"""Cross-run incremental dedup (stages/seen_index.py): persisted
fingerprint index semantics — append-only novelty, increment-split
invariance, cross-run filtering, exactly-once manifest versioning."""

import pandas as pd
import pytest

from util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


def _docs_ds(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


def test_dedup_incremental_matches_oracle(ray_session):
    """The registered query (oracle-bearing tail entry — the driver's
    50-slot window is full) stays pinned to its DuckDB NOT-IN oracle."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()["dedup_incremental"]
    sql = entrymod.oracle_sql()["dedup_incremental"]
    assert_matches_oracle(q(SF), sql, SF)


def test_update_adds_only_novel_and_split_invariant(ray_session, tmp_path):
    """Folding the same corpus in twice adds nothing the second time, and
    building the index in two increments equals building it in one shot
    (bucket routing is deterministic ⇒ the index is mergeable)."""
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.stages.seen_index import update_seen_index

    rows_a = [{"doc_id": i, "text": f"doc number {i}"} for i in range(40)]
    rows_b = [
        {"doc_id": 100 + i, "text": f"doc number {i}"} for i in range(20)
    ] + [{"doc_id": 200 + i, "text": f"fresh {i}"} for i in range(15)]

    idx = str(tmp_path / "idx")
    r1 = update_seen_index(idx, _docs_ds(rows_a), num_buckets=8)
    assert r1.fps_added == 40 and r1.version == 1

    # re-ingesting the identical corpus is a no-op (no files, no commit)
    r2 = update_seen_index(idx, _docs_ds(rows_a), num_buckets=8)
    assert r2.fps_added == 0 and Manifest.load(idx).version == 1

    # second increment adds only its 15 genuinely novel fingerprints
    r3 = update_seen_index(idx, _docs_ds(rows_b), num_buckets=8)
    assert r3.fps_added == 15

    # split-invariance: one-shot index over a+b has identical fp sets
    idx2 = str(tmp_path / "idx2")
    update_seen_index(idx2, _docs_ds(rows_a + rows_b), num_buckets=8)

    import os

    import pyarrow.parquet as pq

    def all_fps(d):
        m = Manifest.load(d)
        fps = set()
        for b in range(m.num_buckets):
            for f in m.files_for_bucket(b):
                fps |= set(
                    pq.read_table(os.path.join(d, f["path"]))["fp"].to_pylist()
                )
        return fps

    assert all_fps(idx) == all_fps(idx2)


def test_filter_unseen_is_cross_run_only(ray_session, tmp_path):
    """filter_unseen drops exactly the rows whose content is in the index;
    duplicates WITHIN the increment all survive (pure cross-run filter),
    and unindexed buckets pass everything through."""
    from clinical_trials_etl_ray.stages.seen_index import (
        filter_unseen,
        update_seen_index,
    )

    idx = str(tmp_path / "idx")
    update_seen_index(
        idx,
        _docs_ds([{"doc_id": i, "text": f"seen {i}"} for i in range(10)]),
        num_buckets=4,
    )

    increment = [
        {"doc_id": 50, "text": "seen 3"},      # dropped: in the index
        {"doc_id": 51, "text": "novel x"},
        {"doc_id": 52, "text": "novel x"},     # within-increment dup SURVIVES
        {"doc_id": 53, "text": "seen 7"},      # dropped
        {"doc_id": 54, "text": None},          # NULL hashes as '' — novel here
    ]
    got = (
        filter_unseen(_docs_ds(increment), idx)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == [51, 52, 54]
    assert list(got.columns) == ["doc_id", "text"]


def test_concurrent_index_writers_coordinate(ray_session, tmp_path):
    """Two updates racing to the same index version: the raw race is an
    exclusive-create loss (observable with max_retries=0, same protocol as
    the lake); since round 4 the default path REBASES the losing append
    onto the winner — both writers' postings stay referenced, lineage is
    never silently overwritten."""
    from clinical_trials_etl_ray.state.manifest import (
        ConcurrentWriterError,
        Manifest,
    )
    from clinical_trials_etl_ray.stages.seen_index import update_seen_index

    idx = str(tmp_path / "idx")
    update_seen_index(
        idx,
        _docs_ds([{"doc_id": 0, "text": "base"}]),
        num_buckets=4,
    )
    stale = Manifest.load(idx)
    # a second writer commits first...
    update_seen_index(
        idx, _docs_ds([{"doc_id": 1, "text": "w2"}]), num_buckets=4
    )
    # ...the stale handle's raw commit to the now-taken version loses
    with pytest.raises(ConcurrentWriterError):
        stale.commit(
            [], new_watermark_lsn=stale.global_watermark(), max_retries=0
        )
    # and the default rebase path lands it WITHOUT dropping the winner's
    # files (an empty append preserves the newer lineage wholesale)
    before = Manifest.load(idx)
    landed = stale.commit([], new_watermark_lsn=stale.global_watermark())
    assert landed.version == before.version + 1
    assert Manifest.load(idx).all_files() == before.all_files()


def test_cli_seen_update_and_filter(tmp_path):
    """Operational surface: `seen update` twice (second is a novel-only
    no-op), then `seen filter` drops exactly the indexed content
    (subprocess — the CLI owns its own Ray session)."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    hist = str(tmp_path / "hist.parquet")
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": ["a b", "c d", "e f"]}), hist
    )
    inc = str(tmp_path / "inc.parquet")
    pq.write_table(
        pa.table({"doc_id": [10, 11], "text": ["c d", "new stuff"]}), inc
    )
    idx = str(tmp_path / "idx")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "clinical_trials_etl_ray.cli",
             "--num-cpus", "2", *args],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    r1 = run("seen", "update", idx, hist, "--buckets", "4")
    assert r1["fps_added"] == 3
    r2 = run("seen", "update", idx, hist, "--buckets", "4")
    assert r2["fps_added"] == 0  # idempotent re-ingest

    outdir = str(tmp_path / "survivors")
    run("seen", "filter", idx, inc, "--out-dir", outdir)
    got = pq.read_table(outdir)
    assert got.column("doc_id").to_pylist() == [11]


def test_filter_then_update_composite(ray_session, tmp_path):
    """One-pass nightly-ingest composite: survivors are computed against
    the PRE-update index state (the increment's own fps never filter it),
    and the update makes a re-run of the same increment fully seen."""
    from clinical_trials_etl_ray.stages.seen_index import (
        filter_then_update,
        filter_unseen,
        update_seen_index,
    )

    idx = str(tmp_path / "idx")
    update_seen_index(
        idx,
        _docs_ds([{"doc_id": i, "text": f"old {i}"} for i in range(6)]),
        num_buckets=4,
    )
    increment = [
        {"doc_id": 20, "text": "old 2"},   # seen → dropped
        {"doc_id": 21, "text": "brand new"},
        {"doc_id": 22, "text": "brand new"},  # within-increment dup survives
    ]
    survivors, report = filter_then_update(idx, _docs_ds(increment))
    got = survivors.to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [21, 22]
    assert report.fps_added == 1  # 'old 2' was known; 'brand new' is one fp

    # the composite recorded the increment: a re-run is fully seen
    assert filter_unseen(_docs_ds(increment), idx).count() == 0
