"""Cross-run incremental NEAR-dup index (stages/lsh_index.py): persisted
MinHash-LSH postings + signatures, probed by each increment in
O(increment) — the approximate sibling of the exact seen-index.

Pinned here: planted cross-run near-dups are found with high signature
agreement (identical doc → est 1.0) and unrelated docs stay absent;
building in N increments ≡ one shot; re-running an update is a file-level
no-op (content-hash idempotency); bands/rows are fixed at creation; and
the driver-style oracle pin for the registered `near_dup_incremental`
query (word-3gram Jaccard ≥ 0.8 across corpus halves).
"""

import numpy as np
import pandas as pd
import pytest

from util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"

_WORDS = [f"w{i}" for i in range(400)]


def _doc(rng: np.random.Generator, n: int = 60) -> str:
    return " ".join(rng.choice(_WORDS, size=n))


def _planted_corpus():
    """20 docs: ids 0-9 historical, 10-19 new; 12≈3 (one word changed),
    15==5 (identical), everything else pairwise-distinct."""
    rng = np.random.default_rng(11)
    texts = [_doc(rng) for _ in range(20)]
    near = texts[3].split()
    near[10] = "CHANGED"
    texts[12] = " ".join(near)
    texts[15] = texts[5]
    return pd.DataFrame(
        {"doc_id": np.arange(20, dtype=np.int64), "text": texts}
    )


def _ds(df: pd.DataFrame):
    import ray.data

    return ray.data.from_pandas(df)


def test_incremental_probe_finds_planted_cross_run_dups(ray_session, tmp_path):
    from clinical_trials_etl_ray.stages.lsh_index import (
        probe_lsh_index,
        update_lsh_index,
    )

    corpus = _planted_corpus()
    idx = str(tmp_path / "idx")
    rep = update_lsh_index(idx, _ds(corpus[corpus.doc_id < 10]), num_buckets=8)
    assert rep.docs_indexed == 10 and rep.postings_added == 10 * 32

    got = probe_lsh_index(
        idx, _ds(corpus[corpus.doc_id >= 10]), est_threshold=0.5
    ).to_pandas()
    pairs = {(int(a), int(b)): e for a, b, e in got.itertuples(index=False)}
    assert (5, 15) in pairs and pairs[(5, 15)] == 1.0  # identical copy
    assert (3, 12) in pairs and pairs[(3, 12)] > 0.7   # one-word change
    # nothing else is similar — no spurious survivors
    assert set(pairs) == {(5, 15), (3, 12)}


def test_multi_increment_equals_one_shot_and_idempotent(ray_session, tmp_path):
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.stages.lsh_index import (
        lsh_candidate_pairs,
        update_lsh_index,
    )

    corpus = _planted_corpus()
    one, two = str(tmp_path / "one"), str(tmp_path / "two")
    update_lsh_index(one, _ds(corpus[corpus.doc_id < 10]), num_buckets=8)
    update_lsh_index(two, _ds(corpus[corpus.doc_id < 5]), num_buckets=8)
    update_lsh_index(two, _ds(corpus[(corpus.doc_id >= 5) & (corpus.doc_id < 10)]), num_buckets=8)

    def probe_pairs(idx):
        df = lsh_candidate_pairs(idx, _ds(corpus[corpus.doc_id >= 10])).to_pandas()
        return sorted(map(tuple, df[["id_a", "id_b"]].to_numpy()))

    assert probe_pairs(one) == probe_pairs(two)  # increments compose

    # re-running an identical update: content-hash file reuse → the
    # committed file SET is unchanged (no duplicate lineage)
    before = Manifest.load(one).all_files()
    update_lsh_index(one, _ds(corpus[corpus.doc_id < 10]), num_buckets=8)
    assert Manifest.load(one).all_files() == before

    # band parameters are fixed at creation
    with pytest.raises(ValueError, match="bands/rows"):
        update_lsh_index(one, _ds(corpus[corpus.doc_id >= 10]),
                         num_buckets=8, bands=16, rows=8)


def test_near_dup_incremental_matches_oracle(ray_session):
    """Tail oracle pin (driver window full): `near_dup_incremental` —
    index first half of documents, probe second half, exact-verify — must
    equal the cross-half all-pairs word-3gram Jaccard ≥ 0.8 SQL."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()["near_dup_incremental"]
    sql = entrymod.oracle_sql()["near_dup_incremental"]
    assert_matches_oracle(q(SF), sql, SF)


def test_cli_lshidx_update_and_probe(tmp_path):
    """Operational surface: `lshidx update` on the historical half, then
    `lshidx probe` on the new half finds the planted copies (subprocess —
    the CLI owns its own Ray session)."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = _planted_corpus()
    hist_p = str(tmp_path / "hist.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus[corpus.doc_id < 10], preserve_index=False),
        hist_p,
    )
    pq.write_table(
        pa.Table.from_pandas(corpus[corpus.doc_id >= 10], preserve_index=False),
        new_p,
    )
    idx = str(tmp_path / "idx")

    def _cli(*args):
        out = subprocess.run(
            [sys.executable, "-m", "clinical_trials_etl_ray.cli", *args],
            capture_output=True, text=True, cwd="/root/repo", check=True,
            timeout=240,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    r = _cli("lshidx", "update", idx, hist_p, "--buckets", "8")
    assert r["docs_indexed"] == 10
    pr = _cli("lshidx", "probe", idx, new_p, "--est-threshold", "0.5")
    got = {(p["id_a"], p["id_b"]) for p in pr["preview"]}
    assert got == {(5, 15), (3, 12)} and pr["pairs"] == 2


def test_lsh_index_compaction_preserves_probes(ray_session, tmp_path):
    """Folding accumulated increment files (compact_lsh_index) changes
    nothing a probe can observe, cuts file fan-in, and a second pass is a
    no-op."""
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.stages.lsh_index import (
        compact_lsh_index,
        probe_lsh_index,
        update_lsh_index,
    )

    corpus = _planted_corpus()
    idx = str(tmp_path / "idx")
    update_lsh_index(idx, _ds(corpus[corpus.doc_id < 5]), num_buckets=4)
    update_lsh_index(
        idx, _ds(corpus[(corpus.doc_id >= 5) & (corpus.doc_id < 10)]),
        num_buckets=4,
    )

    def probe():
        df = probe_lsh_index(
            idx, _ds(corpus[corpus.doc_id >= 10]), est_threshold=0.5
        ).to_pandas()
        return sorted(map(tuple, df[["id_a", "id_b"]].to_numpy()))

    want = probe()
    assert want  # planted dups present before the fold

    man = Manifest.load(idx)
    files_before = len(man.all_files())
    folded = compact_lsh_index(idx)
    assert folded > 0
    man2 = Manifest.load(idx)
    assert len(man2.all_files()) < files_before
    for b in range(man2.num_buckets):  # ≤ one file per (bucket, kind)
        kinds = [f["kind"] for f in man2.files_for_bucket(b)]
        assert len(kinds) == len(set(kinds))
    assert probe() == want
    assert compact_lsh_index(idx) == 0  # already folded


def test_filter_near_novel_drops_cross_run_dups(ray_session, tmp_path):
    """The dedup application: new docs that near-duplicate the indexed
    history are dropped, everything else survives."""
    from clinical_trials_etl_ray.stages.lsh_index import (
        filter_near_novel,
        update_lsh_index,
    )

    corpus = _planted_corpus()
    idx = str(tmp_path / "idx")
    update_lsh_index(idx, _ds(corpus[corpus.doc_id < 10]), num_buckets=8)
    survivors = filter_near_novel(
        idx, _ds(corpus[corpus.doc_id >= 10]), est_threshold=0.5
    ).to_pandas()
    assert sorted(survivors["doc_id"]) == [10, 11, 13, 14, 16, 17, 18, 19]


def test_lsh_index_width_derivation():
    """Creation width scales with the first increment (round-5 VERDICT
    item 1): floors at LSH_MIN_BUCKETS for small corpora (test fixtures
    and sf oracles keep their layout), grows ~linearly at scale, caps."""
    from clinical_trials_etl_ray.stages.lsh_index import (
        LSH_MAX_BUCKETS,
        LSH_MIN_BUCKETS,
        LSH_PARTITION_ROW_BUDGET,
        lsh_index_width,
    )

    assert lsh_index_width(10, 32) == LSH_MIN_BUCKETS
    assert lsh_index_width(0, 32) == LSH_MIN_BUCKETS
    big = 10_000_000
    want = -(-big * 32 // LSH_PARTITION_ROW_BUDGET)
    assert lsh_index_width(big, 32) == want > LSH_MIN_BUCKETS
    assert lsh_index_width(10**13, 32) == LSH_MAX_BUCKETS


def test_update_refuses_width_change_on_existing_index(ray_session, tmp_path):
    from clinical_trials_etl_ray.stages.lsh_index import update_lsh_index

    corpus = _planted_corpus()
    idx = str(tmp_path / "idx")
    update_lsh_index(idx, _ds(corpus[corpus.doc_id < 5]), num_buckets=8)
    # None on an existing index follows the committed layout
    update_lsh_index(idx, _ds(corpus[(corpus.doc_id >= 5) & (corpus.doc_id < 10)]))
    with pytest.raises(ValueError, match="rebucket_lsh_index"):
        update_lsh_index(idx, _ds(corpus[corpus.doc_id >= 10]), num_buckets=16)


def test_read_postings_is_probe_bounded(ray_session, tmp_path):
    """The probe task's working set is O(matching postings), not
    O(partition history): _read_postings returns ONLY rows whose band_hash
    is in the probe set, however large the partition's files are."""
    import pyarrow as pa

    from clinical_trials_etl_ray.stages.lsh_index import (
        _read_postings,
        _table_info,
    )

    n = 50_000
    t = pa.table(
        {
            "band_id": pa.array(np.zeros(n, dtype=np.int64)),
            "band_hash": pa.array(np.arange(n, dtype=np.int64)),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    idx = str(tmp_path / "idx")
    info = _table_info(idx, 0, "lshp", t)
    probe = np.array([5, 17, 49_999, 123_456], dtype=np.int64)  # 3 hits
    got = _read_postings(idx, [info], probe)
    assert len(got) == 3
    assert set(got["band_hash"]) == {5, 17, 49_999}


def test_rebucket_lsh_index_probe_equivalence(ray_session, tmp_path):
    """In-place rebucket (round-5 VERDICT item 1 done-criterion): probe
    results across a width change equal a from-scratch index built at the
    new width, in both directions (grow and shrink), and the layout change
    is one atomic manifest version with the old layout retained for time
    travel."""
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.stages.lsh_index import (
        probe_lsh_index,
        rebucket_lsh_index,
        update_lsh_index,
    )

    corpus = _planted_corpus()
    hist1 = corpus[corpus.doc_id < 5]
    hist2 = corpus[(corpus.doc_id >= 5) & (corpus.doc_id < 10)]
    new = corpus[corpus.doc_id >= 10]

    def probe_df(idx):
        df = probe_lsh_index(idx, _ds(new), est_threshold=0.5).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    grown = str(tmp_path / "grown")
    update_lsh_index(grown, _ds(hist1), num_buckets=4)
    update_lsh_index(grown, _ds(hist2))
    before = probe_df(grown)

    for width in (16, 2):  # grow, then shrink
        v = rebucket_lsh_index(grown, width)
        man = Manifest.load(grown)
        assert man.version == v and man.num_buckets == width
        # bands/rows metadata survives the layout swap
        assert man.metrics.get("lsh_bands") == 32
        scratch = str(tmp_path / f"scratch{width}")
        update_lsh_index(scratch, _ds(hist1), num_buckets=width)
        update_lsh_index(scratch, _ds(hist2))
        pd.testing.assert_frame_equal(probe_df(grown), probe_df(scratch))
        pd.testing.assert_frame_equal(probe_df(grown), before)

    # updates keep flowing at the new layout (None follows the manifest)
    extra = pd.DataFrame(
        {"doc_id": np.array([99], dtype=np.int64),
         "text": ["totally unrelated fresh words only"]}
    )
    update_lsh_index(grown, _ds(extra))
    pd.testing.assert_frame_equal(probe_df(grown), before)


def test_update_emits_growth_advisory_and_rebucket_clears_it(
    ray_session, tmp_path, monkeypatch
):
    """The lshidx growth monitor (r5): when the fullest posting partition
    exceeds 2x the creation row budget, update_lsh_index warns with the
    prescribed rebucket width and records it in the manifest metrics;
    after rebucketing at the advised width the next update is quiet."""
    import warnings

    from clinical_trials_etl_ray.stages import lsh_index as L
    from clinical_trials_etl_ray.state.manifest import Manifest

    corpus = _planted_corpus()
    idx = str(tmp_path / "idx")
    # 5 docs x 32 bands = 160 posting rows over 2 partitions -> ~80/part;
    # a 30-row budget makes 2x = 60 < 80 -> advisory fires
    monkeypatch.setattr(L, "LSH_PARTITION_ROW_BUDGET", 30)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        L.update_lsh_index(idx, _ds(corpus[corpus.doc_id < 5]), num_buckets=2)
    hits = [x for x in w if "rebucket_lsh_index" in str(x.message)]
    assert hits, [str(x.message) for x in w]
    man = Manifest.load(idx)
    advised = man.metrics.get("lsh_rebucket_advice_width")
    assert advised and advised > 2
    assert man.metrics["lsh_partition_max_rows"] > 60

    L.rebucket_lsh_index(idx, advised)
    man2 = Manifest.load(idx)
    # the acted-on advice is dropped at the layout commit; params carry over
    assert "lsh_rebucket_advice_width" not in man2.metrics
    assert man2.metrics.get("lsh_bands") == 32
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        L.update_lsh_index(
            idx, _ds(corpus[(corpus.doc_id >= 5) & (corpus.doc_id < 7)])
        )
    assert not [x for x in w2 if "rebucket_lsh_index" in str(x.message)], \
        [str(x.message) for x in w2]
