"""Round-2 coverage: degenerate-text oracle alignment, SQL join semantics
(null keys, mixed key dtypes), manifest ingest metrics, predicate-pushdown
file pruning, time travel across compaction, follow-mode disorder bound."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# degenerate text inputs vs the DuckDB oracles (ADVICE r01)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def degenerate_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen")
    rows = {
        "doc_id": list(range(10)),
        "text": [
            "",                      # empty
            "   \t ",                # whitespace-only
            None,                    # null
            "one",                   # 1 word (whole-doc shingle)
            "two words",             # 2 words
            "two words",             # exact dup of the 2-word doc
            "alpha beta gamma delta epsilon",          # normal
            "alpha beta gamma delta epsilon",          # exact dup → jac 1.0
            "alpha beta gamma delta zeta",             # near dup (jac 0.5)
            "completely different content entirely here",
        ],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["token_counts", "punct_stats", "fingerprint_md5",
             "near_dup_jaccard", "dedup_survivors_minhash"]
)
def test_degenerate_text_matches_oracle(ray_session, degenerate_docs_dir, name):
    from clinical_trials_etl_ray.pipelines import textops

    result = textops.QUERIES[name](degenerate_docs_dir)
    assert_matches_oracle(result, textops.ORACLE_SQL[name], degenerate_docs_dir)


def test_exact_jaccard_degenerate_semantics():
    from clinical_trials_etl_ray.stages.dedup_text import exact_jaccard

    assert exact_jaccard("", "") == 0.0          # no-content docs never pair
    assert exact_jaccard("  ", "x y") == 0.0
    assert exact_jaccard("two words", "two words") == 1.0  # whole-doc shingle
    assert exact_jaccard("one", "one") == 1.0


# ---------------------------------------------------------------------------
# copartition_join: SQL null-key semantics + key dtype unification (ADVICE)
# ---------------------------------------------------------------------------


def _ds(df: pd.DataFrame):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_join_null_keys_never_match(ray_session):
    from clinical_trials_etl_ray.stages.join import copartition_join

    left = pd.DataFrame({"k": [1, 2, None, None], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, None], "rv": [200, 300]})
    inner = copartition_join(_ds(left), _ds(right), on="k").to_pandas()
    assert len(inner) == 1 and inner["lv"].iloc[0] == 20  # NULL ≠ NULL

    semi = copartition_join(_ds(left), _ds(right.drop(columns="rv")), on="k",
                            how="semi").to_pandas()
    assert sorted(semi["lv"]) == [20]

    anti = copartition_join(_ds(left), _ds(right.drop(columns="rv")), on="k",
                            how="anti").to_pandas()
    # NOT-EXISTS semantics: null-keyed probe rows are kept
    assert sorted(anti["lv"]) == [10, 30, 40]

    joined = copartition_join(_ds(left), _ds(right), on="k", how="left").to_pandas()
    assert len(joined) == 4
    assert joined.set_index("lv")["rv"].dropna().to_dict() == {20: 200.0}


def test_join_mixed_key_dtypes_bucket_together(ray_session):
    """int64 keys on one side, float64 (null-upcast) on the other must land
    in the same bucket and join (silent-drop regression, ADVICE r01)."""
    from clinical_trials_etl_ray.stages.join import copartition_join

    left = pd.DataFrame({"k": pd.array([1, 2, 3, 4], dtype="int64"),
                         "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": np.array([1.0, 2.0, 3.0, 4.0]),
                          "rv": [10, 20, 30, 40]})
    out = copartition_join(_ds(left), _ds(right), on="k", num_buckets=8).to_pandas()
    assert len(out) == 4
    assert sorted(out["rv"]) == [10, 20, 30, 40]


def test_join_incompatible_key_types_raise(ray_session):
    from clinical_trials_etl_ray.stages.join import copartition_join

    left = pd.DataFrame({"k": [1, 2], "lv": [1, 2]})
    right = pd.DataFrame({"k": ["a", "b"], "rv": [1, 2]})
    with pytest.raises(TypeError):
        copartition_join(_ds(left), _ds(right), on="k")


# ---------------------------------------------------------------------------
# manifest: ingest metrics, time travel across compaction, retention
# ---------------------------------------------------------------------------


@pytest.fixture()
def small_lake(ray_session, tmp_path):
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=5_000, n_convs=50, seed=3, duplicate_rate=0.05,
                      shuffle_window=64)
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    return binlog, str(tmp_path / "lake")


def test_replay_metrics_and_resume_stale_counts(small_lake):
    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.state.manifest import Manifest

    binlog, lake = small_lake
    r1 = replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    assert r1.events_read >= 5_000  # full delivery stream (incl. dup deliveries)
    assert 0 < r1.winners_written <= r1.rows_deduped <= r1.events_read
    man = Manifest.load(lake)
    m = man.metrics
    assert m["events_read"] > 0 and m["rows_deduped"] >= m["delta_rows"]

    # idempotent re-run: chunks either skip entirely (watermark prune) or
    # re-apply with every surviving row counted as stale
    r2 = replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    assert r2.winners_written == 0 or r2.stale_skipped > 0
    assert r2.chunks_skipped + r2.chunks_applied == r2.chunks_total


def test_time_travel_survives_compaction(small_lake):
    import ray

    from clinical_trials_etl_ray.pipelines.replay import compact, replay
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest

    binlog, lake = small_lake
    replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    v_before = Manifest.load(lake).version
    before = read_final_table(lake).to_pandas()

    compact(lake)  # cleanup keeps files referenced by retained versions

    old = read_final_table(lake, version=v_before).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        old.sort_values(key).reset_index(drop=True),
    )

    # explicit retention: expiring old versions reclaims their files
    man = Manifest.load(lake)
    expired = man.expire_versions(keep_last=1)
    assert v_before in expired
    with pytest.raises(FileNotFoundError):
        Manifest.load_version(lake, v_before)


def test_predicate_pushdown_prunes_files(small_lake):
    from clinical_trials_etl_ray.pipelines.replay import compact, replay
    from clinical_trials_etl_ray.stages.merge import (
        read_final_table,
        resolve_bucket,
    )
    from clinical_trials_etl_ray.state.manifest import Manifest

    binlog, lake = small_lake
    replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    compact(lake)
    man = Manifest.load(lake)

    # manifest carries conv stats on compacted bases; a disjoint range
    # prunes every file (no I/O), a matching range keeps only overlapping
    all_files = [f for b in range(8) for f in man.files_for_bucket(b)]
    assert all_files and all(f.get("conv_min") is not None for f in all_files)
    for b in range(8):
        files = man.files_for_bucket(b)
        if not files:
            continue
        t = resolve_bucket(lake, b, files, conv_range=("zzz", "zzzz"))
        assert t.num_rows == 0  # pruned before read

    full = read_final_table(lake).to_pandas()
    lo, hi = "c1", "c2"
    got = read_final_table(lake, conv_range=(lo, hi)).to_pandas()
    want = full[(full["conv_id"] >= lo) & (full["conv_id"] <= hi)]
    assert len(got) == len(want) > 0

    # point lookup: bucket pruning + row filter
    conv = full["conv_id"].iloc[0]
    got1 = read_final_table(lake, conv_id=conv).to_pandas()
    assert set(got1["conv_id"]) == {conv}
    assert len(got1) == (full["conv_id"] == conv).sum()


def test_follow_reads_producer_disorder_bound(small_lake, recwarn):
    from clinical_trials_etl_ray.pipelines.replay import (
        follow,
        producer_disorder_bound,
    )

    binlog, lake = small_lake
    assert producer_disorder_bound(binlog) == 64  # synth wrote _meta.json
    # with a published bound, follow must not warn about disorder loss
    r = follow(binlog, lake, poll_interval_s=0.05, idle_rounds=1, max_rounds=2,
               num_buckets=8, files_per_chunk=2)
    assert r.chunks_applied > 0
    assert not [w for w in recwarn.list if "disorder" in str(w.message)]


def test_follow_warns_without_bound(ray_session, tmp_path):
    from clinical_trials_etl_ray.pipelines.replay import follow
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=2_000, n_convs=20, seed=5, shuffle_window=32)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    os.remove(os.path.join(binlog, "_meta.json"))  # producer published none
    with pytest.warns(UserWarning, match="disorder"):
        follow(binlog, str(tmp_path / "lake"), poll_interval_s=0.05,
               idle_rounds=1, max_rounds=1, num_buckets=8, files_per_chunk=2)


# ---------------------------------------------------------------------------
# bounded ANN driver reads
# ---------------------------------------------------------------------------


def test_read_lowest_vec_ids_multi_row_group(tmp_path):
    from clinical_trials_etl_ray.stages.embed import read_lowest_vec_ids

    rng = np.random.default_rng(0)
    ids = rng.permutation(1000).astype(np.int64)
    t = pa.table({
        "vec_id": ids,
        "embedding": [rng.standard_normal(4).astype(np.float32) for _ in ids],
    })
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path, row_group_size=100)  # 10 row groups
    got = read_lowest_vec_ids(path, 7)
    assert got["vec_id"].to_pylist() == [0, 1, 2, 3, 4, 5, 6]


def test_prefix_read_is_bounded(tmp_path):
    from clinical_trials_etl_ray.stages.embed import read_prefix_rows

    t = pa.table({"vec_id": np.arange(5000, dtype=np.int64),
                  "embedding": [[0.0] * 4] * 5000})
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path, row_group_size=256)
    got = read_prefix_rows(path, 300)
    assert got.num_rows == 300


# ---------------------------------------------------------------------------
# vectorized kernels keep their outputs (hash-stable refactors)
# ---------------------------------------------------------------------------


@pytest.mark.filterwarnings("ignore:overflow encountered")
def test_rolling_fingerprint_matches_scalar_reference():
    # the scalar REFERENCE below wraps uint64 on purpose (numpy warns per
    # scalar wrap); the production Fingerprinter is warning-free
    from clinical_trials_etl_ray.stages.text import Fingerprinter

    fp = Fingerprinter()

    def scalar_rolling(s: str):
        b = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.uint64)
        w = fp.WINDOW
        if len(b) < w:
            h = np.uint64(0)
            for x in b:
                h = h * fp.BASE + x
            return [int(h)] * fp.n_keep
        n = len(b) - w + 1
        hashes = np.zeros(n, dtype=np.uint64)
        h = np.uint64(0)
        for x in b[:w]:
            h = h * fp.BASE + x
        hashes[0] = h
        for i in range(1, n):
            h = (h - b[i - 1] * fp.pow_w) * fp.BASE + b[i + w - 1]
            hashes[i] = h
        return sorted(np.unique(hashes)[: fp.n_keep].tolist())

    for s in ["", "short", "a" * 16, "the quick brown fox jumps over the lazy dog",
              "x" * 100, "padding ünicode tëxt with windows beyond sixteen chars"]:
        assert fp._rolling_min(s) == scalar_rolling(s), s


def test_simhash_pair_kernel_matches_naive():
    from clinical_trials_etl_ray.stages.dedup_text import (
        hamming64,
        simhash_candidate_pairs_partition,
    )

    rng = np.random.default_rng(7)
    n = 60
    doc = rng.integers(0, 25, size=n)
    block_id = rng.integers(0, 4, size=n)
    block_val = rng.integers(0, 3, size=n)
    sims = rng.integers(-(2 ** 62), 2 ** 62, size=25)
    df = pd.DataFrame({
        "doc_id": doc, "block_id": block_id, "block_val": block_val,
        "simhash": sims[doc],
    })  # duplicate (doc, block) rows left in deliberately: the kernel
    # must not emit self-pairs for them

    got = simhash_candidate_pairs_partition(df, max_hamming=40)
    naive = set()
    for (_b, _v), g in df.groupby(["block_id", "block_val"]):
        ids = g["doc_id"].tolist()
        hs = g["simhash"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= 40:
                    naive.add((min(ids[i], ids[j]), max(ids[i], ids[j]), d))
    got_set = set(map(tuple, got[["id_a", "id_b", "hamming"]].to_numpy()))
    assert got_set == naive


@pytest.mark.filterwarnings("ignore:hot-key advisory")
def test_detect_hot_key_salt(ray_session, tmp_path):
    # the deliberately skewed binlog here legitimately trips the round-4
    # streaming hot-key advisory on the salt_factor=1 comparison lake
    from clinical_trials_etl_ray.pipelines.replay import (
        detect_hot_key_salt,
        replay,
    )
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    hot = str(tmp_path / "hot")
    write_binlog_shards(
        BinlogSpec(n_events=20_000, n_convs=100, max_turns=50_000, seed=2,
                   zipf_s=2.8, shuffle_window=16),
        hot, n_shards=4, parallel=False,
    )
    uni = str(tmp_path / "uni")
    write_binlog_shards(
        BinlogSpec(n_events=20_000, n_convs=2_000, seed=2, zipf_s=0.0,
                   shuffle_window=16),
        uni, n_shards=4, parallel=False,
    )
    import os as _os

    hot_paths = sorted(
        _os.path.join(hot, f) for f in _os.listdir(hot) if f.endswith(".parquet")
    )
    uni_paths = sorted(
        _os.path.join(uni, f) for f in _os.listdir(uni) if f.endswith(".parquet")
    )
    assert detect_hot_key_salt(hot_paths, 16) > 1
    assert detect_hot_key_salt(uni_paths, 16) == 1

    # auto-salted replay persists the detected factor and matches plain replay
    lake_a = str(tmp_path / "lake_auto")
    lake_p = str(tmp_path / "lake_plain")
    replay(hot, lake_a, num_buckets=16, files_per_chunk=2, hot_key_salt="auto")
    replay(hot, lake_p, num_buckets=16, files_per_chunk=2, hot_key_salt=1)
    assert Manifest.load(lake_a).salt_factor > 1
    key = ["conv_id", "turn_idx"]
    a = read_final_table(lake_a).to_pandas().sort_values(key).reset_index(drop=True)
    p = read_final_table(lake_p).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, p)

    # resuming with "auto" on an existing lake reuses the persisted factor
    r = replay(hot, lake_a, num_buckets=16, files_per_chunk=2, hot_key_salt="auto")
    assert r.chunks_total > 0


def test_late_shard_loss_with_zero_bound_and_fix(ray_session, tmp_path):
    """The ADVICE r01 scenario, pinned end-to-end: a producer delivers a
    late shard whose LSNs fall below the already-committed watermark. With
    disorder_bound=0 those events are silently filtered as already-applied
    (demonstrated); with the producer's true bound the watermark stays
    conservative and nothing is lost."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.stages.merge import read_final_table

    def shard(path, lsns):
        n = len(lsns)
        pq.write_table(pa.table({
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(["insert"] * n, pa.string()),
            "conv_id": pa.array([f"c{x}" for x in lsns], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([f"t{x}" for x in lsns], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(
                [np.datetime64(1_000_000 * (1_700_000_000 + x), "us")
                 for x in lsns], pa.timestamp("us")),
        }), path)

    early = list(range(0, 850)) + list(range(900, 1000))  # wave 1
    late = list(range(850, 900))                          # delayed shard

    # the producer bound must cover the worst LSN displacement: delivered
    # max (999) minus the oldest still-outstanding event (850) = 149
    for bound, expect_loss in ((0, True), (150, False)):
        binlog = tmp_path / f"binlog_{bound}"
        binlog.mkdir()
        shard(str(binlog / "w1.parquet"), early)
        lake = str(tmp_path / f"lake_{bound}")
        replay(str(binlog), lake, num_buckets=4, files_per_chunk=4,
               disorder_bound=bound)
        shard(str(binlog / "w2.parquet"), late)  # late arrival
        replay(str(binlog), lake, num_buckets=4, files_per_chunk=4,
               disorder_bound=bound)
        n = read_final_table(lake).count()
        if expect_loss:
            assert n == 950  # the 50 late events were silently dropped
        else:
            assert n == 1000  # conservative watermark kept them
