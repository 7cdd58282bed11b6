"""Round-3 coverage: the four queries displaced from the driver's 50-entry
window (orders_page, docs_containing_the, top_tokens, punct_stats) keep
their oracle pins here; plus regression tests for round-3 fixes."""

import os
import shutil

import numpy as np

import pyarrow as pa
import pytest

from util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name",
    [
        "orders_page",
        "docs_containing_the",
        "top_tokens",
        "punct_stats",
        # r3 additions: event-time predicate-pushdown read and the
        # net-change feed (oracle-bearing tail entries — the 50-slot
        # window is full)
        "cdc_final_ts_filter",
        "cdc_change_feed",
        "cdc_replica_final",
        "near_dup_clusters",
        # every remaining tail oracle-bearing query, driven BY NAME through
        # the driver contract (the meta-test below fails if any is missing)
        "mv_conv_stats",
        "mv_role_hourly",
        "render_conversations",
        "decontaminate_docs",
        "decon_cosine",
        "quantiles_by_lang",
        "stratified_sample",
        "value_buckets",
        "customer_lookup",
        "distinct_mktsegments",
    ],
)
def test_displaced_window_queries_match_oracle(ray_session, name):
    """These four were rotated out of the driver window in r3 (their operator
    IDs are redundantly covered by in-window queries); their DuckDB oracles
    stay enforced here so the displacement costs no correctness evidence."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(SF), sql, SF)


def test_minhash_cap_drop_reported(ray_session):
    """A band bucket hotter than df_cap is dropped AND the drop is counted
    (VERDICT r2 'What's wrong' 2: caps must not be silent)."""
    import numpy as np
    import pandas as pd

    from clinical_trials_etl_ray.stages.capstats import (
        cap_drop_totals,
        reset_cap_drops,
    )
    from clinical_trials_etl_ray.stages.dedup_text import (
        candidate_pairs_partition,
    )

    reset_cap_drops()
    n_hot = 250
    group = pd.DataFrame(
        {
            "band_id": np.zeros(n_hot + 2, dtype=np.int64),
            "band_hash": np.r_[np.zeros(n_hot, dtype=np.int64), [7, 7]],
            "doc_id": np.arange(n_hot + 2, dtype=np.int64),
        }
    )
    pairs = candidate_pairs_partition(group, df_cap=200)
    # the hot bucket contributes nothing; the cold 2-doc bucket pairs
    assert len(pairs) == 1
    totals = cap_drop_totals()
    assert totals.get("minhash_bands") == (1, n_hot)


def test_simhash_cap_drop_reported(ray_session):
    import numpy as np
    import pandas as pd

    from clinical_trials_etl_ray.stages.capstats import (
        cap_drop_totals,
        reset_cap_drops,
    )
    from clinical_trials_etl_ray.stages.dedup_text import (
        simhash_candidate_pairs_partition,
    )

    reset_cap_drops()
    n_hot = 220
    group = pd.DataFrame(
        {
            "block_id": np.zeros(n_hot, dtype=np.int64),
            "block_val": np.zeros(n_hot, dtype=np.int64),
            "doc_id": np.arange(n_hot, dtype=np.int64),
            "simhash": np.zeros(n_hot, dtype=np.int64),
        }
    )
    pairs = simhash_candidate_pairs_partition(group, df_cap=200)
    assert len(pairs) == 0
    assert cap_drop_totals().get("simhash_blocks") == (1, n_hot)


def test_embedding_lsh_cap_drop_reported_from_workers(ray_session):
    """bucket_cap truncation inside distributed map_groups workers reaches
    the driver-visible totals via the named metrics actor."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from clinical_trials_etl_ray.stages.capstats import (
        cap_drop_totals,
        reset_cap_drops,
    )
    from clinical_trials_etl_ray.stages.embed import lsh_pairs

    reset_cap_drops()
    n = 10
    vec = [0.5] * 64
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    pairs = lsh_pairs(ds, threshold=0.4, bucket_cap=4).to_pandas()
    # identical vectors share every bucket; cap 4 keeps 4C2=6 pairs
    assert len(pairs) == 6
    key, (buckets, rows) = next(iter(cap_drop_totals().items()))
    assert key == "embedding_lsh" and buckets >= 1 and rows >= n - 4


def test_empty_text_check_matches_oracle_whitespace_class():
    """empty_text must trim exactly RE2's ASCII \\s class ([\\t\\n\\f\\r ])
    like the DuckDB oracle — NOT Unicode whitespace (U+00A0) and NOT \\v,
    neither of which RE2 \\s matches (ADVICE r2)."""
    import duckdb
    import pyarrow as pa

    from clinical_trials_etl_ray.stages.validate import event_checks

    texts = ["", "   ", " \t\n\r\f", "\u00a0", "\x0b", "x", None]
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * len(texts)),
            "turn_idx": pa.array([0] * len(texts), pa.int64()),
            "op": pa.array(["insert"] * len(texts)),
            "ts": pa.array([1] * len(texts), pa.int64()),
            "role": pa.array(["user"] * len(texts)),
            "text": pa.array(texts),
        }
    )
    got = event_checks(t)["empty_text"].tolist()
    con = duckdb.connect()
    want = [
        con.execute(
            "select regexp_replace(coalesce(?, ''), '^\\s+|\\s+$', '', 'g') = ''",
            [s],
        ).fetchone()[0]
        for s in texts
    ]
    assert got == want


@pytest.fixture()
def ts_lake(ray_session, tmp_path):
    from clinical_trials_etl_ray.pipelines.replay import compact, replay
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=5_000, n_convs=50, seed=3, duplicate_rate=0.05,
        shuffle_window=64,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=8, files_per_chunk=2)
    compact(lake)
    return lake


def test_ts_file_stats_recorded_and_row_filter_exact(ts_lake):
    """Every committed file carries a ts range; ts_min/ts_max read results
    equal the row-filtered full table (pruning never changes results)."""
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(ts_lake)
    files = [f for b in range(8) for f in man.files_for_bucket(b)]
    assert files and all(
        f.get("ts_us_min") is not None and f["ts_us_max"] >= f["ts_us_min"]
        for f in files
    )

    full = read_final_table(ts_lake).to_pandas()
    ts_us = full["ts"].astype("int64")
    mid = int(ts_us.quantile(0.5))
    got = read_final_table(ts_lake, ts_min=mid).to_pandas()
    assert len(got) == int((ts_us >= mid).sum()) > 0
    got2 = read_final_table(ts_lake, ts_max=mid).to_pandas()
    assert len(got2) == int((ts_us <= mid).sum()) > 0


def test_ts_stats_recorded_on_delta_files(ray_session, tmp_path):
    """UNCOMPACTED delta files carry ts ranges too — recorded at ingest
    (pipelines/replay.py new_files), so the read path's sound ts prunes
    apply before any compaction ever runs."""
    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=2_000, n_convs=20, seed=7)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=2)

    man = Manifest.load(lake)
    files = [f for b in range(4) for f in man.files_for_bucket(b)]
    assert files and all(f["kind"] == "delta" for f in files)
    assert all(
        f.get("ts_us_min") is not None
        and f.get("ts_us_max") is not None
        and f["ts_us_max"] >= f["ts_us_min"]
        for f in files
    )


def test_ts_prune_skips_file_reads(ts_lake):
    """Pruning proof: with a ts_min beyond every file's max (and a ts_max
    below every file's min) the read touches NO data files — deleting them
    from disk first would otherwise crash the resolve tasks."""
    import os

    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(ts_lake)
    files = [f for b in range(8) for f in man.files_for_bucket(b)]
    hi = max(f["ts_us_max"] for f in files)
    lo = min(f["ts_us_min"] for f in files)
    for f in files:
        os.remove(os.path.join(ts_lake, f["path"]))
    assert len(read_final_table(ts_lake, ts_min=hi + 1).to_pandas()) == 0
    assert len(read_final_table(ts_lake, ts_max=lo - 1).to_pandas()) == 0


def test_ivf_kmeans_refinement_beats_strided_recall(tmp_path):
    """On clustered data at small nprobe the Lloyd-refined codebook must
    beat the raw strided-sample seed it starts from (VERDICT r2 item 6);
    exactness at nprobe=C is unaffected (pinned elsewhere)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.stages.embed import (
        coarse_centroids,
        normalize_rows,
        read_prefix_rows,
        table_to_matrix,
    )

    rng = np.random.default_rng(1)
    c_true, d, n = 8, 64, 4000
    means = rng.standard_normal((c_true, d)) * 1.5
    x = np.concatenate(
        [means[i] + rng.standard_normal((n // c_true, d)) for i in range(c_true)]
    )
    x = x[rng.permutation(n)]
    path = str(tmp_path / "embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in x], pa.list_(pa.float64())
                ),
            }
        ),
        path,
    )

    def strided_seed(n_centroids):  # the pre-r3 baseline codebook
        sample = read_prefix_rows(path, max(1024, n_centroids * 16)).sort_by(
            "vec_id"
        )
        m = table_to_matrix(sample)
        stride = max(1, len(m) // n_centroids)
        return m[: stride * n_centroids : stride][:n_centroids].copy()

    def recall(cent, k=5, nprobe=2, nq=30):
        cm, xm = normalize_rows(cent), normalize_rows(x)
        assign = np.argmax(cm @ xm.T, axis=0)
        rec = []
        for qi in range(nq):
            row = (xm[qi] @ xm.T).copy()
            row[qi] = -np.inf
            truth = set(np.argsort(-row)[:k])
            probes = np.argsort(-(xm[qi] @ cm.T))[:nprobe]
            mask = np.isin(assign, probes)
            mask[qi] = False
            cand = np.nonzero(mask)[0]
            got = set(cand[np.argsort(-row[cand])[:k]]) if len(cand) else set()
            rec.append(len(truth & got) / k)
        return float(np.mean(rec))

    r_strided = recall(strided_seed(8))
    r_refined = recall(coarse_centroids(path, 8))
    assert r_refined > r_strided
    assert r_refined >= 0.95


def _check_feed_invariant(lake: str, cuts) -> None:
    """apply(state_S, feed(S,U]) == state_U for each (S, U) in cuts."""
    from clinical_trials_etl_ray.stages.dedupe import lww_winners
    from clinical_trials_etl_ray.stages.merge import read_change_feed

    def collect(since, until):
        tabs = list(
            read_change_feed(lake, since_lsn=since, until_lsn=until)
            .iter_batches(batch_format="pyarrow")
        )
        return pa.concat_tables(tabs, promote_options="default") if tabs else None

    key = [
        ("conv_id", "ascending"),
        ("turn_idx", "ascending"),
        ("lsn", "ascending"),
    ]
    for s, u in cuts:
        state_s = collect(-1, s)
        feed = collect(s, u)
        state_u = collect(-1, u)
        parts = [t for t in (state_s, feed) if t is not None]
        assert parts and state_u is not None
        applied = lww_winners(pa.concat_tables(parts, promote_options="default"))
        want = state_u.sort_by(key)
        got = applied.sort_by(key)
        assert got.select(want.column_names).equals(want), (s, u)


def test_change_feed_apply_invariant(ts_lake):
    """For ANY cuts S ≤ U on one manifest: LWW-applying feed(S, U] onto the
    as-of-S winners (= feed(-1, S]) equals the as-of-U winners — the
    consumer contract of the net-change feed. Checked at arbitrary interior
    cuts (not just watermarks) and at the extremes."""
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(ts_lake)
    hi = max(
        f["max_lsn"] for b in range(8) for f in man.files_for_bucket(b)
    )
    _check_feed_invariant(
        ts_lake, ((-1, hi), (hi // 3, (2 * hi) // 3), (0, hi // 2))
    )


def test_change_feed_invariant_across_compacted_base_and_new_deltas(
    ray_session, ts_lake, tmp_path
):
    """The mixed file-kind case a long-lived lake actually has: a compacted
    base PLUS a second ingest generation of deltas (same conv keys →
    genuine cross-generation supersessions). The apply-invariant must hold
    at cuts inside generation 1, at the generation boundary, and spanning
    both."""
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    man = Manifest.load(ts_lake)
    hi1 = max(f["max_lsn"] for b in range(8) for f in man.files_for_bucket(b))

    raw = str(tmp_path / "binlog2_raw")
    spec2 = BinlogSpec(
        n_events=3000, n_convs=50, seed=9, duplicate_rate=0.05,
        shuffle_window=64,
    )
    write_binlog_shards(spec2, raw, n_shards=2, parallel=False)
    shifted = str(tmp_path / "binlog2")
    os.makedirs(shifted)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pa.compute.add(t["lsn"], hi1 + 1)
            )
            pq.write_table(t, os.path.join(shifted, name))
        else:  # _meta.json sidecar (disorder bound) rides along
            shutil.copy(src, os.path.join(shifted, name))
    replay(shifted, ts_lake, num_buckets=8, files_per_chunk=2)

    man2 = Manifest.load(ts_lake)
    hi2 = max(f["max_lsn"] for b in range(8) for f in man2.files_for_bucket(b))
    assert hi2 > hi1
    kinds = {f["kind"] for b in range(8) for f in man2.files_for_bucket(b)}
    assert kinds == {"base", "delta"}  # the mixed layout under test
    _check_feed_invariant(
        ts_lake,
        ((hi1 // 2, hi1), (hi1, hi2), (hi1 // 2, hi1 + 1500), (-1, hi2)),
    )


def test_change_feed_prunes_and_empty_past_watermark(ts_lake):
    """feed(watermark, ...) touches no files (delete-files proof) and is
    empty; feed rows carry op/lsn including delete tombstones."""
    import os

    import pyarrow.compute as pc

    from clinical_trials_etl_ray.stages.merge import read_change_feed
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(ts_lake)
    files = [f for b in range(8) for f in man.files_for_bucket(b)]
    hi = max(f["max_lsn"] for f in files)
    full = pa.concat_tables(
        read_change_feed(ts_lake, since_lsn=-1).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert {"lsn", "op"} <= set(full.column_names)
    assert pc.sum(pc.equal(full["op"], "delete").cast("int64")).as_py() > 0
    for f in files:
        os.remove(os.path.join(ts_lake, f["path"]))
    assert (
        read_change_feed(ts_lake, since_lsn=hi).count() == 0
    ), "fully-pruned feed must read nothing"


def test_connected_components_known_graph(ray_session):
    """Min-label propagation on a known graph: a 5-chain (worst diameter),
    a triangle, and a disjoint pair — every node labeled with its
    component's min id, invariant to input partitioning."""
    import pandas as pd
    import ray.data

    from clinical_trials_etl_ray.stages.graph import connected_components

    # chain 10-11-12-13-14, triangle 20-21-22, pair 30-31
    pairs = pd.DataFrame(
        {
            "id_a": [11, 12, 13, 14, 20, 21, 22, 31],
            "id_b": [10, 11, 12, 13, 21, 22, 20, 30],
        }
    )
    want = {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }
    for blocks in (1, 4):
        ds = ray.data.from_pandas(pairs).repartition(blocks)
        got = connected_components(ds).to_pandas()
        assert dict(zip(got["node"], got["lbl"])) == want


def test_pack_sequences_properties(ray_session):
    """Every doc packed exactly once; per-pack token sums ≤ budget except
    flagged single-doc overflow packs; deterministic and invariant to
    input partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data

    from clinical_trials_etl_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(3)
    n = 2000
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_tokens": np.r_[
                rng.integers(1, 200, size=n - 3),
                [500, 257, 256],  # two oversized (budget 256) + one exact-fit
            ],
        }
    )
    budget = 256
    outs = []
    for blocks in (1, 5):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        out = pack_sequences(ds, budget=budget, num_groups=8).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partitioning-invariant

    out = outs[0]
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])  # total coverage
    sums = out.groupby("pack_id")["n_tokens"].sum()
    members = out.groupby("pack_id").size()
    over = out[out["overflow"]]
    assert set(over["doc_id"]) == {n - 3, n - 2}  # 500 and 257 flagged
    for pid, s in sums.items():
        if pid in set(over["pack_id"]):
            assert members[pid] == 1  # oversized docs pack alone
        else:
            assert s <= budget
    # FFD utilization sanity: mean non-overflow pack fill well above half
    ok = sums[~sums.index.isin(set(over["pack_id"]))]
    assert (ok / budget).mean() > 0.7


def test_survivors_broadcast_equals_join_path(ray_session):
    """The size-aware anti-join: broadcast np.isin filter ≡ distributed
    co-partitioned anti-join on the same input (both vs each other and in
    count vs the oracle-checked default)."""
    from clinical_trials_etl_ray.pipelines.textops import (
        q_dedup_survivors_minhash,
    )

    a = q_dedup_survivors_minhash(SF, anti="broadcast").to_pandas()
    b = q_dedup_survivors_minhash(SF, anti="join").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_topk_per_query_tie_safe_vs_full_sort():
    """The fused per-batch top-k cut must preserve the exact global result
    under cosine ties at the k boundary: every tied candidate is retained
    so the final (cos desc, vec_id asc) cut matches a full sort. Uses
    quantized scores to force many exact ties."""
    import numpy as np

    from clinical_trials_etl_ray.stages.embed import topk_per_query

    rng = np.random.default_rng(11)
    k = 5
    for trial in range(20):
        nq, nb = 3, 64
        qids = np.array([1000, 2000, 3000], dtype=np.int64)
        vec_ids = rng.permutation(np.arange(nb, dtype=np.int64) + trial)
        # quantized to 4 levels -> dense exact ties at every boundary
        cos = rng.integers(0, 4, size=(nq, nb)).astype(np.float64) / 4.0
        out = topk_per_query(qids, vec_ids, cos, k).to_pandas()
        for qi, qid in enumerate(qids):
            mask = vec_ids != qid
            order = np.lexsort((vec_ids[mask], -cos[qi][mask]))
            want = list(
                zip(vec_ids[mask][order][:k], cos[qi][mask][order][:k])
            )
            g = out[out["qid"] == qid].sort_values(
                ["cos", "vec_id"], ascending=[False, True]
            )
            got = list(zip(g["vec_id"], g["cos"]))[:k]
            assert got == want, (trial, qid)


def test_decoder_factory_gates_on_pil():
    """make_decoder returns the real PIL kernel when the library exists,
    else the deterministic stub; both share the output layout."""
    from clinical_trials_etl_ray.stages.multimodal import (
        DeterministicFakeDecoder,
        RealDecoder,
        make_decoder,
        synth_media_table,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    dec = make_decoder()
    if has_pil:
        assert isinstance(dec, RealDecoder)
    else:
        assert isinstance(dec, DeterministicFakeDecoder)
        with pytest.raises(NotImplementedError):
            RealDecoder()
    out = dec(synth_media_table(8))
    assert out.column_names == ["media_id", "kind", "n_bytes", "feature"]
    assert out.num_rows == 8


def test_kmeans_refine_distributed_matches_local_lloyd(ray_session):
    """The distributed partial-sum Lloyd pass must converge to the same
    codebook as a single-process reference implementation on the same data
    and seed (block partitioning must not change the result)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from clinical_trials_etl_ray.stages.embed import (
        kmeans_refine_distributed,
        normalize_rows,
    )

    rng = np.random.default_rng(5)
    n, d, c = 2000, 16, 6
    x = rng.standard_normal((n, d))
    seed_cent = x[:c].copy()

    def local_lloyd(cent, iters):
        cent = cent.astype(np.float64).copy()
        xm = normalize_rows(x)
        for _ in range(iters):
            cm = normalize_rows(cent)
            assign = np.argmax(cm @ xm.T, axis=0)
            sums = np.zeros_like(cent)
            np.add.at(sums, assign, xm)
            counts = np.bincount(assign, minlength=c).astype(np.float64)
            ne = counts > 0
            cent[ne] = sums[ne] / counts[ne, None]
        return cent

    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in x], pa.list_(pa.float64())),
        }
    )
    want = local_lloyd(seed_cent, 3)
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = kmeans_refine_distributed(ds, seed_cent, iters=3)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_window_invariants():
    """Every one of the driver's first 50 queries is oracle-bearing, and the
    four r3-rotated complex operators sit inside the window."""
    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    window = names[:50]
    assert all(n in oracles for n in window)
    for n in (
        "order_last_event_asof",
        "order_followups_window",
        "training_data_prep",
        "validate_events",
    ):
        assert n in window


def test_every_tail_oracle_query_is_pytest_pinned():
    """Every oracle-bearing query BEYOND the driver's 50-entry window must
    be exercised by name somewhere under tests/ — otherwise its oracle is
    dead weight nobody runs. Pure introspection (no Ray): scans the test
    sources for each name."""
    import os

    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    tail_oracle = [n for n in names[50:] if n in oracles]
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    corpus = "\n".join(
        open(os.path.join(tests_dir, f)).read()
        for f in sorted(os.listdir(tests_dir))
        if f.endswith(".py")
    )
    missing = [n for n in tail_oracle if f'"{n}"' not in corpus]
    assert not missing, (
        f"tail oracle-bearing queries with no pytest pin: {missing}"
    )


def test_decontaminate_drops_planted_overlap(ray_session):
    """A corpus doc sharing a 4-gram with a benchmark doc is dropped; docs
    with no shared 4-gram (including <4-word and empty docs) survive."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.textops import q_decontaminate

    bench_id = 13  # 13 % 97 == 13 → benchmark slice
    rows = pa.table(
        {
            "doc_id": pa.array([13, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon",   # benchmark doc
                    "x alpha beta gamma delta y",       # shares 4-gram → drop
                    "alpha beta gamma zeta eta",        # only 3-gram shared → keep
                    "tiny doc",                         # <4 words → keep
                    None,                               # null text → keep
                ]
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(rows, os.path.join(d, "documents.parquet"))
        out = q_decontaminate(d).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 4]
    assert bench_id not in set(out["doc_id"])


def test_decon_gram_hash_string_parity():
    """gram_hashes emits exactly one hash per gram_strings entry (multiset →
    set alignment), and equal gram strings hash equal across docs."""
    from clinical_trials_etl_ray.stages.decon import gram_hashes, gram_strings

    texts = [
        "a b c d e f", "c d e f g", "one two three", "", None,
        "A B C D",  # case-folds to the gram 'a b c d' of texts[0]
    ]
    h, off = gram_hashes(texts, gram=4)
    for i, t in enumerate(texts):
        grams = gram_strings(t, gram=4)
        assert len(set(h[off[i] : off[i + 1]].tolist())) == len(grams)
    # cross-doc: 'a b c d' occurs in docs 0 and 5 → identical hash
    assert h[off[0]] == h[off[5]]


def test_quantiles_histogram_parallelism_invariant(ray_session):
    """The value-count-histogram quantile is exact at ANY block count: the
    partial/final combine must give identical p50/p90/p99 whether the input
    is 1 block or many."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.analytics import q_quantiles_by_lang

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "lang": pa.array(rng.choice(["en", "fr"], size=n)),
            "n_chars": pa.array(rng.integers(1, 400, size=n), pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"), row_group_size=250)
        out = (
            q_quantiles_by_lang(d).to_pandas().sort_values("lang").reset_index(drop=True)
        )
    # brute-force oracle: DuckDB ceil-rank rule
    df = t.to_pandas()
    for _, row in out.iterrows():
        vals = np.sort(df[df["lang"] == row["lang"]]["n_chars"].to_numpy())
        assert row["n"] == len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert row[col] == vals[max(int(np.ceil(q * len(vals))), 1) - 1]


def test_decon_scorer_edge_batches(ray_session):
    """DeconScorer guards: a batch of only benchmark rows, an empty batch,
    and a corpus row identical to a benchmark vector (flagged at cos 1.0).
    The benchmark-row filter is fused into the scorer, so these edges hit
    the kernel directly."""
    import ray

    from clinical_trials_etl_ray.stages.embed import DeconScorer

    bench = np.eye(4)[:2]  # two orthonormal benchmark vectors
    ref = ray.put({"matrix": bench})
    s = DeconScorer(bench_ref=ref, threshold=0.9, mod=2, rem=0)

    emb_t = pa.list_(pa.float64())
    bench_only = pa.table(
        {"vec_id": pa.array([0, 2], pa.int64()),
         "embedding": pa.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]], emb_t)}
    )
    out = s(bench_only)
    assert out.num_rows == 0
    assert out.schema.names == ["vec_id", "max_cos"]

    assert s(bench_only.slice(0, 0)).num_rows == 0

    corpus = pa.table(
        {"vec_id": pa.array([3, 5], pa.int64()),
         "embedding": pa.array(
             [[2.0, 0, 0, 0], [0, 0, 0, 1.0]], emb_t)}
    )
    out = s(corpus)  # vec 3 is a scaled copy of bench[0]; vec 5 orthogonal
    assert out.to_pydict() == {"vec_id": [3], "max_cos": [1.0]}
