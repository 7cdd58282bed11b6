"""Incremental inverted text index (stages/textindex.py).

Pins: the driver-contract query "text_search_index" equals its DuckDB
token-scan oracle; incremental refresh ≡ full rebuild with only touched
buckets recomputed; AND/OR semantics; updates and deletes retire stale
postings (bucket recompute is from LIVE rows); a no-change refresh is a
zero-bucket no-op.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from util_compare import assert_matches_oracle

from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.schema import EVENT_SCHEMA
from clinical_trials_etl_ray.stages.textindex import (
    build_text_index,
    refresh_text_index,
    search_text_index,
)

SF = "/root/testdata/sf0.001"


def test_text_search_index_matches_oracle(ray_session):
    import __ray_entry__ as entrymod

    name = "text_search_index"
    assert_matches_oracle(
        entrymod.queries()[name](SF), entrymod.oracle_sql()[name], SF
    )


def _event(lsn, conv, turn, text, op="insert"):
    return {
        "lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None, "ts": lsn,
    }


def _write_shard(path, events):
    cols = {k: [e[k] for e in events] for k in events[0]}
    t = pa.table(
        {
            "lsn": pa.array(cols["lsn"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    ).cast(EVENT_SCHEMA)
    pq.write_table(t, path)


def test_and_or_update_delete_semantics(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "tidx")
    s1 = str(tmp_path / "s1.parquet")
    _write_shard(
        s1,
        [
            _event(1, "a", 0, "red apple pie"),
            _event(2, "a", 1, "green tea"),
            _event(3, "b", 0, "red wine"),
            _event(4, "c", 0, "Apple RED"),  # case-folded at index time
        ],
    )
    replay([s1], lake, num_buckets=4, files_per_chunk=1)
    r = build_text_index(lake, idx)
    assert r.postings_written > 0

    def ids(tokens, mode):
        return search_text_index(idx, tokens, mode=mode)["conv_id"].to_pylist()

    assert ids(["red"], "all") == ["a", "b", "c"]
    assert ids(["red", "apple"], "all") == ["a", "c"]
    assert ids(["apple", "wine"], "any") == ["a", "b", "c"]
    # AND is per-CONVERSATION, across turns: "pie" (turn 0) and "tea"
    # (turn 1) both belong to conv a
    assert ids(["pie", "tea"], "all") == ["a"]
    assert ids(["REd"], "all") == ["a", "b", "c"]  # probe case-folds too
    assert ids(["missing"], "any") == []
    assert ids([], "any") == []

    # update retires a stale posting; delete drops the conv's contribution
    s2 = str(tmp_path / "s2.parquet")
    _write_shard(
        s2,
        [
            _event(5, "b", 0, "white wine", op="update"),
            _event(6, "c", 0, None, op="delete"),
        ],
    )
    replay([s2], lake, num_buckets=4, files_per_chunk=1)
    r2 = refresh_text_index(lake, idx)
    # only the buckets holding convs b and c recompute
    assert 1 <= r2.buckets_refreshed <= 2
    assert ids(["red"], "all") == ["a"]
    assert ids(["white", "wine"], "all") == ["b"]

    # incremental result ≡ full rebuild; nothing new ⇒ zero-bucket no-op
    idx_full = str(tmp_path / "tidx_full")
    build_text_index(lake, idx_full)
    assert (
        search_text_index(idx_full, ["red"], mode="any")["conv_id"].to_pylist()
        == ids(["red"], "any")
    )
    assert refresh_text_index(lake, idx).buckets_refreshed == 0


def test_index_follows_delete_and_purge(ray_session, tmp_path):
    """Retention lifecycle ops rewrite bucket file lists, so the
    fingerprint loop must pick them up: after delete_where a tombstoned
    conv leaves the posting lists on refresh; after purge_conv (physical
    rewrite) likewise — and the refresh touches only affected buckets."""
    from clinical_trials_etl_ray.pipelines.retention import (
        delete_where,
        purge_conv,
    )

    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "tidx")
    s1 = str(tmp_path / "s1.parquet")
    _write_shard(
        s1,
        [
            _event(1, "a", 0, "alpha common"),
            _event(2, "b", 0, "beta common"),
            _event(3, "c", 0, "gamma common"),
        ],
    )
    replay([s1], lake, num_buckets=4, files_per_chunk=1)
    build_text_index(lake, idx)

    def ids(tok):
        return search_text_index(idx, [tok], mode="any")["conv_id"].to_pylist()

    assert ids("common") == ["a", "b", "c"]

    delete_where(lake, conv_id="a")
    r = refresh_text_index(lake, idx)
    assert r.buckets_refreshed >= 1
    assert ids("common") == ["b", "c"] and ids("alpha") == []

    purge_conv(lake, "b")
    refresh_text_index(lake, idx)
    assert ids("common") == ["c"] and ids("beta") == []


def test_bm25_rank_matches_oracle(ray_session):
    import __ray_entry__ as entrymod

    name = "bm25_rank"
    assert_matches_oracle(
        entrymod.queries()[name](SF), entrymod.oracle_sql()[name], SF
    )


def test_bm25_ranking_order_and_salted_merge(ray_session, tmp_path):
    """Hand-built corpus: tf dominance ranks a repeated-token conv above a
    single-mention conv; a rare token outscores a common one (idf); the
    same corpus on a SALTED lake (conv split across sub-buckets, partial
    tf/dl folded before the nonlinear BM25 term) ranks identically."""
    from clinical_trials_etl_ray.stages.textindex import rank_text_index

    events = [
        _event(1, "hot", 0, "needle needle needle hay"),
        _event(2, "warm", 0, "needle hay hay hay"),
        _event(3, "cold", 0, "hay hay hay hay"),
        _event(4, "rare", 0, "zebra hay"),
        _event(5, "hot", 1, "needle again"),
    ]

    def build(lake, idx, salt):
        s = str(tmp_path / f"s_{salt}.parquet")
        _write_shard(s, events)
        replay([s], lake, num_buckets=4, files_per_chunk=1,
               hot_key_salt=salt)
        build_text_index(lake, idx)

    ranks = {}
    for salt in (1, 3):
        lake = str(tmp_path / f"lake{salt}")
        idx = str(tmp_path / f"idx{salt}")
        build(lake, idx, salt)
        got = rank_text_index(idx, ["needle"], k=10).to_pandas()
        assert list(got["conv_id"]) == ["hot", "warm"]  # tf 4 beats tf 1
        assert got["score"].iloc[0] > got["score"].iloc[1] > 0
        ranks[salt] = got
        # idf: the 1-conv token scores a hit above the every-conv token
        z = rank_text_index(idx, ["zebra"], k=10).to_pandas()
        h = rank_text_index(idx, ["hay"], k=10).to_pandas()
        assert z["score"].iloc[0] > h["score"].max()
        # top-k cut respects k
        assert len(rank_text_index(idx, ["hay"], k=2)) == 2
    import pandas as pd

    pd.testing.assert_frame_equal(ranks[1], ranks[3])


def test_follow_keeps_text_index_fresh(ray_session, tmp_path):
    """follow(tindex_dir=...): every ingest round ends with an
    incrementally refreshed index; a trickled late event becomes
    searchable after the next follow pass."""
    import shutil

    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.replay import follow
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    src = str(tmp_path / "src")
    write_binlog_shards(
        BinlogSpec(n_events=2_000, n_convs=40, seed=5), src, n_shards=4,
        parallel=False,
    )
    grow = tmp_path / "growing"
    grow.mkdir()
    for f in sorted(os.listdir(src)):
        shutil.copy(os.path.join(src, f), grow)
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "tidx")
    follow(str(grow), lake, poll_interval_s=0.05, idle_rounds=1,
           tindex_dir=idx, num_buckets=8, files_per_chunk=2,
           disorder_bound=0)
    # index state == a fresh full build over the followed lake
    idx_full = str(tmp_path / "tidx_full")
    build_text_index(lake, idx_full)
    probe_any = ["sentinel-token"]
    assert (
        search_text_index(idx, probe_any, mode="any")["conv_id"].to_pylist()
        == search_text_index(idx_full, probe_any, mode="any")["conv_id"].to_pylist()
    )

    trickle = str(grow / "zz_trickle.parquet")
    _write_shard(
        trickle, [_event(30_000_000, "conv_fresh", 0, "sentinel-token here")]
    )
    follow(str(grow), lake, poll_interval_s=0.05, idle_rounds=1,
           tindex_dir=idx, num_buckets=8, files_per_chunk=2,
           disorder_bound=0)
    assert search_text_index(idx, ["sentinel-token"], mode="any")[
        "conv_id"
    ].to_pylist() == ["conv_fresh"]


def test_bucket_postings_tf_sums_to_dl():
    """Invariant: per conversation, Σ tf over its postings == its dl
    (every non-empty token instance is counted exactly once) — the
    consistency BM25 relies on. Includes null/empty/multi-space text."""
    from clinical_trials_etl_ray.stages.textindex import bucket_postings

    live = pa.table(
        {
            "conv_id": ["a", "a", "b", "c", "d"],
            "text": [
                "x y x", "y  z", None, "", "solo",
            ],
        }
    )
    postings, doclens = bucket_postings(live)
    p = postings.to_pandas()
    d = doclens.to_pandas().set_index("conv_id")["dl"]
    sums = p.groupby("conv_id")["tf"].sum()
    assert sums.to_dict() == d.to_dict()
    assert d.to_dict() == {"a": 5, "d": 1}  # b/c have no tokens
    # tf aggregated across turns: 'x' twice in conv a's first turn
    assert int(p.set_index(["conv_id", "token"]).loc[("a", "x"), "tf"]) == 2
