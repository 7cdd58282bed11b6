"""Round-2 coverage (part 2): nested-column schema evolution through the
full replay path, per-section export, and the per-row validator/quarantine."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# nested struct/list payload columns through replay → merge → read
# ---------------------------------------------------------------------------

TOOL_CALLS_T = pa.list_(
    pa.struct([pa.field("name", pa.string()), pa.field("args", pa.string())])
)


def _shard(rows: list, path: str, with_nested: bool):
    cols = {
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": pa.array([r.get("role") for r in rows], pa.string()),
        "text": pa.array([r.get("text") for r in rows], pa.string()),
        "ts": pa.array(
            [np.datetime64(1_000_000 * (1_700_000_000 + r["lsn"]), "us")
             for r in rows], pa.timestamp("us")),
    }
    if with_nested:
        cols["tool_calls"] = pa.array(
            [r.get("tool_calls") for r in rows], TOOL_CALLS_T
        )
    pq.write_table(pa.table(cols), path)


def test_nested_column_evolution_through_replay(ray_session, tmp_path):
    from clinical_trials_etl_ray.pipelines.replay import compact, replay
    from clinical_trials_etl_ray.stages.merge import read_final_table

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    # epoch 1: no nested column at all (and no `tool` either)
    _shard(
        [
            {"lsn": 1, "op": "insert", "conv_id": "a", "turn_idx": 0,
             "role": "user", "text": "hi"},
            {"lsn": 2, "op": "insert", "conv_id": "a", "turn_idx": 1,
             "role": "assistant", "text": "hello"},
        ],
        str(binlog / "s0.parquet"), with_nested=False,
    )
    # epoch 2: shards now carry list<struct> tool_calls; one row updates an
    # epoch-1 key, one inserts a new key with nested payload
    _shard(
        [
            {"lsn": 3, "op": "update", "conv_id": "a", "turn_idx": 1,
             "role": "assistant", "text": "hello again",
             "tool_calls": [{"name": "search", "args": '{"q":"x"}'}]},
            {"lsn": 4, "op": "insert", "conv_id": "b", "turn_idx": 0,
             "role": "tool", "text": "result",
             "tool_calls": [{"name": "search", "args": "{}"},
                            {"name": "fetch", "args": '{"u":"y"}'}]},
        ],
        str(binlog / "s1.parquet"), with_nested=True,
    )

    lake = str(tmp_path / "lake")
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)
    t = pa.concat_tables(
        list(read_final_table(lake).iter_batches(batch_format="pyarrow"))
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    assert t.schema.field("tool_calls").type == TOOL_CALLS_T
    rows = t.to_pylist()
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [
        ("a", 0), ("a", 1), ("b", 0)
    ]
    assert rows[0]["tool_calls"] is None          # epoch-1 row: null-filled
    assert rows[1]["text"] == "hello again"       # LWW across epochs
    assert rows[1]["tool_calls"] == [{"name": "search", "args": '{"q":"x"}'}]
    assert [c["name"] for c in rows[2]["tool_calls"]] == ["search", "fetch"]

    # nested columns survive compaction (sorted base rewrite) identically
    compact(lake)
    t2 = pa.concat_tables(
        list(read_final_table(lake).iter_batches(batch_format="pyarrow"))
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert t2.equals(t)


def test_conflicting_evolved_types_raise(tmp_path):
    from clinical_trials_etl_ray.schema import union_event_schema

    a = pa.schema([pa.field("lsn", pa.int64()), pa.field("extra", pa.int64())])
    b = pa.schema([pa.field("lsn", pa.int64()), pa.field("extra", pa.string())])
    with pytest.raises(TypeError):
        union_event_schema([a, b])


# ---------------------------------------------------------------------------
# per-section export
# ---------------------------------------------------------------------------


def test_export_sections(ray_session, tmp_path):
    import ray.data

    from clinical_trials_etl_ray.sources.writers import export_sections

    ds = ray.data.read_parquet(os.path.join(SF, "orders.parquet"))
    out = str(tmp_path / "sections")
    res = export_sections(
        ds,
        out,
        sections={
            "pricing": ["o_totalprice", "o_orderdate"],
            "status": ["o_orderstatus", "o_orderpriority"],
        },
        key_cols=["o_orderkey"],
        fmt="json",
    )
    assert set(res) == {"pricing", "status", "combined"}
    n_rows = ds.count()
    for name, cols in [
        ("pricing", {"o_orderkey", "o_totalprice", "o_orderdate"}),
        ("status", {"o_orderkey", "o_orderstatus", "o_orderpriority"}),
    ]:
        lines = []
        for f in os.listdir(os.path.join(out, name)):
            with open(os.path.join(out, name, f)) as fh:
                lines += [json.loads(line) for line in fh if line.strip()]
        assert len(lines) == n_rows
        assert set(lines[0]) == cols


# ---------------------------------------------------------------------------
# per-row validation + quarantine
# ---------------------------------------------------------------------------


@pytest.fixture()
def dirty_events():
    rows = [
        # valid insert
        {"lsn": 1, "op": "insert", "conv_id": "a", "turn_idx": 0,
         "role": "user", "text": "ok", "tool": None, "ts": 1},
        # missing conv_id + empty text
        {"lsn": 2, "op": "insert", "conv_id": None, "turn_idx": 0,
         "role": "user", "text": "  ", "tool": None, "ts": 2},
        # bad op + negative turn
        {"lsn": 3, "op": "upsert", "conv_id": "b", "turn_idx": -1,
         "role": "user", "text": "x", "tool": None, "ts": 3},
        # delete tombstone: payload rules must NOT fire
        {"lsn": 4, "op": "delete", "conv_id": "a", "turn_idx": 0,
         "role": None, "text": None, "tool": None, "ts": 4},
        # missing ts + missing role
        {"lsn": 5, "op": "update", "conv_id": "c", "turn_idx": 2,
         "role": None, "text": "y", "tool": None, "ts": None},
    ]
    t = pa.table({
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": pa.array([r["role"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "tool": pa.array([r["tool"] for r in rows], pa.string()),
        "ts": pa.array(
            [None if r["ts"] is None else np.datetime64(r["ts"], "us")
             for r in rows], pa.timestamp("us")),
    })
    return t


def test_validate_batch_issue_lists(dirty_events):
    from clinical_trials_etl_ray.stages.validate import validate_batch

    v = validate_batch(dirty_events)
    got = {r["lsn"]: (r["valid"], r["issues"]) for r in v.to_pylist()}
    assert got[1] == (True, [])
    assert got[2] == (False, ["missing_conv_id", "empty_text"])
    assert got[3] == (False, ["negative_turn_idx", "invalid_op"])
    assert got[4] == (True, [])  # tombstone: no payload checks
    assert got[5] == (False, ["missing_ts", "missing_role"])


def test_quarantine_split_and_report(ray_session, dirty_events):
    import ray.data

    from clinical_trials_etl_ray.stages.validate import (
        issue_report,
        quarantine_split,
    )

    ds = ray.data.from_arrow(dirty_events)
    valid, quarantine = quarantine_split(ds)
    vt = pa.concat_tables(list(valid.iter_batches(batch_format="pyarrow")))
    qt = pa.concat_tables(list(quarantine.iter_batches(batch_format="pyarrow")))
    assert sorted(vt["lsn"].to_pylist()) == [1, 4]
    assert "issues" not in vt.column_names
    assert sorted(qt["lsn"].to_pylist()) == [2, 3, 5]
    assert "issues" in qt.column_names

    rep = issue_report(ray.data.from_arrow(dirty_events))
    assert rep["_rows_total"] == 5 and rep["_rows_invalid"] == 3
    assert rep["missing_conv_id"] == 1 and rep["invalid_op"] == 1


def test_validate_events_query_runs(ray_session):
    from clinical_trials_etl_ray.pipelines.cdc_queries import q_validate_events

    df = q_validate_events(SF).to_pandas()
    assert len(df) == 1_000  # sf0.001 events table
    assert set(df.columns) == {"lsn", "valid", "n_issues"}
    assert df["valid"].all()  # derived binlog is clean by construction
    assert (df["n_issues"] == 0).all()


# ---------------------------------------------------------------------------
# multimodal resize / frame-sample plumbing
# ---------------------------------------------------------------------------


def test_fake_resizer_and_frame_sampler(ray_session):
    import ray.data

    from clinical_trials_etl_ray.stages.multimodal import (
        FakeResizer,
        FrameSampler,
        synth_media_table,
    )

    t = synth_media_table(45, seed=9)
    ds = ray.data.from_arrow(t)

    resized = ds.map_batches(
        FakeResizer, batch_format="pyarrow", batch_size=16, concurrency=2,
        fn_constructor_kwargs={"target": 8, "source": 32},
    )
    rt = pa.concat_tables(list(resized.iter_batches(batch_format="pyarrow")))
    assert rt.num_rows == 45
    assert all(len(p) == 64 for p in rt["pixels"].to_pylist())
    assert rt["meta"].to_pylist()[0]["width"] == 8

    frames = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2,
        fn_constructor_kwargs={"n_frames": 4},
    )
    ft = pa.concat_tables(list(frames.iter_batches(batch_format="pyarrow")))
    kinds = t["kind"].to_pylist()
    n_video = sum(1 for k in kinds if k == "video")
    assert ft.num_rows == n_video * 4 + (45 - n_video)  # explode w/ FK
    vid = ft.filter(pa.compute.equal(ft["kind"], "video"))
    per = {}
    for mid, fi in zip(vid["media_id"].to_pylist(), vid["frame_idx"].to_pylist()):
        per.setdefault(mid, []).append(fi)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())


# ---------------------------------------------------------------------------
# tagged-variant columns (E4: variant-typed extractor results)
# ---------------------------------------------------------------------------


def test_variant_pack_roundtrip_and_parquet(tmp_path):
    import pyarrow.compute as pc

    from clinical_trials_etl_ray.functions.variant import (
        pack_variants,
        unpack_variants,
        variant_as_string,
        variant_kind,
    )

    vals = ["hello", 42, 3.5, ["a", "b"], None, True, []]
    arr = pack_variants(vals)
    back = unpack_variants(arr)
    assert back == ["hello", 42.0, 3.5, ["a", "b"], None, 1.0, []]
    assert variant_kind(arr).to_pylist() == [
        "str", "num", "num", "list", "null", "num", "list"
    ]
    rendered = variant_as_string(arr).to_pylist()
    assert rendered[0] == "hello" and rendered[3] == "a;b" and rendered[4] is None

    # parquet round-trip (unions can't do this; the tagged struct can)
    t = pa.table({"id": list(range(len(vals))), "v": arr})
    p = str(tmp_path / "v.parquet")
    pq.write_table(t, p)
    t2 = pq.read_table(p)
    assert unpack_variants(t2["v"].combine_chunks()) == back

    with pytest.raises(TypeError):
        pack_variants([{"a": 1}])
    with pytest.raises(TypeError):
        pack_variants([[1, 2]])  # list branch is list[str] — no silent str()


# ---------------------------------------------------------------------------
# HyperLogLog sketch (novel-sketch custom operator)
# ---------------------------------------------------------------------------


def test_hll_accuracy_and_merge_associativity():
    from clinical_trials_etl_ray.stages.sketch import HLLSketch

    rng = np.random.default_rng(5)
    vals = [f"v{int(x)}" for x in rng.integers(0, 50_000, size=200_000)]
    exact = len(set(vals))

    one = HLLSketch(p=12).add(vals)
    # split into 7 partials, merge — must equal the single-pass sketch
    acc = HLLSketch(p=12)
    for i in range(7):
        acc.merge(HLLSketch(p=12).add(vals[i::7]))
    assert (one.registers == acc.registers).all()

    est = one.estimate()
    assert abs(est - exact) / exact < 0.05  # ~3σ at p=12 (σ≈1.6%)

    # serialization round-trip
    back = HLLSketch.from_bytes(one.to_bytes(), 12)
    assert back.estimate() == est


def test_approx_distinct_operator(ray_session):
    import ray.data

    from clinical_trials_etl_ray.stages.sketch import approx_distinct

    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["user_id"])
    exact = len(ds.unique("user_id"))
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.05


# ---------------------------------------------------------------------------
# materialized IVF index (partition-pruned ANN reads)
# ---------------------------------------------------------------------------


def test_ivf_indexed_partition_pruning(ray_session, tmp_path):
    from tests.util_compare import canon, to_pandas

    from clinical_trials_etl_ray.stages.embed import (
        ann_topk,
        ann_topk_ivf_indexed,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(SF, idx, n_centroids=16)
    # every list partition exists on disk as its own directory
    parts = [d for d in os.listdir(os.path.join(idx, "data"))
             if d.startswith("ivf_list=")]
    assert len(parts) >= 2

    # all lists probed ⇒ exactly the brute-force result
    bf = canon(to_pandas(ann_topk(SF, n_queries=5, k=5)))
    full = canon(to_pandas(ann_topk_ivf_indexed(SF, idx, 5, 5, nprobe=16)))
    pd.testing.assert_frame_equal(bf, full, check_dtype=False)

    # small nprobe reads a strict subset of partitions and keeps recall
    approx = to_pandas(ann_topk_ivf_indexed(SF, idx, 5, 5, nprobe=4))
    bf_pairs = set(map(tuple, to_pandas(ann_topk(SF, 5, 5))[["qid", "vec_id"]].to_numpy()))
    ap_pairs = set(map(tuple, approx[["qid", "vec_id"]].to_numpy()))
    assert len(ap_pairs & bf_pairs) / len(bf_pairs) >= 0.5


def test_cross_run_evolution_uniform_read_schema(ray_session, tmp_path):
    """Schema evolved by a LATER run must appear on EVERY bucket's output
    (null-filled where absent) — the committed manifest schema governs the
    read, so exports carry one uniform schema (code-review r02 finding)."""
    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.stages.merge import read_final_table

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    # run 1: many keys, no nested column
    _shard(
        [{"lsn": i, "op": "insert", "conv_id": f"c{i}", "turn_idx": 0,
          "role": "user", "text": f"t{i}"} for i in range(20)],
        str(binlog / "s0.parquet"), with_nested=False,
    )
    lake = str(tmp_path / "lake")
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)

    # run 2 (separate replay): ONE new shard introduces tool_calls,
    # touching at most one bucket
    _shard(
        [{"lsn": 100, "op": "insert", "conv_id": "zz", "turn_idx": 0,
          "role": "tool", "text": "x",
          "tool_calls": [{"name": "f", "args": "{}"}]}],
        str(binlog / "s1.parquet"), with_nested=True,
    )
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)

    ds = read_final_table(lake)
    blocks = list(ds.iter_batches(batch_format="pyarrow"))
    # EVERY block (bucket) carries the evolved column — uniform schema
    assert all("tool_calls" in b.schema.names for b in blocks if b.num_rows)
    t = pa.concat_tables(blocks)
    assert t.num_rows == 21

    # the export round-trips with the evolved column intact
    out = str(tmp_path / "export")
    ds2 = read_final_table(lake)
    ds2.write_parquet(out)
    back = pq.read_table(out)
    assert "tool_calls" in back.schema.names
    assert back.num_rows == 21


def test_join_with_nested_payload_column(ray_session):
    """copartition_join over rows carrying a list<struct> payload (Acero
    rejects nested non-key columns; the pandas fallback must engage)."""
    import ray.data

    from clinical_trials_etl_ray.stages.join import copartition_join

    left = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "calls": pa.array(
            [[{"name": "a", "args": "{}"}], None,
             [{"name": "b", "args": "1"}, {"name": "c", "args": "2"}]],
            TOOL_CALLS_T,
        ),
    })
    right = pa.table({"k": pa.array([1, 3, 4], pa.int64()),
                      "rv": pa.array([10, 30, 40], pa.int64())})
    l_ds = ray.data.from_arrow(left)
    r_ds = ray.data.from_arrow(right)

    out = pa.concat_tables(
        list(copartition_join(l_ds, r_ds, on="k").iter_batches(
            batch_format="pyarrow"))
    ).sort_by("k")
    assert out["k"].to_pylist() == [1, 3]
    assert out["rv"].to_pylist() == [10, 30]
    assert out["calls"].to_pylist()[1][0]["name"] == "b"

    anti = pa.concat_tables(
        list(copartition_join(l_ds, r_ds, on="k", how="anti").iter_batches(
            batch_format="pyarrow"))
    )
    assert anti["k"].to_pylist() == [2]
    assert anti["calls"].to_pylist() == [None]


def test_nested_fallback_join_preserves_big_int64(ray_session):
    """The pandas fallback must not round-trip int64 through float64: ids
    above 2^53 have to survive exactly (code-review r02b finding)."""
    import ray.data

    from clinical_trials_etl_ray.stages.join import copartition_join

    big = [9007199254740993, 9007199254740995, 9007199254741001]  # > 2^53
    left = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "big_id": pa.array(big, pa.int64()),
        "calls": pa.array([[{"name": "x", "args": "{}"}]] * 3, TOOL_CALLS_T),
    })
    right = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                      "rv": pa.array([10, 20, 30], pa.int64())})
    out = pa.concat_tables(list(
        copartition_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                         on="k", how="left").iter_batches(batch_format="pyarrow")
    )).sort_by("k")
    assert out["big_id"].to_pylist() == big  # exact, no float rounding
    assert out.schema.field("big_id").type == pa.int64()
    assert out.schema.field("rv").type == pa.int64()
    assert out["rv"].to_pylist() == [10, 20, None]  # null key never matched


def test_legacy_lake_schema_not_narrowed(ray_session, tmp_path):
    """A lake whose manifests predate schema_ipc (evolved column types never
    recorded) must not have its schema narrowed by a later run whose shards
    lack the evolved column — recovery comes from committed file footers."""
    import glob
    import json as _json

    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.stages.merge import read_final_table

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    _shard(
        [{"lsn": 1, "op": "insert", "conv_id": "a", "turn_idx": 0,
          "role": "user", "text": "hi",
          "tool_calls": [{"name": "f", "args": "{}"}]}],
        str(binlog / "s0.parquet"), with_nested=True,
    )
    lake = str(tmp_path / "lake")
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)

    # simulate a pre-schema_ipc manifest (types were never recorded)
    vfile = sorted(glob.glob(os.path.join(lake, "manifest", "v*.json")))[-1]
    doc = _json.load(open(vfile))
    assert doc["schema_ipc"]
    doc["schema_ipc"] = None
    with open(vfile, "w") as f:
        _json.dump(doc, f)

    # a later run WITHOUT the evolved column must not narrow the schema
    _shard(
        [{"lsn": 2, "op": "insert", "conv_id": "b", "turn_idx": 0,
          "role": "user", "text": "yo"}],
        str(binlog / "s1.parquet"), with_nested=False,
    )
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)

    t = pa.concat_tables(
        list(read_final_table(lake).iter_batches(batch_format="pyarrow"))
    ).sort_by("conv_id")
    assert "tool_calls" in t.schema.names
    rows = t.to_pylist()
    assert rows[0]["tool_calls"] == [{"name": "f", "args": "{}"}]
    assert rows[1]["tool_calls"] is None

    # a NO-OP legacy run (all chunks skipped) must persist the recovered
    # schema so later runs don't repeat the footer sweep
    from clinical_trials_etl_ray.state.manifest import Manifest

    vfile2 = sorted(glob.glob(os.path.join(lake, "manifest", "v*.json")))[-1]
    doc2 = _json.load(open(vfile2))
    doc2["schema_ipc"] = None
    with open(vfile2, "w") as f:
        _json.dump(doc2, f)
    replay(str(binlog), lake, num_buckets=4, files_per_chunk=1)
    m = Manifest.load(lake)
    assert m.schema_ipc is not None
    assert m.metrics.get("schema_recovery") is True


# ---------------------------------------------------------------------------
# foreign-format binlog ingestion
# ---------------------------------------------------------------------------


def test_jsonl_binlog_converts_and_replays_identically(ray_session, tmp_path):
    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.sources.readers import (
        convert_binlog_shards,
        replay_external,
    )
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    pq_dir = str(tmp_path / "binlog_pq")
    write_binlog_shards(
        BinlogSpec(n_events=3_000, n_convs=30, seed=4, shuffle_window=32),
        pq_dir, n_shards=3, parallel=False,
    )
    # re-serialize each shard as JSONL (ISO timestamps)
    jl_dir = tmp_path / "binlog_jsonl"
    jl_dir.mkdir()
    import shutil

    shutil.copy(os.path.join(pq_dir, "_meta.json"), str(jl_dir / "_meta.json"))
    for f in sorted(os.listdir(pq_dir)):
        if not f.endswith(".parquet"):
            continue
        df = pq.read_table(os.path.join(pq_dir, f)).to_pandas()
        df.to_json(str(jl_dir / (os.path.splitext(f)[0] + ".jsonl")),
                   orient="records", lines=True, date_format="iso",
                   date_unit="us")

    conv_dir = str(tmp_path / "converted")
    paths = convert_binlog_shards(str(jl_dir), conv_dir, fmt="jsonl")
    assert len(paths) == 3
    assert os.path.exists(os.path.join(conv_dir, "_meta.json"))

    lake_a = str(tmp_path / "lake_native")
    lake_b = str(tmp_path / "lake_jsonl")
    replay(pq_dir, lake_a, num_buckets=8, files_per_chunk=2)
    replay_external(str(jl_dir), lake_b, fmt="jsonl",
                    work_dir=str(tmp_path / "work"),
                    num_buckets=8, files_per_chunk=2)
    key = ["conv_id", "turn_idx"]
    a = read_final_table(lake_a).to_pandas().sort_values(key).reset_index(drop=True)
    b = read_final_table(lake_b).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_approx_distinct_by_group(ray_session):
    import ray.data

    from clinical_trials_etl_ray.stages.sketch import approx_distinct_by

    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["event_type", "user_id"])
    got = approx_distinct_by(ds, "event_type", "user_id", p=12).to_pandas()
    exact = (
        ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                              columns=["event_type", "user_id"])
        .to_pandas().groupby("event_type")["user_id"].nunique()
    )
    assert set(got["event_type"]) == set(exact.index)
    for _, row in got.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - e) / max(e, 1) < 0.08


def test_csv_binlog_nulls_and_epoch_rejection(ray_session, tmp_path):
    """CSV ingestion must keep empty cells NULL (delete tombstones), and
    bare epoch-integer timestamps must be rejected, not misread as us."""
    from clinical_trials_etl_ray.sources.readers import convert_binlog_shards

    src = tmp_path / "csv_src"
    src.mkdir()
    (src / "events-0.csv").write_text(
        "lsn,op,conv_id,turn_idx,role,text,ts\n"
        "1,insert,a,0,user,hi,2023-11-14T22:13:20.000001\n"
        "2,delete,a,0,,,2023-11-14T22:13:21\n"
    )
    out = str(tmp_path / "csv_pq")
    paths = convert_binlog_shards(str(src), out, fmt="csv", parallel=False)
    t = pq.read_table(paths[0])
    assert t["role"].to_pylist() == ["user", None]  # '' would break deletes
    assert t["text"].to_pylist() == ["hi", None]
    assert t["ts"].to_pylist()[0].microsecond == 1

    bad = tmp_path / "csv_bad"
    bad.mkdir()
    (bad / "events-0.csv").write_text(
        "lsn,op,conv_id,turn_idx,role,text,ts\n1,insert,a,0,u,x,1700000000000\n"
    )
    with pytest.raises(ValueError, match="epoch"):
        convert_binlog_shards(str(bad), str(tmp_path / "csv_bad_pq"),
                              fmt="csv", parallel=False)


def test_shard_stem_collisions_rejected(tmp_path):
    from clinical_trials_etl_ray.sources.readers import convert_binlog_shards

    src = tmp_path / "collide"
    src.mkdir()
    (src / "a.jsonl").write_text('{"lsn": 1}\n')
    (src / "a.ndjson").write_text('{"lsn": 2}\n')
    with pytest.raises(ValueError, match="collide"):
        convert_binlog_shards(str(src), str(tmp_path / "out"),
                              fmt="jsonl", parallel=False)
