"""Generator determinism + oracle semantics (no Ray needed)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from clinical_trials_etl_ray.oracle import oracle_final_table, replay_events, final_table
from clinical_trials_etl_ray.schema import EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from clinical_trials_etl_ray.synth import BinlogSpec, generate_events, write_binlog_shards


def test_generator_deterministic():
    spec = BinlogSpec(n_events=2000, seed=7, duplicate_rate=0.05, shuffle_window=64)
    a = generate_events(spec)
    b = generate_events(spec)
    assert a.equals(b)
    assert a.schema.equals(EVENT_SCHEMA)


def test_generator_knobs():
    spec = BinlogSpec(n_events=5000, delete_rate=0.1, update_rate=0.3, evolution_frac=0.4)
    t = generate_events(spec)
    ops = t["op"].to_pylist()
    n = len(ops)
    assert 0.05 < ops.count("delete") / n < 0.15
    assert 0.2 < ops.count("update") / n < 0.4
    # tool null before evolution_lsn
    pre = t.filter(pc.less(t["lsn"], spec.evolution_lsn))
    assert pc.count(pre["tool"], mode="only_valid").as_py() == 0
    post = t.filter(pc.greater_equal(t["lsn"], spec.evolution_lsn))
    assert pc.count(post["tool"], mode="only_valid").as_py() > 0
    # lsn unique
    assert len(set(t["lsn"].to_pylist())) == n
    # deletes carry null payload
    dels = t.filter(pc.equal(t["op"], "delete"))
    assert pc.count(dels["text"], mode="only_valid").as_py() == 0


def test_oracle_order_independent():
    spec = BinlogSpec(n_events=3000, duplicate_rate=0.1, shuffle_window=128, seed=3)
    t = generate_events(spec)
    fwd = oracle_final_table(t)
    rev = oracle_final_table(t.take(pa.array(list(reversed(range(t.num_rows))))))
    assert fwd.equals(rev)
    assert fwd.schema.equals(TRANSCRIPT_SCHEMA)
    assert fwd.num_rows > 0


def test_oracle_lww_and_delete():
    import datetime

    def ev(lsn, op, conv, turn, text, ts_s):
        return {
            "lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
            "role": None if op == "delete" else "user",
            "text": None if op == "delete" else text, "tool": None,
            "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts_s),
        }

    rows = [
        ev(1, "insert", "a", 0, "v1", 10),
        ev(2, "update", "a", 0, "v2", 30),   # winner: latest ts
        ev(3, "update", "a", 0, "stale", 20),  # higher lsn but older ts → loses
        ev(4, "insert", "b", 0, "keep", 5),
        ev(5, "delete", "b", 1, None, 50),
        ev(6, "insert", "b", 1, "late-but-old", 40),  # delete wins on ts
    ]
    t = pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    out = oracle_final_table(t)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.to_pylist()}
    assert got == {("a", 0): "v2", ("b", 0): "keep"}


def test_oracle_watermark_skip():
    spec = BinlogSpec(n_events=1000, seed=5)
    t = generate_events(spec)
    state = replay_events(t, min_lsn_exclusive=499)
    assert all(r["lsn"] > 499 for r in state.values())


def test_shard_writer_schema_evolution(tmp_path):
    spec = BinlogSpec(n_events=4000, evolution_frac=0.5, seed=9)
    paths = write_binlog_shards(spec, str(tmp_path), n_shards=8)
    assert len(paths) == 8
    schemas = [pq.read_schema(p) for p in paths]
    assert any("tool" not in s.names for s in schemas)   # early shards are v0
    assert any("tool" in s.names for s in schemas)
    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == 4000


def test_parallel_shard_writer_identical(ray_session, tmp_path):
    """Parallel (Ray-task) shard generation must be byte-identical to the
    serial path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    spec = BinlogSpec(n_events=30_000, n_convs=200, seed=9,
                      duplicate_rate=0.02, shuffle_window=128)
    d1, d2 = str(tmp_path / "serial"), str(tmp_path / "parallel")
    p1 = write_binlog_shards(spec, d1, n_shards=8, parallel=False)
    p2 = write_binlog_shards(spec, d2, n_shards=8, parallel=True)
    assert len(p1) == len(p2) == 8
    for a, b in zip(sorted(p1), sorted(p2)):
        ta, tb = pq.read_table(a), pq.read_table(b)
        assert ta.schema.equals(tb.schema), (a, b)
        assert ta.equals(tb), (a, b)
