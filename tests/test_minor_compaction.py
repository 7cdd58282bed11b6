"""Minor (delta-only) compaction: fold delta files into one consolidated
delta per bucket WITHOUT rewriting the base — O(data since last compaction),
the steady-state maintenance pass for a lake under continuous ingest.

Pinned here: result equivalence (final table identical before/after), base
files untouched byte-for-byte, file-count reduction, tombstone retention
(deletes stay deleted), the major+minor interleaving a real lake runs, and
the tombstone-horizon refusal (dropping a tombstone without rewriting the
base would resurrect the deleted key).
"""

import os

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _final(lake: str) -> pd.DataFrame:
    df = read_final_table(lake).to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _files(lake: str) -> list:
    man = Manifest.load(lake)
    return [f for b in range(man.num_buckets) for f in man.files_for_bucket(b)]


@pytest.fixture()
def grown_lake(ray_session, tmp_path):
    """A lake ingested in two generations so buckets hold many deltas."""
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=6_000, n_convs=40, seed=21, delete_rate=0.1,
        duplicate_rate=0.05, shuffle_window=32,
    )
    write_binlog_shards(spec, binlog, n_shards=6, parallel=False)
    lake = str(tmp_path / "lake")
    shards = sorted(
        os.path.join(binlog, f)
        for f in os.listdir(binlog)
        if f.endswith(".parquet")
    )
    replay(shards, lake, num_buckets=4, files_per_chunk=1)
    return lake


def test_minor_compaction_equivalence_and_fan_in(grown_lake):
    want = _final(grown_lake)
    before = _files(grown_lake)
    assert len([f for f in before if f["kind"] == "delta"]) > 4

    n = compact(grown_lake, mode="minor")
    assert n == 4  # every bucket had ≥2 deltas
    after = _files(grown_lake)
    man = Manifest.load(grown_lake)
    for b in range(man.num_buckets):
        deltas = [f for f in man.files_for_bucket(b) if f["kind"] == "delta"]
        assert len(deltas) == 1  # consolidated
    assert len(after) < len(before)
    pd.testing.assert_frame_equal(_final(grown_lake), want)

    # already consolidated: a second minor pass is a no-op (min_files=2)
    assert compact(grown_lake, mode="minor") == 0


def test_minor_leaves_base_untouched_and_interleaves_with_major(
    grown_lake, tmp_path
):
    want = _final(grown_lake)
    compact(grown_lake)  # major: one base per bucket
    bases = {
        f["path"]: f["content_hash"]
        for f in _files(grown_lake)
        if f["kind"] == "base"
    }
    assert bases

    # new ingest generation (LSNs shifted past gen 1) lands fresh deltas
    # on top of the bases
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    raw = str(tmp_path / "binlog2_raw")
    spec2 = BinlogSpec(
        n_events=3_000, n_convs=40, seed=22, delete_rate=0.1,
        shuffle_window=32,
    )
    write_binlog_shards(spec2, raw, n_shards=4, parallel=False)
    binlog2 = str(tmp_path / "binlog2")
    os.makedirs(binlog2)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pc.add(t.column("lsn"), pa.scalar(10_000))
            )
            pq.write_table(t, os.path.join(binlog2, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(binlog2, name))
    replay(binlog2, grown_lake, num_buckets=4, files_per_chunk=1)
    want2 = _final(grown_lake)

    n = compact(grown_lake, mode="minor")
    assert n >= 1
    after = _files(grown_lake)
    got_bases = {
        f["path"]: f["content_hash"] for f in after if f["kind"] == "base"
    }
    assert got_bases == bases  # minor never rewrites a base
    for path in bases:
        assert os.path.exists(os.path.join(grown_lake, path))
    pd.testing.assert_frame_equal(_final(grown_lake), want2)
    assert len(want2) >= len(want)


def test_minor_retains_tombstones_and_refuses_horizon(grown_lake):
    """Deleted keys stay deleted through minor compaction, and the
    tombstone-horizon knob is refused outright in minor mode."""
    man = Manifest.load(grown_lake)
    import pyarrow.parquet as pq

    # the synth log has deletes; some winner must be a tombstone
    has_tombstone_winner = False
    from clinical_trials_etl_ray.stages.merge import resolve_bucket

    for b in range(man.num_buckets):
        t = resolve_bucket(grown_lake, b, man.files_for_bucket(b))
        if (t.column("op").to_pandas() == "delete").any():
            has_tombstone_winner = True
            break
    assert has_tombstone_winner

    want = _final(grown_lake)
    compact(grown_lake, mode="minor")
    pd.testing.assert_frame_equal(_final(grown_lake), want)

    # consolidated deltas still carry the tombstones
    man = Manifest.load(grown_lake)
    any_delete = False
    for b in range(man.num_buckets):
        for f in man.files_for_bucket(b):
            if f["kind"] != "delta":
                continue
            t = pq.read_table(
                os.path.join(grown_lake, f["path"]), columns=["op"]
            )
            if (t.column("op").to_pandas() == "delete").any():
                any_delete = True
    assert any_delete

    with pytest.raises(ValueError, match="minor"):
        compact(grown_lake, mode="minor", tombstone_horizon_us=1)
