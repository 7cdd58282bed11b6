"""Column-projection pushdown on the lake read path (stages/merge.py):
read_final_table(columns=[...]) decodes only key + requested columns from
Parquet. At transcript scale the text column IS the table — an aggregate
over roles must not move it off disk. LWW is decided entirely by KEY_COLS,
so projection can never change winners.
"""

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


@pytest.fixture()
def proj_lake(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=5_000, n_convs=50, seed=41, delete_rate=0.1,
        duplicate_rate=0.05, shuffle_window=32,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=2)
    return lake


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_projection_matches_full_read(proj_lake):
    full = _sorted(read_final_table(proj_lake).to_pandas())
    got = _sorted(read_final_table(proj_lake, columns=["role"]).to_pandas())
    assert sorted(got.columns) == sorted(["conv_id", "turn_idx", "ts", "role"])
    pd.testing.assert_frame_equal(got, full[got.columns])

    # composes with predicates and compaction
    compact(proj_lake)
    got2 = _sorted(
        read_final_table(
            proj_lake, columns=["role"], conv_range=("c1", "c3")
        ).to_pandas()
    )
    want2 = full[(full["conv_id"] >= "c1") & (full["conv_id"] <= "c3")]
    pd.testing.assert_frame_equal(got2, _sorted(want2[got2.columns]))


def test_projection_skips_missing_evolved_columns(ray_session, tmp_path):
    """Requesting an evolved column that pre-evolution files lack must not
    error: those files skip it at the Parquet read and the unification
    null-fills."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _shard(rows, path, with_extra):
        cols = {
            "lsn": pa.array([r for r, _ in rows], pa.int64()),
            "op": pa.array(["insert"] * len(rows), pa.string()),
            "conv_id": pa.array([c for _, c in rows], pa.string()),
            "turn_idx": pa.array([r for r, _ in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([f"t{r}" for r, _ in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(10**6 * (1_700_000_000 + r), "us")
                 for r, _ in rows], pa.timestamp("us")),
        }
        if with_extra:
            cols["score"] = pa.array(
                [float(r) for r, _ in rows], pa.float64()
            )
        pq.write_table(pa.table(cols), path)

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    _shard([(i, f"c{i % 2}") for i in range(4)],
           str(binlog / "s0.parquet"), with_extra=False)
    _shard([(4 + i, f"c{i % 2}") for i in range(4)],
           str(binlog / "s1.parquet"), with_extra=True)
    lake = str(tmp_path / "lake")
    replay(str(binlog), lake, num_buckets=2)

    got = read_final_table(lake, columns=["score"]).to_pandas()
    assert sorted(got.columns) == sorted(
        ["conv_id", "turn_idx", "ts", "score"]
    )
    assert got["score"].notna().sum() == 4
    assert got["score"].isna().sum() == 4
