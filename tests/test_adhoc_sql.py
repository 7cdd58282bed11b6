"""Ad-hoc SQL over the lake (pipelines/adhoc.sql_on_lake): DuckDB on a
streaming Arrow reader; results equal pandas computed on the same state."""

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.adhoc import sql_on_lake
from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


@pytest.fixture()
def lake(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=4_000, n_convs=30, seed=3, delete_rate=0.05,
                      shuffle_window=32)
    write_binlog_shards(spec, binlog, n_shards=3, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)
    return lake


def test_sql_aggregate_matches_pandas(lake):
    live = read_final_table(lake).to_pandas()
    want = (
        live.groupby("role").size().rename("n").reset_index()
        .sort_values("role").reset_index(drop=True)
    )
    got = (
        sql_on_lake(lake, "SELECT role, COUNT(*) AS n FROM final "
                          "GROUP BY role ORDER BY role")
        .to_pandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sql_filter_and_time_travel(lake):
    from clinical_trials_etl_ray.pipelines.retention import delete_where
    from clinical_trials_etl_ray.state.manifest import Manifest

    v_before = Manifest.load(lake).version
    n_before = sql_on_lake(lake, "SELECT COUNT(*) AS n FROM final")["n"][0].as_py()
    delete_where(lake, conv_range=("c1", "c19"))
    n_after = sql_on_lake(lake, "SELECT COUNT(*) AS n FROM final")["n"][0].as_py()
    assert n_after < n_before
    # time travel: the pre-delete snapshot still answers
    n_tt = sql_on_lake(
        lake, "SELECT COUNT(*) AS n FROM final", version=v_before
    )["n"][0].as_py()
    assert n_tt == n_before


def test_sql_empty_lake_predicate(lake):
    out = sql_on_lake(
        lake,
        "SELECT COUNT(*) AS n FROM final",
        conv_range=("zzz", "zzzz"),  # matches nothing
    )
    assert out["n"][0].as_py() == 0


def test_render_lake_matches_pandas(lake):
    from clinical_trials_etl_ray.pipelines.adhoc import render_lake

    live = read_final_table(lake).to_pandas()

    def render_pd(df):
        df = df.sort_values("turn_idx", kind="mergesort")
        return "\n".join(df["role"].astype(str) + ": " + df["text"].fillna(""))

    want = (
        live.groupby("conv_id")
        .apply(render_pd, include_groups=False)
        .rename("transcript").reset_index()
        .sort_values("conv_id").reset_index(drop=True)
    )
    got = (
        render_lake(lake).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    assert (got["n_turns"] > 0).all()
    pd.testing.assert_frame_equal(
        got[["conv_id", "transcript"]], want, check_dtype=False
    )
