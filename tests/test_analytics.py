"""Analytics operators vs DuckDB oracle at sf0.001 (driver-style compare)."""

import pytest

from clinical_trials_etl_ray.pipelines import analytics as an
from tests.util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", [n for n in an.QUERIES if n in an.ORACLE_SQL]
)
def test_analytics_matches_oracle(ray_session, name):
    result = an.QUERIES[name](SF)
    assert_matches_oracle(result, an.ORACLE_SQL[name], SF)


@pytest.mark.parametrize(
    "name", [n for n in an.QUERIES if n not in an.ORACLE_SQL]
)
def test_analytics_rows_only_runs(ray_session, name):
    """Rows-only (approximate-by-design) entries: must execute and return
    a non-empty, stably-typed result; their accuracy bounds are pinned in
    their dedicated test files (e.g. test_quantile_sketch.py)."""
    df = an.QUERIES[name](SF).to_pandas()
    assert len(df) > 0 and len(df.columns) > 0


def test_explode_handles_sliced_and_null_slots():
    """Arrow list arrays may carry null slots whose offset span is nonzero,
    and nonzero start offsets after slicing; explode must not emit their
    children nor misalign parents."""
    import pyarrow as pa

    from clinical_trials_etl_ray.stages.explode import explode_list_column

    offsets = pa.array([0, 2, 5, 5, 7], pa.int32())
    values = pa.array(["a", "b", "c", "d", "e", "f", "g"])
    lst = pa.ListArray.from_arrays(
        offsets, values, mask=pa.array([False, True, False, False])
    )
    t = pa.table({"k": pa.array([10, 20, 30, 40]), "v": lst})
    out = explode_list_column(t, "v", keep=["k"], value_name="x")
    assert out["k"].to_pylist() == [10, 10, 40, 40]
    assert out["x"].to_pylist() == ["a", "b", "f", "g"]

    sliced = t.slice(1, 3)
    out2 = explode_list_column(sliced, "v", keep=["k"], value_name="x")
    assert out2["k"].to_pylist() == [40, 40]
    assert out2["x"].to_pylist() == ["f", "g"]


def test_semi_anti_join_kernel(ray_session):
    """Direct kernel check of copartition semi/anti on a synthetic case with
    an empty bucket and keys absent from the build side."""
    import ray.data

    from clinical_trials_etl_ray.stages.join import copartition_join

    left = ray.data.from_items([{"k": i, "a": i * 10} for i in range(20)])
    right = ray.data.from_items([{"k": i} for i in range(0, 20, 3)])
    semi = copartition_join(left, right, on="k", how="semi").to_pandas()
    anti = copartition_join(left, right, on="k", how="anti").to_pandas()
    assert sorted(semi["k"]) == list(range(0, 20, 3))
    assert sorted(anti["k"]) == sorted(set(range(20)) - set(range(0, 20, 3)))
    assert len(semi) + len(anti) == 20
