"""Log-binned quantile sketch (stages/sketch.py approx_quantiles_by).

Pins: the reported quantile is within rel_err (relatively) of the exact
DuckDB quantile_disc on the same data; results are IDENTICAL at different
parallelisms (fixed bins + commutative merges — the determinism property
KLL/t-digest lack); zero/negative/null values are handled; the bin
code/value kernels are exact inverses within the error bound.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from clinical_trials_etl_ray.stages.sketch import (
    approx_quantiles_by,
    quantile_bin_codes,
    quantile_bin_value,
)

SF = "/root/testdata/sf0.001"


def test_bin_kernels_error_bound_and_specials():
    rng = np.random.default_rng(42)
    v = np.concatenate(
        [rng.lognormal(4, 3, 20_000), [0.0, 1e-9, -1e-9, -12345.6, 1e12]]
    )
    for rel_err in (0.05, 0.01, 0.001):
        codes = quantile_bin_codes(v, rel_err)
        rep = quantile_bin_value(codes, rel_err)
        nz = v != 0
        assert np.abs(rep[nz] / v[nz] - 1).max() <= rel_err * 1.001
        assert (rep[v == 0] == 0).all()
        assert (np.sign(rep) == np.sign(v)).all()


def _exact_quantiles(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        "SELECT lang, count(n_chars) AS n, "
        "quantile_disc(n_chars, 0.5) AS q50, "
        "quantile_disc(n_chars, 0.9) AS q90, "
        "quantile_disc(n_chars, 0.99) AS q99 "
        "FROM t WHERE n_chars IS NOT NULL GROUP BY lang ORDER BY lang"
    ).fetchdf()


@pytest.mark.parametrize("rel_err", [0.01, 0.05])
def test_grouped_sketch_within_error_of_duckdb_exact(ray_session, rel_err):
    import ray.data

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "n_chars"]
    )
    got = (
        approx_quantiles_by(ds, "lang", "n_chars", rel_err=rel_err)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    exact = _exact_quantiles(
        pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    )
    assert list(got["lang"]) == list(exact["lang"])
    assert (got["n"].to_numpy() == exact["n"].to_numpy()).all()
    for c in ("q50", "q90", "q99"):
        a = got[c].to_numpy()
        b = exact[c].to_numpy().astype(float)
        # the sketch's answer is within rel_err of SOME true rank element;
        # for discrete data the exact rank element itself satisfies that
        assert np.abs(a / b - 1).max() <= rel_err * 1.001, c


def test_sketch_deterministic_across_parallelism(ray_session):
    import ray.data

    base = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "n_chars"]
    )
    a = (
        approx_quantiles_by(base, "lang", "n_chars")
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    b = (
        approx_quantiles_by(base.repartition(13), "lang", "n_chars")
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_sketch_handles_nulls_zero_and_negatives(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 3,
            "v": [0.0, -5.0, -5.0, 10.0, 10.0, None, 7.0, None, 7.0],
        }
    )
    got = (
        approx_quantiles_by(ray.data.from_pandas(df), "g", "v", qs=(0.5,))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # nulls excluded from n; group b median ~7
    assert list(got["n"]) == [5, 2]
    assert abs(got.loc[1, "q50"] / 7.0 - 1) <= 0.01
    # group a: sorted [-5,-5,0,10,10], rank ceil(.5*5)=3 → 0
    assert got.loc[0, "q50"] == 0.0


def test_bin_roundtrip_property():
    """Property (hypothesis): for ANY finite nonzero float, the bin
    representative is within rel_err relatively, sign-preserving, and the
    code is monotone in |v| within a sign class (so cumulative-histogram
    walks order correctly)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(
            min_value=1e-300, max_value=1e300,
            allow_nan=False, allow_infinity=False,
        ),
        st.sampled_from([1.0, -1.0]),
        st.sampled_from([0.05, 0.01, 0.001]),
    )
    def check(mag, sgn, rel_err):
        v = np.array([sgn * mag])
        code = quantile_bin_codes(v, rel_err)
        rep = quantile_bin_value(code, rel_err)
        assert abs(rep[0] / v[0] - 1) <= rel_err * (1 + 1e-9)
        assert np.sign(rep[0]) == np.sign(v[0])
        # monotonicity: a value 2/rel_err times larger never gets a
        # smaller code (same sign)
        if mag < 1e299:
            v2 = np.array([sgn * mag * (1 + 3 * rel_err)])
            c2 = quantile_bin_codes(v2, rel_err)
            assert (c2[0] >= code[0]) if sgn > 0 else (c2[0] <= code[0])

    check()
