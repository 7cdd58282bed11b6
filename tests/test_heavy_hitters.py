"""Misra-Gries heavy hitters (stages/sketch.py): candidate guarantee,
merge associativity, and the exact two-pass query."""

import numpy as np
import pyarrow as pa
import pytest

from clinical_trials_etl_ray.stages.sketch import (
    heavy_hitters,
    mg_compress,
    mg_merge,
)


def test_mg_compress_guarantee():
    """Every key with frequency > n/(k+1) keeps a positive counter."""
    rng_keys = [f"k{i}" for i in range(1000)]
    keys = np.array(["hot"] * 300 + rng_keys, dtype=object)
    counts = np.ones(len(keys), dtype=np.int64)
    uk, inv = np.unique(keys.astype(str), return_inverse=True)
    sums = np.zeros(len(uk), dtype=np.int64)
    np.add.at(sums, inv, counts)
    ck, cc = mg_compress(uk, sums, k=16)
    assert "hot" in set(ck)
    assert len(ck) <= 16


def test_mg_merge_spread_thin_heavy_key():
    """Adversarial: the heavy key is spread thin across many summaries,
    each dominated by distinct singleton noise — merging must still keep
    it (the mergeable-summaries property a naive per-batch top-k lacks)."""
    k = 8
    parts = []
    for i in range(50):
        keys = np.array(["hot"] + [f"noise{i}_{j}" for j in range(40)],
                        dtype=object)
        counts = np.array([3] + [1] * 40, dtype=np.int64)
        parts.append(mg_compress(keys, counts, k))
    mk, mc = mg_merge(parts, k)
    assert "hot" in set(mk)  # 150 of 2050 rows (~7%) >> n/(k+1)


def test_mg_merge_partition_invariant_property():
    """Property: for any key population and any partitioning of it into
    summaries, every phi-heavy key survives the merge (k >= 1/phi), and
    surviving counters never exceed true counts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                      max_size=400),
        n_parts=st.integers(min_value=1, max_value=8),
        k=st.integers(min_value=10, max_value=24),
    )
    def check(keys, n_parts, k):
        arr = np.array([f"k{v}" for v in keys], dtype=object)
        bounds = np.linspace(0, len(arr), n_parts + 1).astype(int)
        parts = []
        for i in range(n_parts):
            seg = arr[bounds[i]:bounds[i + 1]]
            if len(seg) == 0:
                continue
            uk, cnt = np.unique(seg.astype(str), return_counts=True)
            parts.append(mg_compress(uk, cnt.astype(np.int64), k))
        mk, mc = mg_merge(parts, k)
        merged = dict(zip(mk.tolist(), mc.tolist()))
        uk, cnt = np.unique(arr.astype(str), return_counts=True)
        true = dict(zip(uk.tolist(), cnt.tolist()))
        n = len(arr)
        for key, c in true.items():
            if c * (k + 1) > n:  # freq > n/(k+1) ⇒ must survive
                assert key in merged, (key, c, n, k)
        for key, c in merged.items():
            assert c <= true[key]  # MG counters underestimate

    check()


def test_heavy_hitters_exact_counts(ray_session):
    """Planted skew: the two-pass query returns EXACTLY the phi-heavy keys
    with exact counts, invariant to block layout."""
    import ray.data

    rows = (["alpha"] * 500 + ["beta"] * 120 + ["gamma"] * 79
            + [f"tail{i}" for i in range(301)])
    total = len(rows)  # 1000
    t = pa.table({"conv_id": pa.array(rows, pa.string())})
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = heavy_hitters(ds, "conv_id", phi_denom=10)  # >= 100 rows
        got = dict(zip(out["key"].to_pylist(), out["n"].to_pylist()))
        assert got == {"alpha": 500, "beta": 120}
        # sorted by (n desc, key)
        assert out["key"].to_pylist() == ["alpha", "beta"]


def test_heavy_hitters_matches_oracle(ray_session):
    """Driver-contract pin for the tail entry "heavy_hitter_convs" (the
    50-slot window is full)."""
    import __ray_entry__ as entrymod
    from util_compare import assert_matches_oracle

    sf = "/root/testdata/sf0.001"
    q = entrymod.queries()["heavy_hitter_convs"]
    sql = entrymod.oracle_sql()["heavy_hitter_convs"]
    assert_matches_oracle(q(sf), sql, sf)
