"""Incremental IVF index maintenance (stages/embed.ivf_index_add): build
on half the corpus, add the other half, and searches over the grown index
equal brute force at nprobe=C (exactness is codebook-independent there)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinical_trials_etl_ray.stages.embed import (
    ann_topk,
    ann_topk_ivf_indexed,
    build_ivf_index,
    ivf_index_add,
)

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(["qid", "vec_id"]).reset_index(drop=True)


def test_build_half_add_rest_equals_brute_force(ray_session, tmp_path):
    src = os.path.join(SF, "embeddings.parquet")
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    half = t.num_rows // 2

    half_sf = tmp_path / "half_sf"
    half_sf.mkdir()
    pq.write_table(t.slice(0, half), str(half_sf / "embeddings.parquet"))
    rest = tmp_path / "rest.parquet"
    pq.write_table(t.slice(half), str(rest))

    index_dir = str(tmp_path / "ivf")
    build_ivf_index(str(half_sf), index_dir, n_centroids=8)
    added = ivf_index_add(index_dir, str(rest))
    assert added == t.num_rows - half

    # nprobe = C probes every list: results must equal brute force over
    # the FULL corpus regardless of which half seeded the codebook
    got = _df(ann_topk_ivf_indexed(SF, index_dir, n_queries=5, k=5, nprobe=8))
    want = _df(ann_topk(SF, n_queries=5, k=5))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_build_with_refined_codebook_stays_exact(ray_session, tmp_path):
    """refine_iters moves the centroids (different partitioning) but
    nprobe=C results stay exactly brute force — codebook-independence of
    the exactness bound."""
    index_dir = str(tmp_path / "ivf_refined")
    build_ivf_index(SF, index_dir, n_centroids=8, refine_iters=2)
    got = _df(ann_topk_ivf_indexed(SF, index_dir, n_queries=5, k=5, nprobe=8))
    want = _df(ann_topk(SF, n_queries=5, k=5))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_add_is_pure_append(ray_session, tmp_path):
    """Adding never rewrites existing index files (incremental, O(new))."""
    src = os.path.join(SF, "embeddings.parquet")
    t = pq.read_table(src, columns=["vec_id", "embedding"])

    half_sf = tmp_path / "half_sf"
    half_sf.mkdir()
    pq.write_table(t.slice(0, t.num_rows // 2),
                   str(half_sf / "embeddings.parquet"))
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(str(half_sf), index_dir, n_centroids=4)

    def snapshot():
        out = {}
        data = os.path.join(index_dir, "data")
        for dp, _, fs in os.walk(data):
            for f in fs:
                p = os.path.join(dp, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = snapshot()
    rest = tmp_path / "rest.parquet"
    pq.write_table(t.slice(t.num_rows // 2), str(rest))
    ivf_index_add(index_dir, str(rest))
    after = snapshot()
    for p, meta in before.items():
        assert after[p] == meta  # untouched
    assert len(after) > len(before)  # new files appended


def test_resplit_ivf_index_stays_exact(ray_session, tmp_path):
    """Re-splitting at a wider list count from the index's OWN stored
    vectors (the ANN rebucket: no corpus re-read — the function takes no
    corpus path at all) preserves every vector, and nprobe=C' results over
    the new layout equal brute force; the old index keeps serving until
    the caller swaps directories."""
    from clinical_trials_etl_ray.stages.embed import (
        ivf_list_rows,
        resplit_ivf_index,
    )

    src = os.path.join(SF, "embeddings.parquet")
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    half = t.num_rows // 2

    half_sf = tmp_path / "half_sf"
    half_sf.mkdir()
    pq.write_table(t.slice(0, half), str(half_sf / "embeddings.parquet"))
    rest = tmp_path / "rest.parquet"
    pq.write_table(t.slice(half), str(rest))

    index_dir = str(tmp_path / "ivf4")
    build_ivf_index(str(half_sf), index_dir, n_centroids=4)
    ivf_index_add(index_dir, str(rest))

    out = resplit_ivf_index(index_dir, str(tmp_path / "ivf16"), 16)
    assert sum(ivf_list_rows(out).values()) == t.num_rows  # nothing lost
    assert pq.ParquetFile(
        os.path.join(out, "centroids.parquet")
    ).metadata.num_rows == 16

    want = _df(ann_topk(SF, n_queries=5, k=5))
    got_new = _df(ann_topk_ivf_indexed(SF, out, n_queries=5, k=5, nprobe=16))
    pd.testing.assert_frame_equal(got_new, want, check_dtype=False)
    # the old layout is untouched and still exact at its own width
    got_old = _df(
        ann_topk_ivf_indexed(SF, index_dir, n_queries=5, k=5, nprobe=4)
    )
    pd.testing.assert_frame_equal(got_old, want, check_dtype=False)


def test_ivf_add_growth_advisory_and_resplit_writes_clean(
    ray_session, tmp_path, monkeypatch
):
    """When an add leaves the fullest list over 2x the row budget, the add
    warns with the prescribed resplit width and persists it as
    advice.json (this store's metrics slot — it has no manifest); the
    re-split index starts clean."""
    import json
    import warnings

    import clinical_trials_etl_ray.stages.embed as E

    monkeypatch.setattr(E, "IVF_LIST_ROW_BUDGET", 10)

    src = os.path.join(SF, "embeddings.parquet")
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    half = t.num_rows // 2
    half_sf = tmp_path / "half_sf"
    half_sf.mkdir()
    pq.write_table(t.slice(0, half), str(half_sf / "embeddings.parquet"))
    rest = tmp_path / "rest.parquet"
    pq.write_table(t.slice(half), str(rest))

    index_dir = str(tmp_path / "ivf2")
    build_ivf_index(str(half_sf), index_dir, n_centroids=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        E.ivf_index_add(index_dir, str(rest))
    assert [x for x in w if "resplit_ivf_index" in str(x.message)], \
        [str(x.message) for x in w]
    advice = json.load(open(os.path.join(index_dir, "advice.json")))
    assert advice["ivf_resplit_advice_n_lists"] == 50  # ceil(500/10)
    assert advice["max_list_rows"] > 20

    out = E.resplit_ivf_index(index_dir, str(tmp_path / "ivf50"), 50)
    assert not os.path.exists(os.path.join(out, "advice.json"))
    assert sum(E.ivf_list_rows(out).values()) == t.num_rows
