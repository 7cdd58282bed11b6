"""IVF-PQ retrieval (stages/pq.py).

Pins: codebook/encode determinism and shape; ADC score ≈ exact cosine
within the quantization error; index build + two-stage retrieval recall
vs brute force on the fixed test corpus; exact re-rank scores equal true
cosines; parallelism invariance of the full query path.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from clinical_trials_etl_ray.stages.pq import (
    adc_scores,
    ann_topk_ivf_pq,
    build_pq_index,
    pq_encode,
    pq_train,
)
from clinical_trials_etl_ray.stages.embed import normalize_rows, table_to_matrix

SF = "/root/testdata/sf0.001"


def _corpus():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    return (t.column("vec_id").to_numpy(zero_copy_only=False),
            table_to_matrix(t))


def test_train_encode_deterministic_and_adc_error_bounded():
    ids, m = _corpus()
    books = pq_train(m[:512], m=8, ks=64)
    books2 = pq_train(m[:512].copy(), m=8, ks=64)
    assert np.array_equal(books, books2)
    codes = pq_encode(m, books)
    assert codes.shape == (len(m), 8) and codes.dtype == np.uint8
    assert np.array_equal(codes, pq_encode(m.copy(), books))

    # ADC ≈ exact cosine: the approximation error is the quantization
    # error |q·(x - x̂)| ≤ ‖x - x̂‖; check the mean is small and bounded
    q = normalize_rows(m[:8])
    approx = adc_scores(q, codes, books)
    exact = q @ normalize_rows(m).T
    err = np.abs(approx - exact)
    # reconstruction norm bound, row-wise
    recon = books[np.arange(8)[None, :], codes].reshape(len(m), -1)
    bound = np.linalg.norm(normalize_rows(m) - recon, axis=1)
    assert (err <= bound[None, :] + 1e-9).all()
    assert err.mean() < 0.15


def _brute_topk(ids, m, qm, qids, k=5):
    cos = qm @ normalize_rows(m).T
    out = {}
    for i, qid in enumerate(qids):
        order = np.lexsort((ids, -cos[i]))
        keep = [j for j in order if ids[j] != qid][:k]
        out[qid] = set(ids[j] for j in keep)
    return out


def test_index_recall_and_rerank(ray_session, tmp_path):
    ids, m = _corpus()
    idx = str(tmp_path / "pq_idx")
    build_pq_index(SF, idx, n_centroids=8, m=16, ks=256)

    qm = normalize_rows(m[:5])
    qids = ids[:5]
    truth = _brute_topk(ids, m, qm, qids, k=5)

    def recall(ds):
        df = ds.to_pandas()
        hit = tot = 0
        for qid, want in truth.items():
            got = set(df[df.qid == qid]["vec_id"])
            hit += len(got & want)
            tot += len(want)
        return hit / tot

    adc = ann_topk_ivf_pq(SF, idx, n_queries=5, k=5, nprobe=8, rerank=0)
    r_adc = recall(adc)
    rr = ann_topk_ivf_pq(SF, idx, n_queries=5, k=5, nprobe=8, rerank=25)
    r_rr = recall(rr)
    # fixed corpus + deterministic pipeline ⇒ stable floors (measured
    # 0.76 ADC / 1.00 re-ranked at m=16, ks=256 on this corpus; floors
    # leave slack for the sample-selection difference only); re-rank can
    # only help — it rescores a candidate superset exactly
    assert r_adc >= 0.55
    assert r_rr >= max(r_adc, 0.85)

    # re-ranked scores ARE exact cosines
    df = rr.to_pandas()
    pos = {int(v): i for i, v in enumerate(ids)}
    for _, row in df.iterrows():
        exact = float(
            qm[list(qids).index(row.qid)] @ normalize_rows(m)[pos[int(row.vec_id)]]
        )
        assert abs(row.cos_sim - exact) < 1e-9


def test_query_path_parallelism_invariant(ray_session, tmp_path):
    import pandas as pd

    idx = str(tmp_path / "pq_idx2")
    build_pq_index(SF, idx, n_centroids=4, m=8, ks=32)
    a = (
        ann_topk_ivf_pq(SF, idx, n_queries=3, k=4, nprobe=4, rerank=10)
        .to_pandas().sort_values(["qid", "vec_id"]).reset_index(drop=True)
    )
    b = (
        ann_topk_ivf_pq(SF, idx, n_queries=3, k=4, nprobe=4, rerank=10)
        .to_pandas().sort_values(["qid", "vec_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pq_index_add_incremental(ray_session, tmp_path):
    """Half-build + pq_index_add of the other half ≡ full build: saved
    codebooks make assignment/encoding deterministic per row, so the
    appended index holds the identical (vec_id, list_id, code) set, and
    searches over it equal searches over the full build."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from clinical_trials_etl_ray.stages.pq import pq_index_add

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    half = t.num_rows // 2
    src_half = str(tmp_path / "half.parquet")
    pq.write_table(t.slice(0, half), src_half)

    # full index built over HALF the corpus dir: make a corpus dir alias
    half_dir = tmp_path / "half_sf"
    half_dir.mkdir()
    pq.write_table(t.slice(0, half), str(half_dir / "embeddings.parquet"))
    idx = str(tmp_path / "idx_inc")
    build_pq_index(str(half_dir), idx, n_centroids=4, m=16, ks=64)
    added = pq_index_add(idx, ray.data.from_arrow(t.slice(half)))
    assert added == t.num_rows - half

    def index_rows(d):
        files = glob.glob(os.path.join(d, "data", "ivf_list=*", "*.parquet"))
        df = pa.concat_tables(
            pq.read_table(f, columns=["vec_id", "list_id", "code"])
            for f in files
        ).to_pandas()
        df["code"] = df["code"].map(lambda c: bytes(c))
        return df.sort_values("vec_id").reset_index(drop=True)

    inc = index_rows(idx)
    assert len(inc) == t.num_rows
    assert inc["vec_id"].is_unique

    # the added rows' codes equal what a from-scratch encode of the same
    # vectors against the SAME saved codebooks produces
    import numpy as np

    cb = pq.read_table(os.path.join(idx, "codebooks.parquet"))
    mm = int(pa.compute.max(cb["subspace"]).as_py()) + 1
    kk = int(pa.compute.max(cb["code"]).as_py()) + 1
    dsub = len(cb["centroid"][0].as_py())
    books = table_to_matrix(cb, col="centroid").reshape(mm, kk, dsub)
    tail = t.slice(half)
    want = pq_encode(table_to_matrix(tail), books)
    got = inc.set_index("vec_id").loc[
        tail.column("vec_id").to_numpy(zero_copy_only=False), "code"
    ]
    assert [bytes(w) for w in want] == list(got)


def test_pq_add_growth_advisory_prescribes_rebuild(
    ray_session, tmp_path, monkeypatch
):
    """The PQ store shares the IVF growth monitor but its prescription is
    a rebuild (codes are lossy — a wider codebook needs the corpus), and
    the advice persists as advice.json, this plain-directory store's
    metrics slot."""
    import json
    import os
    import warnings

    import pyarrow.parquet as pq
    import ray.data

    import clinical_trials_etl_ray.stages.embed as E
    from clinical_trials_etl_ray.stages.pq import pq_index_add

    monkeypatch.setattr(E, "IVF_LIST_ROW_BUDGET", 10)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    half = t.num_rows // 2
    half_dir = tmp_path / "half_sf"
    half_dir.mkdir()
    pq.write_table(t.slice(0, half), str(half_dir / "embeddings.parquet"))
    idx = str(tmp_path / "idx")
    build_pq_index(str(half_dir), idx, n_centroids=2, m=8, ks=32)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pq_index_add(idx, ray.data.from_arrow(t.slice(half)))
    msgs = [str(x.message) for x in w if "build_pq_index" in str(x.message)]
    assert msgs and "lossy" in msgs[0], [str(x.message) for x in w]
    advice = json.load(open(os.path.join(idx, "advice.json")))
    assert advice["ivf_resplit_advice_n_lists"] == 50  # ceil(500/10)
