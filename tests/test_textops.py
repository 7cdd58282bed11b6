"""Text / dedup / similarity ops: SQL-oracle comparisons plus behavioral
tests for the rows-only (heuristic/approximate) operators."""

import numpy as np
import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines import textops as tx
from tests.util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"

SQL_BACKED = [k for k in tx.QUERIES if k in tx.ORACLE_SQL]
ROWS_ONLY = [k for k in tx.QUERIES if k not in tx.ORACLE_SQL]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_textops_matches_oracle(ray_session, name):
    result = tx.QUERIES[name](SF)
    assert_matches_oracle(result, tx.ORACLE_SQL[name], SF)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_run_and_shape(ray_session, name):
    df = tx.QUERIES[name](SF)
    df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_lang_id_detects_real_languages(ray_session):
    """The heuristic must separate actual en/fr/de/es sentences."""
    import ray.data

    from clinical_trials_etl_ray.stages.text import LangId

    samples = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat sat on the mat and it is a fine day for the dog",
                "le chat est dans la maison et il est pour le jardin dans un sac",
                "der hund ist nicht mit der katze und das ist ein gutes haus auf",
                "el perro es un animal y la casa es de madera por la noche con",
            ],
        }
    )
    out = (
        ray.data.from_pandas(samples)
        .map_batches(LangId, batch_format="pandas", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["lang_pred"]) == ["en", "fr", "de", "es"]


def test_minhash_finds_planted_near_dups(ray_session):
    """MinHash-LSH must recover a planted 95%-overlap pair and not pair
    unrelated docs."""
    from clinical_trials_etl_ray.stages.dedup_text import (
        MinHasher,
        exact_jaccard,
    )

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    base = " ".join(rng.choice(vocab, size=200))
    near = base.rsplit(" ", 8)[0] + " zz yy xx ww vv uu tt ss"
    other = " ".join(rng.choice(vocab, size=200))
    assert exact_jaccard(base, near) > 0.8
    assert exact_jaccard(base, other) < 0.2

    mh = MinHasher()
    sim_est = np.mean(mh.signature(base) == mh.signature(near))
    dis_est = np.mean(mh.signature(base) == mh.signature(other))
    assert sim_est > 0.7
    assert dis_est < 0.2


def test_simhash_hamming_behavior():
    from clinical_trials_etl_ray.stages.dedup_text import SimHasher, hamming64

    a = SimHasher.simhash("the quick brown fox jumps over the lazy dog " * 5)
    b = SimHasher.simhash("the quick brown fox jumps over the lazy dog " * 5 + "extra")
    c = SimHasher.simhash("completely different words entirely unrelated content here")
    assert hamming64(a, b) < hamming64(a, c)
    assert hamming64(a, a) == 0


def test_near_dup_jaccard_nonempty_and_correct(ray_session):
    """The testdata corpus contains planted near-dups; LSH must find them."""
    pairs = tx.q_near_dup_jaccard(SF).to_pandas()
    assert (pairs["jaccard"] >= 0.8).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_media_decoder_plumbing(ray_session):
    from clinical_trials_etl_ray.stages.multimodal import (
        DeterministicFakeDecoder,
        RealDecoder,
        media_features_ds,
        synth_media_table,
    )

    t = synth_media_table(30)
    assert t.num_rows == 30
    dec = DeterministicFakeDecoder()
    out = dec(t)
    assert out.column("feature").type.value_type == "float"
    # determinism: same payload → same features
    out2 = dec(t)
    assert out.equals(out2)
    with pytest.raises(NotImplementedError):
        RealDecoder()
    ds = media_features_ds(n=60, batch_size=16, concurrency=2)
    feats = ds.take_all()
    assert len(feats) == 60
    assert all(len(r["feature"]) == 16 for r in feats)


def test_ivf_exact_when_all_lists_probed(ray_session):
    """IVF with nprobe == n_centroids must equal brute force exactly."""
    from clinical_trials_etl_ray.stages.embed import ann_topk, ann_topk_ivf
    from tests.util_compare import canon, to_pandas

    bf = canon(to_pandas(ann_topk(SF, n_queries=5, k=5)))
    ivf = canon(to_pandas(ann_topk_ivf(SF, 5, 5, n_centroids=16, nprobe=16)))
    pd.testing.assert_frame_equal(bf, ivf, check_dtype=False)


def test_ivf_recall_at_small_nprobe(ray_session):
    """nprobe=4/16 loses recall by design but must stay useful (≥0.5) and
    return exactly k rows per query."""
    from clinical_trials_etl_ray.stages.embed import ann_topk, ann_topk_ivf
    from tests.util_compare import to_pandas

    bf = to_pandas(ann_topk(SF, n_queries=5, k=5))
    ivf = to_pandas(ann_topk_ivf(SF, 5, 5, n_centroids=16, nprobe=4))
    assert ivf.groupby("qid").size().eq(5).all()
    want = set(map(tuple, bf[["qid", "vec_id"]].itertuples(index=False)))
    got = set(map(tuple, ivf[["qid", "vec_id"]].itertuples(index=False)))
    assert len(want & got) / len(want) >= 0.5


def test_media_near_dup_finds_planted_payload_copies(ray_session):
    """Planted verbatim payload copies must surface as cos=1 pairs through
    the full decode→feature→near-dup pipeline."""
    import numpy as np

    from clinical_trials_etl_ray.stages.multimodal import synth_media_table

    pairs = tx.q_media_near_dup(SF).to_pandas()
    assert len(pairs) >= 25  # 10% of 300 planted
    assert (pairs["cos_sim"] >= 0.95).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # cross-check against ground truth: identical payloads
    t = synth_media_table(300, dup_rate=0.1)
    payloads = t.column("payload").to_pylist()
    by_payload = {}
    want = set()
    for i, p in enumerate(payloads):
        if p in by_payload:
            want.add((by_payload[p], i))
        else:
            by_payload[p] = i
    got = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    assert want <= got  # every planted dup found (cos=1 exact)


def test_near_dup_join_verify_equals_broadcast(ray_session):
    """The co-partitioned-join verify path (100-TB variant) must produce
    exactly the broadcast path's result."""
    a = tx.q_near_dup_jaccard(SF).to_pandas()
    b = tx.q_near_dup_jaccard(SF, verify="join").to_pandas()
    key = ["id_a", "id_b", "jaccard"]
    pa_ = a[key].sort_values(key).reset_index(drop=True)
    pb_ = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_, check_dtype=False)
