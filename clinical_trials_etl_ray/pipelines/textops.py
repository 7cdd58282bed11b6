"""Training-data text / dedup / similarity pipelines over the testdata
tables, with DuckDB oracles where SQL can express the semantics.

Rows-only entries (no oracle_sql) are heuristic or approximate by nature:
quality scores, language ID, rolling-hash fingerprints, SimHash pairs, the
LSH-bucketed cosine path, and the multimodal feature stub.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup_text import (
    N_COARSE_PARTITIONS,
    BandExploder,
    MinHasher,
    SimHasher,
    candidate_pairs_partition,
    dedupe_pairs,
    exact_jaccard,
    hamming64,
    simhash_blocks,
)
from ..stages.embed import (
    ann_topk,
    ann_topk_ivf,
    near_dup_pairs_cosine,
    near_dup_pairs_lsh,
)
from ..stages.multimodal import media_features_ds
from ..stages.text import Fingerprinter, LangId, QualityScorer, TokenCounter, md5_exact


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    ds = _docs(sf_dir).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )
    return ds.map_batches(
        lambda df: df[["doc_id", "n_chars", "n_ws_tokens"]], batch_format="pandas"
    )


def q_punct_stats(sf_dir: str):
    import pyarrow.compute as pc

    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        n_punct = pc.cast(pc.count_substring_regex(t["text"], pattern="[.!?,;:]"), pa.float64())
        n = pc.cast(pc.utf8_length(t["text"]), pa.float64())
        ratio = pc.divide(n_punct, pc.max_element_wise(n, pa.scalar(1.0)))
        return pa.Table.from_arrays([t["doc_id"], ratio], names=["doc_id", "punct_ratio"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_fingerprint_md5(sf_dir: str):
    ds = _docs(sf_dir).map_batches(md5_exact, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_md5"])


def q_quality_scores(sf_dir: str):
    """Rows-only: heuristic quality signals (no SQL equivalent claimed)."""
    ds = _docs(sf_dir).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4)
    )
    ds = ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, 4))
    return ds.map_batches(
        lambda df: df[
            ["doc_id", "n_chars", "punct_ratio", "stopword_ratio",
             "mean_word_len", "upper_ratio", "quality_ok"]
        ],
        batch_format="pandas",
    )


def q_lang_id(sf_dir: str):
    """Rows-only: n-gram/stopword language heuristic."""
    ds = _docs(sf_dir).map_batches(LangId, batch_format="pandas", concurrency=(1, 4))
    return ds.map_batches(
        lambda df: df[["doc_id", "lang_pred", "lang_score"]], batch_format="pandas"
    )


def q_fingerprint_rolling(sf_dir: str):
    """Rows-only: winnowed Rabin-Karp rolling-hash fingerprints."""
    ds = _docs(sf_dir).map_batches(
        Fingerprinter, batch_format="pandas", concurrency=(1, 4)
    )
    return ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp_md5": df["fp_md5"],
                "fp_min0": df["fp_minhashes"].str[0].astype("uint64").astype("int64"),
            }
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# near-dup dedup
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8


def q_near_dup_jaccard(sf_dir: str, verify: str = "broadcast"):
    """MinHash(128) + LSH(32×4) candidates + exact word-3gram Jaccard verify
    ≥ 0.8. With these band parameters the miss probability at j≥0.8 is
    <5e-8, so the output equals the exact all-pairs SQL oracle w.h.p.

    verify="broadcast": candidate texts ship once via ray.put (fine while
    the corpus fits one worker's heap). verify="join": the 100-TB path —
    pair ids are joined back to texts with two co-partitioned hash joins,
    then scored per batch; nothing is collected driver-side."""
    import pyarrow.parquet as pq
    import ray

    ds = _docs(sf_dir)
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 12), batch_size=1024
    )
    bands = sigs.map_batches(BandExploder, batch_format="pandas", concurrency=(1, 4))
    # ONE coarse shuffle (64 partitions); pandas groups the band buckets inside
    cands = bands.groupby("part").map_groups(
        candidate_pairs_partition, batch_format="pandas"
    )
    uniq = dedupe_pairs(cands)

    if verify == "join":
        from ..stages.join import copartition_join

        docs_a = _docs(sf_dir).rename_columns(
            {"doc_id": "id_a", "text": "text_a"}
        )
        docs_b = _docs(sf_dir).rename_columns(
            {"doc_id": "id_b", "text": "text_b"}
        )
        joined = copartition_join(
            copartition_join(uniq, docs_a, on="id_a", num_buckets=16),
            docs_b,
            on="id_b",
            num_buckets=16,
        )

        def score(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype="int64"),
                     "id_b": pd.Series([], dtype="int64"),
                     "jaccard": pd.Series([], dtype="float64")}
                )
            jac = [
                exact_jaccard(a, b)
                for a, b in zip(df["text_a"], df["text_b"])
            ]
            df = df.assign(jaccard=np.round(jac, 6))
            return df[df["jaccard"] >= JACCARD_THRESHOLD][
                ["id_a", "id_b", "jaccard"]
            ]

        return joined.map_batches(score, batch_format="pandas")

    texts_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts = dict(
        zip(texts_tbl["doc_id"].to_pylist(), texts_tbl["text"].to_pylist())
    )
    ref = ray.put(texts)

    class Verifier:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype="int64"),
                     "id_b": pd.Series([], dtype="int64"),
                     "jaccard": pd.Series([], dtype="float64")}
                )
            jac = [
                exact_jaccard(self.texts.get(a, ""), self.texts.get(b, ""))
                for a, b in zip(df["id_a"], df["id_b"])
            ]
            df = df.assign(jaccard=np.round(jac, 6))
            return df[df["jaccard"] >= JACCARD_THRESHOLD][["id_a", "id_b", "jaccard"]]

    return uniq.map_batches(Verifier, batch_format="pandas", concurrency=(1, 4))


def q_simhash_pairs(sf_dir: str):
    """Rows-only: SimHash near-dup pairs at Hamming distance ≤ 3 via 16-bit
    block LSH (pigeonhole-complete for d≤3 with 4 blocks)."""
    ds = _docs(sf_dir)
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))
    blocks = sigs.map_batches(simhash_blocks, batch_format="pandas")
    blocks = blocks.map_batches(
        lambda df: df.assign(part=(df["block_val"] % N_COARSE_PARTITIONS)),
        batch_format="pandas",
    )

    def pairs_partition(part: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": [], "hamming": []}
        for (_bid, _bv), g in part.groupby(["block_id", "block_val"], sort=False):
            g = g.drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = hamming64(int(hs[i]), int(hs[j]))
                    if d <= 3:
                        a, b = sorted((int(ids[i]), int(ids[j])))
                        out["id_a"].append(a)
                        out["id_b"].append(b)
                        out["hamming"].append(d)
        return pd.DataFrame(out, dtype="int64").drop_duplicates(["id_a", "id_b"])

    cand = blocks.groupby("part").map_groups(pairs_partition, batch_format="pandas")
    return dedupe_pairs(cand)


def q_dedup_survivors_minhash(sf_dir: str):
    """Near-dup dedup policy: greedy keep-the-smaller-id — every doc that is
    the larger member of any near-dup pair is dropped. Deterministic and
    shuffle-light: the pair list (≪ corpus) is reduced on the driver."""
    pairs = q_near_dup_jaccard(sf_dir).to_pandas()
    import pyarrow.parquet as pq

    all_ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    dropped = set(int(b) for b in pairs["id_b"])
    keep = sorted(set(all_ids) - dropped)
    return pa.Table.from_pydict({"doc_id": pa.array(keep, pa.int64())})


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------


def q_ann_topk(sf_dir: str):
    return ann_topk(sf_dir, n_queries=5, k=5)


def q_ann_topk_ivf(sf_dir: str):
    """Rows-only: IVF-bucketed approximate top-k (nprobe=4 of 16 lists) —
    the scale path; exactness at nprobe=C is pinned by a unit test."""
    return ann_topk_ivf(sf_dir, n_queries=5, k=5, n_centroids=16, nprobe=4)


def q_near_dup_cosine(sf_dir: str):
    return near_dup_pairs_cosine(sf_dir, threshold=0.4)


def q_near_dup_cosine_lsh(sf_dir: str):
    """Rows-only: approximate (bucketed) variant — the 100-TB path."""
    return near_dup_pairs_lsh(sf_dir, threshold=0.4, n_bits=8)


def q_media_features(sf_dir: str):
    """Rows-only: multimodal decode plumbing with the deterministic stub."""
    return media_features_ds(n=300).map_batches(
        lambda t: t.select(["media_id", "kind", "n_bytes"]), batch_format="pyarrow"
    )


def q_media_near_dup(sf_dir: str):
    """Rows-only: the composed multimodal pipeline — binary payloads →
    actor-pool decode (stub) → feature vectors → cosine near-dup. Planted
    payload duplicates yield identical features (cos = 1). The comparison
    matrix is collected once (small corpus) and broadcast; at lake scale the
    LSH-bucketed path (near_dup_cosine_lsh) replaces the broadcast."""
    import ray

    from ..stages.embed import normalize_rows

    feats = media_features_ds(n=300, dup_rate=0.1)
    df = feats.select_columns(["media_id", "feature"]).to_pandas()
    ids = df["media_id"].to_numpy()
    mat = normalize_rows(np.stack(df["feature"].to_numpy()).astype(np.float64))
    ref = ray.put({"ids": ids, "mat": mat})

    class Scorer:
        def __init__(self):
            a = ray.get(ref)
            self.ids, self.mat = a["ids"], a["mat"]

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = normalize_rows(np.stack(b["feature"].to_numpy()).astype(np.float64))
            cos = m @ self.mat.T
            bi, aj = np.nonzero(cos >= 0.95)
            ia, ib = b["media_id"].to_numpy()[bi], self.ids[aj]
            keep = ia < ib
            return pd.DataFrame(
                {"id_a": ia[keep], "id_b": ib[keep],
                 "cos_sim": np.round(cos[bi, aj][keep], 6)}
            )

    return feats.map_batches(Scorer, batch_format="pandas", concurrency=(1, 4))


QUERIES = {
    "token_counts": q_token_counts,
    "punct_stats": q_punct_stats,
    "fingerprint_md5": q_fingerprint_md5,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprint_rolling": q_fingerprint_rolling,
    "near_dup_jaccard": q_near_dup_jaccard,
    "simhash_pairs": q_simhash_pairs,
    "dedup_survivors_minhash": q_dedup_survivors_minhash,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "near_dup_cosine": q_near_dup_cosine,
    "near_dup_cosine_lsh": q_near_dup_cosine_lsh,
    "media_features": q_media_features,
    "media_near_dup": q_media_near_dup,
}

_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM words WHERE len(w) >= 3
),
tri AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
"""

_SURVIVORS_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM words WHERE len(w) >= 3
),
tri AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT id_b FROM pairs  -- drop the larger id of each pair (single-link min)
)
"""

_ANN_SQL = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 5
),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (
  SELECT qid, vec_id, list_cosine_similarity(qe, e) AS cos
  FROM q CROSS JOIN c WHERE vec_id <> qid
),
r AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
  FROM s
)
SELECT qid, vec_id, round(cos, 6) AS cos_sim FROM r WHERE rn <= 5
"""

_COS_PAIRS_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""

ORACLE_SQL = {
    "token_counts": (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens "
        "FROM documents"
    ),
    "punct_stats": (
        "SELECT doc_id, CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)"
        " / greatest(length(text), 1) AS punct_ratio FROM documents"
    ),
    "fingerprint_md5": "SELECT doc_id, md5(text) AS text_md5 FROM documents",
    "near_dup_jaccard": _JACCARD_SQL,
    "dedup_survivors_minhash": _SURVIVORS_SQL,
    "ann_topk": _ANN_SQL,
    "near_dup_cosine": _COS_PAIRS_SQL,
    # quality_scores, lang_id, fingerprint_rolling, simhash_pairs,
    # near_dup_cosine_lsh, media_features: rows-only by design.
}
