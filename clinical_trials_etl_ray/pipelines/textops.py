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
    BandExploder,
    MinHasher,
    SimHasher,
    candidate_pairs_partition,
    coarse_partitions,
    dedupe_pairs,
    exact_jaccard,
    simhash_blocks,
    simhash_candidate_pairs_partition,
)
from ..stages.embed import (
    ann_topk,
    ann_topk_ivf,
    lsh_pairs,
    near_dup_pairs_cosine,
    near_dup_pairs_lsh,
)
from ..functions.scratch import scratch_dir, scratch_root
from ..stages.multimodal import media_features_ds
from ..stages.text import Fingerprinter, LangId, QualityScorer, TokenCounter, md5_exact


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def _docs_row_count(sf_dir: str) -> int:
    """Corpus row count from parquet metadata (no data read) — sizes the
    coarse pair-emission shuffle (stages.dedup_text.coarse_partitions)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


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
        text = pc.fill_null(t["text"], "")  # NULL counts as '' (oracle-aligned)
        n_punct = pc.cast(pc.count_substring_regex(text, pattern="[.!?,;:]"), pa.float64())
        n = pc.cast(pc.utf8_length(text), pa.float64())
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

# corpora whose UNCOMPRESSED text payload (parquet row-group total_byte_size)
# exceeds this are verified via the co-partitioned join path; below it the
# decoded texts fit one worker's heap and the broadcast path avoids the
# join's two exchanges
BROADCAST_VERIFY_MAX_BYTES = 256 << 20


def _docs_uncompressed_bytes(sf_dir: str) -> int:
    """In-memory (uncompressed) footprint estimate of the documents table
    from parquet metadata — ``total_byte_size`` is the UNCOMPRESSED row-group
    size, which is the right quantity to compare against a worker-heap
    broadcast budget (the Verifier holds decoded Python strings)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    return sum(
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    )


def q_near_dup_jaccard(sf_dir: str, verify: str = "auto"):
    """MinHash(128) + LSH(32×4) candidates + exact word-3gram Jaccard verify
    ≥ 0.8. With these band parameters the miss probability at j≥0.8 is
    <5e-8, so the output equals the exact all-pairs SQL oracle w.h.p.

    verify="auto" (default): picks by the parquet-metadata uncompressed
    corpus size against BROADCAST_VERIFY_MAX_BYTES — broadcast below it
    (texts fit one worker's heap; avoids the join's two exchanges), join
    above it. verify="join" (the 100-TB floor): pair ids are joined back to
    texts with two co-partitioned hash joins, then scored per batch; nothing
    is collected driver-side. verify="broadcast": candidate texts ship once
    via ray.put — a worker OOM beyond the threshold; opt in explicitly only
    for small corpora. Join and broadcast are pinned equal by
    tests/test_textops.py."""
    import pyarrow.parquet as pq
    import ray

    if verify == "auto":
        verify = (
            "broadcast"
            if _docs_uncompressed_bytes(sf_dir) <= BROADCAST_VERIFY_MAX_BYTES
            else "join"
        )

    # coarse shuffle width scales with the corpus (floor 64): each pandas
    # group-task then holds a bounded slice of the exploded band table
    n_parts = coarse_partitions(_docs_row_count(sf_dir), rows_per_doc=32)

    ds = _docs(sf_dir)
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 12), batch_size=1024
    )
    bands = sigs.map_batches(
        BandExploder,
        batch_format="pandas",
        concurrency=(1, 4),
        fn_constructor_kwargs={"n_parts": n_parts},
    )
    # ONE coarse shuffle (n_parts partitions); pandas groups the band buckets inside
    cands = bands.groupby("part").map_groups(
        candidate_pairs_partition, batch_format="pandas"
    )
    uniq = dedupe_pairs(cands, n_parts=n_parts)

    if verify == "join":
        return _join_verify(sf_dir, uniq, n_parts=n_parts)

    # the text dict is built inside a Ray task and broadcast as its return
    # ref — the driver holds only an ObjectRef even on this explicit
    # small-corpus path
    @ray.remote
    def _load_texts(p: str) -> dict:
        t = pq.read_table(p, columns=["doc_id", "text"])
        return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    ref = _load_texts.remote(os.path.join(sf_dir, "documents.parquet"))

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


def _join_verify(sf_dir: str, uniq, n_parts: int | None = None):
    """Distributed exact-Jaccard verification with ONE full-corpus exchange.

    Each candidate pair explodes into two half-rows keyed by the member doc
    id; one co-partitioned hash join attaches texts to the halves (the only
    exchange that ships the corpus), then a SECOND, pair-sized exchange
    regroups the two halves of each pair and scores them. Nothing is
    collected driver-side; exchange volume is corpus + O(pairs), not
    2×corpus as a naive join-per-side would pay."""
    from ..stages.join import copartition_join

    def explode_halves(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "member": pd.Series([], dtype="int64")}
            )
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "id_a": np.repeat(a, 2),
                "id_b": np.repeat(b, 2),
                "member": np.column_stack([a, b]).ravel(),
            }
        )

    halves = uniq.map_batches(explode_halves, batch_format="pandas")
    docs = _docs(sf_dir).map_batches(
        lambda t: t.rename_columns(["member", "text"]), batch_format="pyarrow"
    )
    joined = copartition_join(halves, docs, on="member", num_buckets=64)

    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup_text import pair_partition_ids

        return df.assign(
            part=pair_partition_ids(
                df["id_a"].to_numpy(), df["id_b"].to_numpy(), n_parts
            )
        )

    tagged = joined.map_batches(pair_part, batch_format="pandas")

    def score_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
        if g.empty:
            return empty
        ha = g[g["member"] == g["id_a"]][["id_a", "id_b", "text"]]
        hb = g[g["member"] == g["id_b"]][["id_a", "id_b", "text"]]
        m = ha.merge(hb, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if m.empty:
            return empty
        jac = [exact_jaccard(a, b) for a, b in zip(m["text_a"], m["text_b"])]
        m = m.assign(jaccard=np.round(jac, 6))
        return m[m["jaccard"] >= JACCARD_THRESHOLD][["id_a", "id_b", "jaccard"]]

    return tagged.groupby("part").map_groups(score_group, batch_format="pandas")


def q_near_dup_incremental(sf_dir: str):
    """Cross-run INCREMENTAL near-dup (stages/lsh_index.py): index the
    first half of the corpus (doc_id < n/2 — "yesterday's corpus"), probe
    the second half against it reading ONLY the touched posting/signature
    partitions, then exact-verify the candidate pairs at word-3gram
    Jaccard ≥ 0.8. With 32×4 bands the candidate miss probability at
    j≥0.8 is <5e-8, so the output equals the cross-half all-pairs SQL
    oracle w.h.p. Texts for verification ship once by ObjectRef (the
    corpus is small at test SF; at scale the fetch is bounded by the PAIR
    set). The historical half is never re-read after indexing."""
    import shutil

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq
    import ray

    from ..stages.lsh_index import lsh_candidate_pairs, update_lsh_index

    split = _docs_row_count(sf_dir) // 2
    docs = _docs(sf_dir)
    hist = docs.map_batches(
        lambda t: t.filter(_pc.less(t["doc_id"], split)),
        batch_format="pyarrow",
    )
    new = docs.map_batches(
        lambda t: t.filter(_pc.greater_equal(t["doc_id"], split)),
        batch_format="pyarrow",
    )
    idx = scratch_dir("lsh_idx_")
    update_lsh_index(idx, hist)
    uniq = lsh_candidate_pairs(idx, new)

    @ray.remote
    def _load_texts(p: str) -> dict:
        t = _pq.read_table(p, columns=["doc_id", "text"])
        return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    ref = _load_texts.remote(os.path.join(sf_dir, "documents.parquet"))

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
            return df[df["jaccard"] >= JACCARD_THRESHOLD][
                ["id_a", "id_b", "jaccard"]
            ]

    out = uniq.map_batches(
        Verifier, batch_format="pandas", concurrency=(1, 4)
    ).materialize()  # bounded by the pair count; lets the index dir go
    shutil.rmtree(idx, ignore_errors=True)
    return out


def q_simhash_pairs(sf_dir: str):
    """Rows-only: SimHash near-dup pairs at Hamming distance ≤ 3 via 16-bit
    block LSH (pigeonhole-complete for d≤3 with 4 blocks). Pair emission per
    coarse partition uses the same vectorized lexsort run-length kernel (and
    hot-block df_cap) as the MinHash path — no nested Python pair loop."""
    n_parts = coarse_partitions(_docs_row_count(sf_dir), rows_per_doc=4)
    ds = _docs(sf_dir)
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))
    blocks = sigs.map_batches(simhash_blocks, batch_format="pandas")
    blocks = blocks.map_batches(
        lambda df: df.assign(part=(df["block_val"] % n_parts)),
        batch_format="pandas",
    )
    cand = blocks.groupby("part").map_groups(
        simhash_candidate_pairs_partition, batch_format="pandas"
    )
    return dedupe_pairs(cand, n_parts=n_parts)


# dropped-id sets at or below this broadcast as one sorted array (80 MB at
# the cap) and the anti-join degenerates to a per-batch np.isin filter with
# NO corpus exchange; above it, the co-partitioned distributed anti-join is
# the floor (a 100-TB corpus can drop billions of ids)
BROADCAST_DROP_MAX_IDS = 10_000_000


def q_dedup_survivors_minhash(sf_dir: str, anti: str = "auto"):
    """Near-dup dedup policy: greedy keep-the-smaller-id — every doc that is
    the larger member of any near-dup pair is dropped.

    The pair list is bounded by the verified-duplicate count, so it is
    materialized (small) and counted; ``anti="auto"`` then picks:
    "broadcast" (≤ BROADCAST_DROP_MAX_IDS dropped ids): the unique id array
    is built INSIDE a Ray task from the materialized blocks (driver holds
    only refs) and each corpus batch filters with one vectorized
    ``np.isin`` — zero corpus exchange; "join": the co-partitioned
    distributed anti-join (stages/join.py) — the scale floor for huge drop
    sets. Both paths are pinned equal by test."""
    import ray

    from ..stages.join import copartition_join

    pairs = q_near_dup_jaccard(sf_dir)
    dropped = pairs.map_batches(
        lambda t: t.select(["id_b"]).rename_columns(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()  # bounded by pair count; avoids re-running the
    # jaccard pipeline for the count + the consume below
    docs = _docs(sf_dir, columns=("doc_id",))
    if anti == "auto":
        anti = (
            "broadcast"
            if dropped.count() <= BROADCAST_DROP_MAX_IDS
            else "join"
        )
    if anti == "join":
        return copartition_join(
            docs, dropped, on="doc_id", num_buckets=16, how="anti"
        )

    @ray.remote
    def _unique_ids(*blocks):
        t = pa.concat_tables(blocks)
        return np.unique(t["doc_id"].to_numpy(zero_copy_only=False))

    ids_ref = _unique_ids.remote(*dropped.to_arrow_refs())

    class DropFilter:
        def __init__(self):
            self.ids = ray.get(ids_ref)  # sorted unique, fetched per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(d, self.ids)))

    return docs.map_batches(
        DropFilter, batch_format="pyarrow", concurrency=(1, 4)
    )


def q_pack_documents(sf_dir: str):
    """Rows-only: token counting → sequence packing (stages/pack.py) at a
    256-token budget — every doc assigned to a pack whose members sum to
    ≤ budget (oversized docs flagged, never dropped). Greedy stateful per
    hash-group, so not SQL-expressible; properties (coverage, budget,
    determinism, parallelism-invariance) are pytest-pinned."""
    from ..stages.pack import pack_sequences

    ds = _docs(sf_dir).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )
    ds = ds.map_batches(
        lambda df: df[["doc_id", "n_ws_tokens"]], batch_format="pandas"
    )
    return pack_sequences(ds, budget=256, count_col="n_ws_tokens")


def q_near_dup_clusters(sf_dir: str):
    """Transitive near-dup CLUSTERS: the MinHash+LSH+verify pair stream fed
    through distributed connected components (stages/graph.py min-label
    propagation) — each doc in any pair labeled with the minimum doc_id
    reachable through the near-dup graph. This is the principled grouping
    behind dedup policies (keep one representative per cluster) vs the
    1-hop survivors heuristic; oracle = recursive-CTE transitive closure
    over the exact all-pairs SQL pair set."""
    from ..stages.graph import connected_components

    pairs = q_near_dup_jaccard(sf_dir).map_batches(
        lambda df: df[["id_a", "id_b"]], batch_format="pandas"
    )
    labels = connected_components(pairs)
    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "lbl": "cluster_id"}),
        batch_format="pandas",
    )


def _split_words(t: pa.Table):
    """Shared whitespace-split plumbing: (flat word array, raw per-row list
    lengths, nonempty mask). The [''] artifact of splitting an empty string
    is reported via ``nonempty`` for the caller to mask."""
    import pyarrow.compute as pc

    if len(t) == 0:  # empty batch (possible after upstream filters)
        empty = np.array([], dtype=object)
        return empty, np.array([], dtype=np.int64), np.array([], dtype=bool)
    # all-null batches can arrive null-TYPED (e.g. from_pandas of Nones);
    # cast first so the string kernels have a kernel to dispatch to
    text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
    st = pc.replace_substring_regex(text, pattern=r"^\s+|\s+$", replacement="")
    lists = pa.chunked_array(
        [pc.split_pattern_regex(st, pattern=r"\s+")]
    ).combine_chunks()
    raw = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(st, "").to_numpy(zero_copy_only=False)
    words = lists.flatten().to_numpy(zero_copy_only=False)
    return words, raw, nonempty


def repetition_scores_batch(t: pa.Table) -> pa.Table:
    """Per-doc (n_words, n_distinct) — the Gopher-style repetition kernel;
    exact on strings (C-level hash groupby, no hash-collision risk)."""
    words, raw, nonempty = _split_words(t)
    n_words = np.where(nonempty, raw, 0).astype(np.int64)
    parents = np.repeat(np.arange(len(t)), raw)
    keep = nonempty[parents]  # drop the [''] token of empty docs
    nun = (
        pd.DataFrame({"p": parents[keep], "w": words[keep]})
        .groupby("p", sort=False)["w"]
        .nunique()
    )
    n_distinct = np.zeros(len(t), dtype=np.int64)
    if len(nun):
        n_distinct[nun.index.to_numpy()] = nun.to_numpy()
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct": pa.array(n_distinct),
        }
    )


def q_repetition_scores(sf_dir: str):
    """Gopher-style repetition signal: per-doc total vs distinct whitespace
    words (the duplicate-word fraction ``1 - n_distinct/n_words`` is the
    quality-filter input; returned as exact integer counts so the driver's
    stringified-value compare is float-free). Vectorized: ONE regex split
    per batch, then a single C-level hash groupby over (row, word) pairs
    for the distinct count — no Python per-row loop, zero exchange."""
    return _docs(sf_dir).map_batches(
        repetition_scores_batch, batch_format="pyarrow"
    )


def q_seeded_shuffle(sf_dir: str, seed: str = "42", n_hex: int = 1):
    """Deterministic seeded global shuffle for training-data ordering.

    The 100-TB shuffle shape: NO global sort. Each doc's md5(seed:doc_id)
    key assigns a shard (first ``n_hex`` hex digits → 16^n_hex shards, ONE
    hash-groupby exchange) and an order within the shard (rank by key).
    (shard, pos) together is a reproducible pseudo-random permutation of
    the corpus — re-runs, resumes, and different parallelism all emit the
    identical order, which epoch-reshuffles get by bumping the seed.
    Per-shard work is a local sort of corpus/16^n_hex: size ``n_hex`` so a
    shard fits a worker heap (n_hex=1 matches the registered oracle;
    n_hex=3 → 4096 shards is the 100-TB setting). md5 keys are uniform, so
    shards balance to ±O(sqrt) without salting."""
    import hashlib

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        keys = [
            hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
            for d in df["doc_id"]
        ]
        out = df[["doc_id"]].copy()
        out["key"] = keys
        out["shard"] = np.array(
            [int(k[:n_hex], 16) for k in keys], dtype=np.int64
        )
        return out

    def order_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        g["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "shard", "pos"]]

    ds = _docs(sf_dir, columns=("doc_id",)).map_batches(
        stamp, batch_format="pandas"
    )
    return ds.groupby("shard").map_groups(order_group, batch_format="pandas")


def q_top_terms(sf_dir: str, k: int = 3):
    """Salient-term extraction (TF-IDF-flavored, float-free): per doc, the
    top-k words by (tf DESC, df ASC, word ASC) — frequent here, rare in the
    corpus — with the exact integer tf/df evidence columns. Using the
    lexicographic (tf, df) order instead of tf·log(N/df) keeps the total
    order float-free, so the driver's stringified compare is exact.

    Two-phase corpus pattern: phase 1 computes document frequency with
    per-batch PARTIALS (one row per doc means a batch never splits a doc,
    so per-batch (word → #docs) counts sum exactly) folded by ONE
    vocabulary-sized groupby; the df map is then assembled INSIDE a Ray
    task and broadcast by ObjectRef (never driver-materialized); phase 2
    streams the corpus once more, ranking per batch against the broadcast
    map. Exchange = vocabulary, not corpus. NOT implemented here (the
    registered query is exact): at 100 TB the broadcast df map would need
    a df floor (drop hapax terms) or a hash-partitioned lookup — the
    extension point is ``_build_df_map``."""
    import ray

    def df_partials(t: pa.Table) -> pa.Table:
        words, raw, nonempty = _split_words(t)
        parents = np.repeat(np.arange(len(t)), raw)
        keep = nonempty[parents]
        pairs = pd.DataFrame({"p": parents[keep], "w": words[keep]})
        part = (
            pairs.drop_duplicates()
            .groupby("w", sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {"word": pa.array(part["w"], pa.string()),
             "n": pa.array(part["n"].to_numpy(np.int64))}
        )

    df_tbl = (
        _docs(sf_dir)
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
    )

    @ray.remote
    def _build_df_map(*blocks):
        # groupby output can include schema-less empty blocks — skip them
        blocks = [b for b in blocks if b.num_columns]
        if not blocks:
            return {}
        t = pa.concat_tables(blocks)
        return dict(zip(t["word"].to_pylist(), t["sum(n)"].to_pylist()))

    df_ref = _build_df_map.remote(*df_tbl.to_arrow_refs())

    class TopTerms:
        def __init__(self):
            self.df = ray.get(df_ref)  # fetched once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            words, raw, nonempty = _split_words(t)
            parents = np.repeat(np.arange(len(t)), raw)
            keep = nonempty[parents]
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            tf = (
                pd.DataFrame({"p": parents[keep], "w": words[keep]})
                .groupby(["p", "w"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            tf["df"] = tf["w"].map(self.df).astype(np.int64)
            tf = tf.sort_values(
                ["p", "tf", "df", "w"],
                ascending=[True, False, True, True],
                kind="mergesort",
            )
            top = tf.groupby("p", sort=False).head(k).copy()
            top["rank"] = top.groupby("p", sort=False).cumcount() + 1
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[top["p"].to_numpy()]),
                    "rank": pa.array(top["rank"].to_numpy(np.int64)),
                    "word": pa.array(top["w"], pa.string()),
                    "tf": pa.array(top["tf"].to_numpy(np.int64)),
                    "df": pa.array(top["df"].to_numpy(np.int64)),
                }
            )

    return _docs(sf_dir).map_batches(
        TopTerms, batch_format="pyarrow", concurrency=(1, 4)
    )


def q_weighted_sample_source(sf_dir: str):
    """Deterministic source-weighted sampling (mixture weighting): keep a
    doc iff its content md5 is lexicographically below its source's hex
    threshold prefix — per-source rates of 1/8, 1/4, 1/2, 3/4 by source
    index mod 4. Content-hash thresholding gives exact, reproducible,
    ingestion-order-independent sampling with ZERO exchange (a pure
    per-batch filter — the mixture knob for weighting corpora into a
    training run)."""
    import hashlib

    th = "248c"  # hex first-digit cutoffs: 2/16, 4/16, 8/16, 12/16

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.array(
            [
                hashlib.md5(
                    (t if isinstance(t, str) else "").encode()
                ).hexdigest()
                for t in df["text"]
            ],
            dtype=object,
        )
        idx = (df["source"].str[3:].astype(int) % 4).to_numpy()
        cuts = np.array(list(th), dtype=object)[idx]
        return df.loc[fps < cuts, ["doc_id", "source"]]

    return _docs(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        f, batch_format="pandas"
    )


def chunk_documents_batch(
    t: pa.Table, window: int = 32, stride: int = 24
) -> pa.Table:
    """Overlapping word-window explode kernel: all chunk offsets vectorized
    (np.repeat/arange over the split offsets), one C-level join per OUTPUT
    row for text assembly."""
    words, raw, nonempty = _split_words(t)
    n = np.where(nonempty, raw, 0).astype(np.int64)
    word_off = np.zeros(len(t) + 1, dtype=np.int64)
    np.cumsum(raw, out=word_off[1:])  # offsets into the RAW flat array

    c = np.where(n > 0, (n + stride - 1) // stride, 0)  # chunks per doc
    total = int(c.sum())
    if total == 0:  # empty batch, or all docs empty → zero chunks
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
    doc_idx = np.repeat(np.arange(len(t)), c)
    chunk_idx = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(c)[:-1])), c
    )
    starts = word_off[doc_idx] + chunk_idx * stride
    ends = np.minimum(starts + window, word_off[doc_idx] + n[doc_idx])
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
            "n_tokens": pa.array((ends - starts).astype(np.int64)),
            "chunk_text": pa.array(
                [" ".join(words[s:e]) for s, e in zip(starts, ends)],
                pa.string(),
            ),
        }
    )


def q_chunk_documents(sf_dir: str, window: int = 32, stride: int = 24):
    """Context-window chunking: split each doc's whitespace words into
    fixed-size overlapping windows (size ``window``, step ``stride``) — the
    complementary op to sequence packing (pack short docs, CHUNK long ones)
    and the explode-with-parent-FK shape of the reference's nested
    flatteners (locations.py:114-130 analog). Zero exchange; the kernel is
    property-tested against a naive per-doc reference."""
    return _docs(sf_dir).map_batches(
        lambda t: chunk_documents_batch(t, window, stride),
        batch_format="pyarrow",
    )


# PII redaction patterns (RE2-portable: same engine in Arrow and DuckDB),
# applied in this exact order on both sides — emails first (they contain
# dot-digit runs), then IPs (protect them from the phone pattern), then
# phones. The oracle SQL below is GENERATED from this tuple so the two
# sides cannot drift.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table) -> pa.Table:
    """Vectorized PII scrub: chained RE2 replace-all kernels per batch."""
    import pyarrow.compute as pc

    txt = pc.fill_null(t["text"], "")
    for pat, rep in _PII_PATTERNS:
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
    return pa.table({"doc_id": t["doc_id"], "clean_text": txt})


def q_redact_pii(sf_dir: str):
    """PII redaction (emails / IPv4s / phone numbers → typed placeholders)
    — the standard pre-training scrub pass. Zero exchange; planted-PII
    behavior is pytest-pinned against the same SQL on a synthetic corpus
    (the testdata corpus itself carries no PII, which the oracle equality
    also proves)."""
    return _docs(sf_dir).map_batches(redact_pii_batch, batch_format="pyarrow")


def _redact_sql() -> str:
    expr = "coalesce(text, '')"
    for pat, rep in _PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS clean_text FROM documents"


def _docs_id_cut(sf_dir: str) -> int:
    """(max(doc_id)+1)//2 from parquet row-group stats — a bounded metadata
    read (no data I/O); the oracle computes the identical cut in SQL."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata
    idx = next(
        i for i in range(md.num_columns) if md.schema.column(i).name == "doc_id"
    )
    mx = max(
        md.row_group(g).column(idx).statistics.max
        for g in range(md.num_row_groups)
    )
    return (int(mx) + 1) // 2


def q_dedup_incremental(sf_dir: str):
    """Cross-run incremental dedup against a PERSISTED fingerprint index
    (stages/seen_index.py): the first half of the corpus (doc_id < cut)
    plays "everything previously ingested" — its md5 fingerprints are folded
    into a bucket-partitioned index published via the exactly-once Manifest
    protocol — and the second half plays "today's increment", filtered by
    routing ONLY the increment to the index's fingerprint buckets (the
    historical corpus is never re-read or re-shuffled; ~16 bytes/doc of
    state is what crosses runs). Survivors = increment docs whose content
    was never seen before."""
    from ..stages.seen_index import filter_unseen, update_seen_index

    cut = _docs_id_cut(sf_dir)
    index_dir = scratch_dir("seen_idx_")

    import pyarrow.compute as pc

    history = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], cut)), batch_format="pyarrow"
    )
    update_seen_index(index_dir, history, num_buckets=16)
    increment = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], cut)),
        batch_format="pyarrow",
    )
    return filter_unseen(increment, index_dir).select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------


def q_ann_topk(sf_dir: str):
    return ann_topk(sf_dir, n_queries=5, k=5)


def q_ann_topk_ivf(sf_dir: str):
    """IVF-bucketed top-k with ALL lists probed (nprobe = n_centroids):
    exactly the brute-force result by construction, so it shares the ANN SQL
    oracle. The assignment/probe machinery is identical to the approximate
    path — only the probe budget differs."""
    return ann_topk_ivf(sf_dir, n_queries=5, k=5, n_centroids=16, nprobe=16)


def q_ann_topk_ivf_probe(sf_dir: str):
    """Rows-only: the approximate scale path (nprobe=4 of 16 lists) — on a
    cluster the list assignment becomes the partition key, so a probe reads
    nprobe/C of the data; recall at small nprobe is bounded by a unit test."""
    return ann_topk_ivf(sf_dir, n_queries=5, k=5, n_centroids=16, nprobe=4)


def q_ann_topk_ivf_indexed(sf_dir: str):
    """Rows-only: the MATERIALIZED IVF index path — build the
    hive-partitioned list layout under a per-sf tmp dir (cached across
    calls: the index is immutable for a given input), then answer top-k by
    reading ONLY the probed list partitions. With nprobe = n_centroids the
    result is exact, so rows/schema match the in-memory variants while
    exercising true storage-level pruning."""
    import hashlib as _hl
    import os

    from ..stages.embed import ann_topk_ivf_indexed, build_ivf_index

    tag = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join(scratch_root(), f"ivf_index_{tag}")
    if not os.path.exists(os.path.join(index_dir, "centroids.parquet")):
        build_ivf_index(sf_dir, index_dir, n_centroids=16)
    return ann_topk_ivf_indexed(sf_dir, index_dir, n_queries=5, k=5, nprobe=16)


def q_ann_topk_ivf_pq(sf_dir: str):
    """Rows-only: IVF-PQ two-stage retrieval (stages/pq.py) — byte-coded
    ADC candidate generation over probed list partitions, then exact
    re-rank of the top candidates via a result-sized corpus read. The
    memory-compression ANN scale path (16 bytes/vector here vs 512);
    recall and determinism are pytest-pinned (test_pq.py)."""
    import hashlib as _hl
    import os

    from ..stages.pq import ann_topk_ivf_pq, build_pq_index

    tag = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join(scratch_root(), f"pq_index_{tag}")
    if not os.path.exists(os.path.join(index_dir, "codebooks.parquet")):
        build_pq_index(sf_dir, index_dir, n_centroids=16, m=16)
    return ann_topk_ivf_pq(
        sf_dir, index_dir, n_queries=5, k=5, nprobe=16, rerank=20
    )


def q_near_dup_cosine(sf_dir: str):
    return near_dup_pairs_cosine(sf_dir, threshold=0.4)


def q_decon_cosine(sf_dir: str):
    """Semantic benchmark decontamination (stages/embed.decon_cosine_ids):
    corpus vectors whose cosine vs any benchmark vector ≥ 0.4 — catches
    paraphrased eval leakage that the exact n-gram pass
    (``decontaminate_docs``) cannot. Benchmark = the deterministic
    ``vec_id % 7 == 0`` slice; broadcast-once matrix, streaming corpus
    scan, no shuffle."""
    from ..stages.embed import decon_cosine_ids

    return decon_cosine_ids(sf_dir, threshold=0.4, mod=7, rem=0)


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
    actor-pool decode (stub) → feature vectors → LSH-bucketed cosine
    near-dup (the scale path; nothing is collected driver-side). Planted
    payload duplicates yield identical features, hence identical hyperplane
    signatures — recall 1 for exact payload copies by construction."""
    from ..stages.multimodal import FEATURE_DIM

    feats = media_features_ds(n=300, dup_rate=0.1)
    feats = feats.select_columns(["media_id", "feature"])
    return lsh_pairs(
        feats,
        id_col="media_id",
        vec_col="feature",
        threshold=0.95,
        n_bits=8,
        dim=FEATURE_DIM,
    )


def q_training_data_prep(sf_dir: str):
    """The composed training-data-prep flow — the pipeline a pre-training
    data user actually runs, each stage one of this repo's operators:
    documents → token counting → quality scoring → quality filter → md5
    fingerprint → exact dedup (per-batch pre-combine, then one groupby) →
    per-survivor token stats. Streaming end-to-end; SQL-checkable, compared
    against its oracle in pytest (registered beyond the driver's 50-query
    window)."""
    from ray.data.aggregate import Min

    from ..stages.text import md5_exact

    ds = _docs(sf_dir).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )
    ds = ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, 4))
    ds = ds.map_batches(
        lambda df: df[df["quality_ok"]][["doc_id", "text", "n_chars", "n_ws_tokens"]],
        batch_format="pandas",
    )
    ds = ds.map_batches(md5_exact, batch_format="pyarrow")

    def precombine(t: pa.Table) -> pa.Table:
        # per-batch partial: keep the min-doc_id row per hash before the
        # exchange, so the groupby ships ≤ one row per distinct hash per batch
        df = t.select(["text_md5", "doc_id", "n_chars", "n_ws_tokens"]).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values("doc_id").groupby("text_md5", as_index=False).first(),
            preserve_index=False,
        )

    ds = ds.map_batches(precombine, batch_format="pyarrow")
    out = ds.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("n_chars", alias_name="n_chars"),
        Min("n_ws_tokens", alias_name="n_ws_tokens"),
    )
    return out.select_columns(["doc_id", "n_chars", "n_ws_tokens"])


_TRAINING_PREP_SQL = """
WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
q AS (
  SELECT doc_id, text, length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_letters,
         greatest(len(regexp_extract_all(text, '[a-zA-Z]+')), 1) AS n_words
  FROM t
),
ok AS (
  SELECT doc_id, text, n_chars FROM q
  WHERE n_chars >= 20
    AND CAST(n_letters AS DOUBLE) / n_words BETWEEN 2.0 AND 12.0
),
tok AS (
  SELECT doc_id, md5(text) AS h, CAST(n_chars AS BIGINT) AS n_chars,
         CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
              ELSE CAST(len(regexp_split_to_array(
                     regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
                   AS BIGINT) END AS n_ws_tokens
  FROM ok
)
SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars,
       min(n_ws_tokens) AS n_ws_tokens
FROM tok GROUP BY h
"""


def q_decontaminate(sf_dir: str, gram: int = 4, mod: int = 97, rem: int = 13):
    """Benchmark decontamination: surviving corpus doc_ids after dropping
    every document that shares ANY exact word-4-gram with the benchmark
    slice (``doc_id % 97 == 13`` — a deterministic stand-in for an eval
    suite, so the query is hermetic and SQL-checkable).

    Shape: zero shuffles. The small bench side's gram hashes + exact gram
    strings are built in ONE Ray task and broadcast by ObjectRef; the
    corpus streams once through a two-phase (vectorized hash prefilter →
    exact string confirm) ``map_batches`` scan. See ``stages/decon.py``."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.decon import build_benchmark, scan_contaminated

    path = os.path.join(sf_dir, "documents.parquet")

    @ray.remote
    def _bench(p: str):
        t = pq.read_table(p, columns=["doc_id", "text"])
        mask = (t["doc_id"].to_numpy() % mod) == rem  # pc has no mod kernel
        return build_benchmark(t.filter(pa.array(mask))["text"].to_pylist(), gram)

    ref = _bench.remote(path)

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pa.array((t["doc_id"].to_numpy() % mod) != rem)),
        batch_format="pyarrow",
    )

    class Scanner:
        def __init__(self):
            self.bench_hashes, self.bench_set = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return scan_contaminated(df, self.bench_hashes, self.bench_set, gram)

    flags = ds.map_batches(
        Scanner, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )
    survivors = flags.map_batches(
        lambda df: df[~df["contaminated"]][["doc_id"]], batch_format="pandas"
    )
    return survivors


_DECONTAMINATE_SQL = """
WITH ng AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1)),
      i -> array_to_string((string_split(lower(text), ' '))[i:i+3], ' ')))) AS gram
  FROM documents
),
bench AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 97 = 13),
contaminated AS (
  SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (gram)
  WHERE ng.doc_id % 97 <> 13
)
SELECT doc_id FROM documents
WHERE doc_id % 97 <> 13
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


QUERIES = {
    "training_data_prep": q_training_data_prep,
    "decontaminate_docs": q_decontaminate,
    "token_counts": q_token_counts,
    "punct_stats": q_punct_stats,
    "fingerprint_md5": q_fingerprint_md5,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprint_rolling": q_fingerprint_rolling,
    "near_dup_jaccard": q_near_dup_jaccard,
    "near_dup_incremental": q_near_dup_incremental,
    "simhash_pairs": q_simhash_pairs,
    "dedup_survivors_minhash": q_dedup_survivors_minhash,
    "near_dup_clusters": q_near_dup_clusters,
    "dedup_incremental": q_dedup_incremental,
    "repetition_scores": q_repetition_scores,
    "seeded_shuffle": q_seeded_shuffle,
    "weighted_sample_source": q_weighted_sample_source,
    "redact_pii": q_redact_pii,
    "chunk_documents": q_chunk_documents,
    "top_terms": q_top_terms,
    "pack_documents": q_pack_documents,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_ivf_probe": q_ann_topk_ivf_probe,
    "ann_topk_ivf_indexed": q_ann_topk_ivf_indexed,
    "near_dup_cosine": q_near_dup_cosine,
    "decon_cosine": q_decon_cosine,
    "ann_topk_ivf_pq": q_ann_topk_ivf_pq,
    "near_dup_cosine_lsh": q_near_dup_cosine_lsh,
    "media_features": q_media_features,
    "media_near_dup": q_media_near_dup,
}

# Shared pair CTE, aligned with the Ray kernels on degenerate inputs
# (ADVICE r01): word-less docs (empty / whitespace-only / NULL) never pair;
# docs with 1-2 words contribute the whole doc as their single shingle
# (mirrors _word_ngrams' fallback).
_PAIRS_CTE = """
stripped AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '^\\s+|\\s+$', '', 'g') AS st
  FROM documents
),
words AS (
  SELECT doc_id, regexp_split_to_array(st, '\\s+') AS w
  FROM stripped WHERE st <> ''
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM words WHERE len(w) >= 3
),
tri AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM idx
  UNION
  SELECT doc_id, array_to_string(w, ' ') AS g FROM words WHERE len(w) < 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""

_CLUSTERS_SQL = f"""
WITH RECURSIVE {_PAIRS_CTE},
jpairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jpairs
  UNION ALL
  SELECT id_b, id_a FROM jpairs
),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""


_JACCARD_SQL = f"""
WITH {_PAIRS_CTE}
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
"""

_INCR_JACCARD_SQL = f"""
WITH {_PAIRS_CTE}
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
  AND id_a < (SELECT COUNT(*) // 2 FROM documents)
  AND id_b >= (SELECT COUNT(*) // 2 FROM documents)
"""

_SURVIVORS_SQL = f"""
WITH {_PAIRS_CTE},
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

_DECON_COSINE_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
b AS (SELECT emb FROM e WHERE vec_id % 7 = 0),
c AS (SELECT vec_id, emb FROM e WHERE vec_id % 7 <> 0)
SELECT c.vec_id,
       round(max(list_cosine_similarity(c.emb, b.emb)), 6) AS max_cos
FROM c CROSS JOIN b
GROUP BY c.vec_id
HAVING max(list_cosine_similarity(c.emb, b.emb)) >= 0.4
"""

ORACLE_SQL = {
    "decontaminate_docs": _DECONTAMINATE_SQL,
    # degenerate-input alignment (ADVICE r01): empty/whitespace-only text has
    # 0 whitespace tokens (not 1), and NULL text hashes/counts as ''
    # NOTE: trim() strips only spaces in DuckDB; the regexp strip matches
    # Python str.split()'s any-whitespace semantics (tabs, newlines)
    "token_counts": (
        "WITH t AS (SELECT doc_id, coalesce(text, '') AS text, "
        "regexp_replace(coalesce(text, ''), '^\\s+|\\s+$', '', 'g') AS st "
        "FROM documents) "
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CASE WHEN st = '' THEN 0 ELSE "
        "CAST(len(regexp_split_to_array(st, '\\s+')) AS BIGINT) END"
        " AS n_ws_tokens FROM t"
    ),
    "punct_stats": (
        "SELECT doc_id, CAST(length(regexp_replace(coalesce(text, ''), "
        "'[^.!?,;:]', '', 'g')) AS DOUBLE)"
        " / greatest(length(coalesce(text, '')), 1) AS punct_ratio FROM documents"
    ),
    "fingerprint_md5": (
        "SELECT doc_id, md5(coalesce(text, '')) AS text_md5 FROM documents"
    ),
    # duplicate-word repetition signal: integer counts (float-free compare);
    # empty / whitespace-only / NULL docs are 0/0 on both sides
    "repetition_scores": (
        "WITH stripped AS (SELECT doc_id, regexp_replace(coalesce(text,''), "
        "'^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "words AS (SELECT doc_id, unnest(regexp_split_to_array(st, '\\s+')) "
        "AS w FROM stripped WHERE st <> ''), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(count(DISTINCT w) AS BIGINT) AS n_distinct FROM words "
        "GROUP BY doc_id) "
        "SELECT s.doc_id, coalesce(a.n_words, 0) AS n_words, "
        "coalesce(a.n_distinct, 0) AS n_distinct "
        "FROM stripped s LEFT JOIN agg a USING (doc_id)"
    ),
    # deterministic seeded shuffle: (shard, pos) is a reproducible
    # permutation — shard by md5 first hex digit, rank within shard by key
    "seeded_shuffle": (
        "WITH k AS (SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) "
        "AS key FROM documents) "
        "SELECT doc_id, CAST(strpos('0123456789abcdef', substr(key,1,1)) - 1 "
        "AS BIGINT) AS shard, CAST(row_number() OVER ("
        "PARTITION BY substr(key,1,1) ORDER BY key, doc_id) AS BIGINT) AS pos "
        "FROM k"
    ),
    # content-hash threshold sampling at per-source rates (source idx mod 4
    # -> hex cutoff 2/4/8/c); exact and order-independent on both sides
    "weighted_sample_source": (
        "SELECT doc_id, source FROM documents "
        "WHERE md5(coalesce(text,'')) < substr('248c', "
        "(CAST(substr(source, 4) AS INTEGER) % 4) + 1, 1)"
    ),
    "redact_pii": _redact_sql(),
    # salient terms: float-free (tf DESC, df ASC, word ASC) total order
    "top_terms": (
        "WITH stripped AS (SELECT doc_id, regexp_replace(coalesce(text,''), "
        "'^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "words AS (SELECT doc_id, unnest(regexp_split_to_array(st, '\\s+')) "
        "AS w FROM stripped WHERE st <> ''), "
        "tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM words "
        "GROUP BY doc_id, w), "
        "df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM words GROUP BY w), "
        "ranked AS (SELECT tf.doc_id, tf.w AS word, tf.tf, df.df, "
        "row_number() OVER (PARTITION BY tf.doc_id "
        "ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rank "
        "FROM tf JOIN df ON tf.w = df.w) "
        "SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df "
        "FROM ranked WHERE rank <= 3"
    ),
    # overlapping word windows (size 32, stride 24): starts at word
    # positions 1, 25, 49, … — generate_series mirrors "offset < n_words"
    "chunk_documents": (
        "WITH stripped AS (SELECT doc_id, regexp_replace(coalesce(text,''), "
        "'^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "words AS (SELECT doc_id, regexp_split_to_array(st, '\\s+') AS w "
        "FROM stripped WHERE st <> ''), "
        "starts AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 24)) "
        "AS s FROM words) "
        "SELECT doc_id, CAST((s - 1) / 24 AS BIGINT) AS chunk_idx, "
        "CAST(least(s + 31, len(w)) - s + 1 AS BIGINT) AS n_tokens, "
        "array_to_string(list_slice(w, s, least(s + 31, len(w))), ' ') "
        "AS chunk_text FROM starts"
    ),
    # cross-run incremental dedup: first half of the corpus = the persisted
    # index, second half = the increment; survivors carry unseen content
    "dedup_incremental": (
        "WITH cut AS (SELECT (max(doc_id)+1)//2 AS c FROM documents), "
        "seen AS (SELECT DISTINCT md5(coalesce(text,'')) AS fp "
        "FROM documents, cut WHERE doc_id < c) "
        "SELECT d.doc_id FROM documents d, cut "
        "WHERE d.doc_id >= c AND md5(coalesce(d.text,'')) NOT IN "
        "(SELECT fp FROM seen)"
    ),
    "near_dup_jaccard": _JACCARD_SQL,
    "near_dup_incremental": _INCR_JACCARD_SQL,  # pytest-checked (tail entry)
    "dedup_survivors_minhash": _SURVIVORS_SQL,
    "near_dup_clusters": _CLUSTERS_SQL,
    "training_data_prep": _TRAINING_PREP_SQL,  # pytest-checked (tail entry)
    "ann_topk": _ANN_SQL,
    "ann_topk_ivf": _ANN_SQL,  # nprobe = n_centroids ⇒ exact brute-force
    "near_dup_cosine": _COS_PAIRS_SQL,
    "decon_cosine": _DECON_COSINE_SQL,
    # quality_scores, lang_id, fingerprint_rolling, simhash_pairs,
    # ann_topk_ivf_probe, near_dup_cosine_lsh, media_features,
    # media_near_dup: rows-only by design (heuristic / approximate).
}
