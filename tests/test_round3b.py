"""Round-3 late training-data ops: repetition scores, seeded shuffle,
source-weighted sampling, PII redaction — oracle pins (tail entries; the
driver's 50-slot window is full) plus planted-input semantics."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name",
    [
        "repetition_scores",
        "seeded_shuffle",
        "weighted_sample_source",
        "redact_pii",
        "chunk_documents",
        "top_terms",
    ],
)
def test_new_tail_queries_match_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(SF), sql, SF)


def _fixture_docs(tmp_path, rows) -> str:
    """A documents.parquet fixture dir usable as sf_dir by both the Ray
    query and the DuckDB oracle (util_compare registers present tables)."""
    d = tmp_path / "fixture_sf"
    d.mkdir()
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))
    return str(d)


def test_redact_pii_planted_matches_oracle_and_semantics(
    ray_session, tmp_path
):
    """The real point of the scrub: planted emails / IPv4s / phones are
    replaced by typed placeholders, clean text is untouched, and the Ray
    kernels equal the generated DuckDB regexp_replace chain on the SAME
    planted corpus (RE2 on both sides)."""
    import __ray_entry__ as entrymod
    from clinical_trials_etl_ray.pipelines.textops import q_redact_pii

    rows = [
        {"doc_id": 0, "text": "reach me at jane.doe+spam@example.co.uk now"},
        {"doc_id": 1, "text": "server 192.168.001.1 then call 415-555-1234"},
        {"doc_id": 2, "text": "intl +1 (415) 555 1234 and 10.0.0.255 mixed"},
        {"doc_id": 3, "text": "no pii here, just words and 42 numbers"},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "a@b.io b@c.net two emails"},
    ]
    sf = _fixture_docs(tmp_path, rows)
    assert_matches_oracle(
        q_redact_pii(sf), entrymod.oracle_sql()["redact_pii"], sf
    )

    got = dict(
        q_redact_pii(sf).to_pandas()[["doc_id", "clean_text"]].itertuples(
            index=False, name=None
        )
    )
    assert got[0] == "reach me at <EMAIL> now"
    assert got[1] == "server <IP> then call <PHONE>"
    assert got[2] == "intl <PHONE> and <IP> mixed"
    assert got[3] == "no pii here, just words and 42 numbers"
    assert got[4] == ""  # NULL scrubs to '' (oracle-aligned coalesce)
    assert got[5] == "<EMAIL> <EMAIL> two emails"


def test_repetition_scores_degenerate_docs(ray_session, tmp_path):
    """Empty, whitespace-only, NULL, and fully-repeated docs: exact counts
    on both sides (the oracle fixture dir carries the planted corpus)."""
    import __ray_entry__ as entrymod
    from clinical_trials_etl_ray.pipelines.textops import q_repetition_scores

    rows = [
        {"doc_id": 0, "text": "a a a a"},          # 4 words, 1 distinct
        {"doc_id": 1, "text": "w x y z"},          # 4 words, 4 distinct
        {"doc_id": 2, "text": ""},                  # 0 / 0
        {"doc_id": 3, "text": "   \t\n "},          # whitespace-only: 0 / 0
        {"doc_id": 4, "text": None},                # NULL: 0 / 0
        {"doc_id": 5, "text": "  pad  pad pad "},   # 3 words, 1 distinct
    ]
    sf = _fixture_docs(tmp_path, rows)
    assert_matches_oracle(
        q_repetition_scores(sf), entrymod.oracle_sql()["repetition_scores"], sf
    )
    got = (
        q_repetition_scores(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got["n_words"]) == [4, 4, 0, 0, 0, 3]
    assert list(got["n_distinct"]) == [1, 4, 0, 0, 0, 1]


def test_chunk_documents_windows_and_coverage(ray_session, tmp_path):
    """Overlapping-window invariants on a planted corpus: empty/NULL docs
    emit no chunks, short docs emit exactly one, every chunk has ≤ window
    tokens, stride-offset prefixes reconstruct the original word sequence,
    and the Ray kernels equal the DuckDB generate_series/list_slice oracle
    on the SAME corpus."""
    import __ray_entry__ as entrymod
    from clinical_trials_etl_ray.pipelines.textops import q_chunk_documents

    long_doc = " ".join(f"w{i}" for i in range(80))  # 80 words → 4 chunks
    rows = [
        {"doc_id": 0, "text": long_doc},
        {"doc_id": 1, "text": "just five little words here"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": " ".join(f"x{i}" for i in range(32))},  # exact
    ]
    sf = _fixture_docs(tmp_path, rows)
    assert_matches_oracle(
        q_chunk_documents(sf), entrymod.oracle_sql()["chunk_documents"], sf
    )

    got = q_chunk_documents(sf).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]
    )
    assert set(got["doc_id"]) == {0, 1, 4}  # empty/NULL emit nothing
    assert (got["n_tokens"] <= 32).all()
    g0 = got[got["doc_id"] == 0]
    # ceil(80/24) = 4 chunks at starts 0,24,48,72
    assert list(g0["chunk_idx"]) == [0, 1, 2, 3]
    assert list(g0["n_tokens"]) == [32, 32, 32, 8]
    # stride-prefix reconstruction: first 24 words of each chunk + the last
    # chunk's tail reproduce the original sequence
    rebuilt = []
    chunks = list(g0["chunk_text"])
    for ctext in chunks[:-1]:
        rebuilt.extend(ctext.split()[:24])
    rebuilt.extend(chunks[-1].split())
    assert rebuilt == long_doc.split()
    # a doc of exactly `window` words is one full chunk... plus the stride
    # tail if n > stride (80>24 handled above; 32>24 ⇒ 2 starts: 0 and 24)
    g4 = got[got["doc_id"] == 4]
    assert list(g4["n_tokens"]) == [32, 8]


def test_top_terms_planted_corpus(ray_session, tmp_path):
    """Salient-term semantics on a corpus built so the float-free
    (tf DESC, df ASC, word ASC) order is fully forced: a word frequent in
    one doc but ubiquitous in the corpus loses to a rarer word of equal tf;
    both sides computed on the SAME fixture dir."""
    import __ray_entry__ as entrymod
    from clinical_trials_etl_ray.pipelines.textops import q_top_terms

    rows = [
        # 'common' appears in every doc (df=4); 'rare' only here (df=1)
        {"doc_id": 0, "text": "rare rare common common filler0"},
        {"doc_id": 1, "text": "common mid mid filler1"},
        {"doc_id": 2, "text": "common mid filler2"},
        {"doc_id": 3, "text": "common solo"},
    ]
    sf = _fixture_docs(tmp_path, rows)
    assert_matches_oracle(
        q_top_terms(sf), entrymod.oracle_sql()["top_terms"], sf
    )
    got = q_top_terms(sf).to_pandas()
    d0 = got[got["doc_id"] == 0].sort_values("rank")
    # tf=2 ties between 'rare' and 'common': df breaks it (1 < 4)
    assert list(d0["word"]) == ["rare", "common", "filler0"]
    assert list(d0["df"]) == [1, 4, 1]


def test_seeded_shuffle_is_permutation_and_parallelism_invariant(
    ray_session,
):
    """(shard, pos) is a bijection over doc_ids; per-shard positions are
    contiguous 1..n; and the assignment is identical when computed at a
    different parallelism (pure function of the seed and doc_id)."""
    from clinical_trials_etl_ray.pipelines.textops import q_seeded_shuffle

    a = q_seeded_shuffle(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].is_unique
    for shard, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))

    b = (
        q_seeded_shuffle(SF)
        .repartition(13)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)

    # shard-count invariance: shard = key hex prefix, so the GLOBAL order
    # by (shard, pos) is the lexicographic key order at ANY n_hex — scaling
    # the shard count (the worker-heap knob) never changes the permutation
    def global_order(n_hex):
        df = q_seeded_shuffle(SF, n_hex=n_hex).to_pandas()
        return list(df.sort_values(["shard", "pos"])["doc_id"])

    assert global_order(1) == global_order(2)
