"""Benchmark decontamination: drop corpus documents that share any exact
word n-gram with a benchmark (eval/test) document set — the standard
train/test-overlap hygiene step in LLM training-data pipelines.

Reference analog: the reference's cross-section containment checks
(`trials_extractor/validation/validators.py` ⊆-style membership) are the
closest shape; the n-gram-overlap formulation is the training-data version.

Distributed shape (no shuffle at all):
  1. the benchmark side is SMALL (an eval suite, here a deterministic
     ``doc_id % mod == rem`` slice of the corpus so tests are hermetic) —
     its gram hashes + exact gram strings are built inside ONE Ray task and
     broadcast as that task's return ObjectRef (the driver never holds the
     payload),
  2. the corpus streams once through a stateless ``map_batches`` scan doing
     two-phase membership per batch: a vectorized uint64 prefilter
     (``np.isin`` against the sorted bench hash array — zero false
     negatives, both sides hash identically) and an exact gram-string
     confirmation only for the rare hash-hit docs (kills 64-bit
     collisions, so the result is EXACT and SQL-checkable).

At 100 TB the corpus side stays a single streaming pass; the bench side is
bounded by the eval-suite size (typically ≪ 1 GB of grams). If the exact
string set ever outgrows one worker's heap, shard the confirm phase by
gram-hash range — the prefilter already partitions candidates naturally.

Tokenization parity with the DuckDB oracle: ``lower(text)`` split on a
single literal space (``string_split(lower(text), ' ')``); docs with fewer
than ``gram`` words contribute NO grams (no short-doc fallback — unlike
MinHash shingling, where a whole-doc fallback is wanted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup_text import _fmix64, _HASH_KEY, _NGRAM_MIX, _ranges

DEFAULT_GRAM = 4


def _doc_words(text) -> list:
    return ("" if text is None else text).lower().split(" ")


def gram_hashes(texts, gram: int = DEFAULT_GRAM) -> tuple:
    """All docs' word-``gram``-gram hashes, fully vectorized: every word is
    hashed once (C-speed SipHash over the flat word array), gram hashes are
    composed by mixing ``gram`` consecutive word hashes — no Python string
    joins in the hot path. Docs with < ``gram`` words emit nothing.

    Returns (hashes: uint64[total], offsets: int64[n_docs+1])."""
    words_per_doc = [_doc_words(t) for t in texts]
    counts = np.fromiter(
        (len(w) for w in words_per_doc), dtype=np.int64, count=len(words_per_doc)
    )
    w_off = np.concatenate(([0], np.cumsum(counts)))
    flat = np.array([w for ws in words_per_doc for w in ws] or [""], dtype=object)
    wh = pd.util.hash_array(flat, hash_key=_HASH_KEY, categorize=True)[: w_off[-1]]

    full = counts >= gram
    out_counts = np.where(full, counts - gram + 1, 0)
    out_off = np.concatenate(([0], np.cumsum(out_counts)))
    out = np.zeros(out_off[-1], dtype=np.uint64)
    if full.any():
        m = len(wh) - gram + 1
        acc = wh[:m] * _NGRAM_MIX[0]
        for j in range(1, gram):
            acc = acc ^ (wh[j : m + j] * _NGRAM_MIX[j % len(_NGRAM_MIX)])
        acc = _fmix64(acc)
        sel = out_counts[full]
        src = np.repeat(w_off[:-1][full], sel) + _ranges(sel)
        dst = np.repeat(out_off[:-1][full], sel) + _ranges(sel)
        out[dst] = acc[src]
    return out, out_off


def gram_strings(text, gram: int = DEFAULT_GRAM) -> set:
    """Exact gram strings for one doc (confirm phase / bench build only)."""
    w = _doc_words(text)
    return {" ".join(w[j : j + gram]) for j in range(len(w) - gram + 1)}


def build_benchmark(texts, gram: int = DEFAULT_GRAM) -> tuple:
    """(sorted unique uint64 gram hashes, frozenset of exact gram strings)
    for the benchmark side. Runs inside a Ray task; broadcast via its
    return ObjectRef."""
    h, _ = gram_hashes(texts, gram)
    strs: set = set()
    for t in texts:
        strs |= gram_strings(t, gram)
    return np.unique(h), frozenset(strs)


def scan_contaminated(
    df: pd.DataFrame, bench_hashes: np.ndarray, bench_set: frozenset,
    gram: int = DEFAULT_GRAM,
) -> pd.DataFrame:
    """Per-batch two-phase contamination flags: (doc_id, contaminated)."""
    texts = df["text"].tolist()
    h, off = gram_hashes(texts, gram)
    hit = np.isin(h, bench_hashes)
    c = np.concatenate(([0], np.cumsum(hit)))
    doc_hit = (c[off[1:]] - c[off[:-1]]) > 0
    for i in np.flatnonzero(doc_hit):  # rare: confirm exactly
        doc_hit[i] = not gram_strings(texts[i], gram).isdisjoint(bench_set)
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(), "contaminated": doc_hit}
    )
