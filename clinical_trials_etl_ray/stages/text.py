"""Text-analysis stages for training-data pipelines (actor-pool map_batches).

Each class compiles its patterns / tables ONCE per actor in ``__init__`` and
does vectorized per-batch work in ``__call__`` — the stateful-stage pattern
that fixes the reference's per-record setup cost (it rebuilt a Mongo client
per document, trials_extractor/main.py:266-268).

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword ratios), language ID (char-n-gram +
stopword heuristic), and document fingerprinting (md5 canonical hash +
Rabin-Karp rolling-hash winnowing).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ein", "ist", "zu", "nicht", "mit", "auf"},
    "es": {"el", "la", "de", "y", "un", "una", "es", "que", "por", "con"},
}


class TokenCounter:
    """Whitespace tokens + BPE-ish word/punct segmentation counts."""

    def __init__(self):
        # GPT-2-style coarse pretokenizer: word pieces, numbers, punct runs
        self.bpe_ish = re.compile(r"\w+|[^\w\s]+", re.UNICODE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        batch["n_chars"] = text.str.len().astype("int64")
        # count of non-whitespace runs == whitespace-token count (0 for
        # empty/whitespace-only text), fully vectorized
        batch["n_ws_tokens"] = text.str.count(r"\S+").astype("int64")
        batch["n_bpe_tokens"] = text.str.count(self.bpe_ish.pattern).astype("int64")
        return batch


class QualityScorer:
    """Heuristic quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio — the usual pre-training filters."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.punct = re.compile(r"[.!?,;:]")
        self.stop = _STOPWORDS["en"]
        # one alternation regex counts stopword TOKENS vectorized (a token is
        # a maximal [a-zA-Z]+ run, so (?<![a-zA-Z])/(?![a-zA-Z]) bound it)
        alt = "|".join(sorted(self.stop, key=len, reverse=True))
        self.stop_re = rf"(?<![a-zA-Z])(?:{alt})(?![a-zA-Z])"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n = text.str.len().clip(lower=1)
        batch["punct_ratio"] = text.str.count(self.punct.pattern) / n
        word_runs = text.str.count(self.word.pattern)
        n_words = word_runs.clip(lower=1)
        batch["stopword_ratio"] = (
            text.str.lower().str.count(self.stop_re) / n_words
        )
        # mean word length == (total letters) / (word count), both vectorized
        batch["mean_word_len"] = np.where(
            word_runs > 0, text.str.count(r"[a-zA-Z]") / n_words, 0.0
        )
        batch["upper_ratio"] = text.str.count(r"[A-Z]") / n
        batch["quality_ok"] = (
            (batch["n_chars"] if "n_chars" in batch else n).ge(20)
            & batch["mean_word_len"].between(2.0, 12.0)
        )
        return batch


class LangId:
    """Character-trigram + stopword language scorer (en/fr/de/es heuristic).

    A pure-Python n-gram heuristic (no external models are available in this
    environment); returns the argmax language and its score margin."""

    TOKEN_CLASS = "a-zà-ÿäöüß"

    def __init__(self):
        # one boundary-anchored regex per stopword: a vectorized str.contains
        # per word replaces the per-row tokenize + set intersection (the
        # score is DISTINCT-membership, so contains() is exact)
        self.word_res = {
            lang: [
                rf"(?<![{self.TOKEN_CLASS}]){re.escape(w)}(?![{self.TOKEN_CLASS}])"
                for w in sorted(words)
            ]
            for lang, words in _STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].fillna("").str.lower()
        langs = list(_STOPWORDS)
        scores = np.zeros((len(batch), len(langs)))
        for j, lang in enumerate(langs):
            hits = np.zeros(len(batch))
            for pat in self.word_res[lang]:
                hits += low.str.contains(pat, regex=True).to_numpy()
            scores[:, j] = hits / len(_STOPWORDS[lang])
        best = scores.max(axis=1)
        arg = scores.argmax(axis=1)
        batch["lang_pred"] = np.where(
            best > 0, np.array(langs, dtype=object)[arg], "unknown"
        )
        batch["lang_score"] = best
        return batch


class Fingerprinter:
    """Document fingerprints: md5 of the canonicalized text (exact-dup key)
    and a winnowed min-sample of Rabin-Karp rolling hashes (near-dup-stable
    fingerprint)."""

    BASE = np.uint64(257)
    WINDOW = 16

    # Scalar hash arithmetic runs in Python ints with an explicit 2^64 wrap
    # (identical values to uint64 wrapping, but numpy SCALAR ops emit
    # RuntimeWarning: overflow on every wrap); vector ops wrap silently.
    _MASK = (1 << 64) - 1

    def __init__(self, n_keep: int = 4):
        self.n_keep = n_keep
        # precompute BASE^(WINDOW-1) (mod 2^64) for the rolling update
        self.pow_w = np.uint64(pow(int(self.BASE), self.WINDOW - 1, 1 << 64))

    def _rolling_min(self, s: str) -> list:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        w = self.WINDOW
        base = int(self.BASE)
        if len(b) < w:
            h = 0
            for x in b:  # < WINDOW iterations
                h = (h * base + int(x)) & self._MASK
            return [h] * self.n_keep
        # vectorized: the rolling recurrence equals the direct polynomial
        # h_i = sum_j b[i+j]*BASE^(w-1-j) (mod 2^64), computed as w shifted
        # vector adds — no O(len) Python loop
        n = len(b) - w + 1
        hashes = np.zeros(n, dtype=np.uint64)
        p = 1
        for j in range(w - 1, -1, -1):  # w=16 vectorized passes
            hashes += b[j : j + n] * np.uint64(p)
            p = (p * base) & self._MASK
        return sorted(np.unique(hashes)[: self.n_keep].tolist())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # canonicalization is a vectorized pandas .str chain; md5 stays
        # per-row (inherently so, and oracle-parity with DuckDB md5())
        canon = (
            batch["text"]
            .fillna("")
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
            .str.lower()
        )
        batch["fp_md5"] = canon.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        batch["fp_minhashes"] = batch["text"].fillna("").map(self._rolling_min)
        return batch


def md5_exact(batch: pa.Table) -> pa.Table:
    """Vectorized-enough md5 content hash (SQL-comparable: DuckDB md5())."""
    texts = batch.column("text").to_pylist()
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("text_md5", pa.array(h, pa.string()))
