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
        batch["n_ws_tokens"] = text.str.split(r"\s+", regex=True).map(
            lambda t: sum(1 for x in t if x)
        ).astype("int64")
        batch["n_bpe_tokens"] = text.str.findall(self.bpe_ish).str.len().astype("int64")
        return batch


class QualityScorer:
    """Heuristic quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio — the usual pre-training filters."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.punct = re.compile(r"[.!?,;:]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n = text.str.len().clip(lower=1)
        batch["punct_ratio"] = text.str.count(self.punct.pattern) / n
        words = text.str.findall(self.word)
        n_words = words.str.len().clip(lower=1)
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in self.stop)
        ) / n_words
        batch["mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        batch["upper_ratio"] = text.str.count(r"[A-Z]") / n
        batch["quality_ok"] = (
            (batch["n_chars"] if "n_chars" in batch else n) .ge(20)
            & batch["mean_word_len"].between(2.0, 12.0)
        )
        return batch


class LangId:
    """Character-trigram + stopword language scorer (en/fr/de/es heuristic).

    A pure-Python n-gram heuristic (no external models are available in this
    environment); returns the argmax language and its score margin."""

    def __init__(self):
        self.profiles = {
            lang: {f" {w} " for w in words} for lang, words in _STOPWORDS.items()
        }
        self.token = re.compile(r"[a-zà-ÿäöüß]+")

    def _score(self, text: str) -> tuple:
        toks = set(self.token.findall(text.lower()))
        best_lang, best = "unknown", 0.0
        for lang, words in _STOPWORDS.items():
            s = len(toks & words) / max(1, len(words))
            if s > best:
                best_lang, best = lang, s
        return best_lang, best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scored = batch["text"].fillna("").map(self._score)
        batch["lang_pred"] = scored.str[0]
        batch["lang_score"] = scored.str[1]
        return batch


class Fingerprinter:
    """Document fingerprints: md5 of the canonicalized text (exact-dup key)
    and a winnowed min-sample of Rabin-Karp rolling hashes (near-dup-stable
    fingerprint)."""

    BASE = np.uint64(257)
    WINDOW = 16

    def __init__(self, n_keep: int = 4):
        self.n_keep = n_keep
        self.ws = re.compile(r"\s+")
        # precompute BASE^(WINDOW-1) for the rolling update
        p = np.uint64(1)
        for _ in range(self.WINDOW - 1):
            p = p * self.BASE
        self.pow_w = p

    def _rolling_min(self, s: str) -> list:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        w = self.WINDOW
        if len(b) < w:
            h = np.uint64(0)
            for x in b:
                h = h * self.BASE + x
            return [int(h)] * self.n_keep
        # vectorized rolling hash: prefix "powers" trick
        n = len(b) - w + 1
        hashes = np.zeros(n, dtype=np.uint64)
        h = np.uint64(0)
        for x in b[:w]:
            h = h * self.BASE + x
        hashes[0] = h
        for i in range(1, n):  # O(len) scalar loop, but cheap uint ops
            h = (h - b[i - 1] * self.pow_w) * self.BASE + b[i + w - 1]
            hashes[i] = h
        return sorted(np.unique(hashes)[: self.n_keep].tolist())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        canon = batch["text"].fillna("").map(
            lambda s: self.ws.sub(" ", s).strip().lower()
        )
        batch["fp_md5"] = canon.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        batch["fp_minhashes"] = batch["text"].fillna("").map(self._rolling_min)
        return batch


def md5_exact(batch: pa.Table) -> pa.Table:
    """Vectorized-enough md5 content hash (SQL-comparable: DuckDB md5())."""
    import pyarrow.compute as pc

    texts = batch.column("text").to_pylist()
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("text_md5", pa.array(h, pa.string()))
