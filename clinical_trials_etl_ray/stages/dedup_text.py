"""Near-duplicate detection: MinHash+LSH, SimHash, exact n-gram Jaccard.

Distributed shape (the standard lake-scale recipe):
  1. per-batch vectorized shingling + signatures (stateless map_batches —
     the permutation/projection matrices are built once per actor),
  2. explode to (band_id, band_hash, doc_id) rows,
  3. ONE groupby shuffle on the band key; each group emits candidate pairs,
  4. exact verification of candidates (Jaccard on shingle sets / Hamming on
     signatures) with the candidate set being tiny relative to the corpus.

With b bands of r rows, P(candidate | J=j) = 1-(1-j^r)^b; the defaults
(32 bands × 4 rows) give >1-5e-8 recall at j≥0.8, so LSH+exact-verify is
exact w.h.p. — which is why the DuckDB all-pairs Jaccard oracle can check it.

Scale notes: candidate-pair emission per group is capped (df_cap) to bound
hot-shingle blowup (a shingle shared by f docs yields O(f²) pairs); at lake
scale you always cap document frequency and log what was dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _word_ngrams(text: str, n: int) -> set:
    w = text.split()
    if len(w) < n:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _hash_shingles(shingles: set) -> np.ndarray:
    """Stable 64-bit hashes of shingle strings (md5-based, process-stable)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )


class MinHasher:
    """Per-batch minhash signatures over word n-gram shingles."""

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        sh = _hash_shingles(_word_ngrams(text or "", self.ngram))
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) mod p for all perms × shingles, then min per perm
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = batch["text"].map(self.signature)
        batch["minhash_sig"] = sigs.map(lambda s: s.astype("int64").tolist())
        return batch[["doc_id", "minhash_sig"]]


class BandExploder:
    """signature → (band_id, band_hash, doc_id) rows for the LSH groupby."""

    def __init__(self, bands: int = 32, rows: int = 4):
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, sig in zip(batch["doc_id"], batch["minhash_sig"]):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(self.bands):
                seg = s[b * self.rows : (b + 1) * self.rows]
                import hashlib

                h = int.from_bytes(
                    hashlib.md5(seg.tobytes() + bytes([b])).digest()[:8], "little"
                )
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(h - (1 << 63))  # signed for arrow int64
        return pd.DataFrame(
            {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        )


def candidate_pairs_from_band(group: pd.DataFrame, df_cap: int = 200) -> pd.DataFrame:
    """All (a<b) doc pairs sharing one (band_id, band_hash) bucket."""
    ids = np.unique(group["doc_id"].to_numpy())
    if len(ids) < 2 or len(ids) > df_cap:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def exact_jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    sa, sb = _word_ngrams(text_a or "", ngram), _word_ngrams(text_b or "", ngram)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


class SimHasher:
    """64-bit SimHash over word features (IDF-free, deterministic)."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        import hashlib

        acc = np.zeros(64, dtype=np.int64)
        for w in (text or "").split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out - (1 << 63)  # signed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = batch["text"].map(self.simhash).astype("int64")
        return batch[["doc_id", "simhash"]]


def simhash_blocks(batch: pd.DataFrame, n_blocks: int = 4) -> pd.DataFrame:
    """Explode each simhash into n_blocks 16-bit block keys: two hashes
    within Hamming distance (n_blocks-1) share at least one block
    (pigeonhole), so grouping by (block_id, block_val) finds all candidates
    at distance ≤ 3 for 4 blocks."""
    rows = {"doc_id": [], "block_id": [], "block_val": [], "simhash": []}
    for doc_id, sh in zip(batch["doc_id"], batch["simhash"]):
        u = np.uint64(sh + (1 << 63))
        for b in range(n_blocks):
            val = int((u >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            rows["doc_id"].append(doc_id)
            rows["block_id"].append(b)
            rows["block_val"].append(val)
            rows["simhash"].append(sh)
    return pd.DataFrame(rows)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
