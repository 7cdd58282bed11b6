"""Near-duplicate detection: MinHash+LSH, SimHash, exact n-gram Jaccard.

Distributed shape (the standard lake-scale recipe):
  1. per-batch vectorized shingling + signatures (stateless map_batches —
     the permutation matrices are built once per actor; shingle hashing is
     one C-speed SipHash call per batch and the minhash reduction is a single
     ``np.minimum.reduceat`` — no per-shingle Python),
  2. explode to (band_id, band_hash, doc_id) rows,
  3. ONE groupby shuffle on a COARSE partition of the band hash (64
     partitions, pandas-groupby within each) — never one Ray group per band
     bucket: millions of tiny groups is pure scheduler overhead,
  4. exact verification of candidates (Jaccard on shingle sets / Hamming on
     signatures); the candidate set is tiny relative to the corpus.

With b bands of r rows, P(candidate | J=j) = 1-(1-j^r)^b; the defaults
(32 bands × 4 rows) give >1-5e-8 recall at j≥0.8, so LSH+exact-verify is
exact w.h.p. — which is why the DuckDB all-pairs Jaccard oracle can check it.

Scale notes: candidate-pair emission per band bucket is capped (df_cap) to
bound hot-shingle blowup (a bucket shared by f docs yields O(f²) pairs); at
lake scale you always cap document frequency and log what was dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = np.uint64((1 << 61) - 1)
_HASH_KEY = "cdc-shingle-hash"  # 16 bytes, fixed => deterministic everywhere
N_COARSE_PARTITIONS = 64


def _word_ngrams(text: str, n: int) -> set:
    w = text.split()
    if len(w) < n:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _batch_shingle_hashes(texts, ngram: int) -> tuple:
    """All docs' shingle-hash arrays in ONE vectorized hash call.

    Returns (hashes: uint64[total], offsets: int64[n_docs+1])."""
    per_doc = [sorted(_word_ngrams(t or "", ngram)) for t in texts]
    counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=len(per_doc))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat = np.array(
        [s for doc in per_doc for s in doc] or [""], dtype=object
    )
    hashes = pd.util.hash_array(flat, hash_key=_HASH_KEY, categorize=True)
    return hashes[: offsets[-1]], offsets


class MinHasher:
    """Per-batch minhash signatures over word n-gram shingles (vectorized)."""

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 7,
                 block: int = 1 << 16):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.block = block  # shingles per reduce block (bounds peak memory)

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix."""
        hashes, offsets = _batch_shingle_hashes(texts, self.ngram)
        n_docs = len(offsets) - 1
        out = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(hashes) == 0:
            return out
        # process docs in slabs so (num_perm × shingles) stays bounded
        doc_lo = 0
        while doc_lo < n_docs:
            doc_hi = doc_lo
            while doc_hi < n_docs and offsets[doc_hi + 1] - offsets[doc_lo] <= self.block:
                doc_hi += 1
            doc_hi = max(doc_hi, doc_lo + 1)
            h = hashes[offsets[doc_lo] : offsets[doc_hi]]
            if len(h):
                prod = (h[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
                starts = (offsets[doc_lo : doc_hi] - offsets[doc_lo]).astype(np.int64)
                nonempty = np.flatnonzero(np.diff(
                    np.concatenate((starts, [len(h)]))) > 0)
                red = np.minimum.reduceat(prod, starts[nonempty], axis=1)
                out[doc_lo + nonempty, :] = red.T
            doc_lo = doc_hi
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch["text"].tolist())
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "minhash_sig": list(sigs.astype("int64")),
            }
        )


class BandExploder:
    """signature → (part, band_id, band_hash, doc_id) rows, vectorized.

    ``part`` is the coarse shuffle key: hash-mixed so each of the
    N_COARSE_PARTITIONS Ray groups holds many band buckets."""

    def __init__(self, bands: int = 32, rows: int = 4):
        self.bands = bands
        self.rows = rows
        # mix columns of each band segment with distinct odd multipliers
        rng = np.random.default_rng(4242)
        self.mix = rng.integers(1, 1 << 62, size=(bands, rows), dtype=np.uint64) | np.uint64(1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["minhash_sig"].to_numpy()).astype(np.uint64)  # (n, perms)
        n = sigs.shape[0]
        doc_ids = batch["doc_id"].to_numpy()
        frames = []
        for b in range(self.bands):
            seg = sigs[:, b * self.rows : (b + 1) * self.rows]  # (n, rows)
            h = (seg * self.mix[b][None, :]).sum(axis=1, dtype=np.uint64)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            frames.append(
                pd.DataFrame(
                    {
                        "part": (h % np.uint64(N_COARSE_PARTITIONS)).astype(np.int64),
                        "band_id": np.full(n, b, dtype=np.int64),
                        "band_hash": h.astype(np.int64),
                        "doc_id": doc_ids,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)


def candidate_pairs_partition(group: pd.DataFrame, df_cap: int = 200) -> pd.DataFrame:
    """One coarse partition → unique candidate (id_a < id_b) pairs.

    pandas-groupby over the many band buckets inside; buckets larger than
    df_cap docs are dropped (hot-shingle cap — log/record at scale)."""
    out_a, out_b = [], []
    for (_bid, _bh), g in group.groupby(["band_id", "band_hash"], sort=False):
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > df_cap:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
        )
    df = pd.DataFrame(
        {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
    ).drop_duplicates()
    return df


def dedupe_pairs(ds):
    """Cross-partition pair dedup with a coarse key (same trick)."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df["id_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + df["id_b"].to_numpy().astype(np.uint64)
        )
        df = df.assign(pair_part=(h % np.uint64(N_COARSE_PARTITIONS)).astype(np.int64))
        return df

    tagged = ds.map_batches(add_part, batch_format="pandas")
    return tagged.groupby("pair_part").map_groups(
        lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["pair_part"]),
        batch_format="pandas",
    )


def exact_jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    sa, sb = _word_ngrams(text_a or "", ngram), _word_ngrams(text_b or "", ngram)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


class SimHasher:
    """64-bit SimHash over word features (IDF-free, deterministic,
    vectorized: one SipHash call + bit-matrix sum per batch)."""

    @staticmethod
    def _simhash_many(texts) -> np.ndarray:
        words_per_doc = [(t or "").split() for t in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                             count=len(words_per_doc))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        flat = np.array([w for ws in words_per_doc for w in ws] or [""], dtype=object)
        h = pd.util.hash_array(flat, hash_key=_HASH_KEY, categorize=True)[: offsets[-1]]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                ).astype(np.int64) * 2 - 1  # (+1/-1) per bit
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        out = np.zeros(len(texts), dtype=np.uint64)
        for i in range(len(texts)):
            seg = bits[offsets[i] : offsets[i + 1]]
            if len(seg) == 0:
                continue
            acc = seg.sum(axis=0)
            # disjoint bit weights: sum == bitwise OR
            out[i] = (weights * (acc > 0)).sum(dtype=np.uint64)
        return out.view(np.int64)  # two's-complement reinterpret (arrow int64)

    @staticmethod
    def simhash(text: str) -> int:
        return int(SimHasher._simhash_many([text])[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": self._simhash_many(batch["text"].tolist()),
            }
        )


def simhash_blocks(batch: pd.DataFrame, n_blocks: int = 4) -> pd.DataFrame:
    """Explode each simhash into n_blocks 16-bit block keys: two hashes
    within Hamming distance (n_blocks-1) share at least one block
    (pigeonhole), so grouping by (block_id, block_val) finds all candidates
    at distance ≤ 3 for 4 blocks."""
    u = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    frames = []
    for b in range(n_blocks):
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "block_id": np.full(len(u), b, dtype=np.int64),
                    "block_val": ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64),
                    "simhash": batch["simhash"].to_numpy(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
