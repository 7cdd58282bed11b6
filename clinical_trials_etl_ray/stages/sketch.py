"""Mergeable sketches for approximate analytics at lake scale.

HyperLogLog distinct counting: per-batch vectorized register updates
(``np.maximum.at`` over leading-zero counts), associative register merge
(elementwise max), standard bias-corrected estimate. The sketch is a
DETERMINISTIC function of the input SET (fixed SipHash key, order- and
partition-invariant), so any parallelism yields the same estimate — the
property that makes it safe as a distributed operator. At 2^p registers the
relative standard error is ~1.04/sqrt(2^p) (~1.6% at p=12, 4 KiB state).

Distributed shape: ``map_batches`` emits one tiny register row per batch
(4 KiB, independent of batch size); the driver merges the handful of
partials — never the data. A ``groupby(...).aggregate``-style per-group
variant falls out of the same kernel (registers per group key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """Position of the first 1-bit (1-based) in the low ``bits`` bits of w,
    counted from the MSB side — vectorized leading-zero count + 1."""
    out = np.full(len(w), bits + 1, dtype=np.int8)
    found = np.zeros(len(w), dtype=bool)
    for i in range(bits - 1, -1, -1):  # bits ≤ 58 vectorized passes
        bit = (w >> np.uint64(i)) & np.uint64(1)
        hit = (~found) & (bit == 1)
        out[hit] = bits - i
        found |= hit
    return out


class HLLSketch:
    """HyperLogLog with 2^p registers over 64-bit hashes."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.int8)

    def add_hashes(self, h: np.ndarray) -> "HLLSketch":
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        np.maximum.at(self.registers, idx, _rho(w, 64 - self.p))
        return self

    def add(self, values) -> "HLLSketch":
        return self.add_hashes(hash_strings(np.asarray(values, dtype=object)))

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        if other.p != self.p:
            raise ValueError("cannot merge sketches of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int) -> "HLLSketch":
        s = cls(p)
        s.registers = np.frombuffer(b, dtype=np.int8).copy()
        return s


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count of ``col`` over a Dataset: one 4 KiB
    register row per batch, merged on the driver (the data never leaves the
    workers). Deterministic at any parallelism."""

    def partial(t: pa.Table) -> pa.Table:
        s = HLLSketch(p)
        s.add_hashes(hash_strings(t.column(col).cast(pa.string())))
        return pa.Table.from_pydict({"registers": [s.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = HLLSketch(p)
    for row in parts:
        acc.merge(HLLSketch.from_bytes(row["registers"], p))
    return acc.estimate()


def approx_distinct_by(ds, key: str, col: str, p: int = 12):
    """Grouped approximate distinct: one register row per (batch, key)
    partial, merged per key in a single small groupby — the sketch analog
    of the partial/final combine used by the exact aggregates. Returns a
    Dataset of (key, approx_distinct). Exchange volume is
    O(batches × keys-per-batch × 2^p bytes), independent of row count."""
    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pandas()
        hashes = hash_strings(t.column(col).cast(pa.string()))
        out_k, out_r = [], []
        # dropna=False: the NULL key forms its own group, as SQL GROUP BY does
        for k, idx in keys.groupby(keys, dropna=False).groups.items():
            s = HLLSketch(p)
            s.add_hashes(hashes[np.asarray(idx)])
            out_k.append(k)
            out_r.append(s.to_bytes())
        return pa.table({key: out_k, "registers": out_r})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = HLLSketch(p)
        for b in g["registers"]:
            acc.merge(HLLSketch.from_bytes(b, p))
        return pd.DataFrame(
            {key: [g[key].iloc[0]], "approx_distinct": [acc.estimate()]}
        )

    return parts.groupby(key).map_groups(merge_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries)
# ---------------------------------------------------------------------------


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Compress exact (key, count) pairs to a Misra-Gries summary of at
    most ``k`` counters: subtract the (k+1)-th largest count from every
    counter and drop the non-positive remainder. Classic guarantee: every
    key with true frequency > n/(k+1) keeps a positive counter, and each
    kept counter underestimates its key's true count by at most n/(k+1).
    Vectorized (argpartition, no Python loop over keys)."""
    if len(keys) <= k:
        return keys, counts
    # (k+1)-th largest = threshold to subtract
    thresh = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    kept = counts - thresh
    pos = kept > 0
    return keys[pos], kept[pos]


def mg_merge(parts: list, k: int):
    """Merge MG summaries (Agarwal et al., 'Mergeable Summaries'): sum
    counters per key, then compress back to k. Associative and
    order-insensitive up to the standard MG error bound; the candidate
    GUARANTEE (every phi-heavy key survives with k >= 1/phi) is preserved
    by merging."""
    if not parts:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    keys = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    uk, inv = np.unique(keys.astype(str), return_inverse=True)
    sums = np.zeros(len(uk), dtype=np.int64)
    np.add.at(sums, inv, counts)
    return mg_compress(uk, sums, k)


def heavy_hitters(ds, col: str, phi_denom: int, k: int | None = None):
    """Exact phi-heavy hitters of ``ds[col]`` (keys with count*phi_denom
    >= total) in two shuffle-free passes — the 10-TB shape for "which
    conversations dominate the log" without a full groupby:

      1. sketch pass: per-batch exact value counts compressed to a k-counter
         Misra-Gries partial (tiny, independent of batch size); driver
         merges the partials. With k >= phi_denom every true heavy hitter
         is guaranteed a surviving counter (no false negatives), so the
         merged summary's keys are a complete CANDIDATE set.
      2. verify pass: exact counts for candidates only — `is_in` filter +
         per-batch value-count partials, combined on the driver (bounded by
         #candidates <= k rows per batch), plus the exact total row count.

    Returns a pyarrow Table (key, n) of the TRUE heavy hitters with EXACT
    counts, sorted by (n desc, key) — deterministic at any parallelism.
    """
    if k is None:
        k = 2 * phi_denom
    if k < phi_denom:
        raise ValueError("k must be >= phi_denom for the candidate guarantee")

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).cast(pa.string()).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(vals, return_counts=True)
        uk, cnt = mg_compress(uk, cnt.astype(np.int64), k)
        # a null-key sentinel row always carries the batch's TRUE row count
        # — a summary that compressed to zero counters must still
        # contribute to the total, or the exact phi threshold drifts
        keys_out = np.concatenate([uk.astype(object), [None]])
        return pa.table({
            "key": pa.array(keys_out, pa.string()),
            "cnt": pa.array(np.concatenate([cnt, [0]]), pa.int64()),
            "n_rows": pa.array(
                [0] * len(uk) + [len(vals)], pa.int64()
            ),
        })

    parts = []
    totals = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            real = b.filter(pa.compute.is_valid(b["key"]))
            if real.num_rows:
                parts.append((
                    real["key"].to_numpy(zero_copy_only=False),
                    real["cnt"].to_numpy(zero_copy_only=False),
                ))
            totals += int(pa.compute.sum(b["n_rows"]).as_py() or 0)
    keys, _ = mg_merge(parts, k)
    if len(keys) == 0 or totals == 0:
        return pa.table({"key": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})

    cand = pa.array(sorted(str(x) for x in keys), pa.string())

    def exact_partial(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.string())
        hit = pa.compute.is_in(v, value_set=cand)
        vals = v.filter(hit).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(vals, return_counts=True)
        return pa.table({
            "key": pa.array(uk.astype(object), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg: dict = {}
    for b in ds.map_batches(exact_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for key, n in zip(b["key"].to_pylist(), b["n"].to_pylist()):
            agg[key] = agg.get(key, 0) + int(n)

    rows = sorted(
        ((key, n) for key, n in agg.items() if n * phi_denom >= totals),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return pa.table({
        "key": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Log-binned quantile sketch (deterministic, mergeable, fixed bins)
# ---------------------------------------------------------------------------
#
# The scale path for (grouped) quantiles when the value domain is too wide
# for the exact value-count histogram (pipelines/analytics.q_quantiles_by_lang
# — exact, but its exchange grows with distinct-value cardinality): bins are
# FIXED log-spaced intervals [γ^k, γ^(k+1)) with γ = (1 + rel_err)², so the
# per-batch partial is a tiny (bin → count) vector, merge is plain addition
# in ANY order (fixed bins ⇒ fully deterministic at any parallelism — unlike
# KLL/t-digest whose state depends on merge order), and the reported
# quantile — the geometric midpoint γ^(k+1/2) of the rank's bin — is within
# a factor (1 + rel_err) of a TRUE rank-ceil(q·n) element. ~700 bins span
# 1..10^6 at 1% error; the exchange is O(groups × bins), independent of
# row count. Zero and negatives get sign-mirrored bins, nulls are excluded
# (matching SQL quantile aggregates).

_QBIN_OFFSET = np.int64(1) << np.int64(40)  # |k| < 2^40 for any float64


def quantile_bin_codes(values: np.ndarray, rel_err: float) -> np.ndarray:
    """Sign-aware log-bin code per value (vectorized): 0 for v == 0,
    ±(floor(ln|v|/ln γ) + OFFSET) otherwise. NaNs must be filtered by the
    caller."""
    gamma = (1.0 + rel_err) ** 2
    v = np.asarray(values, dtype=np.float64)
    codes = np.zeros(len(v), dtype=np.int64)
    nz = v != 0
    k = np.floor(np.log(np.abs(v[nz])) / np.log(gamma)).astype(np.int64)
    codes[nz] = np.sign(v[nz]).astype(np.int64) * (k + _QBIN_OFFSET)
    return codes


def quantile_bin_value(codes: np.ndarray, rel_err: float) -> np.ndarray:
    """Representative value per bin code — the geometric midpoint, so the
    relative error vs any true element of the bin is ≤ rel_err."""
    gamma = (1.0 + rel_err) ** 2
    c = np.asarray(codes, dtype=np.int64)
    out = np.zeros(len(c), dtype=np.float64)
    nz = c != 0
    k = np.abs(c[nz]) - _QBIN_OFFSET
    out[nz] = np.sign(c[nz]) * gamma ** (k.astype(np.float64) + 0.5)
    return out


def approx_quantiles_by(
    ds,
    key: str,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    rel_err: float = 0.01,
):
    """Grouped approximate quantiles over a Ray Dataset: per-batch
    (key, bin, count) partials (pandas C-level groupby inside map_batches —
    each batch ships at most groups-in-batch × occupied-bins rows, never the
    raw values), then ONE groupby over the tiny partials whose finalize
    sums bins and walks the cumulative histogram. Quantile rule mirrors
    DuckDB ``quantile_disc`` (rank ceil(q·n)) with each rank's element
    replaced by its bin midpoint — within rel_err relatively.

    Deterministic at any parallelism: fixed bins, commutative merges.
    Output: one row per group — key, n, q50/q90/... float columns."""

    qcols = [f"q{int(q * 100)}" for q in qs]

    def precombine(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[key, col]].dropna()
        out = pd.DataFrame(
            {
                key: sub[key],
                "code": quantile_bin_codes(sub[col].to_numpy(), rel_err),
            }
        )
        return out.groupby([key, "code"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    partials = ds.map_batches(precombine, batch_format="pandas")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {key: pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 **{c: pd.Series([], dtype="float64") for c in qcols}}
            )
        kval = g[key].iloc[0]
        h = g.groupby("code", as_index=False)["cnt"].sum().sort_values("code")
        codes = h["code"].to_numpy()
        cum = h["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {key: [kval], "n": [n]}
        for q, cname in zip(qs, qcols):
            rank = max(int(np.ceil(q * n)), 1)
            code = codes[np.searchsorted(cum, rank)]
            row[cname] = [float(quantile_bin_value(np.array([code]), rel_err)[0])]
        return pd.DataFrame(row)

    return partials.groupby(key).map_groups(finalize, batch_format="pandas")
