"""In-batch LWW dedupe: keep the max-(ts, lsn) winner per (conv_id, turn_idx).

This is the stateless partial-combine that runs BEFORE the bucket shuffle so
hot keys collapse to at most one row per batch — the pre-aggregation pattern
that keeps the single hot-path shuffle small (SURVEY §7.2 step 4). Because
"max by (ts, lsn)" is associative and commutative, applying it per batch,
again per bucket group, and again against base files at read time always
yields the same global winner — this is what makes hot-key salting and
chunked commits safe.

Reference analog: the unique-index dedup + LWW upsert in
trials_extractor/storage/mongodb_storage.py:87-92,193-195,204-245, made
deterministic on data (ts, lsn) instead of arrival order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SORT_KEYS = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("ts", "ascending"),
    ("lsn", "ascending"),
]


def lww_winners(table: pa.Table) -> pa.Table:
    """Vectorized: order by (key, ts, lsn), keep the last row per key.

    The sort runs as ``np.lexsort`` over integer arrays only — conv_id is
    dictionary-encoded to int codes first (grouping needs equality, not
    lexicographic order), ts is viewed as int64 (NaT == INT64_MIN, so any
    real timestamp beats a null), turn/lsn are ints. This is ~6x cheaper
    than a multi-column Arrow sort with string comparisons and the dedupe
    stage is on the hot ingest path.

    Handles duplicate delivery too (identical (key, ts, lsn) rows collapse
    to one).
    """
    n = table.num_rows
    if n <= 1:
        return table
    conv = table.column("conv_id").combine_chunks()
    codes = pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    turn = table.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
    ts_i = (
        table.column("ts")
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .view("int64")
    )
    lsn = table.column("lsn").combine_chunks().to_numpy(zero_copy_only=False)

    order = np.lexsort((lsn, ts_i, turn, codes))  # codes = primary key
    codes_s = codes[order]
    turn_s = turn[order]
    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    is_last[:-1] = (codes_s[:-1] != codes_s[1:]) | (turn_s[:-1] != turn_s[1:])
    return table.take(pa.array(order[is_last]))


def dedupe_batch(batch: pa.Table) -> pa.Table:
    """map_batches-compatible wrapper (pyarrow in/out, zero-copy take)."""
    return lww_winners(batch)
