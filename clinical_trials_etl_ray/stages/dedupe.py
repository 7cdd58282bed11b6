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
    """Vectorized: sort by (key, ts, lsn) and keep the last row per key.

    Handles duplicate delivery too (identical (key, ts, lsn) rows collapse to
    one). Null ts sorts first, so any real timestamp beats a null.
    """
    n = table.num_rows
    if n <= 1:
        return table
    idx = pc.sort_indices(table, sort_keys=_SORT_KEYS, null_placement="at_start")
    table = table.take(idx)

    conv = table.column("conv_id").combine_chunks()
    codes = pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    turn = table.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)

    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    is_last[:-1] = (codes[:-1] != codes[1:]) | (turn[:-1] != turn[1:])
    return table.take(pa.array(np.flatnonzero(is_last)))


def dedupe_batch(batch: pa.Table) -> pa.Table:
    """map_batches-compatible wrapper (pyarrow in/out, zero-copy take)."""
    return lww_winners(batch)
