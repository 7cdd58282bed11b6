"""Explode (unnest) a list column, carrying parent key columns.

Reference analogs: the per-trial contact exploder
(st_trial_analytics.py:1749-1778, E9), Mongo's $unwind aggregations
(A3/A11), and the implicit parent-child FK stamp at flatten time
(trials_extractor/exporters/csv_exporter.py:73-248, J7): child rows carry
the parent key.

Vectorized: list offsets → np.repeat of parent indices; no Python per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def explode_list_column(
    table: pa.Table, list_col: str, keep: list, value_name: str | None = None
) -> pa.Table:
    """One output row per list element; ``keep`` columns repeated per child."""
    col = table.column(list_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    if col.null_count:
        # Arrow permits null slots with a nonzero offset span; flatten()
        # skips their children, so the repeat counts must be zeroed to match.
        valid = ~col.is_null().to_numpy(zero_copy_only=False)
        lengths = np.where(valid, lengths, 0)
    parent_idx = np.repeat(np.arange(table.num_rows), lengths)
    values = col.flatten()
    arrays = [table.column(k).take(pa.array(parent_idx)) for k in keep]
    names = list(keep) + [value_name or list_col]
    return pa.Table.from_arrays(arrays + [values], names=names)
