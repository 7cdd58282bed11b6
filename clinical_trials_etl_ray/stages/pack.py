"""Sequence packing: assign variable-length documents to fixed token-budget
training sequences ("packs") — the standard pretraining-prep step between
tokenization and batching (wasted pad tokens = wasted compute).

Distributed shape: ONE deterministic hash-group shuffle
(hash(doc_id) % num_groups), then first-fit-decreasing greedy packing
independently inside each group via ``map_groups``. Packing is inherently
sequential per container set, so the parallel unit is the group: results
are deterministic and parallelism-invariant because group membership and
the within-group order (tokens desc, id asc) depend only on the data.
Group-local packing is how production pipelines do it at scale — a global
optimum is NP-hard and irrelevant at 10^9 docs, while FFD guarantees
≤ 11/9·OPT + 1 packs per group.

Docs longer than the budget get a pack of their own, flagged
``overflow=True`` (the caller decides truncate/split policy) — never
silently dropped.

Reference analog: none (beyond-reference training-data suite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_group(g: pd.DataFrame, budget: int, count_col: str, id_col: str) -> pd.DataFrame:
    """FFD over one group: sort by (tokens desc, id asc), place each doc in
    the first open pack with room, else open a new pack."""
    g = g.sort_values([count_col, id_col], ascending=[False, True])
    counts = g[count_col].to_numpy()
    remaining: list[int] = []  # remaining capacity per open pack
    assign = np.empty(len(g), dtype=np.int64)
    overflow = np.zeros(len(g), dtype=bool)
    for i, c in enumerate(counts):
        if c > budget:
            assign[i] = len(remaining)
            remaining.append(0)  # oversized: own full pack
            overflow[i] = True
            continue
        for p, rem in enumerate(remaining):
            if rem >= c:
                assign[i] = p
                remaining[p] = rem - c
                break
        else:
            assign[i] = len(remaining)
            remaining.append(budget - c)
    grp = int(g["_pack_group"].iloc[0])
    return pd.DataFrame(
        {
            id_col: g[id_col].to_numpy(),
            count_col: counts,
            "pack_id": [f"{grp:05d}-{p:06d}" for p in assign],
            "overflow": overflow,
        }
    )


def pack_sequences(
    ds,
    budget: int,
    count_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
):
    """Dataset of (id, count, pack_id, overflow): every input row assigned
    to exactly one pack whose member counts sum to ≤ budget (except
    flagged single-doc overflow packs). ``num_groups`` is the parallelism
    of the packing stage AND the granularity of packing locality."""
    from ..functions.hashing import hash_strings

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_strings(df[id_col].astype(str).to_numpy())
        return df.assign(
            _pack_group=(h % np.uint64(num_groups)).astype(np.int64)
        )

    return (
        ds.map_batches(stamp, batch_format="pandas")
        .groupby("_pack_group")
        .map_groups(
            lambda g: pack_group(g, budget, count_col, id_col),
            batch_format="pandas",
        )
    )
