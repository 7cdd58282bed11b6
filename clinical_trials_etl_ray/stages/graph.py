"""Distributed connected components over a pair stream — the transitive
closure that turns pairwise near-dup hits into DUP CLUSTERS (the principled
grouping behind dedup policies; the greedy keep-smaller-id survivors policy
is the 1-hop approximation of this).

Algorithm: iterative min-label propagation. Labels start as each node's own
id; every round each node takes the min of its label and its neighbors'
labels (one co-partitioned hash join edges⋈labels + one groupby-min — both
exchanges are over the EDGE/LABEL sets, bounded by the near-dup pair count,
never the corpus). Labels are monotone non-increasing, so the global label
sum strictly decreases until the fixpoint — the driver's convergence check
is one tiny sum aggregate per round, and rounds = O(cluster diameter)
(near-dup clusters are short-diameter by construction; ``max_iters`` is a
backstop). Label datasets are materialized per round: they are O(#nodes in
pairs) — bounded by the duplicate count — and materializing prevents the
lineage from re-executing all prior rounds.

Reference analog: none — the reference dedups by key only
(trials_extractor/storage/mongodb_storage.py:193-195); this is part of the
beyond-reference training-data suite (SURVEY §2 'beyond').
"""

from __future__ import annotations

import pandas as pd


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    num_buckets: int = 32,
):
    """Dataset of (node, cluster_id) for every node appearing in ``pairs``,
    where cluster_id is the MINIMUM node id reachable through the pair
    graph (deterministic, parallelism-invariant)."""
    from .join import copartition_join

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df[id_a], df[id_b]], ignore_index=True),
                "dst": pd.concat([df[id_b], df[id_a]], ignore_index=True),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "lbl": df["node"]})

    def min_lbl(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": [g["node"].iloc[0]], "lbl": [g["lbl"].min()]}
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pandas")
        .groupby("node")
        .map_groups(min_lbl, batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("lbl")

    for _ in range(max_iters):
        # neighbor labels: edges ⋈ labels on the source node → (dst, lbl)
        prop = copartition_join(
            edges, labels, on="node", num_buckets=num_buckets
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "lbl": df["lbl"]}),
            batch_format="pandas",
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .map_groups(min_lbl, batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:  # monotone → fixpoint reached
            break
        prev_sum = cur_sum
    return labels
