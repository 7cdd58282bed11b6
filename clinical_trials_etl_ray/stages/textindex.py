"""Incremental inverted TEXT index over the CDC lake — token search without
a full scan.

The secondary-index idea of `stages/merge.py` (conv min/max per file) applied
to text: each bucket materializes its live rows' distinct
``(token, conv_id)`` postings as an immutable, token-sorted parquet file,
published through the same exactly-once ``Manifest`` commit protocol as the
lake and the materialized views. Maintenance is the matview refresh loop:
only buckets whose committed file lists changed recompute (file-list
fingerprints — metadata-only skip, O(change rate) not O(lake)), so the
search index FOLLOWS the lake under continuous ingest the way the IVF
index follows it for embeddings (stages/embed.ivf_index_add).

A search reads, per bucket, ONLY the postings row groups matching the
probe tokens (token-sorted files + parquet min/max stats ⇒ storage-level
pruning), then resolves AND/OR semantics over the tiny matched
``(conv_id, token)`` set — query cost is O(posting lists touched), never
O(corpus). Conversations are bucket-local on unsalted lakes, but the
final combine runs over the result-sized matches anyway, so salted lakes
are handled identically.

Tokenization parity with the DuckDB oracles (and stages/decon.py):
``lower(text)`` split on a single literal space; empty tokens dropped.
Updates/deletes are exact: a bucket recompute rebuilds postings from the
bucket's LIVE rows, so a conversation whose text no longer contains a
token leaves its posting list on refresh.

Reference analog: the 5 secondary Mongo indexes incl. the text-ish ones
(trials_extractor/storage/mongodb_storage.py:94-134); re-expressed as an
incrementally-maintained partitioned artifact instead of a per-row B-tree.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import Manifest, bucket_dir
from .matview import _files_fingerprint
from .merge import _write_immutable, live_rows, resolve_bucket


@dataclass
class TextIndexReport:
    buckets_total: int = 0
    buckets_refreshed: int = 0
    postings_written: int = 0
    idx_version: int = 0


_POSTING_SCHEMA = pa.schema(
    [pa.field("token", pa.string()), pa.field("conv_id", pa.string())]
)


def bucket_postings(live: pa.Table) -> pa.Table:
    """Distinct (token, conv_id) postings of a bucket's live rows,
    token-sorted so parquet row-group min/max stats prune probes.
    Vectorized: pandas str split + explode, one drop_duplicates."""
    if live.num_rows == 0:
        return _POSTING_SCHEMA.empty_table()
    s = live.select(["conv_id", "text"]).to_pandas()
    toks = s["text"].fillna("").str.lower().str.split(" ")
    n = toks.str.len().to_numpy()
    flat = np.concatenate(toks.to_numpy()) if n.sum() else np.array([], object)
    out = pd.DataFrame(
        {
            "token": flat,
            "conv_id": s["conv_id"].to_numpy().repeat(n),
        }
    )
    out = out[out["token"] != ""].drop_duplicates()
    out = out.sort_values(["token", "conv_id"], kind="stable")
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        _POSTING_SCHEMA
    )


def refresh_text_index(
    lake_dir: str, idx_dir: str, full: bool = False
) -> TextIndexReport:
    """Bring the inverted index up to the lake's committed state —
    matview-style incremental maintenance (see module docstring)."""
    import ray

    lake_man = Manifest.load(lake_dir)
    idx_man = Manifest.load_or_create(
        idx_dir, lake_man.num_buckets, salt_factor=lake_man.salt_factor
    )
    report = TextIndexReport(
        buckets_total=lake_man.num_buckets, idx_version=idx_man.version
    )
    prior_fps = idx_man.metrics.get("bucket_fps", {})
    todo, fps = [], {}
    for b in range(lake_man.num_buckets):
        files = lake_man.files_for_bucket(b)
        fps[str(b)] = _files_fingerprint(files)
        if full or fps[str(b)] != prior_fps.get(str(b)):
            todo.append((b, files))
    if not todo:
        return report

    @ray.remote
    def _recompute(bucket: int, files: list):
        from ..functions.hashing import content_hash

        postings = bucket_postings(
            live_rows(
                resolve_bucket(
                    lake_dir, bucket, files, columns=["conv_id", "text"]
                )
            )
        )
        if postings.num_rows == 0:
            return bucket, None
        h = content_hash(postings)
        path = _write_immutable(
            postings, bucket_dir(idx_dir, bucket), f"tidx-{h}.parquet"
        )
        return bucket, {
            "path": os.path.relpath(path, idx_dir),
            "kind": "tidx",
            "content_hash": h,
            "row_count": postings.num_rows,
            "min_lsn": -1,
            "max_lsn": -1,
        }

    replace, rows = {}, 0
    for bucket, info in ray.get(
        [_recompute.remote(b, fs) for b, fs in todo]
    ):
        replace[bucket] = [info] if info else []
        rows += info["row_count"] if info else 0

    idx_man = idx_man.commit(
        [],
        new_watermark_lsn=lake_man.global_watermark(),
        replace_buckets=replace,
        metrics={
            "text_index": True,
            "lake_version": lake_man.version,
            "bucket_fps": fps,
        },
    )
    report.buckets_refreshed = len(todo)
    report.postings_written = rows
    report.idx_version = idx_man.version
    return report


def build_text_index(lake_dir: str, idx_dir: str) -> TextIndexReport:
    return refresh_text_index(lake_dir, idx_dir, full=True)


def search_text_index(
    idx_dir: str, tokens: list, mode: str = "all"
) -> pa.Table:
    """conv_ids whose final-state text contains ALL (``mode="all"``) or ANY
    (``mode="any"``) of ``tokens`` — resolved from posting lists only.

    One Ray task per bucket reads the bucket's postings with a
    ``token IN probe`` parquet filter (token-sorted files ⇒ row-group
    stat pruning skips non-matching groups at the storage layer); the
    driver combines the RESULT-SIZED matched pairs: OR = union,
    AND = convs matching all |tokens| distinct tokens. Sorted conv_id
    output for deterministic comparisons."""
    import pyarrow.dataset as pads
    import ray

    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    probe = sorted({t.lower() for t in tokens if t})
    if not probe:
        return pa.table({"conv_id": pa.array([], pa.string())})
    man = Manifest.load(idx_dir)

    @ray.remote
    def _probe_bucket(paths: list):
        frags = [
            pads.dataset(p, format="parquet").to_table(
                filter=pads.field("token").isin(probe)
            )
            for p in paths
        ]
        good = [f for f in frags if f.num_rows] or [
            _POSTING_SCHEMA.empty_table()
        ]
        return pa.concat_tables(good)

    futures = []
    for b in range(man.num_buckets):
        paths = [
            os.path.join(idx_dir, f["path"]) for f in man.files_for_bucket(b)
        ]
        if paths:
            futures.append(_probe_bucket.remote(paths))
    matched = (
        pa.concat_tables(ray.get(futures))
        if futures
        else _POSTING_SCHEMA.empty_table()
    )
    df = matched.to_pandas().drop_duplicates()
    if df.empty:
        return pa.table({"conv_id": pa.array([], pa.string())})
    if mode == "any":
        convs = df["conv_id"].unique()
    else:
        per_conv = df.groupby("conv_id")["token"].nunique()
        convs = per_conv[per_conv == len(probe)].index.to_numpy()
    return pa.table({"conv_id": pa.array(sorted(convs), pa.string())})
