"""Cross-run incremental deduplication: a persisted seen-fingerprint index.

At 100 TB you cannot re-shuffle the historical corpus to dedup each day's
increment against it. The engine instead keeps a SEEN-FINGERPRINT INDEX —
one md5 per distinct document ever ingested (~16 bytes/doc, 4 orders of
magnitude smaller than the corpus) — stored PRE-PARTITIONED by fingerprint
hash into ``num_buckets`` parquet partitions and published through the same
exactly-once ``Manifest`` commit protocol as the lake (optimistic-
concurrency version files, content-hash-named immutable files, orphan
cleanup, time travel).

Dedup of an increment exchanges ONLY the increment: one ``map_batches``
stamps ``(md5, bucket)`` per row, ONE hash groupby routes each row to its
fingerprint's bucket, and one task per touched bucket reads that bucket's
index partition (index_size / num_buckets rows) and drops rows whose
fingerprint is already present. The historical corpus is never read or
moved. Partitioning assumption: one bucket's index slice plus one bucket's
share of the increment fit a worker heap — ``num_buckets`` is the knob,
the same constraint ``read_final_table`` documents.

``update_seen_index`` appends each bucket's NOVEL fingerprints (set-minus
against the existing partition, within-increment deduped) as new immutable
files, so the index is append-only and mergeable; because the bucket
routing is deterministic, building it in N increments equals building it
in one shot. ``filter_then_update`` runs both against ONE stamping pass.

Reference analog: the scraper's Mongo unique index on nct_id
(trials_extractor/storage/mongodb_storage.py:94-134) is the same
"have I seen this document before" state, rebuilt as a distributed,
versioned, pre-partitioned fingerprint lake instead of a server-side
B-tree consulted per insert.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_strings
from ..state.manifest import Manifest, bucket_dir
from .merge import _write_immutable

FP_COL = "_fp"
BUCKET_COL = "_fp_bucket"


@dataclass
class SeenIndexReport:
    """What one index update did (mirrors ``ReplayReport`` observability)."""

    buckets_touched: int = 0
    fps_added: int = 0
    version: int = 0


def stamp_fingerprints(
    df: pd.DataFrame, text_col: str, num_buckets: int
) -> pd.DataFrame:
    """Append (md5 hex, fingerprint bucket) columns. md5 is per-row by
    nature (DuckDB-md5 oracle parity — same trade as ``stages.text
    .md5_exact``); the bucket routing is the vectorized uint64 hash."""
    fps = [
        hashlib.md5((t if isinstance(t, str) else "").encode()).hexdigest()
        for t in df[text_col]
    ]
    out = df.copy()
    out[FP_COL] = fps
    out[BUCKET_COL] = (
        hash_strings(np.asarray(fps, dtype=object)) % np.uint64(num_buckets)
    ).astype(np.int32)
    return out


def _bucket_fps(index_dir: str, files: list) -> pd.Index:
    """One bucket's committed fingerprints (bounded: index/num_buckets)."""
    if not files:
        return pd.Index([], dtype=object)
    tables = [
        pq.read_table(os.path.join(index_dir, f["path"]), columns=["fp"])
        for f in files
    ]
    return pd.Index(pa.concat_tables(tables)["fp"].to_pandas())


def _novel_file_info(index_dir: str, bucket: int, novel: list) -> dict:
    h = hashlib.sha1("\n".join(novel).encode()).hexdigest()[:16]
    path = _write_immutable(
        pa.table({"fp": pa.array(novel, pa.string())}),
        bucket_dir(index_dir, bucket),
        f"seen-{h}.parquet",
    )
    return {
        "bucket": int(bucket),
        "path": os.path.relpath(path, index_dir),
        "kind": "seen",
        "content_hash": h,
        "row_count": len(novel),
        "min_lsn": -1,
        "max_lsn": -1,
    }


def update_seen_index(
    index_dir: str, ds, text_col: str = "text", num_buckets: int = 32
) -> SeenIndexReport:
    """Fold a dataset's fingerprints into the index (create it if absent).

    One increment-only exchange; one task per touched bucket computes the
    set-minus against that bucket's committed partition and writes the
    novel fingerprints as an immutable content-hash-named file (idempotent
    under task retry); ONE atomic manifest commit publishes all of them.
    """
    man = Manifest.load_or_create(index_dir, num_buckets)
    stamped = ds.map_batches(
        lambda df: stamp_fingerprints(df, text_col, num_buckets)[
            [FP_COL, BUCKET_COL]
        ],
        batch_format="pandas",
    )
    return _update_from_stamped(man, stamped)


def _update_from_stamped(man: Manifest, stamped) -> SeenIndexReport:
    index_dir = man.lake_dir
    files_by_bucket = {
        b: man.files_for_bucket(b) for b in range(man.num_buckets)
    }

    def _write_novel(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g[BUCKET_COL].iat[0])
        seen = _bucket_fps(index_dir, files_by_bucket[bucket])
        novel = sorted(set(g[FP_COL][~g[FP_COL].isin(seen)]))
        if not novel:
            return pd.DataFrame({"info": pd.Series([], dtype=object)})
        info = _novel_file_info(index_dir, bucket, novel)
        return pd.DataFrame({"info": pd.Series([info], dtype=object)})

    infos = [
        row["info"]
        for row in stamped.groupby(BUCKET_COL)
        .map_groups(_write_novel, batch_format="pandas")
        .take_all()  # tiny: ≤ one fileinfo row per touched bucket
    ]
    report = SeenIndexReport(version=man.version)
    if infos:
        man = man.commit(
            infos,
            new_watermark_lsn=man.global_watermark(),
            schema_names=["fp"],
            metrics={
                "seen_index": True,
                "fps_added": int(sum(i["row_count"] for i in infos)),
            },
        )
        report = SeenIndexReport(
            buckets_touched=len(infos),
            fps_added=int(sum(i["row_count"] for i in infos)),
            version=man.version,
        )
    return report


# build is the degenerate update (load_or_create seeds an empty index)
build_seen_index = update_seen_index


def filter_unseen(ds, index_dir: str, text_col: str = "text"):
    """Rows of ``ds`` whose content fingerprint is NOT in the index.

    Pure cross-run filter: duplicates WITHIN ``ds`` all survive (compose
    with the exact-dedup operator for within-increment collapse). Exchange
    volume is the increment only; each bucket task loads one index
    partition once.
    """
    man = Manifest.load(index_dir)
    buckets = man.num_buckets  # ship the int, not the manifest, per task
    stamped = ds.map_batches(
        lambda df: stamp_fingerprints(df, text_col, buckets),
        batch_format="pandas",
    )
    return _filter_from_stamped(man, stamped)


def _filter_from_stamped(man: Manifest, stamped):
    index_dir = man.lake_dir
    files_by_bucket = {
        b: man.files_for_bucket(b) for b in range(man.num_buckets)
    }
    drop = [FP_COL, BUCKET_COL]

    def _filter(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g[BUCKET_COL].iat[0])
        seen = _bucket_fps(index_dir, files_by_bucket[bucket])
        return g[~g[FP_COL].isin(seen)].drop(columns=drop)

    return stamped.groupby(BUCKET_COL).map_groups(
        _filter, batch_format="pandas"
    )


def filter_then_update(
    index_dir: str, ds, text_col: str = "text", num_buckets: int = 32
):
    """The nightly-ingest composite: survivors = rows the index has never
    seen, AND the increment's novel fingerprints are folded into the index
    for the next run. ONE stamping pass: the stamped increment is
    materialized (it is the SMALL side — the history is never read beyond
    the touched index partitions) and feeds both exchanges. The filter
    runs against the PRE-update manifest snapshot (captured before the
    commit), so the increment's own fingerprints never filter it.

    ``num_buckets`` only applies when the index does not exist yet; an
    existing index keeps its committed bucket count.

    Returns ``(survivors Dataset, SeenIndexReport)``.
    """
    if Manifest.exists(index_dir):
        man = Manifest.load(index_dir)
    else:
        man = Manifest.load_or_create(index_dir, num_buckets)
    buckets = man.num_buckets
    stamped = ds.map_batches(
        lambda df: stamp_fingerprints(df, text_col, buckets),
        batch_format="pandas",
    ).materialize()
    survivors = _filter_from_stamped(man, stamped)  # pre-update snapshot
    report = _update_from_stamped(
        man,
        stamped.map_batches(
            lambda df: df[[FP_COL, BUCKET_COL]], batch_format="pandas"
        ),
    )
    return survivors, report
