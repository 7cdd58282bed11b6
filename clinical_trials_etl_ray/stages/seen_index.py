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

#: target committed fingerprints per index partition at CREATION — the
#: seen-index sibling of lsh_index.LSH_PARTITION_ROW_BUDGET; the first
#: increment sizes the layout, ``rebucket_seen_index`` re-sizes it in
#: place when history outgrows it
SEEN_PARTITION_FP_BUDGET = 2_000_000
SEEN_MIN_BUCKETS = 32  # small corpora keep the historical layout floor
SEEN_MAX_BUCKETS = 65_536


def seen_index_width(n_docs: int) -> int:
    """Creation-time partition count for the fingerprint store, scaled
    with the first increment: ``n_docs`` fingerprints land in partitions
    of ~SEEN_PARTITION_FP_BUDGET each. Mirrors ``lsh_index_width``;
    floors at SEEN_MIN_BUCKETS, caps at SEEN_MAX_BUCKETS."""
    n = -(-max(0, int(n_docs)) // SEEN_PARTITION_FP_BUDGET)  # ceil div
    return max(SEEN_MIN_BUCKETS, min(SEEN_MAX_BUCKETS, n))


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


def _bucket_seen_among(index_dir: str, files: list, fps) -> pd.Index:
    """The subset of ``fps`` already committed in this bucket — probe-
    bounded parquet pushdown: index files are written SORTED by fp, so the
    ``isin`` filter prunes row groups via column stats and the task
    materializes only the intersection (O(duplicates in this bucket)),
    never the partition history. The same working-set bound as
    ``lsh_index._read_postings``."""
    probe = [f for f in dict.fromkeys(fps)]
    if not files or not probe:
        return pd.Index([], dtype=object)
    import pyarrow.dataset as pads

    flt = pads.field("fp").isin(probe)
    tables = [
        pq.read_table(
            os.path.join(index_dir, f["path"]), columns=["fp"], filters=flt
        )
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
    index_dir: str, ds, text_col: str = "text", num_buckets: int | None = None
) -> SeenIndexReport:
    """Fold a dataset's fingerprints into the index (create it if absent).

    One increment-only exchange; one task per touched bucket computes the
    set-minus against that bucket's committed partition and writes the
    novel fingerprints as an immutable content-hash-named file (idempotent
    under task retry); ONE atomic manifest commit publishes all of them.

    ``num_buckets`` matters only at CREATION: ``None`` (default) derives
    the partition count from the first increment's size
    (``seen_index_width``). On an existing index the committed layout is
    authoritative (an explicit mismatching value raises); grow an outgrown
    layout in place with ``rebucket_seen_index``.
    """
    if Manifest.exists(index_dir):
        man = Manifest.load(index_dir)
        if num_buckets is not None and num_buckets != man.num_buckets:
            raise ValueError(
                f"index at {index_dir!r} has num_buckets="
                f"{man.num_buckets}, requested {num_buckets} — use "
                "rebucket_seen_index to change the layout in place"
            )
    else:
        man = Manifest.create(
            index_dir,
            num_buckets if num_buckets is not None
            else seen_index_width(ds.count()),
        )
    buckets = man.num_buckets
    stamped = ds.map_batches(
        lambda df: stamp_fingerprints(df, text_col, buckets)[
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
        seen = _bucket_seen_among(
            index_dir, files_by_bucket[bucket], g[FP_COL]
        )
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

    # Growth advisory — the seen-index sibling of the lshidx monitor:
    # committed fingerprints per partition (manifest file metadata only,
    # no data read), including this increment. When the fullest partition
    # exceeds 2x the creation budget, warn with the prescribed fix
    # (rebucket_seen_index at the advised width) and record the advice in
    # the commit metrics so automation can act on it.
    fp_rows: dict = {}
    for b in range(man.num_buckets):
        for f in files_by_bucket[b]:
            fp_rows[b] = fp_rows.get(b, 0) + int(f["row_count"])
    for i in infos:
        fp_rows[i["bucket"]] = fp_rows.get(i["bucket"], 0) + int(i["row_count"])
    max_part_rows = max(fp_rows.values(), default=0)
    advice_width = None
    if max_part_rows > 2 * SEEN_PARTITION_FP_BUDGET:
        advice_width = max(
            man.num_buckets,
            min(
                SEEN_MAX_BUCKETS,
                -(-sum(fp_rows.values()) // SEEN_PARTITION_FP_BUDGET),
            ),
        )
        if advice_width > man.num_buckets:
            import warnings

            warnings.warn(
                f"seen index at {index_dir!r}: fullest partition holds "
                f"{max_part_rows} fingerprints (> 2x the "
                f"{SEEN_PARTITION_FP_BUDGET}-row budget) at "
                f"num_buckets={man.num_buckets}; run "
                f"rebucket_seen_index(index_dir, {advice_width}) to "
                "re-partition in place",
                stacklevel=3,
            )
        else:
            advice_width = None  # already at the cap / width sufficient

    report = SeenIndexReport(version=man.version)
    if infos:
        metrics = {
            "seen_index": True,
            "fps_added": int(sum(i["row_count"] for i in infos)),
            "seen_partition_max_rows": int(max_part_rows),
        }
        if advice_width is not None:
            metrics["seen_rebucket_advice_width"] = int(advice_width)
        man = man.commit(
            infos,
            new_watermark_lsn=man.global_watermark(),
            schema_names=["fp"],
            metrics=metrics,
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
        seen = _bucket_seen_among(
            index_dir, files_by_bucket[bucket], g[FP_COL]
        )
        return g[~g[FP_COL].isin(seen)].drop(columns=drop)

    return stamped.groupby(BUCKET_COL).map_groups(
        _filter, batch_format="pandas"
    )


def filter_then_update(
    index_dir: str, ds, text_col: str = "text",
    num_buckets: int | None = None,
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
        man = Manifest.create(
            index_dir,
            num_buckets if num_buckets is not None
            else seen_index_width(ds.count()),
        )
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


def compact_seen_index(index_dir: str, min_files: int = 2) -> int:
    """Fold each partition's accumulated increment files into one — the
    steady-state maintenance pass: every ``update_seen_index`` writes one
    novel-fps file per touched bucket, so the per-probe file fan-in grows
    with increment count until folded. Sound because the store is an
    append-only fingerprint SET — folding is union + sort, committed with
    ``consumed_paths`` so a fold racing a concurrent update rebases
    cleanly and keeps the newer files. Returns the number of partitions
    folded. Mirrors ``compact_lsh_index``."""
    import ray

    man = Manifest.load(index_dir)

    @ray.remote
    def _fold(bucket: int, files: list):
        fps: set = set()
        for f in files:
            fps.update(
                pq.read_table(
                    os.path.join(index_dir, f["path"]), columns=["fp"]
                )["fp"].to_pylist()
            )
        return bucket, _novel_file_info(index_dir, bucket, sorted(fps))

    refs, kept, consumed = [], {}, set()
    for b in range(man.num_buckets):
        files = man.files_for_bucket(b)
        if len(files) >= min_files:
            refs.append(_fold.remote(b, files))
            consumed.update(f["path"] for f in files)
            kept[b] = []
        else:
            kept[b] = list(files)
    if not refs:
        return 0
    folded: dict = {}
    for bucket, info in ray.get(refs):
        folded[bucket] = [{k: v for k, v in info.items() if k != "bucket"}]
    replace = {
        b: kept[b] + folded.get(b, [])
        for b in set(kept) | set(folded)
        if kept[b] or folded.get(b)
    }
    man2 = man.commit(
        [],
        new_watermark_lsn=man.global_watermark(),
        replace_buckets=replace,
        consumed_paths=consumed,
        metrics={**man.metrics, "seen_compaction": True},
    )
    # age-gated for the same reason as compact_lsh_index: a concurrent
    # update's staged files must survive until their commit lands
    from ..state.manifest import ORPHAN_DATA_MIN_AGE_SEC

    man2.cleanup_orphans(min_data_age_sec=ORPHAN_DATA_MIN_AGE_SEC)
    return len(refs)


def rebucket_seen_index(index_dir: str, new_num_buckets: int) -> int:
    """In-place re-partitioning of the fingerprint store — the seen-index
    sibling of ``rebucket_lsh_index``: when the indexed history outgrows
    the creation-time partition count (each partition is
    O(history/num_buckets)), read the fingerprints once, re-route them at
    the new width through the SAME deterministic hash rule every probe
    uses (``hash_strings(fp) % N`` — exactly ``stamp_fingerprints``'s
    routing), and atomically publish a manifest version that swaps the
    whole layout (``Manifest.commit_layout``). Identical fps from
    re-delivered increments fold away, so the result is also a full
    compaction. Filter/update results are unchanged (pinned ≡ a
    from-scratch rebuild by tests/test_seen_index.py); older versions
    keep the old layout for time travel; reclaim with
    ``Manifest.expire_versions``. Returns the new manifest version.

    Cost: O(index) read+write once — the index is one md5 per distinct
    document (~16 bytes raw), 3-4 orders of magnitude smaller than the
    corpus, so this is cheap relative to re-fingerprinting anything."""
    import ray.data

    man = Manifest.load(index_dir)
    if new_num_buckets == man.num_buckets:
        return man.version
    files = [
        os.path.join(index_dir, f["path"])
        for b in range(man.num_buckets)
        for f in man.files_for_bucket(b)
    ]

    infos: list = []
    if files:
        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(**{
                BUCKET_COL: (
                    hash_strings(df["fp"].to_numpy(object))
                    % np.uint64(new_num_buckets)
                ).astype(np.int32)
            })

        def write(g: pd.DataFrame) -> pd.DataFrame:
            bucket = int(g[BUCKET_COL].iat[0])
            info = _novel_file_info(index_dir, bucket, sorted(set(g["fp"])))
            return pd.DataFrame({"info": pd.Series([info], dtype=object)})

        infos = [
            r["info"]
            for r in ray.data.read_parquet(files)
            .map_batches(stamp, batch_format="pandas")
            .groupby(BUCKET_COL)
            .map_groups(write, batch_format="pandas")
            .take_all()  # tiny: one fileinfo per new partition
        ]

    bucket_files: dict = {}
    for i in infos:
        bucket_files.setdefault(int(i["bucket"]), []).append(
            {k: v for k, v in i.items() if k != "bucket"}
        )
    # carry metrics forward but drop the growth advice the rebucket just
    # acted on (the next update recomputes it at the new layout)
    carried = {
        k: v for k, v in man.metrics.items()
        if k not in ("seen_rebucket_advice_width", "seen_partition_max_rows")
    }
    nxt = man.commit_layout(
        new_num_buckets,
        man.salt_factor,
        bucket_files,
        new_watermark_lsn=man.global_watermark(),
        metrics={
            **carried,
            "seen_rebucket": True,
            "old_num_buckets": man.num_buckets,
        },
    )
    return nxt.version
