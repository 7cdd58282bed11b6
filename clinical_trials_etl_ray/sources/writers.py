"""Export sinks — the reference's exporters re-expressed on Ray Data.

Reference: JSON single/per-section/JSONL exporters
(trials_extractor/exporters/json_exporter.py:12-128), CSV exporter with
quoting config (exporters/csv_exporter.py:13-47) and multi-entity CSV export
(csv_exporter.py:269-304). Here every sink is a streaming ``Dataset.write_*``
— a directory of part files written in parallel, never one giant file — plus
a partitioned variant (one subdirectory per key value) so a failed export can
be resumed per partition (SURVEY §4 resumable-output requirement).
"""

from __future__ import annotations

import os


def write_json(ds, path: str) -> str:
    """JSONL directory (ndjson part files) — S5/S7."""
    ds.write_json(path)
    return path


def write_csv(ds, path: str) -> str:
    """CSV directory — S8."""
    ds.write_csv(path)
    return path


def write_parquet(ds, path: str, min_rows_per_file: int | None = None) -> str:
    """Parquet directory — the preferred lake sink."""
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(path, **kwargs)
    return path


def write_partitioned_parquet(ds, path: str, partition_col: str) -> str:
    """One subdirectory per partition value (hive layout) — the multi-entity
    export generalization (S9): re-runs can skip finished partitions."""
    ds.write_parquet(path, partition_cols=[partition_col])
    return path


def export_sections(
    ds,
    out_dir: str,
    sections: dict,
    key_cols: list | None = None,
    combined: bool = True,
    fmt: str = "json",
) -> dict:
    """Per-section export: one output directory per named column group, each
    carrying the key columns plus that section's columns, plus an optional
    combined export (reference: per-section JSON exporter writing one file
    per top-level section + a combined document,
    trials_extractor/exporters/json_exporter.py:62-102).

    ``sections`` maps section name → column list. Sections are projected
    with ``select_columns`` (column pruning happens before the write, so a
    section export ships only its columns) and written in parallel part
    files per section — never one giant file."""
    writers = {"parquet": write_parquet, "csv": write_csv, "json": write_json}
    if fmt not in writers:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(writers)}")
    key_cols = list(key_cols or [])
    results = {}
    for name, cols in sections.items():
        proj = ds.select_columns(key_cols + [c for c in cols if c not in key_cols])
        results[name] = writers[fmt](proj, os.path.join(out_dir, name))
    if combined:
        results["combined"] = writers[fmt](ds, os.path.join(out_dir, "combined"))
    return results


def export_entities(entity_datasets: dict, out_dir: str, fmt: str = "parquet") -> dict:
    """S9 multi-entity export: one dataset per logical entity, one directory
    per entity (reference wrote trials.csv, locations.csv, … — here each
    entity is a parallel-written directory)."""
    writers = {"parquet": write_parquet, "csv": write_csv, "json": write_json}
    if fmt not in writers:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(writers)}")
    results = {}
    for name, ds in entity_datasets.items():
        results[name] = writers[fmt](ds, os.path.join(out_dir, name))
    return results
