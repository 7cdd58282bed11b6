"""CLI surface + export sinks."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_cli_synth_oracle_roundtrip(tmp_path):
    """synth + oracle subcommands run without Ray (subprocess, fast)."""
    binlog = str(tmp_path / "binlog")
    out = subprocess.run(
        [sys.executable, "-m", "clinical_trials_etl_ray.cli", "synth", binlog,
         "--events", "2000", "--convs", "50", "--shards", "4"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert json.loads(out.stdout.strip().splitlines()[-1])["shards"] == 4

    final = str(tmp_path / "final.parquet")
    out = subprocess.run(
        [sys.executable, "-m", "clinical_trials_etl_ray.cli", "oracle", binlog, final],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    rows = json.loads(out.stdout.strip().splitlines()[-1])["rows"]
    assert rows > 0
    assert pq.read_metadata(final).num_rows == rows


def test_export_entities(ray_session, tmp_path):
    import ray.data

    from clinical_trials_etl_ray.sources.writers import (
        export_entities,
        write_partitioned_parquet,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.001/orders.parquet")
    out = export_entities(
        {"orders": ds.select_columns(["o_orderkey", "o_totalprice"]),
         "statuses": ds.select_columns(["o_orderkey", "o_orderstatus"])},
        str(tmp_path / "entities"),
    )
    assert set(out) == {"orders", "statuses"}
    for d in out.values():
        assert any(f.endswith(".parquet") for f in os.listdir(d))

    pdir = write_partitioned_parquet(
        ds.select_columns(["o_orderkey", "o_orderstatus"]),
        str(tmp_path / "by_status"),
        "o_orderstatus",
    )
    subdirs = [d for d in os.listdir(pdir) if d.startswith("o_orderstatus=")]
    assert len(subdirs) >= 2
