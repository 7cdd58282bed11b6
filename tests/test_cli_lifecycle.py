"""CLI contract for the round-3 lifecycle surface: one lake driven
end-to-end through subprocess invocations (each owns its Ray session) —
delete → purge → upsert → diff → sql → render → snapshot → bootstrap.
Argparse wiring for every registered subcommand is smoke-checked too."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _cli(*args, timeout=240):
    out = subprocess.run(
        [sys.executable, "-m", "clinical_trials_etl_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", check=True,
        timeout=timeout,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_every_subcommand_parses():
    """--help for each registered subcommand exercises the argparse wiring
    without Ray (fast; a typo'd flag registration fails here)."""
    import clinical_trials_etl_ray.cli as cli_mod

    for cmd in ("synth", "replay", "compact", "read", "render", "sql",
                "diff", "delete", "purge", "upsert", "snapshot",
                "bootstrap", "changes", "sync", "matview", "tindex", "seen", "stats",
                "oracle", "verify", "rebucket", "lshidx"):
        with pytest.raises(SystemExit) as ei:
            cli_mod.main([cmd, "--help"])
        assert ei.value.code == 0, cmd


@pytest.mark.slow
def test_lifecycle_cli_end_to_end(tmp_path):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    _cli("synth", binlog, "--events", "3000", "--convs", "30",
         "--shards", "2")
    rep = _cli("replay", binlog, lake, "--buckets", "4")
    assert rep["final_version"] >= 1

    d = _cli("delete", lake, "--conv-min", "c1", "--conv-max", "c9",
             "--dry-run")
    assert d["dry_run"] and d["matched_rows"] > 0
    d = _cli("delete", lake, "--conv-min", "c1", "--conv-max", "c9")
    assert d["matched_rows"] > 0

    p = _cli("purge", lake, "c0")
    assert p["rows_purged"] >= 0

    corr = str(tmp_path / "corr.parquet")
    import numpy as np
    pq.write_table(pa.table({
        "conv_id": pa.array(["c20"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["cli lifecycle"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([np.datetime64("2031-06-01", "us")],
                       pa.timestamp("us")),
    }), corr)
    u = _cli("upsert", lake, corr)
    assert u["rows_applied"] == 1

    diff_out = str(tmp_path / "diff.parquet")
    _cli("diff", lake, diff_out, "--v-old", "1")
    dt = pq.ParquetDataset(diff_out).read()
    ops = set(dt["op"].to_pylist())
    assert "delete" in ops  # the range delete shows up in the audit

    s = _cli("sql", lake, "SELECT COUNT(*) AS n FROM final")
    assert s["rows"] == 1 and s["preview"][0]["n"] > 0

    rend = str(tmp_path / "rendered")
    _cli("render", lake, rend, "--format", "parquet")
    rt = pq.ParquetDataset(rend).read()
    assert rt.num_rows > 0 and "transcript" in rt.schema.names

    snap = str(tmp_path / "snap")
    sn = _cli("snapshot", lake, snap, "--cut-lsn", "committed")
    assert sn["cut_lsn"] > 0
    lake2 = str(tmp_path / "lake2")
    b = _cli("bootstrap", snap, lake2, "--buckets", "2")
    assert b["rows_loaded"] > 0

    idx = str(tmp_path / "tidx")
    t = _cli("tindex", "build", lake, idx)
    assert t["postings_written"] > 0
    # the upserted text is searchable; AND across its tokens hits conv c20
    res = _cli("tindex", "search", lake, idx,
               "--tokens", "cli", "lifecycle", "--mode", "all")
    assert res["conv_ids"] == ["c20"]
    assert _cli("tindex", "refresh", lake, idx)["buckets_refreshed"] == 0
    rk = _cli("tindex", "rank", lake, idx, "--tokens", "lifecycle", "--k", "3")
    assert rk["ranked"] and rk["ranked"][0]["conv_id"] == "c20"
    assert rk["ranked"][0]["score"] > 0

    # in-place re-partitioning: row count and the upserted row survive
    before = _cli("sql", lake, "SELECT COUNT(*) AS n FROM final")
    rb = _cli("rebucket", lake, "--buckets", "8", "--salt", "2")
    assert rb["new_num_buckets"] == 8 and rb["final_version"] is not None
    after = _cli("sql", lake, "SELECT COUNT(*) AS n FROM final")
    assert after["preview"][0]["n"] == before["preview"][0]["n"]
    s2 = _cli("sql", lake,
              "SELECT text FROM final WHERE conv_id='c20' AND turn_idx=0")
    assert s2["preview"][0]["text"] == "cli lifecycle"
