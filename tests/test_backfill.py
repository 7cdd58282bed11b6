"""Column backfill over the lake: derive a new column for EVERY current
row and write it back as an upsert batch (same ts, engine LSN above all ⇒
deterministic replacement; additive schema evolution carries the new
column). The composed "enrich the whole corpus" batch job, built entirely
from existing surfaces: read_final_table → map_batches → upsert_table."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.pipelines.retention import upsert_table
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


@pytest.fixture()
def lake(ray_session, tmp_path):
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=3_000, n_convs=25, seed=29, delete_rate=0.05,
                      shuffle_window=16)
    write_binlog_shards(spec, binlog, n_shards=2, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)
    return lake


def test_backfill_token_count_column(lake):
    before = (
        read_final_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )

    def enrich(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(t["text"], ""), r"\S+"
        ).cast(pa.int64())
        return t.append_column("n_tokens", n)

    batch = read_final_table(lake).map_batches(enrich, batch_format="pyarrow")
    rep = upsert_table(lake, batch)
    assert rep.rows_applied == len(before)

    after = (
        read_final_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    # every row enriched, nothing else changed
    assert "n_tokens" in after.columns
    assert after["n_tokens"].notna().all()
    want = (
        before["text"].fillna("").str.count(r"\S+").astype("int64")
    )
    pd.testing.assert_series_equal(
        after["n_tokens"].astype("int64"), want, check_names=False
    )
    pd.testing.assert_frame_equal(after[before.columns], before)

    # a later producer event wins over the backfilled row as usual (its
    # newer ts outranks; the evolved column null-fills on it) — backfill
    # does not freeze the stream
    import numpy as np
    import pyarrow.parquet as pq

    v = after.iloc[0]
    late = pa.table({
        "lsn": pa.array([10**6], pa.int64()),
        "op": pa.array(["update"], pa.string()),
        "conv_id": pa.array([v["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(v["turn_idx"])], pa.int32()),
        "role": pa.array([v["role"]], pa.string()),
        "text": pa.array(["post-backfill update"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array(
            [before["ts"].max().to_datetime64() + np.timedelta64(1, "h")],
            pa.timestamp("us"),
        ),
    })
    import os
    shard = os.path.join(os.path.dirname(lake), "late")
    os.makedirs(shard, exist_ok=True)
    pq.write_table(late, os.path.join(shard, "s.parquet"))
    replay(shard, lake, num_buckets=4)
    got = read_final_table(lake, conv_id=str(v["conv_id"])).to_pandas()
    hit = got[got["turn_idx"] == v["turn_idx"]]
    assert hit.iloc[0]["text"] == "post-backfill update"
    assert pd.isna(hit.iloc[0]["n_tokens"])  # evolved column null on new row
