"""In-place lake re-partitioning (pipelines/retention.py rebucket) — the
round-4 lifecycle verb for a lake that outgrew its creation-time layout.

Pinned here (VERDICT r3 item 2's done-criteria):
  - rebucketed state ≡ sync_replica-rebuilt state at the same new layout
    (winners INCLUDING tombstones and out-of-band LSNs), ≡ the pre-rebucket
    final table;
  - time travel across the layout change (old version reads with the old
    layout);
  - ingest continues correctly after the rebucket (equals a fresh replay
    of the full log into the new layout);
  - point lookups route through the new (num_buckets, salt_factor);
  - diff_versions refuses to span the layout change (documented contract);
  - noop short-circuit.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from clinical_trials_etl_ray.pipelines.replay import replay, sync_replica
from clinical_trials_etl_ray.pipelines.retention import delete_where, rebucket
from clinical_trials_etl_ray.stages.merge import read_change_feed, read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _final(lake: str, **kw) -> pd.DataFrame:
    df = read_final_table(lake, **kw).to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _winners(lake: str) -> pd.DataFrame:
    """Full winner set incl. tombstones + OOB rows — stronger than the
    final table (layout equivalence must preserve deletes too)."""
    df = read_change_feed(lake, since_lsn=-1).to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def lake_env(ray_session, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("rebucket")
    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(
        n_events=5_000, n_convs=40, seed=41, delete_rate=0.08,
        duplicate_rate=0.05, shuffle_window=64,
    )
    write_binlog_shards(spec, binlog, n_shards=4, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=2)
    # an out-of-band tombstone ABOVE the watermark: rebucket must carry it
    delete_where(lake, conv_id="c3")
    return {"tmp": tmp_path, "binlog": binlog, "lake": lake}


def test_rebucket_equivalence_and_time_travel(lake_env):
    lake = lake_env["lake"]
    want_final = _final(lake)
    want_winners = _winners(lake)
    old_version = Manifest.load(lake).version

    # the replica rebuilt at the target layout is the equivalence oracle
    replica = str(lake_env["tmp"] / "replica")
    sync_replica(lake, replica, num_buckets=8, hot_key_salt=2, cut="committed")

    rep = rebucket(lake, 8, new_salt_factor=2)
    assert not rep.noop
    assert rep.rows_routed == len(want_winners)
    man = Manifest.load(lake)
    assert man.num_buckets == 8 and man.salt_factor == 2
    assert man.version == old_version + 1
    assert man.metrics.get("rebucket") is True

    # rebucketed ≡ replica-rebuilt ≡ pre-rebucket, winners incl. tombstones
    pd.testing.assert_frame_equal(_winners(lake), want_winners)
    pd.testing.assert_frame_equal(_winners(lake), _winners(replica))
    pd.testing.assert_frame_equal(_final(lake), want_final)

    # the OOB delete survived the layout change
    assert "c3" not in set(_final(lake)["conv_id"])

    # time travel: the old version still reads with the OLD layout
    got_old = _final(lake, version=old_version)
    pd.testing.assert_frame_equal(got_old, want_final)

    # point lookup routes through the NEW (num_buckets, salt_factor)
    conv = want_final["conv_id"].iloc[0]
    got_pt = _final(lake, conv_id=conv)
    want_pt = (
        want_final[want_final["conv_id"] == conv].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_pt, want_pt)

    # audit diff across a layout change is refused, not fabricated
    from clinical_trials_etl_ray.stages.merge import diff_versions

    with pytest.raises(ValueError, match="bucket"):
        diff_versions(lake, old_version)

    # watermark carried over unchanged
    assert man.global_watermark() == Manifest.load_version(
        lake, old_version
    ).global_watermark()


def test_rebucket_noop(lake_env):
    lake = lake_env["lake"]
    man = Manifest.load(lake)
    rep = rebucket(lake, man.num_buckets, new_salt_factor=man.salt_factor)
    assert rep.noop and rep.final_version == man.version
    assert Manifest.load(lake).version == man.version


def test_ingest_continues_after_rebucket(lake_env):
    """Gen-2 events replayed onto the rebucketed lake equal a fresh replay
    of the full log straight into the new layout."""
    lake = lake_env["lake"]
    tmp_path = lake_env["tmp"]
    man = Manifest.load(lake)

    raw = str(tmp_path / "binlog2_raw")
    spec2 = BinlogSpec(
        n_events=2_000, n_convs=40, seed=42, delete_rate=0.08,
        shuffle_window=32,
    )
    write_binlog_shards(spec2, raw, n_shards=2, parallel=False)
    binlog2 = str(tmp_path / "binlog2")
    os.makedirs(binlog2)
    for name in sorted(os.listdir(raw)):
        src = os.path.join(raw, name)
        if name.endswith(".parquet"):
            t = pq.read_table(src)
            i = t.schema.get_field_index("lsn")
            t = t.set_column(
                i, "lsn", pc.add(t.column("lsn"), pa.scalar(500_000))
            )
            pq.write_table(t, os.path.join(binlog2, name))
        else:
            import shutil

            shutil.copy(src, os.path.join(binlog2, name))

    replay(
        binlog2, lake, num_buckets=man.num_buckets,
        files_per_chunk=2, hot_key_salt="auto",  # manifest's salt (2)
    )
    got = _final(lake)

    fresh = str(tmp_path / "fresh")
    replay(
        lake_env["binlog"], fresh, num_buckets=man.num_buckets,
        files_per_chunk=2, hot_key_salt=man.salt_factor,
    )
    delete_where(fresh, conv_id="c3")
    replay(
        binlog2, fresh, num_buckets=man.num_buckets,
        files_per_chunk=2, hot_key_salt=man.salt_factor,
    )
    pd.testing.assert_frame_equal(got, _final(fresh))
