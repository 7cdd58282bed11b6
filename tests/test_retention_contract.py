"""Version-retention contract under concurrent maintenance (round-4
VERDICT item 8): a reader pinned to version N is SAFE while N is retained
— `expire_versions(keep_last=k)` keeping N leaves every file N references
on disk — and fails LOUDLY (never silently wrong) once N is expired,
whether the reader pins N before or after the expiry.
"""

import os

import pandas as pd
import pytest

from clinical_trials_etl_ray.pipelines.replay import compact, replay
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture()
def versioned_lake(ray_session, tmp_path):
    """A lake with several committed versions: 4 chunked ingest commits,
    then a compaction commit on top."""
    binlog = str(tmp_path / "binlog")
    write_binlog_shards(
        BinlogSpec(n_events=4_000, n_convs=30, seed=81, delete_rate=0.05),
        binlog, n_shards=4, parallel=False,
    )
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=2, files_per_chunk=1)
    compact(lake)
    return lake


def test_reader_survives_expiry_that_retains_its_version(versioned_lake):
    lake = versioned_lake
    versions = Manifest._versions_on_disk(lake)
    assert len(versions) >= 5
    pinned = versions[-2]  # one before current (pre-compaction state)
    want = _sorted(read_final_table(lake, version=pinned).to_pandas())

    # expiry retains `pinned` (keep_last covers it) → the pinned read still
    # works afterwards, byte-for-byte, even though older versions (and any
    # files ONLY they referenced) are gone
    ds = read_final_table(lake, version=pinned)  # reader pins BEFORE expiry
    expired = Manifest.load(lake).expire_versions(keep_last=2)
    assert expired  # something was actually retired
    got_pre_pinned = _sorted(ds.to_pandas())
    pd.testing.assert_frame_equal(got_pre_pinned, want)
    got_re_pinned = _sorted(read_final_table(lake, version=pinned).to_pandas())
    pd.testing.assert_frame_equal(got_re_pinned, want)


def test_expired_version_fails_loudly_not_wrongly(versioned_lake):
    lake = versioned_lake
    versions = Manifest._versions_on_disk(lake)
    victim = versions[1]  # an early ingest commit
    # pin a dataset to the victim BEFORE it is expired: the lazy read holds
    # the file list, expiry removes exclusively-owned files underneath
    ds_pinned = read_final_table(lake, version=victim)
    victim_files = set(Manifest.load_version(lake, victim).all_files())
    current_files = set(Manifest.load(lake).all_files())
    exclusively_owned = victim_files - current_files
    assert exclusively_owned  # compaction rewrote them — expiry deletes some

    Manifest.load(lake).expire_versions(keep_last=1)
    gone = [
        f for f in exclusively_owned
        if not os.path.exists(os.path.join(lake, f))
    ]
    assert gone  # files were physically reclaimed

    # (a) pinning AFTER expiry: the manifest snapshot itself is gone — loud
    with pytest.raises(FileNotFoundError):
        read_final_table(lake, version=victim)

    # (b) pinned BEFORE expiry: execution must raise (missing data file),
    # never return a silently wrong table
    with pytest.raises(Exception) as ei:
        ds_pinned.to_pandas()
    msg = str(ei.value)
    assert "No such file" in msg or "FileNotFound" in msg or ".parquet" in msg

    # the CURRENT version is untouched by all of the above
    cur = read_final_table(lake).to_pandas()
    assert len(cur) > 0
