"""follow(compact_min_files=…): continuous ingest with steady-state minor
compaction folded into the loop (pipelines/replay.py follow)."""

import os
import shutil
import threading

import pyarrow as pa

from clinical_trials_etl_ray.oracle import oracle_final_table
from clinical_trials_etl_ray.pipelines.replay import follow
from clinical_trials_etl_ray.stages.merge import read_final_table
from clinical_trials_etl_ray.state.manifest import Manifest
from clinical_trials_etl_ray.synth import (
    BinlogSpec,
    generate_events,
    write_binlog_shards,
)


def _final_sorted(lake_dir) -> pa.Table:
    t = pa.concat_tables(
        list(read_final_table(lake_dir).iter_batches(batch_format="pyarrow"))
    )
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_follow_with_inline_minor_compaction(ray_session, tmp_path):
    """The loop converges to the oracle state while holding per-bucket
    delta fan-in at O(compact_min_files), and the matview refreshed after
    the fold does not re-refresh untouched buckets next round."""
    spec = BinlogSpec(n_events=12_000, n_convs=200, seed=19,
                      duplicate_rate=0.02, shuffle_window=64)
    src = str(tmp_path / "all_shards")
    all_paths = sorted(write_binlog_shards(spec, src, n_shards=8))
    live = str(tmp_path / "live")
    os.makedirs(live)
    for p in all_paths[:4]:
        shutil.copy(p, live)

    def feeder():
        for p in all_paths[4:]:
            tmp = os.path.join(live, os.path.basename(p) + ".tmp")
            shutil.copy(p, tmp)
            os.replace(tmp, os.path.join(live, os.path.basename(p)))

    lake = str(tmp_path / "lake")
    t = threading.Thread(target=feeder)
    t.start()
    rep = follow(live, lake, poll_interval_s=0.5, idle_rounds=2,
                 num_buckets=8, files_per_chunk=1,
                 disorder_bound=spec.shuffle_window,
                 compact_min_files=2)
    t.join()
    assert rep.chunks_applied >= 4

    # correctness unchanged by the inline folds
    want = oracle_final_table(generate_events(spec))
    assert _final_sorted(lake).equals(want)

    # steady-state fan-in: every bucket's DELTA file count is bounded by
    # compact_min_files + files from at most the final (uncompacted) round,
    # not one per (chunk, bucket) — 8 chunks × files_per_chunk=1 would
    # leave ~8+ deltas per bucket without the folds
    man = Manifest.load(lake)
    per_bucket = [
        sum(1 for f in man.files_for_bucket(b) if f["kind"] == "delta")
        for b in range(man.num_buckets)
    ]
    assert max(per_bucket) <= 4, per_bucket


def test_follow_expires_old_versions(ray_session, tmp_path):
    """expire_keep_last bounds manifest-directory growth under continuous
    ingest while the retained window keeps time travel working."""
    spec = BinlogSpec(n_events=6_000, n_convs=100, seed=37,
                      shuffle_window=16)
    src = str(tmp_path / "all_shards")
    all_paths = sorted(write_binlog_shards(spec, src, n_shards=6))
    live = str(tmp_path / "live")
    os.makedirs(live)
    for p in all_paths[:2]:
        shutil.copy(p, live)

    def feeder():
        for p in all_paths[2:]:
            tmp = os.path.join(live, os.path.basename(p) + ".tmp")
            shutil.copy(p, tmp)
            os.replace(tmp, os.path.join(live, os.path.basename(p)))

    lake = str(tmp_path / "lake")
    t = threading.Thread(target=feeder)
    t.start()
    follow(live, lake, poll_interval_s=0.4, idle_rounds=2,
           num_buckets=4, files_per_chunk=1,
           disorder_bound=spec.shuffle_window,
           compact_min_files=2, expire_keep_last=3)
    t.join()

    mdir = os.path.join(lake, "manifest")
    import glob
    versions = sorted(glob.glob(os.path.join(mdir, "v*.json")))
    assert len(versions) <= 3, versions

    want = oracle_final_table(generate_events(spec))
    assert _final_sorted(lake).equals(want)
    # time travel inside the retained window still resolves
    from clinical_trials_etl_ray.stages.merge import read_final_table
    man = Manifest.load(lake)
    retained = int(os.path.basename(versions[0])[1:-5])
    assert read_final_table(lake, version=retained).count() > 0
