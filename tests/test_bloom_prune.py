"""Per-file conv_id Bloom filters (functions/bloom.py) and the point-lookup
file prune they enable in read_final_table.

The min/max conv range prune is near-useless on UNCOMPACTED delta files
(random keys make every file's range span the keyspace); the Bloom prune
skips most of them with zero false negatives, so results are exact.
"""

import os

import numpy as np
import pytest

from clinical_trials_etl_ray.functions.bloom import (
    bloom_b64_from_hashes,
    bloom_bits_for,
    bloom_might_contain,
)
from clinical_trials_etl_ray.functions.hashing import hash_strings


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    keys = [f"conv-{i}" for i in range(300)]
    absent = [f"other-{i}" for i in range(2000)]
    h = hash_strings(np.array(keys, dtype=object))
    b64 = bloom_b64_from_hashes(h)
    # every inserted key tests positive — the soundness contract
    assert all(bloom_might_contain(b64, int(x)) for x in h)
    ha = hash_strings(np.array(absent, dtype=object))
    fp = sum(bloom_might_contain(b64, int(x)) for x in ha) / len(absent)
    assert fp < 0.05  # ~1% expected at 10 bits/key, k=6
    del rng


def test_bloom_sizing_and_duplicates():
    assert bloom_bits_for(1) == 64
    assert bloom_bits_for(50) == 512
    assert bloom_bits_for(10**9) == 4096  # capped
    # duplicate hashes count once for sizing
    h = hash_strings(np.array(["same"] * 1000, dtype=object))
    b64 = bloom_b64_from_hashes(h)
    import base64

    assert len(base64.b64decode(b64)) == 64 // 8
    assert bloom_might_contain(b64, int(h[0]))


@pytest.fixture()
def uncompacted_lake(ray_session, tmp_path):
    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=6_000, n_convs=120, seed=31, shuffle_window=16)
    write_binlog_shards(spec, binlog, n_shards=6, parallel=False)
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)  # many deltas
    return lake


def test_point_lookup_bloom_prunes_unread_files(uncompacted_lake):
    """For one key: files whose Bloom rejects it are NEVER opened — proven
    by deleting them from disk before the read — and the pruned read equals
    the unpruned result exactly."""
    from clinical_trials_etl_ray.functions.bloom import bloom_might_contain
    from clinical_trials_etl_ray.stages.merge import (
        candidate_buckets,
        read_final_table,
    )
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(uncompacted_lake)
    all_files = [
        (b, f) for b in range(man.num_buckets) for f in man.files_for_bucket(b)
    ]
    assert all(f.get("conv_bloom") for _, f in all_files)

    conv = "c17"
    want = (
        read_final_table(uncompacted_lake, conv_id=conv)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert len(want) > 0

    key_h = int(hash_strings([conv])[0])
    cand = set(candidate_buckets(conv, man.num_buckets, man.salt_factor))
    keep = {
        f["path"]
        for b, f in all_files
        if b in cand and bloom_might_contain(f["conv_bloom"], key_h)
    }
    drop = [f["path"] for _, f in all_files if f["path"] not in keep]
    # the prune must have real teeth on an uncompacted lake
    assert len(keep) < len(all_files) / 2
    for path in drop:
        os.remove(os.path.join(uncompacted_lake, path))

    got = (
        read_final_table(uncompacted_lake, conv_id=conv)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_point_lookup_without_bloom_still_reads_all(uncompacted_lake):
    """Legacy manifests (no conv_bloom recorded) stay correct: the prune
    treats missing filters as always-maybe."""
    import json

    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest

    man = Manifest.load(uncompacted_lake)
    want = read_final_table(uncompacted_lake, conv_id="c17").to_pandas()

    # strip the blooms from the current manifest version in place
    mdir = os.path.join(uncompacted_lake, "manifest")
    vfile = os.path.join(mdir, f"v{man.version:06d}.json")
    doc = json.load(open(vfile))
    for b in doc["buckets"].values():
        for f in b["files"]:
            f.pop("conv_bloom", None)
    os.remove(vfile)
    with open(vfile, "w") as fh:
        json.dump(doc, fh)

    got = read_final_table(uncompacted_lake, conv_id="c17").to_pandas()
    assert len(got) == len(want)
