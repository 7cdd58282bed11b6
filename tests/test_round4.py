"""Round-4 unit pins: input-scaled coarse partitioning (VERDICT r3 nit 1 /
item 3), the hot-key monitor advisory (item 4), and commit
retry-with-rebase validation rules (item 5) — the Ray-free halves; the
end-to-end halves live in test_rebucket.py / test_stream_resolve.py /
test_concurrent_commit.py.
"""

import os
import warnings

import numpy as np
import pandas as pd
import pytest

from clinical_trials_etl_ray.stages.dedup_text import (
    COARSE_PARTITION_ROW_BUDGET,
    MAX_COARSE_PARTITIONS,
    N_COARSE_PARTITIONS,
    BandExploder,
    coarse_partitions,
    pair_partition_ids,
)


def test_coarse_partitions_scales_with_corpus():
    # floor at small corpora (keeps r3 behavior and oracle hashes)
    assert coarse_partitions(0) == N_COARSE_PARTITIONS
    assert coarse_partitions(60_000) == N_COARSE_PARTITIONS
    # grows with input
    small = coarse_partitions(100_000)
    big = coarse_partitions(1_000_000_000)
    assert big > small
    assert big == -(-1_000_000_000 * 32 // COARSE_PARTITION_ROW_BUDGET)
    # monotone
    sizes = [10**k for k in range(3, 12)]
    parts = [coarse_partitions(n) for n in sizes]
    assert parts == sorted(parts)
    # capped (scheduler overhead bound)
    assert coarse_partitions(10**11) == MAX_COARSE_PARTITIONS
    # simhash explodes 4 rows/doc, not 32 — fewer partitions at equal corpus
    assert coarse_partitions(10**9, rows_per_doc=4) < coarse_partitions(
        10**9, rows_per_doc=32
    )


def test_band_exploder_and_pair_ids_respect_n_parts():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "minhash_sig": [
                np.arange(128, dtype=np.int64) + i for i in range(50)
            ],
        }
    )
    out_default = BandExploder()(df)
    assert out_default["part"].between(0, N_COARSE_PARTITIONS - 1).all()
    out_wide = BandExploder(n_parts=4096)(df)
    assert out_wide["part"].max() >= N_COARSE_PARTITIONS  # actually spread
    assert out_wide["part"].between(0, 4095).all()
    # band content identical — only the partition tag changes
    pd.testing.assert_frame_equal(
        out_default.drop(columns=["part"]), out_wide.drop(columns=["part"])
    )

    a = np.arange(1000, dtype=np.int64)
    b = a + 1
    p_default = pair_partition_ids(a, b)
    p_wide = pair_partition_ids(a, b, 4096)
    assert p_default.max() < N_COARSE_PARTITIONS
    assert p_wide.max() >= N_COARSE_PARTITIONS
    assert (pair_partition_ids(a, b, N_COARSE_PARTITIONS) == p_default).all()


def _make_hot_binlog(
    tmp_path, name, seed, lsn_shift, hot_frac, n_events=2_000, hot_conv="chot"
):
    """A synth binlog where ``hot_conv`` suddenly carries ``hot_frac`` of
    all events (distinct turn_idx so salting CAN spread it)."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    raw = str(tmp_path / f"{name}_raw")
    write_binlog_shards(
        BinlogSpec(n_events=n_events, n_convs=50, seed=seed, zipf_s=1.0),
        raw, n_shards=1, parallel=False,
    )
    out = str(tmp_path / name)
    os.makedirs(out)
    for fname in sorted(os.listdir(raw)):
        src = os.path.join(raw, fname)
        if fname.endswith(".parquet"):
            t = pq.read_table(src)
            i_lsn = t.schema.get_field_index("lsn")
            t = t.set_column(
                i_lsn, "lsn", pc.add(t.column("lsn"), pa.scalar(lsn_shift))
            )
            n = t.num_rows
            n_hot = int(n * hot_frac)
            conv = t.column("conv_id").to_pylist()
            conv[:n_hot] = [hot_conv] * n_hot
            turn = t.column("turn_idx").to_pylist()
            turn[:n_hot] = list(range(n_hot))
            i_c = t.schema.get_field_index("conv_id")
            t = t.set_column(i_c, "conv_id", pa.array(conv, pa.string()))
            i_t = t.schema.get_field_index("turn_idx")
            t = t.set_column(i_t, "turn_idx", pa.array(turn, pa.int32()))
            pq.write_table(t, os.path.join(out, fname))
        else:
            shutil.copy(src, os.path.join(out, fname))
    return out


def test_hot_key_monitor_advisory(ray_session, tmp_path):
    """VERDICT item 4's done-criterion: a conv that goes viral MID-STREAM
    (after lake creation froze the salt) trips the streaming monitor — a
    warning fires, the chunk's manifest metrics record the share, and the
    advisory names the rebucket fix. A uniform stream stays silent."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    write_binlog_shards(
        BinlogSpec(n_events=2_000, n_convs=50, seed=71, zipf_s=1.0),
        binlog, n_shards=2, parallel=False,
    )
    lake = str(tmp_path / "lake")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rep = replay(binlog, lake, num_buckets=8, files_per_chunk=1)
    assert rep.salt_advisories == 0
    assert not [w for w in caught if "hot-key advisory" in str(w.message)]
    man = Manifest.load(lake)
    assert "hot_key_share" in man.metrics  # monitored on every chunk
    assert man.metrics["hot_key_share"] < 1.5 / 8

    # gen 2: one conversation suddenly carries ~60% of the stream
    binlog2 = _make_hot_binlog(
        tmp_path, "binlog2", seed=72, lsn_shift=100_000, hot_frac=0.6
    )

    with pytest.warns(UserWarning, match="hot-key advisory"):
        rep2 = replay(binlog2, lake, num_buckets=8, files_per_chunk=1)
    assert rep2.salt_advisories >= 1
    man2 = Manifest.load(lake)
    assert man2.metrics["hot_key"] == "chot"
    assert man2.metrics["hot_key_share"] > 0.4  # lower bound, true ~0.6
    required = man2.metrics["salt_advisory"]
    assert required >= 4  # ceil(share × 8 buckets) at share ≳ 0.5
    # observability: `stats` surfaces the advisory history from retained
    # manifest versions (no data file opened)
    adv = man2.summary()["hot_key_advisories"]
    assert adv and adv[-1]["hot_key"] == "chot"
    assert adv[-1]["advised_salt"] == required

    # the advisory's prescribed fix actually flattens the key: rebucket
    # re-routes in place at the advised salt
    from clinical_trials_etl_ray.pipelines.retention import rebucket
    from clinical_trials_etl_ray.stages.merge import read_final_table

    want = read_final_table(lake).to_pandas()
    rebucket(lake, 8, new_salt_factor=int(required))
    got = read_final_table(lake).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(want.columns)],
    )
    # the hot conv's rows now spread over `required` buckets
    from clinical_trials_etl_ray.stages.merge import candidate_buckets

    assert len(candidate_buckets("chot", 8, int(required))) > 1


def test_consumers_migrate_after_rebucket(ray_session, tmp_path):
    """A matview and a text index built on the old layout survive a lake
    rebucket: the next refresh detects the layout change, rebuilds fully,
    and adopts the new layout atomically (commit_layout) — results equal a
    from-scratch build on the rebucketed lake."""
    import pandas as _pd

    from clinical_trials_etl_ray.pipelines.replay import replay
    from clinical_trials_etl_ray.pipelines.retention import rebucket
    from clinical_trials_etl_ray.stages.matview import (
        build_matview,
        read_matview,
        refresh_matview,
    )
    from clinical_trials_etl_ray.stages.textindex import (
        build_text_index,
        refresh_text_index,
        search_text_index,
    )
    from clinical_trials_etl_ray.state.manifest import Manifest
    from clinical_trials_etl_ray.synth import BinlogSpec, write_binlog_shards

    binlog = str(tmp_path / "binlog")
    write_binlog_shards(
        BinlogSpec(n_events=3_000, n_convs=30, seed=91, delete_rate=0.05),
        binlog, n_shards=2, parallel=False,
    )
    lake = str(tmp_path / "lake")
    replay(binlog, lake, num_buckets=4, files_per_chunk=1)
    mv = str(tmp_path / "mv")
    build_matview(lake, mv)
    idx = str(tmp_path / "idx")
    build_text_index(lake, idx)
    probe_tokens = ["t"]  # synth text is 't|<conv>|<turn>|...' tokens

    def _mv_df(d):
        df = read_matview(d).to_pandas()
        return (
            df[sorted(df.columns)]
            .sort_values(sorted(df.columns)[0], kind="mergesort")
            .reset_index(drop=True)
        )

    want_search = search_text_index(idx, probe_tokens).to_pandas()

    rebucket(lake, 8, new_salt_factor=2)

    mv_rep = refresh_matview(lake, mv)
    man_mv = Manifest.load(mv)
    assert man_mv.num_buckets == 8 and man_mv.salt_factor == 2
    assert man_mv.metrics.get("layout_migrated") is True
    assert mv_rep.buckets_refreshed == 8  # full rebuild

    idx_rep = refresh_text_index(lake, idx)
    man_idx = Manifest.load(idx)
    assert man_idx.num_buckets == 8 and man_idx.salt_factor == 2
    assert man_idx.metrics.get("layout_migrated") is True

    # results equal a from-scratch build on the rebucketed lake
    mv_fresh = str(tmp_path / "mv_fresh")
    build_matview(lake, mv_fresh)
    _pd.testing.assert_frame_equal(_mv_df(mv), _mv_df(mv_fresh))
    got_search = search_text_index(idx, probe_tokens).to_pandas()
    _pd.testing.assert_frame_equal(got_search, want_search)

    # a second refresh with no lake change is a clean no-op on the new
    # layout (fingerprints now keyed by the new buckets)
    assert refresh_matview(lake, mv).buckets_refreshed == 0
    assert refresh_text_index(lake, idx).buckets_refreshed == 0


def test_follow_auto_rebucket_closes_skew_loop(ray_session, tmp_path):
    """follow(rebucket_on_advice=True): a hot-key advisory in a round
    triggers an in-place rebucket at the advised salt, and the same
    round's consumer maintenance adopts the new layout."""
    from clinical_trials_etl_ray.pipelines.replay import follow, replay
    from clinical_trials_etl_ray.stages.matview import read_matview
    from clinical_trials_etl_ray.stages.merge import read_final_table
    from clinical_trials_etl_ray.state.manifest import Manifest

    binlog = _make_hot_binlog(
        tmp_path, "binlog_hot", seed=95, lsn_shift=0, hot_frac=0.6
    )
    lake = str(tmp_path / "lake")
    mv = str(tmp_path / "mv")
    with pytest.warns(UserWarning, match="hot-key advisory"):
        rep = follow(
            binlog, lake,
            poll_interval_s=0.1, idle_rounds=1, max_rounds=3,
            matview_dir=mv, rebucket_on_advice=True,
            num_buckets=8, files_per_chunk=1,
        )
    assert rep.advised_salt >= 4
    man = Manifest.load(lake)
    assert man.salt_factor == rep.advised_salt  # the loop closed
    assert Manifest.load(mv).salt_factor == rep.advised_salt

    # state intact: equals a plain replay of the same log (whose own
    # advisory on the same hot key is expected — swallow it)
    plain = str(tmp_path / "plain")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        replay(binlog, plain, num_buckets=8, files_per_chunk=1)
    key = ["conv_id", "turn_idx"]
    got = read_final_table(lake).to_pandas()
    want = read_final_table(plain).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(want.columns)],
    )
    assert read_matview(mv).to_pandas().shape[0] > 0


def test_cdc_rebucket_final_matches_oracle(ray_session):
    """Tail oracle pin (the driver's 50-slot window is full):
    "cdc_rebucket_final" — replay → major compaction → in-place rebucket
    16→24 buckets / salt 1→2 → read on the NEW layout — must equal the
    same SQL_FINAL oracle as cdc_replay_final: re-partitioning alters no
    row (driver-style rows+schema+values comparison)."""
    import __ray_entry__ as entrymod

    from util_compare import assert_matches_oracle

    name = "cdc_rebucket_final"
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sf = "/root/testdata/sf0.001"
    assert_matches_oracle(q(sf), sql, sf)
