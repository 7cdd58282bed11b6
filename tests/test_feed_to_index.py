"""CDC → ANN composition: the embedding index FOLLOWS the lake via the
change feed (read_change_feed → hash_embed → ivf_index_add), and the
incrementally-grown index equals a from-scratch rebuild."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from clinical_trials_etl_ray.pipelines.replay import replay
from clinical_trials_etl_ray.stages.embed import (
    ann_topk,
    ann_topk_ivf_indexed,
    build_ivf_index,
    hash_embed,
    ivf_index_add,
)
from clinical_trials_etl_ray.stages.merge import read_change_feed
from clinical_trials_etl_ray.state.manifest import Manifest


def _shard(path, lsns, conv_prefix):
    n = len(lsns)
    pq.write_table(pa.table({
        "lsn": pa.array(lsns, pa.int64()),
        "op": pa.array(["insert"] * n, pa.string()),
        "conv_id": pa.array([f"{conv_prefix}{i}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array([f"document body {v} {conv_prefix}" for v in lsns],
                         pa.string()),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([np.datetime64(10**6 * (1_700_000_000 + v), "us")
                        for v in lsns], pa.timestamp("us")),
    }), str(path))


def _embeddings_table(feed_df: pd.DataFrame) -> pa.Table:
    """Feed rows → (vec_id=lsn, embedding=hash_embed(text))."""
    vecs = hash_embed(feed_df["text"].tolist(), dim=16)
    return pa.table({
        "vec_id": pa.array(feed_df["lsn"].astype("int64"), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })


def test_index_follows_change_feed(ray_session, tmp_path):
    binlog = tmp_path / "binlog"
    binlog.mkdir()
    _shard(binlog / "s0.parquet", list(range(0, 40)), "a")

    lake = str(tmp_path / "lake")
    replay(str(binlog), lake, num_buckets=4)
    cut_a = Manifest.load(lake).global_watermark()

    # seed the index from the initial corpus (feed from the beginning)
    feed_a = read_change_feed(lake, since_lsn=-1, until_lsn=cut_a).to_pandas()
    corpus_a_dir = tmp_path / "sf_a"
    corpus_a_dir.mkdir()
    pq.write_table(_embeddings_table(feed_a),
                   str(corpus_a_dir / "embeddings.parquet"))
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(str(corpus_a_dir), index_dir, n_centroids=4)

    # second ingest round; the index consumes ONLY the incremental feed
    _shard(binlog / "s1.parquet", list(range(40, 70)), "b")
    replay(str(binlog), lake, num_buckets=4)
    cut_b = Manifest.load(lake).global_watermark()
    assert cut_b > cut_a

    feed_b = read_change_feed(lake, since_lsn=cut_a, until_lsn=cut_b).to_pandas()
    assert len(feed_b) == 30  # exactly the new documents
    added = ivf_index_add(index_dir, _tmp_parquet(tmp_path, feed_b))
    assert added == 30

    # grown index ≡ brute force over the FULL corpus at nprobe=C
    full = pd.concat([feed_a, feed_b], ignore_index=True)
    full_sf = tmp_path / "sf_full"
    full_sf.mkdir()
    pq.write_table(_embeddings_table(full),
                   str(full_sf / "embeddings.parquet"))

    got = _df(ann_topk_ivf_indexed(str(full_sf), index_dir,
                                   n_queries=4, k=3, nprobe=4))
    want = _df(ann_topk(str(full_sf), n_queries=4, k=3))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _tmp_parquet(tmp_path, feed_df) -> str:
    p = str(tmp_path / "adds.parquet")
    pq.write_table(_embeddings_table(feed_df), p)
    return p


def _df(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(["qid", "vec_id"]).reset_index(drop=True)
