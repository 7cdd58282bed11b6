"""Property-based tests (Hypothesis) for the pure kernels the engine's
correctness rests on: LWW dedupe (associativity = what makes salting and
chunked commits safe), explode, and LSH candidate-pair emission. No Ray —
these are plain-Arrow/numpy kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clinical_trials_etl_ray.oracle import replay_events
from clinical_trials_etl_ray.schema import EVENT_SCHEMA
from clinical_trials_etl_ray.stages.dedup_text import candidate_pairs_partition
from clinical_trials_etl_ray.stages.dedupe import lww_winners
from clinical_trials_etl_ray.stages.explode import explode_list_column

# --------------------------------------------------------------------------
# LWW dedupe vs the single-process oracle
# --------------------------------------------------------------------------

_event = st.tuples(
    st.integers(0, 4),              # conv
    st.integers(0, 3),              # turn
    st.integers(0, 50),             # ts (us since epoch, collisions likely)
    st.sampled_from(["insert", "update", "delete"]),
    st.text(alphabet="abc", max_size=3),
)


def _events_table(events) -> pa.Table:
    # lsn = position → unique by construction (matches the binlog contract)
    return pa.Table.from_pydict(
        {
            "lsn": list(range(len(events))),
            "op": [e[3] for e in events],
            "conv_id": [f"c{e[0]}" for e in events],
            "turn_idx": [e[1] for e in events],
            "role": ["user"] * len(events),
            "text": [e[4] for e in events],
            "tool": [None] * len(events),
            "ts": [e[2] for e in events],
        },
        schema=EVENT_SCHEMA,
    )


def _winners_dict(t: pa.Table) -> dict:
    return {
        (r["conv_id"], r["turn_idx"]): (r["ts"], r["lsn"], r["op"], r["text"])
        for r in t.to_pylist()
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(_event, min_size=1, max_size=60))
def test_lww_winners_matches_oracle(events):
    t = _events_table(events)
    got = _winners_dict(lww_winners(t))
    want = {
        k: (r["ts"], r["lsn"], r["op"], r["text"])
        for k, r in replay_events(t).items()
    }
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(_event, min_size=2, max_size=60), st.data())
def test_lww_winners_partition_invariant(events, data):
    """max-by-(ts,lsn) is associative: dedupe(halves) then dedupe(concat)
    equals dedupe(whole) — the property that makes per-batch pre-dedupe,
    hot-key salting, and chunked commits safe."""
    t = _events_table(events)
    cut = data.draw(st.integers(1, len(events) - 1))
    a, b = t.slice(0, cut), t.slice(cut)
    recombined = lww_winners(
        pa.concat_tables([lww_winners(a), lww_winners(b)])
    )
    assert _winners_dict(recombined) == _winners_dict(lww_winners(t))


@settings(max_examples=100, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40), st.permutations(range(40)))
def test_lww_winners_order_invariant(events, perm):
    t = _events_table(events)
    idx = [i for i in perm if i < len(events)]
    shuffled = t.take(pa.array(idx, pa.int64()))
    assert _winners_dict(lww_winners(shuffled)) == _winners_dict(lww_winners(t))


# --------------------------------------------------------------------------
# explode vs a Python reference
# --------------------------------------------------------------------------

_lists = st.lists(
    st.one_of(st.none(), st.lists(st.integers(0, 9), max_size=4)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(_lists, st.integers(0, 10))
def test_explode_matches_reference(lists, offset_seed):
    t = pa.table(
        {"k": pa.array(range(len(lists)), pa.int64()),
         "v": pa.array(lists, pa.list_(pa.int64()))}
    )
    # exercise nonzero chunk offsets too
    start = offset_seed % len(lists)
    sliced = t.slice(start)
    out = explode_list_column(sliced, "v", keep=["k"], value_name="x")
    want_k, want_x = [], []
    for k, v in zip(range(start, len(lists)), lists[start:]):
        for x in v or []:
            want_k.append(k)
            want_x.append(x)
    assert out["k"].to_pylist() == want_k
    assert out["x"].to_pylist() == want_x


# --------------------------------------------------------------------------
# LSH candidate pairs vs a naive per-bucket reference
# --------------------------------------------------------------------------

_band_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 9)),
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(_band_rows, st.integers(2, 6))
def test_candidate_pairs_matches_naive(rows, df_cap):
    # one row per (band, doc): drop duplicates like BandExploder guarantees
    rows = list({(b, h, d) for (b, h, d) in rows})
    df = pd.DataFrame(rows, columns=["band_id", "band_hash", "doc_id"]).astype(
        "int64"
    )
    got = candidate_pairs_partition(df, df_cap=df_cap)
    got_set = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    want = set()
    for (_b, _h), g in df.groupby(["band_id", "band_hash"]):
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > df_cap:
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want.add((int(ids[i]), int(ids[j])))
    assert got_set == want


# --------------------------------------------------------------------------
# Materialized-view partials: any split + merge == direct aggregate
# --------------------------------------------------------------------------

_mv_row = st.tuples(
    st.integers(0, 5),                         # conv
    st.one_of(st.none(), st.text(alphabet="xy", max_size=2)),  # tool
    st.one_of(st.none(), st.text(alphabet="ab ", max_size=6)), # text
    st.integers(0, 10**7),                     # ts (us)
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_mv_row, max_size=60), st.data())
def test_mv_partials_merge_invariant(rows, data):
    """merge_partials over ANY split of the live rows equals the direct
    per-conv aggregate — the property that makes salted-lake views (and any
    per-bucket split) exact. Covers null tool/text and empty splits."""
    from clinical_trials_etl_ray.stages.matview import (
        MV_SCHEMA,
        conv_partials,
        merge_partials,
    )

    t = pa.Table.from_pydict(
        {
            "conv_id": [f"c{r[0]}" for r in rows],
            "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": [r[1] for r in rows],
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    direct = conv_partials(t).sort_by([("conv_id", "ascending")])

    n_splits = data.draw(st.integers(1, 4))
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(rows)), min_size=n_splits - 1,
                     max_size=n_splits - 1)
        )
    )
    bounds = [0, *cuts, len(rows)]
    parts = [
        conv_partials(t.slice(lo, hi - lo))
        for lo, hi in zip(bounds, bounds[1:])
    ]
    merged = merge_partials(
        pa.concat_tables([p for p in parts] or [MV_SCHEMA.empty_table()])
    ).sort_by([("conv_id", "ascending")])
    assert merged.equals(direct)


# --------------------------------------------------------------------------
# text kernels: chunking and repetition vs naive per-doc references
# --------------------------------------------------------------------------

_doc_text = st.one_of(
    st.none(),
    st.text(alphabet="ab \t\n", max_size=40),  # whitespace-heavy corpus
)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(_doc_text, max_size=12),
    window=st.integers(1, 8),
    stride=st.integers(1, 8),
)
def test_chunk_kernel_matches_naive(texts, window, stride):
    """The vectorized chunk explode equals the obvious per-doc loop:
    chunks = [words[o:o+window] for o in range(0, n, stride)], any
    window/stride combination (including stride > window gaps)."""
    from clinical_trials_etl_ray.pipelines.textops import chunk_documents_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = chunk_documents_batch(t, window=window, stride=stride).to_pydict()
    got_rows = list(
        zip(got["doc_id"], got["chunk_idx"], got["n_tokens"], got["chunk_text"])
    )
    want_rows = []
    for i, text in enumerate(texts):
        words = (text or "").split()
        for k, off in enumerate(range(0, len(words), stride)):
            piece = words[off : off + window]
            want_rows.append((i, k, len(piece), " ".join(piece)))
    assert got_rows == want_rows


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(_doc_text, max_size=12))
def test_repetition_kernel_matches_naive(texts):
    from clinical_trials_etl_ray.pipelines.textops import (
        repetition_scores_batch,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = repetition_scores_batch(t).to_pydict()
    for i, text in enumerate(texts):
        words = (text or "").split()
        assert got["n_words"][i] == len(words)
        assert got["n_distinct"][i] == len(set(words))


# --------------------------------------------------------------------------
# Seen-index fingerprint stamping: split invariance of the pure kernel
# --------------------------------------------------------------------------

@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=40
    ),
    num_buckets=st.integers(1, 64),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_stamp_fingerprints_split_invariant(texts, num_buckets, data):
    """The routing kernel behind every seen-index exchange: stamping a
    frame in one batch equals stamping any split of it (what makes
    N-increment builds ≡ one-shot), fingerprints depend only on the text
    (None hashes as ''), and every bucket is in range."""
    from clinical_trials_etl_ray.stages.seen_index import (
        BUCKET_COL,
        FP_COL,
        stamp_fingerprints,
    )

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    whole = stamp_fingerprints(df, "text", num_buckets)

    cut = data.draw(st.integers(0, len(df)))
    parts = [df.iloc[:cut], df.iloc[cut:]]
    split = pd.concat(
        [stamp_fingerprints(p, "text", num_buckets) for p in parts if len(p)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), split, check_dtype=False
    )
    assert whole[BUCKET_COL].between(0, num_buckets - 1).all()
    # same text (or None ≡ '') → same fingerprint, always
    fp_by_text = {}
    for t, fp in zip(texts, whole[FP_COL]):
        key = t if isinstance(t, str) else ""
        assert fp_by_text.setdefault(key, fp) == fp
