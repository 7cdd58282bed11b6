"""Ad-hoc SQL over the lake: DuckDB on a STREAMING Arrow reader.

The reference exposes raw user-supplied Mongo ``find``/``aggregate`` JSON
(st_trial_analytics.py:1781-1886); the lake-native analog is SQL over the
resolved final table. The table streams: ``read_final_table`` yields
Arrow batches per bucket (shuffle-free, all manifest prunes available)
and DuckDB consumes them through a ``RecordBatchReader`` — the full table
is never materialized driver-side; only the QUERY RESULT is. This is the
interactive/ad-hoc path (single-node DuckDB over a distributed read);
pipelines that must scale past one node stay in Ray Data.
"""

from __future__ import annotations

import pyarrow as pa


def sql_on_lake(
    lake_dir: str,
    query: str,
    version: int | None = None,
    conv_range: tuple | None = None,
    ts_min=None,
    ts_max=None,
) -> pa.Table:
    """Run ``query`` with the lake's live state registered as the view
    ``final``. Time travel (``version``) and the predicate pushdowns
    compose — prune FIRST, then let SQL see only the surviving rows.

    Returns the result as a pyarrow Table (the result, not the lake, is
    materialized)."""
    import duckdb

    from ..stages.merge import read_final_table

    ds = read_final_table(
        lake_dir,
        version=version,
        conv_range=conv_range,
        ts_min=ts_min,
        ts_max=ts_max,
    )

    # a streaming reader over the Dataset's batches; schema from the first
    # batch (read_final_table unifies every bucket onto the committed
    # schema, so all batches agree). NOTE: hold ONE iterator — Ray's
    # iter_batches returns an iterABLE whose iter() restarts the stream,
    # so peeking via a second iter() would replay the first batch.
    it = iter(ds.iter_batches(batch_format="pyarrow"))
    first = next(it, None)
    if first is None:
        from ..schema import TRANSCRIPT_SCHEMA, schema_from_b64
        from ..state.manifest import Manifest

        man = Manifest.load(lake_dir)
        if man.schema_ipc:
            full = schema_from_b64(man.schema_ipc)
            schema = pa.schema(
                [f for f in full if f.name not in ("lsn", "op")]
            )
        else:
            schema = TRANSCRIPT_SCHEMA
        reader = pa.RecordBatchReader.from_batches(schema, iter(()))
    else:
        def gen(first_table):
            for b in first_table.to_batches():
                yield b
            for t in it:
                for b in t.to_batches():
                    yield b

        reader = pa.RecordBatchReader.from_batches(
            first.schema, gen(first)
        )

    con = duckdb.connect()
    con.register("final", reader)
    return con.execute(query).fetch_arrow_table()


def render_lake(
    lake_dir: str,
    version: int | None = None,
    conv_range: tuple | None = None,
):
    """Assembled-conversation export of the lake: one row per conversation
    with a deterministic rendered transcript (turns ordered by turn_idx —
    unique per conv since it is the upsert key). The training-data
    "out the door" step: write the result as JSONL and it is a ready
    supervised-finetuning corpus.

    Scale shape: the read is projection-pushed to (keys, role, text); the
    ONE groupby moves exactly the render inputs. (A bucket-local render
    would be shuffle-free on unsalted lakes, but Ray's dynamic block
    splitting may split a bucket's resolve output across blocks, so the
    groupby is the always-correct form.) Returns a Ray Dataset
    (conv_id, n_turns, transcript) — stream it to a sink.
    """
    from ..stages.merge import read_final_table

    ds = read_final_table(
        lake_dir,
        version=version,
        conv_range=conv_range,
        columns=["role", "text"],
    )

    def render(df):
        import pandas as pd

        df = df.sort_values("turn_idx", kind="mergesort")
        lines = df["role"].astype(str) + ": " + df["text"].fillna("")
        return pd.DataFrame({
            "conv_id": [df["conv_id"].iloc[0]],
            "n_turns": pd.array([len(df)], dtype="int64"),
            "transcript": ["\n".join(lines)],
        })

    return ds.groupby("conv_id").map_groups(render, batch_format="pandas")
