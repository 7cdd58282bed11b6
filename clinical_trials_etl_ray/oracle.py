"""Single-process replay oracle — the conformance ground truth.

Applies change events one at a time into a plain dict keyed by
``(conv_id, turn_idx)`` with deterministic last-writer-wins on ``(ts, lsn)``:
an event is applied only if its ``(ts, lsn)`` exceeds the stored winner's.
A delete whose ``(ts, lsn)`` wins removes the key from the final table.

This is intentionally tiny and obviously correct (SURVEY §5); the distributed
engine must reproduce it exactly, byte-for-byte on ``text``, under stable
``(conv_id, turn_idx)`` ordering. It replaces the reference's only
"correctness" mechanism — racy arrival-order Mongo upsert
(trials_extractor/storage/mongodb_storage.py:229-231 driven by the
nondeterministic as_completed pool in
trials_extractor/utils/batch_utils.py:54-65) — with order-independent
deterministic semantics.
"""

from __future__ import annotations

import pyarrow as pa

from .schema import TRANSCRIPT_SCHEMA, unify_to_event_schema


def replay_events(table: pa.Table, min_lsn_exclusive: int = -1) -> dict:
    """Replay events (any delivery order) into {key: winner-row-dict}.

    LWW makes the result independent of iteration order; events with
    ``lsn <= min_lsn_exclusive`` are skipped (watermark semantics).
    Tombstone winners are kept in the state (op == 'delete') so incremental
    oracles can continue from a prior state; ``final_table`` drops them.
    """
    table = unify_to_event_schema(table)
    state: dict = {}
    rows = table.to_pylist()
    for row in rows:
        if row["lsn"] <= min_lsn_exclusive:
            continue
        key = (row["conv_id"], row["turn_idx"])
        cur = state.get(key)
        if cur is not None and (cur["ts"], cur["lsn"]) >= (row["ts"], row["lsn"]):
            continue
        state[key] = row
    return state


def final_table(state: dict) -> pa.Table:
    """Materialize the final lake table, sorted by (conv_id, turn_idx)."""
    live = [r for r in state.values() if r["op"] != "delete"]
    live.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    if not live:
        return TRANSCRIPT_SCHEMA.empty_table()
    cols = {name: [r[name] for r in live] for name in TRANSCRIPT_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=TRANSCRIPT_SCHEMA)


def oracle_final_table(events: pa.Table) -> pa.Table:
    """One-shot: events (any order) -> final transcript table."""
    return final_table(replay_events(events))
