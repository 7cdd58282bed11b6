"""Deterministic synthetic binlog generator (seeded, vectorized).

Produces the FIXTURES.md §2 ``change_events`` table: an LSN-totally-ordered
stream of insert/update/delete events over ``(conv_id, turn_idx)`` keys, with
knobs for hot-key (Zipf) skew, duplicate delivery, out-of-order delivery
windows, delete rate, and mid-stream additive schema evolution (the ``tool``
column starts appearing at ``evolution_lsn``).

Everything is numpy-vectorized so bench-scale logs (1e7+ events) generate in
seconds; no wall-clock or external data is used (seed-only determinism).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import EVENT_SCHEMA

_EPOCH_US = 1_700_000_000_000_000  # fixed base event-time (us since unix epoch)
_ROLES = np.array(["user", "assistant", "system", "tool"])


@dataclass(frozen=True)
class BinlogSpec:
    """All knobs for the deterministic generator (FIXTURES.md §2)."""

    n_events: int = 10_000
    n_convs: int = 200
    max_turns: int = 32
    seed: int = 42
    zipf_s: float = 1.1            # hot-key skew over conv ids (1.0 => uniform-ish)
    delete_rate: float = 0.05
    update_rate: float = 0.25      # remainder is inserts
    duplicate_rate: float = 0.0    # fraction of events re-delivered verbatim
    shuffle_window: int = 0        # out-of-order delivery: local permute window
    evolution_frac: float = 0.5    # tool column appears for lsn >= frac * n
    text_pad: int = 0              # extra payload bytes per text value
    ts_jitter_us: int = 120_000_000  # event-time jitter so ts order != lsn order

    @property
    def evolution_lsn(self) -> int:
        return int(self.n_events * self.evolution_frac)


def _zipf_conv_ids(rng: np.random.Generator, spec: BinlogSpec) -> np.ndarray:
    """Zipf-skewed conversation index per event (vectorized ancestral sample)."""
    ranks = np.arange(1, spec.n_convs + 1, dtype=np.float64)
    probs = ranks ** (-spec.zipf_s)
    probs /= probs.sum()
    return rng.choice(spec.n_convs, size=spec.n_events, p=probs)


_SEGMENT_ROWS = 4_000_000  # string-building slab; keeps every Arrow string
# chunk far below the 2 GiB int32-offset limit at any n_events


def _delivery_rows(rng: np.random.Generator, spec: BinlogSpec) -> np.ndarray:
    """Delivery stream as ROW INDICES into the LSN-ordered logical log:
    duplicates append extra indices (re-delivered shortly after their
    original position, as an at-least-once transport would), out-of-order
    delivery permutes within fixed windows. Pure int64 index math — no Arrow
    arrays, so no offset limits."""
    n = spec.n_events
    rows = np.arange(n, dtype=np.int64)
    if spec.duplicate_rate > 0:
        k = int(n * spec.duplicate_rate)
        if k:
            idx = rng.choice(n, size=k, replace=True).astype(np.int64)
            disp = rng.integers(1, max(2, spec.shuffle_window or 64), size=k)
            pos_base = np.arange(n, dtype=np.float64)
            pos_dup = idx + disp + 0.5
            order = np.argsort(np.concatenate([pos_base, pos_dup]), kind="stable")
            rows = np.concatenate([rows, idx])[order]
    if spec.shuffle_window > 1:
        w = spec.shuffle_window
        for start in range(0, len(rows), w):
            seg = rows[start : start + w]
            rng.shuffle(seg)
    return rows


_OP_NAMES = np.array(["insert", "update", "delete"])


def _draw_numerics(spec: BinlogSpec) -> dict:
    """All random draws for the whole log — cheap numpy, a few seconds even
    at 1e8 events. The rng call ORDER defines the seeded stream; keep it
    stable."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    conv = _zipf_conv_ids(rng, spec)
    turn = rng.integers(0, spec.max_turns, size=n, dtype=np.int32)
    u = rng.random(n)
    opc = np.where(
        u < spec.delete_rate,
        2,
        np.where(u < spec.delete_rate + spec.update_rate, 1, 0),
    ).astype(np.int8)
    base = _EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000
    jitter = rng.integers(-spec.ts_jitter_us, spec.ts_jitter_us + 1, size=n)
    ts_us = base + jitter
    rows = _delivery_rows(rng, spec)
    return {"conv": conv, "turn": turn, "opc": opc, "ts_us": ts_us, "rows": rows}


def _build_rows(spec: BinlogSpec, numerics: dict, r: np.ndarray) -> pa.Table:
    """Materialize one slice of the delivery stream (``r`` = row indices
    into the LSN-ordered log; lsn of index i IS i). Pure function of its
    inputs, so serial and parallel generation produce identical bytes."""
    s_lsn = r.astype(np.int64)
    s_conv = numerics["conv"][r]
    s_turn = numerics["turn"][r]
    s_op = _OP_NAMES[numerics["opc"][r]]
    role = _ROLES[s_lsn % 4]
    conv_u = s_conv.astype("U")
    conv_str = pc.binary_join_element_wise("c", pa.array(conv_u), "")
    # text is a pure function of (conv, turn, lsn) so the oracle and any
    # replay can verify per-turn equality byte-for-byte.
    text = pc.binary_join_element_wise(
        "t|", pa.array(conv_u), "|", pa.array(s_turn.astype("U")),
        "|", pa.array(s_lsn.astype("U")), "",
    )
    if spec.text_pad > 0:
        text = pc.binary_join_element_wise(
            text, pa.array(np.full(len(r), "x" * spec.text_pad)), "|"
        )
    m = len(r)
    is_delete = pa.array(s_op == "delete")
    null_str = pa.nulls(m, pa.string())
    role_a = pc.if_else(is_delete, null_str, pa.array(role))
    text_a = pc.if_else(is_delete, null_str, text)
    # additive schema evolution: tool only for lsn >= evolution_lsn
    has_tool = pa.array(
        (s_lsn >= spec.evolution_lsn) & (s_lsn % 3 == 0) & (s_op != "delete")
    )
    tool_vals = pc.binary_join_element_wise(
        "fn_", pa.array((s_lsn % 7).astype("U")), ""
    )
    tool = pc.if_else(has_tool, tool_vals, null_str)
    return pa.Table.from_arrays(
        [
            pa.array(s_lsn),
            pa.array(s_op),
            conv_str,
            pa.array(s_turn),
            role_a,
            text_a,
            tool,
            pa.array(
                numerics["ts_us"][r].astype("datetime64[us]"),
                type=pa.timestamp("us"),
            ),
        ],
        schema=EVENT_SCHEMA,
    )


def generate_event_tables(spec: BinlogSpec):
    """Yield the delivery stream as a sequence of ≤``_SEGMENT_ROWS`` Arrow
    tables. Numeric fields are drawn once for the whole log (cheap numpy);
    string payloads are built per segment, so no single Arrow string array
    ever approaches the int32 offset limit — this is what lets the seeded
    generator scale to bench-size logs (1e7–1e8 events)."""
    numerics = _draw_numerics(spec)
    rows = numerics["rows"]
    for lo in range(0, len(rows), _SEGMENT_ROWS):
        yield _build_rows(spec, numerics, rows[lo : lo + _SEGMENT_ROWS])


def generate_events(spec: BinlogSpec) -> pa.Table:
    """Generate the event table in *delivery order* (may be out of LSN order).

    LSNs are unique and total; `ts` is correlated with lsn but jittered so the
    LWW winner by (ts, lsn) is not simply the max-lsn event — exercising the
    deterministic tie-break the reference lacks (SURVEY §2.9). The result is
    a CHUNKED table (zero-copy concat of the generator's segments)."""
    return pa.concat_tables(generate_event_tables(spec))


def _finish_shard(spec: BinlogSpec, shard: pa.Table, path: str,
                  drop_tool_before_evolution: bool) -> None:
    if drop_tool_before_evolution:
        max_lsn = pc.max(shard["lsn"]).as_py()
        if max_lsn is not None and max_lsn < spec.evolution_lsn:
            shard = shard.drop_columns(["tool"])
    pq.write_table(shard, path)


def write_binlog_shards(
    spec: BinlogSpec,
    out_dir: str,
    n_shards: int = 8,
    drop_tool_before_evolution: bool = True,
    parallel: bool | None = None,
) -> list[str]:
    """Write the binlog as LSN-range parquet shards under ``out_dir``.

    Shard i holds the i-th contiguous slice of the delivery stream. Shards
    delivered entirely before ``evolution_lsn`` are written WITHOUT the
    ``tool`` column (schema v0) to exercise real additive schema evolution at
    the read/merge boundary (SURVEY §7.4).

    Large logs build shards in PARALLEL Ray tasks (string materialization is
    the expensive part and is embarrassingly parallel once the seeded
    numeric draws exist): the numeric arrays ship to the object store once,
    each task gathers its slice and writes its shard. Byte-identical to the
    serial path — ``_build_rows`` is a pure function of (spec, numerics,
    slice). ``parallel=None`` auto-enables when Ray is up and the log is
    big enough to matter.
    """
    import json

    import ray

    os.makedirs(out_dir, exist_ok=True)
    # Persist the producer's out-of-order bound next to the shards: replay
    # reads it when the caller doesn't pass an explicit disorder_bound, so a
    # follow-mode tail can never silently commit a watermark past events a
    # late shard will still deliver (ADVICE r01).
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump({"disorder_bound": int(spec.shuffle_window)}, f)
    if parallel is None:
        parallel = (
            ray.is_initialized() and spec.n_events >= 1_000_000 and n_shards > 1
        )

    if not parallel:
        table = generate_events(spec)
        m = table.num_rows
        paths: list[str] = []
        bounds = np.linspace(0, m, n_shards + 1).astype(int)
        for i in range(n_shards):
            lo, hi = bounds[i], bounds[i + 1]
            if hi <= lo:
                continue
            path = os.path.join(out_dir, f"events-{i:05d}.parquet")
            _finish_shard(spec, table.slice(lo, hi - lo), path,
                          drop_tool_before_evolution)
            paths.append(path)
        return paths

    numerics = _draw_numerics(spec)
    rows = numerics["rows"]
    refs = {
        k: ray.put(v) for k, v in numerics.items() if k != "rows"
    }

    @ray.remote
    def _shard_task(i: int, r: np.ndarray, path: str) -> str:
        nums = {k: ray.get(ref) for k, ref in refs.items()}
        shard = _build_rows(spec, nums, r)
        _finish_shard(spec, shard, path, drop_tool_before_evolution)
        return path

    bounds = np.linspace(0, len(rows), n_shards + 1).astype(int)
    futs = []
    for i in range(n_shards):
        lo, hi = bounds[i], bounds[i + 1]
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"events-{i:05d}.parquet")
        futs.append(_shard_task.remote(i, rows[lo:hi], path))
    return sorted(ray.get(futs))
