"""Per-row validation with issue reporting + quarantine split.

Reference analog: the validator that stamps each document with
``(valid, issues)`` and reports per-rule counts
(trials_extractor/processors/validator.py:151-216). Re-expressed as a
stateless vectorized ``map_batches`` stage: every check is a boolean mask
over the batch, the per-row issue list is assembled with one ``np.nonzero``
(row-major) + an Arrow ListArray from offsets — no Python loop per row.

``quarantine_split`` is the dataset-level policy: valid rows flow on,
invalid rows land in a quarantine dataset carrying their issue lists for
triage — instead of the reference's drop-or-crash behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import OPS

# (issue name, mask builder) — mask TRUE means the row HAS the issue.
# Checks mirror the engine's event invariants (schema.py).


def _mask_missing(t: pa.Table, col: str) -> np.ndarray:
    return pc.is_null(t[col]).to_numpy(zero_copy_only=False)


def event_checks(t: pa.Table) -> dict:
    """Ordered {issue_name: bool ndarray} over an event-schema batch."""
    op = t["op"]
    is_delete = pc.equal(op, "delete")
    not_delete = pc.invert(pc.fill_null(is_delete, False))
    checks = {
        "missing_conv_id": _mask_missing(t, "conv_id"),
        "missing_turn_idx": _mask_missing(t, "turn_idx"),
        "negative_turn_idx": pc.fill_null(
            pc.less(t["turn_idx"], 0), False
        ).to_numpy(zero_copy_only=False),
        "invalid_op": pc.invert(
            pc.is_in(pc.fill_null(op, ""), value_set=pa.array(list(OPS)))
        ).to_numpy(zero_copy_only=False),
        "missing_ts": _mask_missing(t, "ts"),
        # payload rules apply to non-delete rows only (deletes are tombstones)
        "missing_role": np.logical_and(
            _mask_missing(t, "role"),
            not_delete.to_numpy(zero_copy_only=False),
        ),
        # trim exactly RE2's ASCII \s class ([\t\n\f\r ]) to match the
        # DuckDB oracle's regexp_replace '\s' trim — utf8_trim_whitespace
        # would also strip Unicode whitespace (e.g. U+00A0) the oracle
        # keeps, a latent mismatch on non-ASCII corpora (ADVICE r2)
        "empty_text": np.logical_and(
            pc.fill_null(
                pc.equal(
                    pc.utf8_trim(pc.fill_null(t["text"], ""), " \t\n\r\f"),
                    "",
                ),
                True,
            ).to_numpy(zero_copy_only=False),
            not_delete.to_numpy(zero_copy_only=False),
        ),
    }
    return checks


def validate_batch(t: pa.Table) -> pa.Table:
    """Append ``valid`` (bool) and ``issues`` (list<string>) columns."""
    checks = event_checks(t)
    names = np.array(list(checks), dtype=object)
    masks = np.column_stack([checks[n] for n in names])  # (n_rows, n_checks)
    counts = masks.sum(axis=1).astype(np.int32)
    rows, cols = np.nonzero(masks)  # row-major: issues listed in check order
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    issues = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(names[cols], pa.string())
    )
    t = t.append_column("valid", pa.array(counts == 0))
    return t.append_column("issues", issues)


def validate_events(ds):
    """Dataset → same rows + (valid, issues) columns (stateless, streaming)."""
    return ds.map_batches(validate_batch, batch_format="pyarrow")


def quarantine_split(ds):
    """(valid_ds, quarantine_ds): valid rows without the audit columns, and
    invalid rows retaining their issue lists. Two filter passes over one
    validated dataset — each side streams; nothing is driver-collected."""
    validated = validate_events(ds)

    def keep_valid(t: pa.Table) -> pa.Table:
        return t.filter(t["valid"]).drop_columns(["valid", "issues"])

    def keep_invalid(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["valid"]))

    return (
        validated.map_batches(keep_valid, batch_format="pyarrow"),
        validated.map_batches(keep_invalid, batch_format="pyarrow"),
    )


def issue_report(ds) -> dict:
    """Aggregate issue counts (small result): {issue: n_rows}, plus
    ``_rows_total`` / ``_rows_invalid`` — the reference's per-rule summary
    counts (validator.py:151-216) computed with a per-batch partial + tiny
    driver-side reduce."""

    def partial(t: pa.Table) -> pa.Table:
        checks = event_checks(t)
        out = {k: [int(v.sum())] for k, v in checks.items()}
        out["_rows_total"] = [t.num_rows]
        out["_rows_invalid"] = [
            int(np.logical_or.reduce(list(checks.values())).sum())
            if t.num_rows
            else 0
        ]
        return pa.Table.from_pydict(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {c: int(parts[c].sum()) for c in parts.columns}
