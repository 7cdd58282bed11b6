"""Observability for hot-bucket caps (df_cap / bucket_cap).

The LSH candidate kernels bound their O(f²) within-bucket work by dropping
buckets hotter than a cap. Dropping is the right scale trade (a shingle
shared by 10^5 docs is a stopword, not a near-dup signal), but it must be
OBSERVABLE — the same discipline the replay path applies to stale rows
(``stale_skipped`` in the manifest metrics). Each kernel that truncates
reports (key, truncated_buckets, dropped_rows) here; the totals accumulate
in a named zero-CPU Ray actor so drops inside ``map_groups`` workers are
visible to the driver: ``cap_drop_totals()`` after a pipeline run returns
``{key: (buckets, rows)}``.

The increment is a synchronous actor call made ONLY when a drop actually
happens (hot buckets are rare by construction), so the hot path pays
nothing. When Ray is not initialized (pure-function unit tests) the drop is
still logged, just not accumulated.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_ACTOR_NAME = "cap_drop_metrics"
_ACTOR_NAMESPACE = "clinical_trials_etl_ray"


class _CapDropMetrics:
    def __init__(self):
        self.counts: dict[str, tuple[int, int]] = {}

    def incr(self, key: str, buckets: int, rows: int) -> None:
        b, r = self.counts.get(key, (0, 0))
        self.counts[key] = (b + buckets, r + rows)

    def get(self) -> dict:
        return dict(self.counts)

    def reset(self) -> None:
        self.counts = {}


def _metrics_actor():
    import ray

    if not ray.is_initialized():
        return None
    return (
        ray.remote(num_cpus=0)(_CapDropMetrics)
        .options(
            name=_ACTOR_NAME,
            namespace=_ACTOR_NAMESPACE,
            get_if_exists=True,
            lifetime="detached",
        )
        .remote()
    )


def record_cap_drop(key: str, buckets: int, rows: int) -> None:
    """Report that ``buckets`` hot buckets (``rows`` member rows) were
    truncated by a cap. Logged always; accumulated in the metrics actor when
    a Ray session exists."""
    logger.warning(
        "hot-bucket cap: %s truncated %d bucket(s), dropping %d candidate rows",
        key,
        buckets,
        rows,
    )
    try:
        a = _metrics_actor()
        if a is not None:
            import ray

            ray.get(a.incr.remote(key, buckets, rows))
    except Exception:  # metrics must never fail the data path
        logger.debug("cap-drop metric not recorded", exc_info=True)


def cap_drop_totals() -> dict:
    """Accumulated ``{key: (truncated_buckets, dropped_rows)}`` for this Ray
    session (empty when Ray is down or nothing was dropped)."""
    a = _metrics_actor()
    if a is None:
        return {}
    import ray

    return ray.get(a.get.remote())


def reset_cap_drops() -> None:
    a = _metrics_actor()
    if a is not None:
        import ray

        ray.get(a.reset.remote())
