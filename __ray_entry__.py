"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No function here (nor the library code it uses) calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full CDC replay (derive binlog from the sf0.001
    events table → chunked exactly-once replay into a hash-bucketed Parquet
    lake → shuffle-free final-table read). Returns the final transcript
    table (pyarrow.Table)."""
    from clinical_trials_etl_ray.pipelines.cdc_queries import run_cdc_replay

    return run_cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from clinical_trials_etl_ray.pipelines import cdc_queries

    out: dict[str, Callable[[str], Any]] = {}
    out.update(cdc_queries.QUERIES)
    try:
        from clinical_trials_etl_ray.pipelines import analytics

        out.update(analytics.QUERIES)
    except ImportError:
        pass
    try:
        from clinical_trials_etl_ray.pipelines import textops

        out.update(textops.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from clinical_trials_etl_ray.pipelines import cdc_queries

    out: dict[str, str] = {}
    out.update(cdc_queries.ORACLE_SQL)
    try:
        from clinical_trials_etl_ray.pipelines import analytics

        out.update(analytics.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from clinical_trials_etl_ray.pipelines import textops

        out.update(textops.ORACLE_SQL)
    except ImportError:
        pass
    return out
