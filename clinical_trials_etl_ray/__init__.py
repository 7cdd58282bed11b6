"""clinical_trials_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch rebuild of the data-processing capabilities of
``freearcs-ps/clinical-trials-etl`` (see SURVEY.md for the operator-by-
operator mapping), re-targeted onto an LSN-ordered change log replayed into a
hash-bucketed Parquet lake of multi-turn transcripts, plus the analytics,
cleaning/normalization, text-mining, dedup, and similarity-search operators a
large-scale training-data pipeline needs.
"""

from .schema import EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from .synth import BinlogSpec, generate_events, write_binlog_shards
from .oracle import oracle_final_table

__all__ = [
    "EVENT_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "BinlogSpec",
    "generate_events",
    "write_binlog_shards",
    "oracle_final_table",
]
