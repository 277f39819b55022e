"""cassandra_data_migrator_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the query and data-processing capabilities of
datastax/cassandra-data-migrator (reference at /root/reference, Java/Spark) as an
idiomatic Ray Data pipeline over Parquet tables of conversation transcripts:

    read change batches (parquet)
      -> map_batches: normalize / convert / filter      (stateless Arrow kernels)
      -> hash-partition by conv_id (+ salting)          (the one shuffle)
      -> per-partition last-writer-wins merge           (groupby(part).map_groups)
      -> copy-on-write partitioned Parquet lake
      -> two-phase manifest commit (exactly-once sink, checkpoint resume)

Validation re-implements the reference's DiffData job as a co-partitioned, sorted
per-conversation anti-join (MISSING / MISMATCH / VALID + autocorrect).

Nothing here calls ray.init()/ray.shutdown(); the caller owns the Ray session.
"""

from cassandra_data_migrator_ray.schema import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    EVENTS_SCHEMA,
    PAYLOAD_COLS,
    KEY_COLS,
)

__version__ = "0.1.0"
