"""Change-batch sources — the origin scan (S1) with pushdown (F1/F3/F6).

Reference: the origin token-range scan with column projection, token bounds and
user WHERE pushdown (/root/reference src/main/java/com/datastax/cdm/cql/
statement/OriginSelectByPartitionRangeStatement.java:35-64, filter appending
OriginSelectStatement.java:133-139).  Ray-native equivalents:

- column projection  → ``read_parquet(columns=...)``      (F6 skip-list)
- WHERE pushdown     → ``read_parquet(filter=expr)``      (row-group pruning, F3)
- token-range bounds → partition-range predicate on the lake route (F1):
  only events whose deterministic partition ∈ [lo, hi] are processed, so a
  bounded re-run (like the reference's min/max token bounds) touches a slice
  of the ring without reading the rest past the row-group level.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa

import ray.data


def read_change_batches(
    paths: str | Sequence[str],
    *,
    columns: Sequence[str] | None = None,
    filter_expr: "pa.compute.Expression | None" = None,
    file_format: str = "parquet",
) -> ray.data.Dataset:
    """Streaming read of change-batch files with projection + predicate pushdown."""
    if file_format == "parquet":
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = list(columns)
        if filter_expr is not None:
            kwargs["filter"] = filter_expr
        return ray.data.read_parquet(paths, **kwargs)
    if file_format == "json":
        ds = ray.data.read_json(paths)
    elif file_format == "csv":
        ds = ray.data.read_csv(paths)
    else:
        raise ValueError(f"unsupported change-batch format: {file_format}")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    if filter_expr is not None:
        import pyarrow.dataset as pads

        ds = ds.map_batches(
            lambda t: pads.dataset(t).to_table(filter=filter_expr),
            batch_format="pyarrow",
        )
    return ds


class PartitionRangeFilter:
    """F1: keep only events routed to partitions in [lo, hi] (token bounds)."""

    def __init__(self, num_parts: int, lo: int, hi: int, salt: int = 1):
        self.num_parts, self.lo, self.hi, self.salt = num_parts, lo, hi, salt

    def __call__(self, t: pa.Table) -> pa.Table:
        from cassandra_data_migrator_ray.state.partitioning import assign_partition

        part = assign_partition(
            t["conv_id"].to_pandas(), t["turn_idx"].to_pandas(), self.num_parts, self.salt
        )
        mask = (part >= self.lo) & (part <= self.hi)
        return t.filter(pa.array(mask))
