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


_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".arrow": "arrow",
    ".ipc": "arrow",
    ".feather": "arrow",
}


def _sniff_format(paths) -> str:
    import os

    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(p):
        # first entry with a KNOWN extension — directories often hold marker
        # files (_SUCCESS) or subdirs that would defeat a naive first-entry
        for name in sorted(os.listdir(p)):
            fmt = _EXT_FORMAT.get(os.path.splitext(name)[1].lower())
            if fmt is not None:
                return fmt
        raise ValueError(
            f"cannot sniff change-batch format from directory {p!r}; "
            "pass file_format="
        )
    fmt = _EXT_FORMAT.get(os.path.splitext(p)[1].lower())
    if fmt is None:
        raise ValueError(
            f"cannot sniff change-batch format from {p!r}; pass file_format="
        )
    return fmt


def read_change_batches(
    paths: str | Sequence[str],
    *,
    columns: Sequence[str] | None = None,
    filter_expr: "pa.compute.Expression | None" = None,
    file_format: str = "auto",
    schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Streaming read of change-batch files with projection + predicate
    pushdown.  Formats: parquet (full pushdown), csv / json-lines / Arrow IPC
    (projection + post-read filter).  ``file_format="auto"`` sniffs from the
    extension.  ``schema`` coerces per batch to the declared event types —
    CSV/JSON carry no type system, so e.g. an ISO-8601 ``ts`` string column
    parses to ``timestamp[us]`` and integer columns narrow safely; pass the
    EVENTS-shaped schema so replay's type checks see proper Arrow types."""
    if file_format == "auto":
        file_format = _sniff_format(paths)
    if file_format == "parquet":
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = list(columns)
        if filter_expr is not None:
            kwargs["filter"] = filter_expr
        ds = ray.data.read_parquet(paths, **kwargs)
        return _coerce(ds, schema)
    if file_format == "json":
        ds = ray.data.read_json(paths)
    elif file_format == "csv":
        from pyarrow import csv as pacsv

        # CDC convention: an unquoted empty field is NULL (unset semantics),
        # a quoted "" is the empty string — CSV has no native null and
        # conflating the two would turn LWW 'keep existing' into 'overwrite
        # with empty'
        ds = ray.data.read_csv(
            paths,
            convert_options=pacsv.ConvertOptions(
                strings_can_be_null=True, quoted_strings_can_be_null=False
            ),
        )
    elif file_format == "arrow":
        import glob as _glob
        import os

        flist = []
        for p in paths if isinstance(paths, (list, tuple)) else [paths]:
            if os.path.isdir(p):
                flist += sorted(_glob.glob(os.path.join(p, "*")))
            else:
                flist.append(p)

        def _load_ipc(batch) -> pa.Table:
            tabs = []
            for f in batch["path"]:
                with pa.memory_map(f) as src:
                    tabs.append(pa.ipc.open_file(src).read_all())
            return pa.concat_tables(tabs)

        # one task per file: the files are read inside Ray tasks (streaming),
        # never materialized on the driver
        ds = ray.data.from_items(
            [{"path": f} for f in flist], override_num_blocks=max(1, len(flist))
        ).map_batches(_load_ipc, batch_format="pandas", batch_size=1)
    else:
        raise ValueError(f"unsupported change-batch format: {file_format}")
    if filter_expr is not None:
        import pyarrow.dataset as pads

        # filter BEFORE projection (parquet-path parity: predicates may
        # reference columns outside the projection)
        ds = ds.map_batches(
            lambda t: pads.dataset(t).to_table(filter=filter_expr),
            batch_format="pyarrow",
        )
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return _coerce(ds, schema)


def _coerce(ds: ray.data.Dataset, schema: pa.Schema | None) -> ray.data.Dataset:
    if schema is None:
        return ds

    def cast_batch(t: pa.Table) -> pa.Table:
        for f in schema:
            if f.name in t.column_names:
                col = t.column(f.name)
                if col.type != f.type:
                    t = t.set_column(
                        t.column_names.index(f.name), f.name, col.cast(f.type)
                    )
        return t

    return ds.map_batches(cast_batch, batch_format="pyarrow")


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
