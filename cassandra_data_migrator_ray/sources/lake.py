"""Lake readers: manifest-aware, projection-pruned, tombstone-filtered.

Only manifest-referenced files are read (uncommitted writes are invisible —
the read side of the exactly-once story).  The public view hides the per-cell
LWW bookkeeping columns and tombstone rows.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from cassandra_data_migrator_ray.schema import DELETED
from cassandra_data_migrator_ray.state.manifest import Manifest


def lake_files(manifest: Manifest, parts: list[int] | None = None) -> list[str]:
    items = (
        manifest.partitions.items()
        if parts is None
        else [(p, manifest.partitions[p]) for p in parts if p in manifest.partitions]
    )
    return [os.path.join(manifest.lake_dir, f) for _, st in items for f in st.files]


def read_lake(
    lake_dir: str,
    columns: list[str] | None = None,
    include_tombstones: bool = False,
    parts: list[int] | None = None,
    as_of: int | None = None,
) -> ray.data.Dataset:
    """Public view of the lake as a streaming Dataset (column-pruned read).

    ``as_of`` (µs): for TTL-enabled lakes, evaluate per-cell expiry at this
    instant (same semantics as :func:`read_lake_pandas`) — expired cells read
    as null and fully-expired rows disappear, per batch, streaming."""
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    files = lake_files(manifest, parts)
    public_cols = columns or [*manifest.key_cols, *manifest.payload_cols()]
    ttl_eval = as_of is not None and manifest.ttl_enabled
    read_cols = None if ttl_eval else list(dict.fromkeys([*public_cols, DELETED]))
    if not files:
        # empty lake: surface the MANIFEST's declared types, not all-string
        empty_schema = pa.schema(
            [
                manifest.schema.field(c)
                if c in manifest.schema.names
                else pa.field(c, pa.string())
                for c in public_cols
            ]
        )
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=empty_schema))
    ds = ray.data.read_parquet(files, columns=read_cols)
    if ttl_eval:
        from functools import partial

        from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

        payload = manifest.payload_cols()

        def expire(batch: pd.DataFrame, at: int) -> pd.DataFrame:
            return apply_ttl_expiry(batch, at, payload)

        ds = ds.map_batches(partial(expire, at=as_of), batch_format="pandas")
    if not include_tombstones:
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t[DELETED])).select(public_cols),
            batch_format="pyarrow",
        )
    return ds


def read_lake_pandas(
    lake_dir: str,
    include_tombstones: bool = False,
    internal: bool = False,
    as_of: int | None = None,
) -> pd.DataFrame:
    """Driver-side full read — tests and small lakes only.

    ``as_of`` (µs): for TTL-enabled lakes, evaluate per-cell expiry at this
    instant — expired cells read as null, fully-expired rows disappear."""
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    files = lake_files(manifest)
    if not files:
        return pd.DataFrame(columns=[*manifest.key_cols, *manifest.payload_cols()])
    tbl = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
    df = tbl.to_pandas()
    if as_of is not None and manifest.ttl_enabled:
        from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

        df = apply_ttl_expiry(df, as_of, manifest.payload_cols())
    if not include_tombstones:
        df = df[~df[DELETED].to_numpy(dtype=bool)]
    if not internal:
        df = df[[*manifest.key_cols, *manifest.payload_cols()]]
    return df.sort_values(list(manifest.key_cols), kind="mergesort", ignore_index=True)
