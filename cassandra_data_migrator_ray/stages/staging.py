"""Filesystem-staged exchange — the lakehouse-ingest alternative to a sort
shuffle.

Instead of routing events through the object store's all-to-all (a global sort
in Ray Data's groupby), stage 1 is a map-only pass that appends each block's
rows into per-partition staging files, and stage 2 is one independent task per
partition that reads its staged slice + current lake state, folds, and writes
the new partition file.  This is the standard partitioned-write → compaction
shape of lakehouse ingestion (Delta/Hudi-style) expressed as two chained
Dataset stages.

Why it's safe:
- a retried stage-1 task writes a second staged copy of the same events; the
  LWW fold is idempotent under exact duplicates (same (writetime, event_seq)
  ⇒ same cell), so duplicated staged rows are harmless;
- staged files live under the run's staging dir and are deleted on commit —
  readers only ever see manifest-referenced files.

Scale notes (100 TB): stage-1 file count = blocks × partitions-touched-per-
block; use block-level batches (batch_size=None) and, at very high partition
counts, a two-level route (coarse partition dirs, fine partition resolved in
stage 2) to keep the file count linear in blocks.  Requires shared storage on
a multi-node cluster (as lakehouse ingestion does); the object-store groupby
path (`shuffle="groupby"`) remains for deployments without it.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cassandra_data_migrator_ray.stages.normalize import PART_COL


class StageWriter:
    """Map-only stage 1: split each normalized block by partition and append
    staged parquet slices.  Emits one bookkeeping row per (block, part)."""

    def __init__(self, staging_dir: str):
        self.staging_dir = staging_dir

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({"part": pd.Series([], dtype="int32"),
                                 "rows": pd.Series([], dtype="int64")})
        part = batch.column(PART_COL).to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        sorted_tbl = batch.take(pa.array(order))
        sp = part[order]
        bounds = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
        bounds = np.r_[bounds, len(sp)]
        rows = []
        blk = uuid.uuid4().hex[:16]
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            k = int(sp[lo])
            pdir = os.path.join(self.staging_dir, f"part={k:05d}")
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, f"blk-{blk}-{i}.parquet")
            slice_tbl = sorted_tbl.slice(lo, hi - lo).drop_columns([PART_COL])
            tmp = path + ".tmp"
            pq.write_table(slice_tbl, tmp, compression="lz4")
            os.replace(tmp, path)
            rows.append({"part": np.int32(k), "rows": np.int64(hi - lo)})
        return pd.DataFrame(rows)


def merge_staged_partition(cfg, staging_dir: str, group: pd.DataFrame) -> pd.DataFrame:
    """Stage 2 body: fold one partition's staged events + prior lake state.

    ``cfg`` is a stages.merge.MergeConfig; reuses its receipt/commit protocol.
    """
    from cassandra_data_migrator_ray.stages.merge import merge_partition_group

    part = int(group["part"].iloc[0])
    pdir = os.path.join(staging_dir, f"part={part:05d}")
    files = (
        sorted(os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet"))
        if os.path.isdir(pdir)
        else []
    )
    if not files:
        from cassandra_data_migrator_ray.stages.merge import METRICS_COLUMNS

        return pd.DataFrame(columns=METRICS_COLUMNS)
    events = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    events[PART_COL] = np.int32(part)
    return merge_partition_group(cfg, events)
