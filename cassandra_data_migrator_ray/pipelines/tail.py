"""WAL/binlog-tail micro-batch ingest + per-partition throughput/lag metrics.

The reference is batch-only (each Migrate run covers a token range,
job/Migrate.scala); its "keep the target caught up" story is re-running the
job over new data, rerun-safe because writes carry original writetimes
(cql/statement/TargetInsertStatement.java:128-133).  This module makes that
loop a first-class operator: ``tail_replay`` watches a directory of
change-batch Parquet files (the binlog/WAL tail shape — CDC producers append
closed segment files) and replays each new stable file set through the normal
exactly-once ``replay`` pipeline.

Exactly-once across crashes needs no coordination between the ledger and the
manifest: if the process dies after a commit but before the ledger update,
the next cycle re-replays the same files under a fresh run_id and the
per-partition high-watermark filter (``stages/normalize.py``) drops every
already-merged event — the rerun is a no-op merge, after which the ledger
catches up.  The ledger is therefore only an optimization (skip re-reading
ingested files), never a correctness dependency.

``lag_report`` is the per-partition throughput/lag metrics surface: manifest
counters (rows, watermark, status, files) plus, with ``scan=True``, event-time
lag computed from the lake's persisted ``__row_wt`` state column via one
column-pruned Arrow scan.
"""

from __future__ import annotations

import glob as globmod
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from cassandra_data_migrator_ray.pipelines.replay import ReplayResult, replay
from cassandra_data_migrator_ray.schema import ROW_WT
from cassandra_data_migrator_ray.state.manifest import Manifest, atomic_write_json


@dataclass
class TailResult:
    cycles: int
    files_ingested: list[str] = field(default_factory=list)
    keys_merged: int = 0
    results: list[ReplayResult] = field(default_factory=list)


def _ledger_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_tail_ledger.json")


def _load_ledger(lake_dir: str) -> dict:
    try:
        with open(_ledger_path(lake_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"files": {}}


def tail_replay(
    source_dir: str,
    lake_dir: str,
    *,
    pattern: str = "*.parquet",
    poll_interval: float = 1.0,
    min_age_s: float = 0.0,
    max_cycles: int | None = None,
    stop_after_idle_cycles: int | None = None,
    file_format: str = "parquet",
    event_schema=None,
    **replay_kwargs,
) -> TailResult:
    """Micro-batch tail loop: ingest new change-batch files as they appear.

    - ``min_age_s``: a file must be at least this old (mtime) before it is
      ingested — lets producers finish writing a segment.  Producers that
      write-then-rename can run with 0.
    - ``max_cycles`` / ``stop_after_idle_cycles`` bound the loop (tests /
      drain-then-exit operation).  With both ``None`` the loop runs forever
      (the service shape).
    - extra kwargs flow to :func:`replay` (num_parts, counter_cols, ...).
    """
    os.makedirs(lake_dir, exist_ok=True)
    ledger = _load_ledger(lake_dir)
    out = TailResult(cycles=0)
    idle = 0
    while True:
        if max_cycles is not None and out.cycles >= max_cycles:
            break
        out.cycles += 1
        now = time.time()
        seen = sorted(globmod.glob(os.path.join(source_dir, pattern)))

        def _old_enough(f: str) -> bool:
            if min_age_s <= 0:
                return True
            try:
                return now - os.path.getmtime(f) >= min_age_s
            except OSError:
                return False  # vanished between glob and stat: skip this cycle

        fresh = [f for f in seen if f not in ledger["files"] and _old_enough(f)]
        if fresh:
            idle = 0
            # deterministic id per FILE SET: a crashed cycle's rerun with the
            # same files reuses the id (resumes from its receipts); if MORE
            # files arrived before the rerun the set differs → a fresh id, so
            # stale receipts can never skip partitions that now carry new
            # events (the old files' events are watermark-filtered no-ops)
            import hashlib

            digest = hashlib.blake2s(
                "\n".join(fresh).encode(), digest_size=6
            ).hexdigest()
            run_id = f"tail-{len(ledger['files']):08d}-{digest}"
            if file_format == "parquet":
                events = fresh  # path list: replay's metadata-only count path
            else:
                from cassandra_data_migrator_ray.sources.events import (
                    read_change_batches,
                )

                events = read_change_batches(
                    fresh, file_format=file_format, schema=event_schema
                )
            res = replay(events, lake_dir, run_id=run_id, **replay_kwargs)
            out.results.append(res)
            out.keys_merged += res.events_merged_keys
            out.files_ingested.extend(fresh)
            for f in fresh:
                ledger["files"][f] = {
                    "size": os.path.getsize(f),
                    "run_id": run_id,
                }
            atomic_write_json(_ledger_path(lake_dir), ledger)
        else:
            idle += 1
            if stop_after_idle_cycles is not None and idle >= stop_after_idle_cycles:
                break
        if poll_interval > 0 and (max_cycles is None or out.cycles < max_cycles):
            time.sleep(poll_interval)
    return out


def lag_report(
    lake_dir: str, *, scan: bool = False, now_us: int | None = None
) -> pd.DataFrame:
    """Per-partition throughput/lag metrics (one row per partition).

    Manifest-only columns (no data scan): ``partition, rows, tombstones,
    watermark_seq, status, n_files``.  With ``scan=True`` adds event-time lag:
    ``max_row_wt`` (newest live cell writetime in the partition, from the
    persisted ``__row_wt`` state column via a column-pruned scan) and
    ``lag_us = now_us - max_row_wt``.
    """
    m = Manifest.load(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no lake manifest under {lake_dir}")
    rows = [
        {
            "partition": part,
            "rows": st.rows,
            "tombstones": st.tombstones,
            "watermark_seq": st.watermark,
            "status": st.status,
            "n_files": len(st.files),
        }
        for part, st in sorted(m.partitions.items())
    ]
    rep = pd.DataFrame(
        rows,
        columns=["partition", "rows", "tombstones", "watermark_seq", "status", "n_files"],
    )
    if scan and len(rep):
        import ray

        now = int(now_us if now_us is not None else time.time() * 1_000_000)
        # one Ray task per (partition, file): the column-pruned __row_wt
        # scans run on workers; the driver folds only one tiny row per file
        # (at 100 TB the files hold the data — a driver-side read loop here
        # would pull the whole writetime column through one process)
        items = [
            {"part": int(part), "path": os.path.join(lake_dir, f)}
            for part, st in sorted(m.partitions.items())
            for f in st.files
        ]
        max_wt = np.full(len(rep), np.iinfo(np.int64).min, dtype=np.int64)
        if items:

            def _file_max(batch: pd.DataFrame) -> pd.DataFrame:
                import pyarrow.parquet as pq

                def footer_max(path: str) -> int | None:
                    # parquet row-group statistics carry the column max —
                    # a footer read replaces decoding the whole __row_wt
                    # column (Cassandra's own SSTable-metadata trick); any
                    # row group without usable stats falls back to a scan
                    pf = pq.ParquetFile(path)
                    # row-group column indices run over the FLATTENED
                    # parquet leaves (nested payload columns add leaves),
                    # so locate ROW_WT by leaf path, not arrow position
                    leaf = pf.metadata.schema
                    ci = next(
                        (
                            i
                            for i in range(pf.metadata.num_columns)
                            if leaf.column(i).path == ROW_WT
                        ),
                        None,
                    )
                    if ci is None:
                        return None
                    best = None
                    for rg in range(pf.metadata.num_row_groups):
                        col = pf.metadata.row_group(rg).column(ci)
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            return None
                        best = st.max if best is None else max(best, st.max)
                    return int(best) if best is not None else None

                out = []
                for part, path in zip(batch["part"], batch["path"]):
                    mx = footer_max(path)
                    if mx is None:
                        t = pq.read_table(path, columns=[ROW_WT])
                        if not len(t):
                            continue
                        mx = int(
                            t.column(ROW_WT)
                            .to_numpy(zero_copy_only=False)
                            .max()
                        )
                    out.append({"part": int(part), "max_wt": mx})
                return pd.DataFrame(
                    out, columns=["part", "max_wt"]
                ).astype({"part": np.int64, "max_wt": np.int64})

            per_file = (
                ray.data.from_items(
                    items, override_num_blocks=min(len(items), 256)
                )
                .map_batches(_file_max, batch_format="pandas")
                .to_pandas()
            )
            if len(per_file):
                part_pos = {
                    int(p): i for i, p in enumerate(rep["partition"])
                }
                for part, mx in (
                    per_file.groupby("part")["max_wt"].max().items()
                ):
                    max_wt[part_pos[int(part)]] = int(mx)
        rep["max_row_wt"] = max_wt
        rep["lag_us"] = np.where(
            max_wt > np.iinfo(np.int64).min, now - max_wt, np.int64(-1)
        )
    return rep


def run_throughput(lake_dir: str) -> pd.DataFrame:
    """Per-run ingest throughput from the manifest's run ledger: one row per
    committed replay run — ``run_id, committed_at, keys_in, partitions``."""
    m = Manifest.load(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no lake manifest under {lake_dir}")
    rows = [
        {
            "run_id": r.get("run_id"),
            "committed_at": r.get("committed_at"),
            "keys_in": r.get("keys_in", 0),
            "partitions": len(r.get("partitions", [])),
        }
        for r in m.runs
        if r.get("type") == "replay"
    ]
    return pd.DataFrame(
        rows, columns=["run_id", "committed_at", "keys_in", "partitions"]
    )


def lineage_report(lake_dir: str) -> pd.DataFrame:
    """File-level lineage, one row per (partition, file): which run wrote
    each live partition file, at which commit version, and how many older
    versions of the partition time travel still retains (reference run
    ledger cdm_run_details per-range statuses, TargetUpsertRunDetailsStatement
    .java:63-216, upgraded to file granularity).  Manifest/snapshot metadata
    only — no data scan."""
    from cassandra_data_migrator_ray.state.manifest import (
        Manifest,
        _partfile_run_id,
    )

    m = Manifest.load(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no lake manifest under {lake_dir}")
    run_version = {r.get("run_id"): r.get("version") for r in m.runs}
    # per partition: how many RETAINED versions show a different (older)
    # file set than the live one — the time-travel depth for that partition
    per_part_snap: dict[int, list[frozenset]] = {}
    for v in m.list_snapshots():
        snap = m.snapshot(v) or {}
        for part, files in snap.get("partitions", {}).items():
            per_part_snap.setdefault(int(part), []).append(frozenset(files))
    rows = []
    for part, st in sorted(m.partitions.items()):
        live = frozenset(st.files)
        older = sum(1 for s in per_part_snap.get(part, []) if s != live)
        for f in st.files:
            rid = _partfile_run_id(os.path.basename(f))
            rows.append(
                {
                    "partition": part,
                    "file": f,
                    "written_by_run": rid,
                    "committed_version": run_version.get(rid),
                    "watermark_seq": st.watermark,
                    "rows": st.rows,
                    "status": st.status,
                    "retained_versions": older,
                }
            )
    return pd.DataFrame(
        rows,
        columns=[
            "partition", "file", "written_by_run", "committed_version",
            "watermark_seq", "rows", "status", "retained_versions",
        ],
    )
