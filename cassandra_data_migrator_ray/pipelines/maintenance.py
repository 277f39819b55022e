"""Lake maintenance: standalone compaction (the gc_grace analogue).

The reference delegates tombstone GC to Cassandra compaction
(gc_grace_seconds, noted in SIT/smoke/03_ttl_writetime/expected.cql); here it
is an explicit job: every partition is rewritten without tombstones older
than ``grace_wt`` (None = drop all — only safe once no event at or below the
dropped writetimes can ever be redelivered), and multi-file partitions are
merged to one file.  Runs through the same receipt + 2-phase commit protocol
as replay, so a crashed compaction never loses or duplicates state.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from functools import partial

import pandas as pd

import ray.data

from cassandra_data_migrator_ray.stages.merge import (
    MergeConfig,
    read_partition_state,
    write_partition_state,
)
from cassandra_data_migrator_ray.state.manifest import Manifest, schema_to_json


@dataclass
class CompactResult:
    run_id: str
    metrics: pd.DataFrame
    seconds: float


def _compact_part(
    cfg: MergeConfig,
    ttl_as_of: int | None,
    cluster_by: tuple[str, ...] | None,
    batch: pd.DataFrame,
) -> pd.DataFrame:
    import time

    import pyarrow as pa

    from cassandra_data_migrator_ray.functions.lww import compact_tombstones
    from cassandra_data_migrator_ray.schema import DELETED
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = []
    for part in batch["part"]:
        t0 = time.perf_counter()
        part = int(part)
        state = read_partition_state(cfg, part)
        if state is None:
            continue
        if cfg.ttl_enabled and ttl_as_of is not None:
            from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

            state = apply_ttl_expiry(state, ttl_as_of, cfg.payload_cols, harden=True)
        state = compact_tombstones(state, cfg.grace_wt)
        # physical layout only — readers never assume an order.  cluster_by
        # leads the sort so parquet row-group statistics become tight on the
        # clustered column(s); key columns break ties for determinism.
        sort_cols = (
            [c for c in cluster_by if c in state.columns]
            + [k for k in cfg.key_cols if k not in cluster_by]
            if cluster_by
            else list(cfg.key_cols)
        )
        state = state.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        rel = write_partition_state(cfg, part, state)
        tombstones = int(state[DELETED].sum())
        receipt = {
            "part": part,
            "run_id": cfg.run_id,
            "files": [rel],
            "watermark": int(cfg.prior_watermarks.get(part, -1)),
            "rows": int(len(state) - tombstones),
            "tombstones": tombstones,
            "status": "PASS",
            "metrics": {"compacted": True},
        }
        atomic_write_json(
            f"{cfg.lake_dir}/_staging/{cfg.run_id}/part-{part:05d}.json", receipt
        )
        out.append(
            {
                "part": part,
                "rows": receipt["rows"],
                "tombstones": tombstones,
                "keys_in": 0,
                "watermark": receipt["watermark"],
                "status": "PASS",
                "file": rel,
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
    return pd.DataFrame(out)


def compact_lake(
    lake_dir: str,
    grace_wt: int | None = None,
    ttl_as_of: int | None = None,
    only_tombstoned: bool = False,
    cluster_by: list[str] | None = None,
) -> CompactResult:
    """Rewrite partitions dropping eligible tombstones (2-phase commit).

    ``only_tombstoned=True`` rewrites just the partitions whose manifest
    entry records tombstones > 0 — the cheap steady-state sweep for
    delete-light lakes (every merge already leaves one file per partition,
    so tombstone GC is the only work compaction has; skipping clean
    partitions makes its cost proportional to deletes, not lake size).
    Untouched partitions keep their files and manifest entries (the commit
    folds receipts over the existing map).  Not valid with ``ttl_as_of``:
    TTL expiry must examine every partition's cells, not just tombstoned
    ones.

    ``cluster_by``: sort each rewritten partition's rows by these columns
    (key columns as tiebreak) before writing — a PHYSICAL layout choice
    only (readers never assume an order; merge-on-read re-folds by hash):
    parquet row-group statistics become tight on the clustered columns, so
    ``read_lake(filter=)`` / ``where=`` range scans on them skip row groups
    instead of decoding every page.  The clustering holds until a later
    replay merges new rows into the partition — re-cluster on the next
    compaction sweep."""
    if only_tombstoned and ttl_as_of is not None:
        raise ValueError("only_tombstoned cannot combine with ttl_as_of")
    import time

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    run_id = "compact-" + uuid.uuid4().hex[:8]
    cfg = MergeConfig(
        lake_dir=lake_dir,
        run_id=run_id,
        payload_cols=manifest.payload_cols(),
        payload_schema_json=schema_to_json(manifest.schema),
        counter_cols=tuple(manifest.counter_cols),
        key_cols=tuple(manifest.key_cols),
        ttl_enabled=manifest.ttl_enabled,
        grace_wt=grace_wt,
        prior_files={k: v.files for k, v in manifest.partitions.items()},
        prior_watermarks=manifest.watermarks(),
    )
    parts = sorted(
        k
        for k, v in manifest.partitions.items()
        if not only_tombstoned or v.tombstones > 0
    )
    if not parts:
        return CompactResult(run_id, pd.DataFrame(), time.perf_counter() - t0)
    ds = ray.data.from_items(
        [{"part": int(k)} for k in parts], override_num_blocks=len(parts)
    )
    cluster = tuple(cluster_by) if cluster_by else None
    if cluster:
        unknown = [c for c in cluster if c not in manifest.schema.names]
        if unknown:
            raise ValueError(f"cluster_by columns not in schema: {unknown}")
    metrics = ds.map_batches(
        partial(_compact_part, cfg, ttl_as_of, cluster),
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()
    manifest.commit_run(
        run_id,
        extra={
            "type": "compact",
            "grace_wt": grace_wt,
            **({"cluster_by": list(cluster)} if cluster else {}),
        },
    )
    return CompactResult(run_id, metrics, time.perf_counter() - t0)


# ---- fsck: lake integrity audit ----------------------------------------------


def _fsck_part(
    lake_dir: str, prior: dict, expect: dict, batch: pd.DataFrame
) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cassandra_data_migrator_ray.schema import DELETED, MAX_SEQ

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = []
    for part in batch["part"]:
        part = int(part)
        issues = []
        tables = []
        for f in prior.get(part) or []:
            path = os.path.join(lake_dir, f)
            try:
                tables.append(pq.read_table(path, columns=[DELETED, MAX_SEQ]))
            except Exception as e:  # unreadable = corrupt
                issues.append(f"unreadable file {f}: {type(e).__name__}")
        if tables and not issues:
            tbl = pa.concat_tables(tables, promote_options="default")
            tombstones = int(
                pc.sum(pc.cast(tbl[DELETED], pa.int64())).as_py() or 0
            )
            rows = int(tbl.num_rows - tombstones)
            state_wm = (
                int(pc.max(tbl[MAX_SEQ]).as_py() or -1) if tbl.num_rows else -1
            )
            e = expect[part]
            if rows != e["rows"]:
                issues.append(f"rows {rows} != manifest {e['rows']}")
            if tombstones != e["tombstones"]:
                issues.append(
                    f"tombstones {tombstones} != manifest {e['tombstones']}"
                )
            if state_wm > e["watermark"]:
                issues.append(
                    f"state max seq {state_wm} beyond manifest watermark "
                    f"{e['watermark']}"
                )
        out.append(
            {"part": part, "ok": not issues, "issues": "; ".join(issues)}
        )
    return pd.DataFrame(out)


def fsck_lake(lake_dir: str, deep: bool = True) -> dict:
    """Integrity audit of a committed lake against its own manifest — the
    operational check a fleet runs before trusting a lake that storage may
    have bit-rotted, a partial copy truncated, or a human touched.

    Driver-side (always): every manifest- and snapshot-referenced file
    exists; data files referenced by nothing are reported as orphans (gc's
    candidates, not corruption).  ``deep=True`` additionally re-reads every
    partition in parallel (one Ray task each, bookkeeping columns only) and
    recomputes row/tombstone counts and the max folded seq against the
    manifest's committed values.  Returns {ok, missing, orphans, partitions
    (DataFrame), seconds}; never mutates anything."""
    import time

    from functools import partial as _partial

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    referenced: set[str] = set()
    for st in manifest.partitions.values():
        referenced.update(st.files)
    snap_refs = manifest._snapshot_referenced_files()
    missing = sorted(
        f
        for f in referenced | snap_refs
        if not os.path.exists(os.path.join(lake_dir, f))
    )
    ddir = os.path.join(lake_dir, "data")
    on_disk = (
        {os.path.join("data", f) for f in os.listdir(ddir)}
        if os.path.isdir(ddir)
        else set()
    )
    orphans = sorted(on_disk - referenced - snap_refs)
    parts_df = pd.DataFrame(columns=["part", "ok", "issues"])
    if deep and manifest.partitions:
        prior = {k: v.files for k, v in manifest.partitions.items()}
        expect = {
            k: {
                "rows": v.rows,
                "tombstones": v.tombstones,
                "watermark": v.watermark,
            }
            for k, v in manifest.partitions.items()
        }
        ds = ray.data.from_items(
            [{"part": int(k)} for k in sorted(manifest.partitions)],
            override_num_blocks=len(manifest.partitions),
        )
        parts_df = ds.map_batches(
            _partial(_fsck_part, lake_dir, prior, expect),
            batch_format="pandas",
            batch_size=None,
        ).to_pandas()
    ok = not missing and (parts_df.empty or bool(parts_df["ok"].all()))
    return {
        "ok": ok,
        "missing": missing,
        "orphans": orphans,
        "partitions": parts_df,
        "seconds": round(time.perf_counter() - t0, 3),
    }


# ---- analyze: per-partition column statistics for scan pruning ---------------


def _analyze_part(
    lake_dir: str, prior_files: dict, cols: list[str], batch: pd.DataFrame
) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = []
    for part in batch["part"]:
        part = int(part)
        files = prior_files.get(part) or []
        if not files:
            continue
        tables = []
        for f in files:
            schema = pq.read_schema(os.path.join(lake_dir, f))
            want = [c for c in cols if c in schema.names]
            tables.append(
                pq.read_table(os.path.join(lake_dir, f), columns=want)
            )
        tbl = pa.concat_tables(tables, promote_options="default")
        for c in cols:
            if c not in tbl.column_names:
                # schema-evolved column absent from every file: all-null
                out.append(
                    {"part": part, "col": c, "lo": None, "hi": None,
                     "nulls": tbl.num_rows, "rows": tbl.num_rows}
                )
                continue
            arr = tbl[c]
            nulls = arr.null_count
            lo = hi = None
            try:
                mm = pc.min_max(arr)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
            except pa.ArrowNotImplementedError:
                pass  # nested/binary types: no range stat, never pruned
            # huge string bounds would bloat the stats file; a truncated
            # bound is NOT safe for pruning, so store none instead
            if isinstance(lo, str) and (len(lo) > 256 or len(str(hi)) > 256):
                lo = hi = None
            out.append(
                {"part": part, "col": c, "lo": lo, "hi": hi,
                 "nulls": nulls, "rows": tbl.num_rows}
            )
    return pd.DataFrame(out)


def _load_prior_stats(lake_dir: str) -> dict | None:
    """The newest stats file of ANY version — raw material for incremental
    reuse (per-partition file-list comparison decides validity, not the
    version stamp)."""
    import glob as _glob
    import json as _json

    sdir = os.path.join(lake_dir, "_stats")
    cands = sorted(_glob.glob(os.path.join(sdir, "v*.json")))
    if not cands:
        return None
    try:
        with open(cands[-1]) as f:
            return _json.load(f)
    except (OSError, ValueError):
        return None


def analyze_lake(
    lake_dir: str,
    columns: list[str] | None = None,
    incremental: bool = True,
) -> dict:
    """Compute per-partition column statistics (min/max/null count/rows) and
    store them version-stamped at ``_stats/v{version}.json`` — the ANALYZE
    step that lets :func:`sources.lake.read_lake` prune partitions by a
    value-range predicate without touching their files (the engine-level
    analogue of parquet row-group statistics, one level up).  One Ray task
    per partition; the driver holds only the stats dict.  Stats are valid
    for exactly the manifest version they were computed at — a later commit
    invalidates them (readers check the stamp).

    ``incremental`` (default): stats record the exact file list each
    partition was computed from (``part_files``); a re-ANALYZE after a
    commit recomputes ONLY partitions whose file list changed and carries
    the rest forward — maintenance cost proportional to churn, not lake
    size (a replay touching 1% of a 100 TB lake re-reads 1% of it).  The
    identical-files ⇒ identical-stats invariant makes the carried entries
    exact, not approximate.  Set ``incremental=False`` to force a full
    rescan."""
    import json as _json
    import time

    from functools import partial as _partial

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    cols = list(columns) if columns else list(manifest.schema.names)
    parts = sorted(manifest.partitions)
    stats: dict = {
        "version": manifest.version,
        "computed_at": time.time(),
        "columns": cols,
        "partitions": {},
        "part_files": {
            str(int(p)): sorted(manifest.partitions[p].files) for p in parts
        },
        "reused_parts": 0,
        "recomputed_parts": 0,
    }
    todo = list(parts)
    if incremental and parts:
        prior_stats = _load_prior_stats(lake_dir)
        if prior_stats and "part_files" in prior_stats:
            pfiles = prior_stats["part_files"]
            pparts = prior_stats.get("partitions", {})
            still = []
            for p in parts:
                key = str(int(p))
                ent = pparts.get(key)
                if (
                    pfiles.get(key) == stats["part_files"][key]
                    and ent is not None
                    and all(c in ent for c in cols)
                ):
                    stats["partitions"][key] = {c: ent[c] for c in cols}
                else:
                    still.append(p)
            stats["reused_parts"] = len(parts) - len(still)
            todo = still
    stats["recomputed_parts"] = len(todo)
    if todo:
        prior = {k: v.files for k, v in manifest.partitions.items()}
        ds = ray.data.from_items(
            [{"part": int(p)} for p in todo], override_num_blocks=len(todo)
        )
        rows = ds.map_batches(
            _partial(_analyze_part, lake_dir, prior, cols),
            batch_format="pandas",
            batch_size=None,
        ).to_pandas()
        for part, g in rows.groupby("part"):
            stats["partitions"][str(int(part))] = {
                r["col"]: {
                    "lo": None if pd.isna(r["lo"]) else r["lo"],
                    "hi": None if pd.isna(r["hi"]) else r["hi"],
                    "nulls": int(r["nulls"]),
                    "rows": int(r["rows"]),
                }
                for _, r in g.iterrows()
            }
    sdir = os.path.join(lake_dir, "_stats")
    os.makedirs(sdir, exist_ok=True)
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    # timestamps are not JSON-roundtrip-safe; store the ISO string (which
    # compares lexicographically == chronologically at a fixed format).
    # Any OTHER non-JSON-native bound (bytes, Decimal, date32 objects from a
    # binary/decimal payload column) would crash json.dumps — and a lossy
    # string form of it is NOT order-safe for pruning — so drop the bound
    # (lo=hi=None, never prunes), mirroring the huge-string / nested-type
    # handling in _analyze_part.
    import datetime as _dt

    import numpy as _np

    _JSON_NATIVE = (str, int, float, bool)

    def _enc(v):
        if v is None or isinstance(v, _JSON_NATIVE):
            return v
        if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
            return str(v)
        if isinstance(v, _np.integer):
            return int(v)
        if isinstance(v, (_np.floating, _np.bool_)):
            return v.item()
        return None

    for p in stats["partitions"].values():
        for c in p.values():
            lo, hi = _enc(c["lo"]), _enc(c["hi"])
            if (lo is None) != (hi is None):  # half-dropped range never prunes
                lo = hi = None
            c["lo"], c["hi"] = lo, hi
    atomic_write_json(
        os.path.join(sdir, f"v{manifest.version:06d}.json"), stats
    )
    # stats are advisory (readers fall back to full scans), so keeping only
    # the newest few bounds _stats/ growth without any safety cost; the
    # newest is this one, so incremental reuse is unaffected.
    import glob as _glob

    for old in sorted(_glob.glob(os.path.join(sdir, "v*.json")))[:-4]:
        try:
            os.unlink(old)
        except OSError:
            pass
    stats["seconds"] = round(time.perf_counter() - t0, 3)
    return stats


def load_stats(lake_dir: str) -> dict | None:
    """The stats for the lake's CURRENT manifest version, or None if absent
    or stale (computed at an older version)."""
    import json as _json

    manifest = Manifest.load(lake_dir)
    if manifest is None:
        return None
    p = os.path.join(lake_dir, "_stats", f"v{manifest.version:06d}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


# ---- reshard: change the lake's (num_parts, salt) layout ---------------------
# The reference fixes its parallelism unit at job-submit time (numParts,
# job/SplitPartitions.java:32-76) — a lake sized for its initial stream has no
# way to grow with the data.  reshard_lake() re-keys a COMMITTED lake to a new
# hash layout in two map-only Ray stages (the same staged-exchange shape as
# replay, stages/staging.py): each old partition's state routes to new
# partitions (only state rows move — never the event history), then one task
# per new partition concatenates, sorts and writes its state file.  The commit
# atomically replaces the partition map AND the layout, so readers never see
# files placed under one layout described by another; time-travel snapshots
# pin the old files + old layout and remain readable until vacuum().


def _reshard_stage_part(
    cfg: MergeConfig,
    num_parts: int,
    salt: int,
    staging_dir: str,
    chaos_dir: str | None,
    batch: pd.DataFrame,
) -> pd.DataFrame:
    """Phase 1 body: route one old partition's state rows to their new
    partitions and write staged Arrow-IPC slices (content-addressed, so a
    retried task overwrites byte-identically instead of duplicating rows)."""
    import pyarrow as pa

    from cassandra_data_migrator_ray.stages.merge import read_partition_state_arrow
    from cassandra_data_migrator_ray.stages.normalize import PART_COL
    from cassandra_data_migrator_ray.stages.staging import StageWriter
    from cassandra_data_migrator_ray.state.partitioning import assign_partition_keys

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    writer = StageWriter(staging_dir, bytes_fingerprint=True, chaos_dir=chaos_dir)
    out = []
    for part in batch["part"]:
        state = read_partition_state_arrow(cfg, int(part))
        if state is None or state.num_rows == 0:
            continue
        route = assign_partition_keys(
            [state.column(c) for c in cfg.key_cols], num_parts, salt
        )
        staged = writer(state.append_column(PART_COL, pa.array(route)))
        if len(staged):
            out.append(staged)
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(
            {"part": pd.Series([], dtype="int32"), "rows": pd.Series([], dtype="int64")}
        )
    )


def _reshard_write_part(
    cfg: MergeConfig,
    staging_dir: str,
    watermark: int,
    chaos_dir: str | None,
    batch: pd.DataFrame,
) -> pd.DataFrame:
    """Phase 2 body: concat one NEW partition's staged slices, sort by key,
    write its state file + receipt (resume-safe via the receipt protocol)."""
    import time

    import pyarrow as pa
    import pyarrow.compute as pc

    from cassandra_data_migrator_ray.schema import DELETED, write_parquet_atomic
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    if chaos_dir:
        # tests only: one phase-2 worker dies here; the retried task rewrites
        # the same deterministic part-file + receipt (idempotent overwrite)
        from cassandra_data_migrator_ray.stages.staging import _chaos_crash_once

        _chaos_crash_once(chaos_dir, "reshard2")
    out = []
    for part in batch["part"]:
        t0 = time.perf_counter()
        part = int(part)
        pdir = os.path.join(staging_dir, f"part={part:05d}")
        files = sorted(
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.startswith("blk-") and f.endswith(".arrow")
        )
        if not files:
            continue

        def _read_ipc(path: str) -> pa.Table:
            with pa.memory_map(path) as src:
                return pa.ipc.open_file(src).read_all()

        state = pa.concat_tables([_read_ipc(f) for f in files])
        order = pc.sort_indices(
            state, sort_keys=[(c, "ascending") for c in cfg.key_cols]
        )
        state = state.take(order)
        rel = os.path.join("data", f"part-{part:05d}-{cfg.run_id}.parquet")
        write_parquet_atomic(state, os.path.join(cfg.lake_dir, rel))
        tombstones = int(
            pc.sum(pc.cast(state.column(DELETED), pa.int64())).as_py() or 0
        )
        receipt = {
            "part": part,
            "run_id": cfg.run_id,
            "files": [rel],
            "watermark": watermark,
            "rows": int(state.num_rows - tombstones),
            "tombstones": tombstones,
            "status": "PASS",
            "metrics": {"resharded": True},
        }
        atomic_write_json(
            f"{cfg.lake_dir}/_staging/{cfg.run_id}/part-{part:05d}.json", receipt
        )
        out.append(
            {
                "part": part,
                "rows": receipt["rows"],
                "tombstones": tombstones,
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
    return pd.DataFrame(out)


def reshard_lake(
    lake_dir: str,
    num_parts: int,
    salt: int | None = None,
    chaos_dir: str | None = None,
) -> CompactResult:
    """Re-key a committed lake to ``(num_parts, salt)`` new hash partitions.

    Requires every partition PASS/DIFF_CORRECTED (a partially-replayed lake
    has per-partition watermarks that cannot be transplanted to a new
    layout).  New partitions carry the GLOBAL max watermark: the old stream
    was fully committed, so every event at or below it was merged somewhere
    — and empty new partitions (absent from the manifest, watermark −1) can
    only receive events for keys whose state was tombstone-compacted, which
    compaction already preconditions on no-redelivery."""
    import time

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    salt = manifest.salt if salt is None else int(salt)
    num_parts = int(num_parts)
    if num_parts < 1 or salt < 1:
        raise ValueError("num_parts and salt must be >= 1")
    bad = {
        k: v.status
        for k, v in manifest.partitions.items()
        if v.status not in ("PASS", "DIFF_CORRECTED")
    }
    if bad:
        raise RuntimeError(
            f"reshard requires a fully committed lake; partitions not PASS: {bad}"
        )
    if num_parts == manifest.num_parts and salt == manifest.salt:
        return CompactResult("noop", pd.DataFrame(), time.perf_counter() - t0)
    run_id = "reshard-" + uuid.uuid4().hex[:8]
    cfg = MergeConfig(
        lake_dir=lake_dir,
        run_id=run_id,
        payload_cols=manifest.payload_cols(),
        payload_schema_json=schema_to_json(manifest.schema),
        counter_cols=tuple(manifest.counter_cols),
        key_cols=tuple(manifest.key_cols),
        ttl_enabled=manifest.ttl_enabled,
        prior_files={k: v.files for k, v in manifest.partitions.items()},
        prior_watermarks=manifest.watermarks(),
    )
    staging_dir = os.path.join(manifest.staging_dir(run_id), "exchange")
    os.makedirs(staging_dir, exist_ok=True)
    old_parts = sorted(manifest.partitions)
    watermark = max(
        [v.watermark for v in manifest.partitions.values()], default=-1
    )
    metrics = pd.DataFrame()
    if old_parts:
        ds = ray.data.from_items(
            [{"part": int(k)} for k in old_parts], override_num_blocks=len(old_parts)
        )
        ds.map_batches(
            partial(_reshard_stage_part, cfg, num_parts, salt, staging_dir, chaos_dir),
            batch_format="pandas",
            batch_size=None,
        ).materialize()  # barrier: every slice staged before any new partition folds
        new_parts = sorted(
            int(d.split("=")[1])
            for d in os.listdir(staging_dir)
            if d.startswith("part=")
        )
        if new_parts:
            ds2 = ray.data.from_items(
                [{"part": p} for p in new_parts], override_num_blocks=len(new_parts)
            )
            metrics = ds2.map_batches(
                partial(_reshard_write_part, cfg, staging_dir, watermark, chaos_dir),
                batch_format="pandas",
                batch_size=None,
            ).to_pandas()
    manifest.commit_run(
        run_id,
        extra={"type": "reshard", "num_parts": num_parts, "salt": salt},
        replace_partitions=True,
        new_layout=(num_parts, salt),
    )
    return CompactResult(run_id, metrics, time.perf_counter() - t0)
