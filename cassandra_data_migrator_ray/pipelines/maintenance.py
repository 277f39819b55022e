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
    if not only_tombstoned:
        # full sweep rewrote every partition aligned to the declared schema:
        # bytes of metadata-only dropped columns are purged, names free again
        manifest.dropped_cols = []
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
    # the reshard rewrite aligned every row to the declared schema, purging
    # any metadata-only dropped columns' bytes along the way
    manifest.dropped_cols = []
    manifest.commit_run(
        run_id,
        extra={"type": "reshard", "num_parts": num_parts, "salt": salt},
        replace_partitions=True,
        new_layout=(num_parts, salt),
    )
    return CompactResult(run_id, metrics, time.perf_counter() - t0)


# ---- ALTER: rename / drop payload columns -------------------------------------


def _alter_part(
    old_cfg: MergeConfig,
    new_cfg: MergeConfig,
    state_map: dict[str, str],
    batch: pd.DataFrame,
) -> pd.DataFrame:
    """Rewrite one partition under the renamed/dropped state schema.

    Read aligned to the OLD state schema, rename payload + bookkeeping
    columns, project onto the NEW state schema (dropping removed columns and
    their bookkeeping), write copy-on-write, stage a receipt.  Content is
    deterministic per (partition, run_id): a retried task overwrites its
    first attempt byte-for-byte, preserving exactly-once under Ray retry.
    """
    import time

    import pyarrow as pa
    import pyarrow.compute as pc

    from cassandra_data_migrator_ray.schema import (
        DELETED,
        align_to_schema,
        write_parquet_atomic,
    )
    from cassandra_data_migrator_ray.stages.merge import (
        _arrow_state_schema,
        read_partition_state_arrow,
    )
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = []
    new_state_schema = _arrow_state_schema(new_cfg)
    for part in batch["part"]:
        t0 = time.perf_counter()
        part = int(part)
        state = read_partition_state_arrow(old_cfg, part)
        if state is None:
            continue
        state = state.rename_columns(
            [state_map.get(n, n) for n in state.column_names]
        )
        state = align_to_schema(state, new_state_schema)
        rel = os.path.join("data", f"part-{part:05d}-{new_cfg.run_id}.parquet")
        path = os.path.join(new_cfg.lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_parquet_atomic(state, path)
        tombstones = int(pc.sum(state.column(DELETED)).as_py() or 0)
        receipt = {
            "part": part,
            "run_id": new_cfg.run_id,
            "files": [rel],
            "watermark": int(old_cfg.prior_watermarks.get(part, -1)),
            "rows": int(state.num_rows - tombstones),
            "tombstones": tombstones,
            "status": "PASS",
            "metrics": {"altered": True},
        }
        atomic_write_json(
            f"{new_cfg.lake_dir}/_staging/{new_cfg.run_id}/part-{part:05d}.json",
            receipt,
        )
        out.append(
            {
                "part": part,
                "rows": receipt["rows"],
                "tombstones": tombstones,
                "status": "PASS",
                "file": rel,
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
    return pd.DataFrame(out)


def alter_lake(
    lake_dir: str,
    rename: dict[str, str] | None = None,
    drop: list[str] | None = None,
) -> CompactResult:
    """Schema evolution beyond additive: rename and/or drop payload columns.

    Completes the evolution surface next to additive adds (``evolve_schema``)
    and opt-in numeric widening (``replay(widen_types=True)``); the reference
    fixes origin/target schemas per job (schema/CqlTable.java:408-428) and
    leans on CQL DDL for renames/drops — here the lake owns its schema, so
    ALTER is a lake maintenance commit.

    ``drop`` alone is METADATA-ONLY (O(1), no data IO): the declared schema
    loses the column, every reader aligns file -> declared schema so the
    column (and its LWW bookkeeping) is projected away on read, and the next
    full rewrite (compact_lake full sweep, alter_lake rename, reshard_lake)
    purges the bytes.  Until then the name is held in
    ``manifest.dropped_cols`` and re-adding it is refused — a re-add before
    the purge would resurrect old cell values through merge-on-read.

    ``rename`` REWRITES every partition copy-on-write (one embarrassingly
    parallel pass, no exchange — at scale this is one sequential IO pass
    like a compaction sweep): existing files physically carry the old column
    name plus its ``__wt``/``__seq``/``__ttlx`` bookkeeping, and a
    metadata-only rename would null-backfill the new name on read.  Cell
    writetimes/seqs and tombstones ride along unchanged, so LWW semantics
    against future events are byte-identical.  Key columns are immutable
    (they define routing); renames of counter columns keep counter
    semantics.  Time travel to pre-ALTER versions reads the old names via
    the snapshot-pinned schema.  After a rename, incoming events must use
    the new name — an event still carrying the old name is treated as a NEW
    column by additive evolution (matching Cassandra, where a renamed
    column's old name becomes free).
    """
    import time

    import pyarrow as pa

    t0 = time.perf_counter()
    rename = dict(rename or {})
    drop = list(dict.fromkeys(drop or []))
    if not rename and not drop:
        raise ValueError("alter_lake: nothing to do (no rename, no drop)")
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    names = list(manifest.schema.names)
    keys = set(manifest.key_cols)
    for c in [*rename, *drop]:
        if c not in names:
            raise ValueError(f"alter_lake: unknown column {c!r}")
        if c in keys:
            raise ValueError(
                f"alter_lake: {c!r} is a key column — key columns define"
                " partition routing and are immutable"
            )
    both = set(rename) & set(drop)
    if both:
        raise ValueError(f"alter_lake: cannot both rename and drop {sorted(both)}")
    targets = list(rename.values())
    if len(set(targets)) != len(targets):
        raise ValueError("alter_lake: duplicate rename targets")
    taken = (set(names) - set(rename) - set(drop)) | set(manifest.dropped_cols)
    for src, dst in rename.items():
        if not dst or not isinstance(dst, str):
            raise ValueError(f"alter_lake: invalid rename target {dst!r}")
        if dst == src:
            raise ValueError(f"alter_lake: rename {src!r} to itself")
        if dst in taken:
            raise ValueError(
                f"alter_lake: rename target {dst!r} collides with an existing"
                " or pending-purge column"
            )
        if dst.startswith("_") or "__" in dst:
            raise ValueError(
                f"alter_lake: rename target {dst!r} uses the reserved"
                " bookkeeping namespace (leading '_' or '__')"
            )
    new_fields = [
        (f.with_name(rename[f.name]) if f.name in rename else f)
        for f in manifest.schema
        if f.name not in drop
    ]
    new_schema = pa.schema(new_fields)
    run_id = "alter-" + uuid.uuid4().hex[:8]
    metrics = pd.DataFrame()
    if rename:
        bad = {
            k: v.status
            for k, v in manifest.partitions.items()
            if v.status not in ("PASS", "DIFF_CORRECTED")
        }
        if bad:
            raise RuntimeError(
                f"alter_lake rename requires a fully committed lake;"
                f" partitions not PASS: {bad}"
            )
        from cassandra_data_migrator_ray.schema import (
            SEQ_SUFFIX,
            TTLX_SUFFIX,
            WT_SUFFIX,
        )

        old_cfg = MergeConfig(
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
        new_cfg = MergeConfig(
            lake_dir=lake_dir,
            run_id=run_id,
            payload_cols=[n for n in new_schema.names if n not in keys],
            payload_schema_json=schema_to_json(new_schema),
            counter_cols=tuple(
                rename.get(c, c) for c in manifest.counter_cols if c not in drop
            ),
            key_cols=tuple(manifest.key_cols),
            ttl_enabled=manifest.ttl_enabled,
        )
        state_map: dict[str, str] = {}
        for src, dst in rename.items():
            state_map[src] = dst
            for suf in (WT_SUFFIX, SEQ_SUFFIX, TTLX_SUFFIX):
                state_map[src + suf] = dst + suf
        parts = sorted(k for k, v in manifest.partitions.items() if v.files)
        if parts:
            ds = ray.data.from_items(
                [{"part": int(k)} for k in parts], override_num_blocks=len(parts)
            )
            metrics = ds.map_batches(
                partial(_alter_part, old_cfg, new_cfg, state_map),
                batch_format="pandas",
                batch_size=None,
            ).to_pandas()
        # the rewrite aligned every partition to the new state schema, so any
        # previously pending-purge bytes (metadata-only drops) are gone too
        manifest.dropped_cols = []
    elif drop and any(v.files for v in manifest.partitions.values()):
        # only files already on disk can hold stale bytes; an empty lake's
        # metadata drop leaves nothing to purge and no name to quarantine
        manifest.dropped_cols = sorted(set(manifest.dropped_cols) | set(drop))
    manifest.schema = new_schema
    manifest.counter_cols = [
        rename.get(c, c) for c in manifest.counter_cols if c not in drop
    ]
    manifest.commit_run(
        run_id, extra={"type": "alter", "rename": rename, "drop": drop}
    )
    return CompactResult(run_id, metrics, time.perf_counter() - t0)
