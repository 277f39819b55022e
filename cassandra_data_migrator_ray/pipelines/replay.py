"""Replay (migrate) pipeline — the reference's Migrate job, Ray-Data-first.

    events (Dataset | parquet paths | Arrow table)
      → map_batches(Normalize, batch_format="pyarrow")   # align/filter/pre-fold
      → groupby(__part).map_groups(MergePartition)       # the one shuffle
      → driver folds the tiny metrics frame → manifest 2-phase commit

Reference lifecycle being re-expressed: job/Migrate.scala:24-61 +
job/CopyJobSession.java:76-148 (per-token-range scan → per-row transform →
async batched upsert), with the run ledger upgraded to an exactly-once manifest
(state/manifest.py).  Scale design: work crossing the shuffle is pre-folded per
key per batch; partition count should be ≥4× max workers; the metrics frame is
one row per partition (never row-level data on the driver).
"""

from __future__ import annotations

import os
import math
import warnings
import time
import uuid
from dataclasses import dataclass
from typing import Any

import pandas as pd
import pyarrow as pa

import ray.data

from cassandra_data_migrator_ray.schema import (
    TRANSCRIPTS_SCHEMA,
)
from functools import partial

from cassandra_data_migrator_ray.stages.merge import MergeConfig, merge_partition_group
from cassandra_data_migrator_ray.stages.normalize import PART_COL, Normalize
from cassandra_data_migrator_ray.state.manifest import Manifest, schema_to_json


@dataclass
class ReplayResult:
    run_id: str
    metrics: pd.DataFrame  # one row per touched partition
    manifest: Manifest
    events_merged_keys: int
    seconds: float


def _merge_staged_batch(
    cfg, staging_events: str, coarse_factor: int, batch: pd.DataFrame
) -> pd.DataFrame:
    from cassandra_data_migrator_ray.stages.staging import merge_staged_partition

    outs = [
        merge_staged_partition(cfg, staging_events, batch.iloc[[i]], coarse_factor)
        for i in range(len(batch))
    ]
    return pd.concat(outs, ignore_index=True)


class RunNotStartedError(ValueError):
    """An explicit rerun targeted a run_id with no trace in this lake —
    neither a committed ledger entry nor a staging directory.  Reference:
    job/RunNotStartedException.java, thrown by
    TargetUpsertRunDetailsStatement.java:133-148 when the prevRunId lookup
    finds no run_info row.  The reference JOB catches it, warns, and runs
    fresh (BasePartitionJob.scala:50-55); ``replay()`` mirrors that by
    default and raises this only under
    ``require_existing_run="abort"`` (engine extension)."""


def latest_incomplete_run(lake_dir: str, grace_s: float = 300.0) -> str | None:
    """The newest ``_staging`` run directory whose run_id never committed —
    the reference's auto-rerun target (TargetUpsertRunDetailsStatement
    .java:87-130 picks the latest run with terminal ENDED/DIFF status;
    "uncommitted" alone would conflate CRASHED with STILL-RUNNING).
    Liveness proxy: a live writer keeps creating receipts/slices, so a run
    whose newest write is younger than ``grace_s`` is presumed in flight
    and skipped — adopting it would attach a second writer to the same
    run_id (racing receipts + duplicate manifest.runs entries).  Returns
    None when every staging dir is committed, in flight, or absent."""
    import os
    import time as _time

    sdir = os.path.join(lake_dir, "_staging")
    if not os.path.isdir(sdir):
        return None
    m = Manifest.load(lake_dir)
    committed = {r["run_id"] for r in m.runs} if m is not None else set()
    now = _time.time()
    cands = []
    for fn in os.listdir(sdir):
        if fn.startswith("."):
            continue  # .trash-* sweep leftovers
        p = os.path.join(sdir, fn)
        if not os.path.isdir(p) or fn in committed:
            continue
        # newest write anywhere a writer touches: the run dir (receipts),
        # events/, and events' two-level part dirs (staged slices) — depth
        # ≤2 dir mtimes, never a full file walk
        newest = os.path.getmtime(p)
        ev = os.path.join(p, "events")
        if os.path.isdir(ev):
            newest = max(newest, os.path.getmtime(ev))
            for sub in os.listdir(ev):
                sp = os.path.join(ev, sub)
                try:
                    newest = max(newest, os.path.getmtime(sp))
                except OSError:
                    pass
        if now - newest >= grace_s:
            cands.append((newest, fn))
    return max(cands)[1] if cands else None


def _as_dataset(events: Any) -> ray.data.Dataset:
    if isinstance(events, ray.data.Dataset):
        return events
    if isinstance(events, pa.Table):
        return ray.data.from_arrow(events)
    if isinstance(events, pd.DataFrame):
        # enter through Arrow so downstream schema handling sees Arrow types
        return ray.data.from_arrow(pa.Table.from_pandas(events, preserve_index=False))
    # str path / list of paths
    return ray.data.read_parquet(events)


def replay(
    events: Any,
    lake_dir: str,
    *,
    payload_schema: pa.Schema | None = None,
    num_parts: int | str = 32,
    salt: int | str = 1,
    counter_cols: tuple[str, ...] = (),
    key_cols: tuple[str, ...] | None = None,
    compact: bool = False,
    grace_wt: int | None = None,
    run_id: str | None = None,
    transforms: list | None = None,
    normalize_concurrency: int | None = None,
    batch_size: int | None = 65536,
    commit: bool = True,
    prefold: bool = False,
    shuffle: str = "staging",
    rerun_multiplier: int = 1,
    ttl: bool | None = None,
    rate_limit_rows_per_s: float | None = None,
    emit_changes: bool = False,
    snapshot_retention: int | None = None,
    staged_compression: str | None = "auto",
    chaos_dir: str | None = None,
    widen_types: bool = False,
    analyze: bool = False,
    require_existing_run: bool | str = False,
) -> ReplayResult:
    """Replay a change stream into the lake (exactly-once, resumable).

    ``transforms`` is an optional list of batch transforms (see
    functions/transforms.py) applied to raw event batches before normalize —
    the reference's feature chain (rename, codecs, constants, explode,
    extract-json, filters).

    ``ttl``: ``None`` (default) auto-detects a ``ttl`` event column and
    treats it as per-cell expiry seconds (reference USING TTL,
    feature/WritetimeTTL.java:235-281); ``False`` forces a column literally
    named ``ttl`` to be stored as ordinary payload instead; ``True``
    requires the column.  The choice is sticky per lake (manifest).

    ``rate_limit_rows_per_s``: optional PER-ACTOR ingest throttle (the
    reference's per-executor RateLimiter, job/AbstractJobSession.java:58-62,
    default-off here) — total throughput ≈ rate × normalize concurrency;
    useful against shared-storage request caps.  Requires
    ``normalize_concurrency`` so the normalize stage runs as an ACTOR pool
    (a function-UDF stage has no per-executor identity to attach a bucket
    to — fresh worker processes would each grant a fresh burst).

    ``num_parts="auto"`` sizes a FRESH lake's partition count from the
    stream (one partition per ~250k events, floor 32, cap 4096 — data-
    dependent, never CPU-dependent); an existing lake's manifest count
    always wins (the route is sticky per lake).  ``salt="auto"`` estimates
    the hottest conversation's row share from a 200k-event stream prefix
    and picks the salt that caps its partition overload at ~2× average
    (1 when no key is hot; ≤32; manifest salt wins on an existing lake).

    ``widen_types=True`` allows LOSSLESS numeric widening of the lake's
    declared schema (int -> wider int of the same signedness, float32 ->
    float64) when the stream's types outgrow it — Iceberg-style promotion on
    top of the default additive-only evolution.  Existing partition files
    keep their narrow physical type; every reader casts file -> declared
    schema, and partition routing hashes key values (not bytes), so a
    widened key column routes identically.  Default False keeps the hard
    error: pandas infers int64 by default, and an accidental wide batch
    should not silently rewrite the lake schema.

    ``staged_compression``: ``"lz4"`` (DEFAULT via ``"auto"``) / ``"zstd"``
    / ``None`` compresses staged-slice IPC buffers — 2-4× fewer bytes
    through the staging exchange for cheap per-core codec CPU.  Exchange
    byte volume, not codec CPU, is the ceiling whenever staging storage or
    host memory bandwidth saturates (interleaved A/B won every pair,
    BENCH/BASELINE.md), so compression is on by default like Spark's
    shuffle; ``"auto"`` honours env ``CDM_STAGED_COMPRESSION``
    ("none"/"off" opts out), ``None`` forces uncompressed zero-copy-mmap
    slices.

    ``rerun_multiplier`` (reference rerunMultiplier, TrackRun.java:59-71):
    partitions still pending (no receipt — e.g. failed on the previous
    attempt of this run_id) are merged via M parallel sub-fold tasks over
    their staged file subsets plus a final partial-merge task, instead of one
    whole-partition task — finer retry/memory granularity, exact by
    fold/merge associativity.

    ``analyze=True`` refreshes the lake's scan-pruning column statistics
    right after the commit via incremental ANALYZE (re-reads only the
    partitions this run touched), so ``read_lake(prune=)`` keeps working
    across a stream of replays without a separate maintenance step.

    ``chaos_dir`` (fault injection, tests only; ``shuffle="staging"``):
    one stage-1 task and one stage-2 task each HARD-KILL their worker
    process (``os._exit``) at the worst possible moment — after staging
    slices / before writing a receipt — so Ray's real task retry drives
    the exactly-once machinery (content-addressed slice overwrite,
    per-partition receipts) instead of a simulated crash state.
    """
    t0 = time.perf_counter()
    raw_input = not isinstance(events, ray.data.Dataset)
    ds = _as_dataset(events)
    if raw_input:
        # parquet/arrow sources: metadata-only count (taken BEFORE the
        # transform chain is attached, so it stays metadata-only).  A
        # caller-supplied Dataset would EXECUTE its whole lineage here just
        # to tune a batch size — skip and use the default.
        try:
            est_rows = ds.count()
        except Exception:
            est_rows = 0
    else:
        est_rows = 0

    if num_parts == "auto":
        # data-dependent, never CPU-dependent (the job must be identical
        # across cluster sizes): one partition per ~250k events, floor 32 so
        # small streams still spread over a worker pool, cap 4096 to bound
        # per-partition fixed cost.  Only consulted for a FRESH lake — an
        # existing lake's manifest partition count always wins below.
        num_parts = int(min(4096, max(32, (est_rows or 8_000_000) // 250_000)))

    if salt == "auto":
        # hot-key salting without a manual knob: estimate the hottest first-
        # key-component's row share from a bounded PREFIX of the stream (the
        # generator's hot conversations are hot throughout; a prefix is a
        # cheap, documented-biased estimator) and size salt so that key's
        # partition overload factor share×num_parts drops to ~2.  Only
        # consulted for a FRESH lake — an existing lake's manifest salt
        # always wins (the route is sticky per lake).  Data-dependent,
        # never CPU-dependent, like num_parts="auto".
        existing = Manifest.load(lake_dir)
        if existing is not None:
            salt = existing.salt
        else:
            sample_ds = ds
            for t in transforms or []:
                sample_ds = sample_ds.map_batches(
                    t, batch_format="pyarrow", batch_size=batch_size
                )
            key0 = (list(key_cols) if key_cols else ["conv_id", "turn_idx"])[0]
            head = (
                sample_ds.limit(200_000).select_columns([key0]).to_pandas()
            )
            share = (
                float(head[key0].value_counts(normalize=True).iloc[0])
                if len(head)
                else 0.0
            )
            overload = share * num_parts  # hottest partition vs average
            salt = (
                1
                if overload <= 2.0
                else int(min(32, num_parts, math.ceil(overload / 2.0)))
            )

    # establish/evolve the lake schema from the incoming event columns
    manifest = Manifest.load_or_create(
        lake_dir,
        payload_schema or TRANSCRIPTS_SCHEMA,
        num_parts,
        salt=salt,
        counter_cols=list(counter_cols),
        key_cols=list(key_cols) if key_cols else None,
        snapshot_retention=snapshot_retention,
    )
    # apply the feature transform chain FIRST: schema evolution, ttl
    # detection and the required-column check must all see the
    # post-transform column set (a Rename'd/synthesized column would
    # otherwise be dropped by the manifest align and silently lost)
    for t in transforms or []:
        ds = ds.map_batches(t, batch_format="pyarrow", batch_size=batch_size)
    incoming = ds.schema()
    if incoming is not None and not all(
        isinstance(t, pa.DataType) for t in incoming.types
    ):
        # caller handed a Dataset backed by pandas blocks (from_pandas /
        # batch_format="pandas" upstream): its schema reports numpy/Python
        # types the manifest layer cannot evolve from.  Rebatch to Arrow so
        # every downstream stage sees Arrow types.
        ds = ds.map_batches(
            lambda t: t, batch_format="pyarrow", batch_size=batch_size
        )
        incoming = ds.schema()
    required = ["op", "writetime", "event_seq", *manifest.key_cols]
    missing = [c for c in required if c not in incoming.names]
    if missing:
        raise ValueError(
            f"event stream is missing required column(s) {missing} "
            f"{'after transforms ' if transforms else ''}; every change event "
            "needs op/writetime/event_seq plus the lake key columns "
            f"{list(manifest.key_cols)}"
        )
    if ttl is True and "ttl" not in incoming.names:
        raise ValueError("ttl=True but the event stream has no 'ttl' column")
    ttl_mode = (
        manifest.ttl_enabled
        if manifest.version > 0
        else (ttl if ttl is not None else "ttl" in incoming.names)
    )
    reserved = ("op", "writetime", "event_seq") + (("ttl",) if ttl_mode else ())
    incoming_payload = pa.schema(
        [
            pa.field(n, t)
            for n, t in zip(incoming.names, incoming.types)
            if n not in reserved
        ]
    )
    if manifest.version == 0 and ttl_mode:
        # per-cell TTL bookkeeping for the lake (reference USING TTL
        # persistence, feature/WritetimeTTL.java:235-281); ttl=False keeps a
        # column literally named 'ttl' as ordinary payload instead
        manifest.ttl_enabled = True
    if payload_schema is None:
        # widen_types opts into lossless numeric promotion of the DECLARED
        # schema (int -> wider int, float32 -> float64) when the stream's
        # types outgrow it; default keeps the hard error so an accidental
        # pandas int64 never silently rewrites the lake schema.
        manifest.evolve_schema(incoming_payload, widen=widen_types)
    num_parts = manifest.num_parts
    salt = manifest.salt
    counter_cols = tuple(manifest.counter_cols)
    key_cols = tuple(manifest.key_cols)
    ttl_enabled = manifest.ttl_enabled
    if run_id == "auto":
        # reference auto-rerun detection (TargetUpsertRunDetailsStatement
        # .java:87-130: prevRunId=0 → latest rerunnable run): resume the
        # newest UNCOMMITTED staging run without the caller having to
        # recover its run_id from _staging/ by hand.  Requires the same
        # input stream as the crashed attempt (receipts skip completed
        # partitions; re-staged slices are content-addressed, so identical
        # input re-stages byte-identically).  No incomplete run → fresh id.
        import os as _os

        run_id = latest_incomplete_run(
            lake_dir,
            grace_s=float(_os.environ.get("CDM_RAY_RESUME_GRACE_S", "300")),
        )
    elif run_id and require_existing_run:
        # reference prevRunId semantics: an explicit rerun id should name a
        # run this lake has seen.  The statement layer raises
        # (TargetUpsertRunDetailsStatement.java:133-148 throws
        # RunNotStartedException when the prevRunId lookup finds no run_info
        # row); the JOB layer catches it, warns, and runs fresh
        # (BasePartitionJob.scala:50-55) — mirrored here: warn + fresh run
        # under a NEW id by default, hard abort only with
        # require_existing_run="abort" (engine extension for operators who
        # prefer a typo'd id to fail loudly).
        committed = any(r.get("run_id") == run_id for r in manifest.runs)
        staged = os.path.isdir(os.path.join(lake_dir, "_staging", str(run_id)))
        if not committed and not staged:
            err = RunNotStartedError(
                f"run {run_id!r} was never started in lake {lake_dir!r} "
                "(no ledger entry, no staging dir)"
            )
            if require_existing_run == "abort":
                raise err
            warnings.warn(
                f"{err} — starting a fresh run instead (reference "
                "BasePartitionJob.scala:50-55 behavior; pass "
                'require_existing_run="abort" to fail instead)',
                stacklevel=2,
            )
            run_id = None
    run_id = run_id or uuid.uuid4().hex[:12]

    norm = Normalize(
        manifest.schema,
        num_parts,
        salt=salt,
        watermarks=manifest.watermarks(),
        counter_cols=counter_cols,
        prefold=prefold,
        key_cols=key_cols,
        ttl_enabled=ttl_enabled,
        rate_limit_rows_per_s=rate_limit_rows_per_s,
    )
    if rate_limit_rows_per_s and not normalize_concurrency:
        raise ValueError(
            "rate_limit_rows_per_s requires normalize_concurrency: the "
            "limiter is per-executor (reference semantics), which needs the "
            "normalize stage to be an actor pool of known size"
        )
    kwargs: dict[str, Any] = {"batch_format": "pyarrow", "batch_size": batch_size}
    if normalize_concurrency:
        kwargs["concurrency"] = normalize_concurrency
    folded = ds.map_batches(norm, **kwargs)

    cfg = MergeConfig(
        lake_dir=lake_dir,
        run_id=run_id,
        payload_cols=manifest.payload_cols(),
        payload_schema_json=schema_to_json(manifest.schema),
        counter_cols=counter_cols,
        key_cols=key_cols,
        ttl_enabled=ttl_enabled,
        compact=compact,
        grace_wt=grace_wt,
        emit_changes=emit_changes,
        prior_files={k: v.files for k, v in manifest.partitions.items()},
        prior_watermarks=manifest.watermarks(),
        chaos_dir=chaos_dir,
    )
    if shuffle == "staging":
        # lakehouse exchange: map-only partitioned staging write, then one
        # independent compaction task per touched partition (stages/staging.py)
        from cassandra_data_migrator_ray.stages.staging import (
            StageWriter,
            merge_staged_partition,
        )

        staging_events = os.path.join(lake_dir, "_staging", run_id, "events")
        # two-level exchange above ~256 dirs: staged-file count (and stage-1
        # dir-create contention, measured at >=768 parts) is blocks x dirs, so
        # bound dirs at ~256 and let stage 2 split each coarse slab into its
        # fine partitions (reads every staged byte exactly once either way)
        coarse_factor = max(1, (num_parts + 255) // 256)
        # adaptive stage-1 batches: staged-file count ≈ (rows/batch) × parts and
        # per-file overhead dominates, so scale the batch with the input to
        # bound stage tasks at ~128 regardless of stream size (data-dependent,
        # NOT cpu-dependent — the job stays identical across cluster sizes)
        stage_batch = int(max(1 << 18, min(1 << 22, est_rows // 128 or 1 << 18)))
        # stage-2 merge tasks are memory-bandwidth-bound (lz4 decode + Arrow
        # fold); on hosts where aggregate copy bandwidth FALLS with process
        # count (the measured single-VM 8→32 ceiling, BENCH/BASELINE.md) a
        # task size of 2 halves concurrent merge processes without changing
        # the job shape across cluster sizes.  Env-tunable, default 1.
        merge_cpus = float(os.environ.get("CDM_MERGE_NUM_CPUS", "1"))
        # dictionary-encode string payload columns through the staged
        # slices (stage-2 take/fold then moves int32 indices, not string
        # bytes; decode happens once on the winner-sized fold output).
        # DEFAULT OFF by measurement: interleaved 60M-event A/Bs at 32
        # workers (BENCH/BASELINE.md round 5) showed "all" COSTS ~8%
        # stage-2 fold CPU (the dominant `text` column is mostly unique,
        # so indices + embedded dictionary ≈ the original bytes plus
        # encode/unify), and even the cardinality-probed "auto" (role/
        # tool-style enums only, distinct ratio ≤ 25% over a 50k prefix)
        # is a wall-clock wash-to-loss here — lz4 already absorbs the
        # repetitive bytes.  The knob stays for payload mixes dominated by
        # low-cardinality strings.  CDM_STAGED_DICT: "off" (default),
        # "auto" (the prefix probe), "all"/"1" (every string payload col).
        dict_env = os.environ.get("CDM_STAGED_DICT", "off")
        str_cols = [
            f.name
            for f in manifest.schema
            if f.name not in key_cols
            and (pa.types.is_string(f.type) or pa.types.is_large_string(f.type))
        ]
        if dict_env in ("0", "off", "") or not str_cols:
            dict_cols = ()
        elif dict_env in ("1", "all"):
            dict_cols = tuple(str_cols)
        else:
            # ds already carries the transform chain (folded in above,
            # before the manifest align) — probing it directly sees the
            # post-transform columns; re-applying transforms here would
            # double-transform the sample (review finding)
            probe_cols = [c for c in str_cols if c in ds.schema().names]
            head = (
                ds.limit(50_000).select_columns(probe_cols).to_pandas()
                if probe_cols
                else None
            )
            dict_cols = (
                tuple(
                    c
                    for c in probe_cols
                    if head[c].nunique(dropna=True) <= 0.25 * len(head)
                )
                if head is not None and len(head)
                else ()
            )
        t_s1 = time.perf_counter()
        stats = folded.map_batches(
            StageWriter(
                staging_events,
                coarse_factor,
                staged_compression,
                chaos_dir=chaos_dir,
                dict_cols=dict_cols,
            ),
            batch_format="pyarrow",
            batch_size=stage_batch,
        ).to_pandas()  # one row per (batch, dir key) — tiny; triggers stage 1
        t_s1 = time.perf_counter() - t_s1
        parts = sorted(int(p) for p in stats["part"].unique()) if len(stats) else []
        t_s2 = time.perf_counter()
        # automatic hot-partition sub-fold: stage 2 folds one dir key's
        # staged slice in a single task, and auto-salting only caps EXPECTED
        # skew — a pathological partition (salt miss, post-hoc data change)
        # could still outgrow one task's memory.  When a dir key's staged
        # bytes exceed CDM_SUBFOLD_BYTES (default 2 GiB; 0 disables), that
        # key is routed through the rerun-multiplier sub-slice machinery
        # (fold event_seq%m row slices → merge partials) with m sized from
        # the overage — data-dependent, never CPU-dependent, so the job is
        # identical across cluster sizes.  Driver cost: one listdir per dir
        # key (≤ coarse dirs, bounded at ~256).
        auto_m = 0
        auto_over: set[int] = set()
        if parts and rerun_multiplier == 1:
            subfold_bytes = int(
                os.environ.get("CDM_SUBFOLD_BYTES", str(2 << 30))
            )
            if subfold_bytes > 0:
                worst = 0
                for k in parts:
                    pdir = os.path.join(staging_events, f"part={k:05d}")
                    try:
                        sz = sum(
                            e.stat().st_size
                            for e in os.scandir(pdir)
                            if e.name.startswith("blk-")
                        )
                    except OSError:
                        continue
                    if sz > subfold_bytes:
                        auto_over.add(k)
                        worst = max(worst, sz)
                if auto_over:
                    auto_m = min(16, -(-worst // subfold_bytes))
        if parts and (rerun_multiplier > 1 or auto_m > 1):
            from cassandra_data_migrator_ray.stages.staging import (
                fold_staged_subslice,
                merge_partials_partition,
            )

            done = set(manifest.staged_receipts(run_id))
            # dir keys whose every fine partition already has a receipt skip
            # subdivision (handled by the normal path's SKIPPED_RESUME)
            pend = [
                k
                for k in parts
                if any(
                    (k * coarse_factor + i) not in done
                    for i in range(coarse_factor)
                )
            ] if coarse_factor > 1 else [k for k in parts if k not in done]
            if rerun_multiplier == 1:
                # auto mode subdivides ONLY the oversized dir keys; the rest
                # take the normal one-task-per-key fold below
                pend = [k for k in pend if k in auto_over]
            skip = [k for k in parts if k not in pend]
            m = int(rerun_multiplier) if rerun_multiplier > 1 else int(auto_m)
            frames = []
            if pend:
                sub_ds = ray.data.from_items(
                    [{"part": int(k), "sub": i} for k in pend for i in range(m)],
                    override_num_blocks=len(pend) * m,
                )
                sub_ds.map_batches(
                    partial(
                        fold_staged_subslice, cfg, staging_events, coarse_factor, m
                    ),
                    batch_format="pandas",
                    batch_size=None,
                    num_cpus=merge_cpus,
                ).materialize()
                fin_ds = ray.data.from_items(
                    [{"part": int(k)} for k in pend], override_num_blocks=len(pend)
                )
                frames.append(
                    fin_ds.map_batches(
                        partial(
                            merge_partials_partition,
                            cfg,
                            staging_events,
                            coarse_factor,
                            m=m,
                        ),
                        batch_format="pandas",
                        batch_size=None,
                        num_cpus=merge_cpus,
                    ).to_pandas()
                )
            if skip:
                skip_ds = ray.data.from_items(
                    [{"part": int(k)} for k in skip], override_num_blocks=len(skip)
                )
                frames.append(
                    skip_ds.map_batches(
                        partial(_merge_staged_batch, cfg, staging_events, coarse_factor),
                        batch_format="pandas",
                        batch_size=None,
                        num_cpus=merge_cpus,
                    ).to_pandas()
                )
            metrics = (
                pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
            )
        elif parts:
            parts_ds = ray.data.from_items(
                [{"part": int(k)} for k in parts], override_num_blocks=len(parts)
            )
            metrics = parts_ds.map_batches(
                partial(_merge_staged_batch, cfg, staging_events, coarse_factor),
                batch_format="pandas",
                batch_size=None,
                num_cpus=merge_cpus,
            ).to_pandas()
        else:
            metrics = pd.DataFrame()
        t_s2 = time.perf_counter() - t_s2
        import os as _os

        if _os.environ.get("CDM_RAY_DEBUG_TIMING"):
            print(
                f"[replay] stage1={t_s1:.1f}s stage2={t_s2:.1f}s"
                f" subfold_m={auto_m} subfold_parts={len(auto_over)}",
                flush=True,
            )
    else:
        metrics_ds = folded.groupby(PART_COL).map_groups(
            partial(merge_partition_group, cfg), batch_format="pandas"
        )
        metrics = metrics_ds.to_pandas()  # one row per partition — tiny
    if metrics.empty:
        from cassandra_data_migrator_ray.stages.merge import METRICS_COLUMNS

        metrics = pd.DataFrame(columns=METRICS_COLUMNS)

    if commit:
        manifest.commit_run(
            run_id,
            extra={
                "type": "replay",
                "keys_in": int(metrics["keys_in"].sum()),
                # ranged feed readers verify completeness against these:
                # emit off → the range is unreconstructable; fewer feed files
                # on disk than recorded → the feed was pruned
                "emit_changes": bool(emit_changes),
            },
        )
        if analyze:
            # keep scan-pruning stats continuously fresh: incremental
            # ANALYZE re-reads only the partitions this run touched
            # (cost ∝ churn), so read_lake(prune=) never sees a stale stamp
            from cassandra_data_migrator_ray.pipelines.maintenance import (
                analyze_lake,
            )

            analyze_lake(lake_dir)
    return ReplayResult(
        run_id=run_id,
        metrics=metrics,
        manifest=manifest,
        events_merged_keys=int(metrics["keys_in"].sum()),
        seconds=time.perf_counter() - t0,
    )
