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
- staged slice files are content-addressed (fingerprint of the slice's
  event_seq set), so a retried stage-1 task overwrites its first attempt's
  files byte-for-byte instead of adding a second copy — exactly-once staging
  even for additive counter columns; the LWW fold additionally dedups by
  event_seq inside each key group, so duplicate *deliveries in the input
  stream* are also applied once;
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

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cassandra_data_migrator_ray.stages.normalize import PART_COL


def _chaos_crash_once(chaos_dir: str, stage: str) -> None:
    """Fault-injection hook (tests only): the FIRST task to claim the
    ``{stage}-crashed`` marker kills its worker process outright —
    ``os._exit``, no Python cleanup, exactly what a preempted node looks
    like to Ray — so the retry machinery (Ray task retry → content-
    addressed slice overwrite → receipt skip) is exercised for real, not
    simulated.  O_EXCL makes the claim atomic across concurrent workers."""
    marker = os.path.join(chaos_dir, f"{stage}-crashed")
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return
    os.close(fd)
    os._exit(1)


def _hash64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit mix of int64 values (splitmix64 finalizer)."""
    x = v.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


class StageWriter:
    """Map-only stage 1: split each normalized block by partition and append
    staged parquet slices.  Emits one bookkeeping row per (block, dir key).

    ``coarse_factor > 1`` enables the two-level exchange: slices are grouped
    into ``fine // coarse_factor`` directories (bounding the staged-file count
    at blocks × coarse dirs instead of blocks × partitions — the ≥768-part
    dir/file blowup), and the fine partition id rides along INSIDE the slice
    (PART_COL kept) for stage 2 to split on.
    """

    def __init__(
        self,
        staging_dir: str,
        coarse_factor: int = 1,
        compression: str | None = "auto",
        bytes_fingerprint: bool = False,
        chaos_dir: str | None = None,
        dict_cols: tuple = (),
    ):
        # dictionary-encode these (string payload) columns PER SLICE before
        # the IPC write: stage 2's split/`take`/winner gathers then move
        # int32 indices instead of string bytes (the fold's hot path is
        # take-shaped), and the fold decodes once on the winner-sized
        # output.  Per-slice (not per-batch) encoding keeps each slice's
        # embedded dictionary to its OWN values — encoding the whole batch
        # once would embed the full batch dictionary in every one of up to
        # 256 slice files (huge write amplification).
        self.dict_cols = tuple(dict_cols)
        self.staging_dir = staging_dir
        self.coarse_factor = max(1, int(coarse_factor))
        # tests only: crash one stage-1 worker AFTER it staged its slices
        # (the retry must overwrite them byte-for-byte, never double-stage)
        self.chaos_dir = chaos_dir
        # force the IPC-bytes fingerprint even when a seq column is present:
        # required when the staged rows are STATE rows (reshard) — their
        # __max_seq values are per-key watermarks, NOT globally unique, so
        # two different slices routed to one partition could share a seq
        # multiset and silently overwrite each other under the seq-set name
        self.bytes_fingerprint = bool(bytes_fingerprint)
        # IPC buffer compression ("lz4" / "zstd") for staged slices: trades
        # cheap per-core codec CPU for 2-4× fewer bytes through the exchange,
        # at the cost of zero-copy mmap reads in stage 2.  DEFAULT IS lz4
        # (the Spark-shuffle default for the same reason): an interleaved
        # 61.8M-event A/B won every pair — 168.3→31.1 s, 55.9→41.0 s,
        # 59.8→26.9 s at 32 cpus — because exchange byte volume, not codec
        # CPU, is the ceiling on bandwidth-bound hosts (BENCH/BASELINE.md).
        # "auto" resolves env CDM_STAGED_COMPRESSION ("none"/"off"/"" opts
        # out) then lz4; pass None explicitly for uncompressed slices.  Read
        # side is codec-agnostic (Arrow IPC self-describes per buffer).
        if compression == "auto":
            env = os.environ.get("CDM_STAGED_COMPRESSION")
            compression = "lz4" if env is None else env
            if compression in ("", "none", "off"):
                compression = None
        if compression not in (None, "lz4", "zstd"):
            raise ValueError(f"unsupported staged compression: {compression!r}")
        self.compression = compression

    def _write_opts(self) -> "pa.ipc.IpcWriteOptions | None":
        return (
            pa.ipc.IpcWriteOptions(compression=self.compression)
            if self.compression
            else None
        )

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        # one Ray task == one CPU: stop Arrow from spinning up a full-machine
        # thread pool per worker (32 workers x 32 threads thrashes the node)
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        if batch.num_rows == 0:
            return pd.DataFrame({"part": pd.Series([], dtype="int32"),
                                 "rows": pd.Series([], dtype="int64")})
        fine = batch.column(PART_COL).to_numpy(zero_copy_only=False)
        part = fine // self.coarse_factor if self.coarse_factor > 1 else fine
        order = np.argsort(part, kind="stable")
        sorted_tbl = batch.take(pa.array(order))
        sp = part[order]
        bounds = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
        bounds = np.r_[bounds, len(sp)]
        # content-addressed slice names: a retried stage-1 task re-produces the
        # exact same slices, so the retry OVERWRITES (os.replace) rather than
        # adding a second staged copy — without this, counter deltas staged
        # twice would fold twice.  For raw events the fingerprint is over the
        # slice's event_seq set (globally unique per event, so exact):
        # count+min+max+sum+xor.  Frames without a seq column (prefolded
        # partials, validate side frames) fall back to hashing the serialized
        # IPC bytes — Arrow IPC is deterministic for identical tables.
        from cassandra_data_migrator_ray.schema import MAX_SEQ

        seq_name = next(
            (c for c in ("event_seq", MAX_SEQ) if c in batch.column_names), None
        )
        if self.bytes_fingerprint:
            seq_name = None
        seq_all = (
            batch.column(seq_name).to_numpy(zero_copy_only=False).astype(np.int64)[order]
            if seq_name is not None
            else None
        )
        rows = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            k = int(sp[lo])
            pdir = os.path.join(self.staging_dir, f"part={k:05d}")
            os.makedirs(pdir, exist_ok=True)
            slice_tbl = sorted_tbl.slice(lo, hi - lo)
            if self.coarse_factor == 1:
                slice_tbl = slice_tbl.drop_columns([PART_COL])
            for c in self.dict_cols:
                ci = slice_tbl.schema.get_field_index(c)
                if ci >= 0 and not pa.types.is_dictionary(
                    slice_tbl.schema.field(ci).type
                ):
                    import pyarrow.compute as pc

                    enc = pc.dictionary_encode(slice_tbl.column(ci))
                    slice_tbl = slice_tbl.set_column(
                        ci, pa.field(c, enc.type), enc
                    )
            # Arrow IPC, not parquet: staged slices are transient and tiny —
            # IPC has near-zero open/parse cost and mmaps zero-copy on tmpfs
            tmp = os.path.join(pdir, f".tmp-{os.getpid()}-{i}.arrow")
            if seq_all is not None:
                # content fingerprint of the seq SET: order-independent XOR +
                # ADD of per-element 64-bit hashes plus the count — two
                # independent reductions of hashed values, so distinct sets
                # collide with ~2^-128 probability (a plain min/max/sum/xor of
                # RAW seqs is NOT injective: {0,1,6,7} vs {0,2,5,7} collide)
                sl = seq_all[lo:hi]
                he = _hash64(sl)
                fp = hashlib.blake2b(
                    np.array(
                        [
                            hi - lo,
                            np.bitwise_xor.reduce(he),
                            np.add.reduce(he),
                        ],
                        dtype=np.uint64,
                    ).tobytes(),
                    digest_size=8,
                ).hexdigest()
                with pa.OSFile(tmp, "wb") as sink:
                    with pa.ipc.new_file(
                        sink, slice_tbl.schema, options=self._write_opts()
                    ) as writer:
                        writer.write_table(slice_tbl)
            else:
                h = hashlib.blake2b(digest_size=8)
                if self.compression:
                    # fingerprint the UNCOMPRESSED stream: the content
                    # address must not depend on the codec a given attempt
                    # resolved (env/build can differ between a task and its
                    # retry) — a codec-dependent name would let the retry
                    # write a SECOND slice instead of overwriting, and the
                    # fold would double those rows.  Costs one extra
                    # serialization, only on the bytes-fingerprint path.
                    buf = pa.BufferOutputStream()
                    with pa.ipc.new_file(buf, slice_tbl.schema) as w0:
                        w0.write_table(slice_tbl)
                    h.update(buf.getvalue())
                    with pa.OSFile(tmp, "wb") as sink:
                        with pa.ipc.new_file(
                            sink, slice_tbl.schema, options=self._write_opts()
                        ) as writer:
                            writer.write_table(slice_tbl)
                else:
                    with pa.OSFile(tmp, "wb") as sink:
                        with pa.ipc.new_file(
                            sink, slice_tbl.schema, options=self._write_opts()
                        ) as writer:
                            writer.write_table(slice_tbl)
                    with open(tmp, "rb") as f:
                        while chunk := f.read(1 << 20):
                            h.update(chunk)
                fp = h.hexdigest()
            os.replace(tmp, os.path.join(pdir, f"blk-{fp}.arrow"))
            rows.append({"part": np.int32(k), "rows": np.int64(hi - lo)})
        if self.chaos_dir:
            # die AFTER staging the batch but BEFORE reporting it: the worst
            # spot — Ray re-runs the task, which must re-produce the exact
            # same content-addressed slices (overwrite, not append)
            _chaos_crash_once(self.chaos_dir, "stage1")
        return pd.DataFrame(rows)


def merge_staged_partition(
    cfg, staging_dir: str, group: pd.DataFrame, coarse_factor: int = 1
) -> pd.DataFrame:
    """Stage 2 body: fold staged events + prior lake state for the dir keys in
    ``group``.  One-level (coarse_factor=1): dir key == fine partition.
    Two-level: each dir holds several fine partitions, split on PART_COL here
    (reads every staged byte exactly once either way).

    ``cfg`` is a stages.merge.MergeConfig; reuses its receipt/commit protocol.
    Fresh partitions (no prior state) run the Arrow-native fold end to end —
    no Python-object strings ever materialize; incremental merges fall back to
    the pandas merge path.
    """
    import time as _time

    from cassandra_data_migrator_ray.stages.merge import METRICS_COLUMNS

    _t0 = _time.perf_counter()
    part = int(group["part"].iloc[0])
    pdir = os.path.join(staging_dir, f"part={part:05d}")
    files = (
        # committed slices only — a crashed writer's orphaned `.tmp-*` file
        # (possibly truncated) must be neither read nor double-counted
        sorted(
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.startswith("blk-") and f.endswith(".arrow")
        )
        if os.path.isdir(pdir)
        else []
    )
    if not files:
        return pd.DataFrame(columns=METRICS_COLUMNS)
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)

    def _read_ipc(path: str) -> pa.Table:
        with pa.memory_map(path) as src:  # zero-copy on tmpfs/page cache
            return pa.ipc.open_file(src).read_all()

    events_tbl = pa.concat_tables([_read_ipc(f) for f in files])
    _t_read = _time.perf_counter() - _t0

    if coarse_factor > 1:
        # two-level: split the coarse slab into its fine partitions
        fine = events_tbl.column(PART_COL).to_numpy(zero_copy_only=False)
        order = np.argsort(fine, kind="stable")
        sorted_tbl = events_tbl.take(pa.array(order))
        sf = fine[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, sf[1:] != sf[:-1]]), len(sf)]
        outs = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            sub = sorted_tbl.slice(lo, hi - lo).drop_columns([PART_COL])
            outs.append(_merge_fine(cfg, int(sf[lo]), sub, _t_read, _t0))
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(columns=METRICS_COLUMNS)
        )
    return _merge_fine(cfg, part, events_tbl, _t_read, _t0)


def _merge_fine(
    cfg, part: int, events_tbl: pa.Table, _t_read: float, _t0: float
) -> pd.DataFrame:
    """Fold ONE fine partition's staged events + prior lake state and write
    its partition file + receipt (the exactly-once unit).

    Arrow end-to-end for BOTH the fresh-load fold and the incremental
    (steady-state CDC) merge: prior state is read as Arrow, merged with the
    increment's fold by ``merge_state_tables_arrow``, and the change feed is
    classified by ``_compute_changes_arrow`` — payload bytes move only
    through nullable ``take`` kernels, never through Python-object frames.
    (Round-2 scaling instrumentation blamed the pandas incremental merge's
    DRAM traffic for the 8→32-worker efficiency cap.)"""
    import time as _time

    import pyarrow.compute as pc

    from cassandra_data_migrator_ray.functions.lww import (
        fold_events_arrow,
        merge_state_tables_arrow,
    )
    from cassandra_data_migrator_ray.schema import (
        DEL_WT,
        DELETED,
        MAX_SEQ,
        align_to_schema,
    )
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json
    from cassandra_data_migrator_ray.stages.merge import (
        _arrow_state_schema,
        _compute_changes_arrow,
        _write_cdf,
        read_partition_state_arrow,
    )

    receipt_path = os.path.join(
        cfg.lake_dir, "_staging", cfg.run_id, f"part-{part:05d}.json"
    )
    if os.path.exists(receipt_path):
        import json

        with open(receipt_path) as f:
            r = json.load(f)
        return pd.DataFrame(
            [
                {
                    "part": part,
                    "rows": r["rows"],
                    "tombstones": r.get("tombstones", 0),
                    "keys_in": 0,
                    "watermark": r["watermark"],
                    "status": "SKIPPED_RESUME",
                    "file": r["files"][0] if r["files"] else "",
                    "seconds": 0.0,
                }
            ]
        )

    if cfg.chaos_dir:
        # die before any receipt exists for this partition: the retry must
        # re-read the staged slices and fold from scratch; partitions this
        # worker already finished resume via their receipts (SKIPPED_RESUME)
        _chaos_crash_once(cfg.chaos_dir, "stage2")
    out_schema = _arrow_state_schema(cfg)
    _t1 = _time.perf_counter()
    if "op" in events_tbl.column_names:
        state_new = fold_events_arrow(
            events_tbl,
            list(cfg.key_cols),
            cfg.payload_cols,
            cfg.counter_cols,
            ttl=cfg.ttl_enabled,
        )
    else:
        # pre-folded state slices (prefold staging / partials): collapse
        # duplicate keys across slices with the same merge kernel
        state_new = merge_state_tables_arrow(
            [align_to_schema(events_tbl, out_schema)],
            list(cfg.key_cols),
            cfg.payload_cols,
            cfg.counter_cols,
            ttl=cfg.ttl_enabled,
        )
    state_new = align_to_schema(state_new, out_schema)
    keys_in = state_new.num_rows
    old = read_partition_state_arrow(cfg, part)
    if old is not None and old.num_rows:
        state = merge_state_tables_arrow(
            [state_new, old],
            list(cfg.key_cols),
            cfg.payload_cols,
            cfg.counter_cols,
            ttl=cfg.ttl_enabled,
        )
        state = align_to_schema(state, out_schema)
    else:
        old = None
        state = state_new
    _t_fold = _time.perf_counter() - _t1
    # watermark BEFORE tombstone compaction: a compacted-away tombstone may
    # hold the partition's max merged event_seq — recording the post-compact
    # max would understate it and re-admit redelivered events on resume.
    # Computed from the INCREMENT's fold (the prior watermark already covers
    # everything the old state merged).
    watermark = max(
        int(cfg.prior_watermarks.get(part, -1)),
        int(pc.max(state_new[MAX_SEQ]).as_py()) if state_new.num_rows else -1,
    )
    cdf_rel = None
    if cfg.emit_changes:
        changes = _compute_changes_arrow(cfg, old, state, state_new)
        cdf_rel = _write_cdf(cfg, part, changes)
    if cfg.compact:
        state = state.filter(pc.invert(state[DELETED]))
    elif cfg.grace_wt is not None:
        keep = pc.or_(
            pc.invert(state[DELETED]), pc.greater_equal(state[DEL_WT], cfg.grace_wt)
        )
        state = state.filter(keep)
    order = pc.sort_indices(
        state, sort_keys=[(k, "ascending") for k in cfg.key_cols]
    )
    state = state.take(order)
    rel = os.path.join("data", f"part-{part:05d}-{cfg.run_id}.parquet")
    path = os.path.join(cfg.lake_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = state.select(out_schema.names).cast(out_schema)
    from cassandra_data_migrator_ray.schema import write_parquet_atomic

    write_parquet_atomic(state, path)

    tombstones = int(pc.sum(pc.cast(state[DELETED], pa.int64())).as_py() or 0)
    rows = int(state.num_rows - tombstones)
    receipt = {
        "part": part,
        "run_id": cfg.run_id,
        "files": [rel],
        "watermark": watermark,
        "rows": rows,
        "tombstones": tombstones,
        "status": "PASS",
        "metrics": {"keys_in": int(keys_in)},
        **({"cdf_file": cdf_rel} if cdf_rel else {}),
    }
    atomic_write_json(receipt_path, receipt)
    return pd.DataFrame(
        [
            {
                "part": part,
                "rows": rows,
                "tombstones": tombstones,
                "keys_in": int(keys_in),
                "watermark": watermark,
                "status": "PASS",
                "file": rel,
                "seconds": round(_time.perf_counter() - _t0, 3),
                "t_read": round(_t_read, 3),
                "t_fold": round(_t_fold, 3),
            }
        ]
    )


# ---- failed-partition subdivision on rerun (reference rerunMultiplier, ------
# feature/TrackRun.java:59-71).  A resumed run normally re-merges a failed
# partition whole; with rerun_multiplier=M its staged file list is split into
# M subsets, each folded to a partial state by its own Ray task (finer retry /
# memory granularity — fold/merge associativity makes this exact), and a final
# per-partition task merges the partials with prior lake state and writes.

_PARTIALS_DIR = "_partials"


def fold_staged_subslice(
    cfg, staging_dir: str, coarse_factor: int, m: int, group: pd.DataFrame
) -> pd.DataFrame:
    """Phase A task: fold one (dir key, sub) slice of staged files into a
    partial state file (content-deterministic name → retry overwrites)."""
    from cassandra_data_migrator_ray.functions.lww import fold_events_arrow

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out_rows = []
    for _, r in group.iterrows():
        part, sub = int(r["part"]), int(r["sub"])
        pdir = os.path.join(staging_dir, f"part={part:05d}")
        files = (
            sorted(
                os.path.join(pdir, f)
                for f in os.listdir(pdir)
                if f.startswith("blk-") and f.endswith(".arrow")
            )
            if os.path.isdir(pdir)
            else []
        )
        if not files:
            continue

        def _read_ipc(path: str) -> pa.Table:
            with pa.memory_map(path) as src:
                return pa.ipc.open_file(src).read_all()

        tbl = pa.concat_tables([_read_ipc(f) for f in files])
        if m > 1:
            # Row-level sub assignment by event_seq, NOT a positional file
            # split: a crashed stage-1 attempt can leave duplicate copies of
            # the same events in slices with DIFFERENT block boundaries, and
            # a file-positional split could then send two copies of one event
            # to different subs — each sub's fold would count its counter
            # delta once, double-counting after merge.  A pure function of
            # the event itself guarantees duplicates co-locate in one fold,
            # where the event_seq dup mask removes them (exactly-once).
            # Every sub memory-maps all slices but folds only its 1/m rows.
            seq = tbl.column("event_seq").to_numpy(zero_copy_only=False)
            tbl = tbl.filter(pa.array((seq % m) == sub))
        if tbl.num_rows == 0:
            continue
        drop = [PART_COL] if coarse_factor > 1 and PART_COL in tbl.column_names else []
        fines = (
            [(part, tbl.drop_columns(drop))]
            if coarse_factor == 1
            else _split_by_part(tbl)
        )
        for fine, sub_tbl in fines:
            state = fold_events_arrow(
                sub_tbl,
                list(cfg.key_cols),
                cfg.payload_cols,
                cfg.counter_cols,
                ttl=cfg.ttl_enabled,
            )
            odir = os.path.join(staging_dir, f"part={part:05d}", _PARTIALS_DIR)
            os.makedirs(odir, exist_ok=True)
            path = os.path.join(odir, f"partial-{fine:05d}-{sub:03d}-{m:03d}.arrow")
            tmp = path + f".tmp{os.getpid()}"
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, state.schema) as w:
                    w.write_table(state)
            os.replace(tmp, path)
            out_rows.append({"part": np.int32(part), "rows": np.int64(state.num_rows)})
    return pd.DataFrame(
        out_rows or [], columns=["part", "rows"]
    ).astype({"part": np.int32, "rows": np.int64}, errors="ignore")


def _split_by_part(tbl: pa.Table) -> list[tuple[int, pa.Table]]:
    fine = tbl.column(PART_COL).to_numpy(zero_copy_only=False)
    order = np.argsort(fine, kind="stable")
    st = tbl.take(pa.array(order))
    sf = fine[order]
    bounds = np.r_[np.flatnonzero(np.r_[True, sf[1:] != sf[:-1]]), len(sf)]
    return [
        (int(sf[bounds[i]]), st.slice(bounds[i], bounds[i + 1] - bounds[i]).drop_columns([PART_COL]))
        for i in range(len(bounds) - 1)
    ]


def merge_partials_partition(
    cfg, staging_dir: str, coarse_factor: int, group: pd.DataFrame, m: int = 1
) -> pd.DataFrame:
    """Phase B task: merge a partition's folded partials (state frames) with
    prior lake state — rides the existing state-partials merge path.

    Only partials of the CURRENT rerun multiplier ``m`` are merged (filename
    suffix ``-{m:03d}.arrow``); a rerun with a different multiplier would
    otherwise also pick up the crashed attempt's stale partials and count
    every event's counter delta twice.  ``m >= 1`` is enforced — a
    match-any suffix would silently fold stale attempts' partials."""
    if m < 1:
        raise ValueError(f"merge_partials_partition requires m >= 1, got {m}")
    import time as _time

    from cassandra_data_migrator_ray.stages.merge import METRICS_COLUMNS

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    outs = []
    for dir_key in group["part"]:
        pdir = os.path.join(staging_dir, f"part={int(dir_key):05d}", _PARTIALS_DIR)
        if not os.path.isdir(pdir):
            continue
        by_fine: dict[int, list[str]] = {}
        suffix = f"-{m:03d}.arrow"
        for f in sorted(os.listdir(pdir)):
            if f.startswith("partial-") and f.endswith(suffix):
                fine = int(f.split("-")[1])
                by_fine.setdefault(fine, []).append(os.path.join(pdir, f))
        for fine, files in sorted(by_fine.items()):
            def _read_ipc(path: str) -> pa.Table:
                with pa.memory_map(path) as src:
                    return pa.ipc.open_file(src).read_all()

            _t0 = _time.perf_counter()
            partials = pa.concat_tables([_read_ipc(f) for f in files])
            # state-frame input (no "op" column) rides _merge_fine's Arrow
            # merge kernel — same receipt/CDF/write protocol as stage 2
            outs.append(
                _merge_fine(cfg, fine, partials, _time.perf_counter() - _t0, _t0)
            )
    return (
        pd.concat(outs, ignore_index=True)
        if outs
        else pd.DataFrame(columns=METRICS_COLUMNS)
    )
