"""Lake manifest: exactly-once two-phase commit + checkpoint/resume state.

Replaces the reference's run ledger — the ``cdm_run_info`` / ``cdm_run_details``
tables with per-token-range NOT_STARTED/STARTED/PASS/FAIL statuses
(/root/reference src/main/java/com/datastax/cdm/cql/statement/
TargetUpsertRunDetailsStatement.java:63-216, feature/TrackRun.java:32-85) — with
a stronger guarantee: the reference's writes are at-least-once-but-idempotent,
here the *sink itself* is exactly-once.

Protocol:
  phase 1  each partition-merge task writes its data file to
           ``data/part-{K}-{run_id}.parquet`` via tmp + atomic rename
           (deterministic name → a Ray task retry overwrites, never duplicates)
           and drops a receipt ``_staging/{run_id}/part-{K}.json`` recording
           file, watermark (max event_seq merged) and metrics.
  phase 2  the driver gathers receipts and atomically swaps ``manifest.json``
           (tmp + os.replace).  Readers only ever see manifest-referenced
           files; files without a manifest/receipt reference are garbage.

Resume: a re-run with the same run_id skips partitions that already have a
receipt (the reference's pending-partition rerun,
job/BasePartitionJob.scala:41-55); per-partition high-watermark offsets filter
already-merged events on later runs, making duplicate delivery a no-op.

Concurrency contract: ONE writer job per lake at a time (same as the
reference's one-Spark-job-per-migration); commit-time GC reclaims any staging
not belonging to the committing run.  Readers always see a CONSISTENT
manifest (the swap is atomic), and since time-travel snapshots pin old file
sets (``snapshot_retention``, default 8), a reader that loaded an older
manifest keeps its files on disk for the next ``retention`` commits — MVCC
reader isolation with a bounded window.  Only a reader lagging beyond
retention (or racing a ``vacuum``) can hit FileNotFoundError and must retry
from the fresh manifest; ``snapshot_retention=0`` keeps every version until
an explicit vacuum.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

_TYPE_TO_ARROW = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(),
    "binary": pa.binary(),
    "decimal128(38, 9)": pa.decimal128(38, 9),
}


def schema_to_json(schema: pa.Schema) -> dict:
    """Portable manifest form: Arrow IPC schema bytes (supports every Arrow
    type — structs/UDTs, lists/vectors, maps) + a readable field listing."""
    import base64

    return {
        "ipc_b64": base64.b64encode(schema.serialize().to_pybytes()).decode(),
        "fields": [[f.name, str(f.type)] for f in schema],
    }


def schema_from_json(obj) -> pa.Schema:
    import base64

    if isinstance(obj, dict) and "ipc_b64" in obj:
        return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(obj["ipc_b64"])))
    # legacy list-of-[name, type] form
    out = []
    for name, typ in obj:
        if typ in _TYPE_TO_ARROW:
            out.append(pa.field(name, _TYPE_TO_ARROW[typ]))
        elif typ.startswith("list<item: float>") or typ == "list<element: float>":
            out.append(pa.field(name, pa.list_(pa.float32())))
        else:
            raise ValueError(f"unsupported manifest type: {typ}")
    return pa.schema(out)


def _castable_variant(incoming: pa.DataType, declared: pa.DataType) -> bool:
    """True when ``incoming`` is the same logical type as ``declared`` in a
    different physical representation that align_to_schema casts per batch —
    e.g. pandas-inferred timestamp[ns] against a declared timestamp[us], or
    large_string against string.  Genuine type changes stay rejected."""
    if pa.types.is_timestamp(incoming) and pa.types.is_timestamp(declared):
        return True
    if (pa.types.is_string(incoming) or pa.types.is_large_string(incoming)) and (
        pa.types.is_string(declared) or pa.types.is_large_string(declared)
    ):
        return True
    if (pa.types.is_binary(incoming) or pa.types.is_large_binary(incoming)) and (
        pa.types.is_binary(declared) or pa.types.is_large_binary(declared)
    ):
        return True
    # lossless numeric widening only (int32 batch → int64 column); narrowing
    # stays a rejected type change
    if (
        pa.types.is_integer(incoming)
        and pa.types.is_integer(declared)
        and pa.types.is_signed_integer(incoming) == pa.types.is_signed_integer(declared)
        and incoming.bit_width <= declared.bit_width
    ):
        return True
    if (
        pa.types.is_floating(incoming)
        and pa.types.is_floating(declared)
        and incoming.bit_width <= declared.bit_width
    ):
        return True
    return False


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _partfile_run_id(fn: str) -> str | None:
    """run_id embedded in a partition or change-feed filename ``part-NNNNN-<run_id>.parquet``
    — the run_id itself may contain dashes (user-supplied), so parse by the
    fixed-width part prefix, never by splitting on '-'."""
    m = re.match(r"part-\d{5,}-(.+)\.parquet$", fn)
    return m.group(1) if m else None


@dataclass
class PartitionState:
    files: list[str] = field(default_factory=list)  # relative to lake dir
    watermark: int = -1  # max event_seq merged into this partition
    rows: int = 0
    tombstones: int = 0
    status: str = "PASS"  # NOT_STARTED|STARTED|PASS|FAIL|DIFF|DIFF_CORRECTED
    metrics: dict[str, int] = field(default_factory=dict)


@dataclass
class Manifest:
    lake_dir: str
    schema: pa.Schema
    num_parts: int
    salt: int = 1
    counter_cols: list[str] = field(default_factory=list)
    # columns dropped by a metadata-only ALTER whose bytes still sit in
    # partition files (pending purge): re-adding such a name before a full
    # rewrite (compact_lake / alter_lake rename) would resurrect the old cell
    # values through merge-on-read, so evolve_schema refuses it until the
    # next full rewrite clears this list
    dropped_cols: list[str] = field(default_factory=list)
    # primary-key columns of the lake table (reference PKFactory composes PKs
    # from origin columns, constants and exploded map keys,
    # data/PKFactory.java:106-133,241-322 — here transforms compose the key
    # columns before normalize, and the manifest pins which columns they are)
    key_cols: list[str] = field(default_factory=lambda: ["conv_id", "turn_idx"])
    # durable per-cell TTL bookkeeping (c__ttlx / __row_ttlx state columns)
    ttl_enabled: bool = False
    # time-travel retention: keep this many committed versions readable
    # (commit auto-prunes older snapshots + their change feeds, gc reclaims
    # the copy-on-write files).  0 = unlimited, manual vacuum() only —
    # without a bound a per-batch tail loop would leak one superseded file
    # copy per partition per commit.
    snapshot_retention: int = 8
    version: int = 0
    partitions: dict[int, PartitionState] = field(default_factory=dict)
    runs: list[dict] = field(default_factory=list)

    # ---------- paths ----------
    @property
    def path(self) -> str:
        return os.path.join(self.lake_dir, "manifest.json")

    def data_file(self, part: int, run_id: str) -> str:
        return os.path.join("data", f"part-{part:05d}-{run_id}.parquet")

    def staging_dir(self, run_id: str) -> str:
        return os.path.join(self.lake_dir, "_staging", run_id)

    @property
    def snapshots_dir(self) -> str:
        return os.path.join(self.lake_dir, "_snapshots")

    def receipt_path(self, part: int, run_id: str) -> str:
        return os.path.join(self.staging_dir(run_id), f"part-{part:05d}.json")

    # ---------- (de)serialization ----------
    def to_json(self) -> dict:
        return {
            "format_version": 1,
            "schema": schema_to_json(self.schema),
            "num_parts": self.num_parts,
            "salt": self.salt,
            "counter_cols": self.counter_cols,
            "dropped_cols": self.dropped_cols,
            "key_cols": self.key_cols,
            "ttl_enabled": self.ttl_enabled,
            "snapshot_retention": self.snapshot_retention,
            "version": self.version,
            "partitions": {
                str(k): {
                    "files": v.files,
                    "watermark": v.watermark,
                    "rows": v.rows,
                    "tombstones": v.tombstones,
                    "status": v.status,
                    "metrics": v.metrics,
                }
                for k, v in self.partitions.items()
            },
            "runs": self.runs,
        }

    @classmethod
    def load(cls, lake_dir: str) -> "Manifest | None":
        p = os.path.join(lake_dir, "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            j = json.load(f)
        m = cls(
            lake_dir=lake_dir,
            schema=schema_from_json(j["schema"]),
            num_parts=j["num_parts"],
            salt=j.get("salt", 1),
            counter_cols=j.get("counter_cols", []),
            dropped_cols=j.get("dropped_cols", []),
            key_cols=j.get("key_cols", ["conv_id", "turn_idx"]),
            ttl_enabled=j.get("ttl_enabled", False),
            snapshot_retention=j.get("snapshot_retention", 8),
            version=j["version"],
            runs=j.get("runs", []),
        )
        for k, v in j.get("partitions", {}).items():
            m.partitions[int(k)] = PartitionState(
                files=v["files"],
                watermark=v["watermark"],
                rows=v["rows"],
                tombstones=v.get("tombstones", 0),
                status=v.get("status", "PASS"),
                metrics=v.get("metrics", {}),
            )
        return m

    @classmethod
    def load_or_create(
        cls,
        lake_dir: str,
        schema: pa.Schema,
        num_parts: int,
        salt: int = 1,
        counter_cols: list[str] | None = None,
        key_cols: list[str] | None = None,
        ttl_enabled: bool = False,
        snapshot_retention: int | None = None,
    ) -> "Manifest":
        m = cls.load(lake_dir)
        if m is None:
            os.makedirs(os.path.join(lake_dir, "data"), exist_ok=True)
            return cls(
                lake_dir=lake_dir,
                schema=schema,
                num_parts=num_parts,
                salt=salt,
                counter_cols=list(counter_cols or []),
                key_cols=list(key_cols or ["conv_id", "turn_idx"]),
                ttl_enabled=ttl_enabled,
                **(
                    {"snapshot_retention": snapshot_retention}
                    if snapshot_retention is not None
                    else {}
                ),
            )
        return m

    def payload_cols(self) -> list[str]:
        return [n for n in self.schema.names if n not in self.key_cols]

    # ---------- schema evolution ----------
    def evolve_schema(self, incoming: pa.Schema, *, widen: bool = False) -> bool:
        """Additive evolution: append unseen payload columns (null-backfilled
        lazily on read).  Type changes / drops are rejected — matching the
        reference's constraint that origin/target columns correspond
        (schema/CqlTable.java:408-428).

        ``widen=True`` additionally accepts LOSSLESS numeric promotions of the
        declared type (int -> wider int of the same signedness, float32 ->
        float64 — the Iceberg-style widening set): the declared field is
        rewritten to the wider incoming type and committed with this run.
        Existing partition files keep their narrow physical type; every
        reader already aligns file -> declared schema (align_to_schema casts
        per column), and partition routing hashes key VALUES through Python
        objects (state/partitioning.py hash_key), so a widened key column
        routes identically before and after.  Opt-in because the most common
        wide arrival is an ACCIDENT — pandas inferring int64 for an int32
        column — and silently widening every lake touched by pandas would
        destroy the declared schema's meaning."""
        changed = False
        names = set(self.schema.names)
        for f in incoming:
            # an all-null column arrives as Arrow null type (e.g. a pandas
            # frame whose nullable column is entirely None) — compatible with
            # any declared type, carries no type information of its own
            if pa.types.is_null(f.type):
                continue
            if f.name not in names:
                if f.name in self.dropped_cols:
                    raise ValueError(
                        f"column {f.name!r} was dropped by ALTER but its bytes"
                        " are still present in partition files (pending"
                        " purge); re-adding it now would resurrect the old"
                        " cell values through merge-on-read — run"
                        " compact_lake() (full sweep) first"
                    )
                self.schema = self.schema.append(f)
                changed = True
            else:
                have = self.schema.field(f.name).type
                if (
                    widen
                    and have != f.type
                    and not _castable_variant(f.type, have)
                    and _castable_variant(have, f.type)
                    and (pa.types.is_integer(f.type) or pa.types.is_floating(f.type))
                ):
                    idx = self.schema.get_field_index(f.name)
                    # with_type keeps the declared field's nullability flag
                    # and metadata — only the storage width changes
                    self.schema = self.schema.set(
                        idx, self.schema.field(idx).with_type(f.type)
                    )
                    changed = True
                    continue
                if have != f.type and not _castable_variant(f.type, have):
                    hint = ""
                    if pa.types.is_integer(f.type) and pa.types.is_integer(have):
                        hint = (
                            " (pandas infers int64 by default — cast the column"
                            f" to the declared {have}, or declare a wider"
                            " payload_schema on the first replay)"
                        )
                    raise ValueError(
                        f"non-additive schema change for {f.name}: "
                        f"{have} -> {f.type}{hint}"
                    )
        return changed

    # ---------- watermarks / commit ----------
    def watermarks(self) -> dict[int, int]:
        return {k: v.watermark for k, v in self.partitions.items()}

    def write_receipt(self, part: int, run_id: str, receipt: dict) -> None:
        atomic_write_json(self.receipt_path(part, run_id), receipt)

    def read_receipt(self, part: int, run_id: str) -> dict | None:
        p = self.receipt_path(part, run_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def staged_receipts(self, run_id: str) -> dict[int, dict]:
        d = self.staging_dir(run_id)
        out: dict[int, dict] = {}
        if not os.path.isdir(d):
            return out
        for fn in os.listdir(d):
            if fn.startswith("part-") and fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    r = json.load(f)
                out[int(r["part"])] = r
        return out

    def commit_run(
        self,
        run_id: str,
        extra: dict | None = None,
        replace_partitions: bool = False,
        new_layout: "tuple[int, int] | None" = None,
    ) -> None:
        """Phase 2: fold staged receipts into the manifest and swap atomically.

        ``replace_partitions``: drop every existing partition entry before
        folding this run's receipts in — for whole-lake rewrites (reshard)
        where partitions absent from the receipts are now genuinely empty,
        not merely untouched.  ``new_layout``: atomically switch the lake's
        ``(num_parts, salt)`` with the same commit, so readers never observe
        data placed under one layout described by another.

        Optimistic single-writer enforcement: the version check + manifest
        swap happen under an O_EXCL lock file (so two near-simultaneous
        commits serialize instead of racing load-to-write); if the on-disk
        version moved since this run loaded it, another writer committed
        concurrently — folding OUR receipts over OUR stale snapshot would
        silently drop the other run's partition updates (lost update), so
        refuse loudly instead.  A lock older than 10 minutes is presumed
        crashed and broken.
        """
        lock = os.path.join(self.lake_dir, "manifest.lock")
        deadline = time.monotonic() + 30.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, run_id.encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    st = os.stat(lock)
                except OSError:
                    continue
                if time.time() - st.st_mtime > 600:
                    # Crashed holder — break the lock.  Breaking must be
                    # serialized: if two waiters both unlink unconditionally,
                    # one can delete a FRESH lock created between the other's
                    # stat and unlink, letting two commits run concurrently.
                    # An O_EXCL break-token admits one breaker at a time, and
                    # under the token we re-stat and only unlink if the lock
                    # is still the same inode AND still stale.
                    token = lock + ".break"
                    try:
                        if time.time() - os.path.getmtime(token) > 600:
                            os.unlink(token)  # breaker itself crashed
                    except OSError:
                        pass
                    try:
                        tfd = os.open(token, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    except OSError:
                        time.sleep(0.05)
                        continue
                    try:
                        st2 = os.stat(lock)
                        if (
                            st2.st_ino == st.st_ino
                            and time.time() - st2.st_mtime > 600
                        ):
                            os.unlink(lock)
                    except OSError:
                        pass
                    finally:
                        os.close(tfd)
                        try:
                            os.unlink(token)
                        except OSError:
                            pass
                    continue
                if time.monotonic() > deadline:
                    raise RuntimeError(
                        f"commit lock {lock} held by another writer for >30s; "
                        "the lake contract is ONE writer job at a time"
                    )
                time.sleep(0.05)
        try:
            on_disk = Manifest.load(self.lake_dir)
            if on_disk is not None and on_disk.version != self.version:
                raise RuntimeError(
                    f"concurrent writer detected on lake {self.lake_dir}: "
                    f"manifest version moved {self.version} -> "
                    f"{on_disk.version} since this run ({run_id}) loaded it; "
                    "the lake contract is ONE writer job at a time — rerun "
                    "this job (its staged work is intact and will resume "
                    "from receipts)"
                )
            self._commit_locked(run_id, extra, replace_partitions, new_layout)
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass

    def _commit_locked(
        self,
        run_id: str,
        extra: dict | None = None,
        replace_partitions: bool = False,
        new_layout: "tuple[int, int] | None" = None,
    ) -> None:
        receipts = self.staged_receipts(run_id)
        if replace_partitions:
            self.partitions = {}
        if new_layout is not None:
            self.num_parts, self.salt = int(new_layout[0]), int(new_layout[1])
        for part, r in receipts.items():
            self.partitions[part] = PartitionState(
                files=r["files"],
                watermark=r["watermark"],
                rows=r["rows"],
                tombstones=r.get("tombstones", 0),
                status=r.get("status", "PASS"),
                metrics=r.get("metrics", {}),
            )
        self.version += 1
        self.runs.append(
            {
                "run_id": run_id,
                "version": self.version,
                "committed_at": time.time(),
                "partitions": sorted(receipts),
                # feed files this commit wrote — ranged readers compare the
                # on-disk count against this to detect pruned feeds
                "cdf_files": sum(
                    1 for r in receipts.values() if r.get("cdf_file")
                ),
                **(extra or {}),
            }
        )
        atomic_write_json(self.path, self.to_json())
        # versioned snapshot for time travel: the complete partition→files map
        # at this commit (copy-on-write means old partition files stay on disk
        # while a snapshot references them; vacuum() prunes).  Written BEFORE
        # gc so the collector sees it and retains the referenced files.
        atomic_write_json(
            os.path.join(self.snapshots_dir, f"v{self.version:06d}.json"),
            {
                "version": self.version,
                "run_id": run_id,
                "committed_at": time.time(),
                "schema": schema_to_json(self.schema),
                "key_cols": self.key_cols,
                "ttl_enabled": self.ttl_enabled,
                # layout AT this version: versioned point lookups must prune
                # with the layout the files were placed under, which a later
                # reshard may have changed (snapshots written before reshard
                # existed lack these keys — readers fall back to scanning
                # every snapshot partition)
                "num_parts": self.num_parts,
                "salt": self.salt,
                "partitions": {
                    str(k): v.files for k, v in self.partitions.items()
                },
            },
        )
        if self.snapshot_retention:
            # bounded time travel by default: a per-batch tail loop would
            # otherwise leak one superseded file copy per partition per
            # commit; gc below reclaims the newly-unreferenced files
            self._prune_snapshots(self.snapshot_retention)
        self.gc(keep_staging={run_id} if receipts else set())
        # the committing run's staged raw-event copy (~the whole input stream)
        # is dead weight once receipts are folded in.  Deleting tens of
        # thousands of staged slices inline costs tens of seconds, so: O(1)
        # rename out of the run dir, then best-effort background delete; any
        # survivor .trash dir is swept by the next commit's gc.
        if receipts:
            import shutil
            import threading

            sdir = self.staging_dir(run_id)
            trash: list[str] = []
            if os.path.isdir(sdir):
                for fn in os.listdir(sdir):
                    sub = os.path.join(sdir, fn)
                    if os.path.isdir(sub):
                        t = os.path.join(
                            self.lake_dir, "_staging", f".trash-{run_id}-{fn}"
                        )
                        try:
                            os.rename(sub, t)
                            trash.append(t)
                        except OSError:
                            shutil.rmtree(sub, ignore_errors=True)
            if trash:
                threading.Thread(
                    target=lambda: [shutil.rmtree(t, ignore_errors=True) for t in trash],
                    daemon=True,
                ).start()

    def list_snapshots(self) -> list[int]:
        """Committed versions still available for time travel."""
        d = self.snapshots_dir
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json")
        )

    def snapshot(self, version: int) -> dict | None:
        """The committed partition→files map (+ schema) at ``version``."""
        p = os.path.join(self.snapshots_dir, f"v{version:06d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _prune_snapshots(self, keep_last: int) -> list[int]:
        """Unlink snapshot JSONs beyond the newest ``keep_last`` and age out
        the change feeds of runs committed below the retained floor.  Pure
        metadata pruning — file reclamation is gc()'s job."""
        versions = self.list_snapshots()
        cut = versions[-max(1, keep_last):] if versions else []
        pruned = [v for v in versions if v not in cut]
        for v in pruned:
            try:
                os.unlink(os.path.join(self.snapshots_dir, f"v{v:06d}.json"))
            except OSError:
                pass
        floor = cut[0] if cut else self.version
        stale_runs = {
            r["run_id"] for r in self.runs if r.get("version", 0) < floor
        }
        cdir = os.path.join(self.lake_dir, "cdf")
        if stale_runs and os.path.isdir(cdir):
            for fn in os.listdir(cdir):
                rid = _partfile_run_id(fn)
                if rid in stale_runs:
                    try:
                        os.unlink(os.path.join(cdir, fn))
                    except OSError:
                        pass
        return pruned

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop time-travel snapshots older than the newest ``keep_last``
        versions (and their runs' change feeds), then gc the now-unreferenced
        data files.  Returns the pruned versions.  The current version is
        always retained; staged work of in-flight/resumable runs is never
        touched (only commit sweeps ``_staging``)."""
        pruned = self._prune_snapshots(keep_last)
        if pruned:
            self.gc()
        return pruned

    def _snapshot_referenced_files(self) -> set[str]:
        refs: set[str] = set()
        d = self.snapshots_dir
        if not os.path.isdir(d):
            return refs
        for fn in os.listdir(d):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    with open(os.path.join(d, fn)) as f:
                        snap = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                for files in snap.get("partitions", {}).values():
                    refs.update(files)
        return refs

    def gc(self, keep_staging: set[str] | None = None) -> list[str]:
        """Delete data files referenced by neither the committed manifest nor
        a retained time-travel snapshot (vacuum() shrinks the latter set).

        ``keep_staging`` is commit-only: an explicit set sweeps every OTHER
        run's staging dir (the committing run just proved it is the single
        writer).  ``None`` (maintenance callers like vacuum) leaves
        ``_staging`` untouched — a crashed-but-resumable run's staged slices
        and receipts must survive maintenance, only ``.trash-*`` debris goes."""
        removed = []
        # staging sweep FIRST: what survives it defines the in-flight/
        # resumable run set, whose phase-1 outputs must not be collected —
        # their already-written partition/cdf files (deterministic names,
        # written BEFORE commit) will be referenced when the run commits
        inflight: set[str] = set()
        sdir = os.path.join(self.lake_dir, "_staging")
        if os.path.isdir(sdir):
            import shutil

            for run in os.listdir(sdir):
                # .trash-* dirs (renamed-out staged events) are always garbage
                if not run.startswith(".trash-") and (
                    keep_staging is None or run in keep_staging
                ):
                    inflight.add(run)
                    continue
                shutil.rmtree(os.path.join(sdir, run), ignore_errors=True)
        referenced = {f for p in self.partitions.values() for f in p.files}
        referenced |= self._snapshot_referenced_files()
        ddir = os.path.join(self.lake_dir, "data")
        if os.path.isdir(ddir):
            for fn in os.listdir(ddir):
                rel = os.path.join("data", fn)
                rid = _partfile_run_id(fn)
                # fail SAFE on an unparsable name: keeping an alien file
                # leaks bytes; deleting an in-flight run's file corrupts it
                if (
                    rel not in referenced
                    and not fn.endswith(".tmp")
                    and rid is not None
                    and rid not in inflight
                ):
                    os.unlink(os.path.join(ddir, fn))
                    removed.append(rel)
        # cdf files from a crashed (never-committed) run are invisible to
        # readers but dead weight — drop any whose run is neither committed
        # nor still resumable
        cdir = os.path.join(self.lake_dir, "cdf")
        if os.path.isdir(cdir):
            committed = {r["run_id"] for r in self.runs}
            for fn in os.listdir(cdir):
                rid = _partfile_run_id(fn)
                if rid is not None and rid not in committed and rid not in inflight:
                    try:
                        os.unlink(os.path.join(cdir, fn))
                        removed.append(os.path.join("cdf", fn))
                    except OSError:
                        pass
        # crashed validates leave _validate/v-* dirs (live ones clean up in
        # their finally); sweep only stale ones so a concurrent validate's
        # expected-side staging is never pulled out from under it.  Staleness
        # uses the newest mtime across the dir AND its immediate part=
        # children (the root's mtime freezes once every part dir exists, even
        # while slices are still being written into them), with a 7-day fuse —
        # comfortably beyond any plausible single validate run.
        vdir = os.path.join(self.lake_dir, "_validate")
        if os.path.isdir(vdir):
            import shutil

            cutoff = time.time() - 7 * 86_400
            for d in os.listdir(vdir):
                p = os.path.join(vdir, d)
                try:
                    newest = os.path.getmtime(p)
                    for sub in os.listdir(p):
                        newest = max(newest, os.path.getmtime(os.path.join(p, sub)))
                    if newest < cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    pass
        return removed
