"""Validate (DiffData) + autocorrect pipeline, Ray-Data-first.

Reference lifecycle: job/DiffData.scala:23-44 + DiffJobSession.java:52-241 —
origin scan, per-row async target lookup, classify, optional autocorrect
(missing → insert, mismatch → upsert, DiffJobSession.java:215-234).

Here: expected (origin) and actual (lake) are co-partitioned with the lake's
own deterministic route, unioned with a side tag, and compared per partition
group as a sorted vectorized outer join (stages/validate.py).  Only non-VALID
rows leave the comparator (bounded report); counts ride along in synthetic
rows, so one pass produces both.  Autocorrect turns report rows into
corrective change events (fix_wt beats every surviving cell) and replays them
through the normal merge path — reusing, not re-implementing, the write side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cassandra_data_migrator_ray.schema import (
    DEL_WT,
    NEG_INF,
    ROW_WT,
    WT_SUFFIX,
)
from cassandra_data_migrator_ray.stages.normalize import PART_COL
from cassandra_data_migrator_ray.stages.validate import SIDE_COL, compare_group
from cassandra_data_migrator_ray.state.manifest import Manifest
from cassandra_data_migrator_ray.state.partitioning import assign_partition_keys


@dataclass
class ValidateResult:
    counts: dict[str, int]  # VALID / MISSING / MISMATCH / EXTRA
    report: pd.DataFrame  # non-VALID rows, sorted by (conv_id, turn_idx)
    seconds: float

    @property
    def ok(self) -> bool:
        return (
            self.counts.get("MISSING", 0) == 0
            and self.counts.get("MISMATCH", 0) == 0
            and self.counts.get("EXTRA", 0) == 0
        )


def _tag_side(
    side: int,
    num_parts: int,
    salt: int,
    payload_schema: pa.Schema,
    wt_cols: list[str],
    batch: pa.Table,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Project a batch to the unified compare layout + route + side tag
    (Arrow-native: only the key columns touch pandas, for the stable hash).

    Null key components get the SAME type-based defaults normalize applies on
    the write path (stages/normalize.py _default_for) — otherwise an expected
    row with a null key would route/compare differently from the lake's
    defaulted row and report spurious MISSING+EXTRA."""
    from cassandra_data_migrator_ray.stages.normalize import _default_for

    n = batch.num_rows
    names = set(batch.column_names)
    cols: dict[str, object] = {}
    for f in payload_schema:  # keys + payload, cast to the manifest types
        if f.name in names:
            col = batch.column(f.name)
            cols[f.name] = col.cast(f.type) if col.type != f.type else col
        else:
            cols[f.name] = pa.nulls(n, f.type)
    for k in key_cols:
        if k in cols:
            import pyarrow.compute as pc

            d = _default_for(payload_schema.field(k).type) if k in payload_schema.names else None
            if d is not None:
                cols[k] = pc.fill_null(cols[k], d)
    for c in wt_cols:
        if c in names:
            cols[c] = batch.column(c).cast(pa.int64())
        else:
            cols[c] = pa.array(np.full(n, NEG_INF, dtype=np.int64))
    cols[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
    if num_parts <= 1:
        # the lake-file comparator path: the partition is already known, the
        # per-row key hash would be computed only to be dropped
        part = np.zeros(n, dtype=np.int32)
    else:
        part = assign_partition_keys(
            [cols[k].to_pandas() for k in key_cols], num_parts, salt
        )
    cols[PART_COL] = pa.array(part, pa.int32())
    return pa.table(cols)


def _expire_view(
    t: pa.Table, expire: tuple[int, list[str]] | None
) -> pa.Table:
    """Evaluate per-cell TTL expiry on a raw partition table before the
    comparator sees it.  ``expire`` = (as_of µs, ALL payload cols of that
    lake) or None for stored-state semantics.  Row liveness depends on every
    payload cell, so the full column list — not the compared subset — drives
    the evaluation (functions/lww.py apply_ttl_expiry)."""
    if expire is None or t.num_rows == 0:
        return t
    from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

    as_of, all_payload = expire
    df = apply_ttl_expiry(t.to_pandas(), as_of, all_payload)
    # rebuild under the ORIGINAL schema rather than letting from_pandas
    # re-infer types: the pandas round-trip upcasts nullable ints to float
    # and an all-expired column would infer as null type — pinning the
    # schema keeps the comparator's cast path identical to the stored-state
    # one (NaN maps to null under the explicit integer type)
    return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)


def _compare_staged_part(
    staging_dir: str,
    payload_cols: list[str],
    lake_dir: str,
    lake_files_by_part: dict[int, list[str]],
    wt_cols: list[str],
    schema_ipc: bytes,
    key_cols: tuple[str, ...],
    coarse_factor: int,
    counter_cols: tuple[str, ...],
    expire: tuple[int, list[str]] | None,
    batch: pd.DataFrame,
) -> pd.DataFrame:
    """Staged-exchange comparator task: staged expected slices + the lake
    partition read DIRECTLY (it is already partitioned by the same route — no
    need to re-shuffle the actual side at all).

    ``batch`` carries coarse dir keys; with ``coarse_factor > 1`` each task
    reads its coarse slab ONCE and splits it into fine partitions on
    PART_COL — the same two-level shape replay uses, so staged dir/file
    count stays bounded at high partition counts."""
    import os

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from cassandra_data_migrator_ray.schema import DELETED
    from cassandra_data_migrator_ray.stages.validate import compare_part_arrow

    if _pa.cpu_count() != 1:
        _pa.set_cpu_count(1)
    payload_schema = _pa.ipc.read_schema(_pa.py_buffer(schema_ipc))
    outs = []
    for ck in batch["part"]:
        ck = int(ck)
        pdir = os.path.join(staging_dir, f"part={ck:05d}")
        files = (
            sorted(
                os.path.join(pdir, f)
                for f in os.listdir(pdir)
                if f.startswith("blk-") and f.endswith(".arrow")
            )
            if os.path.isdir(pdir)
            else []
        )
        slab = None
        if files:

            def _read_ipc(path):
                with _pa.memory_map(path) as src:
                    return _pa.ipc.open_file(src).read_all()

            slab = _pa.concat_tables([_read_ipc(f) for f in files])

        fine_parts: set[int] = {
            p for p in lake_files_by_part if p // coarse_factor == ck
        }
        if slab is not None:
            if coarse_factor > 1:
                fine_parts |= {
                    int(v)
                    for v in _pc.unique(slab[PART_COL]).to_pylist()
                }
            else:
                fine_parts.add(ck)

        for part in sorted(fine_parts):
            sides = []
            if slab is not None:
                exp = (
                    slab.filter(_pc.equal(slab[PART_COL], part)).drop_columns(
                        [PART_COL]
                    )
                    if coarse_factor > 1
                    else slab
                )
                if exp.num_rows:
                    sides.append(exp)
            for rel in lake_files_by_part.get(part, []):
                t = _expire_view(
                    _pq.read_table(os.path.join(lake_dir, rel), use_threads=False),
                    expire,
                )
                deleted = _pc.fill_null(t[DELETED], False)
                live = t.filter(_pc.invert(deleted))
                sides.append(
                    _tag_side(1, 1, 1, payload_schema, wt_cols, live, key_cols).drop_columns(
                        [PART_COL]
                    )
                )
                # tombstoned keys stay visible to the comparator as side=2:
                # they never produce EXTRA/MISMATCH, but their DEL_WT feeds
                # fix_wt so a MISSING-but-tombstoned key gets a correction
                # that beats the tombstone (otherwise autocorrect never
                # converges).
                tomb = t.filter(deleted)
                if tomb.num_rows:
                    sides.append(
                        _tag_side(2, 1, 1, payload_schema, wt_cols, tomb, key_cols).drop_columns(
                            [PART_COL]
                        )
                    )
            if not sides:
                continue
            # align column order across sides before concat
            names = sides[0].column_names
            sides = [s.select(names) for s in sides]
            tbl = _pa.concat_tables(sides)
            outs.append(
                compare_part_arrow(
                    tbl, list(key_cols), payload_cols, part, counter_cols
                )
            )
    if not outs:
        return pd.DataFrame(
            columns=[*key_cols, "status", "cols_differ", "fix_wt"]
        )
    return pd.concat(outs, ignore_index=True)


def validate(
    expected: Any,
    lake_dir: str,
    *,
    report_path: str | None = None,
    batch_size: int | None = 65536,
    shuffle: str = "staging",
    columns: list[str] | None = None,
    since_version: int | None = None,
    as_of: int | None = None,
) -> ValidateResult:
    """Compare the lake's final state against an expected (origin) dataset.

    ``as_of`` (µs, TTL-enabled lakes): evaluate per-cell expiry at this
    instant before comparing, matching ``read_lake(as_of=...)`` — expired
    cells compare as null and fully-expired rows as absent.  Default None
    compares STORED state (an unexpired cell's value, even if the expected
    view was taken later) — the reference's DiffData also compares stored
    cells.

    ``columns`` restricts the comparison to a payload-column subset (the
    reference's column skip-list on the diff path, schema/CqlTable.java:479-483
    + DiffJobSession's skip-if-configured columns) — omitted columns neither
    ship through the exchange nor count as differences, and a subsequent
    autocorrect upserts only the compared columns (nulls = unset keeps the
    rest intact).

    ``since_version`` makes the validate INCREMENTAL: only partitions touched
    by runs committed after that manifest version are compared (both sides
    prune before the exchange, so cost scales with the increment, not the
    lake).  Sound iff the skipped partitions were valid at ``since_version``
    and the expected table is unchanged for their keys — i.e. the standard
    validate-after-each-incremental-replay loop."""
    from cassandra_data_migrator_ray.pipelines.replay import _as_dataset
    from cassandra_data_migrator_ray.sources.lake import lake_files

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    touched_parts: list[int] | None = None
    if since_version is not None:
        touched_parts = sorted(
            {
                int(p)
                for r in manifest.runs
                if r.get("version", 0) > since_version
                for p in r.get("partitions", [])
            }
        )
    key_cols = tuple(manifest.key_cols)
    payload_cols = [
        c for c in manifest.payload_cols() if columns is None or c in columns
    ]
    wt_cols = [f"{c}{WT_SUFFIX}" for c in payload_cols] + [ROW_WT, DEL_WT]
    # TTL expiry at the comparison instant (no-op for non-TTL lakes); the
    # FULL payload list drives row liveness, not the compared subset
    expire = (
        (int(as_of), manifest.payload_cols())
        if as_of is not None and manifest.ttl_enabled
        else None
    )

    keep = {*key_cols, *payload_cols}
    full_schema = pa.schema(
        [manifest.schema.field(n) for n in manifest.schema.names if n in keep]
    )
    exp_ds = _as_dataset(expected).map_batches(
        partial(
            _tag_side,
            0,
            manifest.num_parts,
            manifest.salt,
            full_schema,
            wt_cols,
            key_cols=key_cols,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if touched_parts is not None:
        import pyarrow.compute as pc

        tp = pa.array(touched_parts, pa.int32())

        def _keep_touched(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(pc.cast(t[PART_COL], pa.int32()), value_set=tp)
            )

        exp_ds = exp_ds.map_batches(_keep_touched, batch_format="pyarrow")

    if shuffle == "staging":
        # lakehouse exchange, one-sided: only the EXPECTED side is staged by
        # partition; the actual side is the lake itself, already partitioned
        # by the identical route — each comparator task reads its partition
        # file directly (no re-shuffle of the lake at all)
        import os
        import shutil
        import uuid as _uuid

        from cassandra_data_migrator_ray.stages.staging import StageWriter

        # NOT under _staging: commit-time GC of a concurrent replay/tail run
        # sweeps every _staging dir it doesn't own, which would silently empty
        # the expected side mid-validate (everything would report EXTRA)
        staging = os.path.join(lake_dir, "_validate", "v-" + _uuid.uuid4().hex[:8])
        # two-level exchange above 256 partitions, matching replay — staged
        # dir/file count stays blocks × ≤256 at high partition counts
        coarse_factor = max(1, (manifest.num_parts + 255) // 256)
        try:
            stats = exp_ds.map_batches(
                StageWriter(staging, coarse_factor),
                batch_format="pyarrow",
                batch_size=262144,
            ).to_pandas()
            staged_dirs = set(int(p) for p in stats["part"].unique()) if len(stats) else set()
            lake_by_part = {
                int(k): v.files for k, v in manifest.partitions.items() if v.files
            }
            if touched_parts is not None:
                allowed = set(touched_parts)
                lake_by_part = {
                    k: v for k, v in lake_by_part.items() if k in allowed
                }
            dirs = sorted(
                staged_dirs | {p // coarse_factor for p in lake_by_part}
            )
            if dirs:
                parts_ds = ray.data.from_items(
                    [{"part": int(k)} for k in dirs], override_num_blocks=len(dirs)
                )
                report = parts_ds.map_batches(
                    partial(
                        _compare_staged_part,
                        staging,
                        payload_cols,
                        lake_dir,
                        lake_by_part,
                        wt_cols,
                        full_schema.serialize().to_pybytes(),
                        key_cols,
                        coarse_factor,
                        tuple(manifest.counter_cols),
                        expire,
                    ),
                    batch_format="pandas",
                    batch_size=None,
                ).to_pandas()
            else:
                report = pd.DataFrame()
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    else:
        files = lake_files(manifest, touched_parts)
        if files:
            from cassandra_data_migrator_ray.schema import DELETED

            def _lake_side(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                batch = _expire_view(batch, expire)
                deleted = pc.fill_null(batch[DELETED], False)
                live = _tag_side(
                    1,
                    manifest.num_parts,
                    manifest.salt,
                    full_schema,
                    wt_cols,
                    batch.filter(pc.invert(deleted)),
                    key_cols,
                )
                tomb = batch.filter(deleted)
                if tomb.num_rows == 0:
                    return live
                # side=2: tombstones contribute fix_wt only (see staged path)
                return pa.concat_tables(
                    [
                        live,
                        _tag_side(
                            2,
                            manifest.num_parts,
                            manifest.salt,
                            full_schema,
                            wt_cols,
                            tomb,
                            key_cols,
                        ),
                    ]
                )

            act_ds = ray.data.read_parquet(files).map_batches(
                _lake_side, batch_format="pyarrow", batch_size=batch_size
            )
            union = exp_ds.union(act_ds)
        else:
            union = exp_ds
        diff_ds = union.groupby(PART_COL).map_groups(
            partial(
                compare_group,
                key_cols=list(key_cols),
                payload_cols=payload_cols,
                part_col=PART_COL,
                counter_cols=tuple(manifest.counter_cols),
            ),
            batch_format="pandas",
        )
        report = diff_ds.to_pandas()

    return _finalize_report(report, key_cols, report_path, t0)


def _finalize_report(
    report: pd.DataFrame,
    key_cols: tuple[str, ...],
    report_path: str | None,
    t0: float,
) -> ValidateResult:
    """Fold the comparator's synthetic ``_COUNTS`` rows into totals and sort
    the non-VALID remainder (shared by :func:`validate` / :func:`diff_lakes`)."""
    counts = {"VALID": 0, "MISSING": 0, "MISMATCH": 0, "EXTRA": 0}
    if len(report):
        count_rows = report[report["status"] == "_COUNTS"]
        for s in count_rows["cols_differ"]:
            for kv in s.split(";"):
                k, v = kv.split("=")
                counts[k] += int(v)
        report = (
            report[report["status"] != "_COUNTS"]
            .sort_values(list(key_cols), kind="mergesort", ignore_index=True)
        )
    if report_path is not None and len(report):
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(report, preserve_index=False), report_path)
    return ValidateResult(counts=counts, report=report, seconds=time.perf_counter() - t0)


def _compare_lakes_part(
    lake_a: str,
    files_a_by_part: dict[int, list[str]],
    lake_b: str,
    files_b_by_part: dict[int, list[str]],
    payload_cols: list[str],
    wt_cols: list[str],
    schema_ipc: bytes,
    key_cols: tuple[str, ...],
    counter_cols: tuple[str, ...],
    expire_a: tuple[int, list[str]] | None,
    expire_b: tuple[int, list[str]] | None,
    batch: pd.DataFrame,
) -> pd.DataFrame:
    """Layout-matched lake↔lake comparator task: both sides' partition files
    are read in place (they share the partitioning route, so NO exchange
    moves a single row).  Side 0 = lake_a's live state (its tombstoned keys
    are simply absent keys), side 1/2 = lake_b live/tombstones — same
    contract as the validate exchange comparator."""
    import os

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from cassandra_data_migrator_ray.schema import DELETED
    from cassandra_data_migrator_ray.stages.validate import compare_part_arrow

    if _pa.cpu_count() != 1:
        _pa.set_cpu_count(1)
    payload_schema = _pa.ipc.read_schema(_pa.py_buffer(schema_ipc))
    outs = []
    for part in batch["part"]:
        part = int(part)
        sides = []
        for rel in files_a_by_part.get(part, []):
            t = _expire_view(
                _pq.read_table(os.path.join(lake_a, rel), use_threads=False),
                expire_a,
            )
            live = t.filter(_pc.invert(_pc.fill_null(t[DELETED], False)))
            if live.num_rows:
                sides.append(
                    _tag_side(0, 1, 1, payload_schema, wt_cols, live, key_cols)
                    .drop_columns([PART_COL])
                )
        for rel in files_b_by_part.get(part, []):
            t = _expire_view(
                _pq.read_table(os.path.join(lake_b, rel), use_threads=False),
                expire_b,
            )
            deleted = _pc.fill_null(t[DELETED], False)
            live = t.filter(_pc.invert(deleted))
            if live.num_rows:
                sides.append(
                    _tag_side(1, 1, 1, payload_schema, wt_cols, live, key_cols)
                    .drop_columns([PART_COL])
                )
            tomb = t.filter(deleted)
            if tomb.num_rows:
                sides.append(
                    _tag_side(2, 1, 1, payload_schema, wt_cols, tomb, key_cols)
                    .drop_columns([PART_COL])
                )
        if not sides:
            continue
        names = sides[0].column_names
        tbl = _pa.concat_tables([s.select(names) for s in sides])
        outs.append(
            compare_part_arrow(tbl, list(key_cols), payload_cols, part, counter_cols)
        )
    if not outs:
        return pd.DataFrame(columns=[*key_cols, "status", "cols_differ", "fix_wt"])
    return pd.concat(outs, ignore_index=True)


def _lake_view(manifest: Manifest, version: int | None):
    """(files_by_part, num_parts, salt, schema, key_cols) for the live view
    or the snapshot-pinned view at ``version``.  A pre-reshard-era snapshot
    without layout keys reports (None, None): its files can still be
    compared, but only through the exchange fallback (unknown route)."""
    from cassandra_data_migrator_ray.state.manifest import schema_from_json

    if version is None:
        return (
            {int(k): v.files for k, v in manifest.partitions.items() if v.files},
            manifest.num_parts,
            manifest.salt,
            manifest.schema,
            tuple(manifest.key_cols),
        )
    snap = manifest.snapshot(version)
    if snap is None:
        raise ValueError(f"no snapshot v{version} in {manifest.lake_dir}")
    return (
        {int(k): v for k, v in snap["partitions"].items() if v},
        snap.get("num_parts"),
        snap.get("salt"),
        schema_from_json(snap["schema"]),
        tuple(snap["key_cols"]),
    )


def diff_lakes(
    lake_a: str,
    lake_b: str,
    *,
    columns: list[str] | None = None,
    report_path: str | None = None,
    version_a: int | None = None,
    version_b: int | None = None,
    as_of: int | None = None,
) -> ValidateResult:
    """Compare two lakes' final states (origin-cluster vs target-cluster
    DiffData, job/DiffData.scala:23-44 — both sides as lakes instead of one
    live cluster).  ``lake_a`` plays the expected side: MISSING = key live in
    a but not b, EXTRA = live in b but not a, MISMATCH = live in both with
    differing compared payload values.

    Scale posture: when the two lakes share a layout (num_parts, salt, key
    columns) every partition pair is compared by one task reading both
    sides' files IN PLACE — zero exchange, cost = one streaming pass over
    both lakes.  Mismatched layouts fall back to re-keying lake_a's public
    view through the validate exchange (one side moves once).

    ``columns`` restricts the compared payload columns (diff skip-list);
    columns present in only one lake's schema are never compared.

    ``version_a`` / ``version_b`` pin either side to a committed snapshot
    (time-travel diff — replica-drift audits between historical states).
    A time-travel *target* side requires matching layouts (the exchange
    fallback only knows how to stage the expected side against the live
    target)."""
    from cassandra_data_migrator_ray.sources.lake import read_lake

    t0 = time.perf_counter()
    ma, mb = Manifest.load(lake_a), Manifest.load(lake_b)
    if ma is None or mb is None:
        raise FileNotFoundError(f"missing manifest: {lake_a if ma is None else lake_b}")
    files_a, np_a, salt_a, schema_a, kc_a = _lake_view(ma, version_a)
    files_b, np_b, salt_b, schema_b, kc_b = _lake_view(mb, version_b)
    if kc_a != kc_b:
        raise ValueError(
            f"key columns differ: {kc_a} vs {kc_b} — "
            "lakes with different keys are not comparable"
        )
    key_cols = kc_b
    common = set(schema_a.names) & set(schema_b.names)
    payload_names = [
        n for n in schema_b.names if n in common and n not in key_cols
    ]
    payload_cols = [c for c in payload_names if columns is None or c in columns]
    if np_a is None or np_a != np_b or salt_a != salt_b:
        # different (or unknown-layout) routes: one side must move — reuse
        # the validate exchange against the LIVE target
        if version_b is not None:
            raise ValueError(
                "layouts differ (or a pre-layout-era snapshot): the exchange "
                "fallback compares against the live target only — rerun "
                "without version_b or reshard to matching layouts first"
            )
        res = validate(
            read_lake(lake_a, version=version_a, as_of=as_of),
            lake_b,
            columns=payload_cols,
            report_path=report_path,
            as_of=as_of,
        )
        return ValidateResult(
            counts=res.counts, report=res.report, seconds=time.perf_counter() - t0
        )
    keep = {*key_cols, *payload_cols}
    wt_cols = [f"{c}{WT_SUFFIX}" for c in payload_cols] + [ROW_WT, DEL_WT]
    full_schema = pa.schema(
        [schema_b.field(n) for n in schema_b.names if n in keep]
    )
    # per-side TTL expiry at the comparison instant (validate's as_of twin);
    # each side's own full payload list drives row liveness
    def _expire_for(m: Manifest, schema: pa.Schema):
        if as_of is None or not m.ttl_enabled:
            return None
        return (int(as_of), [n for n in schema.names if n not in key_cols])

    expire_a = _expire_for(ma, schema_a)
    expire_b = _expire_for(mb, schema_b)
    parts = sorted(set(files_a) | set(files_b))
    report = pd.DataFrame()
    if parts:
        parts_ds = ray.data.from_items(
            [{"part": int(p)} for p in parts], override_num_blocks=len(parts)
        )
        report = parts_ds.map_batches(
            partial(
                _compare_lakes_part,
                lake_a,
                files_a,
                lake_b,
                files_b,
                payload_cols,
                wt_cols,
                full_schema.serialize().to_pybytes(),
                key_cols,
                tuple(mb.counter_cols),
                expire_a,
                expire_b,
            ),
            batch_format="pandas",
            batch_size=None,
        ).to_pandas()
    return _finalize_report(report, key_cols, report_path, t0)


def autocorrect(
    result: ValidateResult,
    lake_dir: str,
    *,
    run_id: str | None = None,
) -> "Any":
    """Turn diff rows into corrective events and replay them (exactly-once).

    MISSING / MISMATCH → upsert the expected payload at fix_wt (beats every
    surviving cell/tombstone); EXTRA → DELETE at fix_wt.  Counter columns are
    additive, so the correction is the DELTA expected − actual (reference
    semantics, cql/statement/TargetUpdateStatement.java:69-76), not the
    expected value verbatim.  event_seq continues above the lake's max
    watermark so watermark filtering never drops a correction.
    """
    from cassandra_data_migrator_ray.pipelines.replay import replay

    manifest = Manifest.load(lake_dir)
    payload_cols = manifest.payload_cols()
    counter_cols = set(manifest.counter_cols)
    rep = result.report
    if rep.empty:
        return None
    base_seq = max([v for v in manifest.watermarks().values()] + [0]) + 1
    ev = pd.DataFrame()
    ev["op"] = np.where(rep["status"] == "EXTRA", "DELETE", "UPSERT")
    for k in manifest.key_cols:
        ev[k] = rep[k]
    for c in payload_cols:
        if f"exp_{c}" not in rep.columns:
            # column was outside a subset validate's compare set → null
            # payload = unset, the lake's current value is preserved
            ev[c] = pd.Series([None] * len(rep), index=rep.index)
            continue
        col = rep[f"exp_{c}"]
        if c in counter_cols:
            exp_n = pd.to_numeric(col, errors="coerce")
            act_n = (
                pd.to_numeric(rep[f"act_{c}"], errors="coerce")
                if f"act_{c}" in rep.columns
                else pd.Series(np.nan, index=rep.index)
            )
            delta = exp_n.fillna(0) - act_n.fillna(0)
            # only emit a delta where either side has a value (null = unset).
            # A NULL-expected / valued-actual counter settles at 0 (delta =
            # −actual); validate treats NULL and 0 as equal for counter
            # columns (compare_part_arrow/compare_group counter_cols), so
            # the correct→validate loop converges in one round.
            col = delta.where(exp_n.notna() | act_n.notna())
        ev[c] = col.where(rep["status"] != "EXTRA")
    ev["writetime"] = rep["fix_wt"].to_numpy(dtype=np.int64)
    ev["event_seq"] = np.arange(base_seq, base_seq + len(rep), dtype=np.int64)
    tbl = pa.Table.from_pandas(ev, preserve_index=False)
    # cast key/payload to the manifest schema types
    fields = [pa.field("op", pa.string())]
    for f in manifest.schema:
        fields.append(f)
    fields += [pa.field("writetime", pa.int64()), pa.field("event_seq", pa.int64())]
    tbl = tbl.select([f.name for f in fields]).cast(pa.schema(fields))
    return replay(tbl, lake_dir, run_id=run_id)
