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


def _resolve_view(
    manifest: Manifest, version: int | None, parts: list[int] | None
) -> tuple[list[str], list[str], list[str], bool, pa.Schema]:
    """(files, key_cols, payload_cols, ttl_enabled, declared_schema) for the
    live view or a time-travel view at a committed ``version``
    (snapshot-pinned file set and SCHEMA — a column added later does not
    appear in an older view)."""
    if version is None:
        return (
            lake_files(manifest, parts),
            list(manifest.key_cols),
            manifest.payload_cols(),
            manifest.ttl_enabled,
            manifest.schema,
        )
    snap = manifest.snapshot(version)
    if snap is None:
        avail = manifest.list_snapshots()
        raise ValueError(
            f"version {version} is not available for time travel at "
            f"{manifest.lake_dir} (available: {avail or 'none'} — older "
            "versions may have been vacuum()ed)"
        )
    from cassandra_data_migrator_ray.state.manifest import schema_from_json

    schema = schema_from_json(snap["schema"])
    key_cols = list(snap["key_cols"])
    items = snap["partitions"].items()
    if parts is not None:
        wanted = {str(p) for p in parts}
        items = [(k, v) for k, v in items if k in wanted]
    files = [
        os.path.join(manifest.lake_dir, f) for _, fl in items for f in fl
    ]
    return (
        files,
        key_cols,
        [n for n in schema.names if n not in key_cols],
        bool(snap.get("ttl_enabled", False)),
        schema,
    )


def _cast_to_declared(tbl: pa.Table, declared: pa.Schema) -> pa.Table:
    """Cast key/payload columns of ``tbl`` to the view's declared types.
    permissive concat unifies mixed narrow/wide file schemas to the WIDEST
    type PRESENT, which still varies with which files a call touched — the
    declared schema is the one stable contract.  FSL columns are left as
    stored (variable lists; see _restore_fsl / sanitize_lists_for_parquet)."""
    for i, name in enumerate(tbl.column_names):
        if name in declared.names:
            want = declared.field(name).type
            if not pa.types.is_fixed_size_list(want) and tbl.column(i).type != want:
                tbl = tbl.set_column(i, name, tbl.column(i).cast(want))
    return tbl


def stats_prune_partitions(
    manifest: Manifest, stats: dict | None, prune: dict
) -> list[int] | None:
    """Partitions that MAY hold rows matching ``prune`` ({col: (lo, hi)};
    None bound = unbounded) according to ANALYZE stats
    (pipelines/maintenance.analyze_lake).  Returns None when stats are
    absent or computed at a different manifest version — the caller then
    scans everything (stale stats must never drop live data).  A partition
    is dropped only when a column's recorded [min, max] provably excludes
    the queried range; columns without a range stat (nested types, huge
    strings, incomparable bounds) never prune."""
    if stats is None or stats.get("version") != manifest.version:
        return None
    keep: list[int] = []
    for p in sorted(manifest.partitions):
        ps = stats.get("partitions", {}).get(str(p), {})
        drop = False
        for col, (qlo, qhi) in prune.items():
            cs = ps.get(col)
            if not cs or cs.get("lo") is None:
                continue
            lo, hi = cs["lo"], cs["hi"]
            try:
                if (qlo is not None and hi < qlo) or (
                    qhi is not None and lo > qhi
                ):
                    drop = True
                    break
            except TypeError:  # incomparable bound types: never prune
                continue
        if not drop:
            keep.append(p)
    return keep


def read_lake(
    lake_dir: str,
    columns: list[str] | None = None,
    include_tombstones: bool = False,
    parts: list[int] | None = None,
    as_of: int | None = None,
    version: int | None = None,
    filter: "object | None" = None,
    prune: dict | None = None,
    where: dict | None = None,
) -> ray.data.Dataset:
    """Public view of the lake as a streaming Dataset (column-pruned read).

    ``filter``: a ``pyarrow.dataset`` expression (e.g.
    ``pyarrow.dataset.field("role") == "user"``) pushed into the parquet
    scan — row groups whose statistics exclude the predicate are never
    read.  Applied before the tombstone filter; filtering on bookkeeping
    columns is not supported through this parameter.

    ``as_of`` (µs): for TTL-enabled lakes, evaluate per-cell expiry at this
    instant (same semantics as :func:`read_lake_pandas`) — expired cells read
    as null and fully-expired rows disappear, per batch, streaming.

    ``version``: time travel — read the lake exactly as of that committed
    manifest version (snapshot-pinned files and schema; copy-on-write keeps
    the old partition files until :meth:`Manifest.vacuum`).

    ``prune``: {col: (lo, hi)} — a PARTITION-level pre-filter using ANALYZE
    statistics (run ``analyze_lake`` first): partitions whose recorded
    column range provably excludes the bounds are never read.  This prunes
    whole partitions only — combine with ``filter=`` for exact row
    semantics.  Live view only; silently scans everything when stats are
    absent or stale.

    ``where``: {col: (lo, hi)} — EXACT range predicate: every layer of
    skipping the engine has, in one knob.  Partitions whose ANALYZE range
    provably excludes the bounds are never read (live view, fresh stats —
    silently skipped otherwise), row groups are pruned by parquet
    statistics, and surviving rows are filtered to the bounds, so the
    result contains exactly the in-range rows (nulls never match, SQL
    comparison semantics).  Composes with ``filter=`` (AND) and works
    under ``version=`` (row filtering only — stats are live-view)."""
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    if where:
        import pyarrow.dataset as pads

        if version is None:
            from cassandra_data_migrator_ray.pipelines.maintenance import (
                load_stats,
            )

            kept = stats_prune_partitions(
                manifest, load_stats(lake_dir), where
            )
            if kept is not None:
                parts = kept if parts is None else sorted(set(parts) & set(kept))
        expr = None
        for col, (qlo, qhi) in where.items():
            for bound, op in ((qlo, "ge"), (qhi, "le")):
                if bound is None:
                    continue
                e = (
                    pads.field(col) >= bound
                    if op == "ge"
                    else pads.field(col) <= bound
                )
                expr = e if expr is None else (expr & e)
        if expr is not None:
            filter = expr if filter is None else (filter & expr)
    if prune:
        if version is not None:
            raise ValueError(
                "prune= applies to the live view only (stats are stamped "
                "to the current manifest version)"
            )
        from cassandra_data_migrator_ray.pipelines.maintenance import load_stats

        kept = stats_prune_partitions(manifest, load_stats(lake_dir), prune)
        if kept is not None:
            parts = kept if parts is None else sorted(set(parts) & set(kept))
    files, v_key_cols, v_payload_cols, v_ttl, v_schema = _resolve_view(
        manifest, version, parts
    )
    public_cols = columns or [*v_key_cols, *v_payload_cols]
    ttl_eval = as_of is not None and v_ttl
    if ttl_eval and filter is not None:
        raise ValueError(
            "filter=/where= cannot combine with TTL evaluation (as_of on a "
            "TTL-enabled lake): the scan predicate would see stored cell "
            "values BEFORE expiry nulls them, returning rows inconsistent "
            "with the public view — filter after the read instead"
        )
    read_cols = None if ttl_eval else list(dict.fromkeys([*public_cols, DELETED]))
    if not files:
        # empty view: surface the RESOLVED VIEW's declared types (the live
        # manifest may have widened a type after the pinned snapshot)
        empty_schema = pa.schema(
            [
                v_schema.field(c)
                if c in v_schema.names
                else pa.field(c, pa.string())
                for c in public_cols
            ]
        )
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=empty_schema))
    ds = ray.data.read_parquet(
        files,
        columns=read_cols,
        **({"filter": filter} if filter is not None else {}),
    )
    # schema-widened lakes keep the narrow physical type in untouched
    # partition files (copy-on-write never rewrites them), so blocks from
    # different files can disagree (int32 vs int64) — align every batch to
    # the view's DECLARED types so consumers (sort, union, export) see one
    # schema.  No-op (and zero-copy) when the batch already matches; FSL
    # columns are deliberately left to the _restore_fsl step below, which
    # runs after the tombstone filter.
    declared_types = {
        f.name: f.type
        for f in v_schema
        if not pa.types.is_fixed_size_list(f.type)
    }

    def _align_declared(t: pa.Table) -> pa.Table:
        for i, name in enumerate(t.column_names):
            want = declared_types.get(name)
            if want is not None and t.column(i).type != want:
                t = t.set_column(i, name, t.column(i).cast(want))
        return t

    ds = ds.map_batches(_align_declared, batch_format="pyarrow")
    if ttl_eval:
        from functools import partial

        from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

        payload = v_payload_cols

        def expire(batch: pd.DataFrame, at: int) -> pd.DataFrame:
            return apply_ttl_expiry(batch, at, payload)

        ds = ds.map_batches(partial(expire, at=as_of), batch_format="pandas")
    if not include_tombstones:
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t[DELETED])).select(public_cols),
            batch_format="pyarrow",
        )
    # VECTOR restore: fixed_size_list columns are stored as variable lists
    # (parquet cannot hold FSL nulls — schema.sanitize_lists_for_parquet);
    # cast back so the public Dataset surfaces the DECLARED type
    fsl_fields = [
        (c, manifest.schema.field(c).type)
        for c in public_cols
        if c in manifest.schema.names
        and pa.types.is_fixed_size_list(manifest.schema.field(c).type)
    ]
    if fsl_fields:

        def _restore_fsl(t: pa.Table) -> pa.Table:
            for c, typ in fsl_fields:
                if c in t.column_names and t.column(c).type != typ:
                    t = t.set_column(
                        t.column_names.index(c), c, t.column(c).cast(typ)
                    )
            return t

        ds = ds.map_batches(_restore_fsl, batch_format="pyarrow")
    return ds


def _cdf_glob(lake_dir: str, run_id: str) -> list[str]:
    """The ONE place the feed-file naming scheme is globbed (it is written by
    stages/merge._write_cdf and parsed by manifest._partfile_run_id)."""
    import glob as _glob

    return sorted(
        _glob.glob(os.path.join(lake_dir, "cdf", f"part-*-{run_id}.parquet"))
    )


def _resolve_cdf(
    lake_dir: str, run_id: str | None, version: int | None
) -> tuple[Manifest, str, list[str]]:
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    committed = {r["run_id"]: r for r in manifest.runs}
    if run_id is None:
        if version is not None:
            match = [r for r in manifest.runs if r.get("version") == version]
            if not match:
                raise ValueError(
                    f"no committed run at version {version} in {lake_dir}"
                )
            run_id = match[0]["run_id"]
        elif manifest.runs:
            run_id = manifest.runs[-1]["run_id"]
        else:
            raise ValueError(f"lake {lake_dir} has no committed runs")
    if run_id not in committed:
        raise ValueError(
            f"run {run_id} is not committed in {lake_dir} — its change feed "
            "is not readable (uncommitted/crashed runs are invisible)"
        )
    return manifest, run_id, _cdf_glob(lake_dir, run_id)


def _empty_cdf_frame(manifest: Manifest) -> pd.DataFrame:
    from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

    cols = [*manifest.key_cols, *manifest.payload_cols(), CHANGE_COL]
    return pd.DataFrame(columns=cols)


def _empty_cdf_table(manifest: Manifest, with_version: bool = False) -> pa.Table:
    """Typed empty feed (an empty pandas block loses its columns through the
    Dataset round-trip; an Arrow schema survives)."""
    from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

    fields = [
        manifest.schema.field(n)
        for n in (*manifest.key_cols, *manifest.payload_cols())
        if n in manifest.schema.names
    ]
    fields.append(pa.field(CHANGE_COL, pa.string()))
    if with_version:
        fields.append(pa.field("_commit_version", pa.int64()))
    return pa.Table.from_pylist([], schema=pa.schema(fields))


def read_changes(
    lake_dir: str,
    run_id: str | None = None,
    version: int | None = None,
    since_version: int | None = None,
    until_version: int | None = None,
) -> ray.data.Dataset:
    """The change-data-feed of one committed run as a streaming Dataset:
    what that replay actually changed (``_change_type`` ∈ insert /
    update_preimage / update_postimage / delete; LWW losers emit nothing).
    Written only when the run used ``replay(..., emit_changes=True)``.
    Select the run by ``run_id``, by committed ``version``, or default to the
    latest run.

    ``since_version`` (exclusive) selects a RANGE of commits instead — the
    feeds of every run committed after it (up to ``until_version``,
    inclusive, default latest), each row tagged with its
    ``_commit_version`` so a downstream replica can apply them in commit
    order (``apply_changes`` does this grouping itself when it sees the
    column).  The range is verified complete: a replay in the span that ran
    without emit_changes, or whose feed files were pruned by retention /
    vacuum, raises instead of silently skipping commits (the replica would
    diverge) — re-seed the replica from ``read_lake(version=...)`` instead."""
    if since_version is not None:
        if run_id is not None or version is not None:
            raise ValueError(
                "pass either run_id/version (single-run feed) or "
                "since_version/until_version (ranged feed), not both"
            )
        manifest = Manifest.load(lake_dir)
        if manifest is None:
            raise FileNotFoundError(f"no manifest at {lake_dir}")
        span = sorted(
            (
                r
                for r in manifest.runs
                if r.get("version", 0) > since_version
                and (
                    until_version is None
                    or r.get("version", 0) <= until_version
                )
            ),
            key=lambda r: r.get("version", 0),
        )
        by_version: dict[int, list[str]] = {}
        for r in span:
            if r.get("type") in ("compact", "reshard", "alter"):
                # maintenance commits never change live row content
                # (tombstone GC / placement / schema DDL) — nothing for a
                # replica to apply; renames/drops in the span are threaded
                # through the era-name mapping below instead
                continue
            if not r.get("partitions"):
                continue  # no-op commit (nothing merged) — nothing to apply
            files = _cdf_glob(lake_dir, r["run_id"])
            recorded = r.get("cdf_files")
            if recorded is not None and len(files) < recorded:
                raise ValueError(
                    f"change feed of run {r['run_id']} (version "
                    f"{r.get('version')}) was pruned by retention/vacuum "
                    f"({len(files)} of {recorded} files remain) — the range "
                    "since_version="
                    f"{since_version} cannot be reconstructed; re-seed the "
                    "replica from read_lake(version=...)"
                )
            if not r.get("emit_changes", False) and not files:
                raise ValueError(
                    f"run {r['run_id']} (version {r.get('version')}) in the "
                    "requested range did not emit a change feed "
                    "(emit_changes was off) — the range is incomplete; "
                    "re-seed the replica from read_lake(version=...)"
                )
            if files:
                by_version[r["version"]] = files
        if not by_version:
            return ray.data.from_arrow(_empty_cdf_table(manifest, True))
        import numpy as np

        # ALTER chain: a feed file written before a rename/drop carries that
        # ERA's column names.  Map every era name forward onto the CURRENT
        # declared name (or to nothing, if a later ALTER dropped it) so a
        # span crossing an ALTER unions cleanly and apply_changes lands the
        # values in the current schema — without this, a renamed column
        # would surface twice (old and new name, each half-null) and the
        # replica would silently diverge from read_lake().
        alters = sorted(
            (r for r in manifest.runs if r.get("type") == "alter"),
            key=lambda r: r.get("version", 0),
        )

        def _forward(name: str, feed_version: int) -> str | None:
            for a in alters:
                if a.get("version", 0) <= feed_version:
                    continue
                if name in (a.get("drop") or []):
                    return None  # dropped after this feed: values are dead
                name = (a.get("rename") or {}).get(name, name)
            return name

        # one unified schema across the span: a run may additively evolve
        # the payload, and Ray's union does not reconcile block schemas.
        # Key/payload columns take the manifest's DECLARED type (a later run
        # may have widened it — first-seen would cast newer wide feed files
        # down and fail the safe cast on genuinely wide values); bookkeeping
        # columns keep their first-seen type.
        fields: dict[str, pa.Field] = {}
        declared = {f.name: f for f in manifest.schema}
        for v, fs in by_version.items():
            for f in pq.read_schema(fs[0]):
                cur = _forward(f.name, v)
                if cur is not None:
                    fields.setdefault(cur, declared.get(cur, f.with_name(cur)))
        unified = pa.schema(list(fields.values())).append(
            pa.field("_commit_version", pa.int64())
        )

        def _tag(v):
            def f(t: pa.Table) -> pa.Table:
                era = {
                    cur: n
                    for n in t.column_names
                    if (cur := _forward(n, v)) is not None
                }
                cols = []
                for fld in unified:
                    if fld.name == "_commit_version":
                        cols.append(
                            pa.array(np.full(t.num_rows, v, dtype=np.int64))
                        )
                    elif fld.name in era:
                        cols.append(t.column(era[fld.name]).cast(fld.type))
                    else:
                        cols.append(pa.nulls(t.num_rows, fld.type))
                return pa.Table.from_arrays(cols, schema=unified)

            return f

        parts = [
            ray.data.read_parquet(fs).map_batches(
                _tag(v), batch_format="pyarrow"
            )
            for v, fs in sorted(by_version.items())
        ]
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if until_version is not None:
        raise ValueError("until_version requires since_version")
    manifest, run_id, files = _resolve_cdf(lake_dir, run_id, version)
    if not files:
        return ray.data.from_arrow(_empty_cdf_table(manifest))
    return ray.data.read_parquet(files)


def read_changes_pandas(
    lake_dir: str, run_id: str | None = None, version: int | None = None
) -> pd.DataFrame:
    """Driver-side change feed — tests and small runs only."""
    manifest, run_id, files = _resolve_cdf(lake_dir, run_id, version)
    if not files:
        return _empty_cdf_frame(manifest)
    from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    df = tbl.to_pandas()
    return df.sort_values(
        [*manifest.key_cols, CHANGE_COL], kind="mergesort", ignore_index=True
    )


def apply_changes(
    prior: pd.DataFrame, feed: pd.DataFrame, key_cols: list[str]
) -> pd.DataFrame:
    """Materialize a downstream replica: apply a committed change feed onto
    the replica's prior state.  Inserts and update postimages upsert,
    deletes remove, preimages are ignored — so
    ``apply_changes(state@v_{n-1}, feed(run_n)) == state@v_n`` (the invariant
    the cdc_changes gate verifies end-to-end).

    A ranged feed (carrying ``_commit_version`` from
    ``read_changes(since_version=...)``) is applied one commit at a time in
    version order — applying commits out of order or flattened would e.g.
    resurrect a key inserted at v_n and deleted at v_{n+1}."""
    from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

    if "_commit_version" in feed.columns:
        out = prior
        for v in sorted(feed["_commit_version"].unique()):
            out = apply_changes(
                out,
                feed[feed["_commit_version"] == v].drop(
                    columns="_commit_version"
                ),
                key_cols,
            )
        return out

    post = feed[feed[CHANGE_COL].isin(["insert", "update_postimage"])].drop(
        columns=CHANGE_COL
    )
    gone = pd.concat(
        [post[key_cols], feed[feed[CHANGE_COL] == "delete"][key_cols]]
    ).drop_duplicates()
    if len(prior) and len(gone):
        kept = prior.merge(gone, on=key_cols, how="left", indicator=True)
        kept = kept[kept["_merge"] == "left_only"].drop(columns="_merge")
    else:
        kept = prior
    # column set = prior ∪ feed: a run that additively evolved the schema
    # carries the new column in its feed, and untouched prior rows read it as
    # null — the same backfill the lake's own read side applies
    cols = list(prior.columns) + [
        c for c in post.columns if c not in prior.columns
    ]
    out = pd.concat(
        [kept.reindex(columns=cols), post.reindex(columns=cols)],
        ignore_index=True,
    )
    return out.sort_values(key_cols, kind="mergesort", ignore_index=True)


def apply_changes_aggregate(
    agg: pd.DataFrame,
    feed: pd.DataFrame,
    group_cols: list[str],
    count_col: str = "n_rows",
    sums: dict | None = None,
) -> pd.DataFrame:
    """Incrementally maintain a grouped aggregate (materialized view) from a
    change feed, without touching base data: inserts add, deletes subtract
    preimage values, updates contribute postimage − preimage — so
    ``apply_changes_aggregate(agg@v_{n-1}, feed(run_n)) == agg@v_n``
    recomputed from scratch, at cost proportional to the CHANGES, not the
    lake (the whole point of pre/post image pairs in the feed).

    ``agg`` holds one row per ``group_cols`` value with ``count_col``
    (COUNT(*)) and each ``sums`` output column ({out: feed column}; derive
    computed measures onto the feed first — it is changes-sized).  Null
    measure values contribute 0 (SQL SUM-ignores-nulls semantics, with
    empty-group sums reading 0, not NULL).  Groups whose count reaches 0
    disappear.  Ranged feeds apply per commit in version order."""
    import numpy as np

    from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

    sums = dict(sums or {})
    if "_commit_version" in feed.columns:
        out = agg
        for v in sorted(feed["_commit_version"].unique()):
            out = apply_changes_aggregate(
                out,
                feed[feed["_commit_version"] == v].drop(
                    columns="_commit_version"
                ),
                group_cols,
                count_col,
                sums,
            )
        return out
    if not len(feed):
        return agg.copy()
    sign = feed[CHANGE_COL].map(
        {
            "insert": 1,
            "delete": -1,
            "update_postimage": 1,
            "update_preimage": -1,
        }
    ).astype(np.int64)
    d = feed[group_cols].copy()
    d["__cnt"] = np.where(
        feed[CHANGE_COL].isin(["insert", "delete"]), sign, 0
    )
    for out_col, src in sums.items():
        d[out_col] = sign * feed[src].fillna(0).to_numpy()
    # dropna=False: a nullable group column must keep its null group — the
    # pandas default silently drops those feed rows and the maintained
    # aggregate diverges from a full recompute (SQL GROUP BY keeps nulls)
    deltas = d.groupby(group_cols, sort=False, dropna=False).sum().reset_index()
    cols = [count_col, *sums]
    base = (
        agg.set_index(group_cols)
        if len(agg)
        else pd.DataFrame(columns=cols, index=pd.MultiIndex.from_arrays(
            [[] for _ in group_cols], names=group_cols
        ) if len(group_cols) > 1 else pd.Index([], name=group_cols[0]))
    )
    deltas = deltas.rename(columns={"__cnt": count_col}).set_index(group_cols)
    merged = base.reindex(columns=cols).add(
        deltas.reindex(columns=cols), fill_value=0
    )
    merged[count_col] = merged[count_col].astype(np.int64)
    if (merged[count_col] < 0).any():
        raise ValueError(
            "negative group count after applying feed — feed applied out of "
            "order or against the wrong base aggregate"
        )
    merged = merged[merged[count_col] > 0].reset_index()
    return merged.sort_values(group_cols, kind="mergesort", ignore_index=True)


def _coerce_key_tuple(manifest: Manifest, t: tuple) -> tuple:
    """Cast lookup key components to the manifest's declared key types so
    string-sourced keys (CLI args, JSON) match integer columns and digit-like
    strings are NOT mis-coerced when the column really is a string."""
    out = []
    for i, v in enumerate(t):
        if i >= len(manifest.key_cols):
            out.append(v)
            continue
        name = manifest.key_cols[i]
        typ = (
            manifest.schema.field(name).type
            if name in manifest.schema.names
            else None
        )
        if typ is not None and pa.types.is_integer(typ) and isinstance(v, str):
            try:
                v = int(v)
            except ValueError:
                pass
        elif typ is not None and pa.types.is_string(typ) and not isinstance(v, str):
            v = str(v)
        out.append(v)
    return tuple(out)


def lookup(
    lake_dir: str,
    key_values: list,
    columns: list[str] | None = None,
    as_of: int | None = None,
    version: int | None = None,
) -> pd.DataFrame:
    """Point lookup by primary-key prefix — the reference's target SELECT by
    PK (cql/statement/TargetSelectByPKStatement.java:45-78), re-expressed as
    hash-partition pruning instead of an RPC: route each first-key value to
    its candidate partitions (≤ salt of them), read only those partitions'
    files with a parquet predicate on the key column, and return the live
    public rows.

    ``key_values`` is a list of first-key-component values (e.g. conv_ids),
    or a list of full-key tuples — the extra components are applied as an
    exact row filter after the partition-pruned read.  Driver-sized output
    (point lookups return few rows); use :func:`read_lake` for scans.
    """
    import pyarrow.compute as pc

    from cassandra_data_migrator_ray.state.partitioning import candidate_partitions

    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    key_cols = list(manifest.key_cols)
    tuples = [
        tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in key_values
    ]
    tuples = [_coerce_key_tuple(manifest, t) for t in tuples]
    firsts = [t[0] for t in tuples]
    # prune with the LAYOUT OF THE VIEW being read: a reshard changes
    # (num_parts, salt), so a time-travel lookup must route with the layout
    # recorded in that version's snapshot, not the live manifest's.  A
    # snapshot WITHOUT layout keys (written by an older engine) has an
    # unknown layout — if a reshard happened after it, routing with the
    # live layout would prune the wrong partitions and silently miss rows,
    # so skip pruning entirely and scan every snapshot partition instead.
    np_, salt_ = manifest.num_parts, manifest.salt
    layout_known = True
    if version is not None:
        snap = manifest.snapshot(version)
        if snap is not None:
            if "num_parts" in snap:
                np_, salt_ = int(snap["num_parts"]), int(snap.get("salt", 1))
            else:
                layout_known = False
    if layout_known:
        cand = candidate_partitions(firsts, np_, salt_)
        parts = sorted({p for ps in cand.values() for p in ps})
    else:
        parts = None
    files, v_key_cols, v_payload_cols, v_ttl, _v_schema = _resolve_view(
        manifest, version, parts
    )
    key_cols = v_key_cols
    public_cols = columns or [*key_cols, *v_payload_cols]
    if not files:
        return pd.DataFrame(columns=public_cols)
    ttl_eval = as_of is not None and v_ttl
    # the TTL path needs every bookkeeping column (c__ttlx/__row_ttlx) to
    # evaluate expiry, so it reads whole rows; otherwise prune to the ask
    read_cols = (
        None
        if ttl_eval
        else list(dict.fromkeys([*key_cols, *public_cols, DELETED]))
    )
    want_first = list(dict.fromkeys(firsts))
    # per-file reads (schema-evolved lakes mix file schemas — a dataset over
    # mixed fragments would reject columns absent from the first one) with a
    # row-group-pruned key predicate pushed into each read
    tables = []
    for f in files:
        fschema = pq.read_schema(f)
        cols = (
            None
            if read_cols is None
            else [c for c in read_cols if c in fschema.names]
        )
        tables.append(
            pq.read_table(
                f, columns=cols, filters=[(key_cols[0], "in", want_first)]
            )
        )
    # "permissive" unifies mixed physical types across schema-evolved files
    # (a widened lake keeps narrow types in untouched partitions); then pin
    # to the DECLARED types so the dtype never flaps with data placement
    tbl = _cast_to_declared(
        pa.concat_tables(tables, promote_options="permissive"), _v_schema
    )
    df = tbl.to_pandas()
    if ttl_eval:
        from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

        df = apply_ttl_expiry(df, as_of, v_payload_cols)
    for c in public_cols:  # evolved columns absent from EVERY read file
        if c not in df.columns:
            df[c] = None
    df = df[~df[DELETED].to_numpy(dtype=bool)]
    if any(len(t) > 1 for t in tuples):
        # each lookup tuple matches rows whose key PREFIX of the same length
        # equals it; group by tuple length so mixed-width lookups compose
        import numpy as np

        mask = np.zeros(len(df), dtype=bool)
        by_len: dict[int, set] = {}
        for t in tuples:
            by_len.setdefault(len(t), set()).add(t)
        for ln, want in by_len.items():
            if ln == 1:
                mask |= df[key_cols[0]].isin([t[0] for t in want]).to_numpy()
            else:
                prefix = pd.Series(
                    list(zip(*(df[c] for c in key_cols[:ln]))), index=df.index
                )
                mask |= prefix.isin(want).to_numpy()
        df = df[mask]
    return (
        df[public_cols]
        .sort_values(key_cols if set(key_cols) <= set(public_cols) else public_cols[:1],
                     kind="mergesort", ignore_index=True)
    )


class _OrderedFilenames:
    """Filenames whose lexicographic order equals the dataset's block order,
    so a globally sorted dataset written through this provider reads back in
    global order by sorting the file list.  ``token`` is the export's own
    identity: the caller globs ``sorted-{token}-*`` so leftover files from a
    prior or crashed export in the same directory can never interleave into
    (or duplicate within) the returned ordered list."""

    def __init__(self, token: str):
        self.token = token

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        # write_uuid is constant within one export, so lexicographic order is
        # still (task, block); Ray requires it in the name to prevent a
        # concurrent write from overwriting these files
        return (
            f"sorted-{self.token}-{write_uuid}-"
            f"{task_index:06d}-{block_index:06d}.parquet"
        )

    def get_filename_for_row(self, row, write_uuid, task_index, block_index, row_index):
        raise NotImplementedError


def export_sorted(
    lake_dir: str,
    out_dir: str,
    by: list[str] | None = None,
    descending: bool = False,
    columns: list[str] | None = None,
    version: int | None = None,
) -> list[str]:
    """Globally ORDER-BY-sorted export of the lake's public view — the
    handoff format for order-sensitive consumers (sequential training-data
    readers, merge-join inputs).  The reference has no data sorts at all
    (SURVEY §2.7); here Ray Data's distributed range-partitioned sort does
    the exchange and each output file is written by the task that owns its
    key range, so no single node ever holds the table.  Output filenames
    encode (task, block) order: reading the returned file list in order
    yields the exact global ORDER BY ``by`` sequence.  Returns the ordered
    file list."""
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    by = list(by) if by else list(manifest.key_cols)
    ds = read_lake(lake_dir, columns=columns, version=version)
    import uuid as _uuid

    token = _uuid.uuid4().hex[:12]
    ds.sort(by, descending=descending).write_parquet(
        out_dir, filename_provider=_OrderedFilenames(token)
    )
    import glob as _glob

    return sorted(_glob.glob(os.path.join(out_dir, f"sorted-{token}-*.parquet")))


def read_lake_pandas(
    lake_dir: str,
    include_tombstones: bool = False,
    internal: bool = False,
    as_of: int | None = None,
    version: int | None = None,
) -> pd.DataFrame:
    """Driver-side full read — tests and small lakes only.

    ``as_of`` (µs): for TTL-enabled lakes, evaluate per-cell expiry at this
    instant — expired cells read as null, fully-expired rows disappear.

    ``version``: time travel — the lake exactly as of that committed version."""
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    files, key_cols, payload_cols, ttl_enabled, _schema = _resolve_view(
        manifest, version, None
    )
    if not files:
        return pd.DataFrame(columns=[*key_cols, *payload_cols])
    # "permissive" unifies mixed physical types across schema-evolved files
    # (a widened lake keeps narrow types in untouched partitions); then pin
    # to the DECLARED types so the dtype never flaps with data placement
    tbl = _cast_to_declared(
        pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        ),
        _schema,
    )
    df = tbl.to_pandas()
    if as_of is not None and ttl_enabled:
        from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

        df = apply_ttl_expiry(df, as_of, payload_cols)
    if not include_tombstones:
        df = df[~df[DELETED].to_numpy(dtype=bool)]
    if not internal:
        df = df[[*key_cols, *payload_cols]]
    return df.sort_values(key_cols, kind="mergesort", ignore_index=True)
