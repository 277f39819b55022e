"""Per-partition merge-and-write: the single-writer reducer.

One invocation per lake partition group (after the hash shuffle): merge the
incoming partial states with the partition's current on-disk state
(merge-on-read), write the new partition file copy-on-write, drop a staging
receipt, and return a one-row metrics frame (the JobCounter analogue,
/root/reference src/main/java/com/datastax/cdm/job/JobCounter.java:85-97).

Exactly-once under Ray task retries: the output filename is deterministic
(part-K-run_id), written tmp + atomic rename, and only manifest-referenced
files are ever read — a duplicated write is byte-identical and harmless
(SURVEY.md §7.3 "hard parts").
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cassandra_data_migrator_ray.functions.lww import (
    compact_tombstones,
    merge_state_frames,
)
from cassandra_data_migrator_ray.schema import (
    DELETED,
    MAX_SEQ,
    state_schema,
)
from cassandra_data_migrator_ray.stages.normalize import PART_COL

METRICS_COLUMNS = [
    "part",
    "rows",
    "tombstones",
    "keys_in",
    "watermark",
    "status",
    "file",
    "seconds",
]


@dataclass
class MergeConfig:
    lake_dir: str
    run_id: str
    payload_cols: list[str]
    payload_schema_json: list[list[str]]  # manifest.schema_to_json form
    counter_cols: tuple[str, ...] = ()
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    ttl_enabled: bool = False
    compact: bool = False  # drop all tombstones (stream fully drained)
    grace_wt: int | None = None  # else drop tombstones older than this watermark
    emit_changes: bool = False  # write a per-run change-data-feed (cdf/)
    prior_files: dict[int, list[str]] = field(default_factory=dict)
    prior_watermarks: dict[int, int] = field(default_factory=dict)
    # fault-injection hook (tests only): when set, ONE stage-2 task kills its
    # worker process before writing any receipt (stages/staging.py
    # _chaos_crash_once) so Ray's real task retry exercises the
    # exactly-once protocol; ignored by the groupby-shuffle merge path
    chaos_dir: str | None = None


# ---- change-data-feed (CDC out) ---------------------------------------------
# Per-run changelog of what the merge actually changed (Delta-CDF-shaped):
# one row per net insert/delete, a preimage+postimage pair per net update —
# events that lost LWW to existing state emit nothing.  Files are written
# per-partition under cdf/ with deterministic names (retry overwrites), become
# visible only when the run commits, and are pruned with vacuum().

CDF_DIR = "cdf"
CHANGE_COL = "_change_type"


def _cdf_schema(cfg: MergeConfig) -> pa.Schema:
    from cassandra_data_migrator_ray.state.manifest import schema_from_json

    pub = schema_from_json(cfg.payload_schema_json)
    cols = [*cfg.key_cols, *cfg.payload_cols]
    return pa.schema(
        [pub.field(n) for n in cols if n in pub.names]
        + [pa.field(CHANGE_COL, pa.string())]
    )


def _compute_changes(
    cfg: MergeConfig,
    old: pd.DataFrame | None,
    state: pd.DataFrame,
    touched: pd.DataFrame,
) -> pd.DataFrame:
    """Classify each key touched by this run against the prior state.

    insert: was absent or tombstoned, now live.  delete: was live, now
    tombstoned (preimage payload).  update: live on both sides with any
    null-safe payload difference (preimage + postimage rows).  Must run
    BEFORE tombstone compaction (a compacted-away tombstone is a delete)."""
    import numpy as np

    from cassandra_data_migrator_ray.stages.validate import _null_safe_ne

    keys = list(cfg.key_cols)
    payload = list(cfg.payload_cols)
    cols = keys + payload + [DELETED]
    new_side = touched.merge(state[cols], on=keys, how="left")
    new_live = ~(
        new_side[DELETED].astype("boolean").fillna(True).to_numpy(dtype=bool)
    )
    if old is None or not len(old):
        out = new_side.loc[new_live, keys + payload].copy()
        out[CHANGE_COL] = "insert"
        return out
    old_side = touched.merge(old[cols], on=keys, how="left", indicator=True)
    old_live = (old_side["_merge"] == "both").to_numpy() & ~(
        old_side[DELETED].astype("boolean").fillna(True).to_numpy(dtype=bool)
    )
    ne = np.zeros(len(touched), dtype=bool)
    for c in payload:
        ne |= _null_safe_ne(
            pa.Array.from_pandas(new_side[c]), pa.Array.from_pandas(old_side[c])
        )
    ins = new_side.loc[~old_live & new_live, keys + payload].copy()
    ins[CHANGE_COL] = "insert"
    upd = old_live & new_live & ne
    pre = old_side.loc[upd, keys + payload].copy()
    pre[CHANGE_COL] = "update_preimage"
    post = new_side.loc[upd, keys + payload].copy()
    post[CHANGE_COL] = "update_postimage"
    dele = old_side.loc[old_live & ~new_live, keys + payload].copy()
    dele[CHANGE_COL] = "delete"
    out = pd.concat([ins, pre, post, dele], ignore_index=True)
    return out.sort_values(
        keys + [CHANGE_COL], kind="mergesort", ignore_index=True
    )


def _write_cdf(
    cfg: MergeConfig, part: int, changes: "pd.DataFrame | pa.Table"
) -> str | None:
    n = changes.num_rows if isinstance(changes, pa.Table) else len(changes)
    if not n:
        return None
    rel = os.path.join(CDF_DIR, f"part-{part:05d}-{cfg.run_id}.parquet")
    path = os.path.join(cfg.lake_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    schema = _cdf_schema(cfg)
    tbl = (
        changes
        if isinstance(changes, pa.Table)
        else pa.Table.from_pandas(changes, preserve_index=False)
    )
    tbl = tbl.select(schema.names).cast(schema)
    from cassandra_data_migrator_ray.schema import write_parquet_atomic

    write_parquet_atomic(tbl, path)
    return rel


def _arrow_state_schema(cfg: MergeConfig) -> pa.Schema:
    from cassandra_data_migrator_ray.state.manifest import schema_from_json

    return state_schema(
        schema_from_json(cfg.payload_schema_json),
        list(cfg.key_cols),
        ttl=cfg.ttl_enabled,
    )


def read_partition_state(cfg: MergeConfig, part: int) -> pd.DataFrame | None:
    files = cfg.prior_files.get(part) or []
    if not files:
        return None
    tables = [pq.read_table(os.path.join(cfg.lake_dir, f)) for f in files]
    tbl = pa.concat_tables(tables, promote_options="default")
    from cassandra_data_migrator_ray.schema import align_to_schema

    aligned = align_to_schema(tbl, _arrow_state_schema(cfg))
    # KEY/PAYLOAD integer columns must not round-trip through float64 (silent
    # precision loss past 2^53 on counters/bigints with nulls) — read them as
    # pandas nullable Int dtypes.  Bookkeeping columns (c__wt/__row_wt/…) stay
    # on the default path: they are int64 sentinel-filled (never NA) and every
    # sentinel (±2^63, NO_EXPIRY) is exactly float64-representable anyway.
    data_cols = [
        c
        for c in (*cfg.key_cols, *cfg.payload_cols)
        if c in aligned.column_names
        and pa.types.is_integer(aligned.schema.field(c).type)
    ]
    pdf = aligned.drop_columns(data_cols).to_pandas()
    if data_cols:
        mapper = {
            pa.int64(): pd.Int64Dtype(),
            pa.int32(): pd.Int32Dtype(),
            pa.int16(): pd.Int16Dtype(),
            pa.int8(): pd.Int8Dtype(),
        }
        ints = aligned.select(data_cols).to_pandas(types_mapper=mapper.get)
        for c in data_cols:
            pdf[c] = ints[c]
    return pdf


def read_partition_state_arrow(cfg: MergeConfig, part: int) -> "pa.Table | None":
    """Arrow twin of :func:`read_partition_state`: the partition's prior state
    aligned to the current state schema, never converted to pandas — feeds
    :func:`merge_state_tables_arrow` so the incremental (steady-state CDC)
    merge is Arrow end-to-end.  Schema-evolved fragments' bookkeeping nulls
    are sentinel-filled by the merge kernel, not here."""
    files = cfg.prior_files.get(part) or []
    if not files:
        return None
    tables = [
        pq.read_table(os.path.join(cfg.lake_dir, f), use_threads=False)
        for f in files
    ]
    tbl = pa.concat_tables(tables, promote_options="default")
    from cassandra_data_migrator_ray.schema import align_to_schema

    return align_to_schema(tbl, _arrow_state_schema(cfg))


def _compute_changes_arrow(
    cfg: MergeConfig,
    old: "pa.Table | None",
    state: "pa.Table",
    touched: "pa.Table",
) -> "pa.Table":
    """Arrow twin of :func:`_compute_changes` (same classification contract,
    same output ordering): touched keys are matched between prior and merged
    state via joint compact key codes + searchsorted alignment; payload
    difference uses the validate comparator's null-safe kernel.  ``touched``
    is any table carrying the increment's key columns (≤1 row per key)."""
    import numpy as np

    import pyarrow.compute as pc

    from cassandra_data_migrator_ray.stages.validate import _null_safe_ne

    keys, payload = list(cfg.key_cols), list(cfg.payload_cols)
    cols = [*keys, *payload]
    n_s = state.num_rows
    n_o = old.num_rows if old is not None else 0
    sort_keys = [(k, "ascending") for k in (*keys, CHANGE_COL)]
    n_t = touched.num_rows
    ids = np.zeros(n_s + n_o + n_t, dtype=np.int64)
    for k in keys:
        chunks = [
            *state.column(k).chunks,
            *(old.column(k).chunks if n_o else ()),
            *touched.column(k).chunks,
        ]
        joint = pa.chunked_array(chunks)
        if pa.types.is_integer(joint.type):
            raw = (
                pc.fill_null(pc.cast(joint, pa.int64()), np.iinfo(np.int64).min)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        else:
            enc = pc.dictionary_encode(joint).combine_chunks()
            raw = np.nan_to_num(
                enc.indices.to_numpy(zero_copy_only=False), nan=-1
            ).astype(np.int64)
        _, inv = np.unique(raw, return_inverse=True)
        card = int(inv.max()) + 1 if len(inv) else 1
        ids = ids * card + inv
        # re-compact after EVERY column: keeps ids < row count, so the next
        # fold step is bounded by n·card — no silent int64 overflow however
        # many key columns / distinct values a partition carries
        _, ids = np.unique(ids, return_inverse=True)
    s_ids, o_ids, t_ids = ids[:n_s], ids[n_s : n_s + n_o], ids[n_s + n_o :]
    tset = np.unique(t_ids)
    s_rows = np.flatnonzero(np.isin(s_ids, tset))
    o_rows = np.flatnonzero(np.isin(o_ids, tset))
    so = np.argsort(s_ids[s_rows], kind="stable")
    s_rows = s_rows[so]
    # merged state contains every key of old ∪ increment, so each touched
    # old key has exactly one aligned position in the sorted new side
    pos = np.searchsorted(s_ids[s_rows], o_ids[o_rows])
    idx_old = np.full(len(s_rows), -1, dtype=np.int64)
    idx_old[pos] = o_rows
    old_present = idx_old >= 0
    new_take = pa.array(s_rows, pa.int64())
    new_live = ~(
        pc.fill_null(pc.take(state[DELETED], new_take), True)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    if n_o:
        old_take = pa.array(
            np.clip(idx_old, 0, None), pa.int64(), mask=~old_present
        )
        old_live = old_present & ~(
            pc.fill_null(pc.take(old[DELETED], old_take), True)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        ne = np.zeros(len(s_rows), dtype=bool)
        for c in payload:
            ne |= _null_safe_ne(
                pc.take(state.column(c), new_take), pc.take(old.column(c), old_take)
            )
    else:
        old_live = np.zeros(len(s_rows), dtype=bool)
        ne = np.zeros(len(s_rows), dtype=bool)
    ins_m = new_live & ~old_live
    upd_m = new_live & old_live & ne
    del_m = old_live & ~new_live

    def _sel(tbl: pa.Table, rows: np.ndarray, mask: np.ndarray, label: str) -> pa.Table:
        t = tbl.select(cols).take(pa.array(rows[mask], pa.int64()))
        return t.append_column(
            CHANGE_COL, pa.array([label] * t.num_rows, pa.string())
        )

    parts = []
    if ins_m.any():
        parts.append(_sel(state, s_rows, ins_m, "insert"))
    if upd_m.any():
        parts.append(_sel(old, idx_old, upd_m, "update_preimage"))
        parts.append(_sel(state, s_rows, upd_m, "update_postimage"))
    if del_m.any():
        parts.append(_sel(old, idx_old, del_m, "delete"))
    if not parts:
        return pa.table(
            {
                **{c: state.column(c).slice(0, 0) for c in cols},
                CHANGE_COL: pa.array([], pa.string()),
            }
        )
    out = pa.concat_tables(parts)
    return out.take(pc.sort_indices(out, sort_keys=sort_keys))


def write_partition_state(cfg: MergeConfig, part: int, state: pd.DataFrame) -> str:
    rel = os.path.join("data", f"part-{part:05d}-{cfg.run_id}.parquet")
    path = os.path.join(cfg.lake_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out_schema = _arrow_state_schema(cfg)
    tbl = pa.Table.from_pandas(state, preserve_index=False)
    tbl = tbl.select(out_schema.names).cast(out_schema)
    from cassandra_data_migrator_ray.schema import write_parquet_atomic

    write_parquet_atomic(tbl, path)
    return rel


def merge_partition_group(cfg: MergeConfig, group: pd.DataFrame) -> pd.DataFrame:
    """UDF for ``groupby(PART_COL).map_groups`` — group in, metrics row out.

    Stateless across groups (all state is on disk + in cfg), so Ray may run it
    as elastic tasks; bind cfg with ``functools.partial`` (cfg is
    partition-metadata-sized, never row data).
    """
    import time as _time

    _t0 = _time.perf_counter()
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)  # one Ray task == one CPU (no pool oversubscription)
    part = int(group[PART_COL].iloc[0])
    partials = group.drop(columns=[PART_COL])

    # resume: a receipt from this run means the partition is already merged —
    # check BEFORE folding (the fold is the dominant cost of the task)
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

    if "op" in partials.columns:
        # raw-event representation (prefold=False): fold here in the reducer
        from cassandra_data_migrator_ray.functions.lww import fold_events

        partials = fold_events(
            partials,
            list(cfg.key_cols),
            cfg.payload_cols,
            cfg.counter_cols,
            ttl=cfg.ttl_enabled,
        )
    frames = [partials]
    old = read_partition_state(cfg, part)
    if old is not None and len(old):
        frames.append(old)
    state = merge_state_frames(
        frames,
        list(cfg.key_cols),
        cfg.payload_cols,
        cfg.counter_cols,
        ttl=cfg.ttl_enabled,
    )
    cdf_rel = None
    if cfg.emit_changes:
        touched = partials[list(cfg.key_cols)].drop_duplicates(ignore_index=True)
        cdf_rel = _write_cdf(
            cfg, part, _compute_changes(cfg, old, state, touched)
        )
    if cfg.compact:
        state = compact_tombstones(state, None)
    elif cfg.grace_wt is not None:
        state = compact_tombstones(state, cfg.grace_wt)
    state = state.sort_values(list(cfg.key_cols), kind="mergesort", ignore_index=True)

    watermark = max(
        int(cfg.prior_watermarks.get(part, -1)),
        int(partials[MAX_SEQ].max() if len(partials) else -1),
    )
    rel = write_partition_state(cfg, part, state)
    tombstones = int(state[DELETED].sum())
    rows = int(len(state) - tombstones)
    receipt = {
        "part": part,
        "run_id": cfg.run_id,
        "files": [rel],
        "watermark": watermark,
        "rows": rows,
        "tombstones": tombstones,
        "status": "PASS",
        "metrics": {"keys_in": int(len(partials))},
        **({"cdf_file": cdf_rel} if cdf_rel else {}),
    }
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    atomic_write_json(receipt_path, receipt)
    return pd.DataFrame(
        [
            {
                "part": part,
                "rows": rows,
                "tombstones": tombstones,
                "keys_in": int(len(partials)),
                "watermark": watermark,
                "status": "PASS",
                "file": rel,
                "seconds": round(_time.perf_counter() - _t0, 3),
            }
        ]
    )
