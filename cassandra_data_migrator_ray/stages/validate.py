"""Per-partition diff comparator — the reference's DiffJobSession, vectorized.

The reference validates row-at-a-time: async point-read of the target by PK,
buffer, then classify MISSING / MISMATCH / VALID with column-wise compare
(/root/reference src/main/java/com/datastax/cdm/job/DiffJobSession.java:135-241,
isDifferent :243-330).  Here both sides are co-partitioned by the lake's own
hash route and compared as a vectorized outer join per partition group —
left-anti rows = MISSING, right-anti = EXTRA, inner rows column-compared with
null-safe equality (data/DataUtility.java:47-57 ``diff``).

Output is one diff-report row per non-VALID key (stable under
(conv_id, turn_idx) ordering) carrying everything autocorrect needs:
the expected payload and a ``fix_wt`` that beats every surviving cell/tombstone
writetime on the actual side.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from cassandra_data_migrator_ray.schema import (
    DEL_WT,
    NEG_INF,
    ROW_WT,
    WT_SUFFIX,
)

SIDE_COL = "__side"  # 0 = expected (origin), 1 = actual (target/lake), 2 = lake tombstone


def _counts_key_sentinels(key_cols, dtypes) -> dict:
    """Type-appropriate key values for the synthetic '_COUNTS' row (string
    keys get '', numeric keys -1) so the report frame keeps stable dtypes
    for any PK shape."""
    out = {}
    for k in key_cols:
        dt = dtypes.get(k)
        if dt is not None and (np.issubdtype(dt, np.integer) or np.issubdtype(dt, np.floating)):
            out[k] = dt.type(-1)
        else:
            out[k] = ""
    return out



REPORT_COLUMNS = ["conv_id", "turn_idx", "status", "cols_differ", "fix_wt"]


def compare_group(
    group: pd.DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    part_col: str,
    counter_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """One co-partitioned group (both sides) → diff rows + a counts row.

    Returned frame: key cols + status + cols_differ + fix_wt + expected payload
    (prefixed ``exp_``).  VALID rows are *not* emitted (bounded output); the
    counts travel in a synthetic row with status='_COUNTS' so the driver can
    aggregate without a second pass.
    """
    g = group
    exp = g[g[SIDE_COL] == 0]
    act = g[g[SIDE_COL] == 1]
    tomb = g[g[SIDE_COL] == 2]  # lake tombstones: feed fix_wt only
    m = exp.merge(
        act, on=list(key_cols), how="outer", suffixes=("_e", "_a"), indicator=True
    )

    status = np.where(
        m["_merge"].to_numpy() == "left_only",
        "MISSING",
        np.where(m["_merge"].to_numpy() == "right_only", "EXTRA", "VALID"),
    ).astype(object)

    both = m["_merge"].to_numpy() == "both"
    diff_cols: list[np.ndarray] = []
    for c in payload_cols:
        e = m[f"{c}_e"]
        a = m[f"{c}_a"]
        if c in counter_cols:
            # Counters: NULL and 0 are equal.  A counter that never received
            # a delta reads NULL while an autocorrected one settles at 0 —
            # operationally the same state (reference counters only move by
            # deltas, TargetUpdateStatement.java:69-76), and treating them as
            # different makes the validate→autocorrect loop oscillate forever
            # on NULL-expected keys.
            e = e.fillna(0)
            a = a.fillna(0)
        if e.dtype == object or a.dtype == object:
            # list/vector cells (ndarray or list) break elementwise != with
            # an ambiguous-truth error — compare as tuples.  Element NaNs map
            # to None so identical NaN-bearing vectors compare EQUAL, matching
            # the Arrow FSL comparator (where element nulls surface as NaN
            # and NaN==NaN is treated as equal) — tuple NaN compares by
            # object identity and would otherwise oscillate autocorrect.
            def _tup(v):
                if isinstance(v, (list, np.ndarray)):
                    return tuple(
                        None
                        if (isinstance(x, (float, np.floating)) and x != x)
                        else x
                        for x in v
                    )
                return v

            if any(isinstance(v, (list, np.ndarray)) for v in e) or any(
                isinstance(v, (list, np.ndarray)) for v in a
            ):
                e = e.map(_tup)
                a = a.map(_tup)
        # null-safe inequality (reference DataUtility.diff: null==null is equal)
        ne = (e != a) & ~(e.isna() & a.isna())
        # reference null-asymmetry (DiffJobSession.java:309-312): origin null +
        # target value counts as equal only when configured; default = differ.
        diff_cols.append(ne.to_numpy(dtype=bool) & both)
    any_diff = np.logical_or.reduce(diff_cols) if diff_cols else np.zeros(len(m), bool)
    status[any_diff] = "MISMATCH"

    cols_differ = np.full(len(m), "", dtype=object)
    for c, mask in zip(payload_cols, diff_cols):
        cols_differ = np.where(
            mask, np.where(cols_differ == "", c, cols_differ + "," + c), cols_differ
        )

    # fix_wt: 1 + the max writetime the actual side still holds for the key
    # (cells, row marker, tombstone — INCLUDING tombstoned rows, side=2) so a
    # corrective upsert always wins LWW even against a surviving tombstone
    wt_names = [f"{c}{WT_SUFFIX}" for c in payload_cols] + [ROW_WT, DEL_WT]
    wt_sources = [m.get(f"{n}_a") for n in wt_names]
    fix_wt = np.full(len(m), NEG_INF, dtype=np.int64)
    for s in wt_sources:
        if s is not None:
            fix_wt = np.maximum(fix_wt, s.fillna(NEG_INF).to_numpy(dtype=np.int64))
    if len(tomb):
        present = [n for n in wt_names if n in tomb.columns]
        tmax = (
            tomb.groupby(list(key_cols), sort=False)[present]
            .max()
            .max(axis=1)
            .rename("__tomb_wt")
            .reset_index()
        )
        tw = (
            m[list(key_cols)]
            .merge(tmax, on=list(key_cols), how="left")["__tomb_wt"]
            .fillna(NEG_INF)
            .to_numpy(dtype=np.int64)
        )
        fix_wt = np.maximum(fix_wt, tw)
    fix_wt = np.where(fix_wt == NEG_INF, 0, fix_wt) + 1

    bad = status != "VALID"
    out = m.loc[bad, list(key_cols)].reset_index(drop=True)
    out["status"] = status[bad]
    out["cols_differ"] = cols_differ[bad]
    out["fix_wt"] = fix_wt[bad]
    for c in payload_cols:
        out[f"exp_{c}"] = m.loc[bad, f"{c}_e"].reset_index(drop=True)
        # actual-side value for counter-delta autocorrect
        out[f"act_{c}"] = m.loc[bad, f"{c}_a"].reset_index(drop=True)
    out = out.sort_values(list(key_cols), kind="mergesort", ignore_index=True)

    counts = {
        "VALID": int((status == "VALID").sum()),
        "MISSING": int((status == "MISSING").sum()),
        "MISMATCH": int((status == "MISMATCH").sum()),
        "EXTRA": int((status == "EXTRA").sum()),
    }
    counts_row = {k: None for k in out.columns}
    counts_row.update(_counts_key_sentinels(key_cols, dict(g.dtypes)))
    counts_row.update(
        {
            "status": "_COUNTS",
            "cols_differ": ";".join(f"{k}={v}" for k, v in counts.items()),
            "fix_wt": np.int64(int(g[part_col].iloc[0])),
        }
    )
    return pd.concat([out, pd.DataFrame([counts_row])], ignore_index=True)


def _null_safe_ne(a, b) -> np.ndarray:
    """Vectorized null-safe inequality (null == null is equal — reference
    DataUtility.diff) supporting nested types: structs recurse field-wise
    (UDT comparison, data/CqlConversion.java:321-357 shapes); types without
    an Arrow ``equal`` kernel fall back to Python-object comparison (rare)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    a_null = pc.is_null(a).to_numpy(zero_copy_only=False).astype(bool)
    b_null = pc.is_null(b).to_numpy(zero_copy_only=False).astype(bool)
    if pa.types.is_struct(a.type):
        ne = a_null != b_null  # exactly one side null → differ
        both_valid = ~a_null & ~b_null
        for i in range(a.type.num_fields):
            ne |= _null_safe_ne(a.field(i), b.field(i)) & both_valid
        return ne
    if pa.types.is_fixed_size_list(a.type) and pa.types.is_fixed_size_list(b.type):
        # VECTOR comparison (fixed_size_list, reference CqlData VECTOR →
        # SURVEY §1.3): no Arrow ``equal`` kernel exists for FSL, so compare
        # the flattened (n, dim) element matrices row-wise in numpy —
        # vectorized, no Python-object fallback.  FSL allocates dim children
        # under null slots too, so the reshape is always rectangular; null
        # rows are settled by the validity masks, element NaNs compare equal
        # to each other (a vector that round-trips is never "different").
        dim = a.type.list_size
        va = a.values.to_numpy(zero_copy_only=False).reshape(len(a), dim)
        vb = b.values.to_numpy(zero_copy_only=False).reshape(len(b), dim)
        elem_ne = va != vb
        if va.dtype.kind == "f":
            elem_ne &= ~(np.isnan(va) & np.isnan(vb))
        ne_rows = elem_ne.any(axis=1)
        both_valid = ~a_null & ~b_null
        return (a_null != b_null) | (both_valid & ne_rows)
    try:
        eq = pc.equal(a, b)
    except pa.lib.ArrowNotImplementedError:
        av, bv = a.to_pylist(), b.to_pylist()
        return np.fromiter((x != y for x, y in zip(av, bv)), dtype=bool, count=len(av))
    both_null = pc.and_(pa.array(a_null), pa.array(b_null))
    ne = pc.and_(
        pc.fill_null(pc.invert(pc.fill_null(eq, False)), True),
        pc.invert(both_null),
    )
    return ne.to_numpy(zero_copy_only=False).astype(bool)


def compare_part_arrow(
    tbl: "pa.Table",
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    part: int,
    counter_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """Arrow-native comparator for one co-partitioned table holding both sides
    (SIDE_COL 0=expected, 1=actual).  Same output contract as compare_group,
    but winner/status logic runs on numeric arrays (dictionary key codes +
    side masks) and payload columns are only touched by vectorized takes and
    null-safe equality kernels — ~3× the pandas-merge comparator's throughput.

    Assumes ≤1 row per key per side (true: lake state and oracle final state
    are unique per key)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        return pd.DataFrame(columns=REPORT_COLUMNS)
    tbl = tbl.combine_chunks()
    codes = []
    for k in key_cols:
        col = tbl.column(k)
        if pa.types.is_integer(col.type):
            # fill nulls in integer space: a float round-trip would both
            # merge null with a legitimate -1 key and quantize keys beyond
            # 2^53 (same hazard fold_events_arrow guards against).  Unsigned
            # keys go through a bijective uint64→int64 bit-view — a signed
            # cast would raise on values ≥ 2^63.
            if pa.types.is_unsigned_integer(col.type):
                filled = pc.fill_null(
                    pc.cast(col, pa.uint64()), np.uint64(0xFFFFFFFFFFFFFFFF)
                )
                codes.append(
                    filled.to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                    .view(np.int64)
                )
            else:
                filled = pc.fill_null(
                    pc.cast(col, pa.int64()), np.iinfo(np.int64).min
                )
                codes.append(filled.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            enc = pc.dictionary_encode(col).combine_chunks()
            codes.append(
                np.nan_to_num(enc.indices.to_numpy(zero_copy_only=False), nan=-1).astype(
                    np.int64
                )
            )
    side = tbl.column(SIDE_COL).to_numpy(zero_copy_only=False).astype(np.int8)
    order = np.lexsort((side, *reversed(codes)))
    sidx = np.arange(n, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in codes:
        cs = c[order]
        change[1:] |= cs[1:] != cs[:-1]
    starts = np.flatnonzero(change)
    ngroups = len(starts)
    sside = side[order]

    exp_pos = np.maximum.reduceat(np.where(sside == 0, sidx, -1), starts)
    act_pos = np.maximum.reduceat(np.where(sside == 1, sidx, -1), starts)
    tomb_pos = np.maximum.reduceat(np.where(sside == 2, sidx, -1), starts)
    has_exp, has_act = exp_pos >= 0, act_pos >= 0
    has_tomb = tomb_pos >= 0
    exp_idx = order[np.clip(exp_pos, 0, None)]
    act_idx = order[np.clip(act_pos, 0, None)]
    tomb_idx = order[np.clip(tomb_pos, 0, None)]

    status = np.where(
        has_exp & has_act, "VALID", np.where(has_exp, "MISSING", "EXTRA")
    ).astype(object)
    # a tombstone with no live row and no expected row is plain absence —
    # neither EXTRA nor counted
    status[~has_exp & ~has_act & has_tomb] = "_TOMB"

    both = has_exp & has_act
    exp_take = pa.array(exp_idx, pa.int64(), mask=~has_exp)
    act_take = pa.array(act_idx, pa.int64(), mask=~has_act)
    cols_differ = np.full(ngroups, "", dtype=object)
    diff_masks = {}
    for c in payload_cols:
        col = tbl.column(c)
        a = pc.take(col, exp_take)
        b = pc.take(col, act_take)
        if c in counter_cols:
            # counters: NULL == 0 (see compare_group) so the autocorrect
            # loop converges when a NULL-expected counter settled at 0
            zero = pa.scalar(0, type=col.type)
            a = pc.fill_null(a, zero)
            b = pc.fill_null(b, zero)
        mask = _null_safe_ne(a, b) & both
        diff_masks[c] = mask
        cols_differ = np.where(
            mask, np.where(cols_differ == "", c, cols_differ + "," + c), cols_differ
        )
    any_diff = (
        np.logical_or.reduce(list(diff_masks.values()))
        if diff_masks
        else np.zeros(ngroups, bool)
    )
    status[any_diff & both] = "MISMATCH"

    # fix_wt from the actual side's bookkeeping columns — including the
    # tombstone rows (side=2), so a correction for a tombstoned key beats the
    # surviving tombstone's writetime
    tomb_take = pa.array(tomb_idx, pa.int64(), mask=~has_tomb)
    fix_wt = np.full(ngroups, NEG_INF, dtype=np.int64)
    for name in [f"{c}{WT_SUFFIX}" for c in payload_cols] + [ROW_WT, DEL_WT]:
        if name in tbl.column_names:
            for take in (act_take, tomb_take):
                v = pc.take(tbl.column(name), take)
                arr = np.nan_to_num(
                    v.to_numpy(zero_copy_only=False).astype(np.float64),
                    nan=float(NEG_INF),
                ).astype(np.int64)
                fix_wt = np.maximum(fix_wt, arr)
    fix_wt = np.where(fix_wt == NEG_INF, 0, fix_wt) + 1

    bad = (status != "VALID") & (status != "_TOMB")
    key_take_bad = pa.array(
        np.where(has_exp, exp_idx, act_idx)[bad], pa.int64()
    )
    out = pd.DataFrame()
    for k in key_cols:
        out[k] = pc.take(tbl.column(k), key_take_bad).to_pandas()
    out["status"] = status[bad]
    out["cols_differ"] = cols_differ[bad]
    out["fix_wt"] = fix_wt[bad]
    exp_take_bad = pa.array(exp_idx[bad], pa.int64(), mask=~has_exp[bad])
    act_take_bad = pa.array(act_idx[bad], pa.int64(), mask=~has_act[bad])
    int_mapper = {
        pa.int64(): pd.Int64Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int8(): pd.Int8Dtype(),
        pa.uint64(): pd.UInt64Dtype(),
        pa.uint32(): pd.UInt32Dtype(),
        pa.uint16(): pd.UInt16Dtype(),
        pa.uint8(): pd.UInt8Dtype(),
    }.get

    def _rep(col, take):
        taken = pc.take(col, take)
        # integer payload: keep nullable Int, never float64 — autocorrect's
        # counter delta (expected − actual) must be exact past 2^53
        if pa.types.is_integer(col.type):
            return taken.to_pandas(types_mapper=int_mapper)
        if pa.types.is_fixed_size_list(col.type) or pa.types.is_list(col.type):
            # plain Python lists, not ndarrays: Ray's pandas block builder
            # tries (and fails) to TensorArray-cast ndarray object columns
            # when report frames cross map_batches; report rows are the
            # bounded diff set, so to_pylist is fine here
            return pd.Series(taken.to_pylist(), dtype=object)
        return taken.to_pandas()

    for c in payload_cols:
        out[f"exp_{c}"] = _rep(tbl.column(c), exp_take_bad)
        # actual-side value: autocorrect needs it to compute counter deltas
        # (reference binds origin − target, TargetUpdateStatement.java:69-76)
        out[f"act_{c}"] = _rep(tbl.column(c), act_take_bad)
    out = out.sort_values(list(key_cols), kind="mergesort", ignore_index=True)

    counts = {
        "VALID": int(((status == "VALID")).sum()),
        "MISSING": int((status == "MISSING").sum()),
        "MISMATCH": int((status == "MISMATCH").sum()),
        "EXTRA": int((status == "EXTRA").sum()),
    }
    counts_row = {k: None for k in out.columns}
    counts_row.update(_counts_key_sentinels(key_cols, dict(out.dtypes)))
    counts_row.update(
        {
            "status": "_COUNTS",
            "cols_differ": ";".join(f"{k}={v}" for k, v in counts.items()),
            "fix_wt": np.int64(part),
        }
    )
    return pd.concat([out, pd.DataFrame([counts_row])], ignore_index=True)
