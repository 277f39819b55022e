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

SIDE_COL = "__side"  # 0 = expected (origin), 1 = actual (target/lake)

REPORT_COLUMNS = ["conv_id", "turn_idx", "status", "cols_differ", "fix_wt"]


def compare_group(
    group: pd.DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    part_col: str,
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
    # (cells, row marker, tombstone) so a corrective upsert always wins LWW
    wt_sources = [m.get(f"{c}{WT_SUFFIX}_a") for c in payload_cols]
    wt_sources += [m.get(f"{ROW_WT}_a"), m.get(f"{DEL_WT}_a")]
    fix_wt = np.full(len(m), NEG_INF, dtype=np.int64)
    for s in wt_sources:
        if s is not None:
            fix_wt = np.maximum(fix_wt, s.fillna(NEG_INF).to_numpy(dtype=np.int64))
    fix_wt = np.where(fix_wt == NEG_INF, 0, fix_wt) + 1

    bad = status != "VALID"
    out = m.loc[bad, list(key_cols)].reset_index(drop=True)
    out["status"] = status[bad]
    out["cols_differ"] = cols_differ[bad]
    out["fix_wt"] = fix_wt[bad]
    for c in payload_cols:
        out[f"exp_{c}"] = m.loc[bad, f"{c}_e"].reset_index(drop=True)
    out = out.sort_values(list(key_cols), kind="mergesort", ignore_index=True)

    counts = {
        "VALID": int((status == "VALID").sum()),
        "MISSING": int((status == "MISSING").sum()),
        "MISMATCH": int((status == "MISMATCH").sum()),
        "EXTRA": int((status == "EXTRA").sum()),
    }
    counts_row = {k: None for k in out.columns}
    counts_row.update(
        {
            key_cols[0]: "",
            key_cols[1]: np.int32(-1),
            "status": "_COUNTS",
            "cols_differ": ";".join(f"{k}={v}" for k, v in counts.items()),
            "fix_wt": np.int64(int(g[part_col].iloc[0])),
        }
    )
    return pd.concat([out, pd.DataFrame([counts_row])], ignore_index=True)
