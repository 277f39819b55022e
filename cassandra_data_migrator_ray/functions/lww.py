"""Cell-level last-writer-wins fold — the heart of the engine.

Semantics (faithful to the reference + Cassandra cell rules it delegates to):

- Every change event carries ``(writetime, event_seq)``; ``event_seq`` is a
  globally unique monotone tiebreak, so ordering is total and replays are
  deterministic (the reference leans on Cassandra cell rules + a configured
  ``writetimeIncrement`` instead — feature/WritetimeTTL.java:167-172).
- INSERT and UPSERT are the same operation (CQL INSERT is an upsert).
- A null payload column in an upsert means *unset*: keep the existing cell.
  (reference: null → unset to avoid tombstones,
  cql/statement/TargetInsertStatement.java:107-115, data/CqlData.java:176-200).
- DELETE is a row tombstone at ``(writetime, event_seq)``: it suppresses every
  cell and row marker with a smaller-or-equal order token; a *newer* upsert
  recreates the row from scratch.
- Per-cell writetimes are persisted in the lake state (``c__wt``/``c__seq``),
  mirroring Cassandra's per-cell timestamps that the reference reads back via
  ``WRITETIME(c)`` (schema/CqlTable.java:496-514) — so incremental merges are
  exactly equivalent to a one-shot replay of the full history.

Everything is vectorized numpy/pandas over sorted contiguous groups — no
Python-per-row loops.  ``fold_events`` (events → state) and ``merge_states``
(state ⊕ state) form an associative pair, which legalizes per-batch
pre-reduction (combining) before the shuffle and salted hierarchical merges for
hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from cassandra_data_migrator_ray.schema import (
    DEL_SEQ,
    DEL_WT,
    DELETED,
    MAX_SEQ,
    NEG_INF,
    NO_EXPIRY,
    ROW_SEQ,
    ROW_TTLX,
    ROW_WT,
    SEQ_SUFFIX,
    TTLX_SUFFIX,
    WT_SUFFIX,
)


def _cluster_and_starts(
    df: pd.DataFrame, key_cols: Sequence[str], order_cols: Sequence[str] = ()
) -> tuple[pd.DataFrame, np.ndarray]:
    """Cluster rows into contiguous key groups (ordered by ``order_cols``
    within each group) and return (clustered_df, group_start_indices).

    Uses factorize + integer lexsort instead of multi-column object sorts —
    ~5-10× faster on string keys, and group *contiguity* (not global key
    order) is all the fold needs.
    """
    n = len(df)
    codes = [pd.factorize(df[k], use_na_sentinel=True)[0] for k in key_cols]
    orders = [df[c].to_numpy() for c in order_cols]
    # np.lexsort: LAST key is the primary sort key
    order = np.lexsort(tuple(reversed(orders)) + tuple(reversed(codes)))
    out = df.iloc[order].reset_index(drop=True)
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
    for c in codes:
        cs = c[order]
        change[1:] |= cs[1:] != cs[:-1]
    return out, np.flatnonzero(change)


def _take_or(series: pd.Series, idx: np.ndarray, valid: np.ndarray) -> pd.Series:
    """series.iloc[idx] where valid, else NA (dtype-preserving)."""
    out = series.iloc[np.clip(idx, 0, None)].reset_index(drop=True)
    return out.where(valid)


def _lex_gt(w1, s1, w2, s2) -> np.ndarray:
    """(w1, s1) > (w2, s2) lexicographically, vectorized."""
    return (w1 > w2) | ((w1 == w2) & (s1 > s2))


def fold_events(
    df: pd.DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> pd.DataFrame:
    """Fold a frame of change events into one state row per key.

    Input columns: key_cols + payload_cols + op/writetime/event_seq.
    Output: the internal state frame (see schema.state_schema).
    """
    if df.empty:
        return empty_state(df, key_cols, payload_cols, counter_cols, ttl=ttl)
    df, starts = _cluster_and_starts(df, key_cols, ("writetime", "event_seq"))
    n = len(df)
    idx = np.arange(n, dtype=np.int64)
    is_del = df["op"].to_numpy() == "DELETE"
    wt = df["writetime"].to_numpy(dtype=np.int64)
    seq = df["event_seq"].to_numpy(dtype=np.int64)
    if ttl:
        # per-event expiry = writetime + ttl seconds (reference USING TTL,
        # feature/WritetimeTTL.java:235-281); null OR 0 ttl = never expires
        # (CQL: USING TTL 0 removes the TTL, it does not expire-at-write)
        if "ttl" in df.columns:
            tsec = pd.to_numeric(df["ttl"], errors="coerce")
            tnum = np.nan_to_num(tsec.to_numpy(dtype=np.float64))
            ttlx = np.where(
                tsec.notna().to_numpy() & (tnum > 0),
                wt + tnum.astype(np.int64) * 1_000_000,
                NO_EXPIRY,
            )
        else:
            ttlx = np.full(n, NO_EXPIRY, dtype=np.int64)
    ends = np.r_[starts[1:], n] - 1  # last row index of each group
    ngroups = len(starts)
    gid = np.repeat(np.arange(ngroups), np.diff(np.r_[starts, n]))

    # Tombstone suppression via sort order: rows strictly after the last DELETE
    # in a group have del_cum == del_cum[group end].
    del_cum = np.cumsum(is_del)
    live = ~is_del & (del_cum == del_cum[ends][gid])

    # last delete / last upsert index per group (-1 if none)
    last_del = np.maximum.reduceat(np.where(is_del, idx, -1), starts)
    last_up = np.maximum.reduceat(np.where(live, idx, -1), starts)

    has_del = last_del >= 0
    exists = last_up >= 0  # an upsert after the last delete

    # exactly-once per event for counters: duplicate deliveries share the same
    # globally-unique event_seq and are adjacent in the (writetime, event_seq)
    # sort — only the first copy may contribute a delta (reference counters are
    # read-modify-write and thus rerun-safe, TargetUpdateStatement.java:69-76).
    dup = np.zeros(n, dtype=bool)
    dup[1:] = seq[1:] == seq[:-1]
    dup[starts] = False

    out = df.iloc[starts][list(key_cols)].reset_index(drop=True)
    for c in payload_cols:
        if c in counter_cols:
            # counters accumulate in int64 (reference counters are Long);
            # float64 folds silently lose precision past 2^53.
            num = pd.to_numeric(df[c], errors="coerce")
            notna = num.notna().to_numpy()
            if pd.api.types.is_integer_dtype(num):
                delta = num.fillna(0).to_numpy(dtype=np.int64)
            else:
                delta = np.rint(
                    np.nan_to_num(num.to_numpy(dtype=np.float64))
                ).astype(np.int64)
            valid = live & notna & ~dup
            sums = np.add.reduceat(np.where(valid, delta, 0), starts)
            any_valid = np.maximum.reduceat(np.where(valid, idx, -1), starts) >= 0
            out[c] = pd.array(sums, dtype="Int64")
            out[c] = out[c].where(any_valid)
            # order token of the latest contribution (for merge suppression)
            last_c = np.maximum.reduceat(np.where(valid, idx, -1), starts)
            out[c + WT_SUFFIX] = np.where(last_c >= 0, wt[np.clip(last_c, 0, None)], NEG_INF)
            out[c + SEQ_SUFFIX] = np.where(last_c >= 0, seq[np.clip(last_c, 0, None)], NEG_INF)
            if ttl:
                out[c + TTLX_SUFFIX] = np.full(len(starts), NO_EXPIRY, dtype=np.int64)
            continue
        notnull = df[c].notna().to_numpy()
        valid = live & notnull
        last_c = np.maximum.reduceat(np.where(valid, idx, -1), starts)
        ok = last_c >= 0
        out[c] = _take_or(df[c], last_c, ok)
        out[c + WT_SUFFIX] = np.where(ok, wt[np.clip(last_c, 0, None)], NEG_INF)
        out[c + SEQ_SUFFIX] = np.where(ok, seq[np.clip(last_c, 0, None)], NEG_INF)
        if ttl:
            out[c + TTLX_SUFFIX] = np.where(
                ok, ttlx[np.clip(last_c, 0, None)], NO_EXPIRY
            )

    out[DEL_WT] = np.where(has_del, wt[np.clip(last_del, 0, None)], NEG_INF)
    out[DEL_SEQ] = np.where(has_del, seq[np.clip(last_del, 0, None)], NEG_INF)
    out[ROW_WT] = np.where(exists, wt[np.clip(last_up, 0, None)], NEG_INF)
    out[ROW_SEQ] = np.where(exists, seq[np.clip(last_up, 0, None)], NEG_INF)
    out[DELETED] = ~exists
    out[MAX_SEQ] = np.maximum.reduceat(seq, starts)
    if ttl:
        out[ROW_TTLX] = np.where(exists, ttlx[np.clip(last_up, 0, None)], NO_EXPIRY)
    return out


def fold_events_arrow(
    tbl: "pa.Table",
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> "pa.Table":
    """Arrow-native :func:`fold_events`: identical semantics, but the hot path
    never materializes Python-object strings — winner indices are computed on
    numeric arrays (key dictionary codes, writetime, seq, validity masks) and
    each payload column is gathered by a single ``pc.take`` with nullable
    indices.  ~3-4× less memory traffic per event than the pandas fold; used
    by the staging-exchange reducer.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    # NO table-wide combine_chunks: payload columns are only ever touched by
    # winner-sized pc.take gathers (chunked-safe), so leaving them chunked
    # keeps staged payload bytes mmapped and uncopied — bookkeeping columns
    # below concat per-column via to_numpy, which is all the fold needs.
    # (Round-3 scaling instrumentation blamed stage-2 DRAM copy traffic for
    # the 8→32-worker efficiency cap; the table-wide combine was ~half of it.)
    n = tbl.num_rows
    if n == 0:
        import pyarrow as pa

        from cassandra_data_migrator_ray.schema import state_schema

        payload_schema = pa.schema(
            [tbl.schema.field(c) for c in (*key_cols, *payload_cols)]
        )
        return pa.Table.from_pylist(
            [], schema=state_schema(payload_schema, list(key_cols), ttl=ttl)
        )
    # integer codes per key column without object conversion
    codes: list[np.ndarray] = []
    for k in key_cols:
        col = tbl.column(k)
        if pa.types.is_integer(col.type):
            # fill nulls in int64 space (a float round-trip would both merge
            # null with a legitimate -1 key and corrupt keys beyond 2^53);
            # int64.min as the null sentinel matches no realistic key value
            filled = pc.fill_null(pc.cast(col, pa.int64()), np.iinfo(np.int64).min)
            codes.append(filled.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            enc = pc.dictionary_encode(col).combine_chunks()
            idxs = enc.indices.to_numpy(zero_copy_only=False)
            codes.append(np.nan_to_num(idxs, nan=-1).astype(np.int64))
    wt = tbl.column("writetime").to_numpy(zero_copy_only=False).astype(np.int64)
    seq = tbl.column("event_seq").to_numpy(zero_copy_only=False).astype(np.int64)
    if ttl:
        if "ttl" in tbl.column_names:
            tcol = pc.cast(tbl.column("ttl"), pa.float64())
            tnum = tcol.to_numpy(zero_copy_only=False)
            # null OR 0 ttl = never expires (CQL: USING TTL 0 removes the TTL)
            ttlx_all = np.where(
                ~np.isnan(tnum) & (np.nan_to_num(tnum) > 0),
                wt + np.nan_to_num(tnum).astype(np.int64) * 1_000_000,
                NO_EXPIRY,
            )
        else:
            ttlx_all = np.full(n, NO_EXPIRY, dtype=np.int64)
    is_del = (
        pc.fill_null(pc.equal(tbl.column("op"), "DELETE"), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )

    order = np.lexsort((seq, wt, *codes[::-1]))
    swt, sseq, sdel = wt[order], seq[order], is_del[order]
    sttlx = ttlx_all[order] if ttl else None
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
    for c in codes:
        cs = c[order]
        change[1:] |= cs[1:] != cs[:-1]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], n] - 1
    ngroups = len(starts)
    gid = np.repeat(np.arange(ngroups), np.diff(np.r_[starts, n]))
    sidx = np.arange(n, dtype=np.int64)

    del_cum = np.cumsum(sdel)
    live = ~sdel & (del_cum == del_cum[ends][gid])
    last_del = np.maximum.reduceat(np.where(sdel, sidx, -1), starts)
    last_up = np.maximum.reduceat(np.where(live, sidx, -1), starts)
    has_del = last_del >= 0
    exists = last_up >= 0

    def _nullable_take(col, sorted_pos: np.ndarray, ok: np.ndarray):
        gidx = order[np.clip(sorted_pos, 0, None)]
        idx_arr = pa.array(gidx, type=pa.int64(), mask=~ok)
        return pc.take(col, idx_arr)

    # duplicate-delivery mask for counters (same event_seq ⇒ same event; only
    # the first sorted copy contributes — see fold_events)
    sdup = np.zeros(n, dtype=bool)
    sdup[1:] = sseq[1:] == sseq[:-1]
    sdup[starts] = False

    key_take = pa.array(order[starts], type=pa.int64())
    out: dict[str, object] = {}
    for k in key_cols:
        out[k] = pc.take(tbl.column(k), key_take)
    for c in payload_cols:
        col = tbl.column(c)
        if c in counter_cols:
            notnull_c = pc.is_valid(col).to_numpy(zero_copy_only=False).astype(bool)
            if pa.types.is_integer(col.type):
                vals = (
                    pc.fill_null(pc.cast(col, pa.int64()), 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            else:
                fv = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
                vals = np.rint(np.nan_to_num(fv)).astype(np.int64)
            svals = vals[order]
            valid = live & notnull_c[order] & ~sdup
            sums = np.add.reduceat(np.where(valid, svals, 0), starts)
            last_c = np.maximum.reduceat(np.where(valid, sidx, -1), starts)
            ok = last_c >= 0
            out[c] = pa.array(sums, type=pa.int64(), mask=~ok)
            out[c + WT_SUFFIX] = pa.array(
                np.where(ok, swt[np.clip(last_c, 0, None)], NEG_INF)
            )
            out[c + SEQ_SUFFIX] = pa.array(
                np.where(ok, sseq[np.clip(last_c, 0, None)], NEG_INF)
            )
            if ttl:
                out[c + TTLX_SUFFIX] = pa.array(
                    np.full(ngroups, NO_EXPIRY, dtype=np.int64)
                )
            continue
        notnull = (
            pc.is_valid(col).to_numpy(zero_copy_only=False).astype(bool)[order]
        )
        valid = live & notnull
        last_c = np.maximum.reduceat(np.where(valid, sidx, -1), starts)
        ok = last_c >= 0
        out[c] = _nullable_take(col, last_c, ok)
        out[c + WT_SUFFIX] = pa.array(np.where(ok, swt[np.clip(last_c, 0, None)], NEG_INF))
        out[c + SEQ_SUFFIX] = pa.array(np.where(ok, sseq[np.clip(last_c, 0, None)], NEG_INF))
        if ttl:
            out[c + TTLX_SUFFIX] = pa.array(
                np.where(ok, sttlx[np.clip(last_c, 0, None)], NO_EXPIRY)
            )

    out[DEL_WT] = pa.array(np.where(has_del, swt[np.clip(last_del, 0, None)], NEG_INF))
    out[DEL_SEQ] = pa.array(np.where(has_del, sseq[np.clip(last_del, 0, None)], NEG_INF))
    out[ROW_WT] = pa.array(np.where(exists, swt[np.clip(last_up, 0, None)], NEG_INF))
    out[ROW_SEQ] = pa.array(np.where(exists, sseq[np.clip(last_up, 0, None)], NEG_INF))
    out[DELETED] = pa.array(~exists)
    out[MAX_SEQ] = pa.array(np.maximum.reduceat(seq[order], starts) if n else np.array([], np.int64))
    if ttl:
        out[ROW_TTLX] = pa.array(
            np.where(exists, sttlx[np.clip(last_up, 0, None)], NO_EXPIRY)
        )
    # staged slices may carry dictionary-encoded payload strings (stages/
    # staging.py dict_cols): every gather above then moved int32 indices;
    # decode ONCE here on the winner-sized output so state schema, merge
    # and parquet write see plain strings downstream
    for c in (*key_cols, *payload_cols):
        v = out.get(c)
        if v is not None and pa.types.is_dictionary(v.type):
            out[c] = pc.cast(v, v.type.value_type)
    return pa.table(out)


def empty_state(
    df: pd.DataFrame | None,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> pd.DataFrame:
    cols: dict[str, pd.Series] = {}
    for k in key_cols:
        cols[k] = df[k].iloc[:0] if df is not None and k in df else pd.Series([], dtype=object)
    for c in payload_cols:
        cols[c] = (
            df[c].iloc[:0] if df is not None and c in df else pd.Series([], dtype=object)
        )
        cols[c + WT_SUFFIX] = pd.Series([], dtype=np.int64)
        cols[c + SEQ_SUFFIX] = pd.Series([], dtype=np.int64)
        if ttl:
            cols[c + TTLX_SUFFIX] = pd.Series([], dtype=np.int64)
    for extra in (DEL_WT, DEL_SEQ, ROW_WT, ROW_SEQ, MAX_SEQ):
        cols[extra] = pd.Series([], dtype=np.int64)
    cols[DELETED] = pd.Series([], dtype=bool)
    if ttl:
        cols[ROW_TTLX] = pd.Series([], dtype=np.int64)
    return pd.DataFrame(cols)


def merge_state_frames(
    frames: Sequence[pd.DataFrame] | pd.DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> pd.DataFrame:
    """Associative, commutative multi-way merge of state frames.

    Equivalent to Cassandra compaction of N SSTables: per cell the greatest
    ``(wt, seq)`` wins; the merged tombstone (greatest delete token) suppresses
    any cell/row marker at or below it.  Counter columns *add* across all
    partials whose contribution token survives the merged tombstone (reference
    delta semantics, cql/statement/TargetUpdateStatement.java:69-76; like the
    reference, counters do not interact with row deletes at sub-partial
    granularity).

    This is the combiner that legalizes per-batch pre-reduction before the
    shuffle and salted hierarchical merges for hot keys.
    """
    if isinstance(frames, pd.DataFrame):
        df = frames
    else:
        frames = [f for f in frames if f is not None and len(f)]
        if not frames:
            raise ValueError("merge_state_frames: no non-empty frames")
        df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    if df.empty:
        return df
    df, starts = _cluster_and_starts(df, key_cols)
    n = len(df)
    idx = np.arange(n, dtype=np.int64)
    ngroups = len(starts)
    gid = np.repeat(np.arange(ngroups), np.diff(np.r_[starts, n]))

    def _argmax_lex(w: np.ndarray, s: np.ndarray) -> np.ndarray:
        """Per-group row index of the lexicographic max (w, s); seq-unique."""
        wmax = np.maximum.reduceat(w, starts)[gid]
        cand = w == wmax
        smax = np.maximum.reduceat(np.where(cand, s, NEG_INF), starts)[gid]
        win = cand & (s == smax)
        return np.maximum.reduceat(np.where(win, idx, -1), starts)

    out = df.iloc[starts][list(key_cols)].reset_index(drop=True)

    dwt = df[DEL_WT].to_numpy(dtype=np.int64)
    dsq = df[DEL_SEQ].to_numpy(dtype=np.int64)
    di = _argmax_lex(dwt, dsq)
    del_wt, del_seq = dwt[di], dsq[di]

    rwt = df[ROW_WT].to_numpy(dtype=np.int64)
    rsq = df[ROW_SEQ].to_numpy(dtype=np.int64)
    ri = _argmax_lex(rwt, rsq)
    row_wt, row_seq = rwt[ri], rsq[ri]
    exists = _lex_gt(row_wt, row_seq, del_wt, del_seq)

    for c in payload_cols:
        w = df[c + WT_SUFFIX].to_numpy(dtype=np.int64)
        s = df[c + SEQ_SUFFIX].to_numpy(dtype=np.int64)
        if c in counter_cols:
            num = pd.to_numeric(df[c], errors="coerce")
            notna = num.notna().to_numpy()
            if pd.api.types.is_integer_dtype(num):
                vals = num.fillna(0).to_numpy(dtype=np.int64)
            else:
                vals = np.rint(
                    np.nan_to_num(num.to_numpy(dtype=np.float64))
                ).astype(np.int64)
            # identical-cell dedup: within a key group, two counter cells with
            # the same (wt, seq) token AND the same value are the same
            # contribution seen twice (a retried stage write, or the same
            # state snapshot present in two lake fragments) — count it once.
            # Same-token-different-value cells (overlapping-but-unequal event
            # sets) cannot arise through the watermark-filtered paths and
            # remain additive.
            o2 = np.lexsort((vals, s, w, gid))
            same = (
                (gid[o2][1:] == gid[o2][:-1])
                & (w[o2][1:] == w[o2][:-1])
                & (s[o2][1:] == s[o2][:-1])
                & (vals[o2][1:] == vals[o2][:-1])
                & notna[o2][1:]
                & notna[o2][:-1]
            )
            dup = np.zeros(n, dtype=bool)
            dup[o2[1:]] = same
            live = (
                _lex_gt(w, s, del_wt[gid], del_seq[gid]) & notna & ~dup
            )
            total = np.add.reduceat(np.where(live, vals, 0), starts)
            any_live = np.maximum.reduceat(np.where(live, idx, -1), starts) >= 0
            out[c] = pd.array(total, dtype="Int64")
            out[c] = out[c].where(any_live)
            ci = _argmax_lex(np.where(live, w, NEG_INF), np.where(live, s, NEG_INF))
            out[c + WT_SUFFIX] = np.where(any_live, w[ci], NEG_INF)
            out[c + SEQ_SUFFIX] = np.where(any_live, s[ci], NEG_INF)
            if ttl:
                out[c + TTLX_SUFFIX] = np.full(ngroups, NO_EXPIRY, dtype=np.int64)
            continue
        wi = _argmax_lex(w, s)
        win_wt, win_seq = w[wi], s[wi]
        alive = _lex_gt(win_wt, win_seq, del_wt, del_seq)
        out[c] = _take_or(df[c], wi, alive)
        out[c + WT_SUFFIX] = np.where(alive, win_wt, NEG_INF)
        out[c + SEQ_SUFFIX] = np.where(alive, win_seq, NEG_INF)
        if ttl:
            tx = (
                df[c + TTLX_SUFFIX].fillna(NO_EXPIRY).to_numpy(dtype=np.int64)
                if c + TTLX_SUFFIX in df.columns
                else np.full(n, NO_EXPIRY, dtype=np.int64)
            )
            out[c + TTLX_SUFFIX] = np.where(alive, tx[wi], NO_EXPIRY)

    out[DEL_WT] = del_wt
    out[DEL_SEQ] = del_seq
    out[ROW_WT] = np.where(exists, row_wt, NEG_INF)
    out[ROW_SEQ] = np.where(exists, row_seq, NEG_INF)
    out[DELETED] = ~exists
    out[MAX_SEQ] = np.maximum.reduceat(df[MAX_SEQ].to_numpy(dtype=np.int64), starts)
    if ttl:
        rtx = (
            df[ROW_TTLX].fillna(NO_EXPIRY).to_numpy(dtype=np.int64)
            if ROW_TTLX in df.columns
            else np.full(n, NO_EXPIRY, dtype=np.int64)
        )
        out[ROW_TTLX] = np.where(exists, rtx[ri], NO_EXPIRY)
    return out


def merge_state_tables_arrow(
    tables: "Sequence[object]",
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> "object":
    """Arrow-native :func:`merge_state_frames`: identical semantics (per-cell
    LWW argmax, merged-tombstone suppression, additive counters with
    identical-cell dedup), but bookkeeping stays int64 numpy end-to-end and
    payload values move only through one nullable ``pc.take`` per column —
    no Python-object string materialization.  This makes the INCREMENTAL
    merge (prior lake state ⊕ new fold — the steady-state CDC path) as cheap
    per byte as the fresh-load ``fold_events_arrow`` path.

    Inputs must share one schema (align with ``align_to_schema`` first);
    bookkeeping nulls (schema-evolved older fragments) are sentinel-filled
    (``NEG_INF`` / ``NO_EXPIRY``) rather than propagated.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    tabs = [t for t in tables if t is not None and t.num_rows]
    if not tabs:
        raise ValueError("merge_state_tables_arrow: no non-empty tables")
    tbl = pa.concat_tables(tabs, promote_options="none") if len(tabs) > 1 else tabs[0]
    # no table-wide combine_chunks — see fold_events_arrow: payload columns
    # stay chunked (winner-sized takes only); bookkeeping concats per column
    n = tbl.num_rows

    codes: list[np.ndarray] = []
    for k in key_cols:
        col = tbl.column(k)
        if pa.types.is_integer(col.type):
            filled = pc.fill_null(pc.cast(col, pa.int64()), np.iinfo(np.int64).min)
            codes.append(filled.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            enc = pc.dictionary_encode(col).combine_chunks()
            idxs = enc.indices.to_numpy(zero_copy_only=False)
            codes.append(np.nan_to_num(idxs, nan=-1).astype(np.int64))
    order = np.lexsort(tuple(reversed(codes)))
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in codes:
        cs = c[order]
        change[1:] |= cs[1:] != cs[:-1]
    starts = np.flatnonzero(change)
    ngroups = len(starts)
    gid = np.repeat(np.arange(ngroups), np.diff(np.r_[starts, n]))
    sidx = np.arange(n, dtype=np.int64)

    def _i64(name: str, fill: int) -> np.ndarray:
        """Sorted int64 view of a bookkeeping column, nulls → sentinel."""
        if name not in tbl.column_names:
            return np.full(n, fill, dtype=np.int64)
        col = tbl.column(name)
        if col.null_count:
            col = pc.fill_null(col, fill)
        return (
            pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)[order]
        )

    def _argmax_lex(w: np.ndarray, s: np.ndarray) -> np.ndarray:
        wmax = np.maximum.reduceat(w, starts)[gid]
        cand = w == wmax
        smax = np.maximum.reduceat(np.where(cand, s, NEG_INF), starts)[gid]
        win = cand & (s == smax)
        return np.maximum.reduceat(np.where(win, sidx, -1), starts)

    dwt, dsq = _i64(DEL_WT, NEG_INF), _i64(DEL_SEQ, NEG_INF)
    di = _argmax_lex(dwt, dsq)
    del_wt, del_seq = dwt[di], dsq[di]
    rwt, rsq = _i64(ROW_WT, NEG_INF), _i64(ROW_SEQ, NEG_INF)
    ri = _argmax_lex(rwt, rsq)
    row_wt, row_seq = rwt[ri], rsq[ri]
    exists = _lex_gt(row_wt, row_seq, del_wt, del_seq)

    key_take = pa.array(order[starts], type=pa.int64())
    out: dict[str, object] = {}
    for k in key_cols:
        out[k] = pc.take(tbl.column(k), key_take)

    for c in payload_cols:
        w = _i64(c + WT_SUFFIX, NEG_INF)
        s = _i64(c + SEQ_SUFFIX, NEG_INF)
        col = tbl.column(c)
        if c in counter_cols:
            notna = (
                pc.is_valid(col).to_numpy(zero_copy_only=False).astype(bool)[order]
            )
            if pa.types.is_integer(col.type):
                vals = (
                    pc.fill_null(pc.cast(col, pa.int64()), 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[order]
                )
            else:
                fv = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
                vals = np.rint(np.nan_to_num(fv)).astype(np.int64)
            # identical-cell dedup — see merge_state_frames for the contract
            o2 = np.lexsort((vals, s, w, gid))
            same = (
                (gid[o2][1:] == gid[o2][:-1])
                & (w[o2][1:] == w[o2][:-1])
                & (s[o2][1:] == s[o2][:-1])
                & (vals[o2][1:] == vals[o2][:-1])
                & notna[o2][1:]
                & notna[o2][:-1]
            )
            dup = np.zeros(n, dtype=bool)
            dup[o2[1:]] = same
            live = _lex_gt(w, s, del_wt[gid], del_seq[gid]) & notna & ~dup
            total = np.add.reduceat(np.where(live, vals, 0), starts)
            any_live = np.maximum.reduceat(np.where(live, sidx, -1), starts) >= 0
            out[c] = pa.array(total, type=pa.int64(), mask=~any_live)
            ci = _argmax_lex(
                np.where(live, w, NEG_INF), np.where(live, s, NEG_INF)
            )
            out[c + WT_SUFFIX] = pa.array(np.where(any_live, w[ci], NEG_INF))
            out[c + SEQ_SUFFIX] = pa.array(np.where(any_live, s[ci], NEG_INF))
            if ttl:
                out[c + TTLX_SUFFIX] = pa.array(
                    np.full(ngroups, NO_EXPIRY, dtype=np.int64)
                )
            continue
        wi = _argmax_lex(w, s)
        win_wt, win_seq = w[wi], s[wi]
        alive = _lex_gt(win_wt, win_seq, del_wt, del_seq)
        take_idx = pa.array(order[np.clip(wi, 0, None)], pa.int64(), mask=~alive)
        out[c] = pc.take(col, take_idx)
        out[c + WT_SUFFIX] = pa.array(np.where(alive, win_wt, NEG_INF))
        out[c + SEQ_SUFFIX] = pa.array(np.where(alive, win_seq, NEG_INF))
        if ttl:
            tx = _i64(c + TTLX_SUFFIX, NO_EXPIRY)
            out[c + TTLX_SUFFIX] = pa.array(np.where(alive, tx[wi], NO_EXPIRY))

    out[DEL_WT] = pa.array(del_wt)
    out[DEL_SEQ] = pa.array(del_seq)
    out[ROW_WT] = pa.array(np.where(exists, row_wt, NEG_INF))
    out[ROW_SEQ] = pa.array(np.where(exists, row_seq, NEG_INF))
    out[DELETED] = pa.array(~exists)
    out[MAX_SEQ] = pa.array(np.maximum.reduceat(_i64(MAX_SEQ, NEG_INF), starts))
    if ttl:
        rtx = _i64(ROW_TTLX, NO_EXPIRY)
        out[ROW_TTLX] = pa.array(np.where(exists, rtx[ri], NO_EXPIRY))
    return pa.table(out)


def merge_states(
    a: pd.DataFrame,
    b: pd.DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    counter_cols: Sequence[str] = (),
    ttl: bool = False,
) -> pd.DataFrame:
    """Pairwise convenience wrapper over :func:`merge_state_frames`
    (``ttl`` must be forwarded or expiry state would be silently stripped)."""
    if a.empty:
        return b.copy()
    if b.empty:
        return a.copy()
    return merge_state_frames([a, b], key_cols, payload_cols, counter_cols, ttl=ttl)


def state_to_public(
    state: pd.DataFrame, key_cols: Sequence[str], payload_cols: Sequence[str]
) -> pd.DataFrame:
    """Project internal state to the user-facing table (tombstones dropped)."""
    live = state[~state[DELETED].to_numpy(dtype=bool)]
    return live[[*key_cols, *payload_cols]].reset_index(drop=True)


def apply_ttl_expiry(
    state: pd.DataFrame,
    as_of: int,
    payload_cols: Sequence[str],
    harden: bool = False,
) -> pd.DataFrame:
    """Evaluate per-cell TTL at ``as_of`` µs (reference cells expire in
    Cassandra itself; here expiry is an explicit evaluation point).

    Expired cells read as null — their ``c__wt`` is KEPT so an older
    redelivered event cannot resurrect the value.  A row whose row marker
    expired and has no live cell becomes deleted; with ``harden=True``
    (compaction) it is converted to a regular tombstone at the row's
    writetime, after which normal gc_grace rules apply.
    """
    st = state.copy()
    n = len(st)
    if n == 0:
        return st
    any_live_cell = np.zeros(n, dtype=bool)
    for c in payload_cols:
        tc = c + TTLX_SUFFIX
        if tc not in st.columns:
            any_live_cell |= st[c].notna().to_numpy()
            continue
        ttlx = st[tc].fillna(NO_EXPIRY).to_numpy(dtype=np.int64)
        expired = ttlx <= as_of
        if expired.any():
            dead = st[c].copy()
            dead[expired] = None
            st[c] = dead
        any_live_cell |= st[c].notna().to_numpy()
    if ROW_TTLX in st.columns:
        row_expired = st[ROW_TTLX].fillna(NO_EXPIRY).to_numpy(dtype=np.int64) <= as_of
        deleted = st[DELETED].to_numpy(dtype=bool)
        gone = row_expired & ~any_live_cell & ~deleted
        if gone.any():
            st.loc[gone, DELETED] = True
            if harden:
                rw = st[ROW_WT].to_numpy(dtype=np.int64)
                rs = st[ROW_SEQ].to_numpy(dtype=np.int64)
                st.loc[gone, DEL_WT] = np.maximum(
                    st[DEL_WT].to_numpy(dtype=np.int64)[gone], rw[gone]
                )
                st.loc[gone, DEL_SEQ] = np.maximum(
                    st[DEL_SEQ].to_numpy(dtype=np.int64)[gone], rs[gone]
                )
            st.loc[gone, ROW_WT] = NEG_INF
            st.loc[gone, ROW_SEQ] = NEG_INF
    return st


def compact_tombstones(state: pd.DataFrame, grace_wt: int | None = None) -> pd.DataFrame:
    """Physically drop tombstone rows (the reference's gc_grace analogue).

    A tombstone may only be dropped once no event at or below its writetime can
    ever be redelivered; ``grace_wt`` is that low-watermark (None = drop all,
    for final compaction after the stream is fully drained).
    """
    deleted = state[DELETED].to_numpy(dtype=bool)
    if grace_wt is None:
        keep = ~deleted
    else:
        keep = ~deleted | (state[DEL_WT].to_numpy() >= grace_wt)
    return state[keep].reset_index(drop=True)
