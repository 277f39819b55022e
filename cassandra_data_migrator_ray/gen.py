"""Deterministic synthetic transcripts change-stream generator + oracle.

Mirrors the reference's SIT corpus shapes (/root/reference/SIT/{smoke,features,
regression}) over the transcripts payload mandated by BASELINE.json: inserts,
updates, deletes, out-of-order writetimes, duplicate deliveries, unset nulls and
hot-conversation skew — all seeded, all vectorized (the bench generates ~10^7
events with this).

``oracle_final_state`` is an *independent*, deliberately naive row-at-a-time
implementation of the LWW semantics (the role of SIT/expected.cql golden files)
used by pytest to validate the vectorized engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA, KEY_COLS, PAYLOAD_COLS

BASE_WT = 1_700_000_000_000_000  # µs epoch base

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "python", "browser", "none", "calc"])


def gen_change_stream(
    n_convs: int = 100,
    n_events: int = 2000,
    seed: int = 42,
    max_turns: int = 32,
    p_delete: float = 0.08,
    p_null_text: float = 0.10,
    p_null_tool: float = 0.30,
    p_duplicate: float = 0.03,
    hot_frac: float = 0.0,
    include_tool: bool = True,
    wt_jitter: int = 10_000_000,
    seq_start: int = 0,
) -> pa.Table:
    """Seeded change stream over the transcripts table.

    ``hot_frac`` > 0 routes that fraction of events into conversation 0
    (the skew axis of the north rule).  Writetimes are jittered so arrival
    order != LWW order (out-of-order/late data).  ``p_duplicate`` re-delivers
    a sample of events verbatim (same event_seq → idempotency exercise).
    """
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    conv_idx = rng.integers(0, n_convs, n_events)
    if hot_frac > 0:
        hot = rng.random(n_events) < hot_frac
        conv_idx = np.where(hot, 0, conv_idx)
    turn_idx = rng.integers(0, max_turns, n_events).astype(np.int32)
    seq = np.arange(seq_start, seq_start + n_events, dtype=np.int64)
    # writetime loosely follows seq but jittered → out-of-order & equal-wt ties
    jitter = (
        rng.integers(-wt_jitter, wt_jitter, n_events)
        if wt_jitter > 0
        else np.zeros(n_events, dtype=np.int64)  # in-order stream
    )
    wt = BASE_WT + seq * 1000 + jitter
    is_del = pa.array(rng.random(n_events) < p_delete)
    upsert = pa.array(rng.random(n_events) < 0.5)

    # Arrow-native string synthesis + null masking (C kernels end to end —
    # the bench generates tens of millions of events through this path)
    op = pc.if_else(
        is_del, pa.scalar("DELETE"), pc.if_else(upsert, pa.scalar("UPSERT"), pa.scalar("INSERT"))
    )
    conv_s = pc.cast(pa.array(conv_idx), pa.string())
    conv_id = pc.binary_join_element_wise("conv", pc.utf8_lpad(conv_s, 7, "0"), "")
    text = pc.binary_join_element_wise(
        "text-c",
        conv_s,
        "-t",
        pc.cast(pa.array(turn_idx), pa.string()),
        "-s",
        pc.cast(pa.array(seq), pa.string()),
        "",
    )
    role = pc.take(pa.array(_ROLES), pa.array(rng.integers(0, len(_ROLES), n_events)))
    tool = pc.take(pa.array(_TOOLS), pa.array(rng.integers(0, len(_TOOLS), n_events)))

    null_s = pa.scalar(None, pa.string())
    null_text = pa.array(rng.random(n_events) < p_null_text)
    null_tool = pa.array(rng.random(n_events) < p_null_tool)
    role = pc.if_else(is_del, null_s, role)
    text = pc.if_else(pc.or_(is_del, null_text), null_s, text)
    tool = pc.if_else(pc.or_(is_del, null_tool), null_s, tool)
    if not include_tool:
        tool = pa.nulls(n_events, pa.string())

    table = pa.table(
        {
            "op": op,
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(wt.astype("datetime64[us]")),
            "writetime": pa.array(wt),
            "event_seq": pa.array(seq),
        }
    ).cast(EVENTS_SCHEMA)
    if p_duplicate > 0:
        k = int(n_events * p_duplicate)
        if k:
            # re-deliver a sample verbatim; no global permutation needed — the
            # LWW order token is (writetime, event_seq), not arrival order, and
            # writetime jitter already provides out-of-order arrival
            dup_idx = rng.integers(0, n_events, k)
            take = np.concatenate([np.arange(n_events), dup_idx])
            table = table.take(pa.array(take))
    return table.combine_chunks()


def oracle_final_state(events: pa.Table | pd.DataFrame) -> pd.DataFrame:
    """Independent row-at-a-time LWW oracle (golden-file role).

    Applies events in global (writetime, event_seq) order: DELETE removes the
    row; a non-null payload cell overwrites; a null cell is 'unset' (keeps the
    existing value).  Returns the public final table sorted by (conv_id,
    turn_idx).
    """
    df = events.to_pandas() if isinstance(events, pa.Table) else events.copy()
    payloads = [c for c in PAYLOAD_COLS if c in df.columns]
    df = df.sort_values(["writetime", "event_seq"], kind="mergesort")
    state: dict[tuple, dict] = {}
    for row in df.itertuples(index=False):
        key = (row.conv_id, row.turn_idx)
        if row.op == "DELETE":
            state.pop(key, None)
            continue
        cur = state.setdefault(key, {})
        for c in payloads:
            v = getattr(row, c)
            if v is not None and not (isinstance(v, float) and np.isnan(v)) and not pd.isna(v):
                cur[c] = v
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **{c: v.get(c) for c in payloads}}
        for k, v in state.items()
    ]
    out = pd.DataFrame(rows, columns=[*KEY_COLS, *payloads])
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    if "ts" in out.columns:
        out["ts"] = pd.to_datetime(out["ts"])
    return out.sort_values(KEY_COLS, kind="mergesort", ignore_index=True)
