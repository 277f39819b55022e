"""Declared schemas + additive schema evolution.

The reference reflects schemas from live cluster metadata
(/root/reference src/main/java/com/datastax/cdm/schema/CqlTable.java:435-494) and
extends them with virtual columns at runtime (CqlTable.java:214-265).  Here the
schema is *declared*, versioned in the lake manifest, and evolved additively:
a new payload column (e.g. ``tool``) appearing mid-stream is null-backfilled in
all older state.
"""

from __future__ import annotations

import pyarrow as pa

# --- canonical transcripts table (BASELINE.json input_hint) -------------------

KEY_COLS: list[str] = ["conv_id", "turn_idx"]
PAYLOAD_COLS: list[str] = ["role", "text", "tool", "ts"]

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),       # partition key (hash-routed)
        ("turn_idx", pa.int32()),       # clustering key (stable order within conv)
        ("role", pa.string()),
        ("text", pa.string()),          # per-row invariant vs reference: exact equality
        ("tool", pa.string()),          # nullable; the schema-evolution column
        ("ts", pa.timestamp("us")),
    ]
)

# --- change-event envelope ----------------------------------------------------
# writetime is the LWW conflict token (reference: max WRITETIME(col) + increment,
# feature/WritetimeTTL.java:235-281); event_seq is the deterministic tiebreak the
# reference lacks (it leans on Cassandra cell rules + writetimeIncrement,
# WritetimeTTL.java:167-172).

ENVELOPE_COLS: list[str] = ["op", "writetime", "event_seq"]

EVENTS_SCHEMA = pa.schema(
    [
        ("op", pa.string()),            # INSERT | UPSERT | DELETE (INSERT==UPSERT)
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),          # null on DELETE
        ("text", pa.string()),          # null on UPSERT = keep existing (unset)
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("writetime", pa.int64()),      # microseconds
        ("event_seq", pa.int64()),      # global monotonic; tiebreak + watermark
    ]
)

# Internal per-column LWW bookkeeping suffixes used in lake state frames.
WT_SUFFIX = "__wt"
SEQ_SUFFIX = "__seq"
TTLX_SUFFIX = "__ttlx"  # per-cell expiry timestamp (µs); NO_EXPIRY = never
ROW_TTLX = "__row_ttlx"
DEL_WT = "__del_wt"
DEL_SEQ = "__del_seq"
ROW_WT = "__row_wt"
ROW_SEQ = "__row_seq"
DELETED = "__deleted"
MAX_SEQ = "__max_seq"  # max event_seq ever folded into the key (watermark basis)

# Sentinel "minus infinity" for wt/seq bookkeeping (never collides with real
# microsecond timestamps or sequence numbers, both of which are >= 0).
NEG_INF = -(2**62)
# Sentinel expiry for cells written without TTL (reference: no USING TTL).
NO_EXPIRY = 2**62


def state_schema(
    payload_schema: pa.Schema,
    key_cols: list[str] | None = None,
    ttl: bool = False,
) -> pa.Schema:
    """Lake *internal* schema for a given public payload schema.

    Per payload column c we persist c, c__wt, c__seq (cell-level LWW, mirroring
    Cassandra's per-cell timestamps that the reference reads via WRITETIME(c)),
    plus row-level tombstone + liveness markers.
    """
    key_cols = KEY_COLS if key_cols is None else key_cols
    fields: list[pa.Field] = []
    names = payload_schema.names
    for name in names:
        fields.append(payload_schema.field(name))
        if name not in key_cols:
            fields.append(pa.field(name + WT_SUFFIX, pa.int64()))
            fields.append(pa.field(name + SEQ_SUFFIX, pa.int64()))
            if ttl:
                fields.append(pa.field(name + TTLX_SUFFIX, pa.int64()))
    fields += [
        pa.field(DEL_WT, pa.int64()),
        pa.field(DEL_SEQ, pa.int64()),
        pa.field(ROW_WT, pa.int64()),
        pa.field(ROW_SEQ, pa.int64()),
        pa.field(DELETED, pa.bool_()),
        pa.field(MAX_SEQ, pa.int64()),
    ]
    if ttl:
        fields.append(pa.field(ROW_TTLX, pa.int64()))
    return pa.schema(fields)


def align_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Additive schema evolution: project ``table`` onto ``schema``.

    Missing columns are null-backfilled; extra columns are dropped; types are
    cast (safe casts only).  This replaces the reference's runtime
    ``extendColumns`` (CqlTable.java:226-265): every batch is normalized to the
    current manifest schema *before* the shuffle, so heterogeneous mid-stream
    batches merge cleanly.
    """
    arrays = []
    n = table.num_rows
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def sanitize_lists_for_parquet(tbl: pa.Table) -> pa.Table:
    """Storage codec for VECTOR columns (CQL VECTOR → fixed_size_list,
    reference data/CqlData.java:36-38): pyarrow (≤16) cannot write a
    fixed_size_list with null slots to parquet — FSL layout allocates
    ``dim`` child values under every null slot and the writer rejects
    "lists with non-zero length null components".  Convert each top-level
    FSL column to a canonical variable list whose null entries have ZERO
    length; reads restore the declared fixed_size_list type via
    ``align_to_schema`` (list→FSL cast re-validates element counts).
    Structs containing FSL fields are out of scope (as is multi-level
    nesting) — same boundary the reference draws for frozen UDT vectors."""
    import numpy as np
    import pyarrow.compute as pc

    for i, field in enumerate(tbl.schema):
        if not pa.types.is_fixed_size_list(field.type):
            continue
        col = tbl.column(i).combine_chunks()
        lst = col.cast(pa.list_(field.type.value_type))
        valid = pc.is_valid(lst).to_numpy(zero_copy_only=False).astype(bool)
        if valid.all():
            tbl = tbl.set_column(i, field.name, lst)
            continue
        lens = (
            pc.fill_null(pc.list_value_length(lst), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        offs = np.r_[0, np.cumsum(np.where(valid, lens, 0))]
        values = pc.list_flatten(lst)  # values of valid slots only
        offsets = pa.array(offs, pa.int32(), mask=np.r_[~valid, False])
        tbl = tbl.set_column(
            i, field.name, pa.ListArray.from_arrays(offsets, values)
        )
    return tbl


def write_parquet_atomic(tbl: pa.Table, path: str, compression: str = "zstd") -> None:
    """THE lake parquet writer: every state/CDF file goes through here so no
    write site can forget the VECTOR storage codec (sanitize) or the
    tmp-then-rename atomicity that makes retried writes byte-identical."""
    import os

    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(sanitize_lists_for_parquet(tbl), tmp, compression=compression)
    os.replace(tmp, path)


def payload_cols_of(schema: pa.Schema, key_cols: list[str] | None = None) -> list[str]:
    key_cols = KEY_COLS if key_cols is None else key_cols
    return [n for n in schema.names if n not in key_cols]
