"""The reference's feature chain as composable, vectorized Arrow transforms.

Each transform is a small callable ``pa.Table -> pa.Table`` meant for
``ds.map_batches(t, batch_format="pyarrow")``, mirroring the reference's
Feature plugin surface (/root/reference src/main/java/com/datastax/cdm/
feature/Feature.java:21-58, registry Featureset.java:18-21): transforms are
registered by name and built from plain config dicts, so a pipeline is data.

Operator parity map (SURVEY.md §2.2/§2.3/§2.9):
  Rename        — M1 column rename/projection (data/DataUtility.java:71-140)
  CastColumns   — M2/§2.9 codec conversions   (data/CqlConversion.java:87-113)
  Constant      — M3 constant columns          (feature/ConstantColumns.java:32-148)
  ExplodeMap    — M4 map → one row per entry   (feature/ExplodeMap.java:181-186)
  ExtractJson   — M5 JSON field extraction     (feature/ExtractJson.java:132-138)
  WritetimeMax  — M6/A2 max-writetime compute  (feature/WritetimeTTL.java:235-281)
  FillNulls     — M7 null-PK defaulting        (schema/CqlTable.java:375-400)
  MapScrubNulls — M8 drop null-valued map keys (schema/CqlTable.java:348-350)
  DropNullKeys  — M9 record validity gate      (data/EnhancedPK.java:130-152)
  WritetimeWindow — F4 writetime range filter  (cql/statement/OriginSelectStatement.java:117-129)
  ValueSkipFilter — F5 trim/case-insens skip   (OriginSelectStatement.java:104-115)
  FilterExpr    — F3 WHERE pushdown            (feature/OriginFilterCondition.java:25-77)
  CoverageSample — F2 coverage-percent         (job/SplitPartitions.java:66-68)
  ByteSizeGuard — guardrail column size check  (feature/Guardrail.java:88-125)
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Rename:
    """M1: explicit old:new pairs; unmapped columns keep their names."""

    def __init__(self, mapping: Mapping[str, str]):
        self.mapping = dict(mapping)

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.rename_columns([self.mapping.get(c, c) for c in t.column_names])


class Select:
    """M1/F6: projection / column skip-list."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.select(self.columns)


class Constant:
    """M3: append configured literal columns (may later join the PK)."""

    def __init__(self, values: Mapping[str, object], types: Mapping[str, str] | None = None):
        self.values = dict(values)
        self.types = dict(types or {})

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        for name, v in self.values.items():
            typ = _dtype(self.types.get(name))
            arr = pa.array([v] * n, type=typ) if typ else pa.array([v] * n)
            t = t.append_column(name, arr)
        return t


def _dtype(s: str | None):
    if s is None:
        return None
    m = {
        "string": pa.string(),
        "int32": pa.int32(),
        "int64": pa.int64(),
        "float64": pa.float64(),
        "bool": pa.bool_(),
        "timestamp[us]": pa.timestamp("us"),
        "binary": pa.binary(),
        "decimal": pa.decimal128(38, 9),
        "varint": pa.decimal128(38, 0),
    }
    return m[s]


class CastColumns:
    """M2/§2.9: per-column type-bridging codecs.

    Supported codec names mirror the reference codec set
    (cql/codec/Codecset.java:33-35): plain arrow casts (int↔string,
    double↔string, bigint↔string, decimal↔string), timestamp↔epoch-millis
    string, timestamp↔formatted string (pattern via strftime/strptime),
    text↔blob / ascii↔blob (utf8↔binary), varint↔bigint
    (cql/codec/BIGINT_BigIntegerCodec.java: decimal128(38,0)↔int64,
    checked on the narrowing side).
    """

    def __init__(self, casts: Mapping[str, str]):
        self.casts = dict(casts)

    def _one(self, col: pa.ChunkedArray, spec: str) -> pa.ChunkedArray | pa.Array:
        if spec.startswith("timestamp_string_format:"):
            fmt = spec.split(":", 1)[1]
            # second-precision render (Arrow's %S appends subseconds at us)
            return pc.strftime(pc.cast(col, pa.timestamp("s")), format=fmt)
        if spec.startswith("string_timestamp_format:"):
            fmt = spec.split(":", 1)[1]
            return pc.strptime(col, format=fmt, unit="us")
        if spec == "timestamp_string_millis":
            ms = pc.divide(pc.cast(col, pa.int64()), 1000)
            return pc.cast(ms, pa.string())
        if spec == "string_timestamp_millis":
            us = pc.multiply(pc.cast(col, pa.int64()), 1000)
            return pc.cast(us, pa.timestamp("us"))
        if spec in ("text_blob", "ascii_blob"):
            return pc.cast(col, pa.binary())
        if spec in ("blob_text", "blob_ascii"):
            return pc.cast(col, pa.string())
        # VARINT (arbitrary-precision integer) ↔ BIGINT bridge
        # (cql/codec/BIGINT_BigIntegerCodec.java): VARINT is stored as
        # decimal128(38,0) — covers every int64 losslessly; the reverse cast
        # is checked (Arrow safe cast ≈ BigInteger.longValueExact: a varint
        # beyond int64 raises instead of wrapping).
        if spec == "bigint_varint":
            return pc.cast(col, pa.decimal128(38, 0))
        if spec == "varint_bigint":
            return pc.cast(col, pa.int64())
        if spec in _GEO_CODECS:
            return _GEO_CODECS[spec](col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return pc.cast(col, _dtype(spec))

    def __call__(self, t: pa.Table) -> pa.Table:
        for name, spec in self.casts.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, self._one(t.column(name), spec))
        return t


# ---- geo / duration / date-range codecs --------------------------------------
# The reference bridges Cassandra's exotic types through codecs
# (data/CqlData.java:42-70, cql/codec/CodecFactory.java:29-64): POINT /
# LINE_STRING / POLYGON render as WKT strings, DURATION as the compact
# months/days/nanos form, DATE_RANGE as "[lo TO hi]".  Arrow representations:
# point = struct<x: double, y: double>; linestring / polygon(single ring) =
# list<point>; duration = struct<months: int32, days: int32, nanos: int64>;
# daterange = struct<lo: timestamp[us], hi: timestamp[us]>.  All codecs are
# vectorized Arrow kernels (joins / regex extract / offsets rebuild).


def _xy_text(flat_struct) -> pa.Array:
    xs = pc.cast(flat_struct.field("x"), pa.string())
    ys = pc.cast(flat_struct.field("y"), pa.string())
    return pc.binary_join_element_wise(xs, ys, " ")


def _point_wkt(col: pa.Array) -> pa.Array:
    out = pc.binary_join_element_wise(
        pa.array(["POINT ("] * len(col)), _xy_text(col), pa.array([")"] * len(col)), ""
    )
    return pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)


def _field_or_null(g, name: str) -> pa.Array:
    """extract_regex struct field with the parent's validity applied (a null
    parent row can carry '' in the child, which breaks numeric casts)."""
    return pc.if_else(pc.is_valid(g), g.field(name), pa.scalar(None, pa.string()))


def _wkt_point(col: pa.Array) -> pa.Array:
    g = pc.extract_regex(col, r"POINT \((?P<x>[^ ]+) (?P<y>[^)]+)\)")
    nulls = pc.is_null(g)
    nulls = nulls.combine_chunks() if isinstance(nulls, pa.ChunkedArray) else nulls
    return pa.StructArray.from_arrays(
        [
            pc.cast(_field_or_null(g, "x"), pa.float64()),
            pc.cast(_field_or_null(g, "y"), pa.float64()),
        ],
        ["x", "y"],
        mask=nulls,
    )


def _coords_join(col: pa.Array) -> pa.Array:
    """list<struct<x,y>> → 'x y, x y, ...' per row."""
    off = np.asarray(col.offsets)
    flat = col.values.slice(int(off[0]), int(off[-1] - off[0]))
    txt = _xy_text(flat)
    lst = pa.ListArray.from_arrays(pa.array(off - off[0], pa.int32()), txt)
    return pc.binary_join(lst, ", ")


def _coords_parse(body: pa.Array) -> pa.Array:
    """'x y, x y, ...' per row → list<struct<x,y>> (offsets rebuild).

    Null body rows become null lists; empty bodies ('LINESTRING ()') become
    empty lists — split_pattern would otherwise turn '' into [''].
    """
    body = body.combine_chunks() if isinstance(body, pa.ChunkedArray) else body
    null_np = pc.is_null(body).to_numpy(zero_copy_only=False).astype(bool)
    filled = pc.fill_null(body, "")
    degenerate = pc.equal(filled, "").to_numpy(zero_copy_only=False).astype(bool)
    pairs = pc.split_pattern(filled, ", ")
    pairs = pairs.combine_chunks() if isinstance(pairs, pa.ChunkedArray) else pairs
    off = np.asarray(pairs.offsets)
    flat = pairs.values.slice(int(off[0]), int(off[-1] - off[0]))
    # each degenerate row contributed exactly one '' element — drop it
    if degenerate.any():
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[degenerate]] = False
        flat = flat.filter(pa.array(keep))
    lengths = np.diff(off)
    lengths[degenerate] = 0
    new_off = np.concatenate([[0], np.cumsum(lengths)])
    xy = pc.split_pattern(flat, " ")
    pts = pa.StructArray.from_arrays(
        [
            pc.cast(pc.list_element(xy, 0), pa.float64()),
            pc.cast(pc.list_element(xy, 1), pa.float64()),
        ],
        ["x", "y"],
    )
    off_arr = pa.array(
        new_off.astype(np.int32), pa.int32(), mask=np.concatenate([null_np, [False]])
    )
    return pa.ListArray.from_arrays(off_arr, pts)


def _wrap(col: pa.Array, prefix: str, suffix: str) -> pa.Array:
    out = pc.binary_join_element_wise(
        pa.array([prefix] * len(col)), col, pa.array([suffix] * len(col)), ""
    )
    return pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)


def _unwrap_regex(col: pa.Array, pattern: str) -> pa.Array:
    g = pc.extract_regex(col, pattern)
    g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
    return _field_or_null(g, "body")


def _with_validity(col: pa.Array, out: pa.Array) -> pa.Array:
    """Re-apply ``col``'s null mask (offsets arithmetic drops list validity)."""
    return pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)


def _linestring_wkt(col: pa.Array) -> pa.Array:
    return _with_validity(col, _wrap(_coords_join(col), "LINESTRING (", ")"))


def _wkt_linestring(col: pa.Array) -> pa.Array:
    return _coords_parse(_unwrap_regex(col, r"LINESTRING \((?P<body>.*)\)"))


def _polygon_wkt(col: pa.Array) -> pa.Array:
    """Single-ring polygon (list<point>) → 'POLYGON ((x y, ...))'.  For
    polygons with interior rings use the multi codec below (one-ring values
    render byte-identically through either)."""
    return _with_validity(col, _wrap(_coords_join(col), "POLYGON ((", "))"))


def _wkt_polygon(col: pa.Array) -> pa.Array:
    return _coords_parse(_unwrap_regex(col, r"POLYGON \(\((?P<body>.*)\)\)"))


def _polygon_multi_wkt(col: pa.Array) -> pa.Array:
    """Multi-ring polygon (list<list<point>>, first ring = exterior) →
    'POLYGON ((x y, ...), (x y, ...))' — the DSE driver's full polygon shape
    (cql/codec/CodecFactory.java:52-58).  Zero-ring values render null (WKT
    has no 'POLYGON ()' form).  Fully vectorized: flatten rings, join
    coordinates per ring, rebuild the outer list by cumulative ring counts."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    null_np = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool)
    lens = (
        pc.fill_null(pc.list_value_length(col), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    rings = pc.list_flatten(col)  # non-null rows' rings, concatenated
    rings = rings.combine_chunks() if isinstance(rings, pa.ChunkedArray) else rings
    ring_txt = _wrap(_coords_join(rings), "(", ")") if len(rings) else pa.array(
        [], pa.string()
    )
    off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lst = pa.ListArray.from_arrays(pa.array(off, pa.int32()), ring_txt)
    out = _wrap(pc.binary_join(lst, ", "), "POLYGON (", ")")
    bad = null_np | (lens == 0)
    return pc.if_else(pa.array(bad), pa.scalar(None, pa.string()), out)


def _wkt_polygon_multi(col: pa.Array) -> pa.Array:
    """'POLYGON ((...), (...))' → list<list<point>>.  Mirrors _coords_parse's
    degenerate-row handling: the split of a filled-null body yields one ''
    element, which is dropped and its row length zeroed so masked-null
    offsets never absorb a neighbor's rings."""
    body = _unwrap_regex(col, r"POLYGON \(\((?P<body>.*)\)\)")
    body = body.combine_chunks() if isinstance(body, pa.ChunkedArray) else body
    null_np = pc.is_null(body).to_numpy(zero_copy_only=False).astype(bool)
    filled = pc.fill_null(body, "")
    degenerate = pc.equal(filled, "").to_numpy(zero_copy_only=False).astype(bool)
    rings = pc.split_pattern(filled, "), (")
    rings = rings.combine_chunks() if isinstance(rings, pa.ChunkedArray) else rings
    off = np.asarray(rings.offsets)
    flat = rings.values.slice(int(off[0]), int(off[-1] - off[0]))
    if degenerate.any():  # each degenerate row contributed exactly one ''
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[degenerate]] = False
        flat = flat.filter(pa.array(keep))
    lengths = np.diff(off)
    lengths[degenerate] = 0
    new_off = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    inner = _coords_parse(flat)
    off_arr = pa.array(
        new_off, pa.int32(), mask=np.concatenate([null_np | degenerate, [False]])
    )
    return pa.ListArray.from_arrays(off_arr, inner)


def _duration_string(col: pa.Array) -> pa.Array:
    """struct<months, days, nanos> → compact 'XmoYdZns' (CqlDuration shape)."""
    mo = pc.cast(col.field("months"), pa.string())
    d = pc.cast(col.field("days"), pa.string())
    ns = pc.cast(col.field("nanos"), pa.string())
    n = len(col)
    out = pc.binary_join_element_wise(
        mo, pa.array(["mo"] * n), d, pa.array(["d"] * n), ns, pa.array(["ns"] * n), ""
    )
    return pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)


def _string_duration(col: pa.Array) -> pa.Array:
    g = pc.extract_regex(col, r"(?P<mo>-?\d+)mo(?P<d>-?\d+)d(?P<ns>-?\d+)ns")
    g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
    nulls = pc.is_null(g)
    return pa.StructArray.from_arrays(
        [
            pc.cast(_field_or_null(g, "mo"), pa.int32()),
            pc.cast(_field_or_null(g, "d"), pa.int32()),
            pc.cast(_field_or_null(g, "ns"), pa.int64()),
        ],
        ["months", "days", "nanos"],
        mask=nulls,
    )


def _to_seconds(ts: pa.Array) -> pa.Array:
    """timestamp[any] → timestamp[s], truncating sub-second parts (the
    DateRange text form is second-precision by design; a safe cast would
    instead abort on any real microsecond-precision value)."""
    us = pc.cast(ts, pa.timestamp("us")).cast(pa.int64())
    return pc.cast(pc.divide(us, 1_000_000), pa.timestamp("s"))


def _daterange_string(col: pa.Array) -> pa.Array:
    """struct<lo: timestamp, hi: timestamp> → '[lo TO hi]' (DSE DateRange)."""
    lo = pc.strftime(_to_seconds(col.field("lo")), format="%Y-%m-%dT%H:%M:%S")
    hi = pc.strftime(_to_seconds(col.field("hi")), format="%Y-%m-%dT%H:%M:%S")
    n = len(col)
    out = pc.binary_join_element_wise(
        pa.array(["["] * n), lo, pa.array([" TO "] * n), hi, pa.array(["]"] * n), ""
    )
    return pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)


def _string_daterange(col: pa.Array) -> pa.Array:
    g = pc.extract_regex(col, r"\[(?P<lo>[^ ]+) TO (?P<hi>[^\]]+)\]")
    g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
    nulls = pc.is_null(g)
    return pa.StructArray.from_arrays(
        [
            pc.strptime(_field_or_null(g, "lo"), format="%Y-%m-%dT%H:%M:%S", unit="us"),
            pc.strptime(_field_or_null(g, "hi"), format="%Y-%m-%dT%H:%M:%S", unit="us"),
        ],
        ["lo", "hi"],
        mask=nulls,
    )


_GEO_CODECS = {
    "point_wkt": _point_wkt,
    "wkt_point": _wkt_point,
    "linestring_wkt": _linestring_wkt,
    "wkt_linestring": _wkt_linestring,
    "polygon_wkt": _polygon_wkt,
    "wkt_polygon": _wkt_polygon,
    "polygon_multi_wkt": _polygon_multi_wkt,
    "wkt_polygon_multi": _wkt_polygon_multi,
    "duration_string": _duration_string,
    "string_duration": _string_duration,
    "daterange_string": _daterange_string,
    "string_daterange": _string_daterange,
}


def _map_entries(col: pa.Array) -> tuple[np.ndarray, pa.StructArray]:
    """(parent row index, flattened entries) for a Map/List-of-struct array.

    Computed from the offsets buffer with numpy (pc.list_parent_indices
    aborts on MapArray in this pyarrow build).
    """
    off = np.asarray(col.offsets)
    counts = np.diff(off)
    parent = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    # .values ignores array-level slicing; window it to this array's span
    entries = col.values.slice(int(off[0]), int(off[-1] - off[0]))
    return parent, entries


class ExplodeMap:
    """M4: one output row per map entry; key/value become two columns.

    Arrow-native offsets arithmetic + take (no Python row loop), matching
    the reference's row multiplication (data/PKFactory.java:241-254).
    """

    def __init__(self, map_col: str, key_col: str, value_col: str, keep_map: bool = False):
        self.map_col, self.key_col, self.value_col = map_col, key_col, value_col
        self.keep_map = keep_map

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.map_col).combine_chunks()
        idx, flat = _map_entries(col)
        base = t.remove_column(t.column_names.index(self.map_col)) if not self.keep_map else t
        out = base.take(pa.array(idx))
        out = out.append_column(self.key_col, flat.field(0))
        out = out.append_column(self.value_col, flat.field(1))
        return out


class MapScrubNulls:
    """M8: drop map entries whose value is null (per-batch Arrow rebuild)."""

    def __init__(self, map_col: str):
        self.map_col = map_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.map_col).combine_chunks()
        typ = col.type
        idx, flat = _map_entries(col)
        keep = pc.is_valid(flat.field(1))
        keep_np = np.asarray(keep)
        kept_idx = idx[keep_np]
        kept = flat.filter(keep)
        counts = np.bincount(kept_idx, minlength=len(t))
        offsets = np.zeros(len(t) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        # preserve null map rows (null ≠ empty map) via null offsets
        null_np = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool)
        off_arr = pa.array(
            offsets,
            type=pa.int32(),
            mask=np.concatenate([null_np, [False]]) if null_np.any() else None,
        )
        rebuilt = pa.MapArray.from_arrays(
            off_arr, kept.field(0), kept.field(1), type=typ
        )
        return t.set_column(t.column_names.index(self.map_col), self.map_col, rebuilt)


class ExtractJson:
    """M5: parse a JSON text column, extract one field into a target column.

    ``overwrite=False`` preserves an already-set target (the reference's
    diff-side skip-if-target-set, job/DiffJobSession.java:265-270).
    """

    def __init__(self, src_col: str, field: str, dst_col: str, overwrite: bool = True):
        self.src_col, self.field, self.dst_col, self.overwrite = (
            src_col,
            field,
            dst_col,
            overwrite,
        )

    # Anchored RE2 shape of a FLAT json object with escape-free keys/values
    # (string/number/bool/null scalars only, no nesting, no backslash
    # escapes).  Docs matching this shape are provably safe for regex field
    # extraction: the field can only occur top-level, string values carry no
    # escapes, and validity is guaranteed — so the fast path is EXACTLY
    # json.loads-equivalent.  RE2 has no lookahead, hence the pair-list form.
    # strings exclude raw control chars (json.loads strict mode rejects
    # them); numbers follow the JSON grammar exactly (no leading zeros,
    # digits required after '.') — otherwise the fast path would extract
    # values from docs the loads path rejects as invalid
    _STR = r'"[^"\\\x00-\x1f]*"'
    _NUM = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
    _SCALAR = r"(?:" + _STR + r"|" + _NUM + r"|true|false|null)"
    _PAIR = _STR + r"\s*:\s*" + _SCALAR
    FLAT_RE = r"^\{\s*(?:" + _PAIR + r"(?:\s*,\s*" + _PAIR + r")*\s*)?\}$"

    def __call__(self, t: pa.Table) -> pa.Table:
        import re as _re

        src_col = t.column(self.src_col)
        n = t.num_rows
        f_re = _re.escape(self.field)
        flat = pc.fill_null(pc.match_substring_regex(src_col, self.FLAT_RE), False)
        occurs = pc.fill_null(
            pc.count_substring_regex(src_col, f'"{f_re}"\\s*:'), 0
        ).to_numpy(zero_copy_only=False)
        has_np_all = occurs >= 1
        # duplicate keys: json.loads keeps the LAST occurrence, the regex
        # extracts the first — send those (pathological) rows to the slow path
        sv = pc.struct_field(
            pc.extract_regex(
                src_col, f'"{f_re}"\\s*:\\s*"(?P<v>[^"\\\\\\x00-\\x1f]*)"'
            ),
            "v",
        )
        flat_np = flat.to_numpy(zero_copy_only=False).astype(bool)
        str_hit = pc.is_valid(sv).to_numpy(zero_copy_only=False).astype(bool)
        # fast rows: provably-flat doc AND (field absent → null, or field
        # present EXACTLY ONCE as a string scalar → extracted value).
        # Present-but-non-string fields fall back (str(v) of a parsed
        # number/bool is not the raw token, e.g. 1e3 → "1000.0").
        fast = flat_np & (~has_np_all | ((occurs == 1) & str_hit))
        sva = pc.cast(sv, pa.string())
        if isinstance(sva, pa.ChunkedArray):
            sva = sva.combine_chunks()
        if fast.all():
            # all-fast batch: the extracted column IS the answer — return it
            # as Arrow; never materialize a Python list on the hot path
            arr = sva
        else:
            # slow minority only: gather just those rows' source strings,
            # json-parse them, and splice the results back with one
            # replace_with_mask — the fast majority stays zero-copy Arrow
            slow_idx = np.flatnonzero(~fast)
            src = pc.take(src_col, pa.array(slow_idx, pa.int64())).to_pylist()
            slow_vals: list = []
            for s in src:
                if s is None or s == "":
                    slow_vals.append(None)
                    continue
                try:
                    v = json.loads(s)
                except (ValueError, TypeError):
                    slow_vals.append(None)
                    continue
                v = v.get(self.field) if isinstance(v, dict) else None
                slow_vals.append(
                    None if v is None else str(v) if not isinstance(v, str) else v
                )
            arr = pc.replace_with_mask(
                sva, pa.array(~fast), pa.array(slow_vals, type=pa.string())
            )
        if self.dst_col in t.column_names:
            if not self.overwrite:
                arr = pc.coalesce(t.column(self.dst_col), arr)
            return t.set_column(t.column_names.index(self.dst_col), self.dst_col, arr)
        return t.append_column(self.dst_col, arr)


def _list_row_max(col: pa.Array) -> pa.Array:
    """Per-row max of a list<int64> column (collection writetimes — reference
    WritetimeTTL.java:247-258 flattens a collection's cell writetimes and
    takes the max).  Empty and null lists yield null; null elements are
    ignored.  Offsets + reduceat, no per-row Python."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.asarray(col.offsets)
    flat = col.values.slice(int(off[0]), int(off[-1] - off[0]))
    v = pc.fill_null(pc.cast(flat, pa.int64()), np.iinfo(np.int64).min).to_numpy(
        zero_copy_only=False
    )
    starts = (off[:-1] - off[0]).astype(np.int64)
    lengths = np.diff(off)
    n = len(col)
    out = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
    nonempty = lengths > 0
    if nonempty.any() and len(v):
        # reduceat over nonempty rows' starts only — empty rows would
        # otherwise shift segment boundaries
        out[nonempty] = np.maximum.reduceat(v, starts[nonempty])
    null_np = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool)
    invalid = null_np | ~nonempty | (out == np.iinfo(np.int64).min)
    return pa.array(out, pa.int64(), mask=invalid)


class WritetimeMax:
    """M6/A2: writetime = element-wise max over N source writetime columns
    (+ configured increment); same shape for TTL.  List-typed sources
    (collection writetimes) are reduced to their per-row max first."""

    def __init__(self, cols: Sequence[str], out_col: str = "writetime", increment: int = 0):
        self.cols, self.out_col, self.increment = list(cols), out_col, increment

    def __call__(self, t: pa.Table) -> pa.Table:
        arrs = [
            _list_row_max(a) if pa.types.is_list(a.type) else a
            for a in (t.column(c) for c in self.cols)
        ]
        m = arrs[0] if len(arrs) == 1 else pc.max_element_wise(*arrs)
        if self.increment:
            m = pc.add(m, self.increment)
        if self.out_col in t.column_names:
            return t.set_column(t.column_names.index(self.out_col), self.out_col, m)
        return t.append_column(self.out_col, m)


class FillNulls:
    """M7: per-column null defaulting."""

    def __init__(self, defaults: Mapping[str, object]):
        self.defaults = dict(defaults)

    def __call__(self, t: pa.Table) -> pa.Table:
        for name, v in self.defaults.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, pc.fill_null(t.column(name), v))
        return t


class DropNullKeys:
    """M9: drop rows whose PK columns contain nulls (validity gate)."""

    def __init__(self, key_cols: Sequence[str]):
        self.key_cols = list(key_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = None
        for c in self.key_cols:
            v = pc.is_valid(t.column(c))
            mask = v if mask is None else pc.and_(mask, v)
        return t.filter(mask)


class WritetimeWindow:
    """F4: keep rows whose writetime ∈ [lo, hi] — the incremental-window filter."""

    def __init__(self, lo: int | None = None, hi: int | None = None, col: str = "writetime"):
        self.lo, self.hi, self.col = lo, hi, col

    def __call__(self, t: pa.Table) -> pa.Table:
        c = t.column(self.col)
        mask = None
        if self.lo is not None:
            mask = pc.greater_equal(c, self.lo)
        if self.hi is not None:
            hi_m = pc.less_equal(c, self.hi)
            mask = hi_m if mask is None else pc.and_(mask, hi_m)
        return t if mask is None else t.filter(mask)


class ValueSkipFilter:
    """F5: drop rows where trim(col) equalsIgnoreCase(value)."""

    def __init__(self, col: str, value: str):
        self.col, self.value = col, value.lower()

    def __call__(self, t: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(t.column(self.col)))
        keep = pc.fill_null(pc.not_equal(norm, self.value), True)
        return t.filter(keep)


class FilterExpr:
    """F3: user WHERE pushdown as a pyarrow dataset expression string.

    The expression is evaluated against the batch via pa.compute; e.g.
    ``FilterExpr(pc.field('role') != 'system')`` or a prebuilt Expression.
    """

    def __init__(self, expr: "pa.compute.Expression"):
        self.expr = expr

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        return pads.dataset(t).to_table(filter=self.expr)


class CoverageSample:
    """F2: deterministic prefix sampling — keep the first ``percent``% of rows
    per batch by event_seq/key order (the reference truncates each split)."""

    def __init__(self, percent: float, order_col: str = "event_seq"):
        self.fraction = percent / 100.0
        self.order_col = order_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.fraction >= 1.0 or not len(t):
            return t
        k = int(np.ceil(len(t) * self.fraction))
        order = pc.array_sort_indices(t.column(self.order_col))
        return t.take(order[:k])


class ByteSizeGuard:
    """Guardrail: append per-row max encoded column size (KB) + LARGE flag.

    Vectorized via binary/utf8 length kernels (the reference encodes every
    value through its codec and counts bytes, schema/CqlTable.java:327-340).
    """

    def __init__(self, max_kb: float, cols: Sequence[str] | None = None):
        self.max_bytes = max_kb * 1024
        self.cols = list(cols) if cols else None

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = self.cols or [
            f.name
            for f in t.schema
            if pa.types.is_string(f.type)
            or pa.types.is_large_string(f.type)
            or pa.types.is_binary(f.type)
            or pa.types.is_large_binary(f.type)
        ]
        size = None
        for c in cols:
            col = t.column(c)
            # binary_length = ENCODED byte count for both binary and utf8
            # columns (utf8_length counts code points — a 1000-char CJK text
            # would under-measure ~3× and silently pass the guardrail;
            # reference counts encoded bytes, feature/Guardrail.java byteCount)
            ln = pc.binary_length(col)
            ln = pc.fill_null(pc.cast(ln, pa.int64()), 0)
            size = ln if size is None else pc.max_element_wise(size, ln)
        size = size if size is not None else pa.nulls(len(t), pa.int64())
        t = t.append_column("max_col_bytes", size)
        return t.append_column("oversize", pc.greater(size, int(self.max_bytes)))


class UdtFieldMapper:
    """UDT (struct) field-wise mapping: rename / cast / add-constant / drop
    fields inside a struct column, Arrow-native (flatten → per-field kernel →
    StructArray rebuild; row validity preserved).

    Reference: UDTs are converted field-by-field between origin and target
    shapes (data/CqlConversion.java:321-357; SIT features/04_udt_mapper).
    """

    def __init__(
        self,
        col: str,
        rename: Mapping[str, str] | None = None,
        casts: Mapping[str, str] | None = None,
        add: Mapping[str, tuple] | None = None,
        drop: Sequence[str] = (),
    ):
        self.col = col
        self.rename = dict(rename or {})
        self.casts = dict(casts or {})
        self.add = dict(add or {})  # name -> (value, arrow type string)
        self.drop = set(drop)

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t.column(self.col).combine_chunks()
        n = len(arr)
        names: list[str] = []
        arrays: list[pa.Array] = []
        for i, f in enumerate(arr.type):
            if f.name in self.drop:
                continue
            a = arr.field(i)
            if f.name in self.casts:
                a = a.cast(_dtype(self.casts[f.name]))
            names.append(self.rename.get(f.name, f.name))
            arrays.append(a)
        for name, (value, typ) in self.add.items():
            arrays.append(pa.array([value] * n, type=_dtype(typ)))
            names.append(name)
        mask = pc.is_null(arr)
        new = pa.StructArray.from_arrays(
            arrays, names, mask=mask if arr.null_count else None
        )
        return t.set_column(t.column_names.index(self.col), self.col, new)


# ---- Featureset-style registry (feature/Featureset.java:18-21) --------------

TRANSFORM_REGISTRY = {
    "udt_map": UdtFieldMapper,
    "rename": Rename,
    "select": Select,
    "constant": Constant,
    "cast": CastColumns,
    "explode_map": ExplodeMap,
    "map_scrub_nulls": MapScrubNulls,
    "extract_json": ExtractJson,
    "writetime_max": WritetimeMax,
    "fill_nulls": FillNulls,
    "drop_null_keys": DropNullKeys,
    "writetime_window": WritetimeWindow,
    "value_skip": ValueSkipFilter,
    "filter_expr": FilterExpr,
    "coverage_sample": CoverageSample,
    "byte_size_guard": ByteSizeGuard,
}


def build_transforms(specs: Sequence[Mapping]) -> list:
    """Config-driven chain: [{'op': 'rename', 'mapping': {...}}, ...]."""
    out = []
    for spec in specs:
        spec = dict(spec)
        op = spec.pop("op")
        out.append(TRANSFORM_REGISTRY[op](**spec))
    return out


class TTLExpiry:
    """TTL semantics (reference: per-cell TTL via USING TTL + max-TTL compute,
    feature/WritetimeTTL.java:235-281): rows whose ``ttl_col`` (seconds) has
    elapsed relative to ``ts_col`` at ``as_of_us`` are dropped at read time.
    Null TTL = never expires."""

    def __init__(self, as_of_us: int, ts_col: str = "ts", ttl_col: str = "ttl"):
        self.as_of_us, self.ts_col, self.ttl_col = as_of_us, ts_col, ttl_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t[self.ts_col], pa.int64())
        expiry = pc.add(ts_us, pc.multiply(pc.cast(t[self.ttl_col], pa.int64()), 1_000_000))
        keep = pc.fill_null(pc.greater(expiry, self.as_of_us), True)
        return t.filter(keep)


TRANSFORM_REGISTRY["ttl_expiry"] = TTLExpiry
