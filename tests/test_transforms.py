"""Unit tests per transform kernel (reference feature-test parity, SURVEY §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cassandra_data_migrator_ray.functions.transforms import (
    ByteSizeGuard,
    CastColumns,
    Constant,
    CoverageSample,
    DropNullKeys,
    ExplodeMap,
    ExtractJson,
    FillNulls,
    FilterExpr,
    MapScrubNulls,
    Rename,
    Select,
    ValueSkipFilter,
    WritetimeMax,
    WritetimeWindow,
    build_transforms,
)


def T(**cols):
    return pa.table(cols)


class TestProjection:
    def test_rename(self):
        t = Rename({"a": "x"})(T(a=[1], b=[2]))
        assert t.column_names == ["x", "b"]

    def test_select(self):
        t = Select(["b"])(T(a=[1], b=[2]))
        assert t.column_names == ["b"]

    def test_constant(self):
        t = Constant({"env": "prod"}, {"env": "string"})(T(a=[1, 2]))
        assert t["env"].to_pylist() == ["prod", "prod"]


class TestCasts:
    def test_int_string_roundtrip(self):
        t = CastColumns({"a": "string"})(T(a=[1, 2]))
        assert t["a"].to_pylist() == ["1", "2"]
        t2 = CastColumns({"a": "int64"})(t)
        assert t2["a"].to_pylist() == [1, 2]

    def test_timestamp_millis_string(self):
        ts = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))
        t = CastColumns({"ts": "timestamp_string_millis"})(pa.table({"ts": ts}))
        assert t["ts"].to_pylist() == ["1700000000000"]
        back = CastColumns({"ts": "string_timestamp_millis"})(t)
        assert back["ts"].cast(pa.int64()).to_pylist() == [1_700_000_000_000_000]

    def test_timestamp_format(self):
        ts = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))
        t = CastColumns({"ts": "timestamp_string_format:%Y-%m-%d %H:%M:%S"})(
            pa.table({"ts": ts})
        )
        assert t["ts"].to_pylist() == ["2023-11-14 22:13:20"]
        back = CastColumns({"ts": "string_timestamp_format:%Y-%m-%d %H:%M:%S"})(t)
        assert back["ts"].type == pa.timestamp("us")

    def test_text_blob(self):
        t = CastColumns({"a": "text_blob"})(T(a=["hi"]))
        assert t["a"].type == pa.binary()
        assert CastColumns({"a": "blob_text"})(t)["a"].to_pylist() == ["hi"]


class TestExplodeMap:
    def _map_table(self):
        m = pa.array(
            [[("k1", "v1"), ("k2", "v2")], [("k3", "v3")], []],
            type=pa.map_(pa.string(), pa.string()),
        )
        return pa.table({"conv_id": ["a", "b", "c"], "meta": m})

    def test_explode(self):
        out = ExplodeMap("meta", "meta_key", "meta_value")(self._map_table())
        assert len(out) == 3  # 2 + 1 + 0 entries
        assert out["meta_key"].to_pylist() == ["k1", "k2", "k3"]
        assert out["conv_id"].to_pylist() == ["a", "a", "b"]
        assert "meta" not in out.column_names

    def test_scrub_null_map_values(self):
        m = pa.array(
            [[("k1", "v1"), ("k2", None)], [("k3", None)]],
            type=pa.map_(pa.string(), pa.string()),
        )
        t = pa.table({"id": [1, 2], "meta": m})
        out = MapScrubNulls("meta")(t)
        assert out["meta"].to_pylist() == [[("k1", "v1")], []]


class TestExtractJson:
    def test_extract(self):
        t = T(props=['{"intent": "search", "n": 3}', "", None, "{bad"])
        out = ExtractJson("props", "intent", "tool")(t)
        assert out["tool"].to_pylist() == ["search", None, None, None]

    def test_no_overwrite(self):
        t = T(props=['{"intent": "x"}', '{"intent": "y"}'], tool=["set", None])
        out = ExtractJson("props", "intent", "tool", overwrite=False)(t)
        assert out["tool"].to_pylist() == ["set", "y"]

    def test_non_string_field_stringified(self):
        out = ExtractJson("props", "n", "n_str")(T(props=['{"n": 3}']))
        assert out["n_str"].to_pylist() == ["3"]


class TestWritetime:
    def test_max_over_columns_with_increment(self):
        t = T(wt_a=[10, 5], wt_b=[7, 9])
        out = WritetimeMax(["wt_a", "wt_b"], "writetime", increment=2)(t)
        assert out["writetime"].to_pylist() == [12, 11]

    def test_window(self):
        t = T(writetime=[5, 10, 15, 20])
        assert WritetimeWindow(10, 15)(t)["writetime"].to_pylist() == [10, 15]
        assert WritetimeWindow(lo=16)(t)["writetime"].to_pylist() == [20]
        assert WritetimeWindow(hi=5)(t)["writetime"].to_pylist() == [5]


class TestFilters:
    def test_fill_nulls_and_drop_null_keys(self):
        t = T(conv_id=["a", None], turn_idx=[1, None], x=[1, 2])
        filled = FillNulls({"conv_id": ""})(t)
        assert filled["conv_id"].to_pylist() == ["a", ""]
        gated = DropNullKeys(["conv_id", "turn_idx"])(t)
        assert len(gated) == 1

    def test_value_skip_trim_case_insensitive(self):
        t = T(role=["  SYSTEM ", "user", "System", None])
        out = ValueSkipFilter("role", "system")(t)
        assert out["role"].to_pylist() == ["user", None]

    def test_filter_expr(self):
        t = T(role=["user", "system"], n=[1, 2])
        out = FilterExpr(pc.field("role") != "system")(t)
        assert out["n"].to_pylist() == [1]

    def test_coverage_sample(self):
        t = T(event_seq=[5, 1, 3, 2, 4])
        out = CoverageSample(40.0)(t)
        assert sorted(out["event_seq"].to_pylist()) == [1, 2]


class TestGuardrail:
    def test_byte_size_guard(self):
        t = T(text=["short", "x" * 2048], blob=[b"a", b"b"])
        out = ByteSizeGuard(max_kb=1)(t)
        assert out["oversize"].to_pylist() == [False, True]
        assert out["max_col_bytes"].to_pylist() == [5, 2048]


class TestRegistry:
    def test_build_chain(self):
        chain = build_transforms(
            [
                {"op": "rename", "mapping": {"a": "x"}},
                {"op": "constant", "values": {"env": "t"}},
                {"op": "cast", "casts": {"x": "string"}},
            ]
        )
        t = T(a=[1])
        for tr in chain:
            t = tr(t)
        assert t.column_names == ["x", "env"]
        assert t["x"].to_pylist() == ["1"]


@pytest.mark.usefixtures("ray_session")
class TestTransformsInReplay:
    def test_transform_chain_feeds_replay(self, tmp_path):
        """Regression-style mirror of the reference's rename+constant+explode
        composition (SIT/regression/02_ColumnRenameWithConstantsAndExplode):
        events arrive with renamed columns + a meta map; the chain normalizes
        them and explode joins the map key into the PK."""
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        m = pa.array(
            [[(0, "hello"), (1, "world")], [(0, "solo")]],
            type=pa.map_(pa.int32(), pa.string()),
        )
        raw = pa.table(
            {
                "op": ["INSERT", "INSERT"],
                "cid": ["convA", "convB"],  # renamed → conv_id
                "body": m,  # exploded → turn_idx/text
                "writetime": pa.array([10, 11], type=pa.int64()),
                "event_seq": pa.array([0, 1], type=pa.int64()),
            }
        )
        chain = [
            Rename({"cid": "conv_id"}),
            ExplodeMap("body", "turn_idx", "text"),
            Constant({"role": "user"}, {"role": "string"}),
        ]
        lake = str(tmp_path / "lake")
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("text", pa.string()),
                ("role", pa.string()),
            ]
        )
        replay(raw, lake, num_parts=4, payload_schema=schema, transforms=chain)
        got = read_lake_pandas(lake)
        assert got["text"].tolist() == ["hello", "world", "solo"]
        assert got["turn_idx"].tolist() == [0, 1, 0]
        assert (got["role"] == "user").all()


class TestUdtFieldMapper:
    """Reference UDT conversion analogue (data/CqlConversion.java:321-357):
    field-wise rename / cast / add / drop inside a struct column."""

    def _t(self):
        return pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "udt": pa.array(
                    [
                        {"a": 1, "b": "x"},
                        {"a": 2, "b": "y"},
                        None,
                    ],
                    pa.struct([("a", pa.int32()), ("b", pa.string())]),
                ),
            }
        )

    def test_rename_cast_add_drop(self):
        from cassandra_data_migrator_ray.functions.transforms import UdtFieldMapper

        out = UdtFieldMapper(
            "udt",
            rename={"a": "alpha"},
            casts={"a": "int64"},
            add={"env": ("prod", "string")},
            drop=["b"],
        )(self._t())
        typ = out.schema.field("udt").type
        assert [typ.field(i).name for i in range(typ.num_fields)] == ["alpha", "env"]
        assert typ.field(0).type == pa.int64()
        rows = out.column("udt").to_pylist()
        assert rows[0] == {"alpha": 1, "env": "prod"}
        assert rows[2] is None  # row validity preserved

    def test_registry_spec(self):
        from cassandra_data_migrator_ray.functions.transforms import build_transforms

        chain = build_transforms(
            [{"op": "udt_map", "col": "udt", "rename": {"b": "beta"}}]
        )
        out = chain[0](self._t())
        typ = out.schema.field("udt").type
        assert {typ.field(i).name for i in range(typ.num_fields)} == {"a", "beta"}

    def test_through_replay(self, tmp_path):
        """Struct column mapped by the transform chain and persisted in the
        lake (structs are first-class lake payloads)."""
        import ray

        from cassandra_data_migrator_ray.functions.transforms import UdtFieldMapper
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("udt", pa.struct([("alpha", pa.int64()), ("env", pa.string())])),
            ]
        )
        ev = pa.table(
            {
                "op": ["INSERT", "INSERT"],
                "conv_id": ["c1", "c2"],
                "turn_idx": pa.array([0, 0], pa.int32()),
                "udt": pa.array(
                    [{"a": 7, "b": "x"}, {"a": 8, "b": "y"}],
                    pa.struct([("a", pa.int32()), ("b", pa.string())]),
                ),
                "writetime": pa.array([1, 2], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(
            ev,
            lake,
            num_parts=2,
            payload_schema=schema,
            transforms=[
                UdtFieldMapper(
                    "udt",
                    rename={"a": "alpha"},
                    casts={"a": "int64"},
                    add={"env": ("prod", "string")},
                    drop=["b"],
                )
            ],
        )
        got = read_lake_pandas(lake).sort_values("conv_id", ignore_index=True)
        assert got["udt"][0] == {"alpha": 7, "env": "prod"}
        assert got["udt"][1] == {"alpha": 8, "env": "prod"}


class TestGeoDurationCodecs:
    """Reference codec families with no native Parquet type
    (CqlData.java:42-70, CodecFactory.java:29-64): POINT/LINESTRING/POLYGON
    as WKT strings, DURATION compact form, DATE_RANGE '[lo TO hi]' — all
    vectorized Arrow kernels, round-trip tested."""

    def _cast(self, t, casts):
        from cassandra_data_migrator_ray.functions.transforms import CastColumns

        return CastColumns(casts)(t)

    def test_point_roundtrip(self):
        pts = pa.array(
            [{"x": 1.5, "y": -2.0}, {"x": 0.0, "y": 3.25}, None],
            pa.struct([("x", pa.float64()), ("y", pa.float64())]),
        )
        t = pa.table({"g": pts})
        wkt = self._cast(t, {"g": "point_wkt"})
        assert wkt["g"].to_pylist()[0] == "POINT (1.5 -2)"
        assert wkt["g"].to_pylist()[2] is None
        back = self._cast(wkt, {"g": "wkt_point"})
        got = back["g"].to_pylist()
        assert got[0] == {"x": 1.5, "y": -2.0} and got[1] == {"x": 0.0, "y": 3.25}

    def test_linestring_polygon_roundtrip(self):
        pt = pa.struct([("x", pa.float64()), ("y", pa.float64())])
        ls = pa.array(
            [[{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 2.5}], [{"x": 3.0, "y": 4.0}]],
            pa.list_(pt),
        )
        t = pa.table({"g": ls})
        wkt = self._cast(t, {"g": "linestring_wkt"})
        assert wkt["g"].to_pylist()[0] == "LINESTRING (0 0, 1 2.5)"
        back = self._cast(wkt, {"g": "wkt_linestring"})
        assert back["g"].to_pylist() == ls.to_pylist()

        poly = self._cast(t, {"g": "polygon_wkt"})
        assert poly["g"].to_pylist()[1] == "POLYGON ((3 4))"
        back2 = self._cast(poly, {"g": "wkt_polygon"})
        assert back2["g"].to_pylist() == ls.to_pylist()

    def test_duration_roundtrip(self):
        dur = pa.array(
            [
                {"months": 14, "days": 3, "nanos": 7_000_000_000},
                {"months": 0, "days": -2, "nanos": 0},
            ],
            pa.struct([("months", pa.int32()), ("days", pa.int32()), ("nanos", pa.int64())]),
        )
        t = pa.table({"d": dur})
        s = self._cast(t, {"d": "duration_string"})
        assert s["d"].to_pylist() == ["14mo3d7000000000ns", "0mo-2d0ns"]
        back = self._cast(s, {"d": "string_duration"})
        assert back["d"].to_pylist() == dur.to_pylist()

    def test_daterange_roundtrip(self):
        import datetime as dt

        rng = pa.array(
            [
                {
                    "lo": dt.datetime(2021, 1, 1, 0, 0, 0),
                    "hi": dt.datetime(2021, 12, 31, 23, 59, 59),
                }
            ],
            pa.struct([("lo", pa.timestamp("us")), ("hi", pa.timestamp("us"))]),
        )
        t = pa.table({"r": rng})
        s = self._cast(t, {"r": "daterange_string"})
        assert s["r"].to_pylist() == ["[2021-01-01T00:00:00 TO 2021-12-31T23:59:59]"]
        back = self._cast(s, {"r": "string_daterange"})
        assert back["r"].to_pylist() == rng.to_pylist()

    def test_decimal_string_roundtrip(self):
        from decimal import Decimal

        dec = pa.array([Decimal("12345.678900000")], pa.decimal128(38, 9))
        t = pa.table({"v": dec})
        s = self._cast(t, {"v": "string"})
        assert s["v"].to_pylist() == ["12345.678900000"]
        back = self._cast(s, {"v": "decimal"})
        assert back["v"].to_pylist() == dec.to_pylist()
