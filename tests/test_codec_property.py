"""Property tests: every type-bridging codec pair round-trips exactly.

Reference codec pairs (cql/codec/CodecFactory.java:29-64, Codecset.java:33-35)
are bijections between the CQL type and its bridged representation; here each
Arrow codec pair (CastColumns spec ↔ inverse spec) is driven with
hypothesis-generated values, including nulls, empty collections and boundary
magnitudes, asserting value-exact round-trips.
"""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from cassandra_data_migrator_ray.functions.transforms import CastColumns


def _cast(t: pa.Table, casts: dict) -> pa.Table:
    return CastColumns(casts)(t)


# finite doubles that survive repr/parse exactly (WKT text uses repr)
coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)
point = st.tuples(coord, coord)


class TestGeoRoundtrips:
    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.one_of(st.none(), point), min_size=1, max_size=8))
    def test_point(self, pts):
        arr = pa.array(
            [None if p is None else {"x": p[0], "y": p[1]} for p in pts],
            pa.struct([("x", pa.float64()), ("y", pa.float64())]),
        )
        t = pa.table({"g": arr})
        back = _cast(_cast(t, {"g": "point_wkt"}), {"g": "wkt_point"})
        assert back["g"].to_pylist() == t["g"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.lists(point, min_size=0, max_size=6)),
            min_size=1,
            max_size=6,
        )
    )
    def test_linestring_and_polygon(self, lines):
        pt_t = pa.struct([("x", pa.float64()), ("y", pa.float64())])
        arr = pa.array(
            [
                None if l is None else [{"x": x, "y": y} for x, y in l]
                for l in lines
            ],
            pa.list_(pt_t),
        )
        t = pa.table({"g": arr})
        for enc, dec in [
            ("linestring_wkt", "wkt_linestring"),
            ("polygon_wkt", "wkt_polygon"),
        ]:
            back = _cast(_cast(t, {"g": enc}), {"g": dec})
            assert back["g"].to_pylist() == t["g"].to_pylist(), (enc, dec)


class TestDurationDaterangeRoundtrips:
    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.tuples(
                    st.integers(-120, 120),
                    st.integers(-10_000, 10_000),
                    st.integers(-(10**15), 10**15),
                ),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_duration(self, items):
        arr = pa.array(
            [
                None if v is None else {"months": v[0], "days": v[1], "nanos": v[2]}
                for v in items
            ],
            pa.struct([("months", pa.int32()), ("days", pa.int32()), ("nanos", pa.int64())]),
        )
        t = pa.table({"d": arr})
        back = _cast(_cast(t, {"d": "duration_string"}), {"d": "string_duration"})
        assert back["d"].to_pylist() == t["d"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.tuples(
                    st.integers(0, 4_000_000_000),
                    st.integers(0, 4_000_000_000),
                ),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_daterange(self, items):
        # the DateRange codec is second-precision by design (DSE DateRange is
        # calendar-precision; '[%Y-%m-%dT%H:%M:%S TO ...]')
        arr = pa.array(
            [
                None
                if v is None
                else {
                    "lo": np.datetime64(min(v) * 1_000_000, "us"),
                    "hi": np.datetime64(max(v) * 1_000_000, "us"),
                }
                for v in items
            ],
            pa.struct([("lo", pa.timestamp("us")), ("hi", pa.timestamp("us"))]),
        )
        t = pa.table({"r": arr})
        back = _cast(_cast(t, {"r": "daterange_string"}), {"r": "string_daterange"})
        assert back["r"].to_pylist() == t["r"].to_pylist()


class TestScalarCodecRoundtrips:
    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(0, 4_000_000_000_000)),
            min_size=1,
            max_size=8,
        )
    )
    def test_timestamp_millis_string(self, ms):
        arr = pa.array(
            [None if v is None else np.datetime64(v * 1000, "us") for v in ms],
            pa.timestamp("us"),
        )
        t = pa.table({"ts": arr})
        back = _cast(
            _cast(t, {"ts": "timestamp_string_millis"}),
            {"ts": "string_timestamp_millis"},
        )
        assert back["ts"].to_pylist() == t["ts"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=40)), min_size=1, max_size=8))
    def test_text_blob(self, texts):
        t = pa.table({"v": pa.array(texts, pa.string())})
        back = _cast(_cast(t, {"v": "text_blob"}), {"v": "blob_text"})
        assert back["v"].to_pylist() == t["v"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            min_size=1,
            max_size=8,
        )
    )
    def test_bigint_string(self, ints):
        t = pa.table({"v": pa.array(ints, pa.int64())})
        back = _cast(_cast(t, {"v": "string"}), {"v": "int64"})
        assert back["v"].to_pylist() == t["v"].to_pylist()


class TestDecimalCodec:
    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.decimals(
                    min_value=-(10**20),
                    max_value=10**20,
                    places=9,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_decimal_string_roundtrip(self, vals):
        """DECIMAL↔String codec pair (reference CodecFactory DECIMAL_STRING):
        decimal128(38,9) survives the string bridge exactly."""
        t = pa.table({"v": pa.array(vals, pa.decimal128(38, 9))})
        back = _cast(_cast(t, {"v": "string"}), {"v": "decimal"})
        assert back["v"].to_pylist() == t["v"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            min_size=1,
            max_size=8,
        )
    )
    def test_bigint_decimal_roundtrip(self, ints):
        """BIGINT↔BigInteger analogue: int64 through decimal128 and back."""
        t = pa.table({"v": pa.array(ints, pa.int64())})
        back = _cast(_cast(t, {"v": "decimal"}), {"v": "int64"})
        assert back["v"].to_pylist() == t["v"].to_pylist()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            min_size=1,
            max_size=8,
        )
    )
    def test_varint_bigint_roundtrip(self, ints):
        """Explicit VARINT↔BIGINT codec pair (reference
        cql/codec/BIGINT_BigIntegerCodec.java): every int64 survives the
        decimal128(38,0) varint bridge exactly, full int64 range."""
        t = pa.table({"v": pa.array(ints, pa.int64())})
        via = _cast(t, {"v": "bigint_varint"})
        assert via["v"].type == pa.decimal128(38, 0)
        back = _cast(via, {"v": "varint_bigint"})
        assert back["v"].to_pylist() == t["v"].to_pylist()

    def test_varint_bigint_overflow_raises(self):
        """A varint beyond int64 must raise on the narrowing cast (the
        reference's BigInteger.longValueExact throws), never wrap."""
        import decimal

        import pytest

        t = pa.table({"v": pa.array([decimal.Decimal(2**64)], pa.decimal128(38, 0))})
        with pytest.raises(Exception):
            _cast(t, {"v": "varint_bigint"})

    def test_ascii_blob_aliases(self):
        t = pa.table({"v": pa.array(["abc", None], pa.string())})
        via = _cast(t, {"v": "ascii_blob"})
        assert via["v"].type == pa.binary()
        back = _cast(via, {"v": "blob_ascii"})
        assert back["v"].to_pylist() == ["abc", None]
