"""Multi-ring polygon WKT codec (closes the last reference-parity gap:
the DSE geo types used by cql/codec/CodecFactory.java:52-58 include
polygons with interior rings; the single-ring codec covered only simple
rings).  Arrow representation: list<list<struct<x,y>>> (outer = rings,
first ring = exterior)."""

import numpy as np
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.functions.transforms import (
    _polygon_multi_wkt,
    _polygon_wkt,
    _wkt_polygon_multi,
)

PT = pa.struct([("x", pa.float64()), ("y", pa.float64())])
MULTI = pa.list_(pa.list_(PT))


def ring(*pts):
    return [{"x": float(x), "y": float(y)} for x, y in pts]


class TestMultiRingPolygon:
    def test_multi_ring_round_trip(self):
        polys = pa.array(
            [
                [ring((0, 0), (4, 0), (4, 4), (0, 0))],
                [
                    ring((0, 0), (10, 0), (10, 10), (0, 0)),
                    ring((1, 1), (2, 1), (2, 2), (1, 1)),
                    ring((5, 5), (6, 5), (6, 6), (5, 5)),
                ],
                None,
            ],
            MULTI,
        )
        wkt = _polygon_multi_wkt(polys)
        assert wkt.to_pylist() == [
            "POLYGON ((0 0, 4 0, 4 4, 0 0))",
            "POLYGON ((0 0, 10 0, 10 10, 0 0), (1 1, 2 1, 2 2, 1 1), "
            "(5 5, 6 5, 6 6, 5 5))",
            None,
        ]
        back = _wkt_polygon_multi(wkt)
        assert back.to_pylist() == polys.to_pylist()
        # idempotent through a second round trip
        assert _polygon_multi_wkt(back).to_pylist() == wkt.to_pylist()

    def test_zero_ring_polygon_is_null(self):
        """WKT has no 'POLYGON ()' form; a zero-ring value renders null both
        directions (documented degeneracy, mirrors POLYGON EMPTY)."""
        polys = pa.array([[], [ring((0, 0), (1, 0), (1, 1), (0, 0))]], MULTI)
        wkt = _polygon_multi_wkt(polys)
        assert wkt.to_pylist()[0] is None
        assert wkt.to_pylist()[1] == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
        assert _wkt_polygon_multi(wkt).to_pylist()[0] is None

    def test_single_ring_text_parity_with_simple_codec(self):
        """A one-ring multi polygon renders byte-identically to the simple
        single-ring codec — the two codecs interoperate."""
        simple = pa.array(
            [ring((1, 2), (3, 4), (1, 2))], pa.list_(PT)
        )
        multi = pa.array([[ring((1, 2), (3, 4), (1, 2))]], MULTI)
        assert (
            _polygon_wkt(simple).to_pylist()
            == _polygon_multi_wkt(multi).to_pylist()
        )

    def test_chunked_input(self):
        a = pa.chunked_array(
            [
                pa.array([[ring((0, 0), (1, 1), (0, 0))]], MULTI),
                pa.array([[ring((2, 2), (3, 3), (2, 2))], None], MULTI),
            ]
        )
        wkt = _polygon_multi_wkt(a)
        assert wkt.to_pylist() == [
            "POLYGON ((0 0, 1 1, 0 0))",
            "POLYGON ((2 2, 3 3, 2 2))",
            None,
        ]

    def test_random_round_trip(self):
        rng = np.random.default_rng(5)
        rows = []
        for _ in range(200):
            if rng.random() < 0.1:
                rows.append(None)
                continue
            n_rings = int(rng.integers(1, 5))
            rows.append(
                [
                    ring(*[(rng.integers(-100, 100), rng.integers(-100, 100))
                           for _ in range(int(rng.integers(3, 8)))])
                    for _ in range(n_rings)
                ]
            )
        polys = pa.array(rows, MULTI)
        back = _wkt_polygon_multi(_polygon_multi_wkt(polys))
        assert back.to_pylist() == polys.to_pylist()

    def test_registered_in_codec_table(self):
        from cassandra_data_migrator_ray.functions.transforms import _GEO_CODECS

        assert "polygon_multi_wkt" in _GEO_CODECS
        assert "wkt_polygon_multi" in _GEO_CODECS
