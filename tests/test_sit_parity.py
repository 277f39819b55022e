"""Reference SIT scenario parity — full lifecycle per feature.

Mirrors /root/reference/SIT's migrate → breakData → validateData(DIFF) →
fixData → validateData(clean) cycle (SIT/features/*/cdm.txt) for the feature
scenarios not already lifecycle-covered elsewhere: explode-map
(features/02_explode_map), codecs (features/03_codec), UDT mapper
(features/04_udt_mapper), reserved-keyword columns (smoke/05_reserved_keyword)
and null-timestamp-in-PK (regression/04_null_ts_in_pk).

Corruption is injected the way SIT's breakData.cql does — direct target-side
mutation — expressed here as replaying corruption events into the lake while
the expected table stays at the original oracle state; fixData is the
autocorrect pass over validation output.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.functions.transforms import (
    CastColumns,
    ExplodeMap,
    Rename,
    UdtFieldMapper,
)
from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


def _lifecycle(lake, expected, corrupt_events, replay_kwargs):
    """break → validate(DIFF) → fix → validate(clean)."""
    res = validate(expected, lake)
    assert res.ok, res.counts
    replay(corrupt_events, lake, **replay_kwargs)
    res2 = validate(expected, lake)
    assert not res2.ok, res2.counts
    autocorrect(res2, lake)
    res3 = validate(expected, lake)
    assert res3.ok, res3.counts
    return res2.counts


@pytest.mark.usefixtures("ray_session")
class TestSitExplodeMap:
    def test_explode_map_lifecycle(self, tmp_path):
        """SIT features/02_explode_map: map entries explode to rows, map key
        joins the PK; break deletes a key family, rewrites a value, adds a
        rogue row; fixData restores all three classes."""
        schema = pa.schema(
            [
                ("key", pa.string()),
                ("fruit", pa.string()),
                ("value", pa.string()),
                ("fruit_qty", pa.int64()),
            ]
        )
        ev = pa.table(
            {
                "op": pa.array(["UPSERT"] * 3),
                "key": pa.array(["key1", "key2", "key3"]),
                "value": pa.array(["valueA", "valueB", "valueC"]),
                "fruits": pa.array(
                    [
                        [("apples", 3), ("oranges", 5), ("bananas", 2), ("grapes", 11)],
                        [("apples", 4), ("oranges", 6), ("bananas", 3), ("pears", 7)],
                        [("apples", 5), ("oranges", 7), ("bananas", 4), ("kiwi", 42)],
                    ],
                    pa.map_(pa.string(), pa.int64()),
                ),
                "writetime": pa.array([10, 20, 30], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        kw = dict(num_parts=4, payload_schema=schema, key_cols=("key", "fruit"))
        replay(ev, lake, transforms=[ExplodeMap("fruits", "fruit", "fruit_qty")], **kw)

        expected = (
            pd.DataFrame(
                [
                    (k, f, v, q)
                    for k, v, fruits in [
                        ("key1", "valueA", [("apples", 3), ("oranges", 5), ("bananas", 2), ("grapes", 11)]),
                        ("key2", "valueB", [("apples", 4), ("oranges", 6), ("bananas", 3), ("pears", 7)]),
                        ("key3", "valueC", [("apples", 5), ("oranges", 7), ("bananas", 4), ("kiwi", 42)]),
                    ]
                    for f, q in fruits
                ],
                columns=["key", "fruit", "value", "fruit_qty"],
            )
            .sort_values(["key", "fruit"], ignore_index=True)
        )
        got = read_lake_pandas(lake).sort_values(["key", "fruit"], ignore_index=True)
        pd.testing.assert_frame_equal(got, expected, check_dtype=False)

        # breakData analogue (SIT features/02_explode_map/breakData.cql):
        # DELETE key2 family; value999 on (key3, apples); qty=999 on
        # (key3, oranges); rogue EXTRA row
        corrupt = pa.table(
            {
                "op": pa.array(["DELETE"] * 4 + ["UPSERT", "UPSERT", "UPSERT"]),
                "key": pa.array(["key2"] * 4 + ["key3", "key3", "key9"]),
                "fruit": pa.array(
                    ["apples", "oranges", "bananas", "pears", "apples", "oranges", "zz"]
                ),
                "value": pa.array([None] * 4 + ["value999", None, "rogue"]),
                "fruit_qty": pa.array([None] * 4 + [None, 999, 1], pa.int64()),
                "writetime": pa.array([100_000 + i for i in range(7)], pa.int64()),
                "event_seq": pa.array([10_000 + i for i in range(7)], pa.int64()),
            }
        )
        counts = _lifecycle(lake, expected, corrupt, kw)
        assert counts["MISSING"] == 4 and counts["MISMATCH"] == 2 and counts["EXTRA"] == 1


@pytest.mark.usefixtures("ray_session")
class TestSitCodec:
    def test_codec_lifecycle(self, tmp_path):
        """SIT features/03_codec: origin bridges types through codecs
        (epoch-millis string → timestamp here); break rewrites a codec-typed
        cell; fixData restores it."""
        schema = pa.schema(
            [("k", pa.int64()), ("v", pa.string()), ("ts", pa.timestamp("us"))]
        )
        base_ms = 1_700_000_000_000
        ev = pa.table(
            {
                "op": pa.array(["UPSERT"] * 4),
                "k": pa.array([1, 2, 3, 1], pa.int64()),
                "v": pa.array(["a", "b", "c", "a2"]),
                "ts_str": pa.array([str(base_ms + i * 1000) for i in range(4)]),
                "writetime": pa.array([10, 20, 30, 40], pa.int64()),
                "event_seq": pa.array([0, 1, 2, 3], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        kw = dict(num_parts=2, payload_schema=schema, key_cols=("k",))
        replay(
            ev,
            lake,
            transforms=[
                CastColumns({"ts_str": "string_timestamp_millis"}),
                Rename({"ts_str": "ts"}),
            ],
            **kw,
        )
        expected = pd.DataFrame(
            {
                "k": np.array([1, 2, 3], dtype=np.int64),
                "v": ["a2", "b", "c"],
                "ts": pd.to_datetime(
                    [base_ms + 3000, base_ms + 1000, base_ms + 2000], unit="ms"
                ),
            }
        )
        got = read_lake_pandas(lake).sort_values("k", ignore_index=True)
        pd.testing.assert_frame_equal(got, expected, check_dtype=False)

        corrupt = pa.table(
            {
                "op": pa.array(["UPSERT"]),
                "k": pa.array([2], pa.int64()),
                "v": pa.array([None], pa.string()),
                "ts": pa.array([np.datetime64("1999-01-01", "us")], pa.timestamp("us")),
                "writetime": pa.array([100_000], pa.int64()),
                "event_seq": pa.array([10_000], pa.int64()),
            }
        )
        counts = _lifecycle(lake, expected, corrupt, kw)
        assert counts["MISMATCH"] == 1


@pytest.mark.usefixtures("ray_session")
class TestSitUdtMapper:
    def test_udt_mapper_lifecycle(self, tmp_path):
        """SIT features/04_udt_mapper: struct fields renamed between origin
        and target shapes; lifecycle break/fix over the struct column."""
        target_t = pa.struct([("first_name", pa.string()), ("last_name", pa.string())])
        schema = pa.schema([("k", pa.int64()), ("who", target_t)])
        ev = pa.table(
            {
                "op": pa.array(["UPSERT"] * 3),
                "k": pa.array([1, 2, 3], pa.int64()),
                "who": pa.array(
                    [
                        {"fn": "Ada", "ln": "Lovelace"},
                        {"fn": "Alan", "ln": "Turing"},
                        {"fn": "Grace", "ln": "Hopper"},
                    ],
                    pa.struct([("fn", pa.string()), ("ln", pa.string())]),
                ),
                "writetime": pa.array([10, 20, 30], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        kw = dict(num_parts=2, payload_schema=schema, key_cols=("k",))
        replay(
            ev,
            lake,
            transforms=[
                UdtFieldMapper(
                    "who", rename={"fn": "first_name", "ln": "last_name"}
                )
            ],
            **kw,
        )
        expected = pd.DataFrame(
            {
                "k": np.array([1, 2, 3], dtype=np.int64),
                "who": [
                    {"first_name": "Ada", "last_name": "Lovelace"},
                    {"first_name": "Alan", "last_name": "Turing"},
                    {"first_name": "Grace", "last_name": "Hopper"},
                ],
            }
        )
        got = read_lake_pandas(lake).sort_values("k", ignore_index=True)
        pd.testing.assert_frame_equal(got, expected, check_dtype=False)

        corrupt = pa.table(
            {
                "op": pa.array(["UPSERT", "DELETE"]),
                "k": pa.array([2, 3], pa.int64()),
                "who": pa.array(
                    [{"first_name": "Evil", "last_name": "Twin"}, None], target_t
                ),
                "writetime": pa.array([100_000, 100_001], pa.int64()),
                "event_seq": pa.array([10_000, 10_001], pa.int64()),
            }
        )
        counts = _lifecycle(lake, expected, corrupt, kw)
        assert counts["MISMATCH"] == 1 and counts["MISSING"] == 1


@pytest.mark.usefixtures("ray_session")
class TestSitReservedAndNullTsPk:
    def test_reserved_keyword_columns(self, tmp_path):
        """SIT smoke/05_reserved_keyword: column names that are SQL/CQL
        reserved words flow through replay + validate untouched (Parquet/Arrow
        have no reserved identifiers — assert no mangling)."""
        schema = pa.schema(
            [("k", pa.int64()), ("order", pa.string()), ("select", pa.int64())]
        )
        ev = pa.table(
            {
                "op": pa.array(["UPSERT", "UPSERT"]),
                "k": pa.array([1, 2], pa.int64()),
                "order": pa.array(["first", "second"]),
                "select": pa.array([10, 20], pa.int64()),
                "writetime": pa.array([10, 20], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2, payload_schema=schema, key_cols=("k",))
        got = read_lake_pandas(lake).sort_values("k", ignore_index=True)
        assert list(got.columns) == ["k", "order", "select"]
        assert got["order"].tolist() == ["first", "second"]
        res = validate(got, lake)
        assert res.ok, res.counts

    def test_null_timestamp_in_pk_defaulted(self, tmp_path):
        """SIT regression/04_null_ts_in_pk: a null timestamp PK component is
        defaulted (reference convertNull, schema/CqlTable.java:375-400) so the
        row is kept, not dropped."""
        schema = pa.schema(
            [("conv", pa.string()), ("tsk", pa.timestamp("us")), ("v", pa.string())]
        )
        ev = pa.table(
            {
                "op": pa.array(["UPSERT", "UPSERT"]),
                "conv": pa.array(["a", "b"]),
                "tsk": pa.array(
                    [np.datetime64("2024-01-01", "us"), None], pa.timestamp("us")
                ),
                "v": pa.array(["x", "y"]),
                "writetime": pa.array([10, 20], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2, payload_schema=schema, key_cols=("conv", "tsk"))
        got = read_lake_pandas(lake)
        assert len(got) == 2  # the null-ts row survived with a default key
        assert got.loc[got["conv"] == "b", "v"].iloc[0] == "y"
        assert got.loc[got["conv"] == "b", "tsk"].notna().all()
