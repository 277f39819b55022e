"""Opt-in lossless numeric schema widening (replay(widen_types=True)).

The reference rejects origin/target type changes outright
(schema/CqlTable.java:408-428); the lake adds the Iceberg-style lossless
promotion set on top of additive evolution: int -> wider int of the same
signedness, float32 -> float64.  Old partition files keep their narrow
physical type and are cast to the declared schema on every read path
(merge-on-read, read_lake, lookup, validate)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import lookup, read_lake_pandas


def _batch(rows, *, turn_t=pa.int32(), val_t=pa.float32()):
    """Change-event table; rows = (conv, turn, text, val, wt, seq)."""
    conv, turn, text, val, wt, seq = map(list, zip(*rows))
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, turn_t),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(text, pa.string()),
            "score": pa.array(val, val_t),
            "ts": pa.array(wt, pa.timestamp("us")),
            "op": pa.array(["UPSERT"] * len(rows), pa.string()),
            "writetime": pa.array(wt, pa.int64()),
            "event_seq": pa.array(seq, pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestSchemaWidening:
    def test_default_rejects_widening(self, tmp_path):
        import ray

        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(_batch([("a", 0, "hi", 1.0, 10, 1)])),
            lake,
            num_parts=4,
        )
        wide = _batch([("a", 1, "yo", 2.0, 20, 2)], turn_t=pa.int64())
        with pytest.raises(ValueError, match="non-additive schema change"):
            replay(ray.data.from_arrow(wide), lake, num_parts=4)

    def test_widen_int_and_float_across_runs(self, tmp_path):
        import ray

        lake = str(tmp_path / "lake")
        r1 = replay(
            ray.data.from_arrow(
                _batch(
                    [("a", 0, "hi", 1.5, 10, 1), ("b", 0, "q", 2.5, 11, 2)]
                )
            ),
            lake,
            num_parts=4,
        )
        assert r1.metrics["status"].eq("PASS").all()
        # second run ships int64 turn_idx (key column!) and float64 score,
        # updates key (a, 0) and inserts (a, 1): the update must land on the
        # SAME routed key as the int32 original
        wide = _batch(
            [("a", 0, "hi2", 9.25, 20, 3), ("a", 1, "new", 0.5, 21, 4)],
            turn_t=pa.int64(),
            val_t=pa.float64(),
        )
        r2 = replay(ray.data.from_arrow(wide), lake, num_parts=4, widen_types=True)
        assert r2.metrics["status"].eq("PASS").all()

        out = read_lake_pandas(lake).sort_values(["conv_id", "turn_idx"])
        assert out[["conv_id", "turn_idx", "text"]].values.tolist() == [
            ["a", 0, "hi2"],
            ["a", 1, "new"],
            ["b", 0, "q"],
        ]
        assert list(out["score"]) == [9.25, 0.5, 2.5]

        # declared schema is now the widened one, persisted in the manifest
        from cassandra_data_migrator_ray.state.manifest import Manifest

        m = Manifest.load(lake)
        assert m.schema.field("turn_idx").type == pa.int64()
        assert m.schema.field("score").type == pa.float64()

        # a third NARROW batch still merges (cast up per batch)
        r3 = replay(
            ray.data.from_arrow(_batch([("b", 0, "q2", 7.0, 30, 5)])),
            lake,
            num_parts=4,
        )
        assert r3.metrics["status"].eq("PASS").all()
        out = read_lake_pandas(lake)
        assert out.loc[out["conv_id"] == "b", "text"].item() == "q2"

    def test_widened_lake_lookup_and_validate(self, tmp_path):
        import ray

        from cassandra_data_migrator_ray.pipelines.diff import validate

        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(
                _batch([("a", 0, "hi", 1.0, 10, 1), ("c", 2, "z", 3.0, 12, 2)])
            ),
            lake,
            num_parts=4,
        )
        replay(
            ray.data.from_arrow(
                _batch([("a", 0, "hi2", 4.0, 20, 3)], turn_t=pa.int64(),
                       val_t=pa.float64())
            ),
            lake,
            num_parts=4,
            widen_types=True,
        )
        got = lookup(lake, [("a", 0)])
        assert got["text"].item() == "hi2"

        expected = pd.DataFrame(
            {
                "conv_id": ["a", "c"],
                "turn_idx": np.array([0, 2], dtype=np.int64),
                "role": ["user", "user"],
                "text": ["hi2", "z"],
                "score": np.array([4.0, 3.0], dtype=np.float64),
                "ts": pd.to_datetime([20, 12], unit="us"),
            }
        )
        res = validate(expected, lake)
        assert res.ok, res.counts
        assert res.counts.get("VALID", 0) == 2

    def test_true_type_change_still_rejected(self, tmp_path):
        import ray

        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(_batch([("a", 0, "hi", 1.0, 10, 1)])),
            lake,
            num_parts=4,
        )
        bad = _batch([("a", 1, "yo", 2.0, 20, 2)])
        bad = bad.set_column(
            bad.column_names.index("score"),
            "score",
            pa.array(["not-a-number"], pa.string()),
        )
        with pytest.raises(ValueError, match="non-additive schema change"):
            replay(ray.data.from_arrow(bad), lake, num_parts=4, widen_types=True)


@pytest.mark.usefixtures("ray_session")
class TestWideningMaintenance:
    def _widened_lake(self, tmp_path, name="lake"):
        import ray

        lake = str(tmp_path / name)
        replay(
            ray.data.from_arrow(
                _batch([("a", 0, "hi", 1.0, 10, 1), ("b", 5, "q", 2.0, 11, 2)])
            ),
            lake,
            num_parts=4,
        )
        replay(
            ray.data.from_arrow(
                _batch([("a", 0, "hi2", 9.5, 30, 3)], turn_t=pa.int64(),
                       val_t=pa.float64())
            ),
            lake,
            num_parts=4,
            widen_types=True,
        )
        return lake

    def test_compact_upcasts_all_files(self, tmp_path):
        """Compaction rewrites through align_to_schema, so a full compact
        physically migrates every remaining narrow file to the widened
        declared schema."""
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake
        from cassandra_data_migrator_ray.state.manifest import Manifest

        lake = self._widened_lake(tmp_path)
        compact_lake(lake)
        m = Manifest.load(lake)
        files, *_ = __import__(
            "cassandra_data_migrator_ray.sources.lake", fromlist=["_resolve_view"]
        )._resolve_view(m, None, None)
        for f in files:
            s = pq.read_schema(f)
            assert s.field("turn_idx").type == pa.int64(), f
            assert s.field("score").type == pa.float64(), f
        out = read_lake_pandas(lake).sort_values(["conv_id", "turn_idx"])
        assert out["text"].tolist() == ["hi2", "q"]

    def test_diff_lakes_narrow_vs_widened(self, tmp_path):
        """A pre-widening replica (all-narrow files) diffs clean against the
        widened lake when content matches: the comparator casts both sides
        to the compared schema."""
        import ray

        from cassandra_data_migrator_ray.pipelines.diff import diff_lakes

        wide = self._widened_lake(tmp_path, "wide")
        narrow = str(tmp_path / "narrow")
        replay(
            ray.data.from_arrow(
                _batch(
                    [("a", 0, "hi2", 9.5, 30, 1), ("b", 5, "q", 2.0, 11, 2)]
                )
            ),
            narrow,
            num_parts=4,
        )
        res = diff_lakes(narrow, wide)
        assert res.ok, res.counts
        assert res.counts.get("VALID", 0) == 2


@pytest.mark.usefixtures("ray_session")
class TestWidenRouteKey:
    def test_widen_int_route_key_generic_pk(self, tmp_path):
        """Widening the ROUTE key column (first PK component) must not move
        keys between partitions: hash_key hashes values through Python
        objects, so int32 7 and int64 7 route identically.  An update
        arriving with the widened type must supersede the narrow-typed
        original, never duplicate it."""
        import ray

        def ev(rows, id_t):
            oid, ln, sku, wt, seq = map(list, zip(*rows))
            return pa.table(
                {
                    "op": pa.array(["UPSERT"] * len(rows)),
                    "order_id": pa.array(oid, id_t),
                    "line_no": pa.array(ln, pa.int64()),
                    "sku": pa.array(sku, pa.string()),
                    "writetime": pa.array(wt, pa.int64()),
                    "event_seq": pa.array(seq, pa.int64()),
                }
            )

        lake = str(tmp_path / "lake")
        rows1 = [(i, 0, f"sku{i}", 100 + i, i) for i in range(40)]
        replay(
            ray.data.from_arrow(ev(rows1, pa.int32())),
            lake,
            num_parts=8,
            key_cols=("order_id", "line_no"),
        )
        # widened updates for every key + one insert
        rows2 = [(i, 0, f"new{i}", 200 + i, 100 + i) for i in range(40)]
        rows2.append((99, 0, "fresh", 300, 999))
        replay(
            ray.data.from_arrow(ev(rows2, pa.int64())),
            lake,
            num_parts=8,
            key_cols=("order_id", "line_no"),
            widen_types=True,
        )
        out = read_lake_pandas(lake).sort_values("order_id")
        assert len(out) == 41  # every update superseded in place, one insert
        assert (out.loc[out["order_id"] < 40, "sku"]
                .tolist() == [f"new{i}" for i in range(40)])
        assert out.loc[out["order_id"] == 99, "sku"].item() == "fresh"


@pytest.mark.usefixtures("ray_session")
class TestWidenedChangeFeed:
    def test_cdf_span_across_widening(self, tmp_path):
        """read_changes(since_version=...) over a span whose later run
        widened the schema: the unified span schema must take the declared
        (wide) type so newer feed files never narrow-cast."""
        import ray

        from cassandra_data_migrator_ray.sources.lake import read_changes

        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(_batch([("a", 0, "hi", 1.0, 10, 1)])),
            lake,
            num_parts=4,
            emit_changes=True,
        )
        # second run widens AND carries a value that cannot narrow to int32
        wide = _batch(
            [("b", 2**40, "big", 2.0, 20, 2)], turn_t=pa.int64()
        )
        replay(
            ray.data.from_arrow(wide),
            lake,
            num_parts=4,
            widen_types=True,
            emit_changes=True,
        )
        feed = read_changes(lake, since_version=0).to_pandas()
        assert set(feed["_change_type"]) == {"insert"}
        assert sorted(feed["turn_idx"].tolist()) == [0, 2**40]
        assert feed["turn_idx"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
class TestWidenedStreamingRead:
    def _widened_lake(self, tmp_path):
        """Narrow run touching many partitions, then a widening run touching
        ONE — most partition files keep int32/float32 physically."""
        import ray

        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(
                _batch(
                    [(f"c{i}", i, "narrow", 1.5, 1000 + i, i) for i in range(20)]
                )
            ),
            lake,
            num_parts=8,
        )
        replay(
            ray.data.from_arrow(
                _batch(
                    [("w", 2**40, "wide", 2.5, 5000, 100)],
                    turn_t=pa.int64(),
                    val_t=pa.float64(),
                )
            ),
            lake,
            num_parts=8,
            widen_types=True,
        )
        return lake

    def test_read_lake_blocks_align_to_declared(self, tmp_path):
        """Streaming read_lake over mixed narrow/wide partition files must
        surface ONE schema (the declared wide one) in every block."""
        from cassandra_data_migrator_ray.sources.lake import read_lake

        lake = self._widened_lake(tmp_path)
        ds = read_lake(lake)
        types = {
            str(b["turn_idx"].type)
            for b in ds.iter_batches(batch_format="pyarrow", batch_size=4)
        }
        assert types == {"int64"}
        df = read_lake(lake).to_pandas()
        assert len(df) == 21
        assert int(df["turn_idx"].max()) == 2**40
        assert df["turn_idx"].dtype == np.int64

    def test_export_sorted_uniform_files(self, tmp_path):
        """export_sorted of a widened lake: every output file must carry the
        DECLARED physical types — a strict sequential consumer concatenates
        the returned list without schema reconciliation."""
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.sources.lake import export_sorted

        lake = self._widened_lake(tmp_path)
        files = export_sorted(lake, str(tmp_path / "exp"))
        turn_types = {str(pq.read_schema(f).field("turn_idx").type) for f in files}
        score_types = {str(pq.read_schema(f).field("score").type) for f in files}
        assert turn_types == {"int64"}, turn_types
        assert score_types == {"double"}, score_types
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        assert tbl.num_rows == 21
        keys = list(
            zip(tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist())
        )
        assert keys == sorted(keys)
