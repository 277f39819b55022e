"""Remaining FIXTURES.md scenarios end-to-end through the Ray pipelines:
counters_additive, null_ts_in_pk (null-PK defaulting), filters, guardrail."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from cassandra_data_migrator_ray.functions.transforms import (
    ValueSkipFilter,
    WritetimeWindow,
)
from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.guardrail import guardrail_scan
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


@pytest.mark.usefixtures("ray_session")
class TestCountersAdditive:
    def test_counter_column_e2e(self, tmp_path):
        """SIT/smoke/04_counters analogue: tool_calls is an additive delta
        column; two replay runs accumulate (reference delta semantics,
        TargetUpdateStatement.java:69-76)."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("tool_calls", pa.float64()),
            ]
        )

        def mk(deltas, seq0):
            n = len(deltas)
            return pa.table(
                {
                    "op": pa.array(["UPSERT"] * n),
                    "conv_id": pa.array([d[0] for d in deltas]),
                    "turn_idx": pa.array([d[1] for d in deltas], pa.int32()),
                    "tool_calls": pa.array([d[2] for d in deltas], pa.float64()),
                    "writetime": pa.array(range(seq0, seq0 + n), pa.int64()),
                    "event_seq": pa.array(range(seq0, seq0 + n), pa.int64()),
                }
            )

        lake = str(tmp_path / "lake")
        replay(
            mk([("a", 0, 3.0), ("a", 0, 4.0), ("b", 1, 10.0)], 0),
            lake,
            num_parts=4,
            payload_schema=schema,
            counter_cols=("tool_calls",),
        )
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        assert got.loc[("a", 0), "tool_calls"] == 7.0
        assert got.loc[("b", 1), "tool_calls"] == 10.0
        # incremental second run adds on top of existing state
        replay(
            mk([("a", 0, 5.0)], 100),
            lake,
            num_parts=4,
            counter_cols=("tool_calls",),
        )
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        assert got.loc[("a", 0), "tool_calls"] == 12.0


@pytest.mark.usefixtures("ray_session")
class TestNullPkDefaulting:
    def test_null_pk_filled_not_dropped(self, tmp_path):
        """null_ts_in_pk analogue (CqlTable.convertNull:375-400): events with a
        null PK component are defaulted ('' / -1), not lost."""
        t = pa.table(
            {
                "op": ["INSERT", "INSERT"],
                "conv_id": pa.array([None, "c1"], pa.string()),
                "turn_idx": pa.array([0, None], pa.int32()),
                "role": ["user", "user"],
                "text": ["null-conv", "null-turn"],
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array([None, None], pa.timestamp("us")),
                "writetime": pa.array([1, 2], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(t, lake, num_parts=2)
        got = read_lake_pandas(lake)
        assert set(got["text"]) == {"null-conv", "null-turn"}
        assert got.loc[got["text"] == "null-conv", "conv_id"].iloc[0] == ""
        assert got.loc[got["text"] == "null-turn", "turn_idx"].iloc[0] == -1


@pytest.mark.usefixtures("ray_session")
class TestFiltersInReplay:
    def test_writetime_window_and_value_skip(self, tmp_path):
        """`filters` fixture: replay with a writetime window + role skip filter;
        filtered events are absent from the final state."""
        events = gen_change_stream(n_convs=30, n_events=2000, seed=55, p_delete=0.0)
        df = events.to_pandas()
        lo = int(df["writetime"].quantile(0.25))
        hi = int(df["writetime"].quantile(0.75))
        lake = str(tmp_path / "lake")
        replay(
            events,
            lake,
            num_parts=4,
            transforms=[WritetimeWindow(lo, hi), ValueSkipFilter("role", "system")],
        )
        kept = df[
            (df["writetime"] >= lo)
            & (df["writetime"] <= hi)
            & (df["role"].str.lower() != "system")
        ]
        oracle = oracle_final_state(kept)
        got = read_lake_pandas(lake)
        pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestGuardrailPipeline:
    def test_guardrail_scan_counters(self):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": ["ok"] * 4 + ["x" * 3000, "y" * 5000],
            }
        )
        res = guardrail_scan(ray.data.from_pandas(df), max_kb=1)
        assert res.counters == {"READ": 6, "VALID": 4, "LARGE": 2}
        flagged = res.flagged.to_pandas()
        assert sorted(flagged["doc_id"]) == [4, 5]
        assert (flagged["max_col_bytes"] >= 3000).all()


@pytest.mark.usefixtures("ray_session")
class TestCompaction:
    def test_compact_lake_job(self, tmp_path):
        """Standalone compaction: tombstones dropped per grace watermark,
        multi-file partitions merged, state unchanged for live rows."""
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        events = gen_change_stream(n_convs=30, n_events=3000, seed=77, p_delete=0.3)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        before = read_lake_pandas(lake)
        internal = read_lake_pandas(lake, include_tombstones=True, internal=True)
        assert internal["__deleted"].sum() > 0

        res = compact_lake(lake)  # grace None → drop all tombstones
        assert (res.metrics["tombstones"] == 0).all()
        internal2 = read_lake_pandas(lake, include_tombstones=True, internal=True)
        assert internal2["__deleted"].sum() == 0
        pd.testing.assert_frame_equal(read_lake_pandas(lake), before, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestVectorAndTTL:
    def test_vector_column_through_replay(self, tmp_path):
        """SIT/smoke/06_vector analogue: a list<float> embedding payload column
        survives the full replay (LWW winner + unset-null semantics)."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("embedding", pa.list_(pa.float32())),
            ]
        )
        t = pa.table(
            {
                "op": ["INSERT", "UPSERT", "INSERT"],
                "conv_id": ["a", "a", "b"],
                "turn_idx": pa.array([0, 0, 1], pa.int32()),
                "embedding": pa.array(
                    [[1.0, 2.0], None, [5.0, 6.0]], pa.list_(pa.float32())
                ),
                "writetime": pa.array([1, 2, 1], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(t, lake, num_parts=2, payload_schema=schema)
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        assert list(got.loc[("a", 0), "embedding"]) == [1.0, 2.0]  # unset kept
        assert list(got.loc[("b", 1), "embedding"]) == [5.0, 6.0]

    def test_ttl_expiry_filter(self):
        from cassandra_data_migrator_ray.functions.transforms import TTLExpiry

        t = pa.table(
            {
                "id": [1, 2, 3],
                "ts": pa.array(
                    [1_000_000_000_000, 1_000_000_000_000, 1_000_000_000_000],
                    pa.timestamp("us"),
                ),
                "ttl": pa.array([10, 10_000, None], pa.int64()),
            }
        )
        as_of = 1_000_000_000_000 + 3600 * 1_000_000  # one hour later
        out = TTLExpiry(as_of)(t)
        assert out["id"].to_pylist() == [2, 3]  # 10s TTL expired; null never


@pytest.mark.usefixtures("ray_session")
class TestUdtAndStreaming:
    def test_struct_udt_column_through_replay(self, tmp_path):
        """SIT/features/04_udt_mapper analogue: a struct (UDT) payload column
        survives LWW replay with unset-null semantics."""
        udt = pa.struct([("city", pa.string()), ("zip", pa.int32())])
        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("addr", udt)]
        )
        t = pa.table(
            {
                "op": ["INSERT", "UPSERT", "INSERT"],
                "conv_id": ["a", "a", "b"],
                "turn_idx": pa.array([0, 0, 1], pa.int32()),
                "addr": pa.array(
                    [{"city": "paris", "zip": 75001}, None, {"city": "rome", "zip": 1}],
                    udt,
                ),
                "writetime": pa.array([1, 2, 1], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(t, lake, num_parts=2, payload_schema=schema)
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        assert got.loc[("a", 0), "addr"]["city"] == "paris"  # unset kept
        assert got.loc[("b", 1), "addr"]["zip"] == 1

    def test_streaming_microbatches(self, tmp_path):
        """Continuous ingestion: N sequential micro-batches, each an
        exactly-once replay; final state equals the one-shot oracle."""
        full = gen_change_stream(n_convs=40, n_events=5000, seed=123).to_pandas()
        lake = str(tmp_path / "lake")
        for i in range(5):
            chunk = full[(full["event_seq"] >= i * 1000) & (full["event_seq"] < (i + 1) * 1000)]
            replay(chunk.reset_index(drop=True), lake, num_parts=8)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(full), check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestGcGraceHazard:
    def test_grace_respecting_compaction_converges(self, tmp_path):
        """Dropping only tombstones older than the future-delivery low-watermark
        keeps incremental merges exactly equal to the full-history oracle."""
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        ev = gen_change_stream(n_convs=100, n_events=8000, seed=201, p_delete=0.2)
        ev2 = gen_change_stream(
            n_convs=100, n_events=2000, seed=202, seq_start=12000, p_delete=0.2
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        grace = int(ev2.to_pandas()["writetime"].min())
        compact_lake(lake, grace_wt=grace)
        replay(ev2, lake, num_parts=4)
        full = pd.concat([ev.to_pandas(), ev2.to_pandas()], ignore_index=True)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(full), check_dtype=False
        )

    def test_ungraced_compaction_resurrects_documented_hazard(self, tmp_path):
        """grace=None compaction followed by OLDER-writetime deliveries loses
        tombstone suppression (the Cassandra gc_grace hazard) — asserted here
        so the semantics stay explicit and documented."""
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        # one key, deleted at a high writetime
        def mk(op, wt, seq, text=None):
            return {
                "op": op, "conv_id": "c", "turn_idx": np.int32(0), "role": None,
                "text": text, "tool": None, "ts": None,
                "writetime": wt, "event_seq": seq,
            }

        import pyarrow as pa
        from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA

        first = pa.Table.from_pandas(
            pd.DataFrame([mk("INSERT", 10, 0, "x"), mk("DELETE", 100, 1)]),
            preserve_index=False,
        ).cast(EVENTS_SCHEMA)
        late_old = pa.Table.from_pandas(
            pd.DataFrame([mk("UPSERT", 50, 2, "resurrected?")]), preserve_index=False
        ).cast(EVENTS_SCHEMA)

        lake = str(tmp_path / "lake")
        replay(first, lake, num_parts=2)
        compact_lake(lake)  # grace=None: tombstone at wt=100 dropped
        replay(late_old, lake, num_parts=2)
        got = read_lake_pandas(lake)
        # without the tombstone the older upsert wins — the documented hazard
        assert got["text"].tolist() == ["resurrected?"]

        # same stream, grace-kept tombstone → correctly suppressed
        lake2 = str(tmp_path / "lake2")
        replay(first, lake2, num_parts=2)
        compact_lake(lake2, grace_wt=40)  # tombstone wt=100 >= 40 → kept
        replay(late_old, lake2, num_parts=2)
        assert len(read_lake_pandas(lake2)) == 0
