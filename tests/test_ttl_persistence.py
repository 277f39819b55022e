"""Durable per-cell TTL (reference USING TTL persistence,
feature/WritetimeTTL.java:235-281 + TargetInsertStatement.java:128-133):
expiry state (c__ttlx / __row_ttlx) lives in the lake, survives incremental
merges, is evaluated at read time with ``as_of`` and hardened to tombstones
by compaction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas
from cassandra_data_migrator_ray.state.manifest import Manifest

BASE = 1_000_000_000_000  # µs


def _ev(rows, seq0=0):
    """rows: (conv_id, turn_idx, text, writetime, ttl_seconds_or_None)."""
    n = len(rows)
    return pa.table(
        {
            "op": pa.array(["UPSERT"] * n),
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([None] * n, pa.timestamp("us")),
            "writetime": pa.array([r[3] for r in rows], pa.int64()),
            "event_seq": pa.array(range(seq0, seq0 + n), pa.int64()),
            "ttl": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestTtlPersistence:
    def test_read_time_expiry(self, tmp_path):
        lake = str(tmp_path / "lake")
        replay(
            _ev(
                [
                    ("a", 0, "expires-in-10s", BASE, 10),
                    ("b", 0, "never-expires", BASE, None),
                ]
            ),
            lake,
            num_parts=2,
        )
        assert Manifest.load(lake).ttl_enabled
        before = read_lake_pandas(lake, as_of=BASE + 5_000_000)
        assert set(before["conv_id"]) == {"a", "b"}
        after = read_lake_pandas(lake, as_of=BASE + 11_000_000)
        # a's only cell and row marker expired -> row gone; b intact
        assert set(after["conv_id"]) == {"b"}

    def test_partial_cell_expiry_keeps_row(self, tmp_path):
        """Only the later-written cell has a TTL: the row survives with that
        cell nulled (per-cell, not per-row, expiry)."""
        lake = str(tmp_path / "lake")
        replay(
            _ev(
                [
                    ("a", 0, "permanent-text", BASE, None),
                ]
            ),
            lake,
            num_parts=2,
        )
        # second run updates `role` with a TTL (text untouched)
        ev2 = _ev([("a", 0, None, BASE + 1, 10)], seq0=10).set_column(
            3, "role", pa.array(["assistant"])
        )
        replay(ev2, lake, num_parts=2)
        live = read_lake_pandas(lake, as_of=BASE + 5_000_000).iloc[0]
        assert live["text"] == "permanent-text" and live["role"] == "assistant"
        later = read_lake_pandas(lake, as_of=BASE + 20_000_000).iloc[0]
        assert later["text"] == "permanent-text" and pd.isna(later["role"])

    def test_compaction_hardens_expiry(self, tmp_path):
        """compact_lake(ttl_as_of=...) makes expiry durable: a plain read
        (no as_of) no longer sees the expired row, and the hardened tombstone
        prevents an older redelivered event from resurrecting it."""
        lake = str(tmp_path / "lake")
        replay(
            _ev(
                [
                    ("a", 0, "short-lived", BASE, 10),
                    ("b", 0, "permanent", BASE, None),
                ]
            ),
            lake,
            num_parts=2,
        )
        # plain read before compaction still sees 'a' (expiry not evaluated)
        assert set(read_lake_pandas(lake)["conv_id"]) == {"a", "b"}
        # grace_wt=0 keeps the hardened tombstone (events at or below its
        # writetime may still be redelivered); grace_wt=None would drop it
        # under the stream-fully-drained promise
        compact_lake(lake, grace_wt=0, ttl_as_of=BASE + 11_000_000)
        assert set(read_lake_pandas(lake)["conv_id"]) == {"b"}
        # an OLDER delivery of the same key must not resurrect (tombstone at
        # the expired row's writetime suppresses wt <= BASE)
        replay(
            _ev([("a", 0, "stale-redelivery", BASE - 5, None)], seq0=100),
            lake,
            num_parts=2,
        )
        assert set(read_lake_pandas(lake)["conv_id"]) == {"b"}

    def test_ttlx_survives_incremental_merge(self, tmp_path):
        """The expiry token rides through a later merge of the same key."""
        lake = str(tmp_path / "lake")
        replay(_ev([("a", 0, "with-ttl", BASE, 10)]), lake, num_parts=2)
        # unrelated key merged later into the same partition universe
        replay(_ev([("z", 9, "other", BASE + 2, None)], seq0=50), lake, num_parts=2)
        got = read_lake_pandas(lake, as_of=BASE + 11_000_000)
        assert set(got["conv_id"]) == {"z"}


@pytest.mark.usefixtures("ray_session")
class TestStreamingTtlParity:
    def test_read_lake_as_of_matches_pandas(self, tmp_path):
        """The streaming read_lake(as_of=...) view must agree with the
        driver-side read_lake_pandas(as_of=...) at every evaluation point."""
        from cassandra_data_migrator_ray.sources.lake import read_lake

        lake = str(tmp_path / "lake")
        replay(
            _ev(
                [
                    ("a", 0, "expires-10s", BASE, 10),
                    ("b", 0, "expires-60s", BASE, 60),
                    ("c", 0, "forever", BASE, None),
                ]
            ),
            lake,
            num_parts=2,
        )
        for at in (BASE + 5_000_000, BASE + 11_000_000, BASE + 61_000_000):
            want = read_lake_pandas(lake, as_of=at)
            got = (
                read_lake(lake, as_of=at)
                .to_pandas()
                .sort_values(["conv_id", "turn_idx"], ignore_index=True)
            )
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestTtlOptOut:
    def test_ttl_false_keeps_column_as_payload(self, tmp_path):
        """A data column literally named 'ttl' is NOT hijacked as expiry
        metadata when the caller passes ttl=False — it is stored, read back,
        and the lake never enables TTL bookkeeping."""
        lake = str(tmp_path / "lake")
        replay(
            _ev([("a", 0, "x", BASE, 300), ("b", 0, "y", BASE, 600)]),
            lake,
            num_parts=2,
            ttl=False,
        )
        m = Manifest.load(lake)
        assert not m.ttl_enabled
        assert "ttl" in m.payload_cols()
        got = read_lake_pandas(lake).set_index("conv_id")
        assert got.loc["a", "ttl"] == 300 and got.loc["b", "ttl"] == 600
        # far future read: nothing expires, it's just data
        far = read_lake_pandas(lake, as_of=BASE + 10**9 * 1_000_000)
        assert len(far) == 2

    def test_ttl_true_requires_column(self, tmp_path):
        import pyarrow as pa

        ev = pa.table(
            {
                "op": ["UPSERT"],
                "conv_id": ["a"],
                "turn_idx": pa.array([0], pa.int32()),
                "text": ["x"],
                "writetime": pa.array([1], pa.int64()),
                "event_seq": pa.array([0], pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="ttl"):
            replay(ev, str(tmp_path / "lake"), num_parts=2, ttl=True)


@pytest.mark.usefixtures("ray_session")
class TestTtlCounterInteraction:
    def test_counter_column_never_expires_cells_do(self, tmp_path):
        """TTL-enabled lake with a counter column: the text cell expires at
        its TTL, the counter total persists (reference: counter tables cannot
        carry TTL — counters are additive state, not cells)."""
        import pyarrow as pa

        from cassandra_data_migrator_ray.pipelines.replay import replay as _replay

        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("text", pa.string()),
                ("n", pa.float64()),
            ]
        )
        ev = pa.table(
            {
                "op": pa.array(["UPSERT", "UPSERT", "UPSERT"]),
                "conv_id": pa.array(["a", "a", "b"]),
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "text": pa.array(["hello", None, "world"]),
                "n": pa.array([5.0, 2.0, 7.0]),
                "writetime": pa.array([BASE, BASE + 1, BASE], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
                "ttl": pa.array([10, None, None], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        _replay(
            ev,
            lake,
            num_parts=2,
            payload_schema=schema,
            key_cols=("conv_id", "turn_idx"),
            counter_cols=("n",),
        )
        before = read_lake_pandas(lake, as_of=BASE + 5_000_000).set_index("conv_id")
        assert before.loc["a", "text"] == "hello" and int(before.loc["a", "n"]) == 7
        after = read_lake_pandas(lake, as_of=BASE + 11_000_000).set_index("conv_id")
        # a's text cell expired; the counter total survives, so the row stays
        assert pd.isna(after.loc["a", "text"])
        assert int(after.loc["a", "n"]) == 7
        assert int(after.loc["b", "n"]) == 7
