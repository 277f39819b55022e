"""Lake↔lake validation (origin-cluster vs target-cluster DiffData,
job/DiffData.scala:23-44).  Layout-matched pairs compare partition files in
place with zero exchange; mismatched layouts fall back to the validate
exchange — both paths must agree."""

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream
from cassandra_data_migrator_ray.pipelines.diff import diff_lakes
from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake
from cassandra_data_migrator_ray.pipelines.replay import replay


def _mk_event(conv_id, turn_idx, op, seq, wt, text="mutated"):
    return pd.DataFrame(
        {
            "op": [op],
            "conv_id": [conv_id],
            "turn_idx": np.array([turn_idx], dtype=np.int32),
            "text": [text],
            "writetime": np.array([wt], dtype=np.int64),
            "event_seq": np.array([seq], dtype=np.int64),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestDiffLakes:
    def _twin_lakes(self, tmp_path, n_events=4000):
        events = gen_change_stream(n_convs=50, n_events=n_events, seed=31)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        replay(events, a, num_parts=8)
        replay(events, b, num_parts=8)
        return a, b, events

    def test_identical_lakes_all_valid(self, tmp_path):
        a, b, _ = self._twin_lakes(tmp_path)
        res = diff_lakes(a, b)
        assert res.ok, res.counts
        assert res.counts["VALID"] > 0
        assert len(res.report) == 0

    def test_divergence_classified(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        a, b, _ = self._twin_lakes(tmp_path)
        state = read_lake_pandas(b)
        k_mut, k_del = state.iloc[0], state.iloc[1]
        wt = 10**18  # generated writetimes are epoch-us (~1.7e15); beat them all
        # mutate one key in b (MISMATCH), delete one (MISSING: live in a
        # only), insert one unknown key (EXTRA: live in b only)
        replay(
            pd.concat(
                [
                    _mk_event(k_mut["conv_id"], k_mut["turn_idx"], "UPSERT", 10**9, wt),
                    _mk_event(k_del["conv_id"], k_del["turn_idx"], "DELETE", 10**9 + 1, wt),
                    _mk_event("conv_phantom", 0, "UPSERT", 10**9 + 2, wt),
                ],
                ignore_index=True,
            ),
            b,
            num_parts=8,
        )
        res = diff_lakes(a, b)
        assert res.counts["MISMATCH"] == 1
        assert res.counts["MISSING"] == 1
        assert res.counts["EXTRA"] == 1
        got = set(res.report["status"])
        assert got == {"MISMATCH", "MISSING", "EXTRA"}

    def test_column_subset_skips_divergence(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        a, b, _ = self._twin_lakes(tmp_path)
        k = read_lake_pandas(b).iloc[0]
        replay(
            _mk_event(k["conv_id"], k["turn_idx"], "UPSERT", 10**9, 10**18),
            b,
            num_parts=8,
        )
        assert diff_lakes(a, b).counts["MISMATCH"] == 1
        # comparing only a column the mutation did not touch → clean
        res = diff_lakes(a, b, columns=["role"])
        assert res.counts["MISMATCH"] == 0, res.report

    def test_layout_mismatch_falls_back_and_agrees(self, tmp_path):
        a, b, _ = self._twin_lakes(tmp_path)
        fast = diff_lakes(a, b)
        reshard_lake(b, 20, salt=2)
        slow = diff_lakes(a, b)  # layouts differ → exchange fallback
        assert slow.counts == fast.counts
        # and the reverse direction, fast path on b's new layout vs itself
        assert diff_lakes(b, b).ok

    def test_time_travel_diff(self, tmp_path):
        """version_a / version_b pin either side to a committed snapshot:
        b@v1 equals its twin a, and diffing b@v1 against live b reproduces
        exactly the a-vs-b divergence counts."""
        a, b, _ = self._twin_lakes(tmp_path)
        more = gen_change_stream(n_convs=50, n_events=800, seed=99, seq_start=10**7)
        replay(more, b, num_parts=8)

        live = diff_lakes(a, b)
        assert not live.ok  # the second batch diverged b from a
        assert diff_lakes(a, b, version_b=1).ok  # b@v1 == a
        drift = diff_lakes(b, b, version_a=1)  # b@v1 (≡ a) vs live b
        assert drift.counts == live.counts

    def test_autocorrect_converges_lakes(self, tmp_path):
        """The DiffData lifecycle for lake pairs: diff → autocorrect the
        target lake from the report → re-diff clean (reference autocorrect
        loop, DiffJobSession.java:215-234)."""
        from cassandra_data_migrator_ray.pipelines.diff import autocorrect
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        a, b, _ = self._twin_lakes(tmp_path)
        state = read_lake_pandas(b)
        k_mut, k_del = state.iloc[0], state.iloc[1]
        wt = 10**18
        replay(
            pd.concat(
                [
                    _mk_event(k_mut["conv_id"], k_mut["turn_idx"], "UPSERT", 10**9, wt),
                    _mk_event(k_del["conv_id"], k_del["turn_idx"], "DELETE", 10**9 + 1, wt),
                    _mk_event("conv_phantom", 0, "UPSERT", 10**9 + 2, wt),
                ],
                ignore_index=True,
            ),
            b,
            num_parts=8,
        )
        res = diff_lakes(a, b)
        assert not res.ok
        autocorrect(res, b)
        res2 = diff_lakes(a, b)
        assert res2.ok, res2.counts

    def test_ttl_as_of_compare(self, tmp_path):
        """A TTL lake compares STORED cells by default (reference DiffData
        semantics); as_of= evaluates expiry first, so a view taken after
        expiry validates clean instead of reporting phantom EXTRA/MISSING."""
        import pyarrow as pa

        from cassandra_data_migrator_ray.pipelines.diff import validate
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        BASE = 1_700_000_000_000_000

        def ev(rows, seq0=0):
            return pa.table(
                {
                    "op": pa.array(["UPSERT"] * len(rows)),
                    "conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "text": pa.array([r[2] for r in rows]),
                    "writetime": pa.array([BASE] * len(rows), pa.int64()),
                    "event_seq": pa.array(
                        list(range(seq0, seq0 + len(rows))), pa.int64()
                    ),
                    "ttl": pa.array([r[3] for r in rows], pa.int64()),
                }
            )

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        replay(ev([("x", 0, "expires", 10), ("y", 0, "stays", None)]), a, num_parts=2)
        replay(ev([("y", 0, "stays", None)]), b, num_parts=2)
        after = BASE + 11_000_000  # 11 s later: x fully expired in a

        # validate: the lake's own expired view round-trips clean only
        # with as_of (stored-state compare reports the expired row EXTRA)
        view = read_lake_pandas(a, as_of=after)
        assert validate(view, a).counts["EXTRA"] == 1
        assert validate(view, a, as_of=after).ok

        # diff_lakes: x is MISSING from b in stored state, absent-absent
        # (clean) once expiry is evaluated on the a side
        assert diff_lakes(a, b).counts["MISSING"] == 1
        assert diff_lakes(a, b, as_of=after).ok

    def test_ttl_as_of_integer_column(self, tmp_path):
        """Expiring a cell of an INTEGER payload column must survive the
        pandas round-trip in the comparator's expiry view (NaN → null, not a
        failed float→int cast)."""
        import pyarrow as pa

        from cassandra_data_migrator_ray.pipelines.diff import validate
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        BASE = 1_700_000_000_000_000
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("score", pa.int64()),
                ("label", pa.string()),
            ]
        )
        # x's int cell expires but its string cell does not → the row stays
        # LIVE with a NaN where the int64 score was (the hazard case)
        tbl = pa.table(
            {
                "op": pa.array(["UPSERT", "UPSERT", "UPSERT"]),
                "conv_id": pa.array(["x", "x", "y"]),
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "score": pa.array([7, None, 9], pa.int64()),
                "label": pa.array([None, "keep", "also"], pa.string()),
                "writetime": pa.array([BASE, BASE + 1, BASE], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
                "ttl": pa.array([10, None, None], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(tbl, lake, num_parts=2, payload_schema=schema)
        after = BASE + 11_000_000
        view = read_lake_pandas(lake, as_of=after)
        res = validate(view, lake, as_of=after)
        assert res.ok, res.counts
        # same through the lake-pair fast path
        assert diff_lakes(lake, lake, as_of=after).ok

    def test_counter_lakes(self, tmp_path):
        import pyarrow as pa

        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("n", pa.float64())]
        )
        base = pd.DataFrame(
            {
                "op": "UPSERT",
                "conv_id": [f"c{i % 11}" for i in range(300)],
                "turn_idx": (np.arange(300) % 3).astype(np.int32),
                "n": np.ones(300),
                "writetime": np.arange(300, dtype=np.int64) + 1,
                "event_seq": np.arange(300, dtype=np.int64),
            }
        )
        kw = dict(num_parts=4, payload_schema=schema, counter_cols=("n",))
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        replay(pa.Table.from_pandas(base, preserve_index=False), a, **kw)
        replay(pa.Table.from_pandas(base, preserve_index=False), b, **kw)
        assert diff_lakes(a, b).ok
        # one extra delta in b → that key's accumulated counter diverges
        extra = base.iloc[[0]].assign(event_seq=np.int64(10**9), writetime=np.int64(10**9))
        replay(pa.Table.from_pandas(extra, preserve_index=False), b, **kw)
        res = diff_lakes(a, b)
        assert res.counts["MISMATCH"] == 1
