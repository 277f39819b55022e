"""Counter exactly-once semantics under duplicate delivery and stage-1 retry.

Reference counters are read-modify-write (delta = origin − target,
cql/statement/TargetUpdateStatement.java:69-76) and thus rerun-safe; this
engine's additive fold must therefore apply each counter event exactly once:

- duplicate *deliveries* in the input stream share a globally-unique
  ``event_seq`` → deduped inside fold_events / fold_events_arrow;
- a *retried stage-1 task* re-stages the same slice → content-addressed staged
  file names make the retry overwrite, not append;
- the same contribution visible in two merged partials/fragments (identical
  (wt, seq) token + value) → deduped in merge_state_frames.

Counters also accumulate in int64 (reference counters are Long) — no float64
precision loss past 2^53.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.functions.lww import (
    fold_events,
    fold_events_arrow,
    merge_state_frames,
)
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.schema import KEY_COLS
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas
from cassandra_data_migrator_ray.stages.staging import StageWriter


def _events(rows):
    """rows: (conv_id, turn_idx, delta, writetime, event_seq)."""
    return pd.DataFrame(
        {
            "op": ["UPSERT"] * len(rows),
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.array([r[1] for r in rows], dtype=np.int32),
            "n": np.array([r[2] for r in rows], dtype=np.float64),
            "writetime": np.array([r[3] for r in rows], dtype=np.int64),
            "event_seq": np.array([r[4] for r in rows], dtype=np.int64),
        }
    )


class TestFoldDedup:
    def test_duplicate_event_counted_once_pandas(self):
        ev = _events([("a", 0, 5.0, 10, 1), ("a", 0, 5.0, 10, 1), ("a", 0, 2.0, 11, 2)])
        st = fold_events(ev, KEY_COLS, ["n"], counter_cols=["n"])
        assert int(st["n"].iloc[0]) == 7

    def test_duplicate_event_counted_once_arrow(self):
        ev = pa.Table.from_pandas(
            _events([("a", 0, 5.0, 10, 1), ("a", 0, 5.0, 10, 1), ("a", 0, 2.0, 11, 2)]),
            preserve_index=False,
        )
        st = fold_events_arrow(ev, KEY_COLS, ["n"], counter_cols=["n"]).to_pandas()
        assert int(st["n"].iloc[0]) == 7

    def test_int64_precision_beyond_2p53(self):
        big = (1 << 53) + 1  # not representable as float64
        ev = pd.DataFrame(
            {
                "op": ["UPSERT", "UPSERT"],
                "conv_id": ["a", "a"],
                "turn_idx": np.array([0, 0], dtype=np.int32),
                "n": pd.array([big, 1], dtype="Int64"),
                "writetime": np.array([10, 11], dtype=np.int64),
                "event_seq": np.array([1, 2], dtype=np.int64),
            }
        )
        st = fold_events(ev, KEY_COLS, ["n"], counter_cols=["n"])
        assert int(st["n"].iloc[0]) == big + 1

    def test_merge_dedups_identical_partials(self):
        ev = _events([("a", 0, 5.0, 10, 1)])
        p = fold_events(ev, KEY_COLS, ["n"], counter_cols=["n"])
        merged = merge_state_frames([p, p.copy()], KEY_COLS, ["n"], counter_cols=["n"])
        assert int(merged["n"].iloc[0]) == 5

    def test_merge_still_adds_distinct_partials(self):
        p1 = fold_events(_events([("a", 0, 5.0, 10, 1)]), KEY_COLS, ["n"], counter_cols=["n"])
        p2 = fold_events(_events([("a", 0, 3.0, 12, 2)]), KEY_COLS, ["n"], counter_cols=["n"])
        merged = merge_state_frames([p1, p2], KEY_COLS, ["n"], counter_cols=["n"])
        assert int(merged["n"].iloc[0]) == 8


@pytest.mark.usefixtures("ray_session")
class TestStageRetryAndE2E:
    def test_stage_writer_retry_overwrites(self, tmp_path):
        """A retried stage-1 task produces identical slices; content-addressed
        names mean the second write replaces the first (same file count)."""
        sdir = str(tmp_path / "staging")
        t = pa.table(
            {
                "op": ["UPSERT"] * 4,
                "conv_id": ["a", "b", "a", "b"],
                "turn_idx": pa.array([0, 0, 1, 1], pa.int32()),
                "n": pa.array([1.0, 2.0, 3.0, 4.0]),
                "writetime": pa.array([1, 2, 3, 4], pa.int64()),
                "event_seq": pa.array([1, 2, 3, 4], pa.int64()),
                "__part": pa.array([0, 1, 0, 1], pa.int32()),
            }
        )
        w = StageWriter(sdir)
        w(t)
        files1 = sorted(
            os.path.join(r, f) for r, _, fs in os.walk(sdir) for f in fs
        )
        w(t)  # the "retry"
        files2 = sorted(
            os.path.join(r, f) for r, _, fs in os.walk(sdir) for f in fs
        )
        assert files1 == files2 and len(files1) == 2

    def test_replay_with_duplicated_counter_events(self, tmp_path):
        """End-to-end: the input stream redelivers counter events (the
        gen.py p_duplicate scenario); the lake must hold each delta once."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.float64()),
            ]
        )
        rng = np.random.default_rng(7)
        n = 2000
        conv = [f"c{i % 37}" for i in range(n)]
        turn = (np.arange(n) % 5).astype(np.int32)
        delta = rng.integers(1, 10, n).astype(np.float64)
        base = pd.DataFrame(
            {
                "op": "UPSERT",
                "conv_id": conv,
                "turn_idx": turn,
                "n": delta,
                "writetime": np.arange(n, dtype=np.int64) + 1000,
                "event_seq": np.arange(n, dtype=np.int64),
            }
        )
        dup_idx = rng.choice(n, size=n // 5, replace=False)
        stream = pd.concat([base, base.iloc[dup_idx]], ignore_index=True)
        stream = stream.sample(frac=1.0, random_state=3, ignore_index=True)

        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(stream, preserve_index=False),
            lake,
            num_parts=8,
            payload_schema=schema,
            counter_cols=("n",),
        )
        got = (
            read_lake_pandas(lake)
            .groupby(["conv_id", "turn_idx"])["n"]
            .sum()
            .sort_index()
        )
        want = (
            base.groupby(["conv_id", "turn_idx"])["n"].sum().sort_index()
        )
        assert np.allclose(got.to_numpy(dtype=np.float64), want.to_numpy())

    def test_replay_with_duplicates_prefold(self, tmp_path):
        """Same stream through the prefold combiner path: same-batch duplicates
        dedup in the fold; cross-batch duplicate partials dedup in the merge
        (identical token + value)."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.float64()),
            ]
        )
        base = _events(
            [("a", 0, 5.0, 10, 1), ("a", 0, 2.0, 11, 2), ("b", 0, 7.0, 12, 3)]
        )
        stream = pd.concat([base, base.iloc[[0]]], ignore_index=True)
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(stream, preserve_index=False),
            lake,
            num_parts=4,
            payload_schema=schema,
            counter_cols=("n",),
            prefold=True,
        )
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])["n"]
        assert int(got.loc[("a", 0)]) == 7 and int(got.loc[("b", 0)]) == 7


@pytest.mark.usefixtures("ray_session")
class TestRerunMultiplierChange:
    def test_stale_partials_from_other_m_not_double_counted(self, tmp_path):
        """A crashed rerun_multiplier=2 attempt leaves partial state files; a
        rerun of the same run_id with rerun_multiplier=3 must merge ONLY its
        own M=3 partials (regression: gathering all partial-*.arrow summed
        every counter delta twice)."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.float64()),
            ]
        )
        base = _events(
            [("a", 0, 5.0, 10, 1), ("a", 0, 2.0, 11, 2), ("b", 0, 7.0, 12, 3)]
        )
        tbl = pa.Table.from_pandas(base, preserve_index=False)
        lake = str(tmp_path / "lake")
        run_id = "mchange"
        kw = dict(num_parts=4, payload_schema=schema, counter_cols=("n",))

        # attempt 1: M=2, dies after phase A partials exist but before commit
        # (simulate: run the full phase but withhold commit)
        replay(tbl, lake, run_id=run_id, rerun_multiplier=2, commit=False, **kw)
        staging = os.path.join(lake, "_staging", run_id)
        # drop the receipts so the rerun treats all partitions as pending
        for f in os.listdir(staging):
            if f.endswith(".json"):
                os.unlink(os.path.join(staging, f))

        # attempt 2: same run, M=3 — must not also merge the M=2 partials
        replay(tbl, lake, run_id=run_id, rerun_multiplier=3, **kw)
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])["n"]
        assert int(got.loc[("a", 0)]) == 7 and int(got.loc[("b", 0)]) == 7


@pytest.mark.usefixtures("ray_session")
class TestStatePrecisionBeyond2p53:
    def test_incremental_merge_preserves_big_int64(self, tmp_path):
        """Lake state re-read for an incremental merge must not round-trip
        nullable int64 payload through float64 (2^53+1 would silently round):
        replay a big counter, then a second batch forcing a state re-read."""
        big = (1 << 53) + 1
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.int64()),
            ]
        )

        def ev(rows, seq0):
            return pa.table(
                {
                    "op": pa.array(["UPSERT"] * len(rows)),
                    "conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "n": pa.array([r[2] for r in rows], pa.int64()),
                    "writetime": pa.array(
                        [100 + i for i in range(len(rows))], pa.int64()
                    ),
                    "event_seq": pa.array(
                        range(seq0, seq0 + len(rows)), pa.int64()
                    ),
                }
            )

        lake = str(tmp_path / "lake")
        kw = dict(num_parts=2, payload_schema=schema, counter_cols=("n",))
        # batch 1: the big value, plus a null-n row so the stored column is
        # nullable (the float64 conversion trigger)
        replay(ev([("a", 0, big), ("b", 0, None)], 0), lake, **kw)
        # batch 2 forces an incremental merge that re-reads partition state
        replay(ev([("b", 0, 7), ("a", 1, 1)], 100), lake, **kw)
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])["n"]
        assert int(got.loc[("a", 0)]) == big  # exact, not 2^53
        assert int(got.loc[("b", 0)]) == 7
