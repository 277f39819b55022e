"""Real worker-crash fault injection through Ray's task retry.

The resume tests elsewhere simulate a crashed run (``commit=False`` then
re-attach); these tests kill actual worker PROCESSES mid-run (``os._exit``
via the ``chaos_dir`` hook, stages/staging.py ``_chaos_crash_once``) so the
exactly-once protocol is driven by Ray's own retry machinery:

- a stage-1 worker dies AFTER writing its staged slices but BEFORE
  reporting them → the retried task must overwrite the content-addressed
  slices byte-for-byte, never double-stage (counter deltas staged twice
  would fold twice — reference analogue: rerun-safe read-modify-write,
  cql/statement/TargetUpdateStatement.java:69-76);
- a stage-2 worker dies BEFORE writing any receipt → the retried task
  re-reads the staged slices and folds from scratch; partitions the dead
  worker had already receipted resume as SKIPPED_RESUME.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


@pytest.mark.usefixtures("ray_session")
class TestChaosRetry:
    def test_worker_crash_both_stages_exactly_once(self, tmp_path):
        events = gen_change_stream(n_convs=80, n_events=6000, seed=77)
        lake = str(tmp_path / "lake")
        chaos = tmp_path / "chaos"
        chaos.mkdir()
        res = replay(events, lake, num_parts=8, chaos_dir=str(chaos))
        # both injected crashes actually fired (markers are claimed by the
        # dying worker) — without this the test could pass vacuously
        assert (chaos / "stage1-crashed").exists()
        assert (chaos / "stage2-crashed").exists()
        assert res.metrics["status"].isin(["PASS", "SKIPPED_RESUME"]).all()
        got = read_lake_pandas(lake)
        oracle = oracle_final_state(events.to_pandas())
        pd.testing.assert_frame_equal(got, oracle, check_dtype=False)

    def test_worker_crash_counter_stream_no_double_count(self, tmp_path):
        """Counters are the sensitive detector: a retried stage-1 task that
        double-staged its slices, or a stage-2 retry that folded a receipted
        partition again, shows up as a wrong sum — not just a dup row."""
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.float64()),
            ]
        )
        rng = np.random.default_rng(11)
        n = 4000
        base = pd.DataFrame(
            {
                "op": "UPSERT",
                "conv_id": [f"c{i % 53}" for i in range(n)],
                "turn_idx": (np.arange(n) % 7).astype(np.int32),
                "n": rng.integers(1, 10, n).astype(np.float64),
                "writetime": np.arange(n, dtype=np.int64) + 1000,
                "event_seq": np.arange(n, dtype=np.int64),
            }
        )
        lake = str(tmp_path / "lake")
        chaos = tmp_path / "chaos"
        chaos.mkdir()
        replay(
            pa.Table.from_pandas(base, preserve_index=False),
            lake,
            num_parts=8,
            payload_schema=schema,
            counter_cols=("n",),
            chaos_dir=str(chaos),
        )
        assert (chaos / "stage1-crashed").exists()
        assert (chaos / "stage2-crashed").exists()
        got = (
            read_lake_pandas(lake)
            .groupby(["conv_id", "turn_idx"])["n"]
            .sum()
            .sort_index()
        )
        want = base.groupby(["conv_id", "turn_idx"])["n"].sum().sort_index()
        assert np.allclose(got.to_numpy(dtype=np.float64), want.to_numpy())

    def test_worker_crash_during_reshard(self, tmp_path):
        """Kill one phase-1 router (after staging, before reporting) and one
        phase-2 writer (before its part file) during a lake reshard: the
        bytes-fingerprint content addressing and deterministic part-file
        names must make both retries pure overwrites."""
        from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake
        from cassandra_data_migrator_ray.sources.lake import lookup

        events = gen_change_stream(n_convs=60, n_events=5000, seed=13)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=8)
        before = read_lake_pandas(lake)
        chaos = tmp_path / "chaos"
        chaos.mkdir()
        reshard_lake(lake, 20, salt=2, chaos_dir=str(chaos))
        assert (chaos / "stage1-crashed").exists()
        assert (chaos / "reshard2-crashed").exists()
        after = read_lake_pandas(lake)
        pd.testing.assert_frame_equal(after, before, check_dtype=False)
        # point lookups route with the NEW layout post-reshard
        key = before.iloc[0]
        hit = lookup(lake, [(key["conv_id"], key["turn_idx"])])
        assert len(hit) == 1

    def test_worker_crash_with_rerun_multiplier(self, tmp_path):
        """Crash + resume with subdivided retry (rerun_multiplier>1): the
        partial-fold path shares the same receipt protocol."""
        events = gen_change_stream(n_convs=40, n_events=4000, seed=5)
        lake = str(tmp_path / "lake")
        chaos = tmp_path / "chaos"
        chaos.mkdir()
        res = replay(
            events, lake, num_parts=8, rerun_multiplier=2, chaos_dir=str(chaos)
        )
        assert (chaos / "stage2-crashed").exists()
        assert res.metrics["status"].isin(["PASS", "SKIPPED_RESUME"]).all()
        got = read_lake_pandas(lake)
        oracle = oracle_final_state(events.to_pandas())
        pd.testing.assert_frame_equal(got, oracle, check_dtype=False)
