"""Combined soak: every hostile axis at once, one lake, one truth.

Separately-tested behaviors can still interact badly; this drives them
together at moderate volume: hot-conversation skew + duplicate delivery +
deletes/nulls + salted routing + rerun-multiplier subdivision + a mid-run
crash-resume + three incremental batches + compaction under grace — and the
lake must equal the independent row-wise oracle after every step, finishing
with a clean validate and a converged autocorrect after corruption.
"""

import os

import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


@pytest.mark.usefixtures("ray_session")
class TestCombinedSoak:
    def test_everything_at_once(self, tmp_path):
        lake = str(tmp_path / "lake")
        n_parts, salt = 16, 4

        # batch 1: hot skew + heavy duplicate delivery + deletes/nulls,
        # interrupted after half the partition receipts, then resumed with
        # rerun-multiplier subdivision
        b1 = gen_change_stream(
            n_convs=150,
            n_events=30_000,
            seed=71,
            hot_frac=0.35,
            p_duplicate=0.20,
            p_delete=0.12,
        )
        run_id = "soak-b1"
        replay(b1, lake, num_parts=n_parts, salt=salt, run_id=run_id, commit=False)
        staging = os.path.join(lake, "_staging", run_id)
        receipts = sorted(f for f in os.listdir(staging) if f.endswith(".json"))
        for r in receipts[len(receipts) // 2 :]:
            os.unlink(os.path.join(staging, r))
        replay(
            b1, lake, num_parts=n_parts, salt=salt, run_id=run_id, rerun_multiplier=3
        )
        truth = b1.to_pandas()
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(truth), check_dtype=False
        )

        # batches 2 and 3: incremental merges, second one redelivers ALL of
        # batch 2 verbatim plus new events (at-least-once upstream)
        b2 = gen_change_stream(
            n_convs=150, n_events=8_000, seed=72, seq_start=1_000_000, hot_frac=0.35
        )
        replay(b2, lake, num_parts=n_parts, salt=salt)
        truth = pd.concat([truth, b2.to_pandas()], ignore_index=True)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(truth), check_dtype=False
        )

        b3 = gen_change_stream(
            n_convs=150, n_events=6_000, seed=73, seq_start=2_000_000, p_delete=0.2
        )
        import pyarrow as pa

        b2_and_b3 = pa.concat_tables([b2, b3])  # b2 redelivered whole
        res3 = replay(b2_and_b3, lake, num_parts=n_parts, salt=salt)
        truth = pd.concat([truth, b3.to_pandas()], ignore_index=True)
        expected = oracle_final_state(truth)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), expected, check_dtype=False
        )
        assert res3.events_merged_keys > 0

        # compaction under grace must not change the visible state
        compact_lake(lake, grace_wt=None)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), expected, check_dtype=False
        )

        # clean validate, then corrupt → autocorrect → converged
        v = validate(expected, lake)
        assert v.ok, v.counts
        bad = expected.copy()
        bad.loc[bad.index[:3], "text"] = "CORRUPTED"
        v2 = validate(bad, lake)
        assert v2.counts["MISMATCH"] == 3
        autocorrect(v2, lake)
        v3 = validate(bad, lake)
        assert v3.ok, v3.counts
