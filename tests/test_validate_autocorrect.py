"""DiffData-style validation + autocorrect + resume fixtures.

Mirrors /root/reference SIT/smoke/02_autocorrect_kvp (migrate → corrupt →
validate → autocorrect → validate clean) and the trackRun pending-partition
resume (job/BasePartitionJob.scala:41-55)."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.schema import KEY_COLS
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


@pytest.mark.usefixtures("ray_session")
class TestValidate:
    def test_validate_clean(self, tmp_path):
        events = gen_change_stream(n_convs=40, n_events=3000, seed=31)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=8)
        res = validate(oracle_final_state(events.to_pandas()), lake)
        assert res.ok, res.counts
        assert res.counts["VALID"] > 0
        assert res.report.empty

    def test_validate_detects_and_corrects_corruption(self, tmp_path):
        """migrate → breakData → validate (finds MISSING+MISMATCH+EXTRA) →
        autocorrect → validate clean (SIT/smoke/02_autocorrect_kvp)."""
        events = gen_change_stream(n_convs=40, n_events=3000, seed=33)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        expected = oracle_final_state(events.to_pandas())

        # corrupt the lake in place: delete one row, mutate one text,
        # inject one extra row (route-consistent: a phantom write, not a
        # mis-routed file corruption — autocorrect deletes route by key)
        from cassandra_data_migrator_ray.state.partitioning import assign_partition
        import numpy as np

        for f in glob.glob(os.path.join(lake, "data", "*.parquet")):
            t = pq.read_table(f)
            if t.num_rows < 5:
                continue
            part_k = int(os.path.basename(f).split("-")[1])
            df = t.to_pandas()
            live = df.index[~df["__deleted"]]
            df = df.drop(index=live[0])  # MISSING
            df.loc[live[1], "text"] = "CORRUPTED"  # MISMATCH
            extra = df.loc[[live[2]]].copy()
            extra_conv = next(
                f"convEXTRA{i}"
                for i in range(1000)
                if assign_partition(
                    np.array([f"convEXTRA{i}"], dtype=object), np.array([0]), 4
                )[0]
                == part_k
            )
            extra["conv_id"] = extra_conv  # EXTRA (routes back to this file)
            extra["turn_idx"] = np.int32(0)
            df = pd.concat([df, extra], ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False).cast(t.schema), f
            )
            break

        res = validate(expected, lake)
        assert not res.ok
        assert res.counts["MISSING"] == 1
        assert res.counts["MISMATCH"] == 1
        assert res.counts["EXTRA"] == 1
        assert set(res.report["status"]) == {"MISSING", "MISMATCH", "EXTRA"}
        mm = res.report[res.report["status"] == "MISMATCH"].iloc[0]
        assert "text" in mm["cols_differ"]

        autocorrect(res, lake)
        res2 = validate(expected, lake)
        assert res2.ok, res2.counts
        pd.testing.assert_frame_equal(read_lake_pandas(lake), expected, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_resume_midway(self, tmp_path):
        """Crash after phase 1 wrote only SOME partition receipts; a re-run with
        the same run_id must skip receipted partitions, merge the rest, and
        converge to the uninterrupted result."""
        events = gen_change_stream(n_convs=60, n_events=4000, seed=41)
        lake = str(tmp_path / "lake")
        run_id = "runcrash01"
        # phase 1 only (no manifest commit) — simulates dying before phase 2
        replay(events, lake, num_parts=8, run_id=run_id, commit=False)
        staging = os.path.join(lake, "_staging", run_id)
        receipts = sorted(f for f in os.listdir(staging) if f.endswith(".json"))
        assert len(receipts) == 8
        # simulate a crash that only got through half the partitions
        for r in receipts[4:]:
            os.unlink(os.path.join(staging, r))

        res = replay(events, lake, num_parts=8, run_id=run_id)  # resume + commit
        statuses = res.metrics.set_index("part")["status"]
        assert (statuses == "SKIPPED_RESUME").sum() == 4
        assert (statuses == "PASS").sum() == 4
        oracle = oracle_final_state(events.to_pandas())
        pd.testing.assert_frame_equal(read_lake_pandas(lake), oracle, check_dtype=False)

    def test_uncommitted_files_invisible_and_gced(self, tmp_path):
        """Phase-1 files without a manifest reference are never read and are
        removed by GC on the next commit."""
        events = gen_change_stream(n_convs=20, n_events=1000, seed=43)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        committed = read_lake_pandas(lake)

        # a crashed second run leaves orphan data files + receipts
        more = gen_change_stream(n_convs=20, n_events=500, seed=44, seq_start=2000)
        replay(more, lake, num_parts=4, run_id="deadrun", commit=False)
        assert len(glob.glob(os.path.join(lake, "data", "*deadrun*"))) > 0
        pd.testing.assert_frame_equal(read_lake_pandas(lake), committed, check_dtype=False)

        # next committed run GCs the orphans
        third = gen_change_stream(n_convs=20, n_events=500, seed=45, seq_start=4000)
        replay(third, lake, num_parts=4)
        assert glob.glob(os.path.join(lake, "data", "*deadrun*")) == []


@pytest.mark.usefixtures("ray_session")
class TestValidateGroupbyPath:
    def test_validate_groupby_shuffle(self, tmp_path):
        """The sort-shuffle comparator path (no shared storage) agrees."""
        events = gen_change_stream(n_convs=30, n_events=2000, seed=61)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        expected = oracle_final_state(events.to_pandas())
        res = validate(expected, lake, shuffle="groupby")
        assert res.ok and res.counts["VALID"] == len(expected)


@pytest.mark.usefixtures("ray_session")
class TestColumnSubsetValidate:
    def test_subset_compare_and_correct(self, tmp_path):
        """columns=[...] restricts the diff to a payload subset (reference
        column skip-list on the diff path): differences in omitted columns
        are invisible, and autocorrect repairs only the compared columns
        without clobbering the others."""
        events = gen_change_stream(n_convs=30, n_events=1500, seed=91)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        exp = oracle_final_state(events.to_pandas())

        # corrupt expectations in BOTH a compared and an omitted column
        bad = exp.copy()
        bad.loc[bad.index[0], "text"] = "WRONG-TEXT"
        bad.loc[bad.index[1], "role"] = "WRONG-ROLE"

        res_all = validate(bad, lake)
        assert res_all.counts["MISMATCH"] == 2

        res_sub = validate(bad, lake, columns=["text"])
        assert res_sub.counts["MISMATCH"] == 1  # the role corruption is skipped

        # autocorrect from the subset run rewrites text only; role stays at
        # the lake's (correct) value, so a full validate against the true
        # oracle still fails only on the text row we just "corrected" to bad
        autocorrect(res_sub, lake)
        res_after = validate(exp, lake)
        assert res_after.counts["MISMATCH"] == 1
        rep = res_after.report
        assert (rep.loc[rep["status"] == "MISMATCH", "cols_differ"] == "text").all()


@pytest.mark.usefixtures("ray_session")
class TestValidateEdgeParity:
    def test_null_key_expected_matches_defaulted_lake(self, tmp_path):
        """An expected dataset still carrying null key components must route
        and compare identically to the lake's defaulted rows (normalize
        defaults nulls on the write path; validate now applies the same
        defaults on the expected side)."""
        import pyarrow as pa

        ev = pa.table(
            {
                "op": ["UPSERT", "UPSERT"],
                "conv_id": pa.array([None, "b"], pa.string()),
                "turn_idx": pa.array([0, 0], pa.int32()),
                "role": pa.array(["user", "user"]),
                "text": pa.array(["hello", "world"]),
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array([None, None], pa.timestamp("us")),
                "writetime": pa.array([10, 20], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        # expected side keeps the null conv_id — exactly what an origin
        # extract would contain
        expected = pd.DataFrame(
            {
                "conv_id": [None, "b"],
                "turn_idx": pd.array([0, 0], dtype="int32"),
                "role": ["user", "user"],
                "text": ["hello", "world"],
                "tool": [None, None],
                "ts": pd.array([pd.NaT, pd.NaT], dtype="datetime64[us]"),
            }
        )
        res = validate(expected, lake)
        assert res.ok, res.counts

    def test_int64_keys_beyond_2p53_compare_exactly(self, tmp_path):
        """Distinct int64 keys above 2^53 (which quantize to the same float64)
        must stay distinct in the comparator."""
        import pyarrow as pa

        big = 1 << 53
        schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
        ev = pa.table(
            {
                "op": ["UPSERT", "UPSERT"],
                "k": pa.array([big + 1, big + 2], pa.int64()),
                "v": pa.array(["x", "y"]),
                "writetime": pa.array([10, 20], pa.int64()),
                "event_seq": pa.array([0, 1], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2, payload_schema=schema, key_cols=("k",))
        expected = pd.DataFrame({"k": [big + 1, big + 2], "v": ["x", "y"]})
        res = validate(expected, lake)
        assert res.ok and res.counts["VALID"] == 2, res.counts

        # and a real difference on one of the two near-identical keys is seen
        bad = expected.copy()
        bad.loc[1, "v"] = "CORRUPT"
        res2 = validate(bad, lake)
        assert res2.counts["MISMATCH"] == 1 and res2.counts["VALID"] == 1

    def test_high_partition_count_coarse_validate(self, tmp_path):
        """>256 partitions routes validate through the two-level staged
        exchange (coarse slabs split on PART_COL) — results identical."""
        events = gen_change_stream(n_convs=80, n_events=4000, seed=55)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=512)
        exp = oracle_final_state(events.to_pandas())
        res = validate(exp, lake)
        assert res.ok, res.counts
        bad = exp.copy()
        bad.loc[bad.index[0], "text"] = "X"
        res2 = validate(bad, lake)
        assert res2.counts["MISMATCH"] == 1
