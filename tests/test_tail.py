"""WAL/binlog-tail micro-batch loop + per-partition lag metrics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.tail import (
    lag_report,
    run_throughput,
    tail_replay,
)
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


def _split_parquet(events: pa.Table, out_dir: str, n: int) -> list[str]:
    """Write the stream as n closed segment files ordered by event_seq."""
    os.makedirs(out_dir, exist_ok=True)
    order = pa.compute.sort_indices(events["event_seq"])
    events = events.take(order)
    paths = []
    step = (len(events) + n - 1) // n
    for i in range(n):
        seg = events.slice(i * step, step)
        p = os.path.join(out_dir, f"seg-{i:04d}.parquet")
        pq.write_table(seg, p)
        paths.append(p)
    return paths


@pytest.mark.usefixtures("ray_session")
class TestTailReplay:
    def test_tail_ingests_segments_matches_oracle(self, tmp_path):
        """Segments pre-placed → drained in cycles; final state == oracle."""
        ev = gen_change_stream(n_convs=120, n_events=6000, seed=11)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        _split_parquet(ev, src, 3)

        res = tail_replay(
            src,
            lake,
            poll_interval=0,
            max_cycles=5,
            num_parts=8,
        )
        assert len(res.files_ingested) == 3
        got = read_lake_pandas(lake)
        exp = oracle_final_state(ev.to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_tail_incremental_arrival_and_idle_stop(self, tmp_path):
        """Files arriving between cycles are picked up; idle cycles stop the
        loop; redelivered (already-ledgered) files are never re-read."""
        ev = gen_change_stream(n_convs=60, n_events=3000, seed=12)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        paths = _split_parquet(ev, src, 2)
        # hide the second segment: simulate later arrival
        hidden = paths[1] + ".hold"
        os.rename(paths[1], hidden)

        r1 = tail_replay(src, lake, poll_interval=0, max_cycles=1, num_parts=4)
        assert r1.files_ingested == [paths[0]]

        os.rename(hidden, paths[1])
        r2 = tail_replay(
            src, lake, poll_interval=0, stop_after_idle_cycles=2, num_parts=4
        )
        assert r2.files_ingested == [paths[1]]

        got = read_lake_pandas(lake)
        exp = oracle_final_state(ev.to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

        # a third loop sees nothing new and exits on idle
        r3 = tail_replay(
            src, lake, poll_interval=0, stop_after_idle_cycles=1, num_parts=4
        )
        assert r3.files_ingested == [] and r3.keys_merged == 0

    def test_tail_crash_between_commit_and_ledger_is_exactly_once(self, tmp_path):
        """Ledger deleted after ingest (crash-before-ledger-write analogue):
        the rerun re-reads the same file but the watermark filter makes the
        merge a no-op — final state unchanged, no duplicates."""
        ev = gen_change_stream(n_convs=50, n_events=2500, seed=13)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        _split_parquet(ev, src, 1)

        tail_replay(src, lake, poll_interval=0, max_cycles=1, num_parts=4)
        exp = oracle_final_state(ev.to_pandas())
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), exp, check_dtype=False
        )

        os.remove(os.path.join(lake, "_tail_ledger.json"))  # lose the ledger
        r2 = tail_replay(src, lake, poll_interval=0, max_cycles=1, num_parts=4)
        assert len(r2.files_ingested) == 1  # re-read …
        assert r2.keys_merged == 0  # … but nothing merged (watermark no-op)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), exp, check_dtype=False
        )


class TestTailCrashWithNewArrivals:
    @pytest.mark.usefixtures("ray_session")
    def test_crashed_cycle_then_new_file_loses_nothing(self, tmp_path):
        """A cycle crashes mid-replay (receipts written, no commit); before
        the rerun another segment arrives.  The rerun's file set differs, so
        it must NOT resume from the stale receipts — every event of both
        files must reach the lake (regression: positional run_ids made the
        rerun skip partitions that now carried new events)."""
        import hashlib

        from cassandra_data_migrator_ray.pipelines.replay import replay as raw_replay

        ev = gen_change_stream(n_convs=60, n_events=3000, seed=21)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        paths = _split_parquet(ev, src, 2)
        hidden = paths[1] + ".hold"
        os.rename(paths[1], hidden)

        # simulate the crashed first cycle: same run_id tail would derive for
        # the single-file set, receipts written, commit never happens
        crashed_id = "tail-00000000-" + hashlib.blake2s(
            paths[0].encode(), digest_size=6
        ).hexdigest()
        raw_replay(paths[0], lake, num_parts=4, run_id=crashed_id, commit=False)

        os.rename(hidden, paths[1])  # f2 arrives before the rerun
        res = tail_replay(
            src, lake, poll_interval=0, stop_after_idle_cycles=1, num_parts=4
        )
        assert sorted(res.files_ingested) == sorted(paths)
        got = read_lake_pandas(lake)
        exp = oracle_final_state(ev.to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestTailCli:
    def test_cli_tail_then_metrics(self, tmp_path):
        import json
        import subprocess
        import sys

        ev = gen_change_stream(n_convs=30, n_events=1200, seed=15)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        _split_parquet(ev, src, 2)

        def run(*args):
            return subprocess.run(
                [sys.executable, "-m", "cassandra_data_migrator_ray",
                 "--num-cpus", "2", *args],
                capture_output=True, text=True, cwd="/root/repo", timeout=180,
            )

        r = run("tail", "--source", src, "--lake", lake, "--num-parts", "4",
                "--poll-interval", "0", "--stop-after-idle", "1")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["files_ingested"] == 2 and out["keys_merged"] > 0

        r = run("metrics", "--lake", lake, "--scan")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(out["partitions"]) == 4 and len(out["runs"]) >= 1
        assert all(p["lag_us"] > 0 for p in out["partitions"])


@pytest.mark.usefixtures("ray_session")
class TestLagMetrics:
    def test_lag_report_and_throughput(self, tmp_path):
        ev = gen_change_stream(n_convs=80, n_events=4000, seed=14)
        src = str(tmp_path / "wal")
        lake = str(tmp_path / "lake")
        _split_parquet(ev, src, 2)
        tail_replay(src, lake, poll_interval=0, max_cycles=2, num_parts=4)

        rep = lag_report(lake)
        assert set(rep.columns) == {
            "partition", "rows", "tombstones", "watermark_seq", "status", "n_files",
        }
        assert rep["rows"].sum() == len(read_lake_pandas(lake))
        assert (rep["status"] == "PASS").all()
        assert (rep["watermark_seq"] >= 0).all()

        now_us = 2_000_000_000_000_000
        scanned = lag_report(lake, scan=True, now_us=now_us)
        assert (scanned["max_row_wt"] > 0).all()
        assert (scanned["lag_us"] == now_us - scanned["max_row_wt"]).all()

        # the footer-statistics fast path must be EXACT: recompute each
        # partition's max __row_wt by decoding the column and compare
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.state.manifest import Manifest

        m = Manifest.load(lake)
        for _, row in scanned.iterrows():
            st = m.partitions[int(row["partition"])]
            true_mx = max(
                int(
                    pq.read_table(os.path.join(lake, f), columns=["__row_wt"])
                    .column("__row_wt")
                    .to_numpy(zero_copy_only=False)
                    .max()
                )
                for f in st.files
            )
            assert int(row["max_row_wt"]) == true_mx

        tp = run_throughput(lake)
        assert len(tp) >= 1 and (tp["keys_in"] > 0).any()


@pytest.mark.usefixtures("ray_session")
class TestTailCsvFormat:
    def test_tail_drains_csv_segments(self, tmp_path):
        """The tail loop ingests CSV change segments (file_format plumbed
        through to the schema-coerced multi-format reader)."""
        from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA

        ev = gen_change_stream(n_convs=25, n_events=900, seed=19)
        df = ev.to_pandas()
        src = str(tmp_path / "wal")
        os.makedirs(src)
        half = len(df) // 2
        for i, chunk in enumerate((df.iloc[:half], df.iloc[half:])):
            c = chunk.copy()
            c["ts"] = c["ts"].astype(str).replace("NaT", "")
            c.to_csv(os.path.join(src, f"seg-{i:04d}.csv"), index=False)

        lake = str(tmp_path / "lake")
        res = tail_replay(
            src,
            lake,
            pattern="*.csv",
            file_format="csv",
            event_schema=EVENTS_SCHEMA,
            poll_interval=0,
            stop_after_idle_cycles=1,
            num_parts=4,
        )
        assert len(res.files_ingested) == 2
        got = read_lake_pandas(lake)
        exp = oracle_final_state(df)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
