"""Manifest housekeeping regressions: staged raw events are GC'd at commit
(receipts kept), and an all-null Arrow null-typed column evolves cleanly."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas
from cassandra_data_migrator_ray.state.manifest import Manifest


@pytest.mark.usefixtures("ray_session")
class TestStagingGcAtCommit:
    def test_staged_events_deleted_receipts_kept(self, tmp_path):
        events = gen_change_stream(n_convs=20, n_events=1000, seed=5)
        lake = str(tmp_path / "lake")
        res = replay(events, lake, num_parts=4)
        sdir = os.path.join(lake, "_staging", res.run_id)
        assert os.path.isdir(sdir)
        # raw staged event copies are gone, receipt json files remain
        assert not os.path.isdir(os.path.join(sdir, "events"))
        receipts = [f for f in os.listdir(sdir) if f.endswith(".json")]
        assert receipts, os.listdir(sdir)

    def test_second_run_same_id_resumes_from_receipts(self, tmp_path):
        """Receipts alone are sufficient for resume after the events GC."""
        events = gen_change_stream(n_convs=20, n_events=1000, seed=6)
        lake = str(tmp_path / "lake")
        res = replay(events, lake, num_parts=4)
        want = read_lake_pandas(lake)
        res2 = replay(events, lake, num_parts=4, run_id=res.run_id)
        got = read_lake_pandas(lake)
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestNullTypeEvolution:
    def test_all_none_column_replays(self, tmp_path):
        """A pandas input whose nullable column is entirely None infers Arrow
        null type — must not be rejected as a non-additive schema change."""
        df = pd.DataFrame(
            {
                "op": ["INSERT", "INSERT"],
                "conv_id": ["c1", "c2"],
                "turn_idx": pd.array([0, 1], dtype="int32"),
                "role": ["user", "assistant"],
                "text": ["hello", "world"],
                "tool": pd.array([None, None], dtype=object),
                "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                "writetime": pd.array([1, 2], dtype="int64"),
                "event_seq": pd.array([0, 1], dtype="int64"),
            }
        )
        lake = str(tmp_path / "lake")
        replay(df, lake, num_parts=2)
        got = read_lake_pandas(lake)
        assert len(got) == 2 and got["tool"].isna().all()
        m = Manifest.load(lake)
        assert m.schema.field("tool").type == pa.string()


@pytest.mark.usefixtures("ray_session")
class TestNumericWidening:
    def test_int32_batch_into_int64_column(self, tmp_path):
        """Lossless numeric widening is additive (int32 batch → int64 column);
        narrowing stays a rejected type change."""
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        lake = str(tmp_path / "lake")
        ev64 = pa.table(
            {
                "op": ["UPSERT"],
                "k": pa.array([1], pa.int64()),
                "v": pa.array([10], pa.int64()),
                "writetime": pa.array([1], pa.int64()),
                "event_seq": pa.array([0], pa.int64()),
            }
        )
        replay(ev64, lake, num_parts=2, payload_schema=schema, key_cols=("k",))

        ev32 = pa.table(
            {
                "op": ["UPSERT"],
                "k": pa.array([2], pa.int64()),
                "v": pa.array([20], pa.int32()),  # narrower batch, wider column
                "writetime": pa.array([2], pa.int64()),
                "event_seq": pa.array([1], pa.int64()),
            }
        )
        replay(ev32, lake, num_parts=2)
        got = read_lake_pandas(lake).sort_values("k", ignore_index=True)
        assert got["v"].tolist() == [10, 20]
        m = Manifest.load(lake)
        assert m.schema.field("v").type == pa.int64()

    def test_narrowing_rejected(self, tmp_path):
        schema = pa.schema([("k", pa.int64()), ("v", pa.int32())])
        lake = str(tmp_path / "lake")
        ev = pa.table(
            {
                "op": ["UPSERT"],
                "k": pa.array([1], pa.int64()),
                "v": pa.array([10], pa.int32()),
                "writetime": pa.array([1], pa.int64()),
                "event_seq": pa.array([0], pa.int64()),
            }
        )
        replay(ev, lake, num_parts=2, payload_schema=schema, key_cols=("k",))
        wide = pa.table(
            {
                "op": ["UPSERT"],
                "k": pa.array([2], pa.int64()),
                "v": pa.array([2**40], pa.int64()),  # would truncate in int32
                "writetime": pa.array([2], pa.int64()),
                "event_seq": pa.array([1], pa.int64()),
            }
        )
        with pytest.raises(Exception, match="non-additive|schema"):
            replay(wide, lake, num_parts=2)


@pytest.mark.usefixtures("ray_session")
class TestGcValidateStaging:
    def test_commit_gc_keeps_fresh_validate_dirs(self, tmp_path):
        """A concurrent validate's expected-side staging (now under
        _validate/, not _staging/) must survive another run's commit-time GC;
        stale dirs (>24h) are swept."""
        import time as _time

        from cassandra_data_migrator_ray.gen import gen_change_stream

        lake = str(tmp_path / "lake")
        ev = gen_change_stream(n_convs=10, n_events=300, seed=5)
        replay(ev, lake, num_parts=2)

        fresh = os.path.join(lake, "_validate", "v-fresh")
        stale = os.path.join(lake, "_validate", "v-stale")
        os.makedirs(fresh)
        os.makedirs(stale)
        old = _time.time() - 8 * 86_400  # past the 7-day fuse
        os.utime(stale, (old, old))

        ev2 = gen_change_stream(n_convs=10, n_events=200, seed=6, seq_start=1000)
        replay(ev2, lake, num_parts=2)  # commit triggers gc

        assert os.path.isdir(fresh), "fresh validate staging must survive GC"
        assert not os.path.isdir(stale), "stale validate staging is swept"


@pytest.mark.usefixtures("ray_session")
class TestConcurrentWriterGuard:
    def test_lost_update_refused(self, tmp_path):
        """Two writers load the same manifest version; the second commit must
        refuse (lost-update guard) instead of silently overwriting the
        first's partition table."""
        from cassandra_data_migrator_ray.gen import gen_change_stream

        lake = str(tmp_path / "lake")
        ev = gen_change_stream(n_convs=10, n_events=300, seed=7)
        replay(ev, lake, num_parts=2)

        a = Manifest.load(lake)
        b = Manifest.load(lake)
        # writer A commits (empty run — version still advances)
        a.commit_run("writer-a")
        with pytest.raises(RuntimeError, match="concurrent writer"):
            b.commit_run("writer-b")

    def test_simultaneous_commits_serialize_under_lock(self, tmp_path):
        """Two commits racing from the SAME version: the O_EXCL lock
        serializes them — exactly one wins, the other refuses, and the lock
        is released for subsequent sequential commits."""
        import threading

        from cassandra_data_migrator_ray.gen import gen_change_stream

        lake = str(tmp_path / "lake")
        replay(gen_change_stream(n_convs=10, n_events=300, seed=17), lake, num_parts=2)
        a, b = Manifest.load(lake), Manifest.load(lake)
        results = {}

        def go(name, m):
            try:
                m.commit_run(f"race-{name}")
                results[name] = "ok"
            except RuntimeError:
                results[name] = "refused"

        ta = threading.Thread(target=go, args=("a", a))
        tb = threading.Thread(target=go, args=("b", b))
        ta.start(); tb.start(); ta.join(); tb.join()
        assert sorted(results.values()) == ["ok", "refused"], results
        m = Manifest.load(lake)
        m.commit_run("after-race")  # lock released, sequential path intact

    def test_stale_lock_is_broken(self, tmp_path):
        """A crashed writer's lock (mtime > 10 min old) must not wedge the
        lake: the next committer breaks it (via the serialized break-token
        protocol) and proceeds; a stale break-token left by a crashed BREAKER
        is likewise swept."""
        import os
        import time

        from cassandra_data_migrator_ray.gen import gen_change_stream

        lake = str(tmp_path / "lake")
        replay(gen_change_stream(n_convs=10, n_events=300, seed=23), lake, num_parts=2)
        lock = os.path.join(lake, "manifest.lock")
        token = lock + ".break"
        old = time.time() - 1200
        with open(lock, "w") as f:
            f.write("crashed-writer")
        os.utime(lock, (old, old))
        with open(token, "w") as f:
            f.write("crashed-breaker")
        os.utime(token, (old, old))
        m = Manifest.load(lake)
        m.commit_run("after-crash")  # breaks both, commits
        assert not os.path.exists(lock) and not os.path.exists(token)

    def test_fresh_foreign_lock_refuses(self, tmp_path):
        """A LIVE foreign lock (recent mtime) must NOT be broken - the
        committer waits and then refuses loudly (no silent lost update)."""
        import os

        from cassandra_data_migrator_ray.gen import gen_change_stream
        from cassandra_data_migrator_ray.state import manifest as mmod

        lake = str(tmp_path / "lake")
        replay(gen_change_stream(n_convs=10, n_events=300, seed=29), lake, num_parts=2)
        lock = os.path.join(lake, "manifest.lock")
        with open(lock, "w") as f:
            f.write("live-writer")
        m = Manifest.load(lake)
        # virtual clock: sleep() advances monotonic() so the 30 s wait is
        # simulated, not spent
        orig_mono, orig_sleep = mmod.time.monotonic, mmod.time.sleep
        off = [0.0]
        try:
            mmod.time.monotonic = lambda: orig_mono() + off[0]
            mmod.time.sleep = lambda s: off.__setitem__(0, off[0] + s)
            with pytest.raises(RuntimeError, match="held by another writer"):
                m.commit_run("should-refuse")
        finally:
            mmod.time.monotonic, mmod.time.sleep = orig_mono, orig_sleep
        os.unlink(lock)
        m2 = Manifest.load(lake)
        m2.commit_run("after-release")

    def test_same_writer_recommit_ok(self, tmp_path):
        """The normal path (one writer, sequential runs) is unaffected."""
        from cassandra_data_migrator_ray.gen import gen_change_stream

        lake = str(tmp_path / "lake")
        ev = gen_change_stream(n_convs=10, n_events=300, seed=8)
        replay(ev, lake, num_parts=2)
        more = gen_change_stream(n_convs=10, n_events=200, seed=9, seq_start=1000)
        replay(more, lake, num_parts=2)  # loads fresh manifest → commits fine
        m = Manifest.load(lake)
        assert len(m.runs) >= 2
