"""End-to-end replay → lake → oracle comparison (SIT-style, through Ray Data)."""

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.schema import KEY_COLS, PAYLOAD_COLS
from cassandra_data_migrator_ray.sources.lake import read_lake, read_lake_pandas


def assert_matches_oracle(lake_dir, events_df):
    oracle = oracle_final_state(events_df)
    got = read_lake_pandas(lake_dir)
    pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestReplayE2E:
    @pytest.mark.parametrize("prefold", [False, True])
    def test_basic_replay(self, tmp_path, prefold):
        events = gen_change_stream(n_convs=80, n_events=5000, seed=42)
        lake = str(tmp_path / f"lake{prefold}")
        res = replay(events, lake, num_parts=8, prefold=prefold)
        assert res.metrics["status"].eq("PASS").all()
        assert_matches_oracle(lake, events.to_pandas())

    def test_pandas_block_dataset_input(self, tmp_path):
        """A caller-supplied Dataset backed by pandas blocks (from_pandas)
        reports numpy/Python schema types; replay must coerce it to Arrow
        rather than hand non-Arrow types to the manifest layer."""
        import ray

        events = gen_change_stream(n_convs=40, n_events=3000, seed=21)
        lake = str(tmp_path / "lake")
        res = replay(ray.data.from_pandas(events.to_pandas()), lake, num_parts=8)
        assert res.metrics["status"].eq("PASS").all()
        assert_matches_oracle(lake, events.to_pandas())

    @pytest.mark.parametrize("codec", ["lz4", "zstd"])
    def test_staged_compression_matches_oracle(self, tmp_path, codec):
        """Compressed staged slices (bandwidth-ceiling knob) must be
        semantically invisible: same final state, and incremental runs on a
        lake whose first run staged uncompressed still converge."""
        full = gen_change_stream(n_convs=60, n_events=4000, seed=33).to_pandas()
        half = len(full) // 2
        lake = str(tmp_path / f"lake_{codec}")
        replay(full[full["event_seq"] < half], lake, num_parts=8)
        res = replay(
            full[full["event_seq"] >= half],
            lake,
            num_parts=8,
            staged_compression=codec,
        )
        assert res.metrics["status"].eq("PASS").all()
        assert_matches_oracle(lake, full)

    def test_incremental_two_runs(self, tmp_path):
        """Second batch of changes merges on top of committed state."""
        full = gen_change_stream(n_convs=50, n_events=4000, seed=9).to_pandas()
        half = len(full) // 2
        first = full[full["event_seq"] < half].reset_index(drop=True)
        second = full[full["event_seq"] >= half].reset_index(drop=True)
        lake = str(tmp_path / "lake")
        replay(first, lake, num_parts=8)
        replay(second, lake, num_parts=8)
        assert_matches_oracle(lake, full)

    def test_duplicate_redelivery_noop(self, tmp_path):
        """Replaying the same batch twice (at-least-once delivery) is a no-op:
        watermark filter drops every event the second time."""
        events = gen_change_stream(n_convs=30, n_events=2000, seed=5)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        v1 = read_lake_pandas(lake)
        res2 = replay(events, lake, num_parts=4)
        v2 = read_lake_pandas(lake)
        pd.testing.assert_frame_equal(v1, v2, check_dtype=False)
        assert res2.events_merged_keys == 0

    def test_salted_routing_same_result(self, tmp_path):
        """Hot-skew axis: salt>1 spreads a hot conversation over partitions and
        must produce the identical final state."""
        events = gen_change_stream(n_convs=40, n_events=4000, seed=11, hot_frac=0.4)
        lake_a = str(tmp_path / "lake_a")
        lake_b = str(tmp_path / "lake_b")
        replay(events, lake_a, num_parts=8, salt=1)
        replay(events, lake_b, num_parts=8, salt=4)
        a = read_lake_pandas(lake_a)
        b = read_lake_pandas(lake_b)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert_matches_oracle(lake_a, events.to_pandas())
        # and the skew must actually flatten: with 40% of events on one
        # conversation, the unsalted lake's hottest partition holds all of it,
        # the salted lake spreads it over up to `salt` partitions
        from cassandra_data_migrator_ray.state.manifest import Manifest

        rows_a = [p.rows for p in Manifest.load(lake_a).partitions.values()]
        rows_b = [p.rows for p in Manifest.load(lake_b).partitions.values()]
        assert max(rows_b) < max(rows_a)

    def test_read_lake_dataset_matches(self, tmp_path):
        events = gen_change_stream(n_convs=20, n_events=1000, seed=2)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)
        ds = read_lake(lake)
        got = (
            ds.to_pandas()
            .sort_values(KEY_COLS, kind="mergesort", ignore_index=True)
        )
        oracle = oracle_final_state(events.to_pandas())
        pd.testing.assert_frame_equal(
            got[[*KEY_COLS, *PAYLOAD_COLS]], oracle, check_dtype=False
        )

    def test_compaction_removes_tombstones(self, tmp_path):
        events = gen_change_stream(n_convs=30, n_events=3000, seed=13, p_delete=0.3)
        lake = str(tmp_path / "lake")
        res = replay(events, lake, num_parts=4, compact=True)
        internal = read_lake_pandas(lake, include_tombstones=True, internal=True)
        from cassandra_data_migrator_ray.schema import DELETED

        assert not internal[DELETED].any()
        assert_matches_oracle(lake, events.to_pandas())

    def test_schema_evolution_mid_stream(self, tmp_path):
        """First half of the stream predates the `tool` column; lake evolves
        additively and old rows read as tool=null."""
        pre = gen_change_stream(n_convs=30, n_events=1500, seed=21, include_tool=True)
        pre = pre.drop_columns("tool")  # column didn't exist yet
        post = gen_change_stream(
            n_convs=30, n_events=1500, seed=22, seq_start=1500, include_tool=True
        )
        lake = str(tmp_path / "lake")
        import pyarrow as pa

        pre_schema = pa.schema([f for f in pre.schema if f.name not in ("op", "writetime", "event_seq")])
        replay(pre, lake, num_parts=4, payload_schema=pre_schema)
        # second run: manifest evolves to include `tool`
        from cassandra_data_migrator_ray.state.manifest import Manifest

        m = Manifest.load(lake)
        post_payload = pa.schema(
            [f for f in post.schema if f.name not in ("op", "writetime", "event_seq")]
        )
        m.evolve_schema(post_payload)
        import cassandra_data_migrator_ray.state.manifest as man

        man.atomic_write_json(m.path, m.to_json())
        replay(post, lake, num_parts=4)

        got = read_lake_pandas(lake)
        assert "tool" in got.columns
        # oracle over the union (pre events have tool absent → null)
        pre_df = pre.to_pandas()
        pre_df["tool"] = None
        full = pd.concat([pre_df, post.to_pandas()], ignore_index=True)
        oracle = oracle_final_state(full)
        pd.testing.assert_frame_equal(
            got[oracle.columns.tolist()], oracle, check_dtype=False
        )

    def test_groupby_shuffle_path(self, tmp_path):
        """The object-store groupby exchange (for clusters without shared
        storage) produces the identical final state."""
        events = gen_change_stream(n_convs=40, n_events=3000, seed=91)
        lake = str(tmp_path / "lake_g")
        replay(events, lake, num_parts=8, shuffle="groupby")
        assert_matches_oracle(lake, events.to_pandas())
        # incremental second run through the same path
        more = gen_change_stream(n_convs=40, n_events=1000, seed=92, seq_start=5000)
        replay(more, lake, num_parts=8, shuffle="groupby")
        full = pd.concat([events.to_pandas(), more.to_pandas()], ignore_index=True)
        assert_matches_oracle(lake, full)


@pytest.mark.usefixtures("ray_session")
class TestTwoLevelStaging:
    def test_high_partition_count_matches_oracle(self, tmp_path):
        """num_parts > 256 triggers the two-level exchange (coarse staged
        dirs, fine split in stage 2); results identical to the oracle."""
        events = gen_change_stream(n_convs=200, n_events=5000, seed=55)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=320, salt=2)
        got = read_lake_pandas(lake)
        want = oracle_final_state(events.to_pandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_staged_dir_count_bounded(self, tmp_path):
        """The staged directory count is bounded by ~256 regardless of
        num_parts (blocks x dirs is the ≥768-part contention point)."""
        import os

        events = gen_change_stream(n_convs=200, n_events=5000, seed=56)
        lake = str(tmp_path / "lake")
        res = replay(events, lake, num_parts=768, commit=False)
        sdir = os.path.join(lake, "_staging", res.run_id, "events")
        dirs = [d for d in os.listdir(sdir) if d.startswith("part=")]
        assert len(dirs) <= 256, len(dirs)

    def test_incremental_merge_two_level(self, tmp_path):
        """Second run (merge-on-read path) through the coarse exchange."""
        ev1 = gen_change_stream(n_convs=100, n_events=2500, seed=57)
        ev2 = gen_change_stream(n_convs=100, n_events=2500, seed=58, seq_start=2500)
        lake = str(tmp_path / "lake")
        replay(ev1, lake, num_parts=320)
        replay(ev2, lake, num_parts=320)
        both = pd.concat([ev1.to_pandas(), ev2.to_pandas()], ignore_index=True)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(both), check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestRerunMultiplier:
    """Reference rerunMultiplier (TrackRun.java:59-71): a pending/failed
    partition reruns as M sub-fold tasks + a partial merge — exact by
    fold/merge associativity."""

    def test_subdivided_replay_matches_oracle(self, tmp_path):
        events = gen_change_stream(n_convs=150, n_events=6000, seed=61)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=8, rerun_multiplier=4)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake),
            oracle_final_state(events.to_pandas()),
            check_dtype=False,
        )

    @pytest.mark.parametrize("mode", ["all", "auto"])
    def test_staged_dict_encode_matches_oracle(self, tmp_path, monkeypatch, mode):
        """Opt-in staged dictionary encoding (CDM_STAGED_DICT): slices carry
        dictionary-encoded string payload columns, the Arrow fold gathers
        indices and decodes once on the winner-sized output — end state must
        be oracle-exact, including deletes, unset columns and an incremental
        second run over dictionary-mixed prior state."""
        monkeypatch.setenv("CDM_STAGED_DICT", mode)
        full = gen_change_stream(n_convs=80, n_events=8000, seed=71).to_pandas()
        lake = str(tmp_path / "lake")
        replay(full[full["event_seq"] < 4000].reset_index(drop=True), lake, num_parts=8)
        replay(full[full["event_seq"] >= 4000].reset_index(drop=True), lake, num_parts=8)
        assert_matches_oracle(lake, full)
        if mode == "auto":
            # review finding: the auto probe must run on the ALREADY-
            # transformed stream — re-applying the transform chain here
            # crashed (Constant appends a duplicate column on the second
            # application)
            from cassandra_data_migrator_ray.functions.transforms import Constant

            lake_t = str(tmp_path / "lake_t")
            replay(
                full[full["event_seq"] < 4000].reset_index(drop=True),
                lake_t,
                num_parts=4,
                transforms=[Constant({"src": "probe"})],
            )
            got = read_lake_pandas(lake_t)
            assert (got["src"] == "probe").all()

    def test_auto_subfold_oversized_partition(self, tmp_path, monkeypatch, capsys):
        """Size-triggered automatic sub-fold (round-4 verdict #5): a dir key
        whose staged bytes exceed CDM_SUBFOLD_BYTES is routed through the
        sub-slice fold + partial merge WITHOUT any rerun_multiplier, and the
        result stays oracle-exact.  A tiny threshold forces every partition
        over; the debug line proves the path engaged; counters + deletes +
        incremental second run keep exactly-once semantics."""
        events = gen_change_stream(n_convs=150, n_events=6000, seed=62)
        lake = str(tmp_path / "lake")
        monkeypatch.setenv("CDM_SUBFOLD_BYTES", "1024")
        monkeypatch.setenv("CDM_RAY_DEBUG_TIMING", "1")
        replay(events, lake, num_parts=8)
        out = capsys.readouterr().out
        assert "subfold_m=" in out and "subfold_m=0" not in out
        assert "subfold_parts=8" in out
        assert_matches_oracle(lake, events.to_pandas())
        # incremental second batch still folds correctly through the auto path
        full = gen_change_stream(n_convs=150, n_events=12000, seed=63).to_pandas()
        lake_i = str(tmp_path / "lake_i")
        replay(full[full["event_seq"] < 6000].reset_index(drop=True), lake_i, num_parts=8)
        replay(full[full["event_seq"] >= 6000].reset_index(drop=True), lake_i, num_parts=8)
        assert_matches_oracle(lake_i, full)
        # default threshold leaves small partitions on the plain path
        monkeypatch.delenv("CDM_SUBFOLD_BYTES")
        lake2 = str(tmp_path / "lake2")
        replay(events, lake2, num_parts=8)
        out = capsys.readouterr().out
        assert "subfold_m=0 subfold_parts=0" in out
        assert_matches_oracle(lake2, events.to_pandas())

    def test_failed_partition_resumed_subdivided(self, tmp_path):
        """Stage the run without committing (the 'crashed mid-run' state),
        delete one partition's receipt (its merge 'failed'), then rerun the
        same run_id with a multiplier: only the failed partition is re-merged
        (subdivided), the rest resume from receipts."""
        import glob
        import os

        events = gen_change_stream(n_convs=150, n_events=6000, seed=62)
        lake = str(tmp_path / "lake")
        res = replay(events, lake, num_parts=8, commit=False)
        receipts = sorted(
            glob.glob(os.path.join(lake, "_staging", res.run_id, "part-*.json"))
        )
        os.unlink(receipts[0])  # simulate one failed partition merge
        res2 = replay(events, lake, num_parts=8, run_id=res.run_id, rerun_multiplier=3)
        statuses = res2.metrics["status"].value_counts().to_dict()
        assert statuses.get("SKIPPED_RESUME", 0) >= 6, statuses
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake),
            oracle_final_state(events.to_pandas()),
            check_dtype=False,
        )

    def test_auto_resume_latest_incomplete_run(self, tmp_path, monkeypatch):
        """reference auto-rerun (TargetUpsertRunDetailsStatement.java:87-130):
        a crashed unattended job resumes with run_id="auto" — no need to dig
        the run_id out of _staging/ by hand.  Crash = staged + partially
        merged, never committed (one receipt deleted = one failed merge).
        A run younger than the liveness grace is presumed IN FLIGHT and must
        not be adopted."""
        import glob
        import os

        events = gen_change_stream(n_convs=120, n_events=5000, seed=71)
        lake = str(tmp_path / "lake")
        crashed = replay(events, lake, num_parts=8, commit=False)
        receipts = sorted(
            glob.glob(os.path.join(lake, "_staging", crashed.run_id, "part-*.json"))
        )
        os.unlink(receipts[1])

        # liveness guard: with the default grace the seconds-old run is
        # treated as still running → auto starts a FRESH id
        from cassandra_data_migrator_ray.pipelines.replay import (
            latest_incomplete_run,
        )

        assert latest_incomplete_run(lake) is None
        assert latest_incomplete_run(lake, grace_s=0.0) == crashed.run_id

        monkeypatch.setenv("CDM_RAY_RESUME_GRACE_S", "0")
        res = replay(events, lake, num_parts=8, run_id="auto")
        assert res.run_id == crashed.run_id  # picked up the incomplete run
        statuses = res.metrics["status"].value_counts().to_dict()
        assert statuses.get("SKIPPED_RESUME", 0) >= 6, statuses
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake),
            oracle_final_state(events.to_pandas()),
            check_dtype=False,
        )

        # everything committed → "auto" starts a FRESH run, not a rerun
        res3 = replay(
            gen_change_stream(n_convs=10, n_events=200, seed=72, seq_start=10**6),
            lake,
            run_id="auto",
        )
        assert res3.run_id != crashed.run_id

    def test_two_level_plus_multiplier(self, tmp_path):
        events = gen_change_stream(n_convs=150, n_events=5000, seed=63)
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=320, rerun_multiplier=2)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake),
            oracle_final_state(events.to_pandas()),
            check_dtype=False,
        )


@pytest.mark.usefixtures("ray_session")
class TestRateLimiter:
    def test_rate_limited_replay_is_slower_and_correct(self, tmp_path):
        """T2 analogue (reference per-executor RateLimiter): a throttled
        replay takes at least rows/rate seconds and converges identically."""
        import time

        events = gen_change_stream(n_convs=20, n_events=2000, seed=31)
        fast_lake = str(tmp_path / "fast")
        slow_lake = str(tmp_path / "slow")
        replay(events, fast_lake, num_parts=2)
        t0 = time.perf_counter()
        # 2000 rows at 1000 rows/s/actor (burst 1000) → ≥ ~1s
        replay(
            events,
            slow_lake,
            num_parts=2,
            rate_limit_rows_per_s=1000,
            normalize_concurrency=1,
        )
        elapsed = time.perf_counter() - t0
        assert elapsed >= 0.9, f"rate limit had no effect ({elapsed:.2f}s)"
        pd.testing.assert_frame_equal(
            read_lake_pandas(fast_lake), read_lake_pandas(slow_lake)
        )

    def test_token_bucket_math(self):
        from cassandra_data_migrator_ray.functions.ratelimit import TokenBucket

        # low rate → the refill between the two calls is negligible even on a
        # loaded CI box (deficit 50 at 100/s ≈ 0.5 s; a scheduling pause would
        # need >0.5 s between two adjacent statements to flake this)
        b = TokenBucket(rate=100, burst=100)
        assert b.acquire(100) == 0.0  # burst available immediately
        slept = b.acquire(50)  # must pay the deficit
        assert slept > 0.1
        import pytest as _pytest

        with _pytest.raises(ValueError):
            TokenBucket(rate=0)


@pytest.mark.usefixtures("ray_session")
class TestAutoNumParts:
    def test_auto_sizes_fresh_lake_and_sticks(self, tmp_path):
        """num_parts='auto' sizes a fresh lake from the stream (floor 32) and
        the count is sticky: a later run with a different request keeps the
        manifest's routing."""
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.state.manifest import Manifest

        full = gen_change_stream(n_convs=60, n_events=4000, seed=55).to_pandas()
        half = len(full) // 2
        src = str(tmp_path / "ev.parquet")
        pq.write_table(
            __import__("pyarrow").Table.from_pandas(
                full[full["event_seq"] < half], preserve_index=False
            ),
            src,
        )
        lake = str(tmp_path / "lake")
        replay(src, lake, num_parts="auto")  # 2k events -> floor 32
        m = Manifest.load(lake)
        assert m.num_parts == 32
        replay(full[full["event_seq"] >= half], lake, num_parts="auto")
        assert Manifest.load(lake).num_parts == 32
        assert_matches_oracle(lake, full)


@pytest.mark.usefixtures("ray_session")
class TestAutoSalt:
    def test_hot_stream_gets_salt_and_stays_correct(self, tmp_path):
        """A stream with one dominant conversation auto-picks salt > 1; the
        result still matches the oracle and the salt sticks in the manifest."""
        import numpy as np

        from cassandra_data_migrator_ray.gen import oracle_final_state
        from cassandra_data_migrator_ray.state.manifest import Manifest

        n = 6000
        rng = np.random.default_rng(41)
        conv = np.where(
            rng.random(n) < 0.4, "conv-hot",
            np.array([f"conv-{i % 50:03d}" for i in range(n)], dtype=object),
        )
        ev = pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": rng.integers(0, 32, n).astype(np.int32),
                "op": "U",
                "role": "user",
                "text": [f"t{i}" for i in range(n)],
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
                "writetime": np.arange(n, dtype=np.int64),
                "event_seq": np.arange(n, dtype=np.int64),
            }
        )
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=16, salt="auto")
        m = Manifest.load(lake)
        assert m.salt > 1  # 40% share × 16 parts = overload ~6.4 → salted
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake).sort_values(["conv_id", "turn_idx"], ignore_index=True),
            oracle_final_state(ev).sort_values(["conv_id", "turn_idx"], ignore_index=True),
            check_dtype=False,
        )
        # second increment reuses the manifest salt (sticky route)
        ev2 = ev.assign(event_seq=ev.event_seq + n, writetime=ev.writetime + n)
        replay(ev2, lake, salt="auto")
        assert Manifest.load(lake).salt == m.salt

    def test_uniform_stream_stays_unsalted(self, tmp_path):
        from cassandra_data_migrator_ray.gen import gen_change_stream
        from cassandra_data_migrator_ray.state.manifest import Manifest

        ev = gen_change_stream(n_convs=200, n_events=3000, seed=43, hot_frac=0.0)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=16, salt="auto")
        assert Manifest.load(lake).salt == 1
