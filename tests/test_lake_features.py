"""Lakehouse read-side features: point lookup, snapshot time travel + vacuum,
and the per-run change-data-feed (CDC out)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import (
    lookup,
    read_changes,
    read_changes_pandas,
    read_lake,
    read_lake_pandas,
)
from cassandra_data_migrator_ray.state.manifest import Manifest
from cassandra_data_migrator_ray.state.partitioning import (
    assign_partition_keys,
    candidate_partitions,
)

KEY = ["conv_id", "turn_idx"]


def _lake(tmp_path, name="lake"):
    return str(tmp_path / name)


@pytest.mark.usefixtures("ray_session")
class TestLookup:
    def test_prefix_lookup_matches_oracle(self, tmp_path):
        ev = gen_change_stream(n_convs=60, n_events=4000, seed=3)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=16, salt=2)
        want = oracle_final_state(ev.to_pandas())
        convs = want["conv_id"].unique()[:4].tolist()
        got = lookup(lake, convs)
        exp = want[want["conv_id"].isin(convs)].sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_full_key_and_mixed_width(self, tmp_path):
        ev = gen_change_stream(n_convs=30, n_events=2000, seed=5)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=8)
        want = oracle_final_state(ev.to_pandas())
        rows = want.head(5)
        keys = [tuple(r) for r in rows[KEY].itertuples(index=False)]
        got = lookup(lake, keys)
        pd.testing.assert_frame_equal(
            got, rows.sort_values(KEY, ignore_index=True), check_dtype=False
        )
        # mixed: one whole conversation + one exact turn of another
        conv = want["conv_id"].iloc[-1]
        other = keys[0]
        got2 = lookup(lake, [conv, other])
        exp2 = pd.concat(
            [
                want[want["conv_id"] == conv],
                want[(want["conv_id"] == other[0]) & (want["turn_idx"] == other[1])],
            ]
        ).sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)

    def test_missing_key_empty(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=500, seed=7)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4)
        assert len(lookup(lake, ["conv-does-not-exist"])) == 0

    def test_candidate_partitions_prune_and_cover(self):
        """The candidate set is a small fraction of the lake (pruning) and
        always contains the partition the write side actually routes to
        (coverage) — with and without salt."""
        convs = np.array([f"conv-{i:04d}" for i in range(200)], dtype=object)
        turns = np.arange(200, dtype=np.int64) % 17
        for salt in (1, 4):
            cand = candidate_partitions(convs, 64, salt)
            actual = assign_partition_keys([convs, turns], 64, salt)
            for v, p in zip(convs, actual):
                assert int(p) in cand[v], (v, salt)
                assert len(cand[v]) <= max(1, salt)


@pytest.mark.usefixtures("ray_session")
class TestTimeTravel:
    def test_versioned_reads_match_history(self, tmp_path):
        full = gen_change_stream(n_convs=40, n_events=4000, seed=9).to_pandas()
        half = len(full) // 2
        lake = _lake(tmp_path)
        replay(full[full.event_seq < half], lake, num_parts=8)
        v1 = read_lake_pandas(lake)
        replay(full[full.event_seq >= half], lake, num_parts=8)
        v2 = read_lake_pandas(lake)
        m = Manifest.load(lake)
        assert m.list_snapshots() == [1, 2]
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake, version=1), v1, check_dtype=False
        )
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake, version=2), v2, check_dtype=False
        )
        assert read_lake(lake, version=1).count() == len(v1)

    def test_old_version_hides_evolved_column(self, tmp_path):
        """A column added by a later run must not appear in an earlier view
        (the snapshot pins the schema, not just the file set)."""
        base = gen_change_stream(n_convs=20, n_events=1000, seed=11).to_pandas()
        lake = _lake(tmp_path)
        replay(base, lake, num_parts=4)
        more = gen_change_stream(
            n_convs=20, n_events=500, seed=12, seq_start=2000
        ).to_pandas()
        more["lang"] = "en"  # additive evolution beyond the base schema
        replay(more, lake, num_parts=4)
        assert "lang" in read_lake_pandas(lake).columns
        assert "lang" not in read_lake_pandas(lake, version=1).columns

    def test_vacuum_prunes_old_versions_and_files(self, tmp_path):
        full = gen_change_stream(n_convs=30, n_events=3000, seed=13).to_pandas()
        third = len(full) // 3
        lake = _lake(tmp_path)
        for lo, hi in [(0, third), (third, 2 * third), (2 * third, len(full))]:
            replay(
                full[(full.event_seq >= lo) & (full.event_seq < hi)],
                lake,
                num_parts=4,
            )
        m = Manifest.load(lake)
        assert m.list_snapshots() == [1, 2, 3]
        files_before = set(glob.glob(os.path.join(lake, "data", "*.parquet")))
        assert m.vacuum(keep_last=1) == [1, 2]
        assert m.list_snapshots() == [3]
        with pytest.raises(ValueError, match="not available"):
            read_lake_pandas(lake, version=1)
        # current view unaffected; superseded per-run files actually deleted
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake, version=3),
            read_lake_pandas(lake),
            check_dtype=False,
        )
        files_after = set(glob.glob(os.path.join(lake, "data", "*.parquet")))
        assert files_after < files_before

    def test_unknown_version_raises(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=500, seed=15)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4)
        with pytest.raises(ValueError, match="not available"):
            read_lake_pandas(lake, version=99)


@pytest.mark.usefixtures("ray_session")
class TestChangeDataFeed:
    def _replay_halves(self, tmp_path, **kw):
        full = gen_change_stream(n_convs=40, n_events=4000, seed=9).to_pandas()
        half = len(full) // 2
        lake = _lake(tmp_path)
        r1 = replay(
            full[full.event_seq < half], lake, num_parts=8, emit_changes=True, **kw
        )
        v1 = read_lake_pandas(lake)
        r2 = replay(
            full[full.event_seq >= half], lake, num_parts=8, emit_changes=True, **kw
        )
        v2 = read_lake_pandas(lake)
        return lake, r1, v1, r2, v2

    def test_first_run_feed_is_insert_only_and_equals_state(self, tmp_path):
        lake, r1, v1, _, _ = self._replay_halves(tmp_path)
        ch = read_changes_pandas(lake, run_id=r1.run_id)
        assert set(ch["_change_type"]) == {"insert"}
        ins = ch.drop(columns="_change_type").sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(ins, v1, check_dtype=False)

    def test_feed_applied_to_prior_state_reproduces_new_state(self, tmp_path):
        lake, _, v1, r2, v2 = self._replay_halves(tmp_path)
        ch = read_changes_pandas(lake, run_id=r2.run_id)
        assert {"insert", "update_preimage", "update_postimage", "delete"} >= set(
            ch["_change_type"]
        )
        post = ch[ch._change_type.isin(["insert", "update_postimage"])].drop(
            columns="_change_type"
        )
        removed = pd.concat([post[KEY], ch[ch._change_type == "delete"][KEY]])
        kept = v1.merge(removed, on=KEY, how="left", indicator=True)
        kept = kept[kept._merge == "left_only"].drop(columns="_merge")
        applied = pd.concat([kept, post], ignore_index=True).sort_values(
            KEY, ignore_index=True
        )
        pd.testing.assert_frame_equal(applied, v2, check_dtype=False)

    def test_preimages_match_prior_state(self, tmp_path):
        lake, _, v1, r2, _ = self._replay_halves(tmp_path)
        ch = read_changes_pandas(lake, run_id=r2.run_id)
        pre = ch[ch._change_type == "update_preimage"].drop(columns="_change_type")
        chk = pre.merge(v1, on=KEY, suffixes=("_pre", "_v1"))
        assert len(chk) == len(pre)
        for c in (c for c in pre.columns if c not in KEY):
            a, b = chk[c + "_pre"], chk[c + "_v1"]
            assert ((a == b) | (a.isna() & b.isna())).all(), c

    def test_version_and_default_selectors(self, tmp_path):
        lake, r1, _, r2, _ = self._replay_halves(tmp_path)
        by_ver = read_changes_pandas(lake, version=1)
        by_run = read_changes_pandas(lake, run_id=r1.run_id)
        pd.testing.assert_frame_equal(by_ver, by_run)
        latest = read_changes_pandas(lake)
        pd.testing.assert_frame_equal(
            latest, read_changes_pandas(lake, run_id=r2.run_id)
        )
        assert read_changes(lake, version=1).count() == len(by_ver)

    def test_redelivery_produces_empty_feed(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1000, seed=17)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4, emit_changes=True)
        r2 = replay(ev, lake, num_parts=4, emit_changes=True)
        assert r2.events_merged_keys == 0
        assert len(read_changes_pandas(lake, run_id=r2.run_id)) == 0

    def test_lww_loser_emits_nothing(self, tmp_path):
        """A stale update (older writetime) against a written cell loses LWW
        and emits NOTHING; against a never-written (unset) cell it wins and
        emits an update pair — the feed reflects net state change only."""

        def ev(seq, turn, wt, text):
            return dict(
                conv_id="c1", turn_idx=np.int32(turn), op="U", writetime=wt,
                event_seq=seq, role="user", text=text, tool=None,
                ts=pd.Timestamp("2026-01-01"),
            )

        lake = _lake(tmp_path)
        replay(
            pd.DataFrame([ev(0, 0, 100, "hello"), ev(1, 1, 100, None)]),
            lake, num_parts=2, emit_changes=True,
        )
        r2 = replay(
            pd.DataFrame([ev(10, 0, 1, "stale"), ev(11, 1, 1, "stale")]),
            lake, num_parts=2, emit_changes=True,
        )
        ch = read_changes_pandas(lake, run_id=r2.run_id)
        # turn 0: written cell, stale write lost — no emission for that key
        assert not (ch["turn_idx"] == 0).any()
        # turn 1: unset cell accepted the write — one pre/post pair
        pair = ch[ch["turn_idx"] == 1].set_index("_change_type")
        assert pair.loc["update_preimage", "text"] is None or pd.isna(
            pair.loc["update_preimage", "text"]
        )
        assert pair.loc["update_postimage", "text"] == "stale"

    def test_counter_feed_reports_totals(self, tmp_path):
        """Counter columns surface the post-merge TOTAL in postimages (the
        reference reads counters back as totals, not deltas)."""
        rows = []
        for seq, (op, d) in enumerate([("U", 5), ("U", 7), ("U", -2)]):
            rows.append(
                dict(
                    conv_id="c1", turn_idx=np.int32(0), op=op, writetime=seq + 1,
                    event_seq=seq, role="user", text="x", tool=None,
                    ts=pd.Timestamp("2026-01-01"), score=d,
                )
            )
        df = pd.DataFrame(rows)
        lake = _lake(tmp_path)
        replay(
            df.iloc[:2], lake, num_parts=2, counter_cols=("score",),
            emit_changes=True,
        )
        r2 = replay(
            df.iloc[2:], lake, num_parts=2, counter_cols=("score",),
            emit_changes=True,
        )
        ch = read_changes_pandas(lake, run_id=r2.run_id)
        post = ch[ch._change_type == "update_postimage"]
        assert len(post) == 1 and int(post["score"].iloc[0]) == 10
        pre = ch[ch._change_type == "update_preimage"]
        assert int(pre["score"].iloc[0]) == 12

    def test_uncommitted_feed_invisible_and_gced(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1000, seed=21)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4, emit_changes=True)
        more = gen_change_stream(n_convs=20, n_events=500, seed=22, seq_start=2000)
        replay(
            more, lake, num_parts=4, run_id="deadcdf", commit=False,
            emit_changes=True,
        )
        assert glob.glob(os.path.join(lake, "cdf", "*deadcdf*"))
        with pytest.raises(ValueError, match="not committed"):
            read_changes_pandas(lake, run_id="deadcdf")
        third = gen_change_stream(n_convs=20, n_events=500, seed=23, seq_start=4000)
        replay(third, lake, num_parts=4, emit_changes=True)
        assert glob.glob(os.path.join(lake, "cdf", "*deadcdf*")) == []

    def test_vacuum_prunes_old_feeds(self, tmp_path):
        lake, r1, _, r2, _ = self._replay_halves(tmp_path)
        m = Manifest.load(lake)
        m.vacuum(keep_last=1)
        # run-1's ledger entry remains but its feed files are pruned: the
        # feed reads back empty by version and by run_id
        assert len(read_changes_pandas(lake, version=1)) == 0
        assert glob.glob(os.path.join(lake, "cdf", f"*{r1.run_id}*")) == []
        assert len(read_changes_pandas(lake, run_id=r2.run_id)) > 0


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressions:
    """Pinned fixes from the feature review: dashed run_ids, vacuum vs staged
    work, retention default, TTL-aware lookup, schema-evolved lookup."""

    def test_dashed_run_id_feed_survives_next_commit(self, tmp_path):
        ev = gen_change_stream(n_convs=15, n_events=600, seed=31)
        lake = _lake(tmp_path)
        rid = "nightly-2026-08-17"
        replay(ev, lake, num_parts=4, run_id=rid, emit_changes=True)
        assert len(read_changes_pandas(lake, run_id=rid)) > 0
        more = gen_change_stream(n_convs=15, n_events=300, seed=32, seq_start=1000)
        replay(more, lake, num_parts=4, emit_changes=True)  # commit runs gc
        assert len(read_changes_pandas(lake, run_id=rid)) > 0

    def test_vacuum_leaves_staged_work_resumable(self, tmp_path):
        """vacuum during an in-flight run must not touch its staging NOR its
        already-written phase-1 partition files — two committed versions
        first, so vacuum(keep_last=1) actually prunes and runs gc."""
        ev = gen_change_stream(n_convs=15, n_events=600, seed=33).to_pandas()
        half = len(ev) // 2
        lake = _lake(tmp_path)
        replay(ev[ev.event_seq < half], lake, num_parts=4)
        replay(ev[ev.event_seq >= half], lake, num_parts=4)
        more = gen_change_stream(n_convs=15, n_events=300, seed=34, seq_start=1000)
        replay(more, lake, num_parts=4, run_id="inflight", commit=False)
        staged = glob.glob(os.path.join(lake, "_staging", "inflight", "**"),
                           recursive=True)
        data_files = glob.glob(os.path.join(lake, "data", "*inflight*"))
        assert staged and data_files
        assert Manifest.load(lake).vacuum(keep_last=1) == [1]  # gc DID run
        assert glob.glob(os.path.join(lake, "_staging", "inflight", "**"),
                         recursive=True) == staged
        assert glob.glob(os.path.join(lake, "data", "*inflight*")) == data_files
        # the run resumes from its receipts and commits the merged state
        replay(more, lake, num_parts=4, run_id="inflight")
        full = pd.concat([ev, more.to_pandas()], ignore_index=True)
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(full), check_dtype=False
        )

    def test_snapshot_retention_bounds_history(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=1200, seed=35).to_pandas()
        lake = _lake(tmp_path)
        for i in range(10):
            chunk = ev[(ev.event_seq >= i * 120) & (ev.event_seq < (i + 1) * 120)]
            replay(chunk, lake, num_parts=2, snapshot_retention=3)
        m = Manifest.load(lake)
        assert m.version == 10
        assert m.list_snapshots() == [8, 9, 10]
        # unlimited retention (0) keeps every version
        lake2 = _lake(tmp_path, "lake2")
        for i in range(5):
            chunk = ev[(ev.event_seq >= i * 120) & (ev.event_seq < (i + 1) * 120)]
            replay(chunk, lake2, num_parts=2, snapshot_retention=0)
        assert Manifest.load(lake2).list_snapshots() == [1, 2, 3, 4, 5]

    def test_lookup_ttl_expiry_parity(self, tmp_path):
        base = 1_000_000_000_000
        ev = pd.DataFrame(
            [
                dict(op="UPSERT", conv_id="c1", turn_idx=np.int32(0),
                     role=None, text="short-lived", tool=None, ts=None,
                     writetime=base, event_seq=0, ttl=10),
                dict(op="UPSERT", conv_id="c1", turn_idx=np.int32(1),
                     role=None, text="long-lived", tool=None, ts=None,
                     writetime=base, event_seq=1, ttl=0),
            ]
        )
        ev["ts"] = pd.Series([pd.NaT, pd.NaT], dtype="datetime64[us]")
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=2, ttl=True)
        before = lookup(lake, ["c1"], as_of=base + 5_000_000)
        assert set(before["text"]) == {"short-lived", "long-lived"}
        after = lookup(lake, ["c1"], as_of=base + 11_000_000)
        assert set(after["text"]) == {"long-lived"}
        # narrowed projection with as_of must not crash
        cols = lookup(
            lake, ["c1"], columns=["conv_id", "text"], as_of=base + 11_000_000
        )
        assert list(cols.columns) == ["conv_id", "text"] and len(cols) == 1

    def test_lookup_on_schema_evolved_lake(self, tmp_path):
        """A partition untouched since before an additive evolution keeps its
        old file schema; lookup across mixed-schema partitions must backfill
        the evolved column with nulls, not crash."""
        ev = gen_change_stream(n_convs=20, n_events=800, seed=37).to_pandas()
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=8)
        one_conv = ev[ev.conv_id == ev.conv_id.iloc[0]].copy()
        one_conv["event_seq"] = one_conv["event_seq"] + 10_000
        one_conv["lang"] = "en"
        replay(one_conv, lake, num_parts=8)
        want = read_lake_pandas(lake)
        convs = want["conv_id"].unique().tolist()  # spans old+new partitions
        got = lookup(lake, convs)
        pd.testing.assert_frame_equal(
            got, want.sort_values(KEY, ignore_index=True), check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestIncrementalValidate:
    """validate(since_version=N) compares only partitions touched after N —
    cost scales with the increment, and untouched-partition corruption is
    (by design) invisible to the incremental pass."""

    @pytest.mark.parametrize("shuffle", ["staging", "groupby"])
    def test_incremental_validate_prunes_to_touched(self, tmp_path, shuffle):
        from cassandra_data_migrator_ray.pipelines.diff import validate

        ev = gen_change_stream(n_convs=30, n_events=2000, seed=41).to_pandas()
        lake = _lake(tmp_path, f"lake_{shuffle}")
        replay(ev, lake, num_parts=16)
        m1 = Manifest.load(lake)
        # run 2 touches only one conversation → a strict partition subset
        one = ev[ev.conv_id == ev.conv_id.iloc[0]].copy()
        one["event_seq"] = one["event_seq"] + 10_000
        one["writetime"] = one["writetime"] + 10_000
        replay(one, lake, num_parts=16)
        m2 = Manifest.load(lake)
        touched = {
            p for r in m2.runs if r["version"] > m1.version
            for p in r["partitions"]
        }
        assert 0 < len(touched) < 16

        full = pd.concat([ev, one], ignore_index=True)
        expected = oracle_final_state(full)
        res = validate(expected, lake, since_version=m1.version, shuffle=shuffle)
        assert res.ok
        # compared row count == rows living in the touched partitions only
        total_valid = validate(expected, lake, shuffle=shuffle).counts["VALID"]
        assert 0 < res.counts["VALID"] < total_valid

    def test_incremental_validate_catches_new_divergence(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.diff import validate

        ev = gen_change_stream(n_convs=20, n_events=1000, seed=43).to_pandas()
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=8)
        v1 = Manifest.load(lake).version
        one = ev[ev.conv_id == ev.conv_id.iloc[0]].copy()
        one["event_seq"] = one["event_seq"] + 10_000
        replay(one, lake, num_parts=8)
        expected = oracle_final_state(pd.concat([ev, one], ignore_index=True))
        # corrupt the expectation for a key INSIDE the touched set
        bad = expected.copy()
        key0 = one[KEY].iloc[0]
        sel = (bad.conv_id == key0.conv_id) & (bad.turn_idx == key0.turn_idx)
        assert sel.any()
        bad.loc[sel, "text"] = "diverged!"
        res = validate(bad, lake, since_version=v1)
        assert not res.ok and res.counts["MISMATCH"] >= 1


@pytest.mark.usefixtures("ray_session")
class TestReadSideComposition:
    """Compositions of the read-side features: versioned lookup, the
    apply_changes replica helper, feed exactly-once under crash-resume, and
    the WAL-tail loop emitting feeds."""

    def test_lookup_at_version(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import lookup

        full = gen_change_stream(n_convs=30, n_events=3000, seed=51).to_pandas()
        half = len(full) // 2
        lake = _lake(tmp_path)
        replay(full[full.event_seq < half], lake, num_parts=8, salt=2)
        v1 = read_lake_pandas(lake)
        replay(full[full.event_seq >= half], lake, num_parts=8, salt=2)
        v2 = read_lake_pandas(lake)
        conv = v2["conv_id"].iloc[0]
        got_old = lookup(lake, [conv], version=1)
        got_new = lookup(lake, [conv])
        pd.testing.assert_frame_equal(
            got_old,
            v1[v1.conv_id == conv].sort_values(KEY, ignore_index=True),
            check_dtype=False,
        )
        pd.testing.assert_frame_equal(
            got_new,
            v2[v2.conv_id == conv].sort_values(KEY, ignore_index=True),
            check_dtype=False,
        )

    def test_apply_changes_reproduces_next_version(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import apply_changes

        full = gen_change_stream(n_convs=30, n_events=3000, seed=53).to_pandas()
        half = len(full) // 2
        lake = _lake(tmp_path)
        replay(full[full.event_seq < half], lake, num_parts=8, emit_changes=True)
        v1 = read_lake_pandas(lake)
        r2 = replay(
            full[full.event_seq >= half], lake, num_parts=8, emit_changes=True
        )
        v2 = read_lake_pandas(lake)
        feed = read_changes_pandas(lake, run_id=r2.run_id)
        pd.testing.assert_frame_equal(
            apply_changes(v1, feed, KEY), v2, check_dtype=False
        )

    def test_feed_identical_after_crash_resume(self, tmp_path):
        """A crash between merge and commit, then a resume with the same
        run_id, must produce the exact same feed as an uninterrupted run on
        a twin lake (deterministic per-partition feed files; resumed
        partitions skip via receipts without rewriting)."""
        full = gen_change_stream(n_convs=25, n_events=2000, seed=55).to_pandas()
        half = len(full) // 2
        feeds = {}
        for mode in ("clean", "crashed"):
            lake = _lake(tmp_path, mode)
            replay(full[full.event_seq < half], lake, num_parts=6)
            if mode == "clean":
                replay(
                    full[full.event_seq >= half], lake, num_parts=6,
                    run_id="r2", emit_changes=True,
                )
            else:
                replay(
                    full[full.event_seq >= half], lake, num_parts=6,
                    run_id="r2", emit_changes=True, commit=False,
                )
                # crash: lose half the receipts → those partitions re-merge
                sdir = os.path.join(lake, "_staging", "r2")
                receipts = sorted(
                    f for f in os.listdir(sdir) if f.endswith(".json")
                )
                for r in receipts[: len(receipts) // 2]:
                    os.unlink(os.path.join(sdir, r))
                replay(
                    full[full.event_seq >= half], lake, num_parts=6,
                    run_id="r2", emit_changes=True,
                )
            feeds[mode] = read_changes_pandas(lake, run_id="r2")
        pd.testing.assert_frame_equal(feeds["clean"], feeds["crashed"])
        pd.testing.assert_frame_equal(
            read_lake_pandas(_lake(tmp_path, "clean")),
            read_lake_pandas(_lake(tmp_path, "crashed")),
        )

    def test_tail_loop_emits_feeds(self, tmp_path):
        """The WAL-tail service shape forwards emit_changes to each cycle's
        replay; every committed drain leaves a readable feed."""
        import pyarrow.parquet as pq_
        import pyarrow as pa_

        from cassandra_data_migrator_ray.pipelines.tail import tail_replay

        full = gen_change_stream(n_convs=20, n_events=1000, seed=57).to_pandas()
        half = len(full) // 2
        src = str(tmp_path / "wal")
        os.makedirs(src)
        lake = _lake(tmp_path)
        for i, chunk in enumerate(
            (full[full.event_seq < half], full[full.event_seq >= half])
        ):
            pq_.write_table(
                pa_.Table.from_pandas(chunk, preserve_index=False),
                os.path.join(src, f"seg-{i:03d}.parquet"),
            )
        res = tail_replay(
            src, lake, stop_after_idle_cycles=1, poll_interval=0.1,
            num_parts=4, emit_changes=True,
        )
        assert res.keys_merged > 0
        m = Manifest.load(lake)
        replay_runs = [r for r in m.runs if r.get("type", "replay") == "replay"]
        total = 0
        for r in replay_runs:
            total += len(read_changes_pandas(lake, run_id=r["run_id"]))
        assert total > 0
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(full), check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestSecondReviewRegressions:
    def test_sliding_windows_all_null_ts_empty(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import (
            sliding_window_counts,
        )

        df = pd.DataFrame(
            {
                "event_id": np.array([1, 2], dtype=np.int64),
                "user_id": np.array([1, 2], dtype=np.int64),
                "event_type": ["click", "view"],
                "ts": pd.Series([pd.NaT, pd.NaT], dtype="datetime64[us]"),
                "value": [1.0, 2.0],
            }
        )
        df.to_parquet(os.path.join(tmp_path, "events.parquet"))
        out = sliding_window_counts(str(tmp_path))
        assert len(out) == 0 and list(out.columns) == ["window_start", "n"]

    def test_apply_changes_carries_evolved_column(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import apply_changes

        base = gen_change_stream(n_convs=10, n_events=500, seed=63).to_pandas()
        lake = _lake(tmp_path)
        replay(base, lake, num_parts=4, emit_changes=True)
        v1 = read_lake_pandas(lake)
        more = gen_change_stream(
            n_convs=10, n_events=200, seed=64, seq_start=2000
        ).to_pandas()
        more["lang"] = "en"  # additive evolution inside the feed-emitting run
        r2 = replay(more, lake, num_parts=4, emit_changes=True)
        v2 = read_lake_pandas(lake)
        assert "lang" in v2.columns
        feed = read_changes_pandas(lake, run_id=r2.run_id)
        got = apply_changes(v1, feed, KEY)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], v2[sorted(v2.columns)], check_dtype=False
        )

    def test_normalize_trims_spaces_only(self):
        import pyarrow as pa_

        from cassandra_data_migrator_ray.functions.text import normalize_text

        got = normalize_text(pa_.array(["  A  12 b \x0bt\x0b", "x 1\x0b"]))
        # \x0b is neither RE2 \s nor SQL-trimmed space: preserved verbatim
        assert got.to_pylist() == ["a <num> b \x0bt\x0b", "x <num>\x0b"]


class TestHashKeyFastPath:
    def test_route_identical_across_representations(self):
        """The dictionary-encode hash fast path must be byte-identical to the
        element-wise object hash for every input representation the engine
        routes (numpy, pandas, Arrow, chunked, dictionary, null-bearing)."""
        import pyarrow as pa_

        from cassandra_data_migrator_ray.state.partitioning import hash_key

        rng = np.random.default_rng(1)
        convs = np.array([f"c{i}" for i in range(500)], dtype=object)
        col = convs[rng.integers(0, 500, 20000)]
        turns = rng.integers(0, 40, 20000)
        base = assign_partition_keys([col, turns], 64, 4)
        for rep in (
            [pd.Series(col), pd.Series(turns)],
            [pa_.array(col), pa_.array(turns)],
            [
                pa_.chunked_array([pa_.array(col[:7000]), pa_.array(col[7000:])]),
                pa_.chunked_array([pa_.array(turns[:7000]), pa_.array(turns[7000:])]),
            ],
        ):
            assert np.array_equal(base, assign_partition_keys(rep, 64, 4))
        assert np.array_equal(
            hash_key(pa_.array(col).dictionary_encode()), hash_key(col)
        )
        coln = col.copy()
        coln[::100] = None
        assert np.array_equal(hash_key(coln), hash_key(pa_.array(coln)))

    def test_null_sentinels_hash_identically(self):
        """pd.NA (pandas StringDtype), np.nan and None must hash as the SAME
        logical null — else the same key routes differently by input dtype."""
        from cassandra_data_migrator_ray.state.partitioning import hash_key

        import pyarrow as pa_

        vals = ["a", None, "b"]
        base = hash_key(np.array(vals, dtype=object))
        assert np.array_equal(base, hash_key(pd.Series(vals, dtype="string")))
        assert np.array_equal(base, hash_key(pa_.array(vals)))
        assert np.array_equal(
            base, hash_key(np.array(["a", np.nan, "b"], dtype=object))
        )

    def test_partfile_run_id_wide_part_numbers(self):
        from cassandra_data_migrator_ray.state.manifest import _partfile_run_id

        assert _partfile_run_id("part-00003-abc.parquet") == "abc"
        assert _partfile_run_id("part-123456-my-run-id.parquet") == "my-run-id"
        assert _partfile_run_id("garbage.parquet") is None


@pytest.mark.usefixtures("ray_session")
class TestLineageAndPushdown:
    def test_lineage_report(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.tail import lineage_report

        full = gen_change_stream(n_convs=20, n_events=1500, seed=67).to_pandas()
        half = len(full) // 2
        lake = _lake(tmp_path)
        r1 = replay(full[full.event_seq < half], lake, num_parts=4, run_id="runA")
        r2 = replay(full[full.event_seq >= half], lake, num_parts=4, run_id="run-B")
        rep = lineage_report(lake)
        assert set(rep["partition"]) == set(range(4))
        # every live file attributes to the dash-safe parsed run that wrote it
        assert set(rep["written_by_run"]) <= {"runA", "run-B"}
        assert "run-B" in set(rep["written_by_run"])
        m = Manifest.load(lake)
        by_run_ver = {r["run_id"]: r["version"] for r in m.runs}
        for _, row in rep.iterrows():
            assert row["committed_version"] == by_run_ver[row["written_by_run"]]
        # partitions rewritten by run-B retain their runA file for time travel
        rewritten = rep[rep["written_by_run"] == "run-B"]
        assert (rewritten["retained_versions"] >= 1).all()

    def test_read_lake_filter_pushdown(self, tmp_path):
        import pyarrow.dataset as pads

        ev = gen_change_stream(n_convs=30, n_events=2000, seed=69)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4)
        want = read_lake_pandas(lake)
        want_user = want[want["role"] == "user"].reset_index(drop=True)
        got = (
            read_lake(lake, filter=pads.field("role") == "user")
            .to_pandas()
            .sort_values(KEY, ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got,
            want_user.sort_values(KEY, ignore_index=True),
            check_dtype=False,
        )

    def test_read_changes_version_range(self, tmp_path):
        """read_changes(since_version=) spans multiple commits, tags rows
        with _commit_version, and applying the span in commit order on v1
        reproduces the final state."""
        from cassandra_data_migrator_ray.sources.lake import apply_changes

        full = gen_change_stream(n_convs=25, n_events=3000, seed=71).to_pandas()
        third = len(full) // 3
        lake = _lake(tmp_path)
        states = []
        for lo, hi in [(0, third), (third, 2 * third), (2 * third, len(full))]:
            replay(
                full[(full.event_seq >= lo) & (full.event_seq < hi)],
                lake, num_parts=4, emit_changes=True,
            )
            states.append(read_lake_pandas(lake))
        span = read_changes(lake, since_version=1).to_pandas()
        assert set(span["_commit_version"]) == {2, 3}
        replica = states[0]
        for v in (2, 3):
            feed = span[span["_commit_version"] == v].drop(
                columns="_commit_version"
            )
            replica = apply_changes(replica, feed, KEY)
        pd.testing.assert_frame_equal(replica, states[2], check_dtype=False)
        # bounded range: only version 2
        only2 = read_changes(lake, since_version=1, until_version=2).to_pandas()
        assert set(only2["_commit_version"]) == {2}
        # empty range: 0 rows but the Dataset still declares the feed schema
        # (Ray's to_pandas() drops columns on any 0-row dataset, so assert on
        # the Dataset contract)
        empty = read_changes(lake, since_version=3)
        assert empty.count() == 0
        assert "_commit_version" in empty.schema().names


@pytest.mark.usefixtures("ray_session")
class TestRangedFeedSafety:
    """Review regressions: ranged-feed apply ordering, completeness checks,
    parameter validation, and the TTL/filter guard."""

    def _ev(self, seq, turn, wt, text, op="UPSERT"):
        return dict(
            conv_id="c1", turn_idx=np.int32(turn), op=op, writetime=wt,
            event_seq=seq, role="user", text=text, tool=None,
            ts=pd.Timestamp("2026-01-01"),
        )

    def test_tagged_feed_applies_per_commit_no_resurrection(self, tmp_path):
        """Key inserted at v2 then deleted at v3: applying the tagged span in
        ONE apply_changes call must not resurrect it."""
        from cassandra_data_migrator_ray.sources.lake import apply_changes

        lake = _lake(tmp_path)
        replay(pd.DataFrame([self._ev(0, 0, 10, "base")]), lake,
               num_parts=2, emit_changes=True)
        v1 = read_lake_pandas(lake)
        replay(pd.DataFrame([self._ev(1, 1, 20, "new-key")]), lake,
               num_parts=2, emit_changes=True)
        replay(pd.DataFrame([self._ev(2, 1, 30, None, op="DELETE")]), lake,
               num_parts=2, emit_changes=True)
        v3 = read_lake_pandas(lake)
        assert not (v3["turn_idx"] == 1).any()
        span = read_changes(lake, since_version=1).to_pandas()
        got = apply_changes(v1, span, KEY)
        pd.testing.assert_frame_equal(got, v3, check_dtype=False)
        assert "_commit_version" not in got.columns

    def test_pruned_range_raises(self, tmp_path):
        full = gen_change_stream(n_convs=20, n_events=2000, seed=77).to_pandas()
        q = len(full) // 4
        lake = _lake(tmp_path)
        for i in range(4):
            replay(full[(full.event_seq >= i * q) & (full.event_seq < (i + 1) * q)],
                   lake, num_parts=4, emit_changes=True)
        Manifest.load(lake).vacuum(keep_last=1)  # prunes feeds of v1..v3
        with pytest.raises(ValueError, match="pruned"):
            read_changes(lake, since_version=1)
        # the unpruned tail of the range still reads
        assert read_changes(lake, since_version=3).count() >= 0

    def test_emit_off_run_in_range_raises(self, tmp_path):
        full = gen_change_stream(n_convs=20, n_events=1500, seed=79).to_pandas()
        third = len(full) // 3
        lake = _lake(tmp_path)
        replay(full[full.event_seq < third], lake, num_parts=4, emit_changes=True)
        replay(full[(full.event_seq >= third) & (full.event_seq < 2 * third)],
               lake, num_parts=4)  # emit_changes OFF
        replay(full[full.event_seq >= 2 * third], lake, num_parts=4,
               emit_changes=True)
        with pytest.raises(ValueError, match="did not emit"):
            read_changes(lake, since_version=1)

    def test_parameter_validation(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=400, seed=81)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=2, emit_changes=True)
        with pytest.raises(ValueError, match="until_version requires"):
            read_changes(lake, until_version=1)
        with pytest.raises(ValueError, match="not both"):
            read_changes(lake, run_id="x", since_version=0)

    def test_ttl_filter_guard(self, tmp_path):
        import pyarrow.dataset as pads

        base = 1_000_000_000_000
        ev = pd.DataFrame(
            [dict(op="UPSERT", conv_id="c1", turn_idx=np.int32(0), role=None,
                  text="x", tool=None, ts=None, writetime=base, event_seq=0,
                  ttl=10)]
        )
        ev["ts"] = pd.Series([pd.NaT], dtype="datetime64[us]")
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=2, ttl=True)
        with pytest.raises(ValueError, match="cannot combine with TTL"):
            read_lake(lake, as_of=base + 1, filter=pads.field("text") == "x")
        # filter without as_of stays fine
        assert read_lake(lake, filter=pads.field("text") == "x").count() == 1


@pytest.mark.usefixtures("ray_session")
class TestExportSorted:
    def test_global_order_and_content(self, tmp_path):
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import export_sorted

        ev = gen_change_stream(n_convs=40, n_events=3000, seed=33)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=8, salt=2)
        out = str(tmp_path / "sorted")
        files = export_sorted(lake, out)  # default: manifest key_cols asc
        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        key = pd.MultiIndex.from_frame(df[KEY])
        assert key.is_monotonic_increasing
        want = oracle_final_state(ev.to_pandas()).sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(df.reset_index(drop=True), want, check_dtype=False)

    def test_descending_and_columns(self, tmp_path):
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.gen import gen_change_stream
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import export_sorted

        ev = gen_change_stream(n_convs=15, n_events=800, seed=35)
        lake = _lake(tmp_path)
        replay(ev, lake, num_parts=4)
        out = str(tmp_path / "sorted_desc")
        files = export_sorted(
            lake, out, by=["conv_id", "turn_idx"], descending=True,
            columns=["conv_id", "turn_idx", "text"],
        )
        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        assert list(df.columns) == ["conv_id", "turn_idx", "text"]
        key = pd.MultiIndex.from_frame(df[KEY])
        assert key.is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
class TestApplyChangesAggregate:
    def _maintained_equals_recompute(self, lake, agg0, r2_run):
        from cassandra_data_migrator_ray.sources.lake import (
            apply_changes_aggregate,
            read_changes_pandas,
            read_lake_pandas,
        )

        feed = read_changes_pandas(lake, run_id=r2_run)
        feed = feed.assign(chars=feed["text"].str.len())
        got = apply_changes_aggregate(
            agg0, feed, ["conv_id"], count_col="n", sums={"chars": "chars"}
        )
        final = read_lake_pandas(lake)
        want = (
            final.assign(chars=final["text"].str.len())
            .groupby("conv_id", sort=True)
            .agg(n=("turn_idx", "size"), chars=("chars", "sum"))
            .reset_index()
        )
        pd.testing.assert_frame_equal(
            got.astype({"chars": "float64"}),
            want.astype({"chars": "float64"}),
            check_dtype=False,
        )

    def test_maintained_equals_recompute_with_deletes(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        full = gen_change_stream(n_convs=30, n_events=2500, seed=73).to_pandas()
        half = int(full.event_seq.median())
        lake = _lake(tmp_path)
        replay(full[full.event_seq < half], lake, num_parts=6)
        base = read_lake_pandas(lake)
        agg0 = (
            base.assign(chars=base["text"].str.len())
            .groupby("conv_id", sort=False)
            .agg(n=("turn_idx", "size"), chars=("chars", "sum"))
            .reset_index()
        )
        r2 = replay(full[full.event_seq >= half], lake, emit_changes=True)
        self._maintained_equals_recompute(lake, agg0, r2.run_id)

    def test_empty_base_and_group_disappearance(self):
        from cassandra_data_migrator_ray.sources.lake import apply_changes_aggregate

        feed = pd.DataFrame(
            {
                "conv_id": ["a", "a", "b"],
                "v": [3.0, 4.0, 5.0],
                "_change_type": ["insert", "insert", "insert"],
            }
        )
        agg = apply_changes_aggregate(
            pd.DataFrame(columns=["conv_id", "n", "v"]),
            feed, ["conv_id"], count_col="n", sums={"v": "v"},
        )
        assert agg.set_index("conv_id")["n"].to_dict() == {"a": 2, "b": 1}
        # delete b's only row: the group disappears
        feed2 = pd.DataFrame(
            {"conv_id": ["b"], "v": [5.0], "_change_type": ["delete"]}
        )
        agg2 = apply_changes_aggregate(
            agg, feed2, ["conv_id"], count_col="n", sums={"v": "v"}
        )
        assert agg2["conv_id"].tolist() == ["a"]

    def test_out_of_order_feed_raises(self):
        from cassandra_data_migrator_ray.sources.lake import apply_changes_aggregate

        feed = pd.DataFrame(
            {"conv_id": ["x"], "v": [1.0], "_change_type": ["delete"]}
        )
        with pytest.raises(ValueError, match="negative"):
            apply_changes_aggregate(
                pd.DataFrame(columns=["conv_id", "n", "v"]),
                feed, ["conv_id"], count_col="n", sums={"v": "v"},
            )
