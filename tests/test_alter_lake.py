"""ALTER on a committed lake: rename / drop payload columns.

Completes the schema-evolution surface next to additive adds and opt-in
numeric widening.  Contracts under test:
- rename REWRITES partitions copy-on-write; data, cell writetimes/seqs and
  tombstones ride along unchanged, so LWW vs future events is identical
- drop is METADATA-ONLY (no file IO); the bytes are purged by the next full
  rewrite, and until then re-adding the name is refused (no resurrection)
- time travel to pre-ALTER versions reads the old schema and old values
- counter columns keep counter (delta-sum) semantics across a rename
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.maintenance import alter_lake, compact_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import lookup, read_lake_pandas
from cassandra_data_migrator_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


def _public(df):
    return df.sort_values(KEY, ignore_index=True)


def _data_files(lake):
    m = Manifest.load(lake)
    return {k: tuple(v.files) for k, v in m.partitions.items()}


@pytest.mark.usefixtures("ray_session")
class TestAlterRename:
    def test_rename_preserves_data_and_lww(self, tmp_path):
        full = gen_change_stream(n_convs=30, n_events=2500, seed=23).to_pandas()
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(full, preserve_index=False), lake, num_parts=5
        )
        before = _public(read_lake_pandas(lake))
        res = alter_lake(lake, rename={"tool": "tool_name"})
        assert res.run_id.startswith("alter-")
        assert len(res.metrics) == len(Manifest.load(lake).partitions)
        after = _public(read_lake_pandas(lake))
        assert "tool" not in after.columns and "tool_name" in after.columns
        pd.testing.assert_frame_equal(
            after, before.rename(columns={"tool": "tool_name"})
        )
        m = Manifest.load(lake)
        assert m.schema.names == [
            "conv_id", "turn_idx", "role", "text", "tool_name", "ts",
        ]
        # LWW against future events is unchanged: an event whose writetime
        # predates the stored cell must lose, a later one must win
        key = before.loc[before["tool"].notna()].iloc[0]
        stale = pd.DataFrame(
            {
                "op": ["UPSERT"],
                "conv_id": [key["conv_id"]],
                "turn_idx": np.array([key["turn_idx"]], dtype=np.int32),
                "role": [None],
                "text": [None],
                "tool_name": ["loser"],
                "ts": [pd.NaT],
                "writetime": np.array([0], dtype=np.int64),
                "event_seq": np.array([10**9], dtype=np.int64),
            }
        )
        replay(pa.Table.from_pandas(stale, preserve_index=False), lake)
        got = lookup(lake, [(key["conv_id"], int(key["turn_idx"]))])
        assert got["tool_name"].iloc[0] == key["tool"]  # stale event lost
        fresh = stale.assign(
            tool_name="winner",
            writetime=np.int64(2**60),
            event_seq=np.int64(10**9 + 1),
        )
        replay(pa.Table.from_pandas(fresh, preserve_index=False), lake)
        got = lookup(lake, [(key["conv_id"], int(key["turn_idx"]))])
        assert got["tool_name"].iloc[0] == "winner"

    def test_rename_then_incremental_replay(self, tmp_path):
        full = gen_change_stream(n_convs=40, n_events=3000, seed=29).to_pandas()
        half = int(full.event_seq.median())
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(
                full[full.event_seq < half], preserve_index=False
            ),
            lake,
            num_parts=4,
        )
        alter_lake(lake, rename={"text": "body"})
        second = full[full.event_seq >= half].rename(columns={"text": "body"})
        replay(pa.Table.from_pandas(second, preserve_index=False), lake)
        want = _public(oracle_final_state(full)).rename(columns={"text": "body"})
        pd.testing.assert_frame_equal(
            _public(read_lake_pandas(lake)), want, check_dtype=False
        )

    def test_time_travel_reads_pre_rename_schema(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1200, seed=31)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=3)
        before = _public(read_lake_pandas(lake))
        v0 = Manifest.load(lake).version
        alter_lake(lake, rename={"role": "speaker"})
        old = _public(read_lake_pandas(lake, version=v0))
        pd.testing.assert_frame_equal(old, before)
        new = read_lake_pandas(lake)
        assert "speaker" in new.columns and "role" not in new.columns

    def test_validate_after_rename(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.diff import validate

        ev = gen_change_stream(n_convs=25, n_events=1500, seed=37)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        alter_lake(lake, rename={"tool": "fn"})
        expected = oracle_final_state(ev.to_pandas()).rename(columns={"tool": "fn"})
        assert validate(expected, lake).ok

    def test_counter_rename_keeps_counter_semantics(self, tmp_path):
        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("n", pa.float64())]
        )
        base = pd.DataFrame(
            {
                "op": "UPSERT",
                "conv_id": [f"c{i % 7}" for i in range(140)],
                "turn_idx": np.zeros(140, dtype=np.int32),
                "n": np.ones(140),
                "writetime": np.arange(140, dtype=np.int64) + 1,
                "event_seq": np.arange(140, dtype=np.int64),
            }
        )
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(base, preserve_index=False),
            lake,
            num_parts=3,
            payload_schema=schema,
            counter_cols=("n",),
        )
        alter_lake(lake, rename={"n": "total"})
        m = Manifest.load(lake)
        assert m.counter_cols == ["total"]
        state = read_lake_pandas(lake).set_index("conv_id")["total"]
        assert state.loc["c0"] == 20.0  # 140 events / 7 keys, delta 1 each
        delta = pd.DataFrame(
            {
                "op": ["UPSERT"],
                "conv_id": ["c0"],
                "turn_idx": np.zeros(1, dtype=np.int32),
                "total": [5.0],
                "writetime": np.array([10**9], dtype=np.int64),
                "event_seq": np.array([10**9], dtype=np.int64),
            }
        )
        replay(pa.Table.from_pandas(delta, preserve_index=False), lake)
        state = read_lake_pandas(lake).set_index("conv_id")["total"]
        assert state.loc["c0"] == 25.0  # counter accumulated, not overwritten


@pytest.mark.usefixtures("ray_session")
class TestAlterDrop:
    def test_drop_is_metadata_only(self, tmp_path):
        ev = gen_change_stream(n_convs=25, n_events=1500, seed=41)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        before = _public(read_lake_pandas(lake))
        files_before = _data_files(lake)
        v0 = Manifest.load(lake).version
        res = alter_lake(lake, drop=["tool"])
        assert len(res.metrics) == 0  # no partition rewritten
        assert _data_files(lake) == files_before  # same physical files
        m = Manifest.load(lake)
        assert m.version == v0 + 1
        assert "tool" not in m.schema.names
        assert m.dropped_cols == ["tool"]
        after = _public(read_lake_pandas(lake))
        pd.testing.assert_frame_equal(after, before.drop(columns=["tool"]))
        # time travel still sees the column and its values
        pd.testing.assert_frame_equal(
            _public(read_lake_pandas(lake, version=v0)), before
        )
        # lookup projects it away too
        got = lookup(lake, [before["conv_id"].iloc[0]])
        assert "tool" not in got.columns

    def test_dropped_name_refused_until_full_rewrite(self, tmp_path):
        full = gen_change_stream(n_convs=30, n_events=2000, seed=43).to_pandas()
        half = int(full.event_seq.median())
        first, second = full[full.event_seq < half], full[full.event_seq >= half]
        lake = str(tmp_path / "lake")
        replay(pa.Table.from_pandas(first, preserve_index=False), lake, num_parts=3)
        alter_lake(lake, drop=["tool"])
        with pytest.raises(ValueError, match="resurrect"):
            replay(pa.Table.from_pandas(second, preserve_index=False), lake)
        # replaying without the dropped column is fine
        replay(
            pa.Table.from_pandas(
                second.drop(columns=["tool"]), preserve_index=False
            ),
            lake,
        )
        # full compaction purges the bytes and frees the name
        compact_lake(lake)
        m = Manifest.load(lake)
        assert m.dropped_cols == []
        for files in _data_files(lake).values():
            for f in files:
                names = pq.read_schema(os.path.join(lake, f)).names
                assert "tool" not in names and "tool__wt" not in names
        # re-add starts EMPTY — no resurrected cell values
        readd = second.iloc[[0]].assign(
            writetime=np.int64(2**60), event_seq=np.int64(10**9), tool="fresh"
        )
        replay(pa.Table.from_pandas(readd, preserve_index=False), lake)
        state = _public(read_lake_pandas(lake))
        assert "tool" in state.columns
        touched = (state["conv_id"] == readd["conv_id"].iloc[0]) & (
            state["turn_idx"] == readd["turn_idx"].iloc[0]
        )
        assert (state.loc[touched, "tool"] == "fresh").all()
        assert state.loc[~touched, "tool"].isna().all()

    def test_rename_purges_pending_drop(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1200, seed=47)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=3)
        alter_lake(lake, drop=["tool"])
        assert Manifest.load(lake).dropped_cols == ["tool"]
        alter_lake(lake, rename={"text": "body"})
        m = Manifest.load(lake)
        assert m.dropped_cols == []
        for files in _data_files(lake).values():
            for f in files:
                names = pq.read_schema(os.path.join(lake, f)).names
                assert "tool" not in names and "body" in names

    def test_combined_rename_and_drop_one_commit(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1000, seed=53)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=3)
        before = _public(read_lake_pandas(lake))
        v0 = Manifest.load(lake).version
        alter_lake(lake, rename={"text": "body"}, drop=["tool"])
        m = Manifest.load(lake)
        assert m.version == v0 + 1
        assert m.schema.names == ["conv_id", "turn_idx", "role", "body", "ts"]
        assert m.dropped_cols == []  # rewrite purged the dropped bytes too
        want = before.rename(columns={"text": "body"}).drop(columns=["tool"])
        pd.testing.assert_frame_equal(_public(read_lake_pandas(lake)), want)


@pytest.mark.usefixtures("ray_session")
class TestAlterRefusals:
    @pytest.fixture()
    def lake(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=400, seed=59)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2)
        return lake

    def test_refusals(self, lake):
        with pytest.raises(ValueError, match="nothing to do"):
            alter_lake(lake)
        with pytest.raises(ValueError, match="key column"):
            alter_lake(lake, rename={"conv_id": "cid"})
        with pytest.raises(ValueError, match="key column"):
            alter_lake(lake, drop=["turn_idx"])
        with pytest.raises(ValueError, match="unknown column"):
            alter_lake(lake, rename={"nope": "x"})
        with pytest.raises(ValueError, match="both rename and drop"):
            alter_lake(lake, rename={"tool": "fn"}, drop=["tool"])
        with pytest.raises(ValueError, match="duplicate rename targets"):
            alter_lake(lake, rename={"tool": "x", "role": "x"})
        with pytest.raises(ValueError, match="collides"):
            alter_lake(lake, rename={"tool": "text"})
        with pytest.raises(ValueError, match="reserved"):
            alter_lake(lake, rename={"tool": "__tool"})
        with pytest.raises(ValueError, match="itself"):
            alter_lake(lake, rename={"tool": "tool"})
        # rename target colliding with a pending-purge dropped name
        alter_lake(lake, drop=["tool"])
        with pytest.raises(ValueError, match="collides"):
            alter_lake(lake, rename={"role": "tool"})

    def test_cli_alter(self, lake, capsys):
        import json

        from cassandra_data_migrator_ray.cli import main

        rc = main(
            ["alter", "--lake", lake, "--rename", "tool=fn", "--drop", "ts"]
        )
        assert rc in (0, None)
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rename"] == {"tool": "fn"} and out["drop"] == ["ts"]
        m = Manifest.load(lake)
        assert "fn" in m.schema.names and "ts" not in m.schema.names


@pytest.mark.usefixtures("ray_session")
class TestAlterChangeFeed:
    """Ranged change feeds across an ALTER: feed files written before the
    ALTER carry that era's column names; read_changes maps every era name
    forward onto the current declared schema, and maintenance commits
    (alter/compact/reshard) are skipped as no-ops — so a replica applying
    the span converges on the current state."""

    def test_ranged_feed_across_rename(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import (
            apply_changes,
            read_changes,
        )

        full = gen_change_stream(n_convs=25, n_events=3000, seed=61).to_pandas()
        third = len(full) // 3
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(
                full[full.event_seq < third], preserve_index=False
            ),
            lake, num_parts=4, emit_changes=True,
        )
        v1 = Manifest.load(lake).version
        replica = read_lake_pandas(lake)
        replay(
            pa.Table.from_pandas(
                full[(full.event_seq >= third) & (full.event_seq < 2 * third)],
                preserve_index=False,
            ),
            lake, emit_changes=True,
        )
        alter_lake(lake, rename={"text": "body"})
        replay(
            pa.Table.from_pandas(
                full[full.event_seq >= 2 * third].rename(
                    columns={"text": "body"}
                ),
                preserve_index=False,
            ),
            lake, emit_changes=True,
        )
        span = read_changes(lake, since_version=v1).to_pandas()
        # era names are mapped forward: no split old/new columns
        assert "body" in span.columns and "text" not in span.columns
        # the alter commit itself contributes no rows
        assert set(span["_commit_version"]) == {v1 + 1, v1 + 3}
        got = apply_changes(
            replica.rename(columns={"text": "body"}), span, KEY
        )
        want = read_lake_pandas(lake)
        pd.testing.assert_frame_equal(
            got.sort_values(KEY, ignore_index=True),
            want.sort_values(KEY, ignore_index=True),
            check_dtype=False,
        )

    def test_ranged_feed_across_drop_and_compact(self, tmp_path):
        from cassandra_data_migrator_ray.sources.lake import read_changes

        full = gen_change_stream(n_convs=20, n_events=1600, seed=67).to_pandas()
        half = int(full.event_seq.median())
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(
                full[full.event_seq < half], preserve_index=False
            ),
            lake, num_parts=3, emit_changes=True,
        )
        alter_lake(lake, drop=["tool"])
        compact_lake(lake)  # purges bytes; also a feed-less commit in range
        replay(
            pa.Table.from_pandas(
                full[full.event_seq >= half].drop(columns=["tool"]),
                preserve_index=False,
            ),
            lake, emit_changes=True,
        )
        span = read_changes(lake, since_version=0).to_pandas()
        # the dropped column is gone from EVERY era's rows
        assert "tool" not in span.columns
        assert len(span) > 0
