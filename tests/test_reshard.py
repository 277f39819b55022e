"""Lake resharding: re-key a committed lake to a new (num_parts, salt) layout.

The reference fixes its parallelism unit when the job is submitted (numParts,
job/SplitPartitions.java:32-76); a lake that outgrows its initial partition
count needs this explicit maintenance op.  Correctness contract: the public
view is IDENTICAL before and after (only placement changes), incremental
replay keeps working against the new layout, redelivered events stay no-ops,
and time travel to pre-reshard versions still reads the old placement."""

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import (
    lookup,
    read_lake_pandas,
)
from cassandra_data_migrator_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


def _public(df):
    return df.sort_values(KEY, ignore_index=True)


@pytest.mark.usefixtures("ray_session")
class TestReshard:
    def test_reshard_up_preserves_public_view(self, tmp_path):
        ev = gen_change_stream(n_convs=40, n_events=3000, seed=11)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=6)
        before = _public(read_lake_pandas(lake))
        res = reshard_lake(lake, 16)
        assert res.run_id.startswith("reshard-")
        m = Manifest.load(lake)
        assert m.num_parts == 16 and m.salt == 1
        assert set(m.partitions) <= set(range(16))
        after = _public(read_lake_pandas(lake))
        pd.testing.assert_frame_equal(after, before)
        # every partition claims PASS and carries the global watermark
        wms = {v.watermark for v in m.partitions.values()}
        assert wms == {max(wms)}
        assert all(v.status == "PASS" for v in m.partitions.values())

    def test_reshard_down_with_salt_and_lookup(self, tmp_path):
        ev = gen_change_stream(n_convs=50, n_events=4000, seed=13)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=12, salt=2)
        want = oracle_final_state(ev.to_pandas())
        reshard_lake(lake, 3, salt=4)
        m = Manifest.load(lake)
        assert (m.num_parts, m.salt) == (3, 4)
        pd.testing.assert_frame_equal(
            _public(read_lake_pandas(lake)), _public(want), check_dtype=False
        )
        # point lookup prunes with the NEW layout and still finds everything
        convs = want["conv_id"].unique()[:5].tolist()
        got = lookup(lake, convs)
        exp = want[want["conv_id"].isin(convs)].sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_incremental_replay_after_reshard(self, tmp_path):
        full = gen_change_stream(n_convs=40, n_events=4000, seed=17).to_pandas()
        half = int(full.event_seq.median())
        lake = str(tmp_path / "lake")
        replay(full[full.event_seq < half], lake, num_parts=4)
        reshard_lake(lake, 10)
        replay(full[full.event_seq >= half], lake, num_parts=4)  # layout from manifest
        m = Manifest.load(lake)
        assert m.num_parts == 10
        pd.testing.assert_frame_equal(
            _public(read_lake_pandas(lake)),
            _public(oracle_final_state(full)),
            check_dtype=False,
        )
        # redelivering the first half is watermark-filtered to a no-op
        before = _public(read_lake_pandas(lake))
        replay(full[full.event_seq < half], lake)
        pd.testing.assert_frame_equal(_public(read_lake_pandas(lake)), before)

    def test_time_travel_across_reshard(self, tmp_path):
        full = gen_change_stream(n_convs=30, n_events=2500, seed=19).to_pandas()
        half = int(full.event_seq.median())
        lake = str(tmp_path / "lake")
        replay(full[full.event_seq < half], lake, num_parts=5)
        v1 = Manifest.load(lake).version
        pre = _public(read_lake_pandas(lake))
        reshard_lake(lake, 14)
        # versioned scan reads the OLD placement
        pd.testing.assert_frame_equal(
            _public(read_lake_pandas(lake, version=v1)), pre
        )
        # versioned lookup routes with the OLD layout (5 partitions)
        conv = pre["conv_id"].iloc[0]
        got = lookup(lake, [conv], version=v1)
        exp = pre[pre["conv_id"] == conv].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_validate_after_reshard(self, tmp_path):
        """DiffData-style validation routes with the post-reshard layout."""
        from cassandra_data_migrator_ray.pipelines.diff import validate

        ev = gen_change_stream(n_convs=30, n_events=2000, seed=29)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        reshard_lake(lake, 11, salt=2)
        res = validate(oracle_final_state(ev.to_pandas()), lake)
        assert res.ok and res.counts.get("MISSING", 0) == 0

    def test_counter_lake_reshards_and_keeps_folding(self, tmp_path):
        def ev(seq, conv, d):
            return dict(
                conv_id=conv, turn_idx=np.int32(0), op="U", writetime=seq + 1,
                event_seq=seq, role="user", text="x", tool=None,
                ts=pd.Timestamp("2026-01-01"), score=d,
            )

        first = pd.DataFrame([ev(0, "c1", 5), ev(1, "c2", 3), ev(2, "c1", 7)])
        later = pd.DataFrame([ev(3, "c1", -2), ev(4, "c2", 10)])
        lake = str(tmp_path / "lake")
        replay(first, lake, num_parts=2, counter_cols=("score",))
        reshard_lake(lake, 7)
        replay(later, lake, counter_cols=("score",))
        got = read_lake_pandas(lake).set_index("conv_id")["score"]
        assert int(got["c1"]) == 10 and int(got["c2"]) == 13

    def test_noop_and_validation(self, tmp_path):
        ev = gen_change_stream(n_convs=10, n_events=400, seed=23)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        assert reshard_lake(lake, 4).run_id == "noop"
        with pytest.raises(ValueError):
            reshard_lake(lake, 0)
        m = Manifest.load(lake)
        some = next(iter(m.partitions))
        m.partitions[some].status = "FAIL"
        from cassandra_data_migrator_ray.state.manifest import atomic_write_json

        atomic_write_json(m.path, m.to_json())
        with pytest.raises(RuntimeError, match="not PASS"):
            reshard_lake(lake, 8)
