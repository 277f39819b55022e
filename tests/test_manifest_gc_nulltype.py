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
