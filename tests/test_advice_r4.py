"""Round-4 regression tests for the advisor findings (ADVICE.md r3):

1. a versioned lookup() on a snapshot WITHOUT layout keys (written by an
   older engine) must scan all snapshot partitions, not route with the live
   layout — after a reshard the live layout prunes wrongly;
2. analyze_lake must not crash on binary payload columns (non-JSON-native
   min/max bounds are dropped, never string-mangled);
3. export_sorted must return only THIS export's files even when a prior
   (or crashed) export left files in the same directory;
4. apply_changes_aggregate must keep feed rows whose group column is null
   (SQL GROUP BY semantics), not silently drop them.
"""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import (
    apply_changes_aggregate,
    export_sorted,
    lookup,
    read_lake_pandas,
)
from cassandra_data_migrator_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


@pytest.mark.usefixtures("ray_session")
class TestVersionedLookupLayoutFallback:
    def test_layoutless_snapshot_scans_all_partitions(self, tmp_path):
        ev = gen_change_stream(n_convs=40, n_events=2500, seed=41)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=12)
        m = Manifest.load(lake)
        v1 = m.version
        want_v1 = oracle_final_state(ev.to_pandas())
        # simulate a snapshot written by an engine that predates layout keys
        snap_path = os.path.join(m.snapshots_dir, f"v{v1:06d}.json")
        with open(snap_path) as f:
            snap = json.load(f)
        assert "num_parts" in snap  # current engine records it
        snap.pop("num_parts")
        snap.pop("salt", None)
        with open(snap_path, "w") as f:
            json.dump(snap, f)
        # reshard: live layout now disagrees with the v1 placement
        reshard_lake(lake, 5, salt=2)
        convs = sorted(want_v1["conv_id"].unique())[:6]
        got = lookup(lake, convs, version=v1)
        exp = want_v1[want_v1["conv_id"].isin(convs)].sort_values(
            KEY, ignore_index=True
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_layout_bearing_snapshot_still_prunes(self, tmp_path):
        ev = gen_change_stream(n_convs=30, n_events=2000, seed=43)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=8)
        v1 = Manifest.load(lake).version
        want_v1 = oracle_final_state(ev.to_pandas())
        reshard_lake(lake, 3)
        convs = sorted(want_v1["conv_id"].unique())[:4]
        got = lookup(lake, convs, version=v1)
        exp = want_v1[want_v1["conv_id"].isin(convs)].sort_values(
            KEY, ignore_index=True
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestAnalyzeNonJsonBounds:
    def test_binary_column_does_not_crash_analyze(self, tmp_path):
        import pyarrow as pa

        from cassandra_data_migrator_ray.pipelines.maintenance import (
            analyze_lake,
            load_stats,
        )

        ev = gen_change_stream(n_convs=10, n_events=300, seed=47).to_pandas()
        # add a binary payload column: min/max bounds are bytes → must be
        # dropped from the stats JSON, not crash json.dumps
        ev["blob"] = [f"b{int(i) % 7}".encode() for i in ev["event_seq"]]
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us")),
                ("blob", pa.binary()),
            ]
        )
        import ray

        tbl = pa.Table.from_pandas(ev, preserve_index=False)
        tbl = tbl.select(
            [
                "op",
                "conv_id",
                "turn_idx",
                "role",
                "text",
                "tool",
                "ts",
                "blob",
                "writetime",
                "event_seq",
            ]
        )
        lake = str(tmp_path / "lake")
        replay(
            ray.data.from_arrow(tbl), lake, num_parts=4, payload_schema=schema
        )
        stats = analyze_lake(lake)
        loaded = load_stats(lake)
        assert loaded is not None and loaded["version"] == stats["version"]
        saw_blob = False
        for p in loaded["partitions"].values():
            if "blob" in p:
                saw_blob = True
                assert p["blob"]["lo"] is None and p["blob"]["hi"] is None
                # turn_idx bounds stay numeric and prunable
            if "turn_idx" in p and p["turn_idx"]["lo"] is not None:
                assert isinstance(p["turn_idx"]["lo"], int)
        assert saw_blob


@pytest.mark.usefixtures("ray_session")
class TestExportSortedIsolation:
    def test_leftover_files_excluded(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=800, seed=53)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        out = str(tmp_path / "export")
        os.makedirs(out)
        # a crashed prior export left a file that sorts lexicographically
        # before everything (and another after everything)
        stale_a = os.path.join(out, "sorted-0000stale-000000-000000.parquet")
        stale_z = os.path.join(out, "sorted-zzzzstale-000000-000000.parquet")
        want = oracle_final_state(ev.to_pandas())
        import pyarrow.parquet as pq
        import pyarrow as pa

        pq.write_table(pa.table({"conv_id": ["junk"]}), stale_a)
        pq.write_table(pa.table({"conv_id": ["junk"]}), stale_z)
        files = export_sorted(lake, out)
        assert stale_a not in files and stale_z not in files
        got = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        exp = want.sort_values(KEY, ignore_index=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # returned list is globally ordered (concatenation == ORDER BY)
        assert got[KEY].equals(exp[KEY])
        # stale files are untouched on disk, just not returned
        assert os.path.exists(stale_a) and os.path.exists(stale_z)


class TestApplyChangesAggregateNullGroups:
    def test_null_group_rows_are_kept(self):
        from cassandra_data_migrator_ray.stages.merge import CHANGE_COL

        feed = pd.DataFrame(
            {
                "grp": ["a", None, None, "b"],
                "v": [1.0, 2.0, 3.0, 4.0],
                CHANGE_COL: ["insert", "insert", "insert", "insert"],
            }
        )
        agg = pd.DataFrame(
            {"grp": [], "n_rows": pd.Series([], dtype=np.int64), "sv": []}
        )
        out = apply_changes_aggregate(
            agg, feed, ["grp"], count_col="n_rows", sums={"sv": "v"}
        )
        null_row = out[out["grp"].isna()]
        assert len(null_row) == 1
        assert int(null_row["n_rows"].iloc[0]) == 2
        assert float(null_row["sv"].iloc[0]) == 5.0
        # a second feed touching the null group updates it in place
        feed2 = pd.DataFrame(
            {
                "grp": [None, None],
                "v": [2.0, 10.0],
                CHANGE_COL: ["update_preimage", "update_postimage"],
            }
        )
        out2 = apply_changes_aggregate(
            out, feed2, ["grp"], count_col="n_rows", sums={"sv": "v"}
        )
        null_row2 = out2[out2["grp"].isna()]
        assert len(null_row2) == 1
        assert int(null_row2["n_rows"].iloc[0]) == 2
        assert float(null_row2["sv"].iloc[0]) == 13.0
        # delete of one null-group row decrements, the other survives
        feed3 = pd.DataFrame(
            {"grp": [None], "v": [10.0], CHANGE_COL: ["delete"]}
        )
        out3 = apply_changes_aggregate(
            out2, feed3, ["grp"], count_col="n_rows", sums={"sv": "v"}
        )
        null_row3 = out3[out3["grp"].isna()]
        assert int(null_row3["n_rows"].iloc[0]) == 1
        assert float(null_row3["sv"].iloc[0]) == 3.0
