"""ANALYZE column statistics + stats-based partition pruning.

The engine-level analogue of parquet row-group statistics, one level up:
`analyze_lake` records per-partition column ranges version-stamped to the
manifest; `read_lake(prune={col: (lo, hi)})` skips partitions whose range
provably excludes the predicate.  Pruning must NEVER change results — only
the number of files read — and stale stats must disable themselves."""

import numpy as np
import pandas as pd
import pytest

import ray

from cassandra_data_migrator_ray.gen import gen_change_stream
from cassandra_data_migrator_ray.pipelines.maintenance import analyze_lake, load_stats
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import (
    read_lake,
    read_lake_pandas,
    stats_prune_partitions,
)
from cassandra_data_migrator_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


def _sorted(df):
    return df.sort_values(KEY, ignore_index=True)


@pytest.mark.usefixtures("ray_session")
class TestAnalyzePrune:
    def _lake(self, tmp_path, n_convs=40, n_events=2500, seed=47):
        ev = gen_change_stream(n_convs=n_convs, n_events=n_events, seed=seed)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=12)
        return lake

    def test_analyze_writes_versioned_stats(self, tmp_path):
        lake = self._lake(tmp_path)
        st = analyze_lake(lake)
        m = Manifest.load(lake)
        assert st["version"] == m.version
        assert load_stats(lake)["version"] == m.version
        some = next(iter(st["partitions"].values()))
        assert {"lo", "hi", "nulls", "rows"} <= set(some["turn_idx"])

    def test_prune_preserves_results_and_skips_partitions(self, tmp_path):
        lake = self._lake(tmp_path)
        analyze_lake(lake)
        m = Manifest.load(lake)
        stats = load_stats(lake)
        # pick one conversation's exact conv_id range: only the partitions
        # whose string range covers it survive
        full = read_lake_pandas(lake)
        conv = full["conv_id"].iloc[0]
        kept = stats_prune_partitions(m, stats, {"conv_id": (conv, conv)})
        assert kept is not None and 0 < len(kept) < len(m.partitions)
        pruned = _sorted(read_lake(lake, prune={"conv_id": (conv, conv)}).to_pandas())
        unpruned = _sorted(read_lake(lake).to_pandas())
        # pruning drops whole partitions only; rows for conv must survive
        want = _sorted(unpruned[unpruned["conv_id"] == conv])
        got = _sorted(pruned[pruned["conv_id"] == conv])
        pd.testing.assert_frame_equal(got, want)

    def test_numeric_range_prune_never_loses_rows(self, tmp_path):
        lake = self._lake(tmp_path)
        analyze_lake(lake)
        full = read_lake_pandas(lake)
        hi = int(full["turn_idx"].median())
        pruned = read_lake(lake, prune={"turn_idx": (None, hi)}).to_pandas()
        want = full[full["turn_idx"] <= hi]
        # every matching row is present (partition-level prune keeps extras)
        merged = want.merge(pruned, on=KEY, how="left", indicator=True)
        assert (merged["_merge"] == "both").all()

    def test_stale_stats_disable_pruning(self, tmp_path):
        lake = self._lake(tmp_path)
        analyze_lake(lake)
        ev2 = gen_change_stream(n_convs=10, n_events=400, seed=53)
        replay(ev2, lake)  # bumps manifest version → stats stale
        assert load_stats(lake) is None
        m = Manifest.load(lake)
        assert stats_prune_partitions(m, None, {"turn_idx": (0, 1)}) is None
        # read_lake silently scans everything (a prune that would exclude all
        # partitions under fresh stats must return the full view when stale)
        a = _sorted(read_lake(lake, prune={"turn_idx": (10**9, 10**9)}).to_pandas())
        b = _sorted(read_lake_pandas(lake))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_prune_rejects_time_travel(self, tmp_path):
        lake = self._lake(tmp_path)
        analyze_lake(lake)
        with pytest.raises(ValueError, match="live view"):
            read_lake(lake, prune={"turn_idx": (0, 1)}, version=1)


@pytest.mark.usefixtures("ray_session")
class TestWhere:
    """read_lake(where=...) — exact range predicate that stacks partition
    pruning (fresh stats), parquet row-group pruning and row filtering."""

    def _lake(self, tmp_path):
        ev = gen_change_stream(n_convs=40, n_events=2500, seed=47)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=12)
        return lake

    def test_where_exact_rows_with_fresh_stats(self, tmp_path):
        lake = self._lake(tmp_path)
        analyze_lake(lake)
        full = read_lake_pandas(lake)
        hi = int(full["turn_idx"].median())
        got = _sorted(read_lake(lake, where={"turn_idx": (None, hi)}).to_pandas())
        want = _sorted(full[full["turn_idx"] <= hi])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        conv = full["conv_id"].iloc[0]
        got = _sorted(read_lake(lake, where={"conv_id": (conv, conv)}).to_pandas())
        want = _sorted(full[full["conv_id"] == conv])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_where_exact_without_stats(self, tmp_path):
        lake = self._lake(tmp_path)  # no ANALYZE: prune skipped, filter exact
        full = read_lake_pandas(lake)
        lo = int(full["turn_idx"].median())
        got = _sorted(read_lake(lake, where={"turn_idx": (lo, None)}).to_pandas())
        want = _sorted(full[full["turn_idx"] >= lo])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_where_time_travel(self, tmp_path):
        lake = self._lake(tmp_path)
        v1 = Manifest.load(lake).version
        replay(gen_change_stream(n_convs=3, n_events=150, seed=51,
                                 seq_start=10_000), lake)
        old = read_lake(lake, version=v1).to_pandas()
        hi = int(old["turn_idx"].median())
        got = _sorted(
            read_lake(lake, version=v1, where={"turn_idx": (None, hi)}).to_pandas()
        )
        want = _sorted(old[old["turn_idx"] <= hi])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalAnalyze:
    """Incremental ANALYZE: re-stats only partitions whose file list changed
    since the last stats file, carrying the rest forward — identical files
    imply identical stats, so the carried entries are exact."""

    def test_incremental_equals_full_after_partial_churn(self, tmp_path):
        ev = gen_change_stream(n_convs=40, n_events=2500, seed=47)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=12)
        st1 = analyze_lake(lake)
        assert st1["reused_parts"] == 0
        assert st1["recomputed_parts"] == len(st1["partitions"])
        # a tiny second stream touches few partitions (2 conversations route
        # to at most 2 of the 12), so most stats must carry forward
        # seq_start past the first stream's watermark so the new events are
        # not suppressed as late arrivals
        ev2 = gen_change_stream(n_convs=2, n_events=120, seed=53,
                                seq_start=10_000)
        replay(ev2, lake)
        st2 = analyze_lake(lake)
        total = len(st2["partitions"])
        assert st2["reused_parts"] > 0
        assert 1 <= st2["recomputed_parts"] < total
        assert st2["reused_parts"] + st2["recomputed_parts"] == total
        assert load_stats(lake)["version"] == Manifest.load(lake).version
        full = analyze_lake(lake, incremental=False)
        assert full["reused_parts"] == 0
        assert full["partitions"] == st2["partitions"]

    def test_column_subset_reuses_prior_superset(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=800, seed=59)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=6)
        analyze_lake(lake)  # all columns
        st = analyze_lake(lake, columns=["turn_idx"])
        assert st["recomputed_parts"] == 0
        assert st["reused_parts"] == len(st["partitions"])
        assert all(set(p) == {"turn_idx"} for p in st["partitions"].values())

    def test_replay_analyze_keeps_stats_fresh(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=800, seed=43)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=6, analyze=True)
        assert load_stats(lake)["version"] == Manifest.load(lake).version
        replay(
            gen_change_stream(n_convs=2, n_events=80, seed=51, seq_start=5000),
            lake,
            analyze=True,
        )
        st2 = load_stats(lake)
        assert st2 is not None  # fresh stamp: prune stays enabled
        assert st2["version"] == Manifest.load(lake).version
        assert st2["reused_parts"] > 0  # the refresh was incremental

    def test_stats_dir_retention_bounded(self, tmp_path):
        import glob
        import os

        ev = gen_change_stream(n_convs=10, n_events=300, seed=61)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        for i, s in enumerate((71, 73, 79, 83, 89, 97)):
            replay(gen_change_stream(n_convs=2, n_events=60, seed=s,
                                     seq_start=1_000 * (i + 1)), lake)
            analyze_lake(lake)
        files = glob.glob(os.path.join(lake, "_stats", "v*.json"))
        assert len(files) <= 4
        assert load_stats(lake) is not None  # newest survives retention


@pytest.mark.usefixtures("ray_session")
class TestFsck:
    def _lake(self, tmp_path):
        ev = gen_change_stream(n_convs=20, n_events=1200, seed=59)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=6)
        return lake

    def test_clean_lake_passes(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.maintenance import fsck_lake

        lake = self._lake(tmp_path)
        res = fsck_lake(lake)
        assert res["ok"] and not res["missing"]
        assert res["partitions"]["ok"].all()

    def test_missing_file_detected(self, tmp_path):
        import os

        from cassandra_data_migrator_ray.pipelines.maintenance import fsck_lake

        lake = self._lake(tmp_path)
        m = Manifest.load(lake)
        victim = next(iter(m.partitions.values())).files[0]
        os.unlink(os.path.join(lake, victim))
        res = fsck_lake(lake)
        assert not res["ok"] and victim in res["missing"]

    def test_tampered_partition_detected(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.pipelines.maintenance import fsck_lake

        lake = self._lake(tmp_path)
        m = Manifest.load(lake)
        part, st = next((k, v) for k, v in m.partitions.items() if v.rows > 1)
        path = os.path.join(lake, st.files[0])
        tbl = pq.read_table(path)
        pq.write_table(tbl.slice(0, tbl.num_rows - 1), path)  # drop one row
        res = fsck_lake(lake)
        row = res["partitions"].set_index("part").loc[part]
        assert not res["ok"] and not row["ok"] and "rows" in row["issues"]

    def test_shallow_skips_reread(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.maintenance import fsck_lake

        lake = self._lake(tmp_path)
        res = fsck_lake(lake, deep=False)
        assert res["ok"] and len(res["partitions"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestClusterBy:
    """compact_lake(cluster_by=...) — physical row order inside rewritten
    partition files follows the clustered column; content is unchanged."""

    def test_cluster_by_preserves_content_and_orders_files(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        ev = gen_change_stream(n_convs=30, n_events=1500, seed=71)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=6)
        before = _sorted(read_lake_pandas(lake))
        res = compact_lake(lake, cluster_by=["ts"])
        assert len(res.metrics) > 0
        after = _sorted(read_lake_pandas(lake))
        pd.testing.assert_frame_equal(after, before)
        m = Manifest.load(lake)
        for st in m.partitions.values():
            for f in st.files:
                ts = pq.read_table(
                    os.path.join(lake, f), columns=["ts"]
                ).to_pandas()["ts"]
                assert ts.dropna().is_monotonic_increasing

    def test_cluster_by_unknown_column_rejected(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        ev = gen_change_stream(n_convs=5, n_events=200, seed=73)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2)
        with pytest.raises(ValueError, match="cluster_by"):
            compact_lake(lake, cluster_by=["no_such_col"])


@pytest.mark.usefixtures("ray_session")
class TestSelectiveCompaction:
    def test_only_tombstoned_partitions_rewritten(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        ev = gen_change_stream(n_convs=40, n_events=1200, seed=67)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=48)  # ~1 conv/partition → some delete-free
        m0 = Manifest.load(lake)
        dirty = {k for k, v in m0.partitions.items() if v.tombstones > 0}
        clean = set(m0.partitions) - dirty
        assert dirty and clean  # generator produces deletes; both sets real
        before = read_lake_pandas(lake)
        res = compact_lake(lake, only_tombstoned=True)
        assert set(res.metrics["part"]) == dirty
        m1 = Manifest.load(lake)
        # clean partitions keep their exact files; dirty ones were rewritten
        for p in clean:
            assert m1.partitions[p].files == m0.partitions[p].files
        for p in dirty:
            assert m1.partitions[p].files != m0.partitions[p].files
            assert m1.partitions[p].tombstones == 0
        pd.testing.assert_frame_equal(
            _sorted(read_lake_pandas(lake)), _sorted(before)
        )

    def test_ttl_combination_rejected(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

        ev = gen_change_stream(n_convs=5, n_events=200, seed=69)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=2)
        with pytest.raises(ValueError, match="ttl_as_of"):
            compact_lake(lake, only_tombstoned=True, ttl_as_of=123)
