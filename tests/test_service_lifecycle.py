"""Operate the lake like a service: WAL-tail drains arriving segments with
change feeds on, a downstream replica follows via ranged feeds, incremental
validates run per cycle, and vacuum runs MID-SERVICE — the realistic
interleaving of every round-2 feature on one lake."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.diff import validate
from cassandra_data_migrator_ray.pipelines.tail import lineage_report, tail_replay
from cassandra_data_migrator_ray.sources.lake import (
    apply_changes,
    read_changes,
    read_lake_pandas,
)
from cassandra_data_migrator_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


@pytest.mark.usefixtures("ray_session")
def test_service_lifecycle(tmp_path):
    full = gen_change_stream(n_convs=40, n_events=6000, seed=97).to_pandas()
    n_seg = 5
    step = (len(full) + n_seg - 1) // n_seg
    src = str(tmp_path / "wal")
    os.makedirs(src)
    lake = str(tmp_path / "lake")

    replica = None
    replica_version = 0
    seen = None

    for i in range(n_seg):
        seg = full[(full.event_seq >= i * step) & (full.event_seq < (i + 1) * step)]
        pq.write_table(
            pa.Table.from_pandas(seg, preserve_index=False),
            os.path.join(src, f"seg-{i:03d}.parquet"),
        )
        prior_version = (Manifest.load(lake).version if os.path.exists(
            os.path.join(lake, "manifest.json")) else 0)
        res = tail_replay(
            src, lake, stop_after_idle_cycles=1, poll_interval=0.05,
            num_parts=8, salt=2, emit_changes=True,
            snapshot_retention=3,
        )
        assert res.cycles >= 1
        seen = seg if seen is None else pd.concat([seen, seg], ignore_index=True)

        # incremental validate: only partitions touched since last commit
        expected = oracle_final_state(seen)
        v = validate(expected, lake, since_version=prior_version)
        assert v.ok, v.counts

        # replica follows via the ranged feed
        m = Manifest.load(lake)
        if replica is None:
            replica = read_lake_pandas(lake)
        else:
            span = read_changes(lake, since_version=replica_version).to_pandas()
            for cv in sorted(span["_commit_version"].unique()):
                feed = span[span["_commit_version"] == cv].drop(
                    columns="_commit_version"
                )
                replica = apply_changes(replica, feed, KEY)
        replica_version = m.version
        pd.testing.assert_frame_equal(
            replica.reset_index(drop=True),
            read_lake_pandas(lake),
            check_dtype=False,
        )

        if i == 2:  # maintenance mid-service
            Manifest.load(lake).vacuum(keep_last=1)

    # end state: lake == oracle of the whole stream; full validate green
    final = oracle_final_state(full)
    pd.testing.assert_frame_equal(read_lake_pandas(lake), final, check_dtype=False)
    assert validate(final, lake).ok
    # lineage attributes every live file to a committed run
    rep = lineage_report(lake)
    assert rep["written_by_run"].notna().all()
    committed = {r["run_id"] for r in Manifest.load(lake).runs}
    assert set(rep["written_by_run"]) <= committed
    # retention bounded the on-disk history
    assert len(Manifest.load(lake).list_snapshots()) <= 3
    # no stray uncommitted files
    m = Manifest.load(lake)
    referenced = {f for st in m.partitions.values() for f in st.files}
    for v_ in m.list_snapshots():
        for fl in (m.snapshot(v_) or {}).get("partitions", {}).values():
            referenced.update(fl)
    on_disk = {
        os.path.join("data", os.path.basename(f))
        for f in glob.glob(os.path.join(lake, "data", "*.parquet"))
    }
    assert on_disk == referenced
