"""Mid-stream compaction gc_grace contract (surfaced by the round-4 sf0.1
soak): dropping tombstones before every event at-or-below their writetime
has arrived resurrects rows when a later batch delivers out-of-order
writes older than a dropped tombstone — exactly Cassandra's
gc_grace_seconds hazard (reference SIT/smoke/03_ttl_writetime).  The
engine's contract (maintenance.py): ``grace_wt=None`` drops ALL tombstones
and is only safe post-stream; mid-stream callers must pass the min
writetime still in flight."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


def _segments(n_events=6000, n_convs=60, batches=3, seed=823):
    full = gen_change_stream(
        n_convs=n_convs, n_events=n_events, seed=seed, p_delete=0.2,
        wt_jitter=10**9,  # heavy jitter → late writes older than tombstones
    )
    step = n_events // batches
    segs = [
        full.slice(i * step, step if i < batches - 1 else n_events - i * step)
        for i in range(batches)
    ]
    return full, segs


@pytest.mark.usefixtures("ray_session")
class TestMidStreamCompactionGrace:
    def test_grace_watermark_keeps_oracle_parity(self, tmp_path):
        """Compacting between batches with the contract-correct grace (min
        writetime of the unreplayed tail) stays oracle-exact."""
        full, segs = _segments()
        full_df = full.to_pandas()
        lake = str(tmp_path / "lake")
        for i, seg in enumerate(segs):
            replay(seg, lake, num_parts=8, salt=2)
            if i < len(segs) - 1:
                nxt_seq = int(segs[i + 1].column("event_seq")[0].as_py())
                tail = full_df[full_df["event_seq"] >= nxt_seq]
                compact_lake(
                    lake, only_tombstoned=True,
                    grace_wt=int(tail["writetime"].min()),
                )
        compact_lake(lake, only_tombstoned=True)  # post-stream: drop all
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake),
            oracle_final_state(full_df),
            check_dtype=False,
        )

    def test_graceless_midstream_compaction_diverges(self, tmp_path):
        """The documented hazard is real, and wider than whole-row
        resurrection: a dropped tombstone also loses per-CELL suppression
        state (del_wt), so a later batch's out-of-order old cell writes can
        surface on rows that legitimately survive.  Divergence is strictly
        additive in LWW terms — no newer value is ever lost — but rows and
        cells the delete should suppress reappear.  This pins the failure
        mode maintenance.py's docstring warns about; the companion test
        shows the contract-correct grace watermark prevents it."""
        full, segs = _segments()
        full_df = full.to_pandas()
        lake = str(tmp_path / "lake")
        for i, seg in enumerate(segs):
            replay(seg, lake, num_parts=8, salt=2)
            if i < len(segs) - 1:
                compact_lake(lake, only_tombstoned=True)  # grace None
        got = read_lake_pandas(lake)
        want = oracle_final_state(full_df)
        key = ["conv_id", "turn_idx"]
        # never loses keys the oracle keeps
        missing = want.merge(got[key], on=key, how="left", indicator=True)
        assert (missing["_merge"] == "both").all()
        # ...but resurrects keys/cells the delete should suppress
        extras = len(got) - len(want)
        assert extras >= 0
        diverged = extras > 0 or not got.merge(
            want, on=list(want.columns), how="inner"
        ).shape[0] == len(want)
        assert diverged, (
            "seed no longer exercises the graceless-compaction hazard; "
            "raise wt_jitter or p_delete"
        )
