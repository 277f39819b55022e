"""Autocorrect convergence for the two hazards the round-1 review flagged:

1. A key tombstoned in the lake but present in expected must converge: the
   comparator keeps tombstone rows visible (side=2) so fix_wt beats the
   surviving tombstone's writetime, and the corrective upsert wins LWW.
2. Counter MISMATCH must be corrected with the DELTA expected − actual
   (reference TargetUpdateStatement.java:69-76), not the expected value
   replayed verbatim (which would fold additively to actual + expected).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas


@pytest.mark.usefixtures("ray_session")
class TestTombstonedKeyAutocorrect:
    @pytest.mark.parametrize("shuffle", ["staging", "groupby"])
    def test_tombstoned_key_converges(self, tmp_path, shuffle):
        """Replay ends with a DELETE for a key that expected says should
        exist; validate reports MISSING and autocorrect must produce a fix
        that beats the tombstone so a second validate is clean."""
        events = gen_change_stream(
            n_convs=20, n_events=1500, seed=91, p_delete=0.0
        ).to_pandas()
        expected = oracle_final_state(events)
        # append a late DELETE for the first expected key — the lake keeps a
        # tombstone (no compact), expected still holds the row
        k = expected.iloc[0]
        wt_max = int(events["writetime"].max())
        seq_max = int(events["event_seq"].max())
        tomb = pd.DataFrame(
            [
                {
                    "op": "DELETE",
                    "conv_id": k["conv_id"],
                    "turn_idx": np.int32(k["turn_idx"]),
                    "role": None,
                    "text": None,
                    "tool": None,
                    "ts": pd.NaT,
                    "writetime": np.int64(wt_max + 1000),
                    "event_seq": np.int64(seq_max + 1),
                }
            ]
        )
        stream = pd.concat([events, tomb], ignore_index=True)
        lake = str(tmp_path / "lake")
        replay(
            pa.Table.from_pandas(stream, preserve_index=False),
            lake,
            num_parts=4,
        )

        res = validate(expected, lake, shuffle=shuffle)
        assert not res.ok and res.counts["MISSING"] == 1
        # fix_wt must beat the tombstone's writetime
        assert int(res.report["fix_wt"].iloc[0]) > wt_max + 1000

        autocorrect(res, lake)
        res2 = validate(expected, lake, shuffle=shuffle)
        assert res2.ok, res2.counts

    def test_tombstone_only_key_is_not_extra(self, tmp_path):
        """A tombstoned key absent from expected is plain absence — validate
        must not report EXTRA for it."""
        events = gen_change_stream(
            n_convs=10, n_events=500, seed=17, p_delete=0.3
        )
        expected = oracle_final_state(events.to_pandas())
        lake = str(tmp_path / "lake")
        replay(events, lake, num_parts=4)  # tombstones retained (no compact)
        res = validate(expected, lake)
        assert res.ok, res.counts


@pytest.mark.usefixtures("ray_session")
class TestCounterAutocorrect:
    @pytest.mark.parametrize("shuffle", ["staging", "groupby"])
    def test_counter_mismatch_corrected_with_delta(self, tmp_path, shuffle):
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("n", pa.float64()),
            ]
        )

        def mk(rows, seq0):
            return pa.table(
                {
                    "op": pa.array(["UPSERT"] * len(rows)),
                    "conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "n": pa.array([float(r[2]) for r in rows], pa.float64()),
                    "writetime": pa.array(
                        range(seq0, seq0 + len(rows)), pa.int64()
                    ),
                    "event_seq": pa.array(
                        range(seq0, seq0 + len(rows)), pa.int64()
                    ),
                }
            )

        lake = str(tmp_path / "lake")
        replay(
            mk([("a", 0, 3.0), ("a", 0, 4.0), ("b", 0, 10.0)], 0),
            lake,
            num_parts=2,
            payload_schema=schema,
            counter_cols=("n",),
        )
        # lake now holds a=7, b=10; expected says a=20, b=10, c=5 (missing)
        expected = pd.DataFrame(
            {
                "conv_id": ["a", "b", "c"],
                "turn_idx": np.array([0, 0, 0], dtype=np.int32),
                "n": [20.0, 10.0, 5.0],
            }
        )
        res = validate(expected, lake, shuffle=shuffle)
        assert res.counts["MISMATCH"] == 1 and res.counts["MISSING"] == 1

        autocorrect(res, lake)
        got = (
            read_lake_pandas(lake)
            .set_index(["conv_id", "turn_idx"])["n"]
            .sort_index()
        )
        # delta semantics: a := 7 + (20-7) = 20, NOT 7 + 20 = 27
        assert float(got.loc[("a", 0)]) == 20.0
        assert float(got.loc[("b", 0)]) == 10.0
        assert float(got.loc[("c", 0)]) == 5.0
        res2 = validate(expected, lake, shuffle=shuffle)
        assert res2.ok, res2.counts
