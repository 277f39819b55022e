"""VECTOR payload end-to-end (reference data/CqlData.java:36-38 VECTOR, SIT
smoke/06_vector; SURVEY §1.3 maps CQL VECTOR → Arrow fixed_size_list<float32>):
a fixed-size-list embedding column must survive replay → LWW fold (fresh AND
incremental) → validate → autocorrect → point lookup with exact element-wise
equality, including the null-means-unset upsert rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import lookup, read_lake_pandas

DIM = 8
VEC = pa.list_(pa.float32(), DIM)  # fixed_size_list<float32, 8>


def _vec(seed: int) -> list[float]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal(DIM).astype(np.float32).tolist()


def _events(rows: list[tuple]) -> pa.Table:
    """rows: (conv_id, turn_idx, op, vec_or_None, label_or_None, wt, seq)."""
    return pa.table(
        {
            "op": pa.array([r[2] for r in rows], pa.string()),
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "embedding": pa.array([r[3] for r in rows], VEC),
            "label": pa.array([r[4] for r in rows], pa.string()),
            "writetime": pa.array([r[5] for r in rows], pa.int64()),
            "event_seq": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("embedding", VEC),
        ("label", pa.string()),
    ]
)


@pytest.mark.usefixtures("ray_session")
class TestVectorPayload:
    def test_replay_fold_lookup(self, tmp_path):
        lake = str(tmp_path / "lake")
        v1, v2, v3 = _vec(1), _vec(2), _vec(3)
        ev = _events(
            [
                ("a", 0, "UPSERT", v1, "x", 10, 1),
                ("a", 0, "UPSERT", v2, None, 20, 2),  # newer vector wins
                ("a", 1, "UPSERT", v3, "y", 10, 3),
                ("b", 0, "UPSERT", v1, "z", 10, 4),
                ("b", 0, "UPSERT", None, "z2", 20, 5),  # null = unset keeps v1
                ("c", 0, "UPSERT", v3, "w", 10, 6),
                ("c", 0, "DELETE", None, None, 30, 7),  # tombstone
            ]
        )
        replay(ev, lake, num_parts=4, payload_schema=SCHEMA)
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        assert list(got.index) == [("a", 0), ("a", 1), ("b", 0)]
        np.testing.assert_allclose(got.loc[("a", 0), "embedding"], v2)
        np.testing.assert_allclose(got.loc[("b", 0), "embedding"], v1)  # unset kept
        assert got.loc[("b", 0), "label"] == "z2"

        # incremental batch: overwrite one vector, resurrect the deleted key
        v4 = _vec(4)
        ev2 = _events(
            [
                ("a", 0, "UPSERT", v4, None, 40, 8),
                ("c", 0, "UPSERT", v4, "w2", 40, 9),
            ]
        )
        replay(ev2, lake, num_parts=4)
        got2 = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        np.testing.assert_allclose(got2.loc[("a", 0), "embedding"], v4)
        np.testing.assert_allclose(got2.loc[("c", 0), "embedding"], v4)
        assert got2.loc[("c", 0), "label"] == "w2"

        # point lookup returns the vector intact
        hit = lookup(lake, ["a"])
        hit = hit[hit["turn_idx"] == 0]
        np.testing.assert_allclose(hit["embedding"].iloc[0], v4)

    def test_validate_and_autocorrect_vectors(self, tmp_path):
        """The comparator's list-equality fallback must flag a differing
        vector (and only that), and autocorrect must converge it."""
        lake = str(tmp_path / "lake")
        v1, v2 = _vec(5), _vec(6)
        ev = _events(
            [
                ("a", 0, "UPSERT", v1, "x", 10, 1),
                ("b", 0, "UPSERT", v2, "y", 10, 2),
            ]
        )
        replay(ev, lake, num_parts=2, payload_schema=SCHEMA)

        expected = pa.table(
            {
                "conv_id": pa.array(["a", "b"], pa.string()),
                "turn_idx": pa.array([0, 0], pa.int32()),
                "embedding": pa.array([_vec(7), v2], VEC),  # a differs
                "label": pa.array(["x", "y"], pa.string()),
            }
        )
        res = validate(expected, lake)
        assert res.counts["MISMATCH"] == 1 and res.counts["VALID"] == 1
        bad = res.report
        assert list(bad["conv_id"]) == ["a"]
        assert "embedding" in bad["cols_differ"].iloc[0]

        autocorrect(res, lake)
        res2 = validate(expected, lake)
        assert res2.counts["MISMATCH"] == 0 and res2.counts["VALID"] == 2
        got = read_lake_pandas(lake).set_index(["conv_id", "turn_idx"])
        np.testing.assert_allclose(got.loc[("a", 0), "embedding"], _vec(7))
