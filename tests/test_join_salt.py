"""Salted skew join: join_by_key(salt=N) vs a DuckDB oracle.

A pathologically hot key normally lands all its rows in one partition
(equal keys must co-locate).  salt=N splits the LEFT side's rows for
every key across N sub-buckets and replicates the RIGHT side N times, so
no partition holds more than ~1/N of the hot key's left rows.  Exactness
is preserved for inner/left by merging on (key, salt bucket); right/outer
are rejected (a replicated side cannot decide "unmatched" locally).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from cassandra_data_migrator_ray.pipelines.dataops import join_by_key


def _skewed():
    rng = np.random.default_rng(7)
    # 90% of left rows share key 0; the rest spread over 200 keys
    k = np.where(rng.random(20000) < 0.9, 0, rng.integers(1, 201, size=20000))
    l = pd.DataFrame({"k": k.astype(np.int64), "lv": np.arange(20000, dtype=np.int64)})
    r = pd.DataFrame(
        {
            "k": np.arange(0, 150, dtype=np.int64),  # keys 150..200 unmatched
            "rv": np.arange(1000, 1150, dtype=np.int64),
        }
    )
    return l, r


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_duckdb(ray_session, how):
    l, r = _skewed()
    got = (
        join_by_key(
            ray.data.from_pandas(l).repartition(6),
            ray.data.from_pandas(r).repartition(2),
            on="k",
            how=how,
            num_partitions=16,
            salt=8,
        )
        .to_pandas()
        .fillna(-1)
        .astype({"k": "int64", "lv": "int64", "rv": "int64"})
        .sort_values(["k", "lv"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    kind = "INNER" if how == "inner" else "LEFT"
    exp = (
        con.execute(f"SELECT l.k, l.lv, r.rv FROM l {kind} JOIN r ON l.k=r.k")
        .df()
        .fillna(-1)
        .astype({"k": "int64", "lv": "int64", "rv": "int64"})
        .sort_values(["k", "lv"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_salt_equals_unsalted(ray_session):
    l, r = _skewed()
    a = (
        join_by_key(
            ray.data.from_pandas(l), ray.data.from_pandas(r), on="k", salt=4
        )
        .to_pandas()
        .sort_values(["k", "lv"], ignore_index=True)
    )
    b = (
        join_by_key(ray.data.from_pandas(l), ray.data.from_pandas(r), on="k")
        .to_pandas()
        .sort_values(["k", "lv"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_salt_rejects_outer(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "x": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "y": [1]}))
    for how in ("right", "outer"):
        with pytest.raises(ValueError, match="salt"):
            join_by_key(l, r, on="k", how=how, salt=2)
