"""join_by_key: generic co-partitioned shuffle join vs a DuckDB oracle.

Covers inner/left/right/outer, duplicate keys (cartesian per key), SQL
null-key semantics (never matches; outer keeps the row), multi-column
keys, key dtype casting (int32 right vs int64 left), overlapping column
suffixing, and the scale posture (both sides partitioned, no driver rows).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from cassandra_data_migrator_ray.pipelines.dataops import join_by_key


def _left_df():
    return pd.DataFrame(
        {
            "k": pd.array([1, 2, 2, 3, None, 5], dtype="Int64"),
            "lx": ["a", "b", "c", "d", "e", "f"],
            "v": pd.array([10, 20, 21, 30, 40, 50], dtype="Int64"),
        }
    )


def _right_df():
    return pd.DataFrame(
        {
            "k": pd.array([2, 2, 3, 4, None], dtype="Int64"),
            "ry": ["x", "y", "z", "w", "n"],
            "v": pd.array([200, 201, 300, 400, 500], dtype="Int64"),
        }
    )


def _oracle(how: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("l", _left_df())
    con.register("r", _right_df())
    kind = {"inner": "INNER", "left": "LEFT", "right": "RIGHT", "outer": "FULL"}[how]
    q = f"""
        SELECT l.k AS k, l.lx AS lx, l.v AS v, r.ry AS ry, r.v AS v_r,
               r.k AS rk
        FROM l {kind} JOIN r ON l.k = r.k
    """
    out = con.execute(q).df()
    # RIGHT/FULL rows missing on the left have a null l.k — recover the key
    # from the right side so the frame matches join_by_key's single key col.
    out["k"] = out["k"].fillna(out["rk"])
    return out.drop(columns=["rk"])


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("k", "v", "v_r"):
        df[c] = pd.array(df[c], dtype="Int64")
    for c in ("lx", "ry"):
        df[c] = df[c].astype(object).where(df[c].notna(), None)
    return (
        df[["k", "lx", "v", "ry", "v_r"]]
        .sort_values(["k", "lx", "v", "ry", "v_r"], na_position="last")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_join_matches_duckdb(ray_session, how):
    import pyarrow as pa

    l = ray.data.from_arrow(pa.Table.from_pandas(_left_df())).repartition(3)
    r = ray.data.from_arrow(pa.Table.from_pandas(_right_df())).repartition(2)
    got = join_by_key(l, r, on="k", how=how, num_partitions=4).to_pandas()
    assert list(got.columns) == ["k", "lx", "v", "ry", "v_r"]
    pd.testing.assert_frame_equal(_normalize(got), _normalize(_oracle(how)))


def test_multi_key_and_dtype_cast(ray_session):
    l = pd.DataFrame(
        {
            "a": np.array([1, 1, 2, 2], dtype=np.int64),
            "b": ["p", "q", "p", "q"],
            "lv": [1.5, 2.5, 3.5, 4.5],
        }
    )
    r = pd.DataFrame(
        {
            # int32 key on the right: join_by_key casts to the left's int64
            "a": np.array([1, 2, 2], dtype=np.int32),
            "b": ["q", "p", "z"],
            "rv": [10, 20, 30],
        }
    )
    got = join_by_key(
        ray.data.from_pandas(l),
        ray.data.from_pandas(r),
        on=["a", "b"],
        how="inner",
        num_partitions=3,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    exp = con.execute(
        "SELECT l.a, l.b, l.lv, r.rv FROM l JOIN r ON l.a=r.a AND l.b=r.b"
    ).df()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
    assert got["a"].tolist() == exp["a"].tolist()
    assert got["b"].tolist() == exp["b"].tolist()
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].tolist() == exp["rv"].tolist()
    assert str(got["a"].dtype) in ("int64", "Int64")


def test_overlap_suffix_and_string_keys(ray_session):
    l = pd.DataFrame({"name": ["ann", "bob", "cal"], "score": [1, 2, 3]})
    r = pd.DataFrame({"name": ["bob", "cal", "dee"], "score": [20, 30, 40]})
    ds = join_by_key(
        ray.data.from_pandas(l),
        ray.data.from_pandas(r),
        on="name",
        how="inner",
        num_partitions=2,
    )
    got = ds.to_pandas().sort_values("name").reset_index(drop=True)
    assert list(got.columns) == ["name", "score", "score_r"]
    assert got["name"].tolist() == ["bob", "cal"]
    assert got["score"].tolist() == [2, 3]
    assert got["score_r"].tolist() == [20, 30]


def test_duplicate_keys_cartesian(ray_session):
    l = pd.DataFrame({"k": [7] * 3, "li": [0, 1, 2]})
    r = pd.DataFrame({"k": [7] * 4, "ri": [0, 1, 2, 3]})
    got = join_by_key(
        ray.data.from_pandas(l),
        ray.data.from_pandas(r),
        on="k",
        num_partitions=2,
    ).to_pandas()
    assert len(got) == 12  # 3 x 4 per-key cartesian, SQL semantics
    assert sorted(set(map(tuple, got[["li", "ri"]].values.tolist()))) == [
        (i, j) for i in range(3) for j in range(4)
    ]


def test_bad_args(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "x": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "y": [1]}))
    with pytest.raises(ValueError, match="how"):
        join_by_key(l, r, on="k", how="cross")
    with pytest.raises(ValueError, match="missing"):
        join_by_key(l, r, on="zzz")


def test_randomized_outer_vs_duckdb(ray_session):
    rng = np.random.default_rng(42)
    l = pd.DataFrame(
        {
            "k": rng.integers(0, 800, size=5000),
            "lv": rng.integers(0, 10**9, size=5000),
        }
    )
    r = pd.DataFrame(
        {
            "k": rng.integers(400, 1200, size=3000),
            "rv": rng.integers(0, 10**9, size=3000),
        }
    )
    got = (
        join_by_key(
            ray.data.from_pandas(l).repartition(7),
            ray.data.from_pandas(r).repartition(5),
            on="k",
            how="outer",
            num_partitions=16,
        )
        .to_pandas()
        .fillna(-1)
        .astype({"k": "int64", "lv": "int64", "rv": "int64"})
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    exp = (
        con.execute(
            "SELECT coalesce(l.k, r.k) AS k, l.lv AS lv, r.rv AS rv "
            "FROM l FULL JOIN r ON l.k = r.k"
        )
        .df()
        .fillna(-1)
        .astype({"k": "int64", "lv": "int64", "rv": "int64"})
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_timestamp_and_multibatch_null_keys(ray_session):
    # temporal keys exercise the int64-cast hash branch; the null key
    # appears in one batch only, so dtype-canonical hashing across batches
    # is what keeps equal keys co-partitioned
    ts = pd.to_datetime(
        ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-02", None]
    )
    l = pd.DataFrame({"t": ts, "lv": [1, 2, 3, 4, 5]})
    r = pd.DataFrame({"t": ts[[1, 2]], "rv": [20, 30]})
    got = (
        join_by_key(
            ray.data.from_pandas(l).repartition(3),
            ray.data.from_pandas(r),
            on="t",
            how="left",
            num_partitions=4,
        )
        .to_pandas()
        .fillna({"rv": -1})
        .astype({"lv": "int64", "rv": "int64"})
        .sort_values(["lv"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    exp = (
        con.execute("SELECT l.t, l.lv, r.rv FROM l LEFT JOIN r ON l.t = r.t")
        .df()
        .fillna({"rv": -1})
        .astype({"lv": "int64", "rv": "int64"})
        .sort_values(["lv"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["t", "lv", "rv"]], exp[["t", "lv", "rv"]])


def test_date32_key(ray_session):
    """date32 keys route through the int32-storage hash path (pyarrow has
    no direct date32→int64 cast) — a date-keyed join must not crash and
    must match the SQL result."""
    import datetime
    import pyarrow as pa

    d1, d2, d3 = (datetime.date(2024, 1, i) for i in (1, 2, 3))
    l = pa.table({"d": pa.array([d1, d2, d3, None], pa.date32()),
                  "lv": [1, 2, 3, 4]})
    r = pa.table({"d": pa.array([d2, d3, d3], pa.date32()),
                  "rv": [20, 30, 31]})
    got = join_by_key(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        on="d", how="inner", num_partitions=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", l.to_pandas())
    con.register("r", r.to_pandas())
    exp = con.execute(
        "SELECT l.d, l.lv, r.rv FROM l JOIN r ON l.d = r.d"
    ).df()
    got = got.sort_values(["d", "rv"]).reset_index(drop=True)
    exp = exp.sort_values(["d", "rv"]).reset_index(drop=True)
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].tolist() == exp["rv"].tolist()


def test_float_key_signed_zero_and_nan(ray_session):
    """+0.0 and -0.0 are equal keys (SQL and pandas agree) — they must
    hash to the same partition; all NaN bit patterns likewise route
    together (pandas factorizes every NaN equal within a partition)."""
    import pyarrow as pa

    # forge a non-canonical NaN bit pattern to prove routing canonicalizes;
    # build via pyarrow so NaN stays a VALUE (from_pandas turns NaN into an
    # Arrow null, which is SQL-null and never matches — a different case)
    weird_nan = np.frombuffer(
        np.uint64(0x7FF8000000000001).tobytes(), dtype=np.float64
    )[0]
    l = pa.table({"k": pa.array(np.array([0.0, np.nan, 1.5])), "lv": [1, 2, 3]})
    r = pa.table(
        {"k": pa.array(np.array([-0.0, weird_nan, 1.5])), "rv": [10, 20, 30]}
    )
    got = (
        join_by_key(
            ray.data.from_arrow(l), ray.data.from_arrow(r),
            on="k", how="inner", num_partitions=8,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    # 0.0 matches -0.0, NaN matches NaN (pandas merge semantics), 1.5 matches
    assert got["lv"].tolist() == [1, 2, 3]
    assert got["rv"].tolist() == [10, 20, 30]
