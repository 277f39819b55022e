"""Local mirror of the driver's correctness gate: run every queries() entry and
compare against its oracle_sql() twin via DuckDB (row count + schema + ordered
value equality after sorting columns by name and rows by all columns)."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as contract

SF_DIR = "/root/testdata/sf0.001"
# the cdc_* oracle SQL embeds the change-stream cache path for this sf
os.environ["GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    elif not isinstance(df, pd.DataFrame):  # Dataset
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort", ignore_index=True)


# the full gate surface: the 50-slot driver dict ∪ the pruned extras
# (no-oracle sketches + analytics variants) — pytest asserts everything
def _all_queries():
    return {**contract.queries(), **contract.queries_extra()}


def _all_oracles():
    return {**contract.oracle_sql(), **contract.oracle_sql_extra()}


ORACLE_KEYS = sorted(_all_oracles())


def test_driver_dict_is_within_harness_cap():
    """The correctness harness checks at most 50 queries in dict order; an
    oversized dict silently skips the tail (round-3 lesson).  Every driver
    entry must also be oracle-paired — rows-only gates live in the extras."""
    qs = contract.queries()
    assert len(qs) <= 50, f"queries() has {len(qs)} entries (harness cap 50)"
    missing = sorted(set(qs) - set(contract.oracle_sql()))
    assert not missing, f"driver queries without oracle SQL: {missing}"
    assert not set(qs) & set(contract.queries_extra())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(duck, name):
    q = _all_queries()[name]
    got = normalize(q(SF_DIR))
    want = normalize(duck.execute(_all_oracles()[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run():
    qs = _all_queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        out = qs[name](SF_DIR)
        out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
        assert out is not None and out.shape[1] > 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    out = contract.entry()
    assert len(out) > 0
    assert {"conv_id", "turn_idx", "text"} <= set(out.columns)


@pytest.mark.usefixtures("ray_session")
class TestSessionWindows:
    """Boundary semantics of gap-based sessionization: a gap EQUAL to the
    threshold stays in-session (strict >), per-user session ids restart at 1,
    and users hashed to different partitions never bleed into each other."""

    def _run(self, tmp_path, rows, gap_us):
        from cassandra_data_migrator_ray.pipelines.queries import session_windows

        df = pd.DataFrame(rows, columns=["user_id", "ts"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df.to_parquet(os.path.join(tmp_path, "events.parquet"))
        return session_windows(str(tmp_path), gap_us=gap_us)

    def test_gap_equal_threshold_same_session(self, tmp_path):
        out = self._run(tmp_path, [(1, 0), (1, 100), (1, 201)], gap_us=100)
        # 0→100 gap == 100 stays; 100→201 gap 101 > 100 splits
        assert out["session_id"].tolist() == [1, 2]
        assert out["n_events"].tolist() == [2, 1]
        assert out["session_start"].tolist() == [0, 201]
        assert out["session_end"].tolist() == [100, 201]

    def test_per_user_ids_restart_and_isolate(self, tmp_path):
        rows = [(7, 0), (7, 1000), (52, 10), (52, 500), (52, 5000)]
        out = self._run(tmp_path, rows, gap_us=100)
        by_user = {u: g for u, g in out.groupby("user_id")}
        assert by_user[7]["session_id"].tolist() == [1, 2]
        assert by_user[52]["session_id"].tolist() == [1, 2, 3]
        assert int(out["n_events"].sum()) == len(rows)

    def test_null_ts_rows_dropped(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import session_windows

        # oracle-parity: rows with null ts are excluded (ts IS NOT NULL)
        df = pd.DataFrame({"user_id": [1, 1, 1], "ts": [0.0, None, 1000.0]})
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df.to_parquet(os.path.join(tmp_path, "events.parquet"))
        out = session_windows(str(tmp_path), gap_us=100)
        assert int(out["n_events"].sum()) == 2
        assert out["session_id"].tolist() == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def _run(self, tmp_path, rows, window_us):
        from cassandra_data_migrator_ray.pipelines.queries import range_join_clicks

        df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df.to_parquet(os.path.join(tmp_path, "events.parquet"))
        return range_join_clicks(str(tmp_path), window_us=window_us)

    def test_window_boundaries_half_open(self, tmp_path):
        rows = [
            (1, 7, "click", 0),      # exactly ts - window → EXCLUDED
            (2, 7, "click", 1),      # inside
            (3, 7, "click", 100),    # exactly at purchase ts → INCLUDED
            (4, 7, "purchase", 100),
            (5, 7, "click", 101),    # after → excluded
            (6, 9, "purchase", 100), # other user: no clicks
        ]
        out = self._run(tmp_path, rows, window_us=100)
        got = dict(zip(out["event_id"], out["n_clicks"]))
        assert got == {4: 2, 6: 0}

    def test_empty_purchases_partition(self, tmp_path):
        rows = [(1, 7, "click", 10), (2, 7, "view", 20)]
        out = self._run(tmp_path, rows, window_us=100)
        assert len(out) == 0
        assert list(out.columns) == ["event_id", "user_id", "n_clicks"]


@pytest.mark.usefixtures("ray_session")
class TestTopkPerGroup:
    def test_tiebreak_and_short_groups(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import (
            topk_orders_per_customer,
        )

        df = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4, 5, 6],
                "o_custkey": [10, 10, 10, 10, 20, 20],
                "o_totalprice": [5.0, 9.0, 9.0, 1.0, 3.0, 3.0],
            }
        )
        df.to_parquet(os.path.join(tmp_path, "orders.parquet"))
        out = topk_orders_per_customer(str(tmp_path), k=3)
        c10 = out[out["o_custkey"] == 10]
        # ties on price broken by orderkey ASC: 9.0@2, 9.0@3, then 5.0@1
        assert c10["o_orderkey"].tolist() == [2, 3, 1]
        assert c10["rk"].tolist() == [1, 2, 3]
        c20 = out[out["o_custkey"] == 20]
        assert c20["o_orderkey"].tolist() == [5, 6]  # short group keeps all


class TestDiscQuantileSelection:
    def test_matches_duckdb_convention(self):
        import duckdb
        import numpy as np
        from cassandra_data_migrator_ray.pipelines.queries import (
            quantile_quantity_by_flag,  # noqa: F401  (import sanity)
        )

        # replicate the selection rule directly against duckdb on awkward n/q
        con = duckdb.connect()
        for n in (1, 2, 3, 7, 10, 33):
            vals = list(range(1, n + 1))
            for q in (0.1, 0.5, 0.9):
                want = con.execute(
                    f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest({vals}) AS x)"
                ).fetchone()[0]
                h = q * float(n)
                idx = int(np.floor(h))
                if float(idx) == h:
                    idx -= 1
                idx = max(idx, 0)
                assert vals[idx] == want, (n, q)


@pytest.mark.usefixtures("ray_session")
class TestNullAndEmptyParity:
    """Engine-vs-oracle agreement on the degenerate shapes the sf testdata
    never produces: rows with null user/ts/type, and inputs where the
    operator's filter leaves zero rows (map_groups then loses its schema)."""

    def _events(self, tmp_path, rows):
        df = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        df["event_id"] = df["event_id"].astype("int64")
        df["user_id"] = df["user_id"].astype("Int64")
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df["value"] = df["value"].astype("float64")
        df.to_parquet(os.path.join(tmp_path, "events.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        return con

    def _compare(self, con, name, got):
        want = normalize(con.execute(_all_oracles()[name]).df())
        got = normalize(got)
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_purchases_empty_results(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import (
            lag_purchase_delta,
            range_join_clicks,
        )

        con = self._events(
            tmp_path,
            [(1, 10, "click", 100, 1.0), (2, 10, "view", 200, 2.0)],
        )
        self._compare(con, "lag_purchase_delta", lag_purchase_delta(str(tmp_path)))
        self._compare(con, "range_join_clicks", range_join_clicks(str(tmp_path)))

    def test_all_null_ts_sessions_empty(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import session_windows

        con = self._events(
            tmp_path,
            [(1, 10, "click", None, 1.0), (2, None, "view", 100, 2.0)],
        )
        self._compare(con, "session_windows", session_windows(str(tmp_path)))

    def test_null_user_and_type_group_parity(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.queries import (
            collect_event_types,
            pivot_event_counts,
        )

        con = self._events(
            tmp_path,
            [
                (1, None, "click", 100, 1.0),
                (2, 7, None, 200, 2.0),
                (3, 7, "view", 300, 3.0),
                (4, 7, "click", 400, 4.0),
                (5, 8, None, 500, 5.0),
            ],
        )
        self._compare(con, "pivot_event_counts", pivot_event_counts(str(tmp_path)))
        self._compare(
            con, "collect_event_types", collect_event_types(str(tmp_path))
        )
