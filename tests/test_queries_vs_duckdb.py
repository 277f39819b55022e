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


ORACLE_KEYS = sorted(contract.oracle_sql())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(duck, name):
    q = contract.queries()[name]
    got = normalize(q(SF_DIR))
    want = normalize(duck.execute(contract.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run():
    qs = contract.queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        out = qs[name](SF_DIR)
        out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
        assert out is not None and out.shape[1] > 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    out = contract.entry()
    assert len(out) > 0
    assert {"conv_id", "turn_idx", "text"} <= set(out.columns)
