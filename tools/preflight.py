"""Driver-sim pre-flight: run every ``queries()`` entry against its
``oracle_sql()`` twin at one sf dir and report rows / schema / value matches.

Mirrors the correctness harness contract (CORRECTNESS_r*.json): for each
query the Ray result and the DuckDB oracle are compared on row count, on the
sorted column-name set, and on value equality after sorting columns by name
and rows by every column.  Queries without an oracle get a rows-only check.

Usage:
    python tools/preflight.py [sf_dir] [--names a,b,c] [--extra]

Owns its Ray session (scripts own sessions; the library never calls
ray.init).  Exit code 0 iff every checked query is green.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _canon(df):
    """Sort columns by name, rows by every column, as the driver does."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unhashable cells (lists/arrays/dicts) -> stable string key
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: json.dumps(v, sort_keys=True, default=str)
                if isinstance(v, (list, dict))
                else (v.tolist() if hasattr(v, "tolist") else v)
            )
            df[c] = df[c].map(
                lambda v: json.dumps(v, default=str) if isinstance(v, list) else v
            )
    try:
        df = df.sort_values(list(df.columns), kind="mergesort")
    except TypeError:
        df = df.sort_values(
            list(df.columns), kind="mergesort", key=lambda s: s.astype(str)
        )
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    import numpy as np
    import pandas as pd

    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        va, vb = a[c], b[c]
        if pd.api.types.is_float_dtype(va) or pd.api.types.is_float_dtype(vb):
            fa = va.astype(float).to_numpy()
            fb = vb.astype(float).to_numpy()
            ok = np.isclose(fa, fb, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not ok.all():
                return False
        else:
            na, nb = pd.isna(va).to_numpy(), pd.isna(vb).to_numpy()
            if (na != nb).any():
                return False
            sa = va[~na].astype(str).to_numpy()
            sb = vb[~nb].astype(str).to_numpy()
            if not (sa == sb).all():
                return False
    return True


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    only: set[str] | None = None
    include_extra = False
    for i, a in enumerate(argv):
        if a == "--extra":
            include_extra = True
        elif a == "--names":
            only = set(argv[i + 1].split(","))
        elif not a.startswith("--") and (only is None or a not in only):
            if os.path.isdir(a):
                sf_dir = a

    # CDC oracles build their change-stream glob from this env var; pin it to
    # the sf dir under test BEFORE importing __ray_entry__.
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = dict(e.queries())
    oracles = dict(e.oracle_sql())
    if include_extra:
        qs.update(e.queries_extra())
        oracles.update(e.oracle_sql_extra())
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 2
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    report: dict[str, dict] = {}
    n_green = n_rows_only = n_red = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        row: dict = {}
        try:
            res = _to_pandas(fn(sf_dir))
            row["spark_rows"] = int(len(res))
            sql = oracles.get(name)
            if sql is None:
                row.update(rows_match=None, schema_match=None, hash_match=None,
                           oracle_rows=None, err="no_oracle")
                n_rows_only += 1
            else:
                exp = con.execute(sql).fetchdf()
                row["oracle_rows"] = int(len(exp))
                row["rows_match"] = len(res) == len(exp)
                row["schema_match"] = sorted(res.columns) == sorted(exp.columns)
                ca, cb = _canon(res), _canon(exp)
                row["hash_match"] = bool(
                    row["rows_match"] and row["schema_match"]
                    and _values_equal(ca, cb)
                )
                row["err"] = None
                if row["hash_match"]:
                    n_green += 1
                else:
                    n_red += 1
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            row.update(rows_match=False, schema_match=False, hash_match=False,
                       err=f"{type(ex).__name__}: {ex}")
            n_red += 1
        row["wall_s"] = round(time.perf_counter() - t0, 2)
        report[name] = row
        flag = ("OK " if row.get("hash_match")
                else ("ro " if row.get("err") == "no_oracle" else "RED"))
        print(f"{flag} {name:34s} rows={row.get('spark_rows')} "
              f"wall={row['wall_s']}s"
              + (f" err={row['err']}" if row.get("err") not in (None, "no_oracle") else ""),
              flush=True)

    out = os.environ.get("PREFLIGHT_OUT", "/tmp/preflight.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{n_green} green / {n_rows_only} rows-only / {n_red} red "
          f"of {len(qs)} at {sf_dir} -> {out}")
    ray.shutdown()
    return 0 if n_red == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
