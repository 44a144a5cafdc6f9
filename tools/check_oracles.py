"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, comparing row count, sorted column names, and an
order-insensitive stringified-value multiset. Usage:

    python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as E
from hk_housing_datahub_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(norm_cell(r[c]) for c in cols) for _, r in df.iterrows()
    ]
    return sorted(rows)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(cores=int(os.environ.get("CORES", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"[SPARK-FAIL] {name}: {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if sql is None:
            print(f"[rows-only ] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as ex:
            failures.append(name)
            print(f"[DUCK-FAIL ] {name}: {str(ex)[:300]}")
            continue
        ok_count = len(sdf) == len(ddf)
        ok_schema = sorted(sdf.columns) == sorted(ddf.columns)
        ok_vals = False
        if ok_count and ok_schema:
            a, b = canon_rows(sdf), canon_rows(ddf)
            ok_vals = a == b
            if not ok_vals:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"[VAL-DIFF  ] {name}: first diffs {diffs}")
        status = "OK" if (ok_count and ok_schema and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
            print(
                f"[{status}] {name}: rows {len(sdf)}/{len(ddf)} "
                f"schema_ok={ok_schema} cols spark={sorted(sdf.columns)} "
                f"duck={sorted(ddf.columns)}"
            )
        else:
            print(f"[OK        ] {name}: {len(sdf)} rows")
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
