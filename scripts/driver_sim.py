"""Simulate the correctness driver: plain SparkSession (none of our
builder confs), entry() smoke, then every queries()[name] vs
oracle_sql()[name] via DuckDB at sf0.01 — row count, column names,
order-insensitive value comparison. Exit 1 on any mismatch.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]

Optional trailing query names restrict the sweep (r16: fast parity
re-checks of just-touched queries during optimization; the full sweep
stays the gate before any commit claim).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            df[col] = df[col].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entry_mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        queries = {n: q for n, q in queries.items() if n in only}
    failures = []
    for name in sorted(queries):
        try:
            spark_pd = queries[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows)")
            continue
        duck_pd = con.execute(oracles[name]).df()
        status = []
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            status.append(
                f"cols spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
            )
        elif len(spark_pd) != len(duck_pd):
            status.append(f"rows spark={len(spark_pd)} duck={len(duck_pd)}")
        else:
            a, b = canonical(spark_pd), canonical(duck_pd)
            for col in a.columns:
                bad = [
                    (x, y)
                    for x, y in zip(a[col].tolist(), b[col].tolist())
                    if not values_equal(x, y)
                ]
                if bad:
                    status.append(f"{len(bad)} value mismatches in {col}: {bad[:2]}")
                    break
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(spark_pd)} rows match oracle")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries match at {sf_dir}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
