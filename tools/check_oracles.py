"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir, compare row count + column names + order-insensitive
value multiset. Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from logstash_integration_jdbc_spark.session import get_spark
from logstash_integration_jdbc_spark.sources.scan import TESTDATA_TABLES


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows):7d} rows  ({spark_t:.1f}s)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_rows = a == b
        status = "OK " if (ok_cols and ok_rows) else "FAIL"
        print(f"  {name:28s} {status} spark={len(srows):6d} duck={len(drows):6d} ({spark_t:.1f}s)")
        if not ok_cols:
            failures += 1
            print(f"      cols spark={sorted(scols)} duck={sorted(dcols)}")
        elif not ok_rows:
            failures += 1
            sa, sb = set(a), set(b)
            print(f"      only-spark: {list(sa - sb)[:3]}")
            print(f"      only-duck : {list(sb - sa)[:3]}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
