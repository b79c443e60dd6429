"""Emulate the driver's correctness gate locally.

Runs each registered query on a VANILLA SparkSession (no engine session
factory — same as the driver's harness) and its DuckDB oracle twin at the
given sf dir, then compares row count, sorted column set, and normalized
values. Usage:

    python tools/drivercheck.py [sf_dir] [key ...]

With no keys, checks every registered query.
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drivercheck")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {key}: {type(exc).__name__}: {exc}")
            failed.append(key)
            continue
        if key not in oracles:
            print(f"ROWS {key}: {len(srows)} rows (no oracle)")
            continue
        rel = con.sql(oracles[key])
        dcols = rel.columns
        drows = rel.fetchall()
        dt = time.time() - t0
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {key}: columns {sorted(scols)} vs {sorted(dcols)}")
            failed.append(key)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {key}: rows {len(srows)} vs {len(drows)}")
            failed.append(key)
            continue
        a = normalize(srows, scols)
        b = normalize(drows, dcols)
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            for va, vb in zip(ra, rb):
                if not values_equal(va, vb):
                    bad = (i, ra, rb)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {key}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            failed.append(key)
        else:
            print(f"PASS {key}: {len(srows)} rows in {dt:.1f}s")
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL PASS'}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
