"""Mini oracle harness mirroring the driver's compare: run a Spark query and
its DuckDB SQL twin, sort columns by name and rows by value, compare."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def normalize(rows, columns):
    """Rows → list of tuples ordered by sorted column name, then sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if isinstance(v, Decimal):
            return float(v)
        if isinstance(v, datetime):
            return v.replace(tzinfo=None).isoformat()
        if isinstance(v, date):
            return v.isoformat()
        if isinstance(v, float):
            return v
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def assert_matches_oracle(spark_df, duck_con, sql, float_tol=0.0):
    sdf = spark_df
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck_con.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    a = normalize(srows, scols)
    b = normalize(drows, dcols)
    assert len(a) == len(b), f"row counts differ: spark={len(a)} duck={len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                assert abs(va - vb) <= float_tol * max(1.0, abs(vb)), (
                    f"row {i}: {va} != {vb}\nspark={ra}\nduck ={rb}"
                )
            else:
                assert va == vb, f"row {i}: {va!r} != {vb!r}\nspark={ra}\nduck ={rb}"
