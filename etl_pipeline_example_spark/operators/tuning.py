"""LSH band-configuration S-curve: the MinHash design table.

The companion to ``minhash_calibration``: before trusting a (bands,
rows) configuration you read its S-curve — the probability
p(s) = 1 − (1 − s^r)^b that a pair with true Jaccard s becomes an LSH
candidate. This emits that table for the engine's actual configuration
(b = ``MH_BANDS``, r = ``MH_ROWS``) over a 0.05-step similarity grid,
plus each point's distance to the τ threshold, so the curve's
steepness around τ is read straight off the result.

Exactness: s^r and (1−x)^b are evaluated as EXPLICIT repeated IEEE
multiplications (not pow(), whose libm rounding differs across
engines) over exactly-representable grid values (k/20 → k·0.05 with
identical literals), so the whole table matches the oracle bit-for-bit
with no rounding step.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 22b.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import MH_BANDS, MH_ROWS, MH_TAU


def _pow_expr(base: str, exp: int) -> str:
    """Explicit repeated multiplication — identical IEEE op sequence in
    both engines (left-assoc chain)."""
    return "(" + " * ".join([base] * exp) + ")"


def minhash_tune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, p_candidate, above_tau): the S-curve of the configured
    (bands, rows) over s = 0.05 .. 0.95.

    Scale shape: a 19-row generated spine — the operator is a design
    table, not a data scan; sf_dir is unused beyond the uniform
    signature.
    """
    sr = _pow_expr("s", MH_ROWS)
    curve = f"1.0 - {_pow_expr(f'(1.0 - {sr})', MH_BANDS)}"
    return (
        spark.range(1, 20)
        .select(F.expr("cast(id as double) * 0.05").alias("s"))
        .select(
            "s",
            F.expr(curve).alias("p_candidate"),
            F.expr(f"s >= {MH_TAU}").alias("above_tau"),
        )
        .orderBy("s")
    )


_SR = _pow_expr("s", MH_ROWS)
_CURVE = f"1.0 - {_pow_expr(f'(1.0 - {_SR})', MH_BANDS)}"

MINHASH_TUNE_SQL = f"""
SELECT s, {_CURVE} AS p_candidate, s >= {MH_TAU} AS above_tau
FROM (SELECT cast(i AS double) * 0.05 AS s
      FROM (SELECT unnest(range(1, 20)) AS i))
ORDER BY s
"""


TUNING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "minhash_tune": minhash_tune,
}

TUNING_ORACLES: dict[str, str] = {
    "minhash_tune": MINHASH_TUNE_SQL,
}
