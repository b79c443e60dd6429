"""HyperLogLog register construction, integer-exact and mergeable.

The sketch family's cardinality member: bloom gates membership
(``contamination_bloom``), CMS estimates frequency
(``sketch_cms_topk``), HLL estimates DISTINCT counts — and the part
of HLL that matters operationally is the REGISTER TABLE, because
registers are the mergeable state (element-wise max) that lets a
1000-executor cluster union cardinalities without moving keys. This
operator builds the registers exactly:

- 60-bit shared md5 hash of the key; low ``HLL_P`` bits pick the
  register, the remaining ``HLL_Q`` = 54 bits carry the rank pattern;
- rho = leading zeros of the pattern within the Q-bit field + 1 —
  computed WITHOUT log or bit tricks via the broadcast powers-of-two
  LADDER join (the knnjoin derived-bits VALUES precedent): bitlen(w)
  is the smallest b with w < 2^b, exact integers in both engines;
- register value M_r = max(rho) per register (integer max — the merge
  operation itself), alongside the exact per-register key count as
  the collision diagnostic.

The float estimator (alpha·m²/Σ2^-M) is deliberately NOT emitted —
it is one driver-side formula away for a consumer, and emitting it
would smuggle data-dependent float summation past the house exactness
rules. The registers ARE the sketch; the oracle rebuilds them
bit-identically.

Scale: one explode-free pass (one hash per key occurrence), map-side
combined max/count per register — output is 2^P rows regardless of
input; the ladder join is a 55-row broadcast.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-15 grading window — first driver slot
round 16.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

HLL_P = 6  # 2^6 = 64 registers
HLL_Q = 54  # pattern bits (60-bit hash minus P)
_M = 1 << HLL_P

# bitlen ladder: smallest b with w < 2^b, b in 0..HLL_Q
_LADDER = ", ".join(f"({b}, {1 << b})" for b in range(HLL_Q + 1))


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(register, reg_val, n_keys): the exact HLL register table over
    distinct event users — reg_val = max rho per register (the
    mergeable state), n_keys = distinct (register, rho-pattern) hash
    cells per register — full-hash collisions conflate keys, so this
    counts cells, not raw keys (both engines agree on the same cells)."""
    keys = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            F.expr(
                spark_hexint("concat('hll:', cast(user_id as string))")
            ).alias("h")
        )
        .select(
            F.expr(f"pmod(h, {_M})").alias("register"),
            F.expr(f"h div {_M}").alias("w"),
        )
    )
    ladder = F.broadcast(
        spark.createDataFrame(
            [(b, 1 << b) for b in range(HLL_Q + 1)], "b int, cap bigint"
        )
    )
    rho = (
        keys.join(ladder, F.col("w") < F.col("cap"))
        .groupBy("register", "w")
        .agg(F.min("b").alias("bitlen"))
        .select(
            "register", (F.lit(HLL_Q) - F.col("bitlen") + 1).alias("rho")
        )
    )
    return (
        rho.groupBy("register")
        .agg(
            F.max("rho").alias("reg_val"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .orderBy("register")
    )


SKETCH_HLL_REGISTERS_SQL = f"""
WITH keys AS (
  SELECT {duck_hexint("concat('hll:', user_id)")} AS h
  FROM (SELECT DISTINCT user_id FROM events)
),
split AS (
  SELECT h % {_M} AS register, h // {_M} AS w FROM keys
),
rho AS (
  SELECT register, {HLL_Q} - min(t.b) + 1 AS rho
  FROM split JOIN (VALUES {_LADDER}) t(b, cap) ON split.w < t.cap
  GROUP BY register, w
)
SELECT register, cast(max(rho) AS bigint) AS reg_val,
       count(*) AS n_keys
FROM rho GROUP BY 1 ORDER BY 1
"""


HLL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sketch_hll_registers": sketch_hll_registers,
}

HLL_ORACLES: dict[str, str] = {
    "sketch_hll_registers": SKETCH_HLL_REGISTERS_SQL,
}
