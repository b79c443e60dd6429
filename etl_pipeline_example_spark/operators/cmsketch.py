"""Count-Min Sketch heavy-hitter estimation over the event stream.

The CMS (Cormode & Muthukrishnan '05) is the canonical bounded-memory
frequency sketch: D independent hash rows of W counters; every
occurrence increments one counter per row; the estimate for a key is
the MIN over its D counters — never an undercount, overcounting only
by collision mass. At 100 TB it is THE structure for "how often does
each of these keys occur" without a key-cardinality-sized state, and
its counters MERGE by addition, which is exactly what a map-side
combined ``groupBy`` does — the distributed build below IS the merge
discipline.

This operator builds a (D=4) × (W=64) sketch over per-user event
occurrences, then reports the exact top-K users alongside their
sketch estimates: ``(user_id, exact_n, cms_n, overcount)``. The W=64
width is deliberately small relative to the user cardinality so
collisions genuinely occur at every graded scale and the
``overcount ≥ 0`` contract is exercised rather than vacuous (the
benchmark-regime honesty rule). All arithmetic is integer counting;
the D hash rows come from the shared cross-engine md5 construct
(``spark_hexint``/``duck_hexint``) keyed ``cms<j>:<user_id>``, so the
DuckDB oracle rebuilds the identical sketch.

Scale shape: the sketch build is one explode(D) + map-side-combined
aggregate whose OUTPUT is D·W = 256 rows regardless of input size
(the whole point of a sketch); exact top-K is one aggregate +
TakeOrderedAndProject; the estimate probe joins K·D rows against the
256-row counter table. Nothing key-cardinality-sized ever shuffles
except the one exact top-K aggregate this diagnostic deliberately
compares against.

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

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row
CMS_K = 10  # heavy hitters reported


def _spark_slot(j: str, key: str) -> str:
    h = spark_hexint(
        f"concat('cms', cast({j} as string), ':', cast({key} as string))"
    )
    return f"pmod({h}, {CMS_W})"


def _duck_slot(j: str, key: str) -> str:
    h = duck_hexint(f"concat('cms', {j}, ':', {key})")
    return f"({h} % {CMS_W})"


def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, exact_n, cms_n, overcount): exact top-K users by
    event count with their Count-Min estimates; cms_n ≥ exact_n always,
    equality iff no colliding key in any of the D rows."""
    ev = read_table(spark, sf_dir, "events").select("user_id")
    js = F.array(*[F.lit(j) for j in range(CMS_D)])
    counters = (
        ev.withColumn("j", F.explode(js))
        .select("j", F.expr(_spark_slot("j", "user_id")).alias("slot"))
        .groupBy("j", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(CMS_K)
    )
    est = (
        topk.withColumn("j", F.explode(js))
        .select(
            "user_id",
            "exact_n",
            "j",
            F.expr(_spark_slot("j", "user_id")).alias("slot"),
        )
        .join(F.broadcast(counters), ["j", "slot"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.col("exact_n").desc(), F.col("user_id").asc())


_JS = ", ".join(f"({j})" for j in range(CMS_D))

SKETCH_CMS_TOPK_SQL = f"""
WITH counters AS (
  SELECT t.j, {_duck_slot("t.j", "e.user_id")} AS slot,
         count(*) AS cnt
  FROM events e CROSS JOIN (VALUES {_JS}) t(j)
  GROUP BY 1, 2
),
topk AS (
  SELECT user_id, count(*) AS exact_n
  FROM events GROUP BY 1
  ORDER BY exact_n DESC, user_id ASC LIMIT {CMS_K}
),
est AS (
  SELECT k.user_id, k.exact_n, min(c.cnt) AS cms_n
  FROM topk k CROSS JOIN (VALUES {_JS}) t(j)
  JOIN counters c
    ON c.j = t.j AND c.slot = {_duck_slot("t.j", "k.user_id")}
  GROUP BY 1, 2
)
SELECT user_id, exact_n, cms_n, cms_n - exact_n AS overcount
FROM est
ORDER BY exact_n DESC, user_id ASC
"""


CMSKETCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sketch_cms_topk": sketch_cms_topk,
}

CMSKETCH_ORACLES: dict[str, str] = {
    "sketch_cms_topk": SKETCH_CMS_TOPK_SQL,
}
