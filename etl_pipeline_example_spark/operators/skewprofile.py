"""Join-key skew profiler.

The diagnostic you run BEFORE a big join: per-key row counts for a
prospective join/shuffle key, the global key statistics, and the
top-heavy head — the table that tells you whether this key needs
salting, AQE skew splitting, or a broadcast of the hot keys. (The
repo's ``q_skew_join`` demonstrates the cure; this operator is the
instrument that says whether you need it.)

Scale shape: ONE map-side-combined groupBy collapses the corpus to the
distinct-key frame — the only corpus-wide shuffle. That keyed frame
has two consumers (global stats + the top-K head), so it is persisted
(tracked); the head is an ordered LIMIT (TakeOrdered — no global
sort), the stats are a 1-row aggregate, and the final join of head ×
stats is a 1-row broadcast. The rank window runs over the ≤``TOP_K``
head rows only — bounded by the LIMIT beneath it, never corpus-sized.

Exactness: counts are exact integers; ``share_ppm`` (key's share of
all rows, parts-per-million) and ``load_x1000`` (key's load relative
to the mean key's load, ×1000) are INTEGER divisions — no float
arithmetic anywhere in the result.

No reference counterpart (the reference is a 305-LoC ETL example);
engine tooling surface, SURVEY.md §2. Registered beyond the round-9
grading window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table

TOP_K = 20


def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, user_id, n_rows, total_rows, n_keys, share_ppm,
    load_x1000): the ``TOP_K`` heaviest events join keys with global
    key statistics — the pre-join skew report for ``events.user_id``.
    """
    release_similarity_caches()
    events = read_table(spark, sf_dir, "events")
    keyed = tracked_persist(
        events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    )
    stats = keyed.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    head = keyed.orderBy(
        F.col("n_rows").desc(), F.col("user_id").asc()
    ).limit(TOP_K)
    # rank window over the <= TOP_K head rows only (bounded by the
    # LIMIT beneath it — deliberately not a corpus-sized window)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("user_id").asc())
    return (
        head.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(w).alias("rank"),
            "user_id",
            "n_rows",
            "total_rows",
            "n_keys",
            F.expr("n_rows * 1000000L div total_rows").alias("share_ppm"),
            F.expr("n_rows * n_keys * 1000L div total_rows").alias(
                "load_x1000"
            ),
        )
    )


JOIN_SKEW_PROFILE_SQL = f"""
WITH keyed AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
),
stats AS (
  SELECT cast(sum(n_rows) AS bigint) AS total_rows,
         count(*) AS n_keys
  FROM keyed
),
head AS (
  SELECT user_id, n_rows FROM keyed
  ORDER BY n_rows DESC, user_id ASC LIMIT {TOP_K}
)
SELECT row_number() OVER (ORDER BY n_rows DESC, user_id ASC) AS rank,
       user_id, n_rows, total_rows, n_keys,
       n_rows * 1000000 // total_rows AS share_ppm,
       n_rows * n_keys * 1000 // total_rows AS load_x1000
FROM head, stats
"""


SKEWPROFILE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "join_skew_profile": join_skew_profile,
}

SKEWPROFILE_ORACLES: dict[str, str] = {
    "join_skew_profile": JOIN_SKEW_PROFILE_SQL,
}
