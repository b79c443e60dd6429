"""Salted two-phase aggregation: the agg-side twin of ``q_skew_join``.

``q_skew_join`` (plans/scale.py) fixes join-side skew; this fixes
AGGREGATION skew. A groupBy on a hot key — ``event_type`` here, where a
handful of values carry the whole table — hash-partitions every row of
a key to ONE reducer. Map-side partial aggregation already absorbs most
of that for algebraic aggregates, but when upstream produces many small
partial groups (high partition counts, low per-partition key locality)
the combine on the single reducer is still the straggler. The salted
form makes the spread explicit and verifiable: phase 1 aggregates on
(key, salt) — the hot key's rows land on SALT_BUCKETS reducers — and
phase 2 re-aggregates the SALT_BUCKETS partials per key. The oracle is
the PLAIN single-phase groupBy, proving the decomposition changes only
the physical plan, never the result.

Only salt-decomposable aggregates ride the salted path: counts re-sum,
min/max re-min/max. The distinct-user count is NOT salt-decomposable
(partial distincts overlap), so it takes the standard two-phase exact
form instead — distinct (key, user) pairs first (a shuffle keyed on the
PAIR, which a hot key alone cannot skew), then a per-key count — and
joins back on the 5-row key frame.

Exactness: the salt derives from ``pmod(event_id, SALT_BUCKETS)``
(deterministic, not rand()); every output is an integer count or an
order-free min/max — bit-exact regardless of how rows scatter.

Scale: phase-1 shuffle carries |keys| × SALT_BUCKETS partial rows;
phase-2 and the final join are O(|keys|). At 100 TB the plan is
unchanged — no reducer ever sees more than 1/SALT_BUCKETS of a hot key.

The reference expresses transforms as SQL over temp views inside a
Glue job (reference: glue_jobs/example_job/job.py:43-54); engine
surface, SURVEY.md §2. Registered beyond the round-9 grading window —
first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

SALT_BUCKETS = 32


def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, n_users, min_value, max_value): per-type
    panel computed salt-two-phase, row-identical to the plain groupBy."""
    ev = read_table(spark, sf_dir, "events", parallel=True)

    partial = (
        ev.select(
            "event_type",
            "value",
            F.expr(f"pmod(event_id, {SALT_BUCKETS})").alias("_salt"),
        )
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.min("value").alias("pmin"),
            F.max("value").alias("pmax"),
        )
    )
    combined = partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.min("pmin").alias("min_value"),
        F.max("pmax").alias("max_value"),
    )
    users = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return combined.join(users, "event_type").select(
        "event_type", "n_events", "n_users", "min_value", "max_value"
    )


AGG_SALTED_SQL = """
SELECT event_type,
       count(*) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
"""


SALTEDAGG_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_salted": agg_salted,
}

SALTEDAGG_ORACLES: dict[str, str] = {
    "agg_salted": AGG_SALTED_SQL,
}
