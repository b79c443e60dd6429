"""Event-sequence pattern matching and robust anomaly detection.

Two more analytics shapes a query engine owes its event stream:

  q_sequence_match   MATCH_RECOGNIZE-lite: count users whose ordered
                     event stream matches a regex over event-type
                     codes (here: a signup followed by a purchase with
                     no error in between). The per-user stream
                     collapses to a STRING of one-char codes — ordered
                     aggregation — and the pattern is one RLIKE: the
                     row-pattern-matching trick for engines without
                     MATCH_RECOGNIZE, and a shape Spark executes as
                     one shuffle + a codegen'd regex scan.
  anomaly_mad        median-absolute-deviation outlier flags per event
                     type: robust location/scale from exact
                     percentile_cont medians (no mean/stddev poisoning
                     by the outliers being hunted), flag =
                     |x − med| > k·MAD. Output keeps only the flagged
                     rows — the data-quality triage list.

No reference counterpart (the reference is a 305-LoC ETL example);
general query-engine surface, SURVEY.md §2 rows 20z2–20z3.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# event_type -> one-char code, fixed alphabet
SEQ_CODES = {"signup": "s", "view": "v", "click": "c", "purchase": "p", "error": "e"}
SEQ_PATTERN = "s[^e]*p"  # signup, then purchase, no error between
MAD_K = 5  # flag threshold in MAD units


def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_matched, n_users): users whose code string contains the
    pattern, out of all users.

    Scale shape: one user-keyed ordered aggregation (sort_array over
    (ts, event_id, code) structs — map-side combinable collect_list,
    deterministic order) and a regex per user, all inside codegen; no
    second shuffle. The code string is bounded by a user's event
    count — the same per-key payload any sessionization carries.
    """
    code = "CASE " + " ".join(
        f"WHEN event_type = '{k}' THEN '{v}'" for k, v in SEQ_CODES.items()
    ) + " ELSE '?' END"
    ev = read_table(spark, sf_dir, "events", parallel=True)
    per_user = (
        ev.select(
            "user_id",
            F.expr(f"struct(ts, event_id, {code} as c)").alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort(collect_list(s)), x -> x.c))"
            ).alias("codes")
        )
    )
    return per_user.agg(
        F.sum(F.expr(f"CASE WHEN codes rlike '{SEQ_PATTERN}' THEN 1 ELSE 0 END")).alias(
            "n_matched"
        ),
        F.count(F.lit(1)).alias("n_users"),
    )


Q_SEQUENCE_MATCH_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                      WHEN 'error' THEN 'e' ELSE '?' END,
                    '' ORDER BY ts, event_id) AS codes
  FROM events GROUP BY 1
)
SELECT cast(sum(CASE WHEN regexp_matches(codes, '{SEQ_PATTERN}')
                     THEN 1 ELSE 0 END) AS bigint) AS n_matched,
       count(*) AS n_users
FROM per_user
"""


def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, value, dev_mads): events whose value sits
    more than ``MAD_K`` MADs from their type's median — deviation
    reported in rounded MAD units.

    Scale shape: two grouped aggregations over the same 5-key space
    (median, then MAD of residuals — exact percentiles are per-group
    sorts over bounded groups here; at true scale swap in
    approx_percentile exactly as dq_profile_approx does), then one
    broadcast join of the 5-row stats table back to the scan.
    """
    ev = read_table(spark, sf_dir, "events", parallel=True)
    med = ev.groupBy("event_type").agg(
        F.expr("round(percentile(value, 0.5), 6)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("round(percentile(abs(value - med), 0.5), 6)").alias("mad"))
    )
    # mad > 0 guards degenerate types (≥50% of values at the median):
    # without it dev_mads divides by zero — Infinity in Spark, engine-
    # option-dependent in DuckDB — so the guard is stated identically
    # in both plans.
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.expr(f"mad > 0 AND abs(value - med) > {MAD_K} * mad"))
        .select(
            "event_id",
            "event_type",
            F.expr("cast(round(value, 6) as double)").alias("value"),
            F.expr("cast(round(abs(value - med) / mad, 2) as double)").alias(
                "dev_mads"
            ),
        )
    )


ANOMALY_MAD_SQL = f"""
WITH med AS (
  SELECT event_type,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, m.med,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1, 2
)
SELECT e.event_id, e.event_type,
       cast(round(e.value, 6) AS double) AS value,
       cast(round(abs(e.value - s.med) / s.mad, 2) AS double) AS dev_mads
FROM events e JOIN mad s USING (event_type)
WHERE s.mad > 0 AND abs(e.value - s.med) > {MAD_K} * s.mad
"""


PATTERN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_sequence_match": q_sequence_match,
    "anomaly_mad": anomaly_mad,
}

PATTERN_ORACLES: dict[str, str] = {
    "q_sequence_match": Q_SEQUENCE_MATCH_SQL,
    "anomaly_mad": ANOMALY_MAD_SQL,
}
