"""Label-noise detection and seasonal revenue analytics.

  lang_mismatch   declared vs PREDICTED language agreement per source —
                  the label-noise report (mislabeled metadata is a
                  top-3 corpus defect; domains with low agreement get
                  routed to re-identification). Composes the
                  ``text_langid`` heuristic: its full oracle SQL is
                  wrapped as a CTE so the chain is verified end-to-end.
  q_seasonality   monthly revenue with year-over-year ratio, computed
                  as a CALENDAR self-join (month = add_months(month,
                  −12)) on the aggregated month series rather than a
                  row-lag — a lag(12) silently misaligns when a month
                  is missing from the data (the hand-computed unit
                  test pins exactly that case). The join input is
                  calendar-bounded rows: aggregate first, join the
                  summary.

No reference counterpart (the reference is a 305-LoC ETL example);
SURVEY.md §2 rows 28b and 20z8.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.text import TEXT_ORACLES, text_langid
from etl_pipeline_example_spark.sources.readers import read_table


def lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, declared_lang, n_docs, n_predicted, n_agree,
    agree_rate): per (source, declared label) agreement between the
    declared language column and the langid prediction; rate over the
    docs where the heuristic committed (pred != 'und').

    Scale shape: langid is a pure scan; the join key is doc_id
    (AQE-decided) and the report aggregate is bounded by
    sources × languages after the map-side combine.
    """
    pred = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", "source", F.col("lang").alias("declared_lang")
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("source", "declared_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("CASE WHEN pred_lang != 'und' THEN 1 ELSE 0 END")).alias(
                "n_predicted"
            ),
            F.sum(
                F.expr("CASE WHEN pred_lang = declared_lang THEN 1 ELSE 0 END")
            ).alias("n_agree"),
        )
        .withColumn(
            "agree_rate",
            F.expr(
                "CASE WHEN n_predicted = 0 THEN cast(null as double)"
                " ELSE round(cast(n_agree as double)"
                " / cast(n_predicted as double), 6) END"
            ),
        )
    )


LANG_MISMATCH_SQL = f"""
WITH pred AS ({TEXT_ORACLES["text_langid"]}),
docs AS (
  SELECT doc_id, source, lang AS declared_lang FROM documents
),
agg AS (
  SELECT d.source, d.declared_lang, count(*) AS n_docs,
         cast(sum(CASE WHEN p.pred_lang != 'und' THEN 1 ELSE 0 END) AS bigint)
           AS n_predicted,
         cast(sum(CASE WHEN p.pred_lang = d.declared_lang THEN 1 ELSE 0 END)
           AS bigint) AS n_agree
  FROM docs d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
)
SELECT source, declared_lang, n_docs, n_predicted, n_agree,
       CASE WHEN n_predicted = 0 THEN cast(NULL AS double)
            ELSE round(cast(n_agree AS double) / cast(n_predicted AS double), 6)
            END AS agree_rate
FROM agg
"""


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, revenue, yoy): monthly order revenue and the ratio to
    the same month one year earlier (null for the first year)."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.expr("cast(date_trunc('month', o_orderdate) as date)").alias("month")
    ).agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
        ).alias("revenue")
    )
    prev = monthly.select(
        F.expr("add_months(month, 12)").alias("month"),
        F.col("revenue").alias("prev_year"),
    )
    return (
        monthly.join(prev, "month", "left")
        .select(
            "month",
            "revenue",
            F.expr(
                "CASE WHEN prev_year IS NULL THEN cast(null as double)"
                " ELSE round(revenue / prev_year, 6) END"
            ).alias("yoy"),
        )
    )


Q_SEASONALITY_SQL = """
WITH monthly AS (
  SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
         cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue
  FROM orders GROUP BY 1
)
SELECT m.month, m.revenue,
       CASE WHEN p.revenue IS NULL THEN cast(NULL AS double)
            ELSE round(m.revenue / p.revenue, 6) END AS yoy
FROM monthly m
LEFT JOIN monthly p ON m.month = cast(p.month + INTERVAL 12 MONTH AS date)
"""


SEASONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lang_mismatch": lang_mismatch,
    "q_seasonality": q_seasonality,
}

SEASONAL_ORACLES: dict[str, str] = {
    "lang_mismatch": LANG_MISMATCH_SQL,
    "q_seasonality": Q_SEASONALITY_SQL,
}
