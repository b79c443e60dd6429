"""Weighted deterministic sampling with Horvitz–Thompson weights.

``sample_hash`` keeps a uniform 1-in-K slice; mixing pipelines usually
want INCLUSION PROBABILITY PROPORTIONAL TO SIZE (a long document
carries more tokens, so dropping it loses more signal): keep each doc
with probability ``min(n_chars, CAP) / CAP`` and attach the inverse
probability as the Horvitz–Thompson weight, so any downstream sum
re-weighted by ``ht_weight`` is an unbiased estimate of the full-corpus
sum.

Like the other sampling gates the decision is a pure function of the
row (the cross-engine md5-hexint of a salted doc_id against the doc's
own length), never of scan order or a seed — rerunnable, partition-
independent, engine-independent. The weight is one integer-ratio
double division.

Scale: a projected scan + filter; no shuffle at all — the gate
predicate and weight are row-local. Pushdown keeps text out of the
scan (only doc_id/source/n_chars survive pruning).

No reference counterpart (the reference is a 305-LoC Glue ETL example);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-9
grading window — first driver slot round 10.
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

WSAMPLE_CAP = 1000  # chars at which inclusion probability saturates


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_chars, ht_weight): docs kept with probability
    proportional to capped length, carrying the inverse-probability
    Horvitz–Thompson weight."""
    docs = read_table(spark, sf_dir, "documents")
    gate = spark_hexint("concat('wsamp:', cast(doc_id as string))")
    return (
        docs.filter(
            F.expr(
                f"pmod({gate}, {WSAMPLE_CAP}) < least(n_chars, {WSAMPLE_CAP})"
            )
        )
        .selectExpr(
            "doc_id",
            "source",
            "n_chars",
            f"cast({WSAMPLE_CAP} as double)"
            f" / cast(least(n_chars, {WSAMPLE_CAP}) as double) AS ht_weight",
        )
    )


_DUCK_GATE = duck_hexint("concat('wsamp:', cast(doc_id as varchar))")

SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, source, n_chars,
       cast({WSAMPLE_CAP} as double)
         / cast(least(n_chars, {WSAMPLE_CAP}) as double) AS ht_weight
FROM documents
WHERE {_DUCK_GATE} % {WSAMPLE_CAP} < least(n_chars, {WSAMPLE_CAP})
"""


WSAMPLE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_weighted": sample_weighted,
}

WSAMPLE_ORACLES: dict[str, str] = {
    "sample_weighted": SAMPLE_WEIGHTED_SQL,
}
