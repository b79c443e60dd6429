"""Domain-level corpus curation: per-source frequency capping.

The Common Crawl curation step sample_stratified cannot express: a hard
per-key COUNT bound (no single domain may dominate the corpus),
implemented as a deterministic-hash rank per source with the rank
filter compiling to WindowGroupLimit (partial per-partition top-cap
before the shuffle). DuckDB oracle computes the identical kept set.

No reference counterpart; LLM-pipeline surface, SURVEY.md §2 row 35e.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_hexint, spark_hexint
from etl_pipeline_example_spark.sources.readers import read_table

# --------------------------------------------------------- per-source cap

DOMAIN_CAP = 20


def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped sampling per source: keep at most ``DOMAIN_CAP``
    docs per source, chosen by deterministic hash order — the Common
    Crawl domain-cap step (no single domain may dominate the corpus).

    Unlike ``sample_stratified`` (probabilistic per-group RATE, scan
    filter, output size ~rate·N with no hard bound) this is a hard
    per-key COUNT guarantee, which needs a rank: row_number over
    (source, hash-of-doc). Scale shape: the rank-filter compiles to
    WindowGroupLimit (plan-audited), so every map partition pre-prunes
    to its own top-``DOMAIN_CAP`` per source BEFORE the shuffle — the
    exchange carries ≤ cap × partitions rows per source no matter how
    skewed the domain, the same partial-then-final shape as a partial
    aggregate. The hash order makes the kept set a function of the rows,
    stable across runs and partitionings.
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    h = spark_hexint("concat('cap:', cast(doc_id as string))")
    w = Window.partitionBy("source").orderBy(F.expr(h).asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= DOMAIN_CAP)
        .select("source", "doc_id", "cap_rank")
    )


DOMAIN_CAP_SQL = f"""
SELECT source, doc_id, cap_rank FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {duck_hexint("concat('cap:', cast(doc_id as varchar))")}, doc_id
         ) AS cap_rank
  FROM documents
) WHERE cap_rank <= {DOMAIN_CAP}
"""


DOMAIN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "domain_cap": domain_cap,
}

DOMAIN_ORACLES: dict[str, str] = {
    "domain_cap": DOMAIN_CAP_SQL,
}
