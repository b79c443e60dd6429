"""URL canonicalization dedup census — the web-corpus front door.

Web-scale training corpora deduplicate by URL before any content pass
(it is the cheapest dedup there is), and raw crawl URLs arrive messy:
scheme/host case, explicit default ports, trailing slashes, tracking
parameters, permuted query strings. This operator runs a REAL
canonicalizer over a per-document synthesized messy URL (the planted
pattern varies ALL of those axes from doc_id arithmetic — the
jpeg/mp3 plant discipline applied to strings) and reports the census
per canonical URL: how many documents collapse onto it and how many
distinct raw variants they arrived under.

Canonicalization (all JVM-side built-ins, no UDF):

1. split query off at ``?``;
2. lowercase the scheme://host/path part (full-lowercase policy);
3. strip an explicit default port ``:80``;
4. strip a trailing slash;
5. in the query: drop ``utm_*`` tracking params, SORT the survivors,
   rejoin — param order never distinguishes two URLs.

The DuckDB oracle never canonicalizes: it derives the expected
canonical form and the raw-variant count directly from the planted
arithmetic, so a canonicalizer that misses an axis (unsorted params,
surviving utm_, un-stripped port/slash/case) lands in the wrong
bucket and fails the value hash.

Scale shape: pure per-row string expressions in whole-stage codegen,
one map-side-combined two-level aggregate (distinct raws inside the
canonical group); output bounded by the canonical-URL domain.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# the messy-URL plant: every canonicalization axis driven by doc_id
# (Spark SQL: integer division is `div`; the DuckDB oracle uses `//`)
_RAW_URL_SPARK = (
    "concat("
    " CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END,"
    " CASE WHEN (doc_id div 2) % 2 = 0 THEN 'WWW.Example'"
    "      ELSE 'www.example' END,"
    " CAST(doc_id % 7 AS STRING), '.COM',"
    " CASE WHEN (doc_id div 4) % 2 = 0 THEN ':80' ELSE '' END,"
    " '/Path', CAST(doc_id % 5 AS STRING),"
    " CASE WHEN (doc_id div 8) % 2 = 0 THEN '/' ELSE '' END,"
    " '?',"
    " CASE WHEN (doc_id div 16) % 2 = 0 THEN 'b=2&a=1' ELSE 'a=1&b=2' END,"
    " CASE WHEN (doc_id div 32) % 2 = 0 THEN '&utm_source=x' ELSE '' END"
    ")"
)


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(canon_url, n_docs, n_raw_variants): per canonical URL, how
    many documents collapse onto it and under how many distinct raw
    spellings they arrived."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_RAW_URL_SPARK).alias("raw_url")
    )
    base = F.expr("substring_index(raw_url, '?', 1)")
    query = F.expr("substring_index(raw_url, '?', -1)")
    canon_base = F.regexp_replace(
        F.regexp_replace(F.lower(base), ":80(/|$)", "$1"), "/$", ""
    )
    canon_query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = F.concat(canon_base, F.lit("?"), canon_query)
    return (
        docs.select("raw_url", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("raw_url").cast("bigint").alias(
                "n_raw_variants"
            ),
        )
        .orderBy("canon_url")
    )


# oracle: canonical form and raw-variant identity derived from the
# PLANTED arithmetic — no canonicalization runs here, so a Spark-side
# canonicalizer that misses any axis hash-mismatches
_CANON_DUCK = (
    "concat('http://www.example', CAST(doc_id % 7 AS VARCHAR), '.com"
    "/path', CAST(doc_id % 5 AS VARCHAR), '?a=1&b=2')"
)
_RAW_KEY_DUCK = (
    # the raw spelling is fully determined by these six bits + the
    # canonical identity
    "(doc_id % 2) + 2 * ((doc_id // 2) % 2) + 4 * ((doc_id // 4) % 2)"
    " + 8 * ((doc_id // 8) % 2) + 16 * ((doc_id // 16) % 2)"
    " + 32 * ((doc_id // 32) % 2)"
)

DEDUP_URL_CANONICAL_SQL = f"""
SELECT {_CANON_DUCK} AS canon_url,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT {_RAW_KEY_DUCK}) AS BIGINT) AS n_raw_variants
FROM documents
GROUP BY 1
ORDER BY 1
"""


URLCANON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_url_canonical": dedup_url_canonical,
}

URLCANON_ORACLES: dict[str, str] = {
    "dedup_url_canonical": DEDUP_URL_CANONICAL_SQL,
}
