"""Character-class corpus profile (encoding-health panel).

Before any tokenizer touches a new crawl, corpus owners profile raw
character composition per domain: a source whose text is 30% digits is
tables, one heavy in non-alphanumerics is markup or mojibake, and a
whitespace ratio far from ~1/6 means broken segmentation.

Naming note (round-7 ADVICE): the space class counts ONLY the literal
ASCII space character — tabs/newlines/NBSP land in ``n_other`` (escape
sequences in SQL string literals are the cross-engine hazard this repo
bans, and embedding raw control characters in a literal is worse) — so
the column is named ``n_ascii_space`` to say exactly what it measures.
Read the segmentation heuristic against it accordingly. This is the
cheapest corpus-health scan there is — pure expressions over one pass —
and the natural first gate before the heavier C4/charlm/classifier
stages (``quality_c4``, ``quality_charlm``, ``quality_linear``).

Counts are exact BIGINTs derived from length-difference after class
deletion (`length(t) - length(regexp_replace(t, '[class]', ''))`), the
one regexp idiom that is count-exact in both engines (DuckDB needs the
'g' flag — its regexp_replace is first-match by default, Spark's is
global). Classes are spelled with explicit ranges, no escape sequences
(backslash escapes inside Spark SQL string literals are the known
cross-engine hazard this repo avoids).

Scale shape: one corpus scan, per-row arithmetic in whole-stage
codegen, groupBy(source) with map-side partial sums; shuffle carries
sources × 7 integers. Nothing else moves.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# character classes profiled — explicit ranges only (no escapes)
_CLASSES = {
    "n_lower": "[a-z]",
    "n_upper": "[A-Z]",
    "n_digit": "[0-9]",
    "n_ascii_space": "[ ]",
}


def text_charstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_chars, n_lower, n_upper, n_digit,
    n_ascii_space, n_other): exact per-domain character-class totals."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    cls = [
        F.expr(
            f"length(text) - length(regexp_replace(text, '{pat}', ''))"
        ).alias(name)
        for name, pat in _CLASSES.items()
    ]
    per_doc = docs.select(
        "source", F.expr("length(text)").alias("n_chars"), *cls
    )
    agg = [F.sum(c).alias(c) for c in ("n_chars", *_CLASSES)]
    return (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), *agg)
        .select(
            "source",
            "n_docs",
            "n_chars",
            *_CLASSES.keys(),
            F.expr(
                "n_chars - n_lower - n_upper - n_digit - n_ascii_space"
            ).alias("n_other"),
        )
        .orderBy("source")
    )


_DUCK_CLS = ",\n         ".join(
    f"length(text) - length(regexp_replace(text, '{pat}', '', 'g')) AS {name}"
    for name, pat in _CLASSES.items()
)

TEXT_CHARSTATS_SQL = f"""
WITH per_doc AS (
  SELECT source, length(text) AS n_chars,
         {_DUCK_CLS}
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(n_chars) AS bigint) AS n_chars,
       cast(sum(n_lower) AS bigint) AS n_lower,
       cast(sum(n_upper) AS bigint) AS n_upper,
       cast(sum(n_digit) AS bigint) AS n_digit,
       cast(sum(n_ascii_space) AS bigint) AS n_ascii_space,
       cast(sum(n_chars - n_lower - n_upper - n_digit - n_ascii_space) AS bigint)
         AS n_other
FROM per_doc
GROUP BY 1
ORDER BY source
"""


CHARSTATS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_charstats": text_charstats,
}

CHARSTATS_ORACLES: dict[str, str] = {
    "text_charstats": TEXT_CHARSTATS_SQL,
}
