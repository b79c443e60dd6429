"""C4-style rule-based document quality gate.

Raffel et al. 2020 (T5 / C4) clean Common Crawl with a fixed list of
per-document heuristics — length bounds, naturalness checks, markup and
placeholder-text rejection — each a cheap scan-side predicate, with the
keep decision their conjunction. This module implements that rule-gate
shape over the documents table, adapted to the corpus at hand (the C4
terminal-punctuation rule is replaced by a stopword-presence check —
the same "does this read like prose" intent — because the gate must be
non-vacuous on whatever corpus it runs over):

  - word-count bounds  (C4 drops pages with < 5 sentences / too few
    words; here ``C4_MIN_WORDS`` ≤ n ≤ ``C4_MAX_WORDS``),
  - mean-token-length band (C4's 3..10 chars, kept verbatim) — checked
    as the INTEGER inequality  3·n ≤ Σlen ≤ 10·n, so the mean is never
    materialized as a float and the flag is bit-exact in any engine,
  - stopword presence (prose contains function words),
  - markup/placeholder rejection (no ``{`` — C4's JavaScript/code
    tell — and no ``lorem ipsum``).

Every flag is an integer/boolean expression over one scan: no shuffle,
no join, no floating point anywhere. ``keep`` is the conjunction.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 29d.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

C4_MIN_WORDS = 20
C4_MAX_WORDS = 5000
C4_MEAN_LEN_LO = 3  # chars — C4's mean-word-length band
C4_MEAN_LEN_HI = 10
C4_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for"]

# ONE quoted list serves both engines (the SQL quoting coincides) — two
# constants would invite exactly the silent divergence the shared rule
# builders exist to prevent
_SW_LIST = ", ".join(f"'{w}'" for w in C4_STOPWORDS)


def spark_c4_rules(
    tk: str = "tk",
    text: str = "text",
    word_cnt: str | None = None,
    tok_chars: str | None = None,
) -> dict[str, str]:
    """The four C4 rule expressions (Spark SQL), keyed by flag name.

    ``curation_funnel`` and ``stream_c4_gate`` consume the SAME builder,
    so the gate can never silently diverge from its compositions —
    pass ``word_cnt`` / ``tok_chars`` to reuse precomputed columns."""
    wc = word_cnt or f"size({tk})"
    tc = tok_chars or f"aggregate({tk}, 0L, (acc, t) -> acc + length(t))"
    return {
        "len_ok": f"{wc} >= {C4_MIN_WORDS} AND {wc} <= {C4_MAX_WORDS}",
        "mean_len_ok": (
            f"{tc} >= {C4_MEAN_LEN_LO} * {wc} AND {tc} <= {C4_MEAN_LEN_HI} * {wc}"
        ),
        "has_stopword": f"arrays_overlap({tk}, array({_SW_LIST}))",
        "clean_markup": (
            f"NOT (instr(lower({text}), '{{') > 0"
            f" OR instr(lower({text}), 'lorem ipsum') > 0)"
        ),
    }


def spark_c4_keep(tk: str = "tk", text: str = "text") -> str:
    """The keep conjunction (Spark SQL) — the whole gate as one predicate."""
    return " AND ".join(f"({e})" for e in spark_c4_rules(tk, text).values())


def duck_c4_rules(
    tk: str = "tk",
    text: str = "text",
    word_cnt: str | None = None,
    tok_chars: str | None = None,
) -> dict[str, str]:
    """The four C4 rule expressions (DuckDB SQL), mirroring
    ``spark_c4_rules`` term by term."""
    wc = word_cnt or f"len({tk})"
    tc = tok_chars or (
        f"cast(coalesce(list_sum(list_transform({tk}, t -> length(t))), 0)"
        " AS bigint)"
    )
    return {
        "len_ok": f"{wc} >= {C4_MIN_WORDS} AND {wc} <= {C4_MAX_WORDS}",
        "mean_len_ok": (
            f"{tc} >= {C4_MEAN_LEN_LO} * {wc} AND {tc} <= {C4_MEAN_LEN_HI} * {wc}"
        ),
        "has_stopword": f"len(list_intersect({tk}, [{_SW_LIST}])) > 0",
        "clean_markup": (
            f"NOT (position('{{' IN lower({text})) > 0"
            f" OR position('lorem ipsum' IN lower({text})) > 0)"
        ),
    }


def duck_c4_keep(tk: str = "tk", text: str = "text") -> str:
    """The keep conjunction (DuckDB SQL)."""
    return " AND ".join(f"({e})" for e in duck_c4_rules(tk, text).values())


def quality_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc C4 rule flags + keep conjunction: (doc_id, word_cnt,
    tok_chars, len_ok, mean_len_ok, has_stopword, clean_markup, keep).

    Scale shape: a single projection over the scan — every rule is a
    scan-side expression inside whole-stage codegen, there is no
    shuffle, no join, no aggregation, and column pruning reaches the
    reader (only doc_id and text are read). At 100 TB this runs at
    I/O speed, which is the entire point of rule-based gates: they are
    the first, cheapest pass of the cleaning funnel.
    """
    rules = spark_c4_rules()
    on_counts = spark_c4_rules(word_cnt="word_cnt", tok_chars="tok_chars")
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    return (
        docs.select(
            "doc_id",
            "text",
            F.expr(spark_tokens("text")).alias("tk"),
        )
        .select(
            "doc_id",
            F.expr("size(tk)").alias("word_cnt"),
            F.expr(
                "aggregate(tk, 0L, (acc, t) -> acc + length(t))"
            ).alias("tok_chars"),
            F.expr(rules["has_stopword"]).alias("has_stopword"),
            F.expr(rules["clean_markup"]).alias("clean_markup"),
        )
        .select(
            "doc_id",
            "word_cnt",
            "tok_chars",
            F.expr(on_counts["len_ok"]).alias("len_ok"),
            F.expr(on_counts["mean_len_ok"]).alias("mean_len_ok"),
            "has_stopword",
            "clean_markup",
        )
        .withColumn(
            "keep",
            F.expr("len_ok AND mean_len_ok AND has_stopword AND clean_markup"),
        )
    )


_DR = duck_c4_rules()
_DR_COUNTS = duck_c4_rules(word_cnt="word_cnt", tok_chars="tok_chars")

QUALITY_C4_SQL = f"""
WITH flags AS (
  SELECT doc_id,
         len(tk) AS word_cnt,
         cast(coalesce(list_sum(list_transform(tk, t -> length(t))), 0)
              AS bigint) AS tok_chars,
         {_DR["has_stopword"]} AS has_stopword,
         {_DR["clean_markup"]} AS clean_markup
  FROM (SELECT doc_id, text, {duck_tokens("text")} AS tk FROM documents)
)
SELECT doc_id, word_cnt, tok_chars,
       {_DR_COUNTS["len_ok"]} AS len_ok,
       {_DR_COUNTS["mean_len_ok"]} AS mean_len_ok,
       has_stopword, clean_markup,
       ({_DR_COUNTS["len_ok"]})
         AND ({_DR_COUNTS["mean_len_ok"]})
         AND has_stopword AND clean_markup AS keep
FROM flags
"""


C4_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_c4": quality_c4,
}

C4_ORACLES: dict[str, str] = {
    "quality_c4": QUALITY_C4_SQL,
}
