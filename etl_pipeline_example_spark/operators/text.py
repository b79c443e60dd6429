"""Text-analysis operators over the ``documents`` table.

Each operator is a pure column-expression pipeline — JVM-side, inside
whole-stage codegen, zero Python in the hot path, no shuffle except where
an aggregate genuinely needs one. At 100 TB these are embarrassingly
parallel single-pass scans.

Operators:
- ``text_langid``      — stopword/CJK heuristic language ID
- ``text_quality``     — length/punct/stopword/repetition quality features
- ``token_count``      — whitespace + BPE-ish regex token counts
- ``doc_fingerprint``  — winnowing rolling-hash fingerprints (k-gram
  hashes, sliding-window minima, distinct) — the standard near-dup /
  provenance fingerprint (Schleimer et al., SIGMOD'03 "Winnowing").

Every operator has a DuckDB oracle computing the identical result (shared
deterministic hashing/tokenization — see operators/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    duck_tokens,
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table

STOP_EN = "'the','of','and','to','in','is','that','it','was','for'"
STOP_FR = "'le','les','des','et','dans','est','une','pour','pas','sur'"
STOP_ES = "'el','los','las','y','en','es','una','por','para','con'"
STOP_DE = "'der','die','das','und','zu','den','von','ist','mit','nicht'"


def _spark_stop_count(tokens_expr: str, words: str) -> str:
    return f"size(filter({tokens_expr}, t -> array_contains(array({words}), t)))"


def _duck_stop_count(tokens_expr: str, words: str) -> str:
    return f"len(list_filter({tokens_expr}, t -> list_contains([{words}], t)))"


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: per-language stopword hits + CJK char count,
    deterministic argmax (zh > en > fr > es > de on ties, 'und' if all 0)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    return docs.select(
        "doc_id",
        F.expr(_spark_stop_count(toks, STOP_EN)).alias("s_en"),
        F.expr(_spark_stop_count(toks, STOP_FR)).alias("s_fr"),
        F.expr(_spark_stop_count(toks, STOP_ES)).alias("s_es"),
        F.expr(_spark_stop_count(toks, STOP_DE)).alias("s_de"),
        F.expr(r"3 * regexp_count(text, '[\\x{4e00}-\\x{9fff}]')").alias("s_zh"),
    ).select(
        "doc_id",
        F.expr(
            """CASE
                 WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
                 WHEN s_zh >= greatest(s_en, s_fr, s_es, s_de) THEN 'zh'
                 WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
                 WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
                 WHEN s_es >= s_de THEN 'es'
                 ELSE 'de' END"""
        ).alias("pred_lang"),
        F.expr("greatest(s_en, s_fr, s_es, s_de, s_zh)").alias("lang_score"),
    )


def _langid_oracle() -> str:
    toks = duck_tokens("text")
    return f"""
WITH scored AS (
  SELECT doc_id,
         {_duck_stop_count(toks, STOP_EN)} AS s_en,
         {_duck_stop_count(toks, STOP_FR)} AS s_fr,
         {_duck_stop_count(toks, STOP_ES)} AS s_es,
         {_duck_stop_count(toks, STOP_DE)} AS s_de,
         3 * len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS s_zh
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
         WHEN s_zh >= greatest(s_en, s_fr, s_es, s_de) THEN 'zh'
         WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
         WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
         WHEN s_es >= s_de THEN 'es'
         ELSE 'de' END AS pred_lang,
       greatest(s_en, s_fr, s_es, s_de, s_zh) AS lang_score
FROM scored
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score.

    score = min(1, n_tokens/50) * (1 - dup_ratio) * (1 - punct_ratio);
    every ratio is a single deterministic division, rounded at the end.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    base = docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct"),
        F.expr("regexp_count(text, '[^a-zA-Z0-9 ]')").alias("n_punct"),
        F.expr(_spark_stop_count(toks, STOP_EN)).alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "len_chars",
        "n_tokens",
        F.expr("round(1.0 - cast(n_distinct as double) / n_tokens, 6)").alias("dup_ratio"),
        F.expr("round(cast(n_punct as double) / len_chars, 6)").alias("punct_ratio"),
        F.expr("round(cast(n_stop as double) / n_tokens, 6)").alias("stop_ratio"),
        F.expr(
            "round(least(1.0, n_tokens / 50.0)"
            " * (cast(n_distinct as double) / n_tokens)"
            " * (1.0 - cast(n_punct as double) / len_chars), 6)"
        ).alias("quality_score"),
    )


def _quality_oracle() -> str:
    toks = duck_tokens("text")
    return f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS len_chars,
         len({toks}) AS n_tokens,
         len(list_distinct({toks})) AS n_distinct,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
         {_duck_stop_count(toks, STOP_EN)} AS n_stop
  FROM documents
)
SELECT doc_id, len_chars, n_tokens,
       round(1.0 - cast(n_distinct as double) / n_tokens, 6) AS dup_ratio,
       round(cast(n_punct as double) / len_chars, 6) AS punct_ratio,
       round(cast(n_stop as double) / n_tokens, 6) AS stop_ratio,
       round(least(1.0, n_tokens / 50.0)
             * (cast(n_distinct as double) / n_tokens)
             * (1.0 - cast(n_punct as double) / len_chars), 6) AS quality_score
FROM base
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs, single digits,
    punctuation marks — the pre-merge unit count a BPE tokenizer starts from)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"size({spark_tokens('text')})").alias("ws_tokens"),
        F.expr("regexp_count(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')").alias("bpe_tokens"),
    )


def _token_count_oracle() -> str:
    return f"""
SELECT doc_id,
       len({duck_tokens("text")}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS bpe_tokens
FROM documents
"""


FP_K = 3  # tokens per k-gram
FP_W = 4  # winnowing window (in k-gram hashes)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: hash token 3-grams, take the min of each
    sliding window of 4 hashes, emit distinct minima as (doc_id, fp) rows.

    Formulated as explode → window-min (ROWS BETWEEN CURRENT AND W-1
    FOLLOWING) rather than per-row array slicing: Catalyst inlines array
    expressions into higher-order-function lambdas without CSE, so the
    slice formulation recomputes every k-gram hash per window position —
    O(n²) md5 calls per document. The window form hashes each k-gram once
    and shuffles only (doc_id, position, hash) rows.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = spark_tokens("text")
    kgram_hash = spark_hexint("concat_ws(' ', slice(tk, j + 1, 3))")
    hashes = (
        docs.select("doc_id", F.expr(toks).alias("tk"))
        .filter(F.expr(f"size(tk) >= {FP_K}"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(f"transform(sequence(0, size(tk) - {FP_K}), j -> {kgram_hash})")
            ).alias("j", "h"),
        )
    )
    part = Window.partitionBy("doc_id")
    win = part.orderBy("j").rowsBetween(0, FP_W - 1)
    return (
        hashes.select(
            "doc_id",
            "j",
            F.min("h").over(win).alias("fp"),
            F.count(F.lit(1)).over(part).alias("n_h"),
        )
        .filter(F.expr(f"j <= greatest(n_h - {FP_W}, 0)"))
        .select("doc_id", "fp")
        .distinct()
    )


def _fingerprint_oracle() -> str:
    toks = duck_tokens("text")
    kgram_hash = duck_hexint("concat(tk[j + 1], ' ', tk[j + 2], ' ', tk[j + 3])")
    return f"""
WITH tk_tbl AS (
  SELECT doc_id, {toks} AS tk FROM documents
), h_tbl AS (
  SELECT doc_id,
         [ {kgram_hash} for j in range(0, len(tk) - {FP_K} + 1) ] AS hashes
  FROM tk_tbl
  WHERE len(tk) >= {FP_K}
), m_tbl AS (
  SELECT doc_id,
         CASE WHEN len(hashes) <= {FP_W}
              THEN [list_min(hashes)]
              ELSE list_distinct([ list_min(hashes[j:j + {FP_W} - 1])
                                   for j in range(1, len(hashes) - {FP_W} + 2) ]) END AS fps
  FROM h_tbl
)
SELECT DISTINCT doc_id, unnest(fps) AS fp FROM m_tbl
"""


# Gopher-style repetition gates (Rae et al. 2021 §A1.1, token-occurrence
# variant): a doc is dropped when too much of it is repeated n-grams.
# Thresholds sit near this corpus's median so the flag is non-vacuous on
# the synthetic testdata; production values come from held-out tuning.
REP_DUP2_MAX = 0.55  # duplicate 2-gram occurrence fraction
REP_TOP2_MAX = 0.10  # most-frequent-2-gram occurrence fraction
REP_DUP3_MAX = 0.25  # duplicate 3-gram occurrence fraction


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics + keep flag.

    For n in {2, 3}: fraction of n-gram occurrences that are repeats
    (1 - distinct/total) and, for n=2, the share of the single most
    frequent gram. Both n sizes ride ONE explode (tagged structs), so the
    whole operator is one projection + two map-side-combined aggregations
    shuffled on (doc_id, n, gram) / (doc_id) — well-distributed composite
    keys, no per-doc O(len²) work, safe for arbitrarily long documents
    (the HOF-only alternative is quadratic in doc length for the
    top-gram count).
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    toks = spark_tokens("text")
    g2 = spark_hexint("concat_ws(' ', slice(tk, j + 1, 2))")
    g3 = spark_hexint("concat_ws(' ', slice(tk, j + 1, 3))")
    tagged = (
        f"concat(transform(sequence(0, size(tk) - 2), j -> named_struct('n', 2, 'g', {g2})),"
        f" transform(sequence(0, size(tk) - 3), j -> named_struct('n', 3, 'g', {g3})))"
    )
    grams = (
        docs.select("doc_id", F.expr(toks).alias("tk"))
        .filter(F.expr("size(tk) >= 3"))
        .select("doc_id", F.explode(F.expr(tagged)).alias("ng"))
        .select("doc_id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    )
    per_n = (
        grams.groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("dst"),
            F.max("c").alias("maxc"),
        )
    )
    agg2 = lambda col: F.max(F.when(F.col("n") == 2, F.col(col)))  # noqa: E731
    agg3 = lambda col: F.max(F.when(F.col("n") == 3, F.col(col)))  # noqa: E731
    return (
        per_n.groupBy("doc_id")
        .agg(
            agg2("total").alias("t2"),
            agg2("dst").alias("d2"),
            agg2("maxc").alias("m2"),
            agg3("total").alias("t3"),
            agg3("dst").alias("d3"),
        )
        .select(
            "doc_id",
            F.col("t2").cast("bigint").alias("n_2grams"),
            F.expr("round(1.0 - cast(d2 as double) / t2, 6)").alias("dup2_frac"),
            F.expr("round(cast(m2 as double) / t2, 6)").alias("top2_frac"),
            F.expr("round(1.0 - cast(d3 as double) / t3, 6)").alias("dup3_frac"),
            F.expr(
                f"round(1.0 - cast(d2 as double) / t2, 6) <= {REP_DUP2_MAX}"
                f" AND round(cast(m2 as double) / t2, 6) <= {REP_TOP2_MAX}"
                f" AND round(1.0 - cast(d3 as double) / t3, 6) <= {REP_DUP3_MAX}"
            ).alias("keep"),
        )
    )


def _repetition_oracle() -> str:
    toks = duck_tokens("text")
    g2 = duck_hexint("array_to_string(tk[j + 1 : j + 2], ' ')")
    g3 = duck_hexint("array_to_string(tk[j + 1 : j + 3], ' ')")
    return f"""
WITH tk_tbl AS (
  SELECT doc_id, {toks} AS tk FROM documents
  WHERE len({toks}) >= 3
),
grams AS (
  SELECT doc_id, 2 AS n, {g2} AS g
  FROM tk_tbl, (SELECT unnest(range(0, (SELECT max(len(tk)) FROM tk_tbl))) AS j)
  WHERE j <= len(tk) - 2
  UNION ALL
  SELECT doc_id, 3 AS n, {g3} AS g
  FROM tk_tbl, (SELECT unnest(range(0, (SELECT max(len(tk)) FROM tk_tbl))) AS j)
  WHERE j <= len(tk) - 3
),
per_n AS (
  SELECT doc_id, n, cast(sum(c) as bigint) AS total,
         cast(count(*) as bigint) AS dst, cast(max(c) as bigint) AS maxc
  FROM (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
piv AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN total END) AS t2,
         max(CASE WHEN n = 2 THEN dst END) AS d2,
         max(CASE WHEN n = 2 THEN maxc END) AS m2,
         max(CASE WHEN n = 3 THEN total END) AS t3,
         max(CASE WHEN n = 3 THEN dst END) AS d3
  FROM per_n GROUP BY 1
)
SELECT doc_id,
       cast(t2 as bigint) AS n_2grams,
       round(1.0 - cast(d2 as double) / t2, 6) AS dup2_frac,
       round(cast(m2 as double) / t2, 6) AS top2_frac,
       round(1.0 - cast(d3 as double) / t3, 6) AS dup3_frac,
       (round(1.0 - cast(d2 as double) / t2, 6) <= {REP_DUP2_MAX}
        AND round(cast(m2 as double) / t2, 6) <= {REP_TOP2_MAX}
        AND round(1.0 - cast(d3 as double) / t3, 6) <= {REP_DUP3_MAX}) AS keep
FROM piv
"""


TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_langid": text_langid,
    "text_quality": text_quality,
    "quality_repetition": quality_repetition,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
}

TEXT_ORACLES: dict[str, str] = {
    "text_langid": _langid_oracle(),
    "text_quality": _quality_oracle(),
    "quality_repetition": _repetition_oracle(),
    "token_count": _token_count_oracle(),
    "doc_fingerprint": _fingerprint_oracle(),
}
