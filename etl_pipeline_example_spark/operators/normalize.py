"""Unicode text canonicalization: NFC + control strip + space collapse.

Exact dedup hashes bytes, so 'é' composed (U+00E9) and decomposed
(e + U+0301) — visually identical — land in different hash groups
unless the corpus is canonicalized first; every production cleaning
stack (ftfy, CCNet, Dolma) runs a normalization pass before any
content hashing. This operator is that pass: Unicode NFC, control
characters stripped, whitespace runs collapsed, and the result
reported as (doc_id, n_chars_raw, n_chars_norm, changed, norm_hash) —
the hash is what downstream exact dedup keys on, so the (wide)
normalized text itself never leaves the executors.

Spark has no NFC builtin, so normalization runs as an Arrow-batched
pandas UDF (``unicodedata.normalize`` is a C call; the batch transfer
is the only Python cost). The DuckDB oracle uses ``nfc_normalize`` —
a DIFFERENT implementation (utf8proc) of the same Unicode standard —
so the oracle match is a genuine cross-library conformance check, and
the unit test plants composed/decomposed/control/whitespace cases to
prove the pass does real work (the benchmark corpus is ASCII, where
normalization is the identity).

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 28a.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# strip C0/C1 controls (except \t \n \r, which count as whitespace and
# collapse with it); then collapse all whitespace runs to one space
_CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars_raw, n_chars_norm, changed, norm_hash).

    Scale shape: a pure per-row projection — no shuffle, no join; one
    Arrow batch round-trip for the NFC call, everything else (regex,
    length, md5) JVM-side. Runs at scan speed at any corpus size.
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(col):
        import unicodedata

        return col.map(lambda s: unicodedata.normalize("NFC", s) if s is not None else None)

    # patterns go through F.regexp_replace (a direct Java-regex literal),
    # NOT an F.expr SQL string — the SQL parser mangles \x escapes
    return (
        docs.select("doc_id", "text", nfc("text").alias("nfc_text"))
        .select(
            "doc_id",
            F.expr("length(text)").alias("n_chars_raw"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("nfc_text"), _CTRL, ""), r"\s+", " "
                )
            ).alias("norm"),
        )
        .select(
            "doc_id",
            "n_chars_raw",
            F.expr("length(norm)").alias("n_chars_norm"),
            F.expr("md5(norm)").alias("norm_hash"),
        )
        .withColumn("changed", F.expr("n_chars_norm != n_chars_raw"))
        .select("doc_id", "n_chars_raw", "n_chars_norm", "changed", "norm_hash")
    )


TEXT_NORMALIZE_SQL = f"""
WITH n AS (
  SELECT doc_id, length(text) AS n_chars_raw,
         trim(regexp_replace(regexp_replace(nfc_normalize(text),
              '{_CTRL}', '', 'g'), '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, n_chars_raw, length(norm) AS n_chars_norm,
       length(norm) != n_chars_raw AS changed,
       md5(norm) AS norm_hash
FROM n
"""


NORMALIZE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_normalize": text_normalize,
}

NORMALIZE_ORACLES: dict[str, str] = {
    "text_normalize": TEXT_NORMALIZE_SQL,
}
