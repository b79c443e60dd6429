"""Corpus version-diff card: the dataset card ACROSS two versions of a
versioned documents table.

``dataset_card`` (operators/datacard.py, frozen) sells its tall
(metric, value) grid as making corpus-version diffs "a trivial join";
this operator cashes that claim through the real manifest layer
(pipeline/versioned.py): the documents corpus lands as version 1 minus
its newest ingest batch, the batch arrives as an UPSERT commit
(version 2 — a partial bucket rewrite, history untouched), and the
diff is the card grid computed over ``read_versioned(version=1)`` vs
``read_versioned(version=2)``, joined on metric.

Output: (metric, v_old, v_new, delta) — delta = v_new - v_old. Both
operands are the identical int/int double divisions the frozen card
computes, so the one subtraction is bit-exact cross-engine.

The version split is ``doc_id % 10 < 8`` (the newest ~20% of ids form
the ingest batch) — proportional at every sf and purely
SQL-expressible, so the DuckDB oracle states the same two corpora as
filtered CTEs and nests the frozen DATASET_CARD_SQL once per version
(the established composition pattern: frozen SQL is only re-sourced,
never edited).

Scale shape: the registry fixture WRITES the two versions (documents
is the small table; a production run diffs an EXISTING table and pays
zero writes); each card is two map-side-combined aggregates plus a
sources-bounded max per version, and the final join is a
10-row-by-10-row metric join. The versioned build is cached per
(sf_dir, corpus mtime) like the BPE artifact, so repeat runs reuse it.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline + versioned-table
surface, SURVEY.md §2. Registered beyond the round-13 grading window —
first driver slot round 14.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.datacard import DATASET_CARD_SQL
from etl_pipeline_example_spark.operators.hashing import (
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.pipeline.versioned import (
    read_versioned,
    upsert_versioned,
    write_versioned,
)
from etl_pipeline_example_spark.sources.readers import read_table

# doc_id % 10 < CARD_OLD_MOD lands in version 1; the rest is the
# ingest batch that creates version 2
CARD_OLD_MOD = 8
# bump to invalidate cached fixture tables when the build changes
_CARD_REV = 1


def _card_grid(docs: DataFrame) -> DataFrame:
    """(metric, value) over an arbitrary documents frame — mirrors the
    frozen dataset_card body (operators/datacard.py:46) exactly, with
    the corpus as a parameter instead of a table read."""
    toks = spark_tokens("text")
    scalars = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("count(distinct source)").alias("n_sources"),
        F.expr("count(distinct lang)").alias("n_langs"),
        F.expr(f"sum(size({toks}))").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.expr(
            "sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)"
        ).alias("n_empty"),
        F.expr(
            "sum(CASE WHEN lang != 'en' THEN 1 ELSE 0 END)"
        ).alias("n_non_en"),
    )
    dup = (
        docs.groupBy(F.expr(spark_hexint("text")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").alias("total"),
            F.expr("sum(cnt - 1)").alias("n_dup_rows"),
        )
    )
    top_src = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("top_source_docs"))
    )
    wide = scalars.crossJoin(F.broadcast(dup)).crossJoin(
        F.broadcast(top_src)
    )
    metrics = [
        ("n_docs", "cast(n_docs as double)"),
        ("n_sources", "cast(n_sources as double)"),
        ("n_langs", "cast(n_langs as double)"),
        ("n_tokens", "cast(n_tokens as double)"),
        ("n_chars", "cast(n_chars as double)"),
        ("mean_doc_tokens", "cast(n_tokens as double) / cast(n_docs as double)"),
        ("empty_doc_share", "cast(n_empty as double) / cast(n_docs as double)"),
        ("non_en_share", "cast(n_non_en as double) / cast(n_docs as double)"),
        ("exact_dup_rate", "cast(n_dup_rows as double) / cast(total as double)"),
        ("top_source_share", "cast(top_source_docs as double) / cast(n_docs as double)"),
    ]
    stack = ", ".join(f"'{m}', {e}" for m, e in metrics)
    return wide.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)"
    )


def _table_path(sf_dir: str) -> str:
    """Per-(corpus, mtime, rev) fixture location (the bpeindex
    convention): a regenerated corpus forces a rebuild, repeat runs
    reuse the committed table."""
    doc = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.stat(doc).st_mtime_ns) if os.path.exists(doc) else 0
    tag = hashlib.sha1(
        f"{os.path.realpath(sf_dir)}|{mtime}|{_CARD_REV}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_carddiff_{tag}")


def ensure_versioned_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing: commit v1 = corpus minus the newest ingest
    batch, then v2 = v1 + the batch via the upsert path (batch ids are
    disjoint from v1's, so the merge is a pure insert exercising the
    partial-bucket-rewrite machinery)."""
    path = _table_path(sf_dir)
    if os.path.exists(os.path.join(path, "_latest")):
        return path
    docs = read_table(spark, sf_dir, "documents")
    write_versioned(
        spark,
        docs.filter(F.col("doc_id") % 10 < CARD_OLD_MOD),
        path,
        key="doc_id",
    )
    upsert_versioned(
        spark,
        path,
        docs.filter(F.col("doc_id") % 10 >= CARD_OLD_MOD),
        key="doc_id",
        version_col="doc_id",
    )
    return path


def dataset_card_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, v_old, v_new, delta): the data-card grid of versioned-
    table version 1 vs version 2, joined on metric."""
    path = ensure_versioned_corpus(spark, sf_dir)
    old = _card_grid(read_versioned(spark, path, version=1)).select(
        "metric", F.col("value").alias("v_old")
    )
    new = _card_grid(read_versioned(spark, path, version=2)).select(
        "metric", F.col("value").alias("v_new")
    )
    # 10 metric rows per side: broadcast the join, never a shuffle
    return (
        old.join(F.broadcast(new), "metric")
        .select(
            "metric",
            "v_old",
            "v_new",
            (F.col("v_new") - F.col("v_old")).alias("delta"),
        )
        .orderBy("metric")
    )


def _nested_card(src: str) -> str:
    """The frozen DATASET_CARD_SQL re-sourced from CTE ``src`` and
    stripped of its final ORDER BY, for nesting."""
    sql = DATASET_CARD_SQL
    assert "FROM documents" in sql and "ORDER BY metric" in sql
    return sql.replace("FROM documents", f"FROM {src}").replace(
        "ORDER BY metric", ""
    )


DATASET_CARD_DIFF_SQL = f"""
WITH docs_v1 AS (
  SELECT * FROM documents WHERE doc_id % 10 < {CARD_OLD_MOD}
),
docs_v2 AS (SELECT * FROM documents),
card_old AS ({_nested_card("docs_v1")}),
card_new AS ({_nested_card("docs_v2")})
SELECT a.metric AS metric, a.value AS v_old, b.value AS v_new,
       b.value - a.value AS delta
FROM card_old a JOIN card_new b ON a.metric = b.metric
ORDER BY metric
"""


CARDDIFF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dataset_card_diff": dataset_card_diff,
}

CARDDIFF_ORACLES: dict[str, str] = {
    "dataset_card_diff": DATASET_CARD_DIFF_SQL,
}
