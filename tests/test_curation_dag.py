"""End-to-end curation DAG: the LLM operators composing as real tasks.

Verifies the profile → gate → dedup → neardup → decontam → report →
shard run against the testdata corpus: monotone attrition through
every stage, exact-dedup semantics on the gated corpus, a
near-dup-free and contamination-free final corpus (re-running the
MinHash pair finder and the exact n-gram contamination join over it
both yield zero rows), the Σ=budget allocation invariant downstream,
and loader-ready shard output.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def test_curation_dag_end_to_end(spark, sf_dir, tmp_path):
    from etl_pipeline_example_spark.operators.allocation import SAMPLE_BUDGET
    from etl_pipeline_example_spark.pipeline.curation_dag import curation_dag

    results = curation_dag(spark, sf_dir, str(tmp_path))

    n_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_gated = results["gate"]
    n_exact = results["dedup"]
    n_neardup = results["neardup"]
    n_final = results["decontam"]
    # monotone attrition, and the gate actually fires on this corpus
    assert 0 < n_gated <= n_total
    assert 0 < n_exact <= n_gated
    assert 0 < n_neardup <= n_exact
    assert 0 < n_final <= n_neardup

    # the final corpus is exactly-deduped: one doc per normalized content
    final = spark.read.parquet(f"{tmp_path}/final/documents.parquet")
    n_distinct = (
        final.select(
            F.expr(
                "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')))"
            ).alias("h")
        )
        .distinct()
        .count()
    )
    assert n_distinct == n_final

    # allocation ran on the FINAL corpus and sums to the budget
    alloc = results["report"]
    assert sum(r["alloc"] for r in alloc) == SAMPLE_BUDGET
    assert {r["source"] for r in alloc} == {
        r["source"] for r in final.select("source").distinct().collect()
    }

    # shards are loader-ready: partition dirs exist and cover every doc
    shard = results["shard"]
    parts = glob.glob(os.path.join(shard["path"], "shard_id=*"))
    assert len(parts) == shard["n_shards"] > 0
    reread = spark.read.json(shard["path"])
    assert reread.count() == n_final

    # profile ran first and covered every source in the RAW corpus
    assert {r["source"] for r in results["profile"]} == {
        r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }


def test_curation_dag_final_corpus_has_no_verified_neardup_pairs(
    spark, sf_dir, tmp_path
):
    """The near-dup stage's dedup invariant: re-running the verified
    MinHash pair finder over the final corpus finds NOTHING — two
    surviving component representatives can never share a verified
    pair (a pair would have merged their components), and the decontam
    stage downstream only REMOVES docs, which cannot create a pair.
    The testdata corpus plants near-duplicates, so the stage must
    actually drop rows to get here."""
    from etl_pipeline_example_spark.operators.dedup import dedup_minhash
    from etl_pipeline_example_spark.pipeline.curation_dag import curation_dag

    results = curation_dag(spark, sf_dir, str(tmp_path))
    assert results["neardup"] < results["dedup"], results
    final_dir = str(tmp_path / "final")
    assert dedup_minhash(spark, final_dir).count() == 0


def test_curation_dag_final_corpus_is_decontaminated(
    spark, sf_dir, tmp_path
):
    """The decontam stage's gate invariant (round-12 verdict ask #4):
    the bloom screen has no false negatives, so re-running the EXACT
    n-gram contamination join over the final corpus flags ZERO docs.
    The testdata corpus's train slice shares 5-grams with the src0
    benchmark slice, so the stage must actually drop rows — and the
    benchmark slice itself (the blocklist source) rides through."""
    from etl_pipeline_example_spark.operators.decontam import (
        EVAL_SOURCE,
        contamination_ngram,
    )
    from etl_pipeline_example_spark.pipeline.curation_dag import curation_dag

    results = curation_dag(spark, sf_dir, str(tmp_path))
    # the gate fired: contaminated train docs existed upstream and were
    # dropped (the planted corpus overlaps across sources)
    assert results["decontam"] < results["neardup"], results
    final_dir = str(tmp_path / "final")
    assert contamination_ngram(spark, final_dir).count() == 0
    # the benchmark slice survives as the eval side of the final corpus
    final = spark.read.parquet(f"{tmp_path}/final/documents.parquet")
    assert final.filter(F.col("source") == EVAL_SOURCE).count() > 0
