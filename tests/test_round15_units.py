"""Round-15 hand-computed unit tests (new/changed operators this round)."""

from __future__ import annotations


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def test_bm25_rank_hand_computed(spark, tmp_path):
    """Fixed-point odds-IDF BM25, hand-computed on a planted corpus.

    Candidates (N=3, L=3+4+4=11 tokens):
      d1 'red fox jumps'      (dl=3)
      d2 'red fox red fox'    (dl=4, tf('red fox')=2)
      d3 'blue whale swims deep' (dl=4)
    Query q10 (EVAL_SOURCE) 'red fox jumps' → bigrams
      'red fox'  (df=2, odds-IDF 3/5)
      'fox jumps'(df=1, odds-IDF 5/3)

    contrib = (10^6·44·L·tf·(2N−2df+1)) DIV ((20·L·tf+6·L+18·dl·N)(2df+1)):
      d1,'red fox' : 1452000000 DIV 2240 = 648214
      d1,'fox jumps': 2420000000 DIV 1344 = 1800595
      d2,'red fox' : 2904000000 DIV 3610 = 804432
    → d1 score_scaled 2448809 (2 terms, rank 1), d2 804432 (rank 2),
    d3 absent."""
    from etl_pipeline_example_spark.operators.bm25 import bm25_rank

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, "red fox jumps", "en", "srcA", 13),
            (2, "red fox red fox", "en", "srcA", 15),
            (3, "blue whale swims deep", "en", "srcA", 21),
            (10, "red fox jumps", "en", "src0", 13),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = bm25_rank(spark, str(tmp_path)).collect()
    rows = [
        (r["query_id"], r["doc_id"], r["n_terms"], r["score"], r["rank"])
        for r in got
    ]
    assert rows == [
        (10, 1, 2, 2448809 / 1_000_000, 1),
        (10, 2, 1, 804432 / 1_000_000, 2),
    ], rows


def test_bm25_rank_deterministic_integer_tiebreak(spark, tmp_path):
    """Two identical candidate docs score the same integer; the tie
    breaks on doc_id ascending — no float-comparison ambiguity."""
    from etl_pipeline_example_spark.operators.bm25 import bm25_rank

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (5, "gray wolf howls", "en", "srcA", 15),
            (4, "gray wolf howls", "en", "srcA", 15),
            (10, "gray wolf", "en", "src0", 9),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = bm25_rank(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["rank"]) for r in got] == [(4, 1), (5, 2)]
    assert got[0]["score"] == got[1]["score"]
