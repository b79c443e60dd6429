"""Hand-verifiable unit tests for the round-13 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones, against planted inputs computed by
hand."""

from __future__ import annotations

import os


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _docs(spark, tmp_path, docs):
    _write(
        spark,
        tmp_path,
        "documents",
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )


def test_dataset_card_diff_hand_computed(spark, tmp_path):
    """v1 = doc_ids {1..7, 10..17} minus ids with id%10>=8; the ingest
    batch adds ids 8, 9, 18 — growing docs 15→18, adding the zh lang
    and a duplicate, so every delta is checkable by hand."""
    from etl_pipeline_example_spark.operators.carddiff import (
        dataset_card_diff,
    )

    # ids 1..7 and 10..17 have id % 10 < 8 (version 1, 15 docs);
    # ids 8, 9, 18 are the ingest batch (version 2 adds them)
    docs = [(i, f"w{i} x", "en", "A") for i in [1, 2, 3, 4, 5, 6, 7]]
    docs += [(i, f"w{i} x y", "en", "B") for i in range(10, 18)]
    docs += [
        (8, "w1 x", "en", "A"),   # exact dup of doc 1's text
        (9, "", "zh", "A"),       # empty + non-en
        (18, "w18 x y z", "en", "B"),
    ]
    _docs(spark, tmp_path, docs)
    got = {
        r["metric"]: (r["v_old"], r["v_new"], r["delta"])
        for r in dataset_card_diff(spark, str(tmp_path)).collect()
    }
    assert got["n_docs"] == (15.0, 18.0, 3.0), got["n_docs"]
    assert got["n_langs"] == (1.0, 2.0, 1.0), got["n_langs"]
    # v1 tokens: 7 docs x 2 + 8 docs x 3 = 38; batch adds 2 + 0 + 4
    assert got["n_tokens"] == (38.0, 44.0, 6.0), got["n_tokens"]
    assert got["exact_dup_rate"][0] == 0.0
    assert got["exact_dup_rate"][1] == 1.0 / 18.0
    # top source: B has 8/15 then 9/18
    assert got["top_source_share"] == (
        8.0 / 15.0,
        0.5,
        0.5 - 8.0 / 15.0,
    ), got["top_source_share"]
    assert got["non_en_share"] == (0.0, 1.0 / 18.0, 1.0 / 18.0)
    assert got["empty_doc_share"] == (0.0, 1.0 / 18.0, 1.0 / 18.0)


def test_dataset_card_diff_versions_are_real_commits(spark, tmp_path):
    """The fixture table is a genuine 2-version versioned table: v1
    must hold exactly the old corpus, v2 the full corpus, and the
    upsert commit must NOT rewrite v1's history."""
    from etl_pipeline_example_spark.operators.carddiff import (
        ensure_versioned_corpus,
    )
    from etl_pipeline_example_spark.pipeline.versioned import (
        read_versioned,
    )

    docs = [(i, f"t{i}", "en", "S") for i in range(1, 21)]
    _docs(spark, tmp_path, docs)
    path = ensure_versioned_corpus(spark, str(tmp_path))
    v1_ids = sorted(
        r["doc_id"] for r in read_versioned(spark, path, version=1).collect()
    )
    v2_ids = sorted(
        r["doc_id"] for r in read_versioned(spark, path, version=2).collect()
    )
    assert v1_ids == [i for i in range(1, 21) if i % 10 < 8]
    assert v2_ids == list(range(1, 21))
    # build is cached: a second call must not write a third version
    assert ensure_versioned_corpus(spark, str(tmp_path)) == path
    assert sorted(
        d
        for d in os.listdir(os.path.join(path, "_manifests"))
        if not d.startswith(".")  # Hadoop .crc sidecars
    ) == ["v=000001.json", "v=000002.json"]
