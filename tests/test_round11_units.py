"""Hand-verifiable unit tests for the round-11 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones — and, for the persisted BPE artifact,
that the production apply path is row-identical to the oracle-shaped
in-op-training forms.
"""

from __future__ import annotations


def test_bpe_index_apply_matches_in_op_training(spark, tmp_path):
    """build_bpe_merges + bpe_encode_indexed / bpe_fertility_indexed
    must emit exactly the rows bpe_encode / bpe_fertility compute with
    their in-op training — the round-10 verdict's persisted-artifact
    ask — and the artifact must contain the two vocabulary-bounded
    tables (merges in merge order, per-word symbol counts)."""
    from etl_pipeline_example_spark.operators.bpe import (
        BPE_ROUNDS,
        bpe_encode,
        bpe_train,
    )
    from etl_pipeline_example_spark.operators.bpeindex import (
        bpe_encode_indexed,
        bpe_fertility_indexed,
        build_bpe_merges,
    )
    from etl_pipeline_example_spark.operators.fertility import bpe_fertility

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "bpe_index")
    build_bpe_merges(spark, sf, path)

    merges = spark.read.parquet(f"{path}/merges")
    vocab = spark.read.parquet(f"{path}/vocab")
    assert sorted(merges.columns) == [
        "merge_pair", "merged", "pair_cnt", "round",
    ]
    assert merges.count() == BPE_ROUNDS
    assert sorted(vocab.columns) == ["n_sym", "word"]
    # the persisted merges ARE the trained ones
    got_merges = sorted(
        (r["round"], r["merge_pair"], r["merged"], r["pair_cnt"])
        for r in merges.collect()
    )
    want_merges = sorted(
        (r["round"], r["merge_pair"], r["merged"], r["pair_cnt"])
        for r in bpe_train(spark, sf).collect()
    )
    assert got_merges == want_merges

    indexed = sorted(
        tuple(r) for r in bpe_encode_indexed(spark, sf, path).collect()
    )
    inop = sorted(tuple(r) for r in bpe_encode(spark, sf).collect())
    assert indexed == inop and len(indexed) > 0

    f_indexed = [
        tuple(r) for r in bpe_fertility_indexed(spark, sf, path).collect()
    ]
    f_inop = [tuple(r) for r in bpe_fertility(spark, sf).collect()]
    assert f_indexed == f_inop and len(f_indexed) > 0
