"""Every LLM-pipeline operator vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.operators import (
    BOILERSTRIP_ORACLES,
    BOILERSTRIP_QUERIES,
    BPE_ORACLES,
    BPE_QUERIES,
    CHARLM_ORACLES,
    CHARLM_QUERIES,
    DEDUP_ORACLES,
    DEDUP_QUERIES,
    DOMAIN_ORACLES,
    DOMAIN_QUERIES,
    CLUSTERTOPICS_ORACLES,
    CLUSTERTOPICS_QUERIES,
    CORPUSSTATS_ORACLES,
    CORPUSSTATS_QUERIES,
    CONTAINMENT_ORACLES,
    CONTAINMENT_QUERIES,
    DIAGNOSTICS_ORACLES,
    DIAGNOSTICS_QUERIES,
    EMBEDNORM_ORACLES,
    EMBEDNORM_QUERIES,
    RPRERANK_ORACLES,
    RPRERANK_QUERIES,
    SAVINGS_ORACLES,
    SAVINGS_QUERIES,
    DOMAINSHIFT_ORACLES,
    DOMAINSHIFT_QUERIES,
    C4_ORACLES,
    C4_QUERIES,
    CALIBRATION_ORACLES,
    CALIBRATION_QUERIES,
    DSIR_ORACLES,
    DSIR_QUERIES,
    EVALUATION_ORACLES,
    EVALUATION_QUERIES,
    INCREMENTAL_ORACLES,
    INCREMENTAL_QUERIES,
    NOVELTY_ORACLES,
    NOVELTY_QUERIES,
    FUNNEL_ORACLES,
    FUNNEL_QUERIES,
    PMI_ORACLES,
    PMI_QUERIES,
    MEDIAHDR_ORACLES,
    MEDIAHDR_QUERIES,
    MEDIAPIXELS_ORACLES,
    MEDIAPIXELS_QUERIES,
    SOURCEOVERLAP_ORACLES,
    SOURCEOVERLAP_QUERIES,
    READABILITY_ORACLES,
    READABILITY_QUERIES,
    BANDSTATS_ORACLES,
    BANDSTATS_QUERIES,
    BUDGETCURVE_ORACLES,
    BUDGETCURVE_QUERIES,
    CLUSTERSIZES_ORACLES,
    CLUSTERSIZES_QUERIES,
    BIGRAMCOV_ORACLES,
    BIGRAMCOV_QUERIES,
    HAMMINGHIST_ORACLES,
    HAMMINGHIST_QUERIES,
    LENGINI_ORACLES,
    LENGINI_QUERIES,
    MM_ORACLES,
    MM_QUERIES,
    NORMALIZE_ORACLES,
    NORMALIZE_QUERIES,
    RP_ORACLES,
    RP_QUERIES,
    SHARD_ORACLES,
    SHARD_QUERIES,
    SIM_ORACLES,
    SIM_QUERIES,
    SOURCEQUALITY_ORACLES,
    SOURCEQUALITY_QUERIES,
    SPANDUP_ORACLES,
    SPANDUP_QUERIES,
    QLINEAR_ORACLES,
    QLINEAR_QUERIES,
    ALLOCATION_ORACLES,
    ALLOCATION_QUERIES,
    CHARSTATS_ORACLES,
    CHARSTATS_QUERIES,
    RETRIEVAL_ORACLES,
    RETRIEVAL_QUERIES,
    PIIREPORT_ORACLES,
    PIIREPORT_QUERIES,
    NEARINCREMENTAL_ORACLES,
    NEARINCREMENTAL_QUERIES,
    TRUNCTUNE_ORACLES,
    TRUNCTUNE_QUERIES,
    SLIDING_ORACLES,
    SLIDING_QUERIES,
    PACKSTATS_ORACLES,
    PACKSTATS_QUERIES,
    MIXTEMP_ORACLES,
    MIXTEMP_QUERIES,
    DQRULES_ORACLES,
    DQRULES_QUERIES,
    SKEWPROFILE_ORACLES,
    SKEWPROFILE_QUERIES,
    SHARDMANIFEST_ORACLES,
    SHARDMANIFEST_QUERIES,
    TEXT_ORACLES,
    TEXT_QUERIES,
    TUNING_ORACLES,
    TUNING_QUERIES,
    ZIPF_ORACLES,
    ZIPF_QUERIES,
)

from tests.oracle_util import assert_matches_oracle

ALL_Q = {
    **TEXT_QUERIES, **BPE_QUERIES, **CHARLM_QUERIES, **DOMAIN_QUERIES, **DSIR_QUERIES, **C4_QUERIES, **PMI_QUERIES,
    **BOILERSTRIP_QUERIES, **RP_QUERIES, **FUNNEL_QUERIES, **NORMALIZE_QUERIES, **SHARD_QUERIES, **MEDIAHDR_QUERIES, **MEDIAPIXELS_QUERIES, **CLUSTERSIZES_QUERIES, **BIGRAMCOV_QUERIES, **HAMMINGHIST_QUERIES, **LENGINI_QUERIES, **SOURCEOVERLAP_QUERIES, **READABILITY_QUERIES, **BANDSTATS_QUERIES, **BUDGETCURVE_QUERIES,
    **DOMAINSHIFT_QUERIES, **CONTAINMENT_QUERIES, **EMBEDNORM_QUERIES,
    **CLUSTERTOPICS_QUERIES, **CORPUSSTATS_QUERIES, **INCREMENTAL_QUERIES, **NOVELTY_QUERIES,
    **DIAGNOSTICS_QUERIES, **CALIBRATION_QUERIES, **ZIPF_QUERIES,
    **SAVINGS_QUERIES, **EVALUATION_QUERIES, **TUNING_QUERIES,
    **SOURCEQUALITY_QUERIES,
    **SPANDUP_QUERIES, **QLINEAR_QUERIES, **ALLOCATION_QUERIES,
    **CHARSTATS_QUERIES, **RETRIEVAL_QUERIES,
    **PIIREPORT_QUERIES, **NEARINCREMENTAL_QUERIES,
    **TRUNCTUNE_QUERIES, **SLIDING_QUERIES, **SHARDMANIFEST_QUERIES, **PACKSTATS_QUERIES, **MIXTEMP_QUERIES, **DQRULES_QUERIES, **SKEWPROFILE_QUERIES,
    **RPRERANK_QUERIES,
    **DEDUP_QUERIES, **SIM_QUERIES, **MM_QUERIES,
}
ALL_O = {
    **TEXT_ORACLES, **BPE_ORACLES, **CHARLM_ORACLES, **DOMAIN_ORACLES, **DSIR_ORACLES, **C4_ORACLES, **PMI_ORACLES,
    **BOILERSTRIP_ORACLES, **RP_ORACLES, **FUNNEL_ORACLES, **NORMALIZE_ORACLES, **SHARD_ORACLES, **MEDIAHDR_ORACLES, **MEDIAPIXELS_ORACLES, **CLUSTERSIZES_ORACLES, **BIGRAMCOV_ORACLES, **HAMMINGHIST_ORACLES, **LENGINI_ORACLES, **SOURCEOVERLAP_ORACLES, **READABILITY_ORACLES, **BANDSTATS_ORACLES, **BUDGETCURVE_ORACLES,
    **DOMAINSHIFT_ORACLES, **CONTAINMENT_ORACLES, **EMBEDNORM_ORACLES,
    **CLUSTERTOPICS_ORACLES, **CORPUSSTATS_ORACLES, **INCREMENTAL_ORACLES, **NOVELTY_ORACLES,
    **DIAGNOSTICS_ORACLES, **CALIBRATION_ORACLES, **ZIPF_ORACLES,
    **SAVINGS_ORACLES, **EVALUATION_ORACLES, **TUNING_ORACLES,
    **SOURCEQUALITY_ORACLES,
    **SPANDUP_ORACLES, **QLINEAR_ORACLES, **ALLOCATION_ORACLES,
    **CHARSTATS_ORACLES, **RETRIEVAL_ORACLES,
    **PIIREPORT_ORACLES, **NEARINCREMENTAL_ORACLES,
    **TRUNCTUNE_ORACLES, **SLIDING_ORACLES, **SHARDMANIFEST_ORACLES, **PACKSTATS_ORACLES, **MIXTEMP_ORACLES, **DQRULES_ORACLES, **SKEWPROFILE_ORACLES,
    **RPRERANK_ORACLES,
    **DEDUP_ORACLES, **SIM_ORACLES, **MM_ORACLES,
}


def test_bpe_merges_are_well_formed(spark, sf_dir):
    """BPE invariants: rounds in order, merged symbol is the pair's
    concatenation, and the winning pair count never increases across
    rounds (a merge can only create pairs at most as frequent as the
    symbol it merged)."""
    from etl_pipeline_example_spark.operators.bpe import BPE_ROUNDS, bpe_train

    rows = sorted(bpe_train(spark, sf_dir).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == list(range(BPE_ROUNDS))
    for r in rows:
        a, b = r["merge_pair"].split(" ")
        assert a.startswith("_") and a.endswith("_") and b.startswith("_") and b.endswith("_")
        assert r["merged"] == a[:-1] + b[1:]
        assert r["pair_cnt"] > 0
    cnts = [r["pair_cnt"] for r in rows]
    assert all(cnts[i] >= cnts[i + 1] for i in range(len(cnts) - 1)), cnts


@pytest.mark.parametrize("name", sorted(ALL_Q))
def test_operator_matches_oracle(spark, duck, sf_dir, name):
    df = ALL_Q[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ALL_O[name])


def _retired_baselines():
    """Demoted oracle baselines retired from the driver registry (round
    6) but still part of the engine surface — their oracle parity is
    pinned HERE instead of costing driver grading-window slots."""
    from etl_pipeline_example_spark.operators.semdedup import (
        SEMDEDUP_PRUNE_SQL,
        semdedup_prune,
    )
    from etl_pipeline_example_spark.operators.similarity import (
        DEDUP_EMBEDDING_SQL,
        dedup_embedding,
    )

    return {
        "dedup_embedding": (dedup_embedding, DEDUP_EMBEDDING_SQL),
        "semdedup_prune": (semdedup_prune, SEMDEDUP_PRUNE_SQL),
    }


@pytest.mark.parametrize("name", sorted(_retired_baselines()))
def test_retired_baseline_matches_oracle(spark, duck, sf_dir, name):
    fn, sql = _retired_baselines()[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql)
