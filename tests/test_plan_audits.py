"""Physical-plan audits — the scale properties correctness tests can't see.

Each assertion pins a plan shape that matters at 100 TB:
- filter/column pushdown reaches the parquet scan (don't read what you
  don't need);
- dimension joins broadcast (the fact side never shuffles for them);
- aggregates partial-aggregate map-side (shuffle carries groups, not rows);
- hot expressions run inside whole-stage codegen.

A regression here won't flip a row count at sf0.001 — it flips the 100 TB
runtime, which is why the plan itself is under test.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

from etl_pipeline_example_spark.operators.similarity import ann_lsh
from etl_pipeline_example_spark.plans.queries import q1_pricing, q5_local_supplier
from etl_pipeline_example_spark.plans.relational import q6_forecast
from etl_pipeline_example_spark.plans.tpch_extra import q19_disjunctive


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_q6_filters_push_to_scan(spark, sf_dir):
    plan = plan_str(q6_forecast(spark, sf_dir))
    assert "PushedFilters" in plan
    # the tight scan predicates must reach the parquet reader
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln or "l_discount" in ln for ln in pushed), pushed


def test_q6_prunes_columns(spark, sf_dir):
    plan = plan_str(q6_forecast(spark, sf_dir))
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, plan
    # projection needs 4 of lineitem's 11 columns; the scan must not read
    # the text/dimension columns
    assert all("l_returnflag" not in ln for ln in schema_lines), schema_lines


def hint_count(df: DataFrame) -> int:
    """Number of explicit join-strategy hints in the analyzed plan.

    Forced broadcasts are a scale hazard on SF-scaling tables (the hint
    overrides AQE's runtime stats), so these audits pin exactly which
    joins are ALLOWED to carry one: fixed-cardinality dims and one-row
    scalar aggregates only.
    """
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_q5_dimensions_broadcast(spark, sf_dir):
    plan = plan_str(q5_local_supplier(spark, sf_dir))
    # nation and region (fixed cardinality) broadcast; at test scale AQE
    # broadcasts supplier/customer too, but only from runtime stats
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # exactly 2 forced hints: nation + region — supplier/customer scale
    # with SF and must stay AQE-decided
    assert hint_count(q5_local_supplier(spark, sf_dir)) == 2


def test_scaling_tables_carry_no_broadcast_hints(spark, sf_dir):
    from etl_pipeline_example_spark.plans.queries import q3_shipping
    from etl_pipeline_example_spark.plans.relational import (
        q14_promo,
        q17_small_quantity,
        q18_large_orders,
    )
    from etl_pipeline_example_spark.plans.tpch_extra import (
        q2_argmin,
        q16_supplier_cnt,
        q20_excess_suppliers,
        q21_sole_fault,
    )

    # no forced joins at all in these: every build side scales with SF
    for q in (q3_shipping, q14_promo, q17_small_quantity, q2_argmin,
              q16_supplier_cnt, q20_excess_suppliers, q21_sole_fault):
        assert hint_count(q(spark, sf_dir)) == 0, q.__name__
    # q18 keeps exactly one: the HAVING-filtered agg (selectivity-bounded)
    assert hint_count(q18_large_orders(spark, sf_dir)) == 1


def test_q1_partial_aggregation_and_codegen(spark, sf_dir):
    plan = plan_str(q1_pricing(spark, sf_dir))
    # two HashAggregate nodes = map-side partial + reduce-side final
    assert plan.count("HashAggregate") >= 2, plan
    codegen = plan_str(q1_pricing(spark, sf_dir), mode="codegen")
    assert "WholeStageCodegen" in codegen, codegen


def test_q19_or_predicate_stays_out_of_join_build(spark, sf_dir):
    plan = plan_str(q19_disjunctive(spark, sf_dir))
    # part side broadcasts; the OR-of-ANDs evaluates post-join without
    # expanding to a cartesian
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_lsh_bucket_stage_is_shuffle_free(spark, sf_dir):
    plan = plan_str(ann_lsh(spark, sf_dir), mode="simple")
    # corpus hashing is a projection over a broadcast cross-join; the only
    # exchanges allowed are the candidate dedup and the final top-k window
    # (plus AQE reuse wrappers). A groupBy in the bucket computation would
    # add one more.
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def _formatted_blocks(plan: str) -> list[str]:
    """Split a formatted-mode plan into per-operator detail blocks."""
    import re

    blocks, cur = [], []
    for ln in plan.splitlines():
        if re.match(r"^\(\d+\) ", ln):
            if cur:
                blocks.append("\n".join(cur))
            cur = [ln]
        elif cur:
            cur.append(ln)
    if cur:
        blocks.append("\n".join(cur))
    return blocks


def test_dedup_lsh_hash_stage_is_shuffle_free(spark, sf_dir):
    from etl_pipeline_example_spark.operators.similarity import dedup_embedding_lsh

    df = dedup_embedding_lsh(spark, sf_dir)
    # Load-bearing properties (not a raw exchange count, which shifts
    # across Spark/AQE versions without a real regression):
    # 1. the corpus-hashing stage joins the planes via a BROADCAST
    #    nested-loop (no shuffle to compute buckets);
    plan = plan_str(df, mode="simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    # 2. narrow-candidates contract: every exchange partitioned on the
    #    (tbl, bucket) candidate keys must NOT carry the embedding column
    #    — wide arrays through the candidate shuffle was the measured
    #    35s→7s regression the design note documents.
    fmt = plan_str(df, mode="formatted")
    cand_exchanges = [
        b
        for b in _formatted_blocks(fmt)
        if ") Exchange" in b.split("\n")[0]
        and "hashpartitioning" in b
        and "bucket" in b
    ]
    assert cand_exchanges, fmt  # the candidate self-join does shuffle on its keys
    for b in cand_exchanges:
        assert "embedding" not in b, b


def test_ivf_centroid_build_is_topk_not_global_sort(spark, sf_dir):
    """The fixed-K centroid sample must compile to TakeOrderedAndProject
    (per-partition top-K merge); a global Sort + Exchange over the corpus
    would serialize the whole embedding table through one partition."""
    from etl_pipeline_example_spark.operators.similarity import ann_ivf

    plan = plan_str(ann_ivf(spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    """Both Lloyd assignment passes must evaluate as the corpus against a
    BROADCAST K-row centroid table (nested-loop over a broadcast, no
    corpus-side shuffle for assignment); the only hash exchanges are the
    narrow mean aggregation and the per-vector argmin windows."""
    from etl_pipeline_example_spark.operators.similarity import kmeans_assign

    plan = plan_str(kmeans_assign(spark, sf_dir), mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_semdedup_2l_cell_occupancy_is_bounded(spark, sf_dir):
    """The scale-shaped SemDedup must size K to the corpus: mean cell
    occupancy stays within a small factor of the OCC target (so the
    within-cell pair space is ~N·OCC, linear in N), and K itself grows
    linearly with N — the fixed-K variant's N²/K blowup is the regression
    under test."""
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.similarity import (
        SEMDEDUP_OCC,
        _semdedup_2l_labeled,
        semdedup_k,
    )

    # K sizing is linear in N
    assert semdedup_k(50) == 1
    assert semdedup_k(500) == 7
    assert semdedup_k(1_000_000) == 15_625
    assert semdedup_k(100 * 1_000_000) == 100 * 15_625

    labeled = _semdedup_2l_labeled(spark, sf_dir)
    occ = labeled.groupBy("cluster_id").count()
    stats = occ.agg(
        F.count("*").alias("k"),
        F.avg("count").alias("avg_occ"),
        F.max("count").alias("max_occ"),
        F.sum(F.col("count") * F.col("count")).alias("pair_space"),
    ).collect()[0]
    n = labeled.count()
    # mean occupancy within 2× of target; no cell degenerates to a large
    # fraction of the corpus (k-means imbalance tolerated up to 8×)
    assert stats["avg_occ"] <= 2 * SEMDEDUP_OCC, stats
    assert stats["max_occ"] <= 8 * SEMDEDUP_OCC, stats
    # Σ|cell|² stays linear-ish: within a constant factor of N·OCC
    assert stats["pair_space"] <= 8 * n * SEMDEDUP_OCC, (stats, n)


def test_semdedup_2l_plan_shape(spark, sf_dir):
    """Init centroids must compile to TakeOrderedAndProject (per-partition
    top-K over the hash-gated sample, no global corpus sort); both
    assignment passes run against BROADCAST centroid tables; and both
    sides of the within-cell self-join read the CACHED labeling."""
    from etl_pipeline_example_spark.operators.similarity import semdedup_prune_2l

    plan = plan_str(semdedup_prune_2l(spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_semdedup_self_join_reuses_cached_labeling(spark, sf_dir):
    """Both sides of the within-cluster self-join must read the CACHED
    labeled corpus (InMemoryTableScan twice in the plan); losing the
    persist silently re-executes the entire k-means subtree per side."""
    from etl_pipeline_example_spark.operators.similarity import semdedup_prune

    plan = plan_str(semdedup_prune(spark, sf_dir), mode="simple")
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join with no Exchange —
    the co-location contract recurring fact-fact joins rely on at scale."""
    from etl_pipeline_example_spark.sinks.writers import write_bucketed
    from etl_pipeline_example_spark.sources.readers import read_table

    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_audit")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "bkt_audit.li_b", "l_orderkey", 8,
                   path=str(tmp_path / "li_b"))
    write_bucketed(orders, "bkt_audit.ord_b", "o_orderkey", 8,
                   path=str(tmp_path / "ord_b"))
    a = spark.table("bkt_audit.li_b")
    b = spark.table("bkt_audit.ord_b")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    # disable the size-based broadcast to see the at-scale plan (at 100 TB
    # neither side broadcasts — the bucket layout is what saves the
    # shuffle); ShuffleExchange absence is the property under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = plan_str(joined, mode="simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and the join actually works
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP DATABASE bkt_audit CASCADE")


def test_curated_partition_pruning(spark, tmp_path):
    """A snapshot-partitioned curated table must prune to ONE partition
    when filtered on the partition column — at 100 TB this is the
    difference between scanning a day and scanning the lake."""
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.metadata.spec import TableSpec
    from etl_pipeline_example_spark.sinks.writers import write_curated

    spec = TableSpec.from_dict({
        "name": "snap_t",
        "columns": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": "double"},
            {"name": "snap", "type": "character"},
        ],
        "partitions": ["snap"],
    })
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
    )
    path = str(tmp_path / "snap_t")
    for day in ("2026-08-12", "2026-08-13"):
        write_curated(df, spec, path, partition_values={"snap": day})
    back = spark.read.parquet(path).filter(F.col("snap") == "2026-08-13")
    plan = plan_str(back)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("snap" in ln for ln in pf), plan
    assert back.count() == 100


def test_framesample_is_shuffle_free(spark, sf_dir):
    """Media frame sampling must be a single mapInPandas pass — a decode-
    then-join shape would shuffle raw payload bytes across the cluster."""
    from etl_pipeline_example_spark.operators.multimodal import (
        multimodal_framesample,
    )

    plan = plan_str(multimodal_framesample(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_pq_adc_coarse_pass_is_broadcast_and_partial_aggregated(spark, sf_dir):
    """The ADC coarse pass must stay narrow: codewords and the per-query
    lookup table join as BROADCASTS (no corpus-side shuffle to score
    codes), and the per-(query, vector) ADC sum partial-aggregates
    map-side — the shuffle carries one row per (query, vector), never
    one per (query, vector, subspace)."""
    from etl_pipeline_example_spark.operators.similarity import ann_pq_adc

    df = ann_pq_adc(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") >= 1, plan  # codewords
    assert "BroadcastHashJoin" in plan, plan  # LUT equi-join
    assert "CartesianProduct" not in plan, plan
    # both aggregations partial-aggregate map-side: the ADC decimal sum
    # as HashAggregate partial+final, the code argmin (min-of-struct is
    # not hash-aggregable) as SortAggregate partial+final
    assert plan.count("HashAggregate") >= 2 and "partial_sum" in plan, plan
    assert plan.count("SortAggregate") >= 2 and "partial_min" in plan, plan
    # no embedding arrays in any hash-partitioned exchange: the coarse
    # pass shuffles codes and ADC totals only
    fmt = plan_str(df, mode="formatted")
    for b in _formatted_blocks(fmt):
        if ") Exchange" in b.split("\n")[0] and "hashpartitioning" in b:
            assert "embedding" not in b, b


def test_ivfpq_indexed_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """The docstring's scale story, made checkable: the persisted IVFADC
    index is PARTITIONED BY cell, and a probe's code scan carries a
    PartitionFilters entry on ``cell`` — it reads nprobe cells, never
    the full index. The probe must also be row-identical to the flat
    ``ann_ivfpq`` (same candidates, same ADC, same rerank)."""
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.pq import (
        IVF_NPROBE,
        ann_ivfpq,
        ann_ivfpq_indexed,
        build_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq_index")
    build_ivfpq_index(spark, sf_dir, path)
    probe = ann_ivfpq_indexed(spark, sf_dir, path)
    plan = plan_str(probe)
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cell" in ln and "dynamicpruning" not in ln
    ]
    assert pf, plan  # the code scan prunes on the cell partition column
    # and the pruning is REAL: a probe-sized filter reads files from at
    # most nprobe cell directories, out of strictly more index cells
    cells = sorted(
        r["cell"]
        for r in spark.read.parquet(f"{path}/codes")
        .select("cell")
        .distinct()
        .collect()
    )
    assert len(cells) > IVF_NPROBE, cells  # pruning has something to skip
    probed_dirs = {
        r[0].rsplit("/", 2)[-2]
        for r in spark.read.parquet(f"{path}/codes")
        .filter(F.col("cell").isin(cells[:IVF_NPROBE]))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert len(probed_dirs) <= IVF_NPROBE, probed_dirs
    # row-identical to the flat composition
    flat = {tuple(r) for r in ann_ivfpq(spark, sf_dir).collect()}
    idx = {tuple(r) for r in probe.collect()}
    assert idx == flat, (sorted(flat - idx)[:5], sorted(idx - flat)[:5])


def test_hier_assign_hops_are_broadcast_shaped(spark):
    """Both hops of the hierarchical assignment keep the flat pass's
    broadcast shape: hop 1 scores the corpus against the BROADCAST
    √K-row super-centroid table (nested-loop over a broadcast); hop 2 is
    an equi-join on super_id with an AQE/size-decided build (broadcast
    hash at test scale) — never a cartesian, and no forced hint on the
    K-row side."""
    import numpy as np

    from etl_pipeline_example_spark.operators.semdedup import _hier_assign

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((200, 64))
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(i, [round(float(x), 6) for x in rng.standard_normal(64)]) for i in range(16)],
        "cluster_id int, cent array<double>",
    )
    df = _hier_assign(emb, cents, super_k=4)
    plan = plan_str(df, mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan  # hop-0 + hop-1
    # hop-2 is an EQUI-join on super_id: statically SortMergeJoin (the
    # RDD-backed test inputs carry no stats; AQE broadcasts at runtime
    # when the K-row side is small, hash-co-partitions at extreme K —
    # exactly the scale story), never a nested-loop or cartesian
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the only forced hints are _spark_assign's bounded centroid tables
    # (hop-0 trains over K points, hop-1 broadcasts √K super-centroids);
    # the hop-2 K-row build side itself carries NO hint — it must stay
    # AQE-decided so extreme K degrades to a co-partitioned hash join
    assert hint_count(df) <= 4


def test_ivfpq_inherits_both_parents_plan_shape(spark, sf_dir):
    """The composition must keep the IVF gate's broadcast probes AND the
    PQ pass's broadcast LUT with a map-side-combined ADC sum; no
    cartesian anywhere, and no hash-partitioned exchange carries the
    embedding column (the coarse pass reads codes, not vectors)."""
    from etl_pipeline_example_spark.operators.similarity import ann_ivfpq

    df = ann_ivfpq(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan  # cents + codewords
    assert "BroadcastHashJoin" in plan, plan  # probes/LUT equi-joins
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan and "partial_min" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # bounded-K samples
    fmt = plan_str(df, mode="formatted")
    for b in _formatted_blocks(fmt):
        if ") Exchange" in b.split("\n")[0] and "hashpartitioning" in b:
            assert "embedding" not in b, b


def test_charlm_model_broadcasts_and_partial_aggregates(spark, sf_dir):
    """quality_charlm's scale contract: the trigram model (charset³-
    bounded) and the one-row (V, T) scalar both broadcast — the corpus
    scan never shuffles for them — and the per-doc score shuffle carries
    map-side-combined (doc_id, n_tri, Σp) partials, not trigram rows."""
    from etl_pipeline_example_spark.operators.charlm import quality_charlm

    df = quality_charlm(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan  # model lookup
    assert "BroadcastNestedLoopJoin" in plan, plan  # one-row scalar
    assert "CartesianProduct" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    # exactly the two bounded builds carry hints: model + scalar
    assert hint_count(df) == 2


def test_domain_cap_rank_filter_compiles_to_window_group_limit(spark, sf_dir):
    """domain_cap's skew story IS WindowGroupLimit: each map partition
    pre-prunes to its own top-cap per source before the exchange, so a
    billion-doc domain ships ≤ cap × partitions rows, not its whole
    partition. If Catalyst stops planning the rank-filter this way the
    operator silently becomes a full per-domain sort — fail here, not at
    100 TB."""
    from etl_pipeline_example_spark.operators.domain import domain_cap

    plan = plan_str(domain_cap(spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan  # the pre-shuffle prune half


def test_dsir_model_broadcasts_and_topk_is_take_ordered(spark, sf_dir):
    """DSIR scale contract: the fitted bucket model joins the exploded
    raw bigrams as a BROADCAST (≤ DSIR_BUCKETS rows — never a shuffle of
    the corpus side), the one-row totals ride a broadcast nested loop,
    and the final top-K is TakeOrderedAndProject, not a global sort."""
    from etl_pipeline_example_spark.operators.dsir import dsir_weights

    plan = plan_str(dsir_weights(spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_quality_c4_is_a_pure_scan(spark, sf_dir):
    """The C4 rule gate is the cheapest pass of the cleaning funnel:
    every rule must stay a scan-side expression — no Exchange, no join,
    no aggregate — and column pruning must reach the reader."""
    from etl_pipeline_example_spark.operators.c4 import quality_c4

    df = quality_c4(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    # the only allowed Exchange is read_table(parallel=True)'s round-robin
    # reader fan-out; a hashpartitioning Exchange would mean a real shuffle
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    formatted = plan_str(df, mode="formatted")
    schema_lines = [ln for ln in formatted.splitlines() if "ReadSchema" in ln]
    assert schema_lines and "lang" not in schema_lines[0], schema_lines


def test_pmi_pair_agg_is_partial_and_topk_is_take_ordered(spark, sf_dir):
    """PMI scale contract: the (w1,w2) pair aggregation partial-aggregates
    map-side (the shuffle carries distinct pairs, not token occurrences),
    the one-row total broadcasts, and the top-K is TakeOrderedAndProject
    — never a global sort of the pair table."""
    from etl_pipeline_example_spark.operators.pmi import pmi_bigrams

    df = pmi_bigrams(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row total
    formatted = plan_str(df, mode="formatted")
    assert "partial_count" in formatted or "Partial" in formatted, formatted


def test_boilerplate_strip_reuses_cached_chunks_and_joins_on_hash(spark, sf_dir):
    """The chunk explode must run once: its three consumers (removal
    list, totals, anti-join) read the persisted frame — ≥ 2
    InMemoryTableScans in the final plan. The anti-join build side is
    the narrow chunk_hash list, so no exchange partitioned on
    chunk_hash may carry chunk_text."""
    from etl_pipeline_example_spark.operators.boilerstrip import boilerplate_strip

    df = boilerplate_strip(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert plan.count("InMemoryTableScan") >= 2, plan
    fmt = plan_str(df, mode="formatted")
    for b in _formatted_blocks(fmt):
        if ") Exchange" in b.split("\n")[0] and "hashpartitioning(chunk_hash" in b:
            assert "chunk_text" not in b, b


def test_dq_profile_approx_is_one_bounded_aggregation_pass(spark, sf_dir):
    """The sketch profile must stay ONE aggregation over one scan with a
    map-side partial (sketches are fixed-size mergeable buffers — that
    bounded-state property is the whole point vs exact dq_profile): two
    aggregate nodes, one scan, no join, no countDistinct expand."""
    from etl_pipeline_example_spark.plans.profiling import dq_profile_approx

    plan = (
        dq_profile_approx(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "Expand" not in plan, plan  # exact multi-countDistinct shape
    assert plan.count("FileScan") == 1, plan
    assert plan.count("ObjectHashAggregate") == 2, plan
    assert "partial_approx_count_distinct" in plan, plan  # map-side sketch


def test_embed_rp_is_a_pure_scan(spark, sf_dir):
    """Random projection is scan-speed by construction: the sign matrix
    is inlined as literals, so the plan must contain no shuffle, no
    join, no aggregate — just the projection over the reader."""
    from etl_pipeline_example_spark.operators.rp import embed_rp

    plan = plan_str(embed_rp(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "Aggregate" not in plan, plan


def test_embed_pca_moments_shuffle_is_dim_bounded_and_projection_is_arrow(spark, sf_dir):
    """PCA scale contract: the moment pass's exchange partitions on the
    (i, j) moment keys after a map-side partial — the shuffle carries
    d(d+1)/2 + d rows per partition, never an embedding — and the
    projection stage is an Arrow-batched python eval with no shuffle."""
    from etl_pipeline_example_spark.operators.pca import embed_pca

    df = embed_pca(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "ArrowEvalPython" in plan, plan
    # projection itself never shuffles (round-robin reader fan-out aside)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_shard_prefix_sum_windows_are_bucket_partitioned(spark, sf_dir):
    """The scalable-prefix-sum contract: NO window in the plan may run
    over a single global partition — the cumsum must partition by the
    hash bucket (the 100 TB bottleneck this operator exists to avoid)
    — and the per-bucket offsets join back as a broadcast."""
    from etl_pipeline_example_spark.operators.shard import shard_by_tokens

    df = shard_by_tokens(spark, sf_dir)
    fmt = plan_str(df, mode="formatted")
    win_blocks = [b for b in _formatted_blocks(fmt) if b.split("\n")[0].endswith("Window")
                  or ") Window" in b.split("\n")[0]]
    assert win_blocks, fmt
    for b in win_blocks:
        assert "bucket" in b, b  # partition spec carries the bucket key
    plan = plan_str(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_recon_joins_day_grain_not_facts(spark, sf_dir):
    """The full-outer recon must aggregate BOTH sides to day grain
    before the join: two partial/final aggregate pairs feeding a join
    whose inputs are day-keyed — no fact table rides the outer join."""
    from etl_pipeline_example_spark.plans.recon import q_full_outer_recon

    plan = plan_str(q_full_outer_recon(spark, sf_dir), mode="formatted")
    blocks = _formatted_blocks(plan)
    join_blocks = [b for b in blocks if "FullOuter" in b]
    assert join_blocks, plan
    for b in join_blocks:
        assert "o_totalprice" not in b, b  # measures pre-aggregated away
        assert "event_type" not in b, b


def test_basket_self_join_carries_two_int_columns(spark, sf_dir):
    """The lineitem self-join must be pruned to (orderkey, partkey)
    before joining — the scan reads exactly those two columns."""
    from etl_pipeline_example_spark.plans.basket import q_basket_pairs

    plan = plan_str(q_basket_pairs(spark, sf_dir), mode="formatted")
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    for ln in schema_lines:
        assert "l_orderkey" in ln and "l_partkey" in ln, ln
        assert "l_comment" not in ln and "l_extendedprice" not in ln, ln


def test_scd2_needs_no_window_or_sort(spark, sf_dir):
    """SCD2 is per-key alignment only: the plan must contain no Window
    and no global Sort — a windowed implementation would serialize the
    dimension through ordering it doesn't need."""
    from etl_pipeline_example_spark.plans.scd2 import scd2_merge

    plan = plan_str(scd2_merge(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_window_funnel_counts_read_cached_steps(spark, sf_dir):
    """q_window_funnel persists t1/t2 (tracked) because each feeds both
    the next step's lineage and its own driver-side count: the surviving
    caches must be exactly those two frames, and the step-2 frame must
    read step 1 through an InMemoryTableScan — losing either persist
    silently re-runs the events scan+agg chain ~6x instead of 3x."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.plans.behavior import q_window_funnel

    q_window_funnel(spark, sf_dir).collect()
    try:
        assert len(simcore._LIVE_CACHES) == 2, simcore._LIVE_CACHES
        t1, t2 = simcore._LIVE_CACHES
        assert t1.storageLevel.useMemory and t2.storageLevel.useMemory
        # t1 was materialized by its count inside the operator, so t2's
        # executed plan reads it from cache, not from a fresh scan+agg
        t2_plan = t2._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in t2_plan, t2_plan
    finally:
        simcore.release_similarity_caches()


def test_spandup_scan_is_pruned_and_text_never_shuffles(spark, sf_dir):
    """The shingle profile reads exactly (doc_id, text) — lang/source/
    n_chars must be pruned — and every exchange carries only the narrow
    (doc_id, h) pair, never the document text."""
    from etl_pipeline_example_spark.operators.spandup import dedup_substring

    fmt = plan_str(dedup_substring(spark, sf_dir), mode="formatted")
    schema_lines = [ln for ln in fmt.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    for ln in schema_lines:
        assert "doc_id" in ln and "text" in ln, ln
        assert "source" not in ln and "lang" not in ln, ln
    # text may ride the read-parallelism round-robin (pre-tokenize scan
    # distribution) but never a KEYED shuffle
    for b in _formatted_blocks(fmt):
        if ") Exchange" in b.split("\n")[0] and "hashpartitioning" in b:
            assert "text#" not in b, b


def test_retrieve_overlap_reuses_the_posting_spine(spark, sf_dir):
    """The inverted-index spine has three consumers (query side,
    candidate side, df filter): all must read the persisted frame —
    ≥ 3 InMemoryTableScans — instead of re-running tokenize+shingle."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.operators.retrieval import retrieve_overlap

    try:
        df = retrieve_overlap(spark, sf_dir)
        df.collect()
        plan = plan_str(df, mode="simple")
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        simcore.release_similarity_caches()


def test_quality_linear_is_one_scan_with_partial_aggregate(spark, sf_dir):
    """The classifier is scan → explode → hash-aggregate: the score sum
    must partial-aggregate map-side (shuffle carries per-doc partials,
    not token rows), and the scan reads only (doc_id, text)."""
    from etl_pipeline_example_spark.operators.qlinear import quality_linear

    fmt = plan_str(quality_linear(spark, sf_dir), mode="formatted")
    schema_lines = [ln for ln in fmt.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    for ln in schema_lines:
        assert "source" not in ln and "lang" not in ln, ln
    simple = plan_str(quality_linear(spark, sf_dir), mode="simple")
    assert "partial_count" in simple or "partial" in simple.lower(), simple
    assert "Generate explode" in simple or "Explode" in simple or "generate" in simple.lower(), simple


def test_substring_dup_rate_reuses_the_shingle_spine(spark, sf_dir):
    """The spine feeds the dup-hash aggregate AND the per-doc join: both
    must read the persisted frame (≥ 2 InMemoryTableScans), not re-run
    tokenize+shingle."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.operators.spandup import substring_dup_rate

    try:
        df = substring_dup_rate(spark, sf_dir)
        df.collect()
        plan = plan_str(df, mode="simple")
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        simcore.release_similarity_caches()


def test_neardup_incremental_reuses_signatures_and_keeps_text_out_of_shuffles(spark, sf_dir):
    """The persisted signature frame has five consumers (bands + both
    sides of both verify joins): the executed plan must read it from
    cache (≥ 3 InMemoryTableScans), and no keyed exchange may carry the
    document text — only signatures, bands, and ids shuffle."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.operators.nearincremental import (
        neardup_incremental,
    )

    try:
        df = neardup_incremental(spark, sf_dir)
        df.collect()
        plan = plan_str(df, mode="simple")
        assert plan.count("InMemoryTableScan") >= 3, plan
        fmt = plan_str(df, mode="formatted")
        for b in _formatted_blocks(fmt):
            if ") Exchange" in b.split("\n")[0] and "hashpartitioning" in b:
                assert "text#" not in b, b
    finally:
        simcore.release_similarity_caches()


def test_q_latest_event_plans_window_group_limit(spark, sf_dir):
    """The QUALIFY rn=1 idiom must plan as WindowGroupLimit (per-
    partition top-1 prune before the full sort materializes) over a
    user_id hash exchange — never a global single-partition window."""
    from etl_pipeline_example_spark.plans.latest import q_latest_event

    plan = plan_str(q_latest_event(spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in plan, plan
    assert "hashpartitioning(user_id" in plan, plan


def test_bigram_coverage_broadcasts_topk_and_persists_positions(spark, sf_dir):
    """The docstring's scale claims, checkable: the top-K list joins
    back as a BroadcastHashJoin (never a wide shuffle join), and the
    two-consumer position stream is persisted (two InMemoryTableScans
    in the plan)."""
    from etl_pipeline_example_spark.operators.bigramcov import bigram_coverage

    plan = plan_str(bigram_coverage(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_dedup_simhash_filter_reaches_below_the_distinct(spark, sf_dir):
    """After the round-9 fold onto ``simhash_blocked_pairs``, the
    hamming ≤ 3 cutoff sits textually ABOVE the shared distinct-pair
    plan; Catalyst must push it back down — it lands inside the
    chunk-join condition, so candidates are cut before the distinct
    aggregation ever sees them (the pre-fold executed shape)."""
    from etl_pipeline_example_spark.operators.dedup import dedup_simhash

    plan = plan_str(dedup_simhash(spark, sf_dir), mode="simple")
    join_line = next(l for l in plan.splitlines() if "BroadcastHashJoin" in l or "SortMergeJoin" in l)
    assert "bit_count" in join_line, plan


def test_range_frame_window_partitions_by_customer(spark, sf_dir):
    """The RANGE-frame window must partition by o_custkey — never a
    global single-partition window — and the frame spec must be a
    RANGE (value) frame, not ROWS."""
    from etl_pipeline_example_spark.plans.frames import q_range_frame

    df = q_range_frame(spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "Window" in plan, plan
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "o_custkey" in m.group(1), plan
    assert "specifiedwindowframe(RangeFrame" in plan, plan


def test_unpivot_expands_before_partial_aggregate(spark, sf_dir):
    """The melt must Expand then partial-aggregate map-side: the
    exchange hashes the (measure, flag) group keys, so the shuffle
    carries bounded partial rows, never the tripled row stream."""
    from etl_pipeline_example_spark.plans.frames import q_unpivot_measures

    df = q_unpivot_measures(spark, sf_dir)
    fmt = plan_str(df, mode="formatted")
    assert "Expand" in fmt, fmt
    blocks = _formatted_blocks(fmt)
    # partial aggregate present below the exchange
    assert any("HashAggregate" in b and "partial_count" in b for b in blocks), fmt


def test_skew_profile_reuses_keyed_frame_and_take_ordered(spark, sf_dir):
    """The distinct-key frame must be cached and read by BOTH consumers
    (stats + head: two InMemoryTableScans), the head must be a
    TakeOrdered (never a global sort of all keys), and the only
    corpus-sized exchange is the single groupBy on the key."""
    from etl_pipeline_example_spark.operators.skewprofile import (
        join_skew_profile,
    )

    plan = plan_str(join_skew_profile(spark, sf_dir), mode="simple")
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_length_ks_windows_are_bucket_bounded(spark, sf_dir):
    """Neither KS window may run over corpus rows: the per-source
    cumulative partitions by source over the bucket spine, and the
    one global cumulative runs over the <= |buckets| bucket frame —
    whose input is the CACHED (source, bucket) aggregate, never a
    documents scan."""
    from etl_pipeline_example_spark.operators.lengthks import length_drift_ks

    plan = plan_str(length_drift_ks(spark, sf_dir), mode="simple")
    # every consumer reads the cached (source, bucket) aggregate (the
    # FileScan text repeating under each InMemoryTableScan is the
    # cached relation's DEFINITION, executed once)
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_bloom_gate_probes_by_broadcast_semi_joins(spark, sf_dir):
    """The bloom probe must be broadcast LEFT SEMI joins (one per hash
    slice — never a shuffled join of the gram stream against the bit
    set), and both persisted gram frames must feed their two consumers
    from cache (bloom + exact chains, bits + exact probe)."""
    from etl_pipeline_example_spark.operators.bloomgate import (
        BLOOM_K,
        contamination_bloom,
    )

    plan = plan_str(contamination_bloom(spark, sf_dir), mode="simple")
    assert plan.count("BroadcastHashJoin") >= BLOOM_K, plan
    assert plan.count("LeftSemi") >= BLOOM_K, plan
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_dedup_prefix_shuffles_hashes_not_text(spark, sf_dir):
    """One map-side-combined aggregate on the prefix hash: a partial
    count/min below the exchange, and no text column surviving past
    the hash projection (the shuffle carries 32-byte rows)."""
    from etl_pipeline_example_spark.operators.prefixdup import dedup_prefix

    fmt = plan_str(dedup_prefix(spark, sf_dir), mode="formatted")
    blocks = _formatted_blocks(fmt)
    assert any(
        "HashAggregate" in b and "partial_count" in b for b in blocks
    ), fmt
    exchanges = [b for b in blocks if b.startswith("(") and "Exchange" in b]
    assert exchanges and all("text" not in b for b in exchanges), fmt


def test_lexicon_stats_combines_term_counts_map_side(spark, sf_dir):
    """The (source, token) aggregate must partial-combine below its
    exchange so the shuffle carries vocabulary-bounded partials, not
    token instances."""
    from etl_pipeline_example_spark.operators.lexicon import lexicon_stats

    fmt = plan_str(lexicon_stats(spark, sf_dir), mode="formatted")
    blocks = _formatted_blocks(fmt)
    assert any(
        "HashAggregate" in b and "partial_count" in b for b in blocks
    ), fmt


def test_cdc_apply_plans_group_limit_and_sort_merge_full_outer(spark, sf_dir):
    """cdc_apply's scale contract: the change-log compaction must compile
    to WindowGroupLimit (per-key top-1 pruned map-side, never a full
    per-key sort materialization) and the snapshot merge must be a
    full-outer SortMergeJoin — a broadcast here would mean Catalyst
    thinks one side is small, which is never true of a snapshot."""
    from etl_pipeline_example_spark.plans.cdc import cdc_apply

    plan = plan_str(cdc_apply(spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in plan, plan
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan


def test_skyline_window_is_partitioned_by_brand(spark, sf_dir):
    """q_skyline_2d must never plan a global (single-partition) window:
    the running max partitions by brand. An empty partition spec would
    serialize the whole frontier scan."""
    from etl_pipeline_example_spark.plans.skyline import q_skyline_2d

    plan = plan_str(q_skyline_2d(spark, sf_dir), mode="simple")
    assert "Window" in plan, plan
    assert "windowspecdefinition(p_brand" in plan, plan


def test_decile_lift_has_no_global_sort_or_window(spark, sf_dir):
    """q_decile_lift exists to AVOID ntile's global window: the physical
    plan must contain no Window at all and no global Sort feeding an
    aggregate — buckets come from broadcast percentile cuts."""
    from etl_pipeline_example_spark.plans.decile import q_decile_lift

    plan = plan_str(q_decile_lift(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    # the one allowed range exchange is the 10-row presentation sort at
    # the very top — never a corpus-scale sort feeding the aggregate
    n_range = plan.count("rangepartitioning")
    assert n_range == 1 and plan.index("rangepartitioning") < plan.index(
        "hashpartitioning"
    ), plan


def test_graph_triangles_reuses_persisted_frames(spark, sf_dir):
    """graph_triangles' edge list is a self-join consumed by the degree
    census, the orientation, and the wedge closure — the plan must read
    the persisted frames (InMemoryTableScan) instead of re-running the
    join per consumer."""
    from etl_pipeline_example_spark.plans.graph import graph_triangles

    plan = plan_str(graph_triangles(spark, sf_dir), mode="simple")
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_referential_joins_preaggregated_keys(spark, sf_dir):
    """dq_referential must pre-aggregate every child side to (key, cnt)
    BEFORE the orphan join: each edge's plan joins two aggregates, so
    no join input carries raw fact rows — the lineitem edges would
    otherwise shuffle the fact table three times."""
    from etl_pipeline_example_spark.plans.referential import (
        FK_EDGES,
        dq_referential,
    )

    plan = plan_str(dq_referential(spark, sf_dir), mode="simple")
    # one pre-join HashAggregate pair per edge (partial+final) on the
    # child side, plus the distinct on the parent side: at minimum the
    # plan contains 2 aggregates per edge below the final union
    assert plan.count("HashAggregate") >= 2 * len(FK_EDGES), plan


def test_band_join_is_equi_not_cartesian(spark, sf_dir):
    """q_band_join exists to AVOID the cartesian-filter band join: the
    physical plan must contain no CartesianProduct and no
    BroadcastNestedLoopJoin — the ε-bucket id is an equi-join key."""
    from etl_pipeline_example_spark.plans.bandjoin import q_band_join

    plan = plan_str(q_band_join(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_overlap_is_equi_not_cartesian(spark, sf_dir):
    """q_interval_event_overlap's day-explode decomposition must plan
    as an equi-join on the day grain — never a cartesian range probe."""
    from etl_pipeline_example_spark.plans.rangejoin import (
        q_interval_event_overlap,
    )

    plan = plan_str(q_interval_event_overlap(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_weighted_median_window_is_partitioned(spark, sf_dir):
    """q_weighted_median's cumulative window must partition by
    l_suppkey — an empty partition spec would serialize lineitem
    through one reducer."""
    from etl_pipeline_example_spark.plans.wmedian import q_weighted_median

    plan = plan_str(q_weighted_median(spark, sf_dir), mode="simple")
    assert "windowspecdefinition(l_suppkey" in plan, plan


def test_rfm_has_no_window(spark, sf_dir):
    """q_rfm's round-11 rewrite replaced three global ntile windows with
    broadcast percentile cuts: the physical plan must contain no Window
    at all, and the only range exchange is the top-50 presentation sort
    (TakeOrderedAndProject renders as no rangepartitioning at all)."""
    from etl_pipeline_example_spark.plans.recon import q_rfm

    plan = plan_str(q_rfm(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan or plan.count(
        "rangepartitioning"
    ) <= 1, plan


def test_survivor_policy_single_hash_exchange(spark, sf_dir):
    """dedup_survivor_policy's window pair (row_number + count + first)
    must share ONE content-hash exchange — a second hashpartitioning on
    content_hash would mean the window specs diverged."""
    from etl_pipeline_example_spark.operators.survivor import (
        dedup_survivor_policy,
    )

    plan = plan_str(dedup_survivor_policy(spark, sf_dir), mode="simple")
    n = plan.count("hashpartitioning(content_hash")
    assert n == 1, f"expected one content_hash exchange, saw {n}:\n{plan}"


def test_numeric_corr_is_one_scan_no_shuffle_width(spark, sf_dir):
    """q_numeric_corr's whole moment state must come from ONE lineitem
    scan reduced to a single row: no hash-partitioned exchange, no
    window, no join anywhere in the plan."""
    from etl_pipeline_example_spark.plans.numcorr import q_numeric_corr

    plan = plan_str(q_numeric_corr(spark, sf_dir), mode="simple")
    assert "hashpartitioning" not in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_group_regression_broadcasts_the_dim(spark, sf_dir):
    """q_group_regression's part→brand join must broadcast: a
    sort-merge join here would shuffle the fact table twice."""
    from etl_pipeline_example_spark.plans.groupreg import q_group_regression

    plan = plan_str(q_group_regression(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_distinct_cube_routes_through_expand(spark, sf_dir):
    """q_distinct_cube exists to pin the non-additive path: Expand must
    appear (grouping-set fan-out) — if Catalyst ever 'optimizes' it
    away the distinct counts would silently fold like sums."""
    from etl_pipeline_example_spark.plans.distinctcube import q_distinct_cube

    plan = plan_str(q_distinct_cube(spark, sf_dir), mode="simple")
    assert "Expand" in plan, plan


def test_agg_merge_states_partial_aggregates(spark, sf_dir):
    """agg_merge_states' partial pass must map-side combine (partial_
    functions before the exchange) — the whole point of the operator is
    that per-batch states are tiny."""
    from etl_pipeline_example_spark.plans.partialagg import agg_merge_states

    plan = plan_str(agg_merge_states(spark, sf_dir), mode="simple")
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_equi_depth_aggregates_value_counts_never_raw_percentile(
    spark, sf_dir
):
    """The round-11 verdict fix, pinned in the plan: cut points must
    come from the (value, count) pre-aggregate — the percentile-style
    per-distinct-value state must never ride the aggregation of the raw
    column (its state grows with the value universe). Concretely: no
    `percentile` expression anywhere, and the counted frame is persisted
    so the cut pick and the bucket census share it (2 InMemoryTableScans)
    rather than re-scanning orders."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.plans.equidepth import (
        q_histogram_equi_depth,
    )

    try:
        df = q_histogram_equi_depth(spark, sf_dir)
        plan = plan_str(df, mode="simple")
        assert "percentile" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
        # the broadcast of the 1-row cut frame, never a shuffle join
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    finally:
        simcore.release_similarity_caches()


def test_graph_pagerank_persists_adjacency_for_every_iteration(
    spark, sf_dir
):
    """The docstring's scale claim: the symmetric adjacency and the
    degree table are persisted ONCE and reused by all 3 power-iteration
    steps — the final plan must read them through InMemoryTableScans
    (>= 4: sym x3 iterations + deg), never re-run the co-order
    self-join per iteration."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.plans.graphiter import graph_pagerank

    try:
        plan = plan_str(graph_pagerank(spark, sf_dir), mode="simple")
        assert plan.count("InMemoryTableScan") >= 4, plan
    finally:
        simcore.release_similarity_caches()


def test_ann_knn_join_shuffles_ids_not_vectors_for_candidates(
    spark, sf_dir
):
    """The knn join's scale claim: the candidate-pair dedup exchange
    carries only ids — the embedding column joins back later for
    scoring. No hashpartitioning exchange upstream of the
    dropDuplicates may carry the embedding column."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.operators.knnjoin import ann_knn_join

    try:
        df = ann_knn_join(spark, sf_dir)
        plan = plan_str(df)
        # formatted plan: find Exchange blocks feeding the dedup
        # (hashpartitioning on vec_a, vec_b) and pin them id-only
        import re

        for mtch in re.finditer(
            r"Exchange hashpartitioning\(\[?vec_a[^)]*vec_b[^\n]*", plan
        ):
            assert "embedding" not in mtch.group(0), mtch.group(0)
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        simcore.release_similarity_caches()


def test_cumulative_distinct_has_no_distinct_in_window(spark, sf_dir):
    """The scale claim: cumulative distinct is a running sum of
    first-seen counts — the plan must contain NO count(distinct) and
    only map-side-combinable aggregates; the one window runs over the
    bounded day spine AFTER aggregation to day grain."""
    from etl_pipeline_example_spark.plans.cumdistinct import (
        q_cumulative_distinct,
    )

    plan = plan_str(q_cumulative_distinct(spark, sf_dir))
    assert "distinct" not in plan.lower().replace(
        "dropduplicates", ""
    ) or "count(distinct" not in plan.lower(), plan
    # partial aggregation present (map-side combine on the dedup pass)
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_proration_windows_are_order_partitioned(spark, sf_dir):
    """Every window in the proration plan partitions by l_orderkey
    (≤ basket-size state) — no unpartitioned window over the fact
    table."""
    from etl_pipeline_example_spark.plans.proration import q_proration

    plan = plan_str(q_proration(spark, sf_dir))
    import re

    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert wins, plan
    assert all("l_orderkey" in ln for ln in wins), wins


def test_drift_tvd_is_one_fact_aggregate(spark, sf_dir):
    """The corpus-scale work is ONE 20-cell aggregate: the scalar
    bounds broadcast (BroadcastNestedLoopJoin of a 1-row frame), and
    no exchange carries more than the bucket grain."""
    from etl_pipeline_example_spark.plans.tvd import dq_drift_tvd

    plan = plan_str(dq_drift_tvd(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    # orders scans: one for the bounds, one for the histogram
    assert plan.count("Scan parquet") <= 2, plan


def test_gopher_rules_fold_without_explode(spark, sf_dir):
    """All four Gopher rules evaluate INSIDE the token array: the plan
    must contain no Generate (explode) node — the shuffle carries only
    the per-source census."""
    from etl_pipeline_example_spark.operators.gopher import quality_gopher

    plan = plan_str(quality_gopher(spark, sf_dir), mode="simple")
    assert "Generate" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_curriculum_has_no_global_sort_before_window(spark, sf_dir):
    """Deciles come from broadcast percentile cuts and the position
    window partitions by decile — the ONLY global sort allowed is the
    final presentation ORDER BY, downstream of the window."""
    from etl_pipeline_example_spark.operators.curriculum import (
        mix_curriculum,
    )
    from etl_pipeline_example_spark.operators import simcore

    try:
        plan = plan_str(mix_curriculum(spark, sf_dir))
        wins = [
            ln for ln in plan.splitlines() if "windowspecdefinition" in ln
        ]
        assert wins and all("decile" in ln for ln in wins), wins
        # no ntile over an unpartitioned window anywhere ("percentile("
        # contains "ntile(" as a substring — require the word boundary)
        import re

        assert not re.search(r"\bntile\(", plan), plan
    finally:
        simcore.release_similarity_caches()


def test_multiprobe_expands_queries_not_corpus(spark, sf_dir):
    """Multi-probe's scale claim: the Hamming-1 probe fan explodes the
    broadcast QUERY side only — the corpus-side bucket table joins via
    BroadcastHashJoin, and top-k plans as WindowGroupLimit (no global
    sort)."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.operators.multiprobe import (
        ann_multiprobe,
    )

    try:
        plan = plan_str(ann_multiprobe(spark, sf_dir), mode="simple")
        assert "BroadcastHashJoin" in plan, plan
        assert "WindowGroupLimit" in plan, plan
        # the probe explode (Generate) must sit on the query branch —
        # under the BroadcastExchange, never over the corpus scan
        import re

        bx = plan.find("BroadcastExchange")
        gen = plan.find("Generate explode")
        assert bx != -1 and gen != -1 and gen > bx, plan
    finally:
        simcore.release_similarity_caches()


def test_assortativity_moment_pass_is_partial_aggregated(spark, sf_dir):
    """The 2|E| moment pass must partial-aggregate map-side (the
    shuffle carries moment partials, not edges) and reuse the
    persisted edge/degree tables."""
    from etl_pipeline_example_spark.operators import simcore
    from etl_pipeline_example_spark.plans.assort import graph_assortativity

    try:
        plan = plan_str(graph_assortativity(spark, sf_dir))
        assert "partial_sum" in plan or "partial" in plan, plan
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        simcore.release_similarity_caches()


def test_mutual_top_pairs_prunes_and_rank1_windows(spark, sf_dir):
    """The spend aggregate's scans read only the join/measure columns,
    and both rank filters are WindowGroupLimit-prunable (rank-1)."""
    from etl_pipeline_example_spark.plans.mutualtop import (
        q_mutual_top_pairs,
    )

    plan = plan_str(q_mutual_top_pairs(spark, sf_dir))
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    assert all("l_comment" not in ln and "o_orderdate" not in ln
               for ln in schema_lines), schema_lines
    assert "WindowGroupLimit" in plan, "rank-1 filters must push into the window"


def test_dq_dup_rows_one_partial_agg_scan_per_table(spark, sf_dir):
    """Every per-table group-by-all aggregates map-side (partial_count
    before the exchange) — duplicate-free tables shrink to unique rows
    before any shuffle."""
    from etl_pipeline_example_spark.plans.duprows import dq_dup_rows

    plan = plan_str(dq_dup_rows(spark, sf_dir))
    assert "partial_count" in plan, "group-by-all must partial-aggregate"
    # 10 tables -> 10 scans, no more (no per-column scan explosion);
    # simple mode so node names aren't double-counted by the detail
    # section of formatted mode
    simple = plan_str(dq_dup_rows(spark, sf_dir), "simple")
    n_scans = simple.count("FileScan parquet")
    assert n_scans == 10, n_scans


def test_ann_radius_no_window_and_ids_only_on_shuffle(spark, sf_dir):
    """The radius form has NO rank window (its whole point vs top-k),
    and embeddings never ride an exchange (id-pairs only — the family
    invariant)."""
    from etl_pipeline_example_spark.operators.annradius import ann_radius

    df = ann_radius(spark, sf_dir)
    plan = plan_str(df)
    assert "Window" not in plan, "radius search must not rank"
    for ln in plan.splitlines():
        if "Exchange" in ln and "embedding#" in ln:
            raise AssertionError(f"vectors on a shuffle: {ln}")


def test_lang_margin_single_projection_no_exchange(spark, sf_dir):
    """One scan, pure projection: no Exchange anywhere before the
    output sort (cheapest possible per-doc panel)."""
    from etl_pipeline_example_spark.operators.langmargin import lang_margin

    # simple mode: node arguments inline, so the range-partition
    # exemption can be tested per line
    plan = plan_str(lang_margin(spark, sf_dir), "simple")
    n_ex = sum(1 for ln in plan.splitlines()
               if "Exchange" in ln and "rangepartitioning" not in ln)
    assert n_ex == 0, plan


def test_events_lag_spearman_partial_agg_daily(spark, sf_dir):
    """The corpus-scale (type, day) aggregate partial-aggregates before
    its exchange; the rank windows run on the bounded daily spine."""
    from etl_pipeline_example_spark.plans.lagspearman import (
        events_lag_spearman,
    )

    plan = plan_str(events_lag_spearman(spark, sf_dir))
    assert "partial_count" in plan
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert all("props" not in ln and "user_id" not in ln
               for ln in schema_lines), schema_lines


def test_quality_trained_text_never_shuffles_weights_broadcast(
    spark, sf_dir
):
    """The trained gate's scoring plan: the weight table enters as a
    broadcast join and document text never rides an exchange (only the
    narrow (doc_id, y, b, c) spine shuffles)."""
    from etl_pipeline_example_spark.operators.qtrain import quality_trained

    df = quality_trained(spark, sf_dir)
    plan = plan_str(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln and "text#" in ln:
            raise AssertionError(f"text on a shuffle: {ln}")


def test_quality_blocklist_lexicon_broadcasts(spark, sf_dir):
    """The categorized gate joins the exploded tokens against a
    BROADCAST lexicon (never a literal indexed in a lambda), and text
    never rides an exchange."""
    from etl_pipeline_example_spark.operators.blocklist import (
        quality_blocklist,
    )

    plan = plan_str(quality_blocklist(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    for ln in plan.splitlines():
        if "Exchange" in ln and "text#" in ln:
            raise AssertionError(f"text on a shuffle: {ln}")


def test_table_checksum_parts_partial_aggregates_three_scans(
    spark, sf_dir
):
    """One scan per fact table, decimal checksum partial-aggregated
    map-side before the calendar-key exchange."""
    from etl_pipeline_example_spark.plans.partchecksum import (
        table_checksum_parts,
    )

    simple = plan_str(table_checksum_parts(spark, sf_dir), "simple")
    assert simple.count("FileScan parquet") == 3, simple
    assert "partial_count" in plan_str(
        table_checksum_parts(spark, sf_dir)
    )


def test_q_decile_migration_one_scan_broadcast_cuts_no_window(
    spark, sf_dir
):
    """Both periods' revenues come from ONE orders scan (conditional
    aggregate, not two scans); the quintile cuts broadcast back; no
    global window anywhere."""
    from etl_pipeline_example_spark.plans.decilemig import (
        q_decile_migration,
    )

    df = q_decile_migration(spark, sf_dir)
    simple = plan_str(df, "simple")
    assert simple.count("FileScan parquet") <= 2, simple  # per + cuts reuse
    assert "Window" not in simple
    assert "Broadcast" in simple


def test_graph_kcore2_no_cartesian_and_reuses_persisted_adjacency(
    spark, sf_dir
):
    """Every peel round joins on node keys (no cartesian product), and
    the symmetric adjacency is served from the tracked persist."""
    from etl_pipeline_example_spark.plans.kcore import graph_kcore2

    df = graph_kcore2(spark, sf_dir)
    simple = plan_str(df, "simple")
    assert "CartesianProduct" not in simple
    assert "InMemoryTableScan" in simple, "adjacency must be persisted"


def test_bm25_text_never_shuffles_window_partitioned(spark, sf_dir):
    """BM25's scoring join moves only (ids, integers): document text
    never rides an exchange; the bigram spine is served from the
    tracked persist; the top-K window partitions by query_id (a
    WindowGroupLimit-prunable partitioned rank, never a global sort);
    corpus stats arrive on a broadcast, not a shuffle."""
    from etl_pipeline_example_spark.operators.bm25 import bm25_rank

    df = bm25_rank(spark, sf_dir)
    simple = plan_str(df, "simple")
    for ln in simple.splitlines():
        if "Exchange" in ln and "text#" in ln:
            raise AssertionError(f"text on a shuffle: {ln}")
    assert "InMemoryTableScan" in simple, "bigram spine must be persisted"
    assert "CartesianProduct" not in simple  # stats ride a broadcast NLJ
    win = [ln for ln in simple.splitlines() if "Window" in ln]
    assert win and all("query_id" in ln for ln in win), win


def test_jpeg_decode_is_shuffle_free_single_arrow_pass(spark, sf_dir):
    """The JPEG decode is one Arrow-batched mapInPandas over doc_ids —
    no shuffle, no join, no state (the mediapixels class)."""
    from etl_pipeline_example_spark.operators.jpegdecode import (
        multimodal_decode_jpeg,
    )

    plan = plan_str(multimodal_decode_jpeg(spark, sf_dir), mode="simple")
    # the only exchange allowed is the deliberate round-robin work
    # spread (parallel=True); never a key shuffle of payload/stat rows
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_jpegprog_decode_is_shuffle_free_single_arrow_pass(spark, sf_dir):
    """The progressive-JPEG decode keeps the same scale shape as the
    baseline one: one Arrow-batched mapInPandas pass, no key shuffle —
    ten entropy scans per document all happen inside the same batch."""
    from etl_pipeline_example_spark.operators.jpegprog import (
        multimodal_decode_jpeg2,
    )

    plan = plan_str(multimodal_decode_jpeg2(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_cms_sketch_bounded_state_broadcast_probe_takeordered_topk(
    spark, sf_dir
):
    """The sketch counter table (D*W = 256 rows, input-size-free) joins
    the probe side as a BROADCAST; the exact top-K is
    TakeOrderedAndProject, never a global sort; no window anywhere."""
    from etl_pipeline_example_spark.operators.cmsketch import (
        sketch_cms_topk,
    )

    plan = plan_str(sketch_cms_topk(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_editdist_prefixes_not_full_text_on_join(spark, sf_dir):
    """The Levenshtein verifier joins 64-char PREFIX projections, so
    full document text never rides the pair join's exchanges."""
    from etl_pipeline_example_spark.operators.editdist import (
        dedup_editdist,
    )

    plan = plan_str(dedup_editdist(spark, sf_dir), mode="simple")
    assert "levenshtein" in plan, plan
    for ln in plan.splitlines():
        if "Exchange" in ln and "text#" in ln:
            raise AssertionError(f"full text on a shuffle: {ln}")


def test_basket_triples_apriori_semijoins_before_count(spark, sf_dir):
    """The 3-itemset lattice walk must prune via L2 left-semi probes
    BEFORE the support aggregation (never a cubic item self-join), and
    the item spine must be served from the tracked persist."""
    from etl_pipeline_example_spark.plans.triples import q_basket_triples

    plan = plan_str(q_basket_triples(spark, sf_dir), mode="simple")
    assert plan.count("LeftSemi") >= 3, plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, plan


def test_hll_registers_ladder_broadcasts_output_register_bounded(
    spark, sf_dir
):
    """The bitlen ladder joins as a BROADCAST (55 rows) and the final
    aggregate is register-keyed — output 2^P rows regardless of input;
    no window, no cartesian against data-sized frames."""
    from etl_pipeline_example_spark.operators.hll import (
        sketch_hll_registers,
    )

    plan = plan_str(sketch_hll_registers(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_jpeg_dchash_is_shuffle_free_single_arrow_pass(spark, sf_dir):
    """Like the full decode: one mapInPandas, never a key shuffle."""
    from etl_pipeline_example_spark.operators.jpegdchash import (
        multimodal_jpeg_dchash,
    )

    plan = plan_str(multimodal_jpeg_dchash(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_node_jaccard_no_allpairs_takeordered(spark, sf_dir):
    """Candidates come from wedge aggregation (no cartesian), existing
    edges anti-join out, degrees join from the persisted map, and the
    top-K is TakeOrderedAndProject — never a global sort."""
    from etl_pipeline_example_spark.plans.nodejaccard import (
        graph_node_jaccard,
    )

    plan = plan_str(graph_node_jaccard(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_kmv_topk_is_window_group_limit_not_global_sort(spark, sf_dir):
    """The bottom-K per group must be a WindowGroupLimit rank filter;
    the only full sort allowed is over the G·K kept rows (the union
    merge), never over the distinct key stream."""
    from etl_pipeline_example_spark.operators.kmv import (
        sketch_kmv_distinct,
    )

    plan = plan_str(sketch_kmv_distinct(spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in plan, plan


def test_burst_window_is_partitioned_and_topk_bounded(spark, sf_dir):
    """The sliding-hour count rides a window PARTITIONED BY user_id
    (hashpartitioning exchange, never SinglePartition before the
    window) and the final top-20 is TakeOrderedAndProject."""
    from etl_pipeline_example_spark.operators.burst import (
        events_burst_topk,
    )

    plan = plan_str(events_burst_topk(spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows and all("user_id" in ln for ln in windows), plan


def test_tfcos_no_cartesian_and_broadcast_corpus_stats(spark, sf_dir):
    """The pair join is keyed on term (df-capped posting join); the
    only nested-loop is the broadcast one-row corpus-count frame."""
    from etl_pipeline_example_spark.operators.tfcos import (
        dedup_tfidf_cosine,
    )

    plan = plan_str(dedup_tfidf_cosine(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    # the component frame is persisted: each InMemoryTableScan PRINT
    # repeats the cached subtree (incl. its one-row broadcast
    # nested-loop), but the subtree computes once
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    ), plan


def test_shuffle_audit_window_partitioned_by_shard(spark, sf_dir):
    """The adjacency lag is computed per shard — the window exchange
    partitions on the shard key, never SinglePartition (a global order
    over the corpus would defeat the sharded-shuffle design)."""
    from etl_pipeline_example_spark.operators.shuffleaudit import (
        shuffle_run_audit,
    )

    plan = plan_str(shuffle_run_audit(spark, sf_dir), mode="simple")
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows and all("shard" in ln for ln in windows), plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrdered")[0], plan


def test_bm25_prf_persisted_spine_and_window_group_limits(spark, sf_dir):
    """Both rank selections (feedback top-R, final top-K) compile to
    WindowGroupLimit; the bigram spine is persisted (InMemoryTableScan)
    so the two passes share one tokenize+explode; the only nested-loop
    joins are the broadcast one-row corpus-stats frames."""
    from etl_pipeline_example_spark.operators.bm25prf import bm25_prf

    plan = plan_str(bm25_prf(spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_moments_single_partial_aggregate_no_window(spark, sf_dir):
    """The power sums map-side combine (partial HashAggregate) and the
    merged row aggregates the G-row per-group frame — no window, no
    sort over the event stream."""
    from etl_pipeline_example_spark.operators.moments import sketch_moments

    plan = plan_str(sketch_moments(spark, sf_dir), mode="simple")
    assert "partial" in plan.lower(), plan
    assert "Window" not in plan, plan


def test_kanon_broadcast_threshold_table(spark, sf_dir):
    """The 4-row threshold table joins the class-size frame as a
    broadcast; the quasi-id aggregate partial-aggregates map-side."""
    from etl_pipeline_example_spark.operators.kanon import (
        privacy_k_anonymity,
    )

    plan = plan_str(privacy_k_anonymity(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnow_array_side_selection_no_window(spark, sf_dir):
    """The k-gram hashing and window-minimum selection run inside
    array expressions per document — no Window operator, no join until
    the df-capped fingerprint join; no cartesian."""
    from etl_pipeline_example_spark.operators.winnow import (
        dedup_winnow_pairs,
    )

    plan = plan_str(dedup_winnow_pairs(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tcloseness_broadcast_stats_no_window(spark, sf_dir):
    """Global segment counts and the corpus total join broadcast; the
    class census partial-aggregates; no window anywhere."""
    from etl_pipeline_example_spark.operators.kanon import (
        privacy_t_closeness,
    )

    plan = plan_str(privacy_t_closeness(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_cusum_windows_partitioned_over_day_grain(spark, sf_dir):
    """All CUSUM windows partition by event_type and ride the DAY
    grain (one aggregate reduces events to days first); never
    SinglePartition."""
    from etl_pipeline_example_spark.operators.cusum import (
        events_cusum_shift,
    )

    plan = plan_str(events_cusum_shift(spark, sf_dir), mode="simple")
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows and all("grp" in ln for ln in windows), plan
    assert "Exchange SinglePartition" not in plan, plan


def test_mp3_decode_is_shuffle_free_single_arrow_pass(spark, sf_dir):
    """The MP3 Layer-III decode keeps the media-pass scale shape: one
    Arrow-batched mapInPandas pass, no key shuffle — framing, bit
    reservoir, Huffman, requantize, IMDCT and synthesis all happen
    inside the same batch."""
    from etl_pipeline_example_spark.operators.mp3 import (
        multimodal_decode_mp3,
    )

    plan = plan_str(multimodal_decode_mp3(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_mp3_subband_is_shuffle_free_single_arrow_pass(spark, sf_dir):
    """The composed subband census keeps the decode's scale shape: one
    Arrow pass, no key shuffle."""
    from etl_pipeline_example_spark.operators.mp3 import (
        multimodal_mp3_subband,
    )

    plan = plan_str(multimodal_mp3_subband(spark, sf_dir), mode="simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_stream_cusum_windows_partitioned_over_day_grain(spark, sf_dir):
    """The streaming twin's post-drain scan keeps the batch op's
    discipline: every window partitions by event_type over the bounded
    day grid; never SinglePartition."""
    from etl_pipeline_example_spark.streaming.cusumfeed import (
        stream_cusum_shift,
    )

    plan = plan_str(stream_cusum_shift(spark, sf_dir), mode="simple")
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows and all("grp" in ln for ln in windows), plan
    assert "Exchange SinglePartition" not in plan, plan


def test_dpclip_broadcast_cap_table(spark, sf_dir):
    """The 4-row cap table joins the per-user contribution frame as a
    broadcast; no cartesian, no window, no global sort."""
    from etl_pipeline_example_spark.operators.dpclip import (
        privacy_contribution_bound,
    )

    plan = plan_str(privacy_contribution_bound(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_asof_nearest_is_joinless_single_user_window(spark, sf_dir):
    """The as-of join compiles to the union-window plan: ZERO join
    operators, one user-partitioned window — never the inequality
    self-join fan-out."""
    from etl_pipeline_example_spark.plans.asofjoin import q_asof_nearest

    plan = plan_str(q_asof_nearest(spark, sf_dir), mode="simple")
    assert "Join" not in plan, plan
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows and all("user_id" in ln for ln in windows), plan
    assert "Exchange SinglePartition" not in plan, plan


def test_bfs_layers_bounded_rounds_no_cartesian(spark, sf_dir):
    """Layer-capped BFS is a FIXED chain of frontier joins (K=3), each
    round localCheckpoint-ed (r17 optimization: the un-checkpointed
    plan held 2^K copies of the dist subtree and AQE re-ran the edge
    build per stage-job).  The returned plan is therefore a bounded
    aggregate over the final checkpoint RDD — no cartesian product, no
    parquet re-scan above the checkpoint cut; the TakeOrdered seed pick
    and the persisted edge spine are properties of the per-round plans,
    exercised by the checkpoint jobs themselves."""
    from etl_pipeline_example_spark.plans.bfs import graph_bfs_layers

    plan = plan_str(graph_bfs_layers(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "ExistingRDD" in plan, plan  # rounds checkpoint-linearized
    assert "Scan parquet" not in plan, plan  # lineage cut above scans


def test_url_canonical_codegen_no_udf_single_agg(spark, sf_dir):
    """The canonicalizer is pure built-in string expressions — no
    Python UDF node, no window; one hash aggregate chain (the distinct
    rides inside it), no cartesian."""
    from etl_pipeline_example_spark.operators.urlcanon import (
        dedup_url_canonical,
    )

    plan = plan_str(dedup_url_canonical(spark, sf_dir), mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
