"""Quality (not just parity) checks for the similarity operators."""

from __future__ import annotations

from etl_pipeline_example_spark.operators.similarity import ann_bruteforce, ann_lsh


def test_lsh_recall_floor(spark, sf_dir):
    """Multi-table LSH must massively beat single-bucket recall on this
    uniform-random data (theory: ~0.4+ at cos≈0.3; a broken bucketer or a
    single-table regression lands near 0.02)."""
    bf = {(r.query_id, r.neighbor_id) for r in ann_bruteforce(spark, sf_dir).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in ann_lsh(spark, sf_dir).collect()}
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.25, f"LSH recall@10 regressed: {recall:.2f}"


def test_bruteforce_self_excluded_and_ranked(spark, sf_dir):
    rows = ann_bruteforce(spark, sf_dir).collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_dedup_lsh_finds_all_tau_pairs(spark, sf_dir):
    """16 tables × 2 bits at τ=0.4 has per-pair miss probability ≈3e-4, so
    on this corpus the LSH-blocked pass must find the exhaustive τ-pair
    set exactly (and by construction never a sub-τ pair)."""
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.similarity import (
        EMB_TAU,
        _SPARK_DOT,
        _with_norm,
        dedup_embedding_lsh,
    )
    from etl_pipeline_example_spark.sources.readers import read_table

    emb = _with_norm(read_table(spark, sf_dir, "embeddings"), "embedding", "nrm")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = _SPARK_DOT.format(a="ea", b="eb")
    exhaustive = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.expr(f"round(({dot}) / (na * nb), 6)").alias("cos"))
        .filter(F.col("cos") >= EMB_TAU)
        .collect()
    }
    lsh = {(r.vec_a, r.vec_b) for r in dedup_embedding_lsh(spark, sf_dir).collect()}
    assert lsh <= exhaustive, f"sub-τ pairs leaked: {sorted(lsh - exhaustive)[:5]}"
    recall = len(lsh & exhaustive) / max(1, len(exhaustive))
    assert recall >= 0.95, f"LSH near-dup recall regressed: {recall:.3f}"


def test_kmeans_improves_on_init_and_fills_clusters(spark, sf_dir):
    """Lloyd monotonicity: reassignment against the recomputed means must
    not increase total within-cluster distance vs the init assignment,
    and the final labeling should use every centroid (hash-sampled init
    on this data leaves no empty cells)."""
    from pyspark.sql import functions as F

    from pyspark.sql import Window

    from etl_pipeline_example_spark.operators.similarity import (
        KMEANS_K,
        _spark_assign,
        kmeans_assign,
        spark_hexint,
    )
    from etl_pipeline_example_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w = Window.orderBy(
        F.expr(spark_hexint("cast(vec_id as string)")).asc(), F.col("vec_id").asc()
    )
    cents = (
        emb.orderBy(
            F.expr(spark_hexint("cast(vec_id as string)")).asc(), F.col("vec_id").asc()
        )
        .limit(KMEANS_K)
        .select(
            (F.row_number().over(w) - 1).alias("cluster_id"),
            F.expr("transform(embedding, x -> round(cast(x as double), 6))").alias("cent"),
        )
    )
    a1 = _spark_assign(emb, cents)
    d1 = a1.agg(F.sum("dist")).collect()[0][0]
    final = kmeans_assign(spark, sf_dir)
    d2 = final.agg(F.sum("dist")).collect()[0][0]
    assert d2 <= d1 + 1e-6, f"Lloyd step increased distortion: {d1} -> {d2}"
    n_clusters = final.select("cluster_id").distinct().count()
    assert n_clusters == KMEANS_K, f"empty clusters: {n_clusters}/{KMEANS_K}"


def test_int8_rerank_recall(spark, sf_dir):
    """int8 coarse scoring with a 50-candidate rerank must recover nearly
    all of the exact top-10 — quantization error is small relative to the
    cosine gaps even on this uniform data (a broken code or a
    missing-rerank regression collapses toward random)."""
    from etl_pipeline_example_spark.operators.similarity import ann_int8_rerank

    bf = {(r.query_id, r.neighbor_id) for r in ann_bruteforce(spark, sf_dir).collect()}
    rr = {(r.query_id, r.neighbor_id) for r in ann_int8_rerank(spark, sf_dir).collect()}
    recall = len(bf & rr) / len(bf)
    assert recall >= 0.8, f"int8 rerank recall@10 regressed: {recall:.2f}"


def test_semdedup_drops_are_well_formed(spark, sf_dir):
    """Every dropped vector points at a LOWER-id keeper above τ, and a
    vector appears at most once in the drop list."""
    from etl_pipeline_example_spark.operators.similarity import EMB_TAU, semdedup_prune

    rows = semdedup_prune(spark, sf_dir).collect()
    assert rows, "prune list unexpectedly empty"
    assert all(r["dup_of"] < r["vec_id"] for r in rows)
    assert all(r["cosine"] >= EMB_TAU for r in rows)
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_ivf_recall_floor(spark, sf_dir):
    """Probing 16 of 64 fixed cells must recover a meaningful share of the
    true top-10 (uniform-random data is IVF's worst case; a broken
    assignment or single-cell probe lands near 1/64; measured 0.66 —
    neighbors concentrate in the query's nearest cells)."""
    from etl_pipeline_example_spark.operators.similarity import ann_ivf

    bf = {(r.query_id, r.neighbor_id) for r in ann_bruteforce(spark, sf_dir).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in ann_ivf(spark, sf_dir).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.25, f"IVF recall@10 regressed: {recall:.2f}"


def test_kmeans_fit_converges_with_monotone_inertia(spark, sf_dir):
    """The convergence-probed Lloyd loop must descend: per-round inertia
    non-increasing (within the 6-dp rounding slack) and the loop exits
    before the cap on this data — iteration count is a measured
    plateau, not a magic constant."""
    from etl_pipeline_example_spark.operators.similarity import kmeans_fit

    assign, inertias = kmeans_fit(spark, sf_dir, max_rounds=20)
    assert len(inertias) >= 2, inertias
    assert len(inertias) < 20, f"hit the cap: {inertias}"
    for prev, cur in zip(inertias, inertias[1:]):
        assert cur <= prev + 1e-6, f"inertia increased: {inertias}"
    # the returned assignment is the converged one: every vector labeled
    assert assign.count() == assign.select("vec_id").distinct().count()


def test_kmeans_fit_raises_at_round_cap(spark, sf_dir):
    """A cap too small to even compare two rounds must raise, not return
    a mid-descent labeling as if it were final."""
    import pytest

    from etl_pipeline_example_spark.operators.similarity import (
        KMeansNotConverged,
        kmeans_fit,
    )

    with pytest.raises(KMeansNotConverged):
        kmeans_fit(spark, sf_dir, max_rounds=1)


def test_semdedup_2l_drops_are_well_formed(spark, sf_dir):
    """Scale-shaped variant keeps the fixed-K contract: every dropped
    vector points at a lower-id cluster-mate above τ, at most one drop
    row per vector."""
    from etl_pipeline_example_spark.operators.similarity import (
        EMB_TAU,
        semdedup_prune_2l,
    )

    rows = semdedup_prune_2l(spark, sf_dir).collect()
    assert rows, "prune list unexpectedly empty"
    assert all(r["dup_of"] < r["vec_id"] for r in rows)
    assert all(r["cosine"] >= EMB_TAU for r in rows)
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_lsh_production_tau_prunes_orders_of_magnitude(spark):
    """The docstring claim under test: at production τ≈0.9 with 12-bit
    tables, the LSH bucket machinery prunes the candidate pair space by
    orders of magnitude while keeping near-dup recall. Planted near-dups
    (cosine ≈0.97) on a random corpus: random pairs collide per table
    with probability ~0.5¹² ≈ 2e-4, τ-pairs with ~0.87¹² ≈ 0.19 per
    table (≈96% over 16 tables)."""
    import numpy as np

    from etl_pipeline_example_spark.operators.similarity import lsh_candidate_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup_src = base[:30]
    noise = rng.standard_normal((30, 64)) * 0.25 / 8.0  # |noise| ≈ 0.25
    dups = dup_src + noise
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    planted = {
        (i, 1000 + i)
        for i in range(30)
        if float(dup_src[i] @ dups[i]) >= 0.9
    }
    assert len(planted) >= 25  # construction sanity: most copies are τ-pairs

    rows = [(i, base[i].tolist()) for i in range(300)] + [
        (1000 + i, dups[i].tolist()) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cand = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs(spark, emb, tables=16, bits=12).collect()
    }
    n = len(rows)
    all_pairs = n * (n - 1) // 2
    # orders-of-magnitude pruning: candidate space is a small fraction of
    # the all-pairs space (measured ~1%, asserted with slack)
    assert len(cand) <= all_pairs // 20, (len(cand), all_pairs)
    # and the τ-pairs survive the pruning
    recall = len(cand & planted) / len(planted)
    assert recall >= 0.9, f"production-τ recall regressed: {recall:.2f}"


def test_pq_adc_recall(spark, sf_dir):
    """8-byte PQ codes + 50-candidate ADC shortlist + exact rerank must
    recover a solid share of the exact top-10. Uniform-random data is
    PQ's worst case, but the TRAINED per-subspace codebook (round 6)
    lifted the measured recall from ~0.5 to 0.54-0.58 — the floor pins
    the trained level; a broken code table or LUT join collapses to
    ~random (recall ≈ K/N ≈ 0.02), an untrained-codebook regression
    lands near 0.45."""
    from etl_pipeline_example_spark.operators.similarity import ann_pq_adc

    bf = {(r.query_id, r.neighbor_id) for r in ann_bruteforce(spark, sf_dir).collect()}
    pq = {(r.query_id, r.neighbor_id) for r in ann_pq_adc(spark, sf_dir).collect()}
    recall = len(bf & pq) / len(bf)
    assert recall >= 0.45, f"PQ/ADC recall@10 regressed: {recall:.2f}"


def _clustered_corpus(noise: float, n: int = 405, n_centers: int = 16):
    """Clustered synthetic embeddings: n unit vectors around n_centers
    cluster centers (queries vec_id < 5 are cluster members), plus the
    exact top-10 neighbor set per query computed with the same 6-dp
    rounding and (cosine desc, id) tie-break the operators use."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((n_centers, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.stack(
        [centers[i % n_centers] + rng.standard_normal(64) * noise for i in range(n)]
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    cos = pts @ pts.T
    bf = set()
    for q in range(5):
        scores = [(round(cos[q, j], 6), j) for j in range(n) if j != q]
        scores.sort(key=lambda t: (-t[0], t[1]))
        for _, j in scores[:10]:
            bf.add((q, j))
    return [(i, pts[i].tolist()) for i in range(n)], bf


def test_pq_trained_codebook_recall_on_clustered_data(spark):
    """The round-6 'done' criterion: on data WITH cluster structure the
    trained per-subspace k-means codebook must push recall@10 well past
    the hash-sample codebook's level (measured: trained 1.00 vs
    untrained 0.86 at this noise — the floor separates them)."""
    from etl_pipeline_example_spark.operators.pq import _pq_topk
    from etl_pipeline_example_spark.operators.simcore import _with_norm

    rows, bf = _clustered_corpus(noise=0.15)
    emb = _with_norm(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"),
        "embedding",
        "nrm",
    )
    got = {(r.query_id, r.neighbor_id) for r in _pq_topk(spark, emb).collect()}
    recall = len(bf & got) / len(bf)
    assert recall >= 0.9, f"trained-PQ clustered recall regressed: {recall:.2f}"


def test_kmeans_fit_returns_prior_round_on_rounding_uptick(spark, sf_dir, monkeypatch):
    """When the 6-dp rounding nudges the inertia probe UP within
    tolerance, the plateau exit must return the PRIOR round's (better)
    assignment, not the rounding-degraded successor (round-5 ADVICE)."""
    import etl_pipeline_example_spark.operators.kmeans as km

    seq = [10.0, 5.0, 5.0000001]
    calls = {"n": 0}

    def fake_assign(emb, cents):
        i = calls["n"]
        calls["n"] += 1
        # cluster_id marks which round produced the labeling
        return spark.createDataFrame(
            [(0, i, seq[i])], "vec_id bigint, cluster_id int, dist double"
        )

    monkeypatch.setattr(km, "_spark_assign", fake_assign)
    monkeypatch.setattr(
        km,
        "_spark_means",
        lambda emb, a: spark.createDataFrame(
            [(0, [0.0])], "cluster_id int, cent array<double>"
        ),
    )
    assign, inertias = km.kmeans_fit(spark, sf_dir, max_rounds=5)
    assert inertias == seq
    # round 3 plateaued with an INCREASE -> round 2's labeling returned
    assert assign.collect()[0]["cluster_id"] == 1, assign.collect()


def test_similarity_caches_released_between_operators(spark, sf_dir):
    """The cross-operator cache discipline (round-5 ADVICE): repeated
    operator invocations must NOT accumulate persisted RDDs — each run
    releases the previous run's caches on entry."""
    from etl_pipeline_example_spark.operators.similarity import semdedup_prune_2l
    from etl_pipeline_example_spark.operators.simcore import (
        release_similarity_caches,
    )

    def live():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    semdedup_prune_2l(spark, sf_dir).collect()
    n1 = live()
    semdedup_prune_2l(spark, sf_dir).collect()
    n2 = live()
    assert n2 <= n1, f"caches accumulate across runs: {n1} -> {n2}"
    release_similarity_caches()


def test_hier_assign_agrees_with_flat_on_clustered_data(spark):
    """The two-hop hierarchical assignment must label every vector
    exactly once and agree with the flat broadcast assignment on data
    with real cluster structure (a mis-routed hop-1 would crater
    agreement; measured 1.00 at this noise)."""
    from etl_pipeline_example_spark.operators.semdedup import _hier_assign
    from etl_pipeline_example_spark.operators.similarity import _spark_assign

    rows, _ = _clustered_corpus(noise=0.1, n=400)
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cents = spark.createDataFrame(
        [(i, [round(float(x), 6) for x in centers[i]]) for i in range(16)],
        "cluster_id int, cent array<double>",
    )
    flat = {r["vec_id"]: r["cluster_id"] for r in _spark_assign(emb, cents).collect()}
    hier_rows = _hier_assign(emb, cents, super_k=4).collect()
    hier = {r["vec_id"]: r["cluster_id"] for r in hier_rows}
    assert len(hier) == 400 and set(hier) == set(flat)
    agree = sum(1 for v in hier if hier[v] == flat[v]) / len(hier)
    assert agree >= 0.9, f"two-hop assignment diverged from flat: {agree:.2f}"


def test_semdedup_2l_labeling_switches_to_hier_past_threshold(spark, sf_dir, monkeypatch):
    """Past SEMDEDUP_HIER_THRESHOLD cells the labeling stage must take
    the two-hop path and still label the whole corpus exactly once."""
    import etl_pipeline_example_spark.operators.semdedup as sd
    from etl_pipeline_example_spark.operators.simcore import _with_norm
    from etl_pipeline_example_spark.sources.readers import read_table

    monkeypatch.setattr(sd, "SEMDEDUP_HIER_THRESHOLD", 4)
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings"), "embedding", "nrm"
    )
    n = emb.count()
    labels = sd._two_level_labels(emb, k=8).collect()
    assert len(labels) == n
    assert len({r["vec_id"] for r in labels}) == n


def test_semdedup_canonical_representatives_survive(spark, sf_dir):
    """The property the dup_of pointer variants can't give: every
    vector's canonical_id is itself KEPT (never mid-chain dropped), one
    keeper per component, and the kept set covers every prune-list
    vector's component."""
    from etl_pipeline_example_spark.operators.similarity import (
        semdedup_canonical,
        semdedup_prune_2l,
    )

    rows = semdedup_canonical(spark, sf_dir).collect()
    assert rows, "no τ-components found"
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        canon = by_id[r["canonical_id"]]
        assert canon["is_kept"], f"canonical {r['canonical_id']} is not kept"
        assert canon["canonical_id"] == r["canonical_id"]
        assert r["is_kept"] == (r["vec_id"] == r["canonical_id"])
    # exactly one keeper per component
    keepers = [r for r in rows if r["is_kept"]]
    assert len(keepers) == len({r["canonical_id"] for r in rows})
    # the prune list's dropped vectors all appear in some component
    dropped = {r["vec_id"] for r in semdedup_prune_2l(spark, sf_dir).collect()}
    assert dropped <= set(by_id), "prune-list vector missing from components"


def test_ivfpq_recall_and_containment(spark, sf_dir):
    """IVFADC composition: gating by 16-of-64 probed cells can only
    SHRINK the PQ candidate pool, so recall sits at or below ann_pq_adc
    (uniform data is the worst case for both); it must stay far above
    random, and every result must be a vector from a probed cell —
    checked implicitly by row shape (50 rows, ranks 1..10 per query)."""
    from etl_pipeline_example_spark.operators.similarity import ann_ivfpq

    bf = {(r.query_id, r.neighbor_id) for r in ann_bruteforce(spark, sf_dir).collect()}
    rows = ann_ivfpq(spark, sf_dir).collect()
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(bf & got) / len(bf)
    assert recall >= 0.4, f"IVFPQ recall@10 regressed: {recall:.2f}"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_rp_rerank_recall_floor(spark):
    """RP-coarse + exact-rerank recall@10 vs bruteforce on the
    near-uniform sf0.001 vectors (JL's worst case): pin the measured
    floor so a projection/candidate regression shows up."""
    from etl_pipeline_example_spark.operators.rprerank import ann_rp_rerank
    from etl_pipeline_example_spark.operators.similarity import ann_bruteforce

    sf = "/root/testdata/sf0.001"
    bf = {(r["query_id"], r["neighbor_id"]) for r in ann_bruteforce(spark, sf).collect()}
    rp = {(r["query_id"], r["neighbor_id"]) for r in ann_rp_rerank(spark, sf).collect()}
    assert len(bf & rp) / len(bf) >= 0.6, len(bf & rp) / len(bf)


def test_embed_normalize_produces_unit_vectors(spark):
    import math

    from etl_pipeline_example_spark.operators.embednorm import embed_normalize

    rows = embed_normalize(spark, "/root/testdata/sf0.001").collect()
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r)
    assert len(by_vec) >= 20
    for vec_id, comps in list(by_vec.items())[:20]:
        # dims are a contiguous 1-based index and Σ value² == 1
        assert sorted(c["dim"] for c in comps) == list(range(1, len(comps) + 1))
        n = math.sqrt(sum(c["value"] * c["value"] for c in comps))
        assert abs(n - 1.0) < 1e-9, (vec_id, n)


def test_pq_codewords_match_spark_expression_training(spark):
    """The r17 driver-side Lloyd training must be BIT-IDENTICAL to the
    previous in-cluster expression chain (the oracle's arithmetic):
    assignment by round6(_SPARK_SQDIST fold) argmin on (dist, c_id),
    means as exact decimal(30,12) sums cast to double, 6-dp HALF_UP."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.hashing import spark_hexint
    from etl_pipeline_example_spark.operators.pq import (
        PQ_KC,
        PQ_M,
        PQ_SUB,
        PQ_TRAIN_N,
        PQ_TRAIN_ROUNDS,
        _pq_codewords,
    )
    from etl_pipeline_example_spark.operators.simcore import (
        ANN_NUM_QUERIES,
        KMEANS_DECIMAL,
        _SPARK_SQDIST,
        _with_norm,
    )
    from etl_pipeline_example_spark.sources.readers import read_table

    emb = _with_norm(
        read_table(spark, "/root/testdata/sf0.01", "embeddings"), "embedding", "nrm"
    )
    got = {
        (r["m"], r["c_id"]): list(r["cw"])
        for r in _pq_codewords(spark, emb).collect()
    }

    # ---- the previous distributed expression chain, verbatim
    hexid = spark_hexint("cast(vec_id as string)")
    m_df = F.broadcast(spark.range(PQ_M).select(F.col("id").cast("int").alias("m")))
    w_cw = Window.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
    cw_rows = (
        emb.filter(F.col("vec_id") >= ANN_NUM_QUERIES)
        .orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
        .limit(PQ_KC)
        .select(
            (F.row_number().over(w_cw) - 1).alias("c_id"),
            F.col("embedding").alias("cw_emb"),
        )
    )
    cw_local = {
        (r["m"], r["c_id"]): r["cw"]
        for r in cw_rows.crossJoin(m_df)
        .select(
            "m",
            "c_id",
            F.expr(
                f"transform(slice(cw_emb, m * {PQ_SUB} + 1, {PQ_SUB}),"
                " x -> round(cast(x as double), 6))"
            ).alias("cw"),
        )
        .collect()
    }
    sub = (
        emb.filter(F.col("vec_id") >= ANN_NUM_QUERIES)
        .orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
        .limit(PQ_TRAIN_N)
        .select("vec_id", "embedding")
        .crossJoin(m_df)
        .select(
            "vec_id",
            "m",
            F.expr(f"slice(embedding, m * {PQ_SUB} + 1, {PQ_SUB})").alias("sv"),
        )
        .coalesce(1)
        .persist()
    )
    sqd = _SPARK_SQDIST.format(a="sv", b="cw")
    mean_cols = [
        F.expr(
            f"round(cast(sum(cast(element_at(sv, {i + 1}) as {KMEANS_DECIMAL}))"
            f" as double) / count(sv), 6)"
        ).alias(f"mv{i}")
        for i in range(PQ_SUB)
    ]
    cw_schema = "m int, c_id int, cw array<double>"
    for _ in range(PQ_TRAIN_ROUNDS):
        cw_df = spark.createDataFrame(
            [(m, c, v) for (m, c), v in sorted(cw_local.items())], cw_schema
        )
        trained = (
            sub.join(F.broadcast(cw_df), "m")
            .select(
                "vec_id", "m", F.expr(f"round({sqd}, 6)").alias("dist"), "c_id", "sv"
            )
            .groupBy("vec_id", "m")
            .agg(F.min(F.struct("dist", "c_id", "sv")).alias("s"))
            .select("m", F.col("s.c_id").alias("code"), F.col("s.sv").alias("sv"))
            .groupBy("m", "code")
            .agg(*mean_cols)
            .collect()
        )
        for r in trained:
            cw_local[(r["m"], r["code"])] = [r[f"mv{i}"] for i in range(PQ_SUB)]
    sub.unpersist()

    assert set(got) == set(cw_local)
    for key in cw_local:
        assert got[key] == cw_local[key], (key, got[key], cw_local[key])
