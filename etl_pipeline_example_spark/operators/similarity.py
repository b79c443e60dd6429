"""Similarity search over the ``embeddings`` table (64-dim float vectors).

- ``ann_bruteforce`` — exact cosine top-k per query vector. The query set
  broadcasts; the corpus is scanned once with the dot product evaluated as
  a JVM array fold (``aggregate(zip_with(...))`` — whole-stage codegen,
  no Python). One pass, no shuffle except the per-query top-k, which is a
  WindowGroupLimit (per-partition top-k, then merge) — the right baseline
  and the right exact method at any corpus size when |queries| is small.
- ``ann_lsh`` — random-hyperplane LSH (Charikar'02): B pseudo-random
  ±1 hyperplanes derived deterministically from md5(plane, dim); corpus
  bucketed by sign bits; queries probe only their own bucket. Sublinear
  probe cost at scale; recall tested against the brute-force baseline.
- ``dedup_embedding`` — near-dup pairs with cosine ≥ τ, blocked by the
  ``label`` column (cluster id) so the pair space is per-block, not n².

Cosine sums are sequential left-to-right folds in both engines (Spark
``aggregate``, DuckDB list comprehension + ``list_sum``), and similarity is
rounded to 6 dp before any rank/filter so cross-engine float agreement is
exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_hexint, spark_hexint
from etl_pipeline_example_spark.sources.readers import read_table

ANN_K = 10
ANN_NUM_QUERIES = 5  # vec_id < 5 are the query vectors
# The benchmark embeddings are near-uniform (max pairwise cosine ≈ 0.47);
# τ is set where the data actually has pairs so the operator's output is
# non-vacuous. A production near-dup pass would use τ ≈ 0.9.
EMB_TAU = 0.4

# cosine(a, b) with deterministic summation order, doubles throughout
_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)
_DUCK_DOT = "list_sum([ cast({a}[i] as double) * cast({b}[i] as double) for i in range(1, len({a}) + 1) ])"


def _spark_cosine(a: str, b: str) -> str:
    dot = _SPARK_DOT.format(a=a, b=b)
    na = _SPARK_DOT.format(a=a, b=a)
    nb = _SPARK_DOT.format(a=b, b=b)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


def _duck_cosine(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


def _with_norm(df: DataFrame, vec: str, out: str) -> DataFrame:
    """Attach the L2 norm once per vector — pairwise scoring then needs one
    dot product instead of three (3× fewer folds in the hot loop). The
    norm is the same deterministic left-fold + sqrt the inline formula
    used, so rounded cosines are unchanged."""
    self_dot = _SPARK_DOT.format(a=vec, b=vec)
    return df.withColumn(out, F.expr(f"sqrt({self_dot})"))


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank)."""
    emb = _with_norm(read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm")
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = _SPARK_DOT.format(a="q_emb", b="c_emb")
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (q_nrm * c_nrm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


_DUCK_SELF_NORM = "sqrt(" + _DUCK_DOT.format(a="embedding", b="embedding") + ")"

ANN_BRUTEFORCE_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm FROM normed
  WHERE vec_id < {ANN_NUM_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(({_DUCK_DOT.format(a="q.q_emb", b="c.embedding")})
               / (q.q_nrm * c.nrm), 6) AS cosine
  FROM normed c, queries q
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""

LSH_TABLES = 12
LSH_BITS = 6
LSH_DIM = 64


def _lsh_plane_strings(n: int = LSH_TABLES * LSH_BITS) -> list[str]:
    """``n`` deterministic ±1 hyperplanes, each encoded as a 64-char
    '0'/'1' string (char i = sign of dim i). Derived from md5 so the
    oracle can embed the identical literals; precomputing them here
    (instead of hashing per row) keeps the bucket computation pure float
    arithmetic. One shared family: the first k planes are identical for
    any n ≥ k, so every table/bit configuration draws from the same pool.
    """
    import hashlib

    planes = []
    for tp in range(n):
        bits = []
        for i in range(LSH_DIM):
            h = hashlib.md5(f"{tp}_{i}".encode()).hexdigest()
            bits.append("1" if int(h[:15], 16) % 2 == 0 else "0")
        planes.append("".join(bits))
    return planes


_PLANES = _lsh_plane_strings()


def _planes_df(spark: SparkSession, tables: int, bits: int):
    """``tables`` rows (tbl, pvs): each table's ``bits`` hyperplanes as
    ±1.0 vectors.

    Shipping the planes as array<array<double>> columns (one row per
    TABLE, not per plane) lets the bucket be computed in a single
    projection per (vector, table) row — no per-char ``substr`` decode in
    the hot loop, no groupBy to assemble bits, hence zero shuffles in the
    whole corpus-hashing stage. Plane vectors are scalar columns, NOT
    literals indexed inside a lambda, which both engines re-materialize
    per element (measured 60× slower).
    """
    planes = _PLANES if tables * bits <= len(_PLANES) else _lsh_plane_strings(tables * bits)
    rows = []
    for t in range(tables):
        pvs = [
            [1.0 if c == "1" else -1.0 for c in planes[t * bits + b]]
            for b in range(bits)
        ]
        rows.append((t, pvs))
    return spark.createDataFrame(rows, "tbl int, pvs array<array<double>>")


def _bucket_expr(bits: int) -> str:
    """``bits``-bit bucket for one (vector, table) row: fold over the
    table's planes, inner fold is the sign dot product. Same per-element
    products and left-to-right sum order as the oracle, so signs agree
    bit-for-bit."""
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, b) ->"
        " acc + CASE WHEN aggregate(zip_with(embedding, element_at(pvs, b + 1),"
        " (x, p) -> cast(x as double) * p), cast(0 as double), (a2, v) -> a2 + v) >= 0"
        " THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)"
    )


def lsh_candidate_pairs(
    spark: SparkSession, emb: DataFrame, tables: int, bits: int
) -> DataFrame:
    """Narrow (vec_a, vec_b) candidate pairs: ids sharing a (table,
    bucket) cell in any of ``tables`` hash tables of ``bits`` bits.

    The parameterized core of ``dedup_embedding_lsh``: corpus hashing is
    one shuffle-free projection against the broadcast plane table; only
    id-pairs shuffle. ``bits`` is the occupancy knob — at production
    τ≈0.9 run 12-16 bits and the pair space collapses to ~collision-rate
    × N²; the quality test measures exactly that."""
    planes = F.broadcast(_planes_df(spark, tables, bits))
    bucketed = emb.crossJoin(planes).select(
        "vec_id", "tbl", F.expr(_bucket_expr(bits)).alias("bucket")
    )
    a = bucketed.select("tbl", "bucket", F.col("vec_id").alias("vec_a"))
    b = bucketed.select(
        F.col("tbl").alias("tbl_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("vec_id").alias("vec_b"),
    )
    return (
        a.join(
            b,
            (F.col("tbl") == F.col("tbl_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )


def _spark_lsh_bucket_table(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, nrm, tbl, bucket) — one row per vector per hash
    table, computed in one shuffle-free projection over a broadcast
    cross-join. The L2 norm rides along so candidate scoring needs one
    dot product, not three."""
    planes = F.broadcast(_planes_df(spark, LSH_TABLES, LSH_BITS))
    return emb.crossJoin(planes).select(
        "vec_id", "embedding", "nrm", "tbl", F.expr(_bucket_expr(LSH_BITS)).alias("bucket")
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH ANN: candidates are the union of
    the query's bucket across 12 independent 6-bit tables, deduplicated,
    then scored exactly and top-k'd.

    Scale path: the corpus is hashed once (pure JVM float arithmetic
    against a broadcast plane table), stored as (vec_id, table, bucket); a
    query probes 12 buckets ≈ 12/64 of the corpus instead of all of it,
    and the table/bucket join key is what a production system would
    partition by. Recall is governed by (1-(1-p^bits)^tables), p = 1-θ/π:
    ≈0.998 for cosine 0.9 pairs (the near-dup regime LSH is for), ≈0.45
    for the cosine≈0.3 "neighbors" this uniform-random benchmark data has
    — measured against ann_bruteforce in tests.
    """
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    )
    bucketed = _spark_lsh_bucket_table(spark, emb)
    queries = bucketed.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("tbl").alias("q_tbl"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("tbl") == F.col("q_tbl")) & (F.col("bucket") == F.col("q_bucket")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            F.col("nrm").alias("c_nrm"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = _SPARK_DOT.format(a="q_emb", b="embedding")
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.expr(f"round(({dot}) / (q_nrm * c_nrm), 6)").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


_DUCK_PLANES_TBL = "(VALUES " + ", ".join(
    f"({tp}, '{s}')" for tp, s in enumerate(_PLANES)
) + ") AS planes(tp, plane)"

_DUCK_SIGN_DOT = (
    "list_sum([ cast(embedding[i] as double)"
    " * (CASE WHEN substr(plane, i, 1) = '1' THEN 1.0 ELSE -1.0 END)"
    " for i in range(1, len(embedding) + 1) ])"
)

ANN_LSH_SQL = f"""
WITH bits AS (
  SELECT vec_id, tp // {LSH_BITS} AS tbl,
         CASE WHEN ({_DUCK_SIGN_DOT}) >= 0
              THEN (1::BIGINT << (tp % {LSH_BITS})) ELSE 0::BIGINT END AS bitval
  FROM embeddings, {_DUCK_PLANES_TBL}
),
bucketed AS (
  SELECT b.vec_id, e.embedding, b.tbl, b.bucket
  FROM (SELECT vec_id, tbl, sum(bitval)::BIGINT AS bucket
        FROM bits GROUP BY vec_id, tbl) b
  JOIN embeddings e ON e.vec_id = b.vec_id
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, tbl AS q_tbl, bucket AS q_bucket
  FROM bucketed WHERE vec_id < {ANN_NUM_QUERIES}
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM bucketed c JOIN queries q ON c.tbl = q.q_tbl AND c.bucket = q.q_bucket
  WHERE c.vec_id != q.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         {_duck_cosine("qe.embedding", "ne.embedding")} AS cosine
  FROM cand cd
  JOIN embeddings qe ON qe.vec_id = cd.query_id
  JOIN embeddings ne ON ne.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ τ within the same label block.

    Blocking on the cluster label bounds the pair space to Σ|block|² —
    the IVF-style coarse quantization step of a production near-dup
    pipeline (at scale the label comes from k-means/IVF assignment).
    """
    emb = _with_norm(read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm")
    a = emb.select(
        F.col("label").alias("blk"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("label").alias("blk_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = _SPARK_DOT.format(a="ea", b="eb")
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            F.col("blk").alias("label"),
            "vec_a",
            "vec_b",
            F.expr(f"round(({dot}) / (na * nb), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= EMB_TAU)
    )


DEDUP_EMBEDDING_SQL = f"""
WITH normed AS (
  SELECT vec_id, label, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
)
SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(({_DUCK_DOT.format(a="a.embedding", b="b.embedding")})
             / (a.nrm * b.nrm), 6) AS cosine
FROM normed a
JOIN normed b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(({_DUCK_DOT.format(a="a.embedding", b="b.embedding")})
            / (a.nrm * b.nrm), 6) >= {EMB_TAU}
"""


# ----------------------------------------------------- LSH-blocked near-dup

# τ-appropriate plane count for the near-dup pass: collision probability
# per plane is p = 1 - acos(τ)/π (≈0.63 at this benchmark's τ=0.4), so 2
# bits × 16 tables gives per-pair miss probability (1-p²)^16 ≈ 3e-4 —
# effectively exhaustive recall without any all-pairs or per-label join.
# Unlike label blocking (pair space Σ|block|², unbounded under skew, and
# dependent on a pre-existing cluster column), bucket occupancy is set by
# the bit count: at a production τ≈0.9 (p≈0.86) the same machinery runs
# 12-16 bits, where buckets are near-constant-size and the candidate join
# is linear-ish in the corpus. The planes reuse the md5-derived ±1 family
# the ANN index uses, so both engines compute identical buckets.
DEDUP_LSH_TABLES = 16
DEDUP_LSH_BITS = 2


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via LSH bucket blocking: candidates are
    pairs sharing a (table, bucket) cell in any of the 16 hash tables,
    scored exactly, kept when cosine ≥ τ.

    Scale path: corpus hashing is one shuffle-free projection against the
    broadcast plane table (same stage shape as ``ann_lsh``); candidates
    are NARROW id-pairs shuffled on (tbl, bucket) — a key a production
    index would bucket-write, making the self-join co-located — and the
    vectors re-join only for exact scoring of the deduplicated pairs. No
    label column needed and no Σ|block|² exposure to label skew; the bit
    count is the knob that keeps bucket occupancy (and thus the pair
    space) bounded as the corpus grows. Honest caveat: the pruning power
    is the per-plane probability GAP between τ-pairs (p = 1-acos(τ)/π)
    and random pairs (p = ½). At this benchmark's τ=0.4 the gap is 0.63
    vs 0.50, so few-bit tables that preserve recall admit most random
    pairs — near-exhaustive scoring is inherent to the τ, not the plan.
    At a production near-dup τ≈0.9 (p≈0.86 vs 0.50) the same machinery
    runs 12-16 bits per table and prunes the pair space by orders of
    magnitude.
    """
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    ).persist()
    # narrow (vec_id, tbl, bucket) rows — the embedding column must NOT
    # ride through the candidate join (wide arrays through that shuffle
    # dominated the runtime); vectors re-join only for the final scoring.
    # A first-match-table emission scheme (carry the 16-bucket signature
    # through the join, keep a pair only in its earliest colliding table)
    # would delete the dedup shuffle — measured 8× SLOWER here: the
    # signature comparison is a higher-order-function lambda, which is
    # interpreted per joined row (no whole-stage codegen), and the join
    # output is ~2N² rows. The narrow dropDuplicates exchange wins.
    cand = lsh_candidate_pairs(spark, emb, DEDUP_LSH_TABLES, DEDUP_LSH_BITS)
    x = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = _SPARK_DOT.format(a="ea", b="eb")
    return (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.expr(f"round(({dot}) / (na * nb), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= EMB_TAU)
    )


_DUCK_DEDUP_PLANES_TBL = "(VALUES " + ", ".join(
    f"({tp}, '{s}')" for tp, s in enumerate(_PLANES[: DEDUP_LSH_TABLES * DEDUP_LSH_BITS])
) + ") AS planes(tp, plane)"

DEDUP_EMBEDDING_LSH_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
bits AS (
  SELECT vec_id, tp // {DEDUP_LSH_BITS} AS tbl,
         CASE WHEN ({_DUCK_SIGN_DOT}) >= 0
              THEN (1::BIGINT << (tp % {DEDUP_LSH_BITS})) ELSE 0::BIGINT END AS bitval
  FROM embeddings, {_DUCK_DEDUP_PLANES_TBL}
),
bucketed AS (
  SELECT vec_id, tbl, sum(bitval)::BIGINT AS bucket
  FROM bits GROUP BY vec_id, tbl
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketed a JOIN bucketed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM (
  SELECT cd.vec_a, cd.vec_b,
         round(({_DUCK_DOT.format(a="x.embedding", b="y.embedding")})
               / (x.nrm * y.nrm), 6) AS cosine
  FROM cand cd
  JOIN normed x ON x.vec_id = cd.vec_a
  JOIN normed y ON y.vec_id = cd.vec_b
) WHERE cosine >= {EMB_TAU}
"""


# --------------------------------------------------------------------- IVF

# Deterministic coarse quantizer: centroids are the IVF_K corpus vectors
# with the smallest 60-bit md5 hash of their id — a deterministic uniform
# sample with a FIXED cell count, identical in both engines, disjoint from
# the query ids (0..4). K is bounded regardless of corpus size, so
# assignment is O(N·K) with an O(K) centroid broadcast (a mod-N/31 scheme
# would make assignment quadratic and the broadcast linear in N). Spark
# realizes the hash-ordered LIMIT as TakeOrderedAndProject — a per-
# partition top-K merge, not a global sort. A production pipeline would
# train k-means centroids; the *plan shape* — assign in one broadcast
# pass, probe nprobe cells, score only candidates — is the same either way.
IVF_K = 64
IVF_NPROBE = 16


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into cells, probe the query's
    ``IVF_NPROBE`` nearest cells, score candidates exactly, top-k.

    Scale path: assignment is ONE broadcast pass (corpus × K centroids,
    narrow (vec_id, cell) output — the embedding column is dropped before
    any shuffle); probing touches nprobe/K of the corpus instead of all
    of it. The cell id is what a production system partitions (and
    bucket-writes) the index by, so a probe is a partition-pruned scan.
    """
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    )
    cents = (
        emb.filter(F.col("vec_id") >= ANN_NUM_QUERIES)
        .orderBy(
            F.expr(spark_hexint("cast(vec_id as string)")).asc(), F.col("vec_id").asc()
        )
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    dot_c = _SPARK_DOT.format(a="embedding", b="cent_emb")
    # narrow (vec_id, cent_id, cosine) rows — nothing wide shuffles
    cell_scores = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        F.expr(f"round(({dot_c}) / (nrm * cent_nrm), 6)").alias("ccos"),
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    # persisted: assign and probes both consume it — the corpus×centroid
    # scoring is the operator's dominant stage and must run once
    ranked = cell_scores.withColumn("crn", F.row_number().over(w_cell)).persist()
    assign = ranked.filter(F.col("crn") == 1).select("vec_id", F.col("cent_id").alias("cell"))
    probes = (
        ranked.filter((F.col("vec_id") < ANN_NUM_QUERIES) & (F.col("crn") <= IVF_NPROBE))
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot_q = _SPARK_DOT.format(a="q_emb", b="embedding")
    scored = (
        cand.join(emb, cand.neighbor_id == emb.vec_id)
        .join(F.broadcast(queries), cand.query_id == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot_q}) / (q_nrm * nrm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


ANN_IVF_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS cent_emb, nrm AS cent_nrm
  FROM normed WHERE vec_id >= {ANN_NUM_QUERIES}
  ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id
  LIMIT {IVF_K}
),
cell_scores AS (
  SELECT n.vec_id, c.cent_id,
         round(({_DUCK_DOT.format(a="n.embedding", b="c.cent_emb")})
               / (n.nrm * c.cent_nrm), 6) AS ccos
  FROM normed n, cents c
),
ranked AS (
  SELECT vec_id, cent_id, ccos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cent_id) AS crn
  FROM cell_scores
),
assign AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM ranked
  WHERE vec_id < {ANN_NUM_QUERIES} AND crn <= {IVF_NPROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM assign a JOIN probes p USING (cell)
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         round(({_DUCK_DOT.format(a="q.embedding", b="n.embedding")})
               / (q.nrm * n.nrm), 6) AS cosine
  FROM cand cd
  JOIN normed q ON q.vec_id = cd.query_id
  JOIN normed n ON n.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


# ------------------------------------------------------------------ k-means

# Deterministic 2-iteration Lloyd clustering over the embedding column —
# the coarse-quantizer training step the IVF/near-dup operators assume
# exists at scale (SemDedup-style pipelines: cluster, then prune within
# cells). Everything is cross-engine exact: init centroids are the
# hash-ordered sample, per-cluster means go through EXACT decimal sums
# (order-independent, so Spark's partial aggregation and DuckDB's
# single-threaded sum agree bit-for-bit) rounded to 6 dp, and distances
# round to 6 dp before the argmin with a cluster-id tie-break.
KMEANS_K = 8
KMEANS_DECIMAL = "decimal(30,12)"

_SPARK_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double))), cast(0 as double), (acc, v) -> acc + v)"
)
_DUCK_SQDIST = (
    "list_sum([ (cast({a}[i] as double) - cast({b}[i] as double))"
    " * (cast({a}[i] as double) - cast({b}[i] as double))"
    " for i in range(1, len({a}) + 1) ])"
)


def _spark_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cluster_id, dist): nearest centroid per vector — one pass
    over the corpus against the broadcast K-row centroid table, argmin by
    WindowGroupLimit (per-partition top-1, then merge)."""
    sqd = _SPARK_SQDIST.format(a="embedding", b="cent")
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cluster_id",
        F.expr(f"round({sqd}, 6)").alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cluster_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "dist")
    )


def _spark_means(emb: DataFrame, assign: DataFrame) -> DataFrame:
    """(cluster_id, cent): element-wise member mean per cluster. The
    explode is NARROW (vec_id, dim, val); the mean is an exact decimal
    sum over each (cluster, dim) — map-side combined, order-independent —
    cast to double and rounded, then the K×64 result (tiny at any corpus
    size) reassembles into centroid arrays."""
    exploded = emb.select("vec_id", F.posexplode("embedding").alias("dim", "val"))
    dim_means = (
        exploded.join(assign.select("vec_id", "cluster_id"), "vec_id")
        .groupBy("cluster_id", "dim")
        .agg(
            F.expr(
                f"round(cast(sum(cast(val as {KMEANS_DECIMAL})) as double)"
                " / count(val), 6)"
            ).alias("m")
        )
    )
    return dim_means.groupBy("cluster_id").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").alias("cent")
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration Lloyd k-means over embeddings: hash-sampled init →
    assign → recompute means → reassign. Output (vec_id, cluster_id,
    dist) — the cluster labels SemDedup-style pruning and IVF index
    builds consume.

    Scale path: each iteration is one broadcast assignment pass over the
    corpus (O(N·K) folds, whole-stage codegen) plus one narrow
    explode-aggregate for the means (N×dims rows shuffled once on
    (cluster, dim) — K×dims output, trivially broadcastable back). No
    driver-side loops; iteration count is a fixed constant here, and a
    production run would wrap the same two stages in a convergence probe
    like the connected-components operator's."""
    emb = read_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "embedding"
    ).persist()
    init = (
        emb.orderBy(
            F.expr(spark_hexint("cast(vec_id as string)")).asc(), F.col("vec_id").asc()
        )
        .limit(KMEANS_K)
        .select("vec_id", "embedding")
    )
    w_init = Window.orderBy(
        F.expr(spark_hexint("cast(vec_id as string)")).asc(), F.col("vec_id").asc()
    )
    cents = init.select(
        (F.row_number().over(w_init) - 1).alias("cluster_id"),
        F.expr("transform(embedding, x -> round(cast(x as double), 6))").alias("cent"),
    )
    assign1 = _spark_assign(emb, cents)
    cents2 = _spark_means(emb, assign1)
    return _spark_assign(emb, cents2)


class KMeansNotConverged(RuntimeError):
    """Lloyd iteration hit the round cap without the inertia plateauing."""


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    max_rounds: int = 8,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[float]]:
    """Convergence-probed Lloyd k-means: iterate assign→means until the
    inertia (Σ per-vector squared distance) plateaus, instead of the
    fixed 2 rounds the oracle entry ``kmeans_assign`` uses for
    cross-engine parity. Returns (assignment, per-round inertias).

    The probe mirrors ``connected_components``: one aggregate-only
    scalar per round (exact decimal sum of the rounded distances — no
    float-order hazard), with ``localCheckpoint`` truncating the lineage
    so round R doesn't re-execute rounds 1..R-1. Lloyd guarantees the
    true inertia is non-increasing; the 6-dp distance rounding keeps the
    probe within tol of that monotone path. Raises
    ``KMeansNotConverged`` at the cap — convergence is data-dependent
    and a silent cap would report a mid-descent labeling as final."""
    emb = (
        read_table(spark, sf_dir, "embeddings", parallel=True)
        .select("vec_id", "embedding")
        .persist()
    )
    hexid = spark_hexint("cast(vec_id as string)")
    init = emb.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc()).limit(k)
    w_init = Window.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
    cents = init.select(
        (F.row_number().over(w_init) - 1).alias("cluster_id"),
        F.expr("transform(embedding, x -> round(cast(x as double), 6))").alias("cent"),
    )
    inertias: list[float] = []
    for _ in range(max_rounds):
        assign = _spark_assign(emb, cents).localCheckpoint()
        inertia = float(
            assign.agg(F.sum(F.col("dist").cast("decimal(38,12)"))).collect()[0][0]
        )
        inertias.append(inertia)
        if len(inertias) >= 2 and inertias[-2] - inertia <= tol * max(1.0, abs(inertias[-2])):
            emb.unpersist()
            return assign, inertias
        cents = _spark_means(emb, assign)
    emb.unpersist()
    raise KMeansNotConverged(
        f"k-means did not converge within {max_rounds} rounds (inertias: {inertias})"
    )


_KM_SQD = _DUCK_SQDIST.format(a="e.embedding", b="c.cent")

KMEANS_ASSIGN_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
ranked_init AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id) - 1 AS cluster_id
  FROM emb
),
cents AS (
  SELECT cluster_id,
         [ round(cast(x as double), 6) for x in embedding ] AS cent
  FROM ranked_init WHERE cluster_id < {KMEANS_K}
),
scored1 AS (
  SELECT e.vec_id, c.cluster_id, round({_KM_SQD}, 6) AS dist
  FROM emb e, cents c
),
assign1 AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
    FROM scored1
  ) WHERE rn = 1
),
exploded AS (
  SELECT vec_id, i - 1 AS dim, embedding[i] AS val
  FROM emb, (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM emb) + 1)) AS i)
  WHERE i <= len(embedding)
),
dim_means AS (
  SELECT a.cluster_id, x.dim,
         round(cast(sum(cast(x.val as {KMEANS_DECIMAL})) as double)
               / count(x.val), 6) AS m
  FROM exploded x JOIN assign1 a USING (vec_id)
  GROUP BY 1, 2
),
cents2 AS (
  SELECT cluster_id, list(m ORDER BY dim) AS cent FROM dim_means GROUP BY 1
),
scored2 AS (
  SELECT e.vec_id, c.cluster_id, round({_KM_SQD}, 6) AS dist
  FROM emb e, cents2 c
)
SELECT vec_id, cluster_id, dist FROM (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM scored2
) WHERE rn = 1
"""


# --------------------------------------------------------------- SemDedup

# SemDedup (Abbas et al. 2023): cluster the embedding space, then prune
# near-duplicate members within each cluster, keeping one canonical
# representative. The cluster step is ``kmeans_assign``; pruning drops
# every vector that has a lower-id cluster-mate with cosine ≥ τ and
# reports which keeper it duplicates. K bounds the pair space to
# Σ|cell|² — here K is a constant for oracle parity; a production run
# sizes K to the target cell occupancy (K ≈ N / cell_size), which keeps
# the within-cell scoring linear-ish in the corpus.


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dup_of, cosine): vectors to DROP, each pointing at its
    highest-cosine lower-id cluster-mate. Note ``dup_of`` is that mate,
    NOT necessarily a surviving canonical representative — in a
    transitive chain (a≈b≈c) ``c.dup_of`` may be ``b``, which is itself
    dropped; consumers wanting the group representative should chase
    pointers (or run ``dedup_cluster``-style components over the pairs).

    Scale path: one k-means labeling (two broadcast passes + a narrow
    mean aggregation), then a self-join keyed on cluster_id — both sides
    shuffle once on the cluster key, exactly the co-location a
    production store would bucket-write — with the argmax-per-dropped-
    vector a WindowGroupLimit, not a global sort. K here is the constant
    ``KMEANS_K`` for oracle parity; ``semdedup_prune_2l`` is the
    production-shaped variant that sizes K to cell occupancy."""
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    )
    labels = kmeans_assign(spark, sf_dir).select("vec_id", "cluster_id")
    # persisted: both sides of the within-cluster self-join consume this —
    # without it each side re-executes the entire k-means subtree
    labeled = emb.join(labels, "vec_id").persist()
    return _semdedup_drops(labeled)


def _semdedup_pairs(labeled: DataFrame) -> DataFrame:
    """Within-cluster τ-pairs over a (vec_id, embedding, nrm, cluster_id)
    corpus: (vec_a, vec_b, cosine) with vec_a < vec_b and cosine ≥ τ.
    Shared by the SemDedup variants; the caller persists ``labeled`` so
    the self-join sides read the cached labeling instead of re-running
    it."""
    a = labeled.select(
        F.col("cluster_id").alias("blk"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = labeled.select(
        F.col("cluster_id").alias("blk_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = _SPARK_DOT.format(a="ea", b="eb")
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.expr(f"round(({dot}) / (na * nb), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= EMB_TAU)
    )


def _semdedup_drops(labeled: DataFrame) -> DataFrame:
    """(vec_id, dup_of, cosine) for every vector with a lower-id
    cluster-mate at cosine ≥ τ (dup_of = highest-cosine such mate, which
    may itself be dropped — see the variant docstrings)."""
    pairs = _semdedup_pairs(labeled)
    w = Window.partitionBy("vec_b").orderBy(F.col("cosine").desc(), F.col("vec_a").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("dup_of"),
            "cosine",
        )
    )


_KMEANS_INLINE = KMEANS_ASSIGN_SQL.strip().rstrip()

SEMDEDUP_PRUNE_SQL = f"""
WITH assign AS ({_KMEANS_INLINE}),
normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
labeled AS (
  SELECT n.vec_id, n.embedding, n.nrm, a.cluster_id
  FROM normed n JOIN assign a USING (vec_id)
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(({_DUCK_DOT.format(a="a.embedding", b="b.embedding")})
               / (a.nrm * b.nrm), 6) AS cosine
  FROM labeled a JOIN labeled b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
)
SELECT vec_id, dup_of, cosine FROM (
  SELECT vec_b AS vec_id, vec_a AS dup_of, cosine,
         row_number() OVER (PARTITION BY vec_b
                            ORDER BY cosine DESC, vec_a) AS rn
  FROM pairs WHERE cosine >= {EMB_TAU}
) WHERE rn = 1
"""


# ------------------------------------------------- SemDedup, scale-shaped

# Production-shaped SemDedup: K scales WITH the corpus. OCC is the target
# cell occupancy, K = max(1, N // OCC), so the within-cell pair space is
# Σ|cell|² ≈ N·OCC — linear in N at fixed occupancy — instead of the
# fixed-K oracle variant's N²/K. Two-level training: k-means runs on a
# deterministic hash-gated 1/SAMPLE_MOD sample (the ``sample_hash``
# gate), so the mean aggregation is bounded by the sample; the full
# corpus is touched only by broadcast assignment passes. At extreme K
# (≳10⁶ cells) the centroid table outgrows a broadcast and a production
# run goes hierarchical — cluster the centroids themselves with the same
# machinery and assign in two hops; the plan shape per hop is unchanged.
SEMDEDUP_OCC = 64
SEMDEDUP_SAMPLE_MOD = 4


def semdedup_k(n: int) -> int:
    """Cell count for a corpus of ``n`` vectors: N / target occupancy."""
    return max(1, n // SEMDEDUP_OCC)


def semdedup_prune_2l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-shaped SemDedup: (vec_id, dup_of, cosine) of vectors to
    DROP, with the cell count sized to the corpus (K = N/OCC) instead of
    a constant. Same ``dup_of`` caveat as ``semdedup_prune``: it is the
    highest-cosine lower-id cluster-mate, which may itself be dropped in
    a transitive chain.

    Scale path: one scalar count() sizes K; init centroids are the K
    hash-smallest SAMPLE members (TakeOrderedAndProject — per-partition
    top-K, no global sort of the corpus); one Lloyd round trains on the
    sample only (assignment against broadcast centroids + a narrow
    (cluster, dim) mean aggregate bounded by the sample); the full
    corpus is then labeled in a single broadcast pass and pruned within
    cells. Cell occupancy stays ~OCC as N grows — the audit pins it —
    so the self-join cost scales linearly, not quadratically."""
    return _semdedup_drops(_semdedup_2l_labeled(spark, sf_dir))


def _semdedup_2l_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level labeling stage: (vec_id, embedding, nrm, cluster_id)
    with K = N/OCC cells, persisted for the downstream self-join (and for
    the occupancy audit, which grades this stage directly)."""
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    ).persist()
    k = semdedup_k(emb.count())
    hexid = spark_hexint("cast(vec_id as string)")
    samp = emb.filter(F.expr(f"({hexid}) % {SEMDEDUP_SAMPLE_MOD} = 0")).select(
        "vec_id", "embedding"
    )
    init = samp.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc()).limit(k)
    w_init = Window.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
    cents = init.select(
        (F.row_number().over(w_init) - 1).alias("cluster_id"),
        F.expr("transform(embedding, x -> round(cast(x as double), 6))").alias("cent"),
    )
    assign1 = _spark_assign(samp, cents)
    cents2 = _spark_means(samp, assign1)
    labels = _spark_assign(emb, cents2).select("vec_id", "cluster_id")
    # persisted: both sides of the within-cell self-join read the cached
    # labeling instead of re-running the two-level training
    return emb.join(labels, "vec_id").persist()


# CTE chain shared by the scale-shaped variants: two-level training →
# full-corpus labeling → within-cell τ-pairs
_SEMDEDUP_2L_CTES = f"""normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
kk AS (SELECT greatest(1, count(*) // {SEMDEDUP_OCC}) AS k FROM embeddings),
samp AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ({duck_hexint("cast(vec_id as varchar)")}) % {SEMDEDUP_SAMPLE_MOD} = 0
),
ranked_init AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id) - 1 AS cluster_id
  FROM samp
),
cents AS (
  SELECT cluster_id, [ round(cast(x as double), 6) for x in embedding ] AS cent
  FROM ranked_init WHERE cluster_id < (SELECT k FROM kk)
),
scored1 AS (
  SELECT s.vec_id, c.cluster_id,
         round({_DUCK_SQDIST.format(a="s.embedding", b="c.cent")}, 6) AS dist
  FROM samp s, cents c
),
assign1 AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
    FROM scored1
  ) WHERE rn = 1
),
exploded AS (
  SELECT vec_id, i - 1 AS dim, embedding[i] AS val
  FROM samp, (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM samp) + 1)) AS i)
  WHERE i <= len(embedding)
),
dim_means AS (
  SELECT a.cluster_id, x.dim,
         round(cast(sum(cast(x.val as {KMEANS_DECIMAL})) as double)
               / count(x.val), 6) AS m
  FROM exploded x JOIN assign1 a USING (vec_id)
  GROUP BY 1, 2
),
cents2 AS (
  SELECT cluster_id, list(m ORDER BY dim) AS cent FROM dim_means GROUP BY 1
),
scored2 AS (
  SELECT e.vec_id, c.cluster_id,
         round({_DUCK_SQDIST.format(a="e.embedding", b="c.cent")}, 6) AS dist
  FROM embeddings e, cents2 c
),
assign2 AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
    FROM scored2
  ) WHERE rn = 1
),
labeled AS (
  SELECT n.vec_id, n.embedding, n.nrm, a.cluster_id
  FROM normed n JOIN assign2 a USING (vec_id)
),
pairs AS (
  SELECT vec_a, vec_b, cosine FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(({_DUCK_DOT.format(a="a.embedding", b="b.embedding")})
                 / (a.nrm * b.nrm), 6) AS cosine
    FROM labeled a JOIN labeled b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  ) WHERE cosine >= {EMB_TAU}
)"""

SEMDEDUP_PRUNE_2L_SQL = f"""
WITH {_SEMDEDUP_2L_CTES}
SELECT vec_id, dup_of, cosine FROM (
  SELECT vec_b AS vec_id, vec_a AS dup_of, cosine,
         row_number() OVER (PARTITION BY vec_b
                            ORDER BY cosine DESC, vec_a) AS rn
  FROM pairs
) WHERE rn = 1
"""


def semdedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup with CANONICAL representatives: (vec_id, canonical_id,
    is_kept) for every vector in a within-cell τ-group. Unlike the
    ``dup_of`` pointer of the prune variants (which may itself be
    dropped mid-chain), ``canonical_id`` is the min-id member of the
    vector's connected τ-component — the one row a SemDedup-style
    consumer keeps; everything else in the component drops.

    Scale path: the two-level labeling and within-cell pair scoring are
    ``semdedup_prune_2l``'s (linear-ish pair space at K = N/OCC);
    component resolution is the pointer-doubling
    ``connected_components`` (O(log diameter) rounds over narrow id
    pairs, aggregate-only convergence probes)."""
    from etl_pipeline_example_spark.operators.cluster import connected_components

    labeled = _semdedup_2l_labeled(spark, sf_dir)
    pairs = _semdedup_pairs(labeled).select("vec_a", "vec_b")
    comp = connected_components(pairs, "vec_a", "vec_b")
    return comp.select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("is_kept"),
    )


SEMDEDUP_CANONICAL_SQL = f"""
WITH RECURSIVE {_SEMDEDUP_2L_CTES},
edges AS (
  SELECT vec_a AS s, vec_b AS d FROM pairs
  UNION ALL
  SELECT vec_b AS s, vec_a AS d FROM pairs
),
reach AS (
  SELECT DISTINCT s AS node, s AS root FROM edges
  UNION
  SELECT e.d AS node, r.root
  FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS vec_id, min(root) AS canonical_id,
       node = min(root) AS is_kept
FROM reach GROUP BY node
"""


# ----------------------------------------------------------- int8 rerank

# The search half of the int8 story (``embed_quantize`` is the storage
# half): coarse-score every corpus vector against the query with an
# INTEGER int8 dot product (exact in both engines — no float-order
# hazards), keep the top RERANK_CAND per query, exact-rescore only those
# with the full-precision cosine. At scale the int8 pass reads a 4×
# smaller index and the float vectors are fetched for ~RERANK_CAND rows
# per query instead of the whole corpus.
RERANK_CAND = 50

_SPARK_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * cast(y as bigint)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)
_DUCK_IDOT = (
    "list_sum([ cast({a}[i] as bigint) * cast({b}[i] as bigint)"
    " for i in range(1, len({a}) + 1) ])"
)

# per-vector int8 codes: same floor(x*127/maxabs + 0.5) cell arithmetic
# embed_quantize writes, kept in array form. max-abs is computed ONCE as
# the ``ma`` column and referenced inside the transform — inlining the
# fold into the per-element lambda would re-materialize it per element
# (O(dims²) per vector, the same pattern the LSH plane comment reports
# as 60× slower).
_SPARK_MAXABS = (
    "aggregate(embedding, cast(0 as double),"
    " (acc, v) -> greatest(acc, abs(cast(v as double))))"
)
_SPARK_Q8 = (
    "transform(embedding, x -> cast(floor(cast(x as double) * 127.0 / ma + 0.5) as int))"
)
_DUCK_MAXABS = "list_max([abs(cast(v as double)) for v in embedding])"
_DUCK_Q8 = (
    "[ cast(floor(cast(x as double) * 127.0 / ma + 0.5) as int) for x in embedding ]"
)


def ann_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: int8 coarse scoring → exact rerank of survivors.

    The coarse score is round(idot / sqrt(qa2 * qb2), 6) with idot and
    the squared norms computed in EXACT bigint arithmetic, so candidate
    selection is bit-identical across engines; only the final division
    touches doubles. Output matches the other ANN ops:
    (query_id, neighbor_id, cosine, rank) with the exact cosine.
    """
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    ).withColumn("ma", F.expr(_SPARK_MAXABS)).filter(F.col("ma") > 0)
    coded = emb.select(
        "vec_id",
        "embedding",
        "nrm",
        F.expr(_SPARK_Q8).alias("q8"),
    ).withColumn("q2", F.expr(_SPARK_IDOT.format(a="q8", b="q8")))
    queries = coded.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("q8").alias("qa8"),
        F.col("q2").alias("qa2"),
    )
    idot = _SPARK_IDOT.format(a="qa8", b="q8")
    coarse = (
        coded.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            F.col("nrm").alias("c_nrm"),
            F.expr(
                f"round(cast({idot} as double)"
                " / sqrt(cast(qa2 as double) * cast(q2 as double)), 6)"
            ).alias("approx"),
        )
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    survivors = coarse.withColumn("crn", F.row_number().over(w_c)).filter(
        F.col("crn") <= RERANK_CAND
    )
    dot = _SPARK_DOT.format(a="q_emb", b="embedding")
    scored = survivors.select(
        "query_id",
        "neighbor_id",
        F.expr(f"round(({dot}) / (q_nrm * c_nrm), 6)").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


ANN_INT8_RERANK_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm, {_DUCK_MAXABS} AS ma
  FROM embeddings
  WHERE {_DUCK_MAXABS} > 0
),
coded AS (
  SELECT vec_id, embedding, nrm, {_DUCK_Q8} AS q8 FROM normed
),
coded2 AS (
  SELECT vec_id, embedding, nrm, q8, {_DUCK_IDOT.format(a="q8", b="q8")} AS q2
  FROM coded
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
         q8 AS qa8, q2 AS qa2
  FROM coded2 WHERE vec_id < {ANN_NUM_QUERIES}
),
coarse AS (
  SELECT q.query_id, q.q_emb, q.q_nrm, c.vec_id AS neighbor_id,
         c.embedding, c.nrm AS c_nrm,
         round(cast({_DUCK_IDOT.format(a="q.qa8", b="c.q8")} as double)
               / sqrt(cast(q.qa2 as double) * cast(c.q2 as double)), 6) AS approx
  FROM coded2 c, queries q
  WHERE c.vec_id != q.query_id
),
survivors AS (
  SELECT query_id, q_emb, q_nrm, neighbor_id, embedding, c_nrm FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id) AS crn
    FROM coarse
  ) WHERE crn <= {RERANK_CAND}
),
scored AS (
  SELECT query_id, neighbor_id,
         round(({_DUCK_DOT.format(a="q_emb", b="embedding")})
               / (q_nrm * c_nrm), 6) AS cosine
  FROM survivors
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


# ------------------------------------------------------------ PQ / ADC ANN

# Product quantization (Jégou et al. 2011, the FAISS IVFADC design point):
# split the 64-dim vector into PQ_M=8 subspaces of 8 dims, code each
# subvector as its nearest of PQ_KC=16 per-subspace codewords. The stored
# index is 8 small ints per vector — 32× denser than float32 — and query
# scoring is ADC: precompute the query's distance to all M×KC codewords
# (a 128-row lookup table, broadcast), then a vector's approximate
# distance is the SUM of 8 table lookups — no float vector ever read
# until the exact rerank of the top survivors. Codebook training here is
# the deterministic hash-sample (the same bounded-K scheme ann_ivf uses,
# disjoint from the query ids) so both engines derive identical
# codewords; a production run trains per-subspace k-means
# (``kmeans_fit`` machinery) — the plan shape is unchanged.
PQ_M = 8
PQ_SUB = LSH_DIM // PQ_M
PQ_KC = 16
PQ_RERANK = 50
# exact decimal sum of 6-dp-rounded per-subspace distances: ADC totals
# are order-independent, so cross-engine candidate selection is exact
PQ_ADC_DECIMAL = "decimal(20,6)"


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN: (query_id, neighbor_id, cosine, rank) — approximate
    top-``PQ_RERANK`` by asymmetric-distance lookup over the 8-byte PQ
    codes, exact cosine rerank to top-``ANN_K``.

    Scale path: the code table (vec_id, m, code) is the ONLY per-corpus
    state the coarse pass reads (32× smaller scan than the float
    vectors); codewords and the per-query lookup table are tiny
    broadcasts; the ADC aggregation is map-side combined on
    (query_id, vec_id); float vectors re-join for just the survivors.
    Composes with the IVF cell gating for sub-linear probes — kept flat
    here (like ``ann_int8_rerank``) so the oracle stays exact."""
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    )
    hexid = spark_hexint("cast(vec_id as string)")
    cw_src = (
        emb.filter(F.col("vec_id") >= ANN_NUM_QUERIES)
        .orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
        .limit(PQ_KC)
    )
    w_cw = Window.orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
    cw_rows = cw_src.select(
        (F.row_number().over(w_cw) - 1).alias("c_id"),
        F.col("embedding").alias("cw_emb"),
    )
    m_df = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    # M×KC codewords: codeword c's subspace-m entry is that sample
    # vector's m-th subvector, rounded like every other centroid
    codewords = (
        cw_rows.crossJoin(F.broadcast(m_df))
        .select(
            "m",
            "c_id",
            F.expr(
                f"transform(slice(cw_emb, m * {PQ_SUB} + 1, {PQ_SUB}),"
                " x -> round(cast(x as double), 6))"
            ).alias("cw"),
        )
    )
    sub = f"slice(embedding, m * {PQ_SUB} + 1, {PQ_SUB})"
    sqd_code = _SPARK_SQDIST.format(a=sub, b="cw")
    # code assignment: min of (dist, c_id) struct — ONE map-side-combined
    # aggregate over narrow (vec_id, m, dist, c_id) rows, deterministic
    # tie-break identical to the oracle's (ORDER BY dist, c_id LIMIT 1)
    codes = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(codewords))
        .select(
            "vec_id",
            "m",
            "c_id",
            F.expr(f"round({sqd_code}, 6)").alias("dist"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "c_id")).alias("s"))
        .select("vec_id", "m", F.col("s.c_id").alias("code"))
    )
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    q_sub = f"slice(q_emb, m * {PQ_SUB} + 1, {PQ_SUB})"
    lut = (
        queries.crossJoin(F.broadcast(codewords))
        .select(
            "query_id",
            "m",
            "c_id",
            F.expr(f"round({_SPARK_SQDIST.format(a=q_sub, b='cw')}, 6)").alias("qd"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.c_id),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.expr(f"cast(sum(cast(qd as {PQ_ADC_DECIMAL})) as double)").alias("adc")
        )
    )
    w_c = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    survivors = (
        adc.withColumn("crn", F.row_number().over(w_c))
        .filter(F.col("crn") <= PQ_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    dot = _SPARK_DOT.format(a="q_emb", b="embedding")
    scored = (
        survivors.join(emb, survivors.neighbor_id == emb.vec_id)
        .join(F.broadcast(queries.withColumnRenamed("query_id", "q_id")),
              survivors.query_id == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (q_nrm * nrm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


_DUCK_PQ_SUB = "embedding[(m * {s} + 1):(m * {s} + {s})]".format(s=PQ_SUB)
_DUCK_PQ_QSUB = "q_emb[(m * {s} + 1):(m * {s} + {s})]".format(s=PQ_SUB)

ANN_PQ_ADC_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
cw_src AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id) - 1 AS c_id
  FROM embeddings WHERE vec_id >= {ANN_NUM_QUERIES}
),
ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
codewords AS (
  SELECT ms.m, s.c_id,
         [ round(cast(x as double), 6)
           for x in s.embedding[(ms.m * {PQ_SUB} + 1):(ms.m * {PQ_SUB} + {PQ_SUB})] ] AS cw
  FROM cw_src s, ms WHERE s.c_id < {PQ_KC}
),
code_dists AS (
  SELECT e.vec_id, c.m, c.c_id,
         round({_DUCK_SQDIST.format(a=_DUCK_PQ_SUB, b="c.cw")}, 6) AS dist
  FROM (SELECT vec_id, embedding FROM embeddings) e, codewords c
),
codes AS (
  SELECT vec_id, m, c_id AS code FROM (
    SELECT vec_id, m, c_id,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, c_id) AS rn
    FROM code_dists
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
  FROM normed WHERE vec_id < {ANN_NUM_QUERIES}
),
lut AS (
  SELECT q.query_id, c.m, c.c_id,
         round({_DUCK_SQDIST.format(a=_DUCK_PQ_QSUB, b="c.cw")}, 6) AS qd
  FROM queries q, codewords c
),
adc AS (
  SELECT l.query_id, cd.vec_id,
         cast(sum(cast(l.qd as {PQ_ADC_DECIMAL})) as double) AS adc
  FROM codes cd JOIN lut l ON cd.m = l.m AND cd.code = l.c_id
  WHERE cd.vec_id != l.query_id
  GROUP BY 1, 2
),
survivors AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS crn
    FROM adc
  ) WHERE crn <= {PQ_RERANK}
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(({_DUCK_DOT.format(a="q.q_emb", b="n.embedding")})
               / (q.q_nrm * n.nrm), 6) AS cosine
  FROM survivors s
  JOIN queries q ON q.query_id = s.query_id
  JOIN normed n ON n.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


# -------------------------------------------------------------- IVF + PQ


def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (the full FAISS composition): IVF cell gating bounds WHICH
    vectors are scored (nprobe/K of the corpus), PQ codes bound WHAT the
    coarse pass reads per scored vector (8 bytes), and the top-50
    survivors get an exact cosine rerank. Output matches the other ANN
    ops: (query_id, neighbor_id, cosine, rank).

    Scale path: at 100 TB the index is (cell, vec_id, 8 PQ codes) —
    bucket-written by cell so a probe is a partition-pruned scan of
    nprobe cells reading 8 bytes/vector; centroids, codewords, probes
    and per-query LUTs are all broadcasts; the ADC sum partial-
    aggregates map-side; float vectors are fetched for ~50 rows per
    query. Every stage is the audited shape of its standalone parent
    (``ann_ivf`` gating, ``ann_pq_adc`` scoring)."""
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True), "embedding", "nrm"
    )
    hexid = spark_hexint("cast(vec_id as string)")
    # --- IVF gating (ann_ivf's bounded-K hash-sampled quantizer) ---
    cents = (
        emb.filter(F.col("vec_id") >= ANN_NUM_QUERIES)
        .orderBy(F.expr(hexid).asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    dot_c = _SPARK_DOT.format(a="embedding", b="cent_emb")
    cell_scores = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        F.expr(f"round(({dot_c}) / (nrm * cent_nrm), 6)").alias("ccos"),
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    ranked = cell_scores.withColumn("crn", F.row_number().over(w_cell)).persist()
    assign = ranked.filter(F.col("crn") == 1).select("vec_id", F.col("cent_id").alias("cell"))
    probes = (
        ranked.filter((F.col("vec_id") < ANN_NUM_QUERIES) & (F.col("crn") <= IVF_NPROBE))
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    # --- PQ coarse scoring (ann_pq_adc's code table + LUT) ---
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
    m_df = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    codewords = cw_rows.crossJoin(F.broadcast(m_df)).select(
        "m",
        "c_id",
        F.expr(
            f"transform(slice(cw_emb, m * {PQ_SUB} + 1, {PQ_SUB}),"
            " x -> round(cast(x as double), 6))"
        ).alias("cw"),
    )
    sub = f"slice(embedding, m * {PQ_SUB} + 1, {PQ_SUB})"
    codes = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(codewords))
        .select(
            "vec_id",
            "m",
            "c_id",
            F.expr(f"round({_SPARK_SQDIST.format(a=sub, b='cw')}, 6)").alias("dist"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "c_id")).alias("s"))
        .select("vec_id", "m", F.col("s.c_id").alias("code"))
    )
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    q_sub = f"slice(q_emb, m * {PQ_SUB} + 1, {PQ_SUB})"
    lut = queries.crossJoin(F.broadcast(codewords)).select(
        "query_id",
        "m",
        "c_id",
        F.expr(f"round({_SPARK_SQDIST.format(a=q_sub, b='cw')}, 6)").alias("qd"),
    )
    # --- compose: only vectors in probed cells reach the ADC sum ---
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    lut_r = lut.select(
        F.col("query_id").alias("l_qid"),
        F.col("m").alias("l_m"),
        "c_id",
        "qd",
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(
            F.broadcast(lut_r),
            (F.col("query_id") == F.col("l_qid"))
            & (F.col("m") == F.col("l_m"))
            & (F.col("code") == F.col("c_id")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.expr(f"cast(sum(cast(qd as {PQ_ADC_DECIMAL})) as double)").alias("adc"))
    )
    w_c = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    survivors = (
        adc.withColumn("srn", F.row_number().over(w_c))
        .filter(F.col("srn") <= PQ_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    dot = _SPARK_DOT.format(a="q_emb", b="embedding")
    scored = (
        survivors.join(emb, survivors.neighbor_id == emb.vec_id)
        .join(
            F.broadcast(queries.withColumnRenamed("query_id", "q_id")),
            survivors.query_id == F.col("q_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (q_nrm * nrm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= ANN_K)


ANN_IVFPQ_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS cent_emb, nrm AS cent_nrm
  FROM normed WHERE vec_id >= {ANN_NUM_QUERIES}
  ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id
  LIMIT {IVF_K}
),
cell_scores AS (
  SELECT n.vec_id, c.cent_id,
         round(({_DUCK_DOT.format(a="n.embedding", b="c.cent_emb")})
               / (n.nrm * c.cent_nrm), 6) AS ccos
  FROM normed n, cents c
),
ranked AS (
  SELECT vec_id, cent_id, ccos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cent_id) AS crn
  FROM cell_scores
),
assign AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM ranked
  WHERE vec_id < {ANN_NUM_QUERIES} AND crn <= {IVF_NPROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM assign a JOIN probes p USING (cell)
  WHERE a.vec_id != p.query_id
),
cw_src AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY {duck_hexint("cast(vec_id as varchar)")}, vec_id) - 1 AS c_id
  FROM embeddings WHERE vec_id >= {ANN_NUM_QUERIES}
),
ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
codewords AS (
  SELECT ms.m, s.c_id,
         [ round(cast(x as double), 6)
           for x in s.embedding[(ms.m * {PQ_SUB} + 1):(ms.m * {PQ_SUB} + {PQ_SUB})] ] AS cw
  FROM cw_src s, ms WHERE s.c_id < {PQ_KC}
),
code_dists AS (
  SELECT e.vec_id, c.m, c.c_id,
         round({_DUCK_SQDIST.format(a=_DUCK_PQ_SUB, b="c.cw")}, 6) AS dist
  FROM (SELECT vec_id, embedding FROM embeddings) e, codewords c
),
codes AS (
  SELECT vec_id, m, c_id AS code FROM (
    SELECT vec_id, m, c_id,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, c_id) AS rn
    FROM code_dists
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
  FROM normed WHERE vec_id < {ANN_NUM_QUERIES}
),
lut AS (
  SELECT q.query_id, c.m, c.c_id,
         round({_DUCK_SQDIST.format(a=_DUCK_PQ_QSUB, b="c.cw")}, 6) AS qd
  FROM queries q, codewords c
),
adc AS (
  SELECT cd.query_id, cd.vec_id,
         cast(sum(cast(l.qd as {PQ_ADC_DECIMAL})) as double) AS adc
  FROM cand cd
  JOIN codes co ON co.vec_id = cd.vec_id
  JOIN lut l ON l.query_id = cd.query_id AND l.m = co.m AND l.c_id = co.code
  GROUP BY 1, 2
),
survivors AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS srn
    FROM adc
  ) WHERE srn <= {PQ_RERANK}
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(({_DUCK_DOT.format(a="q.q_emb", b="n.embedding")})
               / (q.q_nrm * n.nrm), 6) AS cosine
  FROM survivors s
  JOIN queries q ON q.query_id = s.query_id
  JOIN normed n ON n.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


# ------------------------------------------------------------- quantization


def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    max-abs scaling, one output row per (vec_id, dim).

    The storage half of a production ANN index — int8 cells are 4× denser
    than float32, and the scale factor rides along for dequantization.
    All arithmetic is a JVM column expression (array fold for max-abs,
    posexplode for the cells); ``floor(x + 0.5)`` instead of ``round``
    so both engines round identically. Scale: pure projection + explode,
    zero shuffles.
    """
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    maxabs = (
        "aggregate(embedding, cast(0 as double),"
        " (acc, x) -> greatest(acc, abs(cast(x as double))))"
    )
    return (
        emb.select("vec_id", "embedding", F.expr(maxabs).alias("maxabs"))
        .filter(F.col("maxabs") > 0)
        .select(
            "vec_id",
            F.expr("round(maxabs / 127.0, 9)").alias("scale"),
            F.posexplode("embedding").alias("dim_idx", "x"),
        )
        .select(
            "vec_id",
            "scale",
            "dim_idx",
            F.expr(
                "cast(floor(cast(x as double) * 127.0 / (scale * 127.0) + 0.5) as int)"
            ).alias("q_val"),
        )
    )


EMBED_QUANTIZE_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding,
         round(list_max([abs(cast(x as double)) for x in embedding]) / 127.0, 9) AS scale
  FROM embeddings
  WHERE list_max([abs(cast(x as double)) for x in embedding]) > 0
)
SELECT vec_id, scale,
       cast(i - 1 as int) AS dim_idx,
       cast(floor(cast(embedding[i] as double) * 127.0 / (scale * 127.0) + 0.5) as int) AS q_val
FROM scaled,
     (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1)) AS i)
WHERE i <= len(embedding)
"""


SIM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_bruteforce": ann_bruteforce,
    "ann_lsh": ann_lsh,
    "ann_ivf": ann_ivf,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "embed_quantize": embed_quantize,
    "kmeans_assign": kmeans_assign,
    "semdedup_prune": semdedup_prune,
    "semdedup_prune_2l": semdedup_prune_2l,
    "semdedup_canonical": semdedup_canonical,
    "ann_int8_rerank": ann_int8_rerank,
    "ann_pq_adc": ann_pq_adc,
    "ann_ivfpq": ann_ivfpq,
}

SIM_ORACLES: dict[str, str] = {
    "ann_bruteforce": ANN_BRUTEFORCE_SQL,
    "ann_lsh": ANN_LSH_SQL,
    "ann_ivf": ANN_IVF_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "dedup_embedding_lsh": DEDUP_EMBEDDING_LSH_SQL,
    "embed_quantize": EMBED_QUANTIZE_SQL,
    "kmeans_assign": KMEANS_ASSIGN_SQL,
    "semdedup_prune": SEMDEDUP_PRUNE_SQL,
    "semdedup_prune_2l": SEMDEDUP_PRUNE_2L_SQL,
    "semdedup_canonical": SEMDEDUP_CANONICAL_SQL,
    "ann_int8_rerank": ANN_INT8_RERANK_SQL,
    "ann_pq_adc": ANN_PQ_ADC_SQL,
    "ann_ivfpq": ANN_IVFPQ_SQL,
}
