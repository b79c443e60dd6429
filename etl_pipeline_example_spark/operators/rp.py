"""Random-projection embedding compression (Johnson-Lindenstrauss).

Achlioptas 2003: a ±1 projection matrix preserves pairwise distances in
expectation (the JL lemma) while needing no training at all — the
database-friendly alternative to PCA, and the standard first move when
64-dim embeddings are too wide for an index. Entries are derived from
md5, so the matrix is a pure function of (row, col): nothing is stored,
both engines regenerate it identically, and the projection of a vector
is reproducible from the vector alone.

Determinism discipline: y_j = (1/√k) Σ_i x_i·r_ji is computed as a
SEQUENTIAL left-to-right fold per output dim (the simcore dot-product
contract — a groupBy sum of doubles would be partition-order dependent
and cross-engine divergent). Each term is exact: x_i float32 → double
is exact, ·±1 is exact, and with ``RP_K = 16`` the 1/√k scale is 0.25 —
a power of two, so even the final scaling is exact. The projected
vectors therefore match the oracle bit-for-bit with no rounding step.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 27h.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

RP_K = 16  # output dims; 1/sqrt(16) = 0.25 is exact in binary
RP_MAX_DIM = 256  # sign rows are precomputed to this input width


def _sign_pattern(j: int) -> str:
    """Row j of the ±1 matrix as a '1'/'0' string of ``RP_MAX_DIM``
    chars: entry i is +1 iff md5('rp:<j>:<i>') starts below '8'.

    Computed ONCE in Python (hashlib md5 == SQL md5) and inlined as a
    string literal in both engines' expressions — the hot loop then
    pays one substring per term instead of one md5 (measured ~4×).
    Scalar string literals are safe inside fold lambdas; the pitfall is
    array literals, which both engines re-materialize per element.
    """
    import hashlib

    return "".join(
        "1" if hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0] < "8" else "0"
        for i in range(1, RP_MAX_DIM + 1)
    )


def _flat_pattern() -> str:
    """All ``RP_K`` sign rows concatenated: row j occupies chars
    [j·RP_MAX_DIM + 1, (j+1)·RP_MAX_DIM] (1-indexed)."""
    return "".join(_sign_pattern(j) for j in range(RP_K))


def _sign_expr(big: str) -> str:
    """±1.0 for (j, i) via one substring into the flat pattern literal.
    Identical text in both engines."""
    return (
        f"CASE WHEN substring('{big}', j * {RP_MAX_DIM} + i, 1) = '1'"
        " THEN cast(1 as double) ELSE cast(-1 as double) END"
    )


def rp_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, proj): every embedding projected to ``RP_K`` dims,
    packed as ``array<double>`` — the in-engine form index builders and
    the rerank path consume.

    Scale shape: a pure per-row projection — no shuffle, no join, no
    state; the sign matrix is inlined into the expression as one
    precomputed literal string, so there is nothing to broadcast and
    the operator runs at scan speed at any corpus size. The d·k
    multiply-adds per vector are the JL floor. One NESTED fold
    (transform over j, aggregate over i) rather than ``RP_K`` separate
    fold expressions — the flat form compiled ~2.5× slower (plan
    optimization cost grows with expression count, measured 24s → 10s
    cold at sf0.01). Inputs wider than ``RP_MAX_DIM`` dims are out of
    contract (widen the constant).
    """
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    big = _flat_pattern()
    proj = (
        f"transform(sequence(0, {RP_K - 1}), j -> 0.25 * "
        f"aggregate(sequence(1, size(embedding)), cast(0 as double),"
        f" (acc, i) -> acc + cast(element_at(embedding, i) as double)"
        f" * ({_sign_expr(big)})))"
    )
    return emb.select("vec_id", "label", F.expr(proj).alias("proj"))


def embed_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, dim, value): the projection as one scalar row per
    output component; ``dim`` is the 0-based output index j (matching
    the sign-matrix row index), value_j identical bit-for-bit to
    ``rp_vectors``'s proj[j].

    Scalar rows because the driver's grading hasher cannot hash
    ``array<double>`` cells (round-7 finding). Shape note: this does
    NOT posexplode the packed array — a Generate whose child projects
    the full nested fold re-evaluated it outside codegen (measured 60×:
    0.3 s → 18.5 s at sf0.1). Instead the Generate explodes a 16-int
    ``sequence`` and the per-(row, dim) fold runs in a plain Project
    ABOVE it — the same d·k multiply-adds in total as the packed form,
    all inside whole-stage codegen.
    """
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    big = _flat_pattern()
    sign = _sign_expr(big).replace("j *", "dim *")
    value = (
        f"0.25 * aggregate(sequence(1, size(embedding)), cast(0 as double),"
        f" (acc, i) -> acc + cast(element_at(embedding, i) as double)"
        f" * ({sign}))"
    )
    return (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            F.posexplode(F.expr(f"sequence(0, {RP_K - 1})")).alias("pos", "dim"),
        )
        .select("vec_id", "label", F.col("dim"), F.expr(value).alias("value"))
    )


EMBED_RP_SQL = (
    "SELECT vec_id, label,"
    f" unnest(range(0, {RP_K})) AS dim,"
    " unnest([ 0.25 * list_sum([ cast(embedding[i] as double)"
    f" * ({_sign_expr(_flat_pattern())})"
    " for i in range(1, len(embedding) + 1) ])"
    f" for j in range(0, {RP_K}) ]) AS value"
    " FROM embeddings"
)


RP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embed_rp": embed_rp,
}

RP_ORACLES: dict[str, str] = {
    "embed_rp": EMBED_RP_SQL,
}
