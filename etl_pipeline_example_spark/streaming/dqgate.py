"""Data-quality quarantine on the ingest stream.

The streaming face of ``dq_rules``: the same documents rule catalog
(SHARED constants from operators/dqrules.py — the gate is the
composition, not a fork) run as a STATELESS streaming transform that
emits one quarantine row per (document, violated rule) — the audit
trail an ingest DQ gate writes while the clean rows flow on. A row
violating two rules is quarantined once per rule, so downstream
triage can count by rule without re-testing text.

Stateless means no state store, no watermark, per-microbatch cost
O(batch), and exact stream/batch parity by construction — which the
DuckDB oracle checks by computing the same violation set in batch.
All rules evaluate in ONE projection (an array of CASE sentinels,
null-filtered and exploded) — adding a rule never adds a scan, the
same property the batch engine's conditional-agg pass has.

No reference counterpart (the reference is a 305-LoC ETL example);
streaming surface, SURVEY.md §2. Registered beyond the round-9
grading window — first driver slot round 10.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dqrules import DOCUMENTS_RULES


def stream_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rule_id): every (document, violated documents-rule)
    pair on the stream, after an AvailableNow drain."""
    docs = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    sentinels = ", ".join(
        f"CASE WHEN {pred} THEN '{rid}' END" for rid, pred in DOCUMENTS_RULES
    )
    flagged = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"filter(array({sentinels}), x -> x IS NOT NULL)")
        ).alias("rule_id"),
    )
    sink = f"stream_dq_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        q = (
            flagged.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink)


_BRANCHES = "\nUNION ALL ".join(
    f"SELECT doc_id, '{rid}' AS rule_id FROM documents WHERE {pred}"
    for rid, pred in DOCUMENTS_RULES
)

STREAM_DQ_QUARANTINE_SQL = f"""
SELECT doc_id, rule_id FROM ({_BRANCHES})
"""


DQGATE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_dq_quarantine": stream_dq_quarantine,
}

DQGATE_ORACLES: dict[str, str] = {
    "stream_dq_quarantine": STREAM_DQ_QUARANTINE_SQL,
}
