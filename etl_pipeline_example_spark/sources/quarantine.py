"""Malformed-record quarantine for jsonl landings.

The ingest-hardening layer the land→validate→promote flow needs in
front of it: a landed jsonl[.gz] partition from an external producer
WILL eventually contain truncated lines, wrong-typed fields, or raw
garbage, and the reference's all-or-nothing validation gate
(pipeline/validate.py parity of the etl_manager-style checks) can only
fail the whole partition. Quarantine splits per ROW instead: parseable,
spec-conformant rows flow on; everything else lands in a quarantine
sink with the raw line and a reason — nothing is silently dropped, and
one bad producer line no longer blocks a 100-GB partition.

Mechanics: ``spark.read.text`` keeps every line as opaque bytes; one
``from_json`` against the spec's StructType parses it (PERMISSIVE —
unparseable JSON yields a NULL struct, a wrong-typed FIELD yields a
NULL field). A row quarantines when the struct is NULL (bad JSON) or a
required column parsed NULL while the raw line mentions the key (the
type-mismatch case); the reason column says which. The split is two
filters over the same lazy parse — no driver-side loop; each consumer
runs one projected scan of the landed text.

Side-effecting surface (returns two DataFrames; ``quarantine_landed``
writes the bad side) — pytest-verified like the other sources/sinks,
no driver oracle by design.

Reference parity: the landing format and validation gate shape follow
the reference's land→validate flow (reference:
python_scripts/validate_land_data.py, glue_jobs metadata conventions);
the per-row quarantine split is the engine's extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.spec import (
    TableSpec,
    spark_schema_for,
)

QUAR_REASON_BAD_JSON = "unparseable_json"
QUAR_REASON_NULL_REQUIRED = "required_field_null"


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split a landed jsonl[.gz] path into (good, quarantined).

    ``good`` carries the spec's columns; ``quarantined`` carries
    (raw_line, reason). ``required`` defaults to every spec column:
    a row whose required field parses NULL although the key appears in
    the raw line is a type casualty, not a legitimate null, and goes to
    quarantine.
    """
    req = required if required is not None else spec.column_names
    # PERMISSIVE from_json yields an all-null ROW (not a null struct)
    # for garbage, so the corrupt-record column must be in the parse
    # schema to make "bad JSON" distinguishable from "all fields null".
    schema = spark_schema_for(spec).add("_corrupt_record", "string")
    lines = spark.read.text(path).withColumnRenamed("value", "raw_line")
    parsed = lines.select(
        "raw_line",
        F.from_json(
            F.col("raw_line"),
            schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
    )

    null_req = None
    for c in req:
        cond = F.col(f"rec.{c}").isNull() & F.col("raw_line").contains(
            f'"{c}"'
        )
        null_req = cond if null_req is None else (null_req | cond)

    # PERMISSIVE sets _corrupt_record for type-mismatch rows too; a row
    # where NOTHING parsed is raw garbage, one where some fields
    # survived is a per-field type casualty.
    parsed_any = None
    for c in spec.column_names:
        cond = F.col(f"rec.{c}").isNotNull()
        parsed_any = cond if parsed_any is None else (parsed_any | cond)
    corrupt = F.col("rec").isNull() | F.col("rec._corrupt_record").isNotNull()
    bad_json = F.col("rec").isNull() | (
        F.col("rec._corrupt_record").isNotNull() & ~parsed_any
    )
    is_bad = corrupt if null_req is None else (corrupt | null_req)

    good = parsed.filter(~is_bad).select("rec.*").drop("_corrupt_record")
    quarantined = parsed.filter(is_bad).select(
        "raw_line",
        F.when(bad_json, F.lit(QUAR_REASON_BAD_JSON))
        .otherwise(F.lit(QUAR_REASON_NULL_REQUIRED))
        .alias("reason"),
    )
    return good, quarantined


def quarantine_landed(
    spark: SparkSession,
    in_path: str,
    spec: TableSpec,
    good_path: str,
    quarantine_path: str,
    required: list[str] | None = None,
) -> dict[str, int]:
    """Run the split and persist both sides; returns counts.

    The quarantine side is written as jsonl (raw line + reason) so the
    producer can be sent their exact bytes back; the good side is
    parquet in the spec's column order, ready for promote. The two
    writes each scan the landed text once (a second pushed-down text
    scan is cheaper than caching the parsed frame just to split it)."""
    good, bad = read_jsonl_quarantine(spark, in_path, spec, required)
    good.write.mode("overwrite").parquet(good_path)
    bad.write.mode("overwrite").json(quarantine_path)
    n_good = spark.read.parquet(good_path).count()
    n_bad = spark.read.json(quarantine_path).count() if _nonempty(
        spark, quarantine_path
    ) else 0
    return {"good": n_good, "quarantined": n_bad}


def _nonempty(spark: SparkSession, path: str) -> bool:
    try:
        return bool(spark.read.json(path).columns)
    except Exception:
        return False
