"""Distributed Avro source — OCF files as a DataFrame, no avro jar.

The landing-format matrix (sources/readers.py: json/parquet/orc/csv)
lacks Avro — a top-tier landing format this Spark build has no native
reader for. avroread.py already decodes any conformant OCF with
stdlib arithmetic; this module distributes it: ``binaryFile`` lists
and ships whole OCF files to executors (Avro files are row-framed and
individually splittable only at block level — per-FILE parallelism is
the unit here, the same grain Spark's own avro source uses per split
for small files), and an Arrow-batched ``mapInPandas`` decodes each
file where it lands. No bytes ever route through the driver.

Schema: decoded from the FIRST file's header driver-side (one small
read), translated to Spark types (union-with-null → nullable); every
executor then checks its own file's writer schema against it and
raises NAMING THE FILE on drift — a mixed-schema directory fails
loudly instead of silently mis-decoding (the read_evolved contract is
available for deliberate evolution; this reader is strict).

Honest boundary: flat records of primitives (plus nullable unions).
Nested records/arrays/maps raise — nested landing data arrives via
jsonl here; flattening is the transform layer's job
(flatten_structs), not the reader's.

Reference: reference repo reads landed objects via Glue readers
(etl job.py); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.pipeline.avroread import read_avro_ocf

_PRIM_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _field_type(t) -> tuple[str, bool]:
    """(spark type, nullable) for a flat Avro field type."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1 or "null" not in t:
            raise ValueError(f"unsupported Avro union {t!r}")
        inner, _ = _field_type(branches[0])
        return inner, True
    if isinstance(t, str) and t in _PRIM_TO_SPARK:
        return _PRIM_TO_SPARK[t], False
    raise ValueError(
        f"unsupported Avro field type {t!r} — this reader is flat-record"
        " strict (nested data lands as jsonl and flattens downstream)"
    )


def _spark_schema(avro_schema: dict) -> str:
    if avro_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    cols = []
    for f in avro_schema["fields"]:
        t, _nullable = _field_type(f["type"])
        cols.append(f"`{f['name']}` {t}")
    return ", ".join(cols)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a file/glob/directory of Avro OCF files as a DataFrame —
    per-file distributed decode via the stdlib Avro arithmetic."""
    from pyspark.errors import AnalysisException

    try:
        files = spark.read.format("binaryFile").load(path)
        first = files.select("path", "content").limit(1).collect()
    except AnalysisException as ex:
        raise FileNotFoundError(f"no Avro files under {path}") from ex
    if not first:
        raise FileNotFoundError(f"no Avro files under {path}")
    ref_schema, _ = read_avro_ocf(bytes(first[0]["content"]))
    schema_str = _spark_schema(ref_schema)
    names = [f["name"] for f in ref_schema["fields"]]
    ref_fields = [
        (f["name"], json_norm(f["type"])) for f in ref_schema["fields"]
    ]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                schema, rows = read_avro_ocf(bytes(content))
                got = [
                    (f["name"], json_norm(f["type"]))
                    for f in schema.get("fields", [])
                ]
                if got != ref_fields:
                    raise ValueError(
                        f"Avro schema drift in {fpath}: {got} != expected"
                        f" {ref_fields} — use read_evolved for deliberate"
                        " schema evolution"
                    )
                yield pd.DataFrame(
                    [[r.get(n) for n in names] for r in rows],
                    columns=names,
                )

    return files.select("path", "content").mapInPandas(
        _decode, schema=schema_str
    )


def json_norm(t) -> str:
    """Canonical text of a field type for drift comparison."""
    import json

    return json.dumps(t, sort_keys=True)
