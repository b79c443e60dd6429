"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store reference), decode/feature-extract
runs as Arrow-batched ``mapInPandas`` so each Python worker touches a
columnar batch, and everything downstream (filtering, joins, dedup) is
plain Spark SQL over the extracted metadata columns.

The decode itself is STUBBED here — image/audio libraries are not in this
container — behind ``decode_stub``: a deterministic fake that derives
pseudo width/height/duration from the payload's md5. The Spark-side
plumbing (schema, batch iteration, UDF signature, partitioning) is real
and is exactly what a Pillow/ffmpeg decode would drop into.

``multimodal_meta`` synthesizes the payload from ``documents.text`` (UTF-8
bytes) so the operator runs on the standard testdata; its DuckDB oracle
reproduces the fake-decode arithmetic over the same bytes, so the whole
mapInPandas pipeline is correctness-checked end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

MM_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, duration_ms int"
)


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. REAL DECODE NOT IMPLEMENTED — replace with
    Pillow / torchaudio / pyav in a real deployment; everything around it
    (batching, schema, partitioning) is production-shaped.

    Fake semantics (mirrored in the SQL oracle): width/height/duration are
    functions of md5(payload).
    """
    h = hashlib.md5(payload).hexdigest()
    seed = int(h[:15], 16)
    return {
        "n_bytes": len(payload),
        "width": 64 + seed % 1024,
        "height": 64 + (seed >> 10) % 1024,
        "duration_ms": (seed >> 20) % 600000 if media_type in ("audio", "video") else 0,
    }


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, metadata batches out."""
    for pdf in batches:
        meta = [decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
        out = pd.DataFrame(meta)
        out.insert(0, "media_type", pdf["media_type"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Run the (stub) decoder over a frame of (doc_id, media_type, payload).

    Arrow-batched; each task processes its partition's batches independently
    — embarrassingly parallel, no shuffle.
    """
    return df.mapInPandas(decode_batch, schema=MM_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize binary payloads from documents and run the decode pipeline."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    media = docs.select(
        "doc_id",
        F.expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'"
               " ELSE 'video' END").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return extract_media_metadata(media)


# The oracle reproduces decode_stub's arithmetic: md5 of the UTF-8 payload,
# seed = first 15 hex chars, then the same modular arithmetic. (DuckDB md5
# of a string equals md5 of its UTF-8 bytes.)
MULTIMODAL_META_SQL = """
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         cast(concat('0x', substr(md5(text), 1, 15)) as bigint) AS seed
  FROM documents
)
SELECT doc_id, media_type, n_bytes,
       cast(64 + seed % 1024 as int) AS width,
       cast(64 + (seed >> 10) % 1024 as int) AS height,
       cast(CASE WHEN media_type IN ('audio', 'video')
                 THEN (seed >> 20) % 600000 ELSE 0 END as int) AS duration_ms
FROM seeded
"""


MM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_meta": multimodal_meta,
}

MM_ORACLES: dict[str, str] = {
    "multimodal_meta": MULTIMODAL_META_SQL,
}
