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


# ------------------------------------------------------------ frame sampling

FRAME_STRIDE_MS = 10_000  # sample one frame per 10 s of (fake) video

FRAME_SCHEMA = "doc_id bigint, frame_idx int, ts_ms int, brightness int"


def frame_stub(payload: bytes, frame_idx: int) -> int:
    """Deterministic fake per-frame feature (mean brightness). REAL FRAME
    DECODE NOT IMPLEMENTED — a pyav/ffmpeg seek+decode drops in here; the
    1:N batch plumbing around it is production-shaped."""
    h = hashlib.md5(payload + b":" + str(frame_idx).encode()).hexdigest()
    return int(h[:15], 16) % 256


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker with a 1:N output shape: each video row explodes
    to one row per sampled frame — the batch contract for frame-level
    feature extraction (detection, embedding, OCR) at scale.

    Container probe (duration) and frame extraction happen in the SAME
    pass while the payload is in hand — never decode-then-join, which
    would shuffle the raw media bytes across the cluster.
    """
    for pdf in batches:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            duration = decode_stub(payload, "video")["duration_ms"]
            n_frames = int(duration) // FRAME_STRIDE_MS + 1
            for i in range(n_frames):
                out_rows.append(
                    (int(doc_id), i, i * FRAME_STRIDE_MS, frame_stub(payload, i))
                )
        yield pd.DataFrame(
            out_rows, columns=["doc_id", "frame_idx", "ts_ms", "brightness"]
        )


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample frames from the (synthetic) video payloads: one row per
    10-second frame with a per-frame feature — probe + sample in one
    Arrow-batched pass, zero shuffles end-to-end."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    videos = docs.filter(F.expr("doc_id % 3 = 2")).select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
    )
    return videos.mapInPandas(sample_frames_batch, schema=FRAME_SCHEMA)


MULTIMODAL_FRAMESAMPLE_SQL = f"""
WITH seeded AS (
  SELECT doc_id, text,
         cast(concat('0x', substr(md5(text), 1, 15)) as bigint) AS seed
  FROM documents WHERE doc_id % 3 = 2
),
vids AS (
  SELECT doc_id, text, (seed >> 20) % 600000 AS duration_ms FROM seeded
)
SELECT doc_id,
       cast(i as int) AS frame_idx,
       cast(i * {FRAME_STRIDE_MS} as int) AS ts_ms,
       cast(cast(concat('0x', substr(md5(concat(text, ':', cast(i as varchar))), 1, 15)) as bigint)
            % 256 as int) AS brightness
FROM vids, (SELECT unnest(range(0, 60)) AS i)
WHERE i <= duration_ms // {FRAME_STRIDE_MS}
"""


MM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_meta": multimodal_meta,
    "multimodal_framesample": multimodal_framesample,
}

MM_ORACLES: dict[str, str] = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_framesample": MULTIMODAL_FRAMESAMPLE_SQL,
}
