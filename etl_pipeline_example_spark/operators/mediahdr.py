"""Real container-format header decoding for binary media columns.

``multimodal_meta`` (operators/multimodal.py) stubs the whole decode
because the container has no media libraries. This module narrows the
stub to where it truly belongs: the CONTAINER level of real media
formats needs no library at all — PNG dimensions live in the IHDR
chunk, WAV sample rate/channels/length in the RIFF fmt/data chunks,
all fixed-offset ``struct`` reads. The operator synthesizes VALID
PNG and WAV bytes (correct magics, chunk layout, CRC), ships them
through the binary column, and parses them back with a real
byte-format parser in Arrow-batched ``mapInPandas`` — so the only
remaining stub in the package is pixel/sample decode, explicitly.

The synthesis parameters are pure functions of doc_id; the DuckDB
oracle recomputes them directly, so a hash match proves the whole
synthesize → binary column → parse loop is lossless.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 32b.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

HDR_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int,"
    " sample_rate int, channels int, duration_ms int"
)


# ------------------------------------------------------------- synthesis

def synth_png(width: int, height: int) -> bytes:
    """Minimal valid PNG prefix: magic + a correct IHDR chunk (real
    length, type, payload, CRC32)."""
    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def synth_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """Minimal valid WAV header: RIFF/WAVE + fmt chunk + empty-payload
    data chunk whose declared size encodes the sample count."""
    bits = 16
    block = channels * bits // 8
    data_size = n_samples * block
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
    )


def _params(doc_id: int) -> tuple[str, int, int, int, int, int]:
    """(media_type, width, height, sample_rate, channels, n_samples) —
    pure function of doc_id, mirrored by the SQL oracle."""
    if doc_id % 2 == 0:
        return ("image", 16 + doc_id % 512, 16 + (doc_id * 7) % 512, 0, 0, 0)
    return ("audio", 0, 0, 8000 + (doc_id % 8) * 1000, 1 + doc_id % 2, 1000 + doc_id % 9000)


# --------------------------------------------------------------- parsing

def parse_media_header(payload: bytes) -> dict:
    """REAL container-header decode: PNG IHDR or WAV RIFF chunks via
    fixed-offset struct reads. Pixel/sample decode intentionally absent
    (no media libs in this container) — this parses exactly what a
    metadata-extraction pass at 100 TB parses before deciding what to
    route to GPU decode workers."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        return {"n_bytes": len(payload), "width": w, "height": h,
                "sample_rate": 0, "channels": 0, "duration_ms": 0}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt_size = struct.unpack("<I", payload[16:20])[0]
        _, channels, rate, _, block, _ = struct.unpack("<HHIIHH", payload[20:36])
        data_off = 20 + fmt_size
        if payload[data_off:data_off + 4] != b"data":
            raise ValueError("WAV without data chunk after fmt")
        data_size = struct.unpack("<I", payload[data_off + 4:data_off + 8])[0]
        n_samples = data_size // block
        return {"n_bytes": len(payload), "width": 0, "height": 0,
                "sample_rate": rate, "channels": channels,
                "duration_ms": n_samples * 1000 // rate}
    raise ValueError("unrecognized container format")


def _synth_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            mt, w, h, rate, ch, ns = _params(int(doc_id))
            payload = synth_png(w, h) if mt == "image" else synth_wav(rate, ch, ns)
            meta = parse_media_header(payload)
            rows.append({"doc_id": int(doc_id), "media_type": mt, **meta})
        yield pd.DataFrame(rows)


def multimodal_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real PNG/WAV bytes per doc, parse them back with the
    real container parser: (doc_id, media_type, n_bytes, width, height,
    sample_rate, channels, duration_ms).

    Scale shape: Arrow-batched mapInPandas over the scan — no shuffle,
    embarrassingly parallel, identical plumbing to multimodal_meta but
    with the decode REAL at the container level.
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True).select("doc_id")
    return docs.mapInPandas(_synth_and_parse, schema=HDR_SCHEMA)


# PNG prefix is 8+4+4+13+4 = 33 bytes; WAV header is 12+8+16+8 = 44.
MULTIMODAL_HEADER_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
       cast(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 44 END AS int) AS n_bytes,
       cast(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 512 ELSE 0 END AS int) AS width,
       cast(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 512 ELSE 0 END AS int) AS height,
       cast(CASE WHEN doc_id % 2 = 0 THEN 0
            ELSE 8000 + (doc_id % 8) * 1000 END AS int) AS sample_rate,
       cast(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + doc_id % 2 END AS int) AS channels,
       cast(CASE WHEN doc_id % 2 = 0 THEN 0
            ELSE (1000 + doc_id % 9000) * 1000 // (8000 + (doc_id % 8) * 1000)
            END AS int) AS duration_ms
FROM documents
"""


MEDIAHDR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_header": multimodal_header,
}

MEDIAHDR_ORACLES: dict[str, str] = {
    "multimodal_header": MULTIMODAL_HEADER_SQL,
}
