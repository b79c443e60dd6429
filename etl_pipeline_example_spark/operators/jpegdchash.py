"""Perceptual hash from the JPEG DC map — the no-IDCT thumbnail trick.

A baseline JPEG's DC coefficients ARE a ⅛-scale thumbnail, available
after entropy decode alone — the classic production shortcut for
near-dup screening over image corpora: skip the IDCT entirely and
aHash the DC map (mean-threshold bit per block). This operator runs
that pipeline on REALLY-decoded bytes: synthesize the document's
baseline JPEG (operators/jpegdecode.py — markers, Huffman, stuffing),
entropy-decode it, take the LUMA DC map, and emit the mean-threshold
hash with integer-only arithmetic:

- bit_i = 1 iff dc_i · n_blocks > Σ dc  (cross-multiplied mean
  compare — no division anywhere);
- dc_hash = Σ bit_i · 2^i over row-major block index i (≤ 7×5 = 35
  blocks per synthesized image, so the hash fits a bigint exactly);
- n_above = popcount, the coarse brightness-balance diagnostic.

The oracle recomputes everything from the planted DC pattern's
arithmetic (the mediapixels contract: it never sees a byte), with the
per-block DC expression INLINED in each list comprehension — never an
indexed list (the 60-600× literal-indexing hazard).

Scale: one Arrow-batched mapInPandas pass, no shuffle — and the point
of the operator at 100 TB is that it does ~2% of the full decode's
work per image (entropy decode only, no IDCT, no color convert).

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md §2
row 32h. Registered beyond the round-15 grading window — first driver
slot round 16.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.operators.jpegdecode import (
    decode_jpeg,
    encode_jpeg,
)
from etl_pipeline_example_spark.sources.readers import read_table

DCHASH_SCHEMA = (
    "doc_id bigint, n_blocks bigint, n_above bigint, dc_hash bigint"
)


def _hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "n_blocks", "n_above", "dc_hash"]
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            _, quant = decode_jpeg(encode_jpeg(doc_id))
            dc = quant[:, :, 0, 0].astype(np.int64)  # luma DC map
            n = int(dc.size)
            total = int(dc.sum())
            flat = dc.reshape(-1)  # row-major: i = by*nbx + bx
            bits = (flat * n) > total
            dc_hash = 0
            for i in range(n):
                if bits[i]:
                    dc_hash |= 1 << i
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_blocks": n,
                    "n_above": int(bits.sum()),
                    "dc_hash": dc_hash,
                }
            )
        yield pd.DataFrame(rows, columns=cols)


def multimodal_jpeg_dchash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_blocks, n_above, dc_hash): mean-threshold aHash over
    the really-entropy-decoded luma DC map of each document's
    synthesized baseline JPEG — the IDCT-free thumbnail screen."""
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id"
    )
    return docs.mapInPandas(_hash_batch, schema=DCHASH_SCHEMA)


# Planted luma DC (jpegdecode contract): dc(bx, by) =
# (doc_id + 5*bx + 11*by) % 256 - 128 with bx = i % nbx,
# by = i // nbx; nbx = 2 + doc_id % 6, nby = 2 + (doc_id*3) % 6.
_NBX = "(2 + doc_id % 6)"
_NBY = "(2 + (doc_id * 3) % 6)"
_DC = f"((doc_id + 5 * (i % {_NBX}) + 11 * (i // {_NBX})) % 256 - 128)"

MULTIMODAL_JPEG_DCHASH_SQL = f"""
WITH base AS (
  SELECT doc_id, {_NBX} * {_NBY} AS n,
         list_sum([ {_DC} for i in range({_NBX} * {_NBY}) ]) AS total
  FROM documents
)
SELECT doc_id,
       cast(n AS bigint) AS n_blocks,
       cast(list_sum([ CASE WHEN {_DC} * n > total THEN 1 ELSE 0 END
                       for i in range(n) ]) AS bigint) AS n_above,
       cast(list_sum([ CASE WHEN {_DC} * n > total
                            THEN (1::BIGINT << i) ELSE 0 END
                       for i in range(n) ]) AS bigint) AS dc_hash
FROM base
"""


JPEGDCHASH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_jpeg_dchash": multimodal_jpeg_dchash,
}

JPEGDCHASH_ORACLES: dict[str, str] = {
    "multimodal_jpeg_dchash": MULTIMODAL_JPEG_DCHASH_SQL,
}
