"""Image resize (block-average downsample) over REALLY decoded bytes.

The "resize" stage of a multimodal ingest pipeline: every image is
reduced to a fixed ``GRID×GRID`` thumbnail by exact block averaging —
each output cell owns the pixel rectangle
``[floor(b·h/G), floor((b+1)·h/G))`` so the cells tile the image
exactly, whatever its dimensions. Like ``multimodal_decode`` and
``multimodal_phash``, the pixels come from the REAL byte path
(synthesize the document's PNG, chunk-walk + inflate + unfilter it
back — the certified mediapixels decoder, imported not restated), and
the oracle recomputes the planted-pattern arithmetic without ever
seeing bytes — a hash match certifies resize-over-bytes.

Integer-exact: each cell reports its pixel COUNT and gray SUM
(gray = r+g+b, no division anywhere); the consumer divides when it
wants the mean. Block membership uses the same floor-boundary
arithmetic on both sides.

Scale shape: Arrow-batched ``mapInPandas``, no shuffle, no state —
per-document media work fused with the decode pass, embarrassingly
parallel, GRID²-bounded output per image.

Reference: N/A (305-LoC Glue ETL has no media surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-10 grading window —
first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.operators.mediapixels import (
    decode_png,
    encode_png,
    planted_pixels,
)
from etl_pipeline_example_spark.sources.readers import read_table

RESIZE_SCHEMA = (
    "doc_id bigint, by int, bx int, n_px bigint, sum_px bigint"
)
GRID = 4


def _bounds(n: int) -> list[int]:
    """The G+1 tiling boundaries floor(k·n/G), k = 0..G."""
    return [(k * n) // GRID for k in range(GRID + 1)]


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            if doc_id % 2 != 0:
                continue  # image docs only (odd ids are audio)
            img = decode_png(encode_png(planted_pixels(doc_id)))
            h, w, _ = img.shape
            gray = img.sum(axis=2, dtype=np.int64)
            yb, xb = _bounds(h), _bounds(w)
            for by in range(GRID):
                ys = slice(yb[by], yb[by + 1])
                for bx in range(GRID):
                    xs = slice(xb[bx], xb[bx + 1])
                    block = gray[ys, xs]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "by": by,
                            "bx": bx,
                            "n_px": int(block.size),
                            "sum_px": int(block.sum()),
                        }
                    )
        yield pd.DataFrame(
            rows, columns=["doc_id", "by", "bx", "n_px", "sum_px"]
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, by, bx, n_px, sum_px): the exact 4×4 block-average
    tiling of each really-decoded image."""
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id"
    )
    return docs.mapInPandas(_resize_batch, schema=RESIZE_SCHEMA).orderBy(
        "doc_id", "by", "bx"
    )


# width/height are pure functions of doc_id (mediapixels._image_params);
# gray(x, y) = Σ_c (3x + 7y + 11c + doc_id) % 256. Block membership is
# the same floor((k·n)/G) boundary lattice the numpy side slices with.
def _block_case(var: str, dim: str) -> str:
    cuts = [f"(({k} * {dim}) // {GRID})" for k in (1, 2, 3)]
    return (
        f"CASE WHEN {var} < {cuts[0]} THEN 0"
        f" WHEN {var} < {cuts[1]} THEN 1"
        f" WHEN {var} < {cuts[2]} THEN 2 ELSE 3 END"
    )


MULTIMODAL_RESIZE_SQL = f"""
WITH px AS (
  SELECT doc_id,
         (8 + doc_id % 24) AS w,
         i % (8 + doc_id % 24) AS x,
         i // (8 + doc_id % 24) AS y,
         (8 + (doc_id * 3) % 24) AS h
  FROM documents,
       unnest(range((8 + doc_id % 24) * (8 + (doc_id * 3) % 24)))
         AS t(i)
  WHERE doc_id % 2 = 0
),
gray AS (
  SELECT doc_id,
         {_block_case("y", "h")} AS by,
         {_block_case("x", "w")} AS bx,
         (3 * x + 7 * y + doc_id) % 256
         + (3 * x + 7 * y + 11 + doc_id) % 256
         + (3 * x + 7 * y + 22 + doc_id) % 256 AS g
  FROM px
)
SELECT doc_id, cast(by AS int) AS by, cast(bx AS int) AS bx,
       count(*) AS n_px, cast(sum(g) AS bigint) AS sum_px
FROM gray
GROUP BY doc_id, by, bx
ORDER BY doc_id, by, bx
"""


MEDIARESIZE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_resize": multimodal_resize,
}

MEDIARESIZE_ORACLES: dict[str, str] = {
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
}
