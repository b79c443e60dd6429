"""Zero-crossing rate over REALLY decoded PCM — the energy panel's twin.

Voice-activity detection and audio-quality gates pair segment ENERGY
(operators/audiofeat.py) with the zero-crossing count: high energy +
low ZCR reads as voiced speech/tone, low energy + high ZCR as noise.
Same certified byte path — synthesize the document's 16-bit PCM WAV,
decode it back with the RIFF-walking decoder, THEN measure — and the
oracle recomputes the planted-sample arithmetic without seeing bytes.

A crossing is a sign flip between CONSECUTIVE samples of one channel
(sign(x) := x < 0, so zero counts as non-negative — crisp in both
engines); the pair (i, i+1) is attributed to the segment of frame i on
the same floor-boundary lattice the energy panel uses. All counting —
integer-exact by construction.

Scale shape: Arrow-batched ``mapInPandas`` fused with the decode, no
shuffle, SEGS-bounded output per document.

Reference: N/A (305-LoC Glue ETL has no media surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-12 grading window —
first driver slot round 13.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.operators.audiofeat import SEGS
from etl_pipeline_example_spark.operators.mediapixels import (
    _audio_params,
    decode_wav,
    encode_wav,
    planted_samples,
)
from etl_pipeline_example_spark.sources.readers import read_table

ZCR_SCHEMA = "doc_id bigint, seg int, n_pairs bigint, n_crossings bigint"


def _zcr_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            if doc_id % 2 != 1:
                continue  # audio docs only (even ids are images)
            rate, _, _ = _audio_params(doc_id)
            smp, got_rate = decode_wav(
                encode_wav(planted_samples(doc_id), rate)
            )
            assert got_rate == rate
            n = smp.shape[0]
            cuts = [(k * n) // SEGS for k in range(SEGS + 1)]
            neg = smp < 0  # (frames, channels)
            cross = neg[:-1, :] != neg[1:, :]  # pair i = frames (i, i+1)
            for seg in range(SEGS):
                lo, hi = cuts[seg], min(cuts[seg + 1], n - 1)
                block = cross[lo:hi, :]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "seg": seg,
                        "n_pairs": int(block.size),
                        "n_crossings": int(block.sum()),
                    }
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "seg", "n_pairs", "n_crossings"]
        )


def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg, n_pairs, n_crossings): exact per-segment
    zero-crossing census of each really-decoded audio document."""
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id"
    )
    return docs.mapInPandas(_zcr_batch, schema=ZCR_SCHEMA).orderBy(
        "doc_id", "seg"
    )


# sample(i frame, c ch) = ((31·doc_id + 17i + 5c) % 4096) − 2048
# (operators/mediapixels.py planted_samples); pair (fr, fr+1) belongs
# to the segment of fr, and the last frame pairs with nothing.
_SEG_CASE = (
    "CASE WHEN fr < ((1 * nf) // 4) THEN 0"
    " WHEN fr < ((2 * nf) // 4) THEN 1"
    " WHEN fr < ((3 * nf) // 4) THEN 2 ELSE 3 END"
)

MULTIMODAL_AUDIO_ZCR_SQL = f"""
WITH s AS (
  SELECT doc_id,
         (200 + doc_id % 300) AS nf,
         i // (1 + doc_id % 2) AS fr,
         i % (1 + doc_id % 2) AS ch,
         ((31 * doc_id + 17 * (i // (1 + doc_id % 2))
           + 5 * (i % (1 + doc_id % 2))) % 4096) - 2048 AS amp
  FROM documents,
       unnest(range((200 + doc_id % 300) * (1 + doc_id % 2))) AS t(i)
  WHERE doc_id % 2 = 1
),
paired AS (
  SELECT doc_id, nf, fr, amp,
         lead(amp) OVER (PARTITION BY doc_id, ch ORDER BY fr) AS nxt
  FROM s
),
seg AS (
  SELECT doc_id, {_SEG_CASE} AS seg,
         CASE WHEN (amp < 0) <> (nxt < 0) THEN 1 ELSE 0 END AS c
  FROM paired WHERE nxt IS NOT NULL
)
SELECT doc_id, cast(seg AS int) AS seg,
       count(*) AS n_pairs,
       cast(sum(c) AS bigint) AS n_crossings
FROM seg
GROUP BY doc_id, seg
ORDER BY doc_id, seg
"""


AUDIOZCR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_audio_zcr": multimodal_audio_zcr,
}

AUDIOZCR_ORACLES: dict[str, str] = {
    "multimodal_audio_zcr": MULTIMODAL_AUDIO_ZCR_SQL,
}
