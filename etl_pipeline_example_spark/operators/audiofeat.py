"""Audio feature extraction (segment energy) over REALLY decoded PCM.

The audio twin of ``multimodal_resize``: every audio document's
samples are split into ``SEGS`` exact time segments (the same
floor-boundary lattice), and each segment reports the integer energy
triplet a VAD/quality gate consumes — sample count, sum of squared
amplitudes (the energy; the consumer divides and roots for RMS) and
peak amplitude. The samples come from the REAL byte path: synthesize
the document's 16-bit PCM WAV, decode it back with the certified
mediapixels decoder (RIFF walk + frombuffer), THEN measure — and the
oracle recomputes the planted-sample arithmetic without seeing bytes.

Integer-exact: amplitudes are int16, squares ≤ 2048², segment sums
far inside bigint; no division, no floats.

Scale shape: Arrow-batched ``mapInPandas`` fused with the decode, no
shuffle, SEGS-bounded output per document.

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
    _audio_params,
    decode_wav,
    encode_wav,
    planted_samples,
)
from etl_pipeline_example_spark.sources.readers import read_table

AUDIO_SCHEMA = (
    "doc_id bigint, seg int, n_samples bigint, sum_sq bigint, max_amp int"
)
SEGS = 4


def _energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
            wide = smp.astype(np.int64)
            for seg in range(SEGS):
                block = wide[cuts[seg] : cuts[seg + 1]]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "seg": seg,
                        "n_samples": int(block.size),
                        "sum_sq": int((block * block).sum()),
                        "max_amp": int(block.max()),
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "seg", "n_samples", "sum_sq", "max_amp"],
        )


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg, n_samples, sum_sq, max_amp): exact segment-energy
    panel of each really-decoded audio document."""
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id"
    )
    return docs.mapInPandas(_energy_batch, schema=AUDIO_SCHEMA).orderBy(
        "doc_id", "seg"
    )


# frames/channels are pure functions of doc_id (mediapixels):
# n_frames = 200 + doc_id % 300, channels = 1 + doc_id % 2,
# sample(i frame, c ch) = ((31·doc_id + 17i + 5c) % 4096) − 2048.
# Segment membership uses frame index (both channels of a frame land
# in the same segment — matching the numpy frame slicing).
_SEG_CASE = (
    "CASE WHEN fr < ((1 * nf) // 4) THEN 0"
    " WHEN fr < ((2 * nf) // 4) THEN 1"
    " WHEN fr < ((3 * nf) // 4) THEN 2 ELSE 3 END"
)

MULTIMODAL_AUDIO_ENERGY_SQL = f"""
WITH s AS (
  SELECT doc_id,
         (200 + doc_id % 300) AS nf,
         i // (1 + doc_id % 2) AS fr,
         ((31 * doc_id + 17 * (i // (1 + doc_id % 2))
           + 5 * (i % (1 + doc_id % 2))) % 4096) - 2048 AS amp
  FROM documents,
       unnest(range((200 + doc_id % 300) * (1 + doc_id % 2))) AS t(i)
  WHERE doc_id % 2 = 1
),
seg AS (
  SELECT doc_id, {_SEG_CASE} AS seg, amp FROM s
)
SELECT doc_id, cast(seg AS int) AS seg,
       count(*) AS n_samples,
       cast(sum(amp * amp) AS bigint) AS sum_sq,
       cast(max(amp) AS int) AS max_amp
FROM seg
GROUP BY doc_id, seg
ORDER BY doc_id, seg
"""


AUDIOFEAT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_audio_energy": multimodal_audio_energy,
}

AUDIOFEAT_ORACLES: dict[str, str] = {
    "multimodal_audio_energy": MULTIMODAL_AUDIO_ENERGY_SQL,
}
