"""Hand-verifiable unit tests for the round-8 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones — and, for the persisted-index gate,
that the production probe path is row-identical to the oracle-shaped
in-op-build gate.
"""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source). Writes the documents
    table layout the operators read."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_neardup_index_probe_matches_in_op_build(spark, tmp_path):
    """build_neardup_index + stream_neardup_gate_indexed must emit
    exactly the rows stream_neardup_gate computes with its in-op
    history build — the round-7 perf-weak flag's production shape —
    and the artifact must contain the two narrow tables (no text, no
    shingles: the index is schema-bounded regardless of doc size)."""
    from etl_pipeline_example_spark.streaming.neargate import stream_neardup_gate
    from etl_pipeline_example_spark.streaming.neargate_index import (
        build_neardup_index,
        stream_neardup_gate_indexed,
    )

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "neardup_index")
    build_neardup_index(spark, sf, path)

    sig = spark.read.parquet(f"{path}/signatures")
    bands = spark.read.parquet(f"{path}/bands")
    assert sig.columns[0] == "other" and len(sig.columns) == 17
    assert sorted(bands.columns) == ["band", "bucket", "other"]
    assert bands.count() == sig.count() * 8  # MH_BANDS cells per doc

    indexed = sorted(
        (r["doc_id"], r["near_hist"])
        for r in stream_neardup_gate_indexed(spark, sf, path).collect()
    )
    inop = sorted(
        (r["doc_id"], r["near_hist"])
        for r in stream_neardup_gate(spark, sf).collect()
    )
    assert indexed == inop
    assert len(indexed) > 0
    assert any(flag for _, flag in indexed)  # the gate actually fires


def test_pipeline_retries_transient_failure_and_skips_done_tasks():
    """Reference-parity retry/idempotency (dags/example_etl_dag.py
    task_args): a task failing twice with retries=2 succeeds on the
    third attempt; a re-run of the completed pipeline skips tasks whose
    done-probe holds and re-invokes (overwrite-atomic) the rest; a task
    exhausting retries fails the run and blocks downstream tasks."""
    import pytest

    from etl_pipeline_example_spark.pipeline.dag import Pipeline

    calls = {"flaky": 0, "always": 0}
    produced = []

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] < 3:
            raise OSError("transient")
        produced.append("out")
        return "ok"

    def always():
        calls["always"] += 1
        return "rewritten"

    p = Pipeline("etl", schedule="30 13 * * 0")
    p.task("extract", flaky, retries=2, done=lambda: "out" in produced)
    p.task("curate", always, after=["extract"])
    r1 = p.run()
    assert r1 == {"extract": "ok", "curate": "rewritten"}
    assert calls["flaky"] == 3
    assert p.last_state["extract"] == {"status": "success", "attempts": 3}

    # full re-run of a completed DAG: probed task is a no-op, the
    # overwrite-atomic task re-runs cleanly
    r2 = p.run()
    assert calls["flaky"] == 3  # not re-invoked
    assert p.last_state["extract"]["status"] == "skipped"
    assert r2["curate"] == "rewritten" and calls["always"] == 2

    # retries exhausted -> run fails, downstream blocked
    p2 = Pipeline("etl2")
    p2.task("boom", lambda: (_ for _ in ()).throw(OSError("down")), retries=1)
    p2.task("after", lambda: "never", after=["boom"])
    with pytest.raises(RuntimeError, match="task 'boom' failed"):
        p2.run()
    assert p2.last_state["boom"] == {"status": "failed", "attempts": 2}
    assert p2.last_state["after"]["status"] == "blocked"


def test_spark_job_submits_polls_and_propagates(tmp_path):
    """run_glue_job.py parity (reference python_scripts/run_glue_job.py:
    submit → wait_for_completion): a real engine stage runs in its OWN
    interpreter via SparkJob, its job_arguments arrive as argv, success
    is observable in the artifact it writes, and a crashing job raises
    JobFailedError carrying the exit code and the log tail."""
    import pytest

    from etl_pipeline_example_spark.pipeline.jobrun import JobFailedError, SparkJob

    job_dir = tmp_path / "count_job"
    job_dir.mkdir()
    (job_dir / "job.py").write_text(
        """
import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--snapshot_date", required=True)
ap.add_argument("--out", required=True)
args = ap.parse_args()

from etl_pipeline_example_spark import get_spark
from etl_pipeline_example_spark.functions.transforms import version_stamp
from etl_pipeline_example_spark.sources.readers import read_table

spark = get_spark()
docs = read_table(spark, "/root/testdata/sf0.001", "documents")
out = version_stamp(docs.groupBy("source").count(), args.snapshot_date)
out.write.mode("overwrite").parquet(args.out)
spark.stop()
"""
    )
    out = str(tmp_path / "out.parquet")
    job = SparkJob(
        str(job_dir),
        job_arguments={"--snapshot_date": "2026-08-14", "--out": out},
    )
    assert job.state == "READY"
    job.run_job()
    assert job.wait_for_completion(poll_seconds=0.2) == "SUCCEEDED"

    import duckdb

    rows = duckdb.sql(f"SELECT count(*) n, min(dea_version) v FROM '{out}/*.parquet'").fetchone()
    assert rows[0] > 0 and rows[1] == "2026-08-14"

    bad_dir = tmp_path / "bad_job"
    bad_dir.mkdir()
    (bad_dir / "job.py").write_text("import sys; print('igniting'); sys.exit(3)\n")
    bad = SparkJob(str(bad_dir))
    bad.run_job()
    with pytest.raises(JobFailedError) as ei:
        bad.wait_for_completion(poll_seconds=0.1)
    assert ei.value.exit_code == 3
    assert "igniting" in ei.value.log_tail


def test_shard_feed_drain_source_is_a_single_micro_batch(spark):
    """Round-7 ADVICE guard: stream_shard_feed's stream/batch parity
    holds only if the AvailableNow drain runs as ONE micro-batch (the
    per-source fold is arrival-ordered; a split drain would fold
    cross-batch and diverge from the global prefix-sum oracle). Pin the
    premise the op relies on: the identical source spec (single parquet
    file, pathGlobFilter, NO maxFilesPerTrigger) drains sf0.01 in
    exactly one batch. Any future edit that batches the source (e.g.
    maxFilesPerTrigger) must revisit shardfeed.py's fold."""
    import tempfile
    import uuid

    sf = "/root/testdata/sf0.01"
    src = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf)
    )
    sink = f"shardfeed_drain_probe_{uuid.uuid4().hex[:8]}"
    q = (
        src.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    total = sum(p["numInputRows"] for p in progress)
    expected = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert total == expected
    assert len(data_batches) == 1, [
        (p["batchId"], p["numInputRows"]) for p in progress
    ]


def test_png_and_wav_codecs_roundtrip_exactly():
    """The real-decoder contract independent of Spark: a PNG encoded
    with ALL FIVE scanline filters (y % 5) decodes back to the exact
    pixel array; a corrupted chunk fails CRC; WAV PCM round-trips
    bit-exactly with the declared rate."""
    import numpy as np
    import pytest

    from etl_pipeline_example_spark.operators.mediapixels import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)  # >=5 rows: all filters
    payload = encode_png(img)
    assert np.array_equal(decode_png(payload), img)

    corrupt = bytearray(payload)
    corrupt[40] ^= 0xFF  # inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))

    smp = rng.integers(-2048, 2048, size=(333, 2)).astype(np.int16)
    back, rate = decode_wav(encode_wav(smp, 16000))
    assert rate == 16000 and np.array_equal(back, smp)


def test_multimodal_decode_stats_match_planted_pattern(spark, tmp_path):
    """One image doc + one audio doc with hand-computable stats: the
    operator's n/sum/max columns equal the planted-pattern arithmetic
    computed here in plain Python."""
    from etl_pipeline_example_spark.operators.mediapixels import (
        multimodal_decode,
        planted_pixels,
        planted_samples,
    )

    sf = _write_docs(spark, tmp_path, [(0, "img doc", "en", "s"), (1, "wav doc", "en", "s")])
    rows = {r["doc_id"]: r for r in multimodal_decode(spark, sf).collect()}
    px = planted_pixels(0)
    assert rows[0]["media_type"] == "image"
    assert (rows[0]["n_px"], rows[0]["sum_px"], rows[0]["max_px"]) == (
        px.size, int(px.sum()), int(px.max()),
    )
    smp = planted_samples(1)
    assert rows[1]["media_type"] == "audio"
    assert (rows[1]["n_samples"], rows[1]["sum_amp"], rows[1]["max_amp"]) == (
        smp.size, int(smp.sum()), int(smp.max()),
    )
