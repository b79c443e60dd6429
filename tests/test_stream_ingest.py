"""Streaming land→curated ingestion: incremental drains, exactly-once
across restarts."""

from __future__ import annotations

import gzip
import json

from etl_pipeline_example_spark.metadata.spec import TableSpec
from etl_pipeline_example_spark.streaming.ingest import stream_land_to_curated

SPEC = TableSpec.from_dict({
    "name": "recs",
    "columns": [
        {"name": "id", "type": "long"},
        {"name": "grp", "type": "character"},
    ],
})


def land_file(land_dir, name, ids):
    land_dir.mkdir(parents=True, exist_ok=True)
    with gzip.open(land_dir / f"{name}.jsonl.gz", "wt") as f:
        for i in ids:
            f.write(json.dumps({"id": i, "grp": f"g{i % 2}"}) + "\n")


def test_incremental_drains_are_exactly_once(spark, tmp_path):
    land = tmp_path / "land"
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    land_file(land, "batch1", range(0, 50))
    n1 = stream_land_to_curated(spark, str(land), curated, ckpt, SPEC)
    assert n1 == 50

    # draining again with nothing new must not duplicate
    n1b = stream_land_to_curated(spark, str(land), curated, ckpt, SPEC)
    assert n1b == 50

    # new arrivals are picked up incrementally (old files not re-read)
    land_file(land, "batch2", range(50, 80))
    n2 = stream_land_to_curated(spark, str(land), curated, ckpt, SPEC)
    assert n2 == 80
    got = sorted(r["id"] for r in spark.read.parquet(curated).collect())
    assert got == list(range(80))  # every row exactly once


def test_restart_after_crash_between_offset_and_commit(spark, tmp_path):
    """Exactly-once across the worst crash window: the engine wrote the
    batch's source offsets and the sink wrote its files, but died before
    the checkpoint commit marker. Deleting ``commits/<latest>`` recreates
    that state; the restart must REPLAY the batch and the file sink's
    ``_spark_metadata`` commit log must swallow the duplicate write."""
    import os

    land = tmp_path / "land"
    curated = str(tmp_path / "curated")
    ckpt = tmp_path / "ckpt"

    land_file(land, "batch1", range(0, 50))
    assert stream_land_to_curated(spark, str(land), curated, str(ckpt), SPEC) == 50
    land_file(land, "batch2", range(50, 80))
    assert stream_land_to_curated(spark, str(land), curated, str(ckpt), SPEC) == 80

    commits = sorted(
        f for f in os.listdir(ckpt / "commits") if not f.startswith(".")
    )
    os.remove(ckpt / "commits" / commits[-1])
    # the local ChecksumFs writes a .N.crc sidecar atomically with the
    # commit file; a real crash loses both, so drop it too (leaving it
    # makes the replayed commit's rename fail on the stale checksum)
    crc = ckpt / "commits" / f".{commits[-1]}.crc"
    if crc.exists():
        os.remove(crc)

    # restart: batch replays from its recorded offsets, sink must not dup
    assert stream_land_to_curated(spark, str(land), curated, str(ckpt), SPEC) == 80
    got = sorted(r["id"] for r in spark.read.parquet(curated).collect())
    assert got == list(range(80))

    # and the pipeline keeps moving afterwards
    land_file(land, "batch3", range(80, 90))
    assert stream_land_to_curated(spark, str(land), curated, str(ckpt), SPEC) == 90


def test_drains_extract_to_land_output_and_empty_start(spark, tmp_path):
    """The ingest must consume what the repo's own extract writes
    (part-*.txt.gz), and a drain over an empty land dir returns 0
    instead of raising."""
    from etl_pipeline_example_spark.pipeline import ZoneStore, extract_to_land

    zones = ZoneStore(str(tmp_path))
    land = zones.land_path("d", "recs")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    import os
    os.makedirs(land, exist_ok=True)
    assert stream_land_to_curated(spark, land, curated, ckpt, SPEC) == 0

    def fetch(i):
        return {"id": i, "grp": f"g{i % 2}"}

    extract_to_land(spark, zones, "d", "recs", fetch, 40, 1755000001)
    n = stream_land_to_curated(spark, land, curated, ckpt, SPEC)
    assert n == 40
