"""Lake maintenance: compaction and upsert."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from etl_pipeline_example_spark.pipeline.maintain import (
    compact_partition,
    upsert_snapshot,
)


def test_compact_partition_reduces_files(spark, tmp_path):
    path = str(tmp_path / "many_files")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(32).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*")) == 32
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    n = compact_partition(spark, path)
    files = glob.glob(f"{path}/part-*")
    assert len(files) == n == 1  # 10k rows ≪ 128 MB target
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert before == after


def test_compact_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_partition(spark, str(tmp_path / "nope"))


def test_upsert_latest_wins(spark, tmp_path):
    path = str(tmp_path / "keyed")
    spark.createDataFrame(
        [(1, "old", 1), (2, "keep", 1), (3, "stale", 2)],
        "k bigint, v string, ver int",
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(1, "new", 2),      # higher version: replaces
         (3, "ignored", 1),  # lower version: current row survives
         (4, "insert", 1)],  # new key: inserted
        "k bigint, v string, ver int",
    )
    upsert_snapshot(spark, path, updates, key="k", version_col="ver")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("new", 2), 2: ("keep", 1), 3: ("stale", 2), 4: ("insert", 1)}


def test_upsert_equal_version_prefers_update(spark, tmp_path):
    path = str(tmp_path / "tie")
    spark.createDataFrame([(1, "current", 5)], "k bigint, v string, ver int").write.parquet(path)
    updates = spark.createDataFrame([(1, "update", 5)], "k bigint, v string, ver int")
    upsert_snapshot(spark, path, updates, key="k", version_col="ver")
    assert spark.read.parquet(path).collect()[0]["v"] == "update"


def test_swap_into_place_semantics(spark, tmp_path):
    from etl_pipeline_example_spark.fsutil import swap_into_place

    dest = str(tmp_path / "t")
    # first swap: dest doesn't exist yet
    spark.range(5).write.parquet(dest + "__tmp1")
    swap_into_place(spark, dest + "__tmp1", dest)
    assert spark.read.parquet(dest).count() == 5
    # replacing swap: new data in, no __old residue
    spark.range(9).write.parquet(dest + "__tmp2")
    swap_into_place(spark, dest + "__tmp2", dest)
    assert spark.read.parquet(dest).count() == 9
    import os
    assert not os.path.exists(dest + "__old")


def test_expire_snapshots_keeps_newest(spark, tmp_path):
    from etl_pipeline_example_spark.metadata.spec import TableSpec
    from etl_pipeline_example_spark.pipeline.maintain import expire_snapshots
    from etl_pipeline_example_spark.sinks.writers import write_curated

    spec = TableSpec.from_dict({
        "name": "snaps",
        "columns": [
            {"name": "k", "type": "long"},
            {"name": "snap", "type": "character"},
        ],
        "partitions": ["snap"],
    })
    path = str(tmp_path / "snaps")
    df = spark.range(10).select(F.col("id").alias("k"))
    for day in ("2026-08-10", "2026-08-11", "2026-08-12", "2026-08-13"):
        write_curated(df, spec, path, partition_values={"snap": day})
    gone = expire_snapshots(spark, path, "snap", keep=2)
    assert gone == ["snap=2026-08-10", "snap=2026-08-11"]
    left = {str(r["snap"]) for r in spark.read.parquet(path).select("snap").distinct().collect()}
    assert left == {"2026-08-12", "2026-08-13"}  # partition col inferred as date


def test_zorder_write_shrinks_per_file_bounding_boxes(spark, tmp_path):
    """Write orders plain and z-ordered on (o_custkey, o_totalprice);
    read the parquet footers back and compare the summed normalized
    per-file bounding-box areas over the two keys. The z-order layout
    must cover the key space in compact rectangles (markedly smaller
    total area), preserve every row, and prune on BOTH columns."""
    import glob

    import pyarrow.parquet as pq

    from etl_pipeline_example_spark.sinks.zorder import zorder_write
    from etl_pipeline_example_spark.sources.readers import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    n = orders.count()
    plain_dir = f"{tmp_path}/plain"
    z_dir = f"{tmp_path}/zorder"
    orders.repartition(8).write.mode("overwrite").parquet(plain_dir)
    zorder_write(orders, z_dir, "o_custkey", "o_totalprice", n_files=8)

    def total_box_area(d):
        los_x, his_x, los_y, his_y = [], [], [], []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.num_columns)}
            xs, ys = [], []
            for g in range(md.num_row_groups):
                sx = md.row_group(g).column(cols["o_custkey"]).statistics
                sy = md.row_group(g).column(cols["o_totalprice"]).statistics
                xs += [sx.min, sx.max]
                ys += [float(sy.min), float(sy.max)]
            los_x.append(min(xs)); his_x.append(max(xs))
            los_y.append(min(ys)); his_y.append(max(ys))
        gx = max(his_x) - min(los_x)
        gy = max(his_y) - min(los_y)
        return sum(
            ((hx - lx) / gx) * ((hy - ly) / gy)
            for lx, hx, ly, hy in zip(los_x, his_x, los_y, his_y)
        )

    assert spark.read.parquet(z_dir).count() == n
    plain_area = total_box_area(plain_dir)
    z_area = total_box_area(z_dir)
    # plain round-robin files each span ~the full plane (area ≈ 8);
    # z-order files tile it (total area ≈ 1-2)
    assert z_area < 0.5 * plain_area, (z_area, plain_area)


def test_write_training_shards_roundtrips_with_balanced_budgets(spark, tmp_path):
    """Shard directories land as shard_id=N/*.json.gz, every document
    survives the roundtrip exactly once, and re-reading reproduces the
    same per-shard token totals the assignment computed."""
    import glob

    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.shard import shard_by_tokens
    from etl_pipeline_example_spark.sinks.shards import write_training_shards
    from etl_pipeline_example_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    out = f"{tmp_path}/shards"
    n_shards = write_training_shards(spark, sf, out)
    dirs = sorted(glob.glob(f"{out}/shard_id=*"))
    assert len(dirs) == n_shards and n_shards >= 2, dirs
    assert all(glob.glob(f"{d}/*.json.gz") for d in dirs)
    back = spark.read.json(out)
    n_docs = read_table(spark, sf, "documents").count()
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    got = {
        r["shard_id"]: r["tok"]
        for r in back.groupBy("shard_id").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    want = {
        r["shard_id"]: r["tok"]
        for r in shard_by_tokens(spark, sf)
        .groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert got == want
