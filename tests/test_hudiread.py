"""Hudi Copy-on-Write reader (pipeline/hudiread.py): tables built BY
HAND to the public Hudi storage layout — hoodie.properties, timeline
instants, fileId_token_instant.parquet base files — read back without
any hudi jar. Round-17: the third point of the table-format triangle
(verdict ask #4)."""

from __future__ import annotations

import os
import shutil

import pytest

from etl_pipeline_example_spark.pipeline.hudiread import (
    hudi_instants,
    read_hoodie_properties,
    read_hudi,
)


def _props(root, ttype="COPY_ON_WRITE"):
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    with open(f"{root}/.hoodie/hoodie.properties", "w") as f:
        f.write("#updated at 20260816\n")
        f.write("hoodie.table.name=tbl\n")
        f.write(f"hoodie.table.type={ttype}\n")
        f.write("hoodie.table.version=6\n")


def _instant(root, ts, action="commit", state=None):
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    name = f"{ts}.{action}" + (f".{state}" if state else "")
    with open(f"{root}/.hoodie/{name}", "w") as f:
        f.write("{}")


def _base_file(spark, root, rel, fid, ts, rows, token="0-1-2"):
    """One parquet base file with hudi meta columns + data columns."""
    full = [
        (ts, f"key{k}", k, v, p)
        for k, v, p in rows
    ]
    d = f"{root}/{rel}" if rel else root
    os.makedirs(d, exist_ok=True)
    stage = f"{d}/_stage"
    spark.createDataFrame(
        full,
        "_hoodie_commit_time string, _hoodie_record_key string,"
        " k bigint, val string, p string",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(f"{stage}/{part}", f"{d}/{fid}_{token}_{ts}.parquet")
    shutil.rmtree(stage)


def _build_cow(spark, root):
    """Two partitions, two commits: commit 2 rewrites file group fA
    (COW upsert) and adds group fC; fB carries."""
    _props(root)
    _instant(root, "001", "commit", "requested")
    _instant(root, "001", "commit", "inflight")
    _instant(root, "001")
    _instant(root, "002", "commit", "requested")
    _instant(root, "002", "commit", "inflight")
    _instant(root, "002")
    _base_file(spark, root, "p=a", "fA", "001",
               [(1, "v1", "a"), (2, "v2", "a")])
    _base_file(spark, root, "p=b", "fB", "001", [(3, "v3", "b")])
    # commit 002: upsert k=2 -> fA gets a NEW slice; new group fC
    _base_file(spark, root, "p=a", "fA", "002",
               [(1, "v1", "a"), (2, "V2", "a")])
    _base_file(spark, root, "p=b", "fC", "002", [(4, "v4", "b")])


def test_read_hudi_latest_slice_wins(spark, tmp_path):
    root = str(tmp_path / "hudi")
    _build_cow(spark, root)
    df = read_hudi(spark, root)
    got = {r["k"]: r["val"] for r in df.collect()}
    assert got == {1: "v1", 2: "V2", 3: "v3", 4: "v4"}, got
    # meta columns ride along (the hudi contract)
    assert "_hoodie_commit_time" in df.columns
    assert hudi_instants(spark, root) == ["001", "002"]
    props = read_hoodie_properties(spark, root)
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"


def test_read_hudi_as_of_time_travel(spark, tmp_path):
    root = str(tmp_path / "hudi")
    _build_cow(spark, root)
    got = {r["k"]: r["val"]
           for r in read_hudi(spark, root, as_of="001").collect()}
    assert got == {1: "v1", 2: "v2", 3: "v3"}, got
    with pytest.raises(ValueError, match="no committed base files"):
        read_hudi(spark, root, as_of="000")


def test_read_hudi_uncommitted_and_inflight_excluded(spark, tmp_path):
    """A base file whose instant has no completed .commit (crashed or
    in-flight writer) must never become visible."""
    root = str(tmp_path / "hudi")
    _build_cow(spark, root)
    # instant 003 is inflight only; its file must be invisible
    _instant(root, "003", "commit", "requested")
    _instant(root, "003", "commit", "inflight")
    _base_file(spark, root, "p=a", "fA", "003",
               [(1, "GHOST", "a"), (2, "GHOST", "a")])
    # instant 004 has NO timeline entry at all (crashed pre-request)
    _base_file(spark, root, "p=b", "fD", "004", [(9, "GHOST", "b")])
    got = {r["k"]: r["val"] for r in read_hudi(spark, root).collect()}
    assert got == {1: "v1", 2: "V2", 3: "v3", 4: "v4"}, got


def test_read_hudi_archival_fence(spark, tmp_path):
    """Instants strictly older than the whole active timeline were
    archived by the writer and count as committed — the table still
    reads after its early .commit files are archived away."""
    root = str(tmp_path / "hudi")
    _build_cow(spark, root)
    os.remove(f"{root}/.hoodie/001.commit")
    os.remove(f"{root}/.hoodie/001.commit.requested")
    os.remove(f"{root}/.hoodie/001.commit.inflight")
    got = {r["k"]: r["val"] for r in read_hudi(spark, root).collect()}
    assert got == {1: "v1", 2: "V2", 3: "v3", 4: "v4"}, got


def test_read_hudi_loud_boundaries(spark, tmp_path):
    root = str(tmp_path / "mor")
    _props(root, ttype="MERGE_ON_READ")
    _instant(root, "001")
    with pytest.raises(ValueError, match="COPY_ON_WRITE"):
        read_hudi(spark, root)

    root2 = str(tmp_path / "delta")
    _props(root2)
    _instant(root2, "001", "deltacommit")
    with pytest.raises(ValueError, match="deltacommit"):
        read_hudi(spark, root2)

    root3 = str(tmp_path / "clust")
    _props(root3)
    _instant(root3, "001")
    _instant(root3, "002", "replacecommit")
    with pytest.raises(ValueError, match="replacecommit"):
        read_hudi(spark, root3)

    root4 = str(tmp_path / "logf")
    _props(root4)
    _instant(root4, "001")
    _base_file(spark, root4, "p=a", "fA", "001", [(1, "v1", "a")])
    with open(f"{root4}/p=a/.fA_20260101.log.1_0-1-2", "w") as f:
        f.write("x")
    with pytest.raises(ValueError, match="log file"):
        read_hudi(spark, root4)

    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        read_hudi(spark, str(tmp_path / "nothere"))


def test_read_hudi_dropped_partition_columns_rejected(spark, tmp_path):
    """Hive-style dirs whose column is absent from the base files
    (drop.partition.columns=true) raise instead of yielding nulls."""
    root = str(tmp_path / "dropped")
    _props(root)
    _instant(root, "001")
    d = f"{root}/ds=2026-08-16"
    os.makedirs(d)
    stage = f"{d}/_stage"
    spark.createDataFrame(
        [(1, "a")], "k bigint, val string"
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(f"{stage}/{part}", f"{d}/fA_0-1-2_001.parquet")
    shutil.rmtree(stage)
    with pytest.raises(ValueError, match="drop.partition.columns"):
        read_hudi(spark, root)


# ------------------------------------------------------------ export
def test_export_hudi_roundtrips_through_read_hudi(spark, tmp_path):
    """versioned -> export_hudi -> read_hudi equals read_versioned;
    a later upsert rewrites ONLY the affected bucket's file group and
    instant time travel matches versioned history."""
    from etl_pipeline_example_spark.pipeline.hudiexport import export_hudi
    from etl_pipeline_example_spark.pipeline.versioned import (
        read_versioned,
        upsert_versioned,
        write_versioned,
    )

    src = str(tmp_path / "vtbl")
    dest = str(tmp_path / "hudi_out")
    df = spark.createDataFrame(
        [(k, f"v{k}", 1) for k in range(40)], "k bigint, val string, n int"
    )
    write_versioned(spark, df, src, key="k", nbuckets=4)
    ts0 = export_hudi(spark, src, dest)
    assert ts0 == f"{1:014d}"  # versioned heads start at 1
    got = read_hudi(spark, dest)
    assert {r["k"]: r["val"] for r in got.collect()} == {
        r["k"]: r["val"] for r in read_versioned(spark, src).collect()
    }
    # hudi meta columns are populated
    meta = got.select("_hoodie_commit_time", "_hoodie_record_key").first()
    assert meta[0] == ts0 and meta[1] in {str(k) for k in range(40)}
    base0 = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(base0) == 4  # one file group per bucket

    # idempotent re-export of the same head
    assert export_hudi(spark, src, dest) == ts0
    assert len([f for f in os.listdir(dest) if f.endswith(".parquet")]) == 4

    upd = spark.createDataFrame(
        [(5, "V5", 2)], "k bigint, val string, n int"
    )
    upsert_versioned(spark, src, upd, "k", "n")
    ts1 = export_hudi(spark, src, dest)
    assert ts1 == f"{2:014d}"
    base1 = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    # only ONE bucket rewritten: 4 original slices + 1 new slice
    assert len(base1) == 5, sorted(base1)
    latest = {r["k"]: r["val"] for r in read_hudi(spark, dest).collect()}
    assert len(latest) == 40 and latest[5] == "V5"
    asof = {
        r["k"]: r["val"]
        for r in read_hudi(spark, dest, as_of=ts0).collect()
    }
    assert len(asof) == 40 and asof[5] == "v5"
    assert hudi_instants(spark, dest) == [ts0, ts1]


def test_export_hudi_refuses_shallow_clone_refs(spark, tmp_path):
    from etl_pipeline_example_spark.pipeline.hudiexport import export_hudi
    from etl_pipeline_example_spark.pipeline.versioned import (
        clone_versioned,
        write_versioned,
    )

    src = str(tmp_path / "vtbl")
    write_versioned(
        spark,
        spark.createDataFrame([(1, "a", 1)], "k bigint, val string, n int"),
        src, key="k", nbuckets=2,
    )
    cl = str(tmp_path / "clone")
    clone_versioned(spark, src, cl)
    with pytest.raises(ValueError, match="compact_versioned"):
        export_hudi(spark, cl, str(tmp_path / "out"))
