"""Delta Lake log EXPORT for versioned tables — the reverse interop.

``read_delta`` (deltaread.py) lets a migration user read their
existing Delta tables here; this module is the other direction: emit
a protocol-conformant ``_delta_log`` alongside a versioned table's
own manifests, so any external Delta reader (Spark+delta, DuckDB
delta extension, Trino, ...) can read the table we maintain — the
standard "publish to the open format" hand-off, without surrendering
the table's write path (our rename-free commit protocol keeps owning
writes; the Delta log is a PUBLISHED VIEW of committed state).

``export_delta(spark, path)`` brings ``<path>/_delta_log`` in sync
with the CURRENT versioned manifest:

- first export writes Delta commit 0: ``protocol`` (reader 1 /
  writer 2 — plain add/remove tables need nothing newer), ``metaData``
  (the manifest's Spark StructType JSON — which IS Delta's
  schemaString format — unpartitioned: bucket dirs are a layout, not
  hive partitions), and one ``add`` per manifest file (table-relative
  paths, so the log is self-contained under the table root);
- each later export writes ONE commit containing the FILE DIFF vs the
  last exported state (``remove`` + ``add``), plus a fresh
  ``metaData`` only when the schema changed — the Delta-native shape
  of our copy-on-write upserts;
- the versioned version each commit captured rides in ``commitInfo``
  (``etlVersionedVersion``), which is how the next export finds its
  diff base — commitInfo is the spec's free-form slot, ignored by
  readers;
- idempotent: exporting an already-exported version is a no-op
  returning the existing head.

Honest boundary: a SHALLOW CLONE's borrowed external refs cannot be
published in a self-contained log — export raises and points at
``compact_versioned`` (the documented clone escape) instead of
emitting a log with dangling absolute paths.

Round-trip is pinned against our own ``read_delta`` (which is itself
pinned against hand-built protocol-conformant logs), covering latest
read, time travel to the first export, and post-upsert diffs.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from etl_pipeline_example_spark.fsutil import hadoop_fs
from etl_pipeline_example_spark.pipeline.versioned import (
    _is_external,
    _jpath,
    _read_manifest,
    _read_pointer,
)

_LOG = "_delta_log"


def _list_commits(spark: SparkSession, path: str) -> list[int]:
    fs, _ = hadoop_fs(spark, path)
    ldir = _jpath(spark, f"{path}/{_LOG}")
    if not fs.exists(ldir):
        return []
    out = []
    for st in fs.listStatus(ldir):
        name = st.getPath().getName()
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _read_commit(spark: SparkSession, path: str, v: int) -> list[dict]:
    fs, _ = hadoop_fs(spark, path)
    stream = fs.open(_jpath(spark, f"{path}/{_LOG}/{v:020d}.json"))
    try:
        raw = bytes(stream.readAllBytes()).decode()
    finally:
        stream.close()
    return [json.loads(ln) for ln in raw.splitlines() if ln.strip()]


def _write_commit(
    spark: SparkSession, path: str, v: int, actions: list[dict]
) -> None:
    fs, _ = hadoop_fs(spark, path)
    fs.mkdirs(_jpath(spark, f"{path}/{_LOG}"))
    # create-exclusive, like our own manifests: two racing exporters
    # cannot both claim the same Delta version
    out = fs.create(_jpath(spark, f"{path}/{_LOG}/{v:020d}.json"), False)
    try:
        out.write(
            ("\n".join(json.dumps(a) for a in actions) + "\n").encode()
        )
    finally:
        out.close()


def _exported_state(
    spark: SparkSession, path: str
) -> tuple[int | None, int | None, set[str], str | None]:
    """(last delta commit, versioned version it captured, its file
    set, its schemaString) — replayed from the existing log."""
    commits = _list_commits(spark, path)
    if not commits:
        return None, None, set(), None
    files: set[str] = set()
    captured: int | None = None
    schema: str | None = None
    for c in commits:
        for rec in _read_commit(spark, path, c):
            if "add" in rec:
                files.add(rec["add"]["path"])
            elif "remove" in rec:
                files.discard(rec["remove"]["path"])
            elif "metaData" in rec:
                schema = rec["metaData"]["schemaString"]
            elif "commitInfo" in rec:
                ev = rec["commitInfo"].get("etlVersionedVersion")
                if ev is not None:
                    captured = int(ev)
    return commits[-1], captured, files, schema


def export_delta(spark: SparkSession, path: str) -> int:
    """Sync ``<path>/_delta_log`` to the current versioned manifest;
    returns the Delta commit version now at the head (idempotent if
    the current versioned version is already exported)."""
    head = _read_pointer(spark, path)
    manifest = _read_manifest(spark, path, head)
    externals = [
        e["path"] for e in manifest["files"] if _is_external(e["path"])
    ]
    if externals:
        raise ValueError(
            "cannot export a shallow clone's borrowed external refs to a"
            " self-contained Delta log — compact_versioned() first"
            f" (first borrowed ref: {externals[0]})"
        )
    last_commit, captured, old_files, old_schema = _exported_state(
        spark, path
    )
    if captured == head and last_commit is not None:
        return last_commit
    new_files = {e["path"] for e in manifest["files"]}
    stamp = int(manifest.get("committed_at_ms", 0))
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "ETL_VERSIONED_EXPORT",
                "etlVersionedVersion": head,
            }
        }
    ]
    if last_commit is None:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
    if manifest["schema"] != old_schema:
        actions.append(
            {
                "metaData": {
                    "id": f"etl-versioned-{head}",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": manifest["schema"],
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    for ref in sorted(old_files - new_files):
        actions.append(
            {
                "remove": {
                    "path": ref,
                    "dataChange": True,
                    "deletionTimestamp": stamp,
                }
            }
        )
    for e in manifest["files"]:
        if e["path"] in old_files:
            continue
        actions.append(
            {
                "add": {
                    "path": e["path"],
                    "partitionValues": {},
                    "size": int(e.get("size", 0)),
                    "modificationTime": stamp,
                    "dataChange": True,
                }
            }
        )
    next_commit = 0 if last_commit is None else last_commit + 1
    _write_commit(spark, path, next_commit, actions)
    return next_commit
