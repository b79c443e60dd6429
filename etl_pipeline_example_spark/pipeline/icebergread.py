"""Apache Iceberg table READER — metadata replay, no iceberg jar.

The round-15 verdict's ask #4: after Delta (deltaread.py), Iceberg is
the second-most-common table format a migration user arrives with.
An Iceberg table is self-describing public JSON + Avro (the Apache
Iceberg spec):

- ``metadata/*.metadata.json`` — plain JSON: schemas (field ids,
  names, types), partition specs, snapshot list, current snapshot id,
  and each snapshot's manifest-list pointer. The newest metadata file
  wins; ``version-hint.text`` is a HINT, the listing is the truth
  (the same hint-vs-listing contract as deltaread/_last_checkpoint);
- the snapshot's **manifest list** — an Avro OCF naming the manifest
  files (older v1 snapshots may inline ``manifests`` instead);
- each **manifest** — an Avro OCF of entries (status
  existing/added/deleted) carrying ``data_file`` records (path,
  format, counts).

Both Avro layers decode with the stdlib decoder (avroread.py) — no
library. Replay = pick snapshot (``snapshot_id=`` is time travel,
exactly Iceberg's ``VERSION AS OF``), walk manifest list -> manifests,
keep data files whose entry status != DELETED, then scan them as
plain parquet under the Spark schema translated from the Iceberg
schema JSON. Iceberg data files physically CONTAIN their partition
columns (unlike Hive/Delta layouts), so no value injection is needed.

Honest protocol boundaries, checked loudly instead of misread:

- **row-level v2 features**: delete manifests (content=1 in the
  manifest list) and delete files (data_file.content != 0) raise —
  applying position/equality deletes is the iceberg runtime's job;
- **renamed columns** (since r17, supported at the top level): when
  any top-level field id maps to more than one name across the
  schema history, the read switches to Iceberg's normative
  FIELD-ID-based resolution — each data file's embedded parquet
  field ids map its physical columns to the current names in a
  distributed ``binaryFile`` + ``mapInPandas`` pass
  (``_read_by_field_id``); files without embedded ids, renames
  inside NESTED structs, and renamed nested types raise naming the
  file/field instead of silently nulling;
- **non-parquet data files** (ORC/Avro data), unsupported column
  types (uuid/time), and format versions > 2 raise with the feature
  named.

Scale: the metadata JSON and the manifest LIST are small bounded
driver reads (Iceberg's own planning design — one row per manifest);
the per-manifest entry decode, which is the part that grows with the
table (thousands of manifests × thousands of entries at 100 TB), is
DISTRIBUTED via ``binaryFile`` + ``mapInPandas`` (see
``_data_files``) — only the net live-file list reaches the driver,
the same lower bound any planner must materialize to build splits.
The data read is a plain pruned parquet scan, so predicate pushdown
and column pruning work unchanged. Writing stays with the in-house
versioned layer — this is the migration READ path, the deltaread
shape.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_pipeline_example_spark.fsutil import hadoop_fs
from etl_pipeline_example_spark.pipeline.avroread import read_avro_ocf

_META_RE = re.compile(r"^(?:v(\d+)|(\d+)-[0-9a-fA-F-]+)\.metadata\.json$")
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")
_FIXED_RE = re.compile(r"^fixed\[(\d+)\]$")


def _jpath(spark: SparkSession, p: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)


def _read_bytes(spark: SparkSession, p: str) -> bytes:
    fs, _ = hadoop_fs(spark, p)
    stream = fs.open(_jpath(spark, p))
    try:
        return bytes(stream.readAllBytes())
    finally:
        stream.close()


def _latest_metadata(spark: SparkSession, path: str) -> str:
    fs, _ = hadoop_fs(spark, path)
    mdir = _jpath(spark, f"{path}/metadata")
    if not fs.exists(mdir):
        raise FileNotFoundError(
            f"no metadata/ under {path}: not an Iceberg table"
        )
    best: tuple[int, str] | None = None
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        m = _META_RE.match(name)
        if m:
            v = int(m.group(1) or m.group(2))
            if best is None or v > best[0]:
                best = (v, name)
    if best is None:
        raise FileNotFoundError(
            f"no *.metadata.json under {path}/metadata: not an Iceberg table"
        )
    return f"{path}/metadata/{best[1]}"


def _spark_type(t) -> T.DataType:
    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        _spark_type(f["type"]),
                        not f.get("required", False),
                    )
                    for f in t["fields"]
                ]
            )
        if k == "list":
            return T.ArrayType(
                _spark_type(t["element"]),
                not t.get("element-required", False),
            )
        if k == "map":
            return T.MapType(
                _spark_type(t["key"]),
                _spark_type(t["value"]),
                not t.get("value-required", False),
            )
        raise ValueError(f"unsupported Iceberg nested type {k!r}")
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "string": T.StringType(),
        "binary": T.BinaryType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
    }
    if t in prim:
        return prim[t]
    m = _DECIMAL_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _FIXED_RE.match(t)
    if m:
        return T.BinaryType()
    # uuid (fixed-16 in parquet, not name-readable), time, and any
    # future primitive: refuse rather than misread
    raise ValueError(f"unsupported Iceberg type {t!r}")


def _schemas(meta: dict) -> tuple[dict, list[dict]]:
    """(current schema, all schemas) from v1 or v2 metadata."""
    if "schemas" in meta:
        cur_id = meta.get("current-schema-id")
        all_s = meta["schemas"]
        cur = next(
            (s for s in all_s if s.get("schema-id") == cur_id),
            all_s[-1] if all_s else None,
        )
    else:
        cur = meta.get("schema")
        all_s = [cur] if cur else []
    if not cur:
        raise ValueError("Iceberg metadata carries no schema")
    return cur, all_s


def _check_renames(all_schemas: list[dict]) -> bool:
    """Field-id -> name stability across the schema history. Stable:
    return False (the fast name-based parquet scan is safe). TOP-LEVEL
    renames: return True — the read must resolve columns by the
    PARQUET FIELD IDS embedded in each data file (the actual Iceberg
    contract; ``_read_by_field_id``). Renames inside NESTED structs
    still raise (id-resolution through nested re-shaping needs an
    Iceberg runtime)."""
    top: dict[int, set[str]] = {}
    nested: dict[int, set[str]] = {}

    def walk(fields, sink):
        for f in fields:
            sink.setdefault(f["id"], set()).add(f["name"])
            t = f["type"]
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"], nested)

    for s in all_schemas:
        walk(s.get("fields", []), top)
    bad_nested = {i: sorted(n) for i, n in nested.items() if len(n) > 1}
    if bad_nested:
        fid, nm = next(iter(bad_nested.items()))
        raise ValueError(
            "Iceberg table renames a NESTED field (field id"
            f" {fid}: {nm}); id-resolution through nested types needs"
            " an Iceberg runtime"
        )
    return any(len(n) > 1 for n in top.values())


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        if cur in (None, -1):
            return {}
        snapshot_id = cur
    for s in snaps:
        if s.get("snapshot-id") == snapshot_id:
            return s
    raise ValueError(
        f"snapshot {snapshot_id} not in the Iceberg metadata"
    )


def _data_files(
    spark: SparkSession, snap: dict
) -> list[str]:
    """Live data-file paths of a snapshot — manifest list -> manifests,
    loudly rejecting row-level-delete content.

    Scale: the manifest LIST is one small Avro file (one row per
    manifest — Iceberg's own bounded planning artifact) and stays a
    driver read; the manifests themselves can number thousands at
    100 TB, so their decode is DISTRIBUTED — ``binaryFile`` ships each
    manifest Avro to an executor and an Arrow-batched ``mapInPandas``
    runs the stdlib OCF decoder where the file lands, emitting only
    flat (file_path, content, file_format) rows for non-deleted
    entries. Only that net live-entry list (the planner's inherent
    lower bound) reaches the driver, where the content/format checks
    keep raising plain ``ValueError``."""
    if not snap:
        return []
    if snap.get("manifest-list"):
        _schema, entries = read_avro_ocf(
            _read_bytes(spark, snap["manifest-list"])
        )
        manifests = []
        for e in entries:
            if int(e.get("content") or 0) != 0:
                raise ValueError(
                    "Iceberg snapshot carries a DELETE manifest"
                    f" ({e.get('manifest_path')}); row-level deletes"
                    " need an Iceberg runtime"
                )
            manifests.append(e["manifest_path"])
    else:
        manifests = list(snap.get("manifests") or [])
    if not manifests:
        return []
    import pandas as pd

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _s, entries = read_avro_ocf(bytes(content))
                rows = []
                for e in entries:
                    if int(e.get("status") or 0) == 2:  # DELETED
                        continue
                    df = e["data_file"]
                    rows.append(
                        (
                            df.get("file_path"),
                            int(df.get("content") or 0),
                            df.get("file_format"),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["file_path", "content", "file_format"]
                )

    live = (
        spark.read.format("binaryFile")
        .load(manifests)
        .select("content")
        .mapInPandas(
            _decode, "file_path string, content int, file_format string"
        )
        .collect()
    )
    files: list[str] = []
    for r in live:
        if r["content"] != 0:
            raise ValueError(
                f"Iceberg delete file {r['file_path']};"
                " row-level deletes need an Iceberg runtime"
            )
        fmt = (r["file_format"] or "").upper()
        if fmt != "PARQUET":
            raise ValueError(
                f"unsupported Iceberg data file format {fmt!r}"
                f" ({r['file_path']})"
            )
        files.append(r["file_path"])
    return files


def _read_by_field_id(
    spark: SparkSession, files: list[str], cur_fields: list[dict],
    schema: T.StructType,
) -> DataFrame:
    """Renamed-column path: resolve every column by the PARQUET FIELD
    ID embedded in each data file (Iceberg's normative resolution),
    distributed via ``binaryFile`` + ``mapInPandas``. A file without
    embedded field ids raises NAMING THE FILE — the rename cannot be
    resolved safely by name; a field id absent from a file (column
    added later) reads as null per the spec."""
    wanted = [(f["name"], int(f["id"])) for f in cur_fields]
    for f in cur_fields:
        if isinstance(f["type"], dict):
            raise ValueError(
                "renamed-column resolution supports primitive columns;"
                f" nested field {f['name']!r} needs an Iceberg runtime"
            )

    def _resolve(batches):
        import io

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                tbl = pq.read_table(io.BytesIO(bytes(content)))
                by_id = {}
                for i, fld in enumerate(tbl.schema):
                    md = fld.metadata or {}
                    fid = md.get(b"PARQUET:field_id")
                    if fid is not None:
                        by_id[int(fid)] = i
                if not by_id:
                    raise ValueError(
                        f"{p}: data file embeds no parquet field ids —"
                        " renamed columns cannot be resolved safely"
                    )
                cols = {}
                for name, fid in wanted:
                    if fid in by_id:
                        cols[name] = tbl.column(by_id[fid]).to_pandas()
                    else:
                        cols[name] = pd.Series(
                            [None] * tbl.num_rows, dtype="object"
                        )
                yield pd.DataFrame(cols)

    return (
        spark.read.format("binaryFile")
        .load(files)
        .select("path", "content")
        .mapInPandas(_resolve, schema=schema)
        .select(*schema.fieldNames())
    )


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg v1/v2 table by replaying its metadata — current
    snapshot, or ``snapshot_id`` for time travel. Data files scan as
    plain parquet under the translated schema (they physically contain
    partition columns); tables whose schema history RENAMED top-level
    columns resolve by embedded parquet field id instead (since r17);
    unsupported features raise by name."""
    meta = json.loads(_read_bytes(spark, _latest_metadata(spark, path)))
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise ValueError(f"unsupported Iceberg format-version {fv}")
    cur, all_s = _schemas(meta)
    renamed = _check_renames(all_s)
    schema = _spark_type(
        {"type": "struct", "fields": cur["fields"]}
    )
    files = _data_files(spark, _snapshot(meta, snapshot_id))
    if not files:
        return spark.createDataFrame([], schema)
    if renamed:
        return _read_by_field_id(spark, files, cur["fields"], schema)
    return spark.read.schema(schema).parquet(*files).select(
        *schema.fieldNames()
    )


def iceberg_snapshots(spark: SparkSession, path: str) -> list[dict]:
    """(snapshot-id, timestamp-ms) history — time-travel candidates."""
    meta = json.loads(_read_bytes(spark, _latest_metadata(spark, path)))
    return [
        {
            "snapshot_id": s.get("snapshot-id"),
            "timestamp_ms": s.get("timestamp-ms"),
        }
        for s in meta.get("snapshots") or []
    ]
