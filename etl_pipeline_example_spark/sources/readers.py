"""Schema-first readers for the engine's supported formats.

The reference ingests gzipped JSONL from its land zone with a hand-rolled
boto3 reader (reference: python_scripts/custom_functions.py:31-49
``read_jsonl_from_s3``) and reads raw history with
``spark.read.json`` (reference: glue_jobs/example_job/job.py:40). Here both
collapse into Spark's native distributed readers — Spark's json source
handles ``.gz`` transparently and scales out the decompression; there is no
driver-side byte shuffling.

All readers accept an optional ``TableSpec`` so the scan is schema-first:
with an explicit schema Spark skips the inference pass entirely and the
parquet reader prunes to exactly the requested columns (``ReadSchema`` in
the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.spec import TableSpec, spark_schema_for

_FORMAT_ALIASES = {
    "jsonl": "json",
    "json": "json",
    "parquet": "parquet",
    "orc": "orc",
    "csv": "csv",
}


def resolve_format(data_format: str) -> str:
    """Map a spec ``data_format`` to the Spark source name, or raise.

    Shared by readers AND writers so a typo'd format fails loudly at
    write time instead of silently writing parquet and mis-reading later.
    """
    fmt = _FORMAT_ALIASES.get(data_format.lower())
    if fmt is None:
        raise ValueError(f"unsupported data_format: {data_format!r}")
    return fmt


def read_jsonl(
    spark: SparkSession,
    path: str,
    spec: TableSpec | None = None,
) -> DataFrame:
    """Read JSONL (optionally gzipped — by extension) as a DataFrame."""
    reader = spark.read
    if spec is not None:
        reader = reader.schema(spark_schema_for(spec))
    return reader.json(path)


def read_with_meta(spark: SparkSession, path: str, spec: TableSpec) -> DataFrame:
    """Read ``path`` in the spec's declared ``data_format`` with its schema."""
    fmt = resolve_format(spec.data_format)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt not in ("parquet", "orc"):
        # Parquet/ORC carry their own schema; partition columns in the path
        # would conflict with an explicit schema that omits them.
        reader = reader.schema(spark_schema_for(spec, exclude=spec.partitions))
    return reader.load(path)


# Tables whose parquet stores TIMESTAMP(NANOS): surfaced as nanos-longs
# (spark.sql.legacy.parquet.nanosAsLong) and converted to micros timestamps
# here — same truncation DuckDB applies when reading nanos into micros.
_NANO_TS_COLUMNS = {"events": ["ts"]}


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make nanos-timestamp parquet readable on ANY session.

    ``spark.sql.legacy.parquet.nanosAsLong`` is runtime-settable; without
    it a vanilla session raises ``PARQUET_TYPE_ILLEGAL`` on
    INT64(TIMESTAMP(NANOS)). The engine must not depend on its own session
    factory having run — a caller may hand us any SparkSession — so every
    reader that can touch a nanos table sets it idempotently here. The
    session timezone is pinned to UTC alongside it: the nanos-long →
    timestamp conversion must render the same instant on any host, and the
    DuckDB oracle treats these as naive UTC timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


_EVENTS_TAIL = "user_id bigint, event_type string, value double, props string"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open the events table as a file-source STREAM with ``ts`` normalized
    to TIMESTAMP (LTZ, session pinned UTC) — the streaming twin of
    ``read_table``.

    ``readStream`` requires a declared schema, and the testdata's physical
    ``ts`` encoding has two observed generations: TIMESTAMP(NANOS)
    (surfaced as a nanos-long under ``nanosAsLong``) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false). A hardcoded ``ts long`` schema silently reads
    raw micros as if they were nanos — every timestamp lands 1000× too
    early and windows/sessions collapse — so the batch reader's footer
    schema (cheap: footer only) decides which declaration to stream with.
    """
    ensure_nanos_conf(spark)
    ts_type = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) generation
        df = (
            spark.readStream.schema(f"event_id bigint, ts long, {_EVENTS_TAIL}")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    else:
        df = (
            spark.readStream.schema(f"event_id bigint, ts {ts_type}, {_EVENTS_TAIL}")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
    return df


def read_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Read one testdata table: ``<sf_dir>/<name>.parquet``.

    ``parallel=True`` repartitions the scan to the session's default
    parallelism. Use it in front of CPU-heavy per-row stages (tokenize,
    hash, cosine): a small input (here: one sub-row-group parquet file →
    ONE scan partition) otherwise serializes the whole expensive stage on
    a single core. The shuffle moves only the small raw input; at scale
    the same guard applies whenever scan parallelism < cluster
    parallelism (few huge gzip files, a coalesced upstream write, ...).
    """
    # unconditional: timestamp rendering must not depend on WHICH tables a
    # session read first (a nanos-only pin would make orders-table
    # timestamps flip between host-local and UTC based on query order)
    ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) infers as TIMESTAMP_NTZ on a
    # default Spark 4 session; normalize to TIMESTAMP (LTZ) so downstream
    # epoch casts / arithmetic behave identically on any session. The
    # session timezone is pinned UTC above, so the NTZ->LTZ cast preserves
    # the rendered instant and matches DuckDB's naive reading bit-for-bit.
    for col, typ in df.dtypes:
        if typ == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if parallel:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df
