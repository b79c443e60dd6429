"""Materialize token-budgeted training shards to disk.

The writer half of ``shard_by_tokens`` (operators/shard.py): join the
shard assignment back to the documents and lay the corpus out as
``shard_id=N/`` partitions of gzipped JSONL — the layout a training
dataloader consumes (one worker per shard directory, ~equal token
budgets, docs never split). Side-effecting, so pytest-verified like
write_bucketed/zorder_write rather than driver-graded.

Scale shape: the assignment join is doc_id-keyed; the write is a
single ``partitionBy('shard_id')`` pass — dynamic partition writers,
no extra shuffle beyond the assignment's own, and each shard lands as
its own directory so downstream consumers read exactly the shards
they own. Reference parity note: the jsonl.gz format matches the
reference's land-zone format (custom_functions.py write jsonl.gz).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_pipeline_example_spark.operators.shard import shard_by_tokens
from etl_pipeline_example_spark.sources.readers import read_table


def write_training_shards(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Write documents as shard_id=N/*.json.gz; returns shard count."""
    assign = shard_by_tokens(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    out = docs.join(assign, "doc_id").select(
        "doc_id", "text", "source", "n_tokens", "shard_id"
    )
    (
        out.write.mode("overwrite")
        .partitionBy("shard_id")
        .option("compression", "gzip")
        .json(out_dir)
    )
    return out.select("shard_id").distinct().count()
