from etl_pipeline_example_spark.sinks.writers import write_curated, write_jsonl_gz

__all__ = ["write_curated", "write_jsonl_gz"]
