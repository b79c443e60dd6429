from etl_pipeline_example_spark.metadata.spec import (
    DatabaseSpec,
    TableSpec,
    spark_schema_for,
)
from etl_pipeline_example_spark.metadata.align import align_df_to_meta

__all__ = ["TableSpec", "DatabaseSpec", "spark_schema_for", "align_df_to_meta"]
