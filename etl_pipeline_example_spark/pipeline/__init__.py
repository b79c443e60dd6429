from etl_pipeline_example_spark.pipeline.validate import ValidationError, validate_landed
from etl_pipeline_example_spark.pipeline.zones import ZoneStore, promote_to_raw_distributed
from etl_pipeline_example_spark.pipeline.dag import Pipeline
from etl_pipeline_example_spark.pipeline.catalog import deploy_database
from etl_pipeline_example_spark.pipeline.extract import extract_to_land, unpack_record
from etl_pipeline_example_spark.pipeline.deltaread import delta_versions, read_delta
from etl_pipeline_example_spark.pipeline.deltaexport import export_delta

__all__ = [
    "validate_landed",
    "ValidationError",
    "ZoneStore",
    "promote_to_raw_distributed",
    "Pipeline",
    "deploy_database",
    "extract_to_land",
    "unpack_record",
    "read_delta",
    "delta_versions",
    "export_delta",
]
