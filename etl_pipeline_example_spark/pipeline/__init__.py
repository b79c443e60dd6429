from etl_pipeline_example_spark.pipeline.validate import ValidationError, validate_landed
from etl_pipeline_example_spark.pipeline.zones import ZoneStore
from etl_pipeline_example_spark.pipeline.dag import Pipeline
from etl_pipeline_example_spark.pipeline.catalog import deploy_database

__all__ = ["validate_landed", "ValidationError", "ZoneStore", "Pipeline", "deploy_database"]
