from etl_pipeline_example_spark.functions.transforms import (
    calculated_counts,
    flatten_structs,
    version_stamp,
)

__all__ = ["flatten_structs", "version_stamp", "calculated_counts"]
