from etl_pipeline_example_spark.plans.queries import ANALYTIC_QUERIES, ANALYTIC_ORACLES

__all__ = ["ANALYTIC_QUERIES", "ANALYTIC_ORACLES"]
