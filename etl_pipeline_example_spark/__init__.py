"""PySpark-native ETL/analytics engine.

A from-scratch re-expression of the capabilities of
moj-analytical-services/etl-pipeline-example (reference layout:
``glue_jobs/example_job/job.py``, ``python_scripts/*.py``,
``meta_data/*.json``) as an idiomatic PySpark library, extended with
the operators a large-scale LLM-training-data pipeline needs
(dedup, similarity search, multimodal columns, text analysis).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning and join planning; no operator calls ``.collect()``.
"""

from etl_pipeline_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
