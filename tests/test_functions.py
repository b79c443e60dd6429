"""Column transforms: flatten_structs, version_stamp, calculated_counts."""

from __future__ import annotations

from etl_pipeline_example_spark.functions import calculated_counts, flatten_structs, version_stamp


def test_flatten_structs_nested(spark):
    df = spark.createDataFrame(
        [(1, {"a": "x", "deep": {"z": 9}}, "keep")],
        "index int, codes struct<a:string, deep:struct<z:int>>, other string",
    )
    out = flatten_structs(df)
    assert out.columns == ["index", "codes_a", "codes_deep_z", "other"]
    row = out.collect()[0]
    assert (row["index"], row["codes_a"], row["codes_deep_z"], row["other"]) == (1, "x", 9, "keep")


def test_version_stamp(spark):
    df = spark.range(3)
    out = version_stamp(df, "v9")
    assert out.select("dea_version").distinct().collect()[0][0] == "v9"


def test_calculated_counts(spark):
    df = spark.createDataFrame(
        [("London",), ("LONDON",), ("wales",)], ["region"]
    )
    got = {r.region: r.n for r in calculated_counts(df, "region").collect()}
    assert got == {"london": 2, "wales": 1}
