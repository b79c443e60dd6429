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


def test_salted_join_matches_plain_join(spark):
    from etl_pipeline_example_spark.functions.skew import salted_join
    from pyspark.sql import functions as F

    # skewed big side: 90% of rows share key 0
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", num_salts=4).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    left_plain = big.join(small.filter("k < 50"), "k", "left").select("k", "payload", "name")
    left_salted = salted_join(big, small.filter("k < 50"), "k", num_salts=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, left_salted.collect()), key=str) == sorted(
        map(tuple, left_plain.collect()), key=str
    )
