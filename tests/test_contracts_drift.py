"""Schema-drift detection: every drift kind detected, no false alarms
on identical snapshots."""

from pyspark.sql import functions as F

from etl_hero_spark.contracts import schema_drift


def test_schema_drift_detects_every_kind(spark, sf_dir):
    old = spark.read.parquet(f"{sf_dir}/orders.parquet")
    new = (
        old.drop("o_orderpriority")
        .withColumn("o_totalprice", F.col("o_totalprice").cast("float"))
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn("loaded_at", F.lit("2026-08-15"))
    )
    rows = {
        (r["kind"], r["column"]): (r["old"], r["new"])
        for r in schema_drift(old, new).collect()
    }
    assert rows[("column_added", "loaded_at")] == (None, "string")
    assert rows[("column_removed", "o_orderpriority")] == ("string", None)
    assert rows[("type_changed", "o_totalprice")] == ("double", "float")
    o, n = rows[("null_rate_drift", "o_orderstatus")]
    assert o == "0.0000" and abs(float(n) - 1 / 3) < 0.01
    assert rows[("row_count", None)][0] == rows[("row_count", None)][1]


def test_schema_drift_identical_snapshots_report_only_row_count(
    spark, sf_dir
):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = schema_drift(df, df).collect()
    assert [r["kind"] for r in rows] == ["row_count"]
    assert rows[0]["old"] == rows[0]["new"]


def test_schema_drift_null_tolerance_gate(spark):
    a = spark.createDataFrame([("x",), ("y",), (None,)], "c string")
    b = spark.createDataFrame([("x",), (None,), (None,)], "c string")
    # delta = 1/3; default tol 0.05 flags it, tol 0.5 doesn't
    kinds = [r["kind"] for r in schema_drift(a, b).collect()]
    assert "null_rate_drift" in kinds
    kinds2 = [
        r["kind"] for r in schema_drift(a, b, null_rate_tol=0.5).collect()
    ]
    assert "null_rate_drift" not in kinds2
