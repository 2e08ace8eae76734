"""Detection operator tests (P2-P5) — edge cases from FIXTURES.md §C."""

import pyspark.sql.functions as F

from etl_hero_spark import detect


def test_zscore_zero_variance_no_outliers(spark):
    """sigma == 0 -> the column is undetectable: absent from the result
    (matches the oracle's WHERE sigma <> 0 and the reference's no-mission
    outcome for constant columns, app.py:68-69,240)."""
    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    assert detect.detect_outliers(df, ["x"]).count() == 0


def test_zscore_nulls_never_outliers(spark):
    rows = [(float(i),) for i in range(20)] + [(None,), (1000.0,)]
    df = spark.createDataFrame(rows, "x double")
    flagged = detect.with_outlier_flags(df, ["x"])
    nulls = flagged.filter(F.col("x").isNull()).collect()
    assert all(not r["is_outlier_x"] for r in nulls)
    assert flagged.filter(F.col("is_outlier_x")).count() == 1


def test_zscore_detects_injected_outlier(spark):
    rows = [(50.0 + (i % 7),) for i in range(100)] + [(5000.0,)]
    df = spark.createDataFrame(rows, "x double")
    out = detect.detect_outliers(df, ["x"]).first()
    assert out["n_outliers"] == 1


def test_detect_missing_filters_clean_columns(spark):
    df = spark.createDataFrame([(1, None), (2, "a")], "k long, v string")
    rows = detect.detect_missing(df).collect()
    assert len(rows) == 1
    assert rows[0]["column"] == "v" and rows[0]["n_null"] == 1


def test_date_likeness_mixed(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("05/01/2024",), ("garbage",), (None,)], "d string"
    )
    row = detect.date_likeness(df, ["d"]).first()
    assert row["n_total"] == 3  # nulls excluded, matching count(col)
    assert row["n_parsed"] == 2
    assert row["is_date_like"]  # 2/3 > 0.6
    assert row["is_mixed"]


def test_date_likeness_non_date_column(spark):
    df = spark.createDataFrame([("abc",), ("def",)], "d string")
    row = detect.date_likeness(df, ["d"]).first()
    assert not row["is_date_like"] and not row["is_mixed"]


def test_detect_missions_clean_table_empty(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "2024-01-01"), (2, 11.0, "2024-01-02")],
        "k long, v double, d string",
    )
    missions = detect.detect_missions(df).collect()
    assert missions == []


def test_detect_missions_messy_orders(spark):
    from etl_hero_spark.io import messy_orders

    df = messy_orders(spark)
    rows = {(r["mission"], r["column"]): r["metric"] for r in detect.detect_missions(df).collect()}
    # FIXTURES.md §B expectations: price outlier mission, category nulls,
    # 2 duplicate rows, 1 unparseable date
    assert ("outliers", "price") in rows
    assert ("missing", "category") in rows
    assert rows[("duplicates", "*")] == 2
    assert rows[("date_mixed", "date")] == 1
