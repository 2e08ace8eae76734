"""k-anonymity / l-diversity / generalization / HLL set overlap pinned
against DuckDB and planted fixtures."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.privacy import (
    generalize,
    k_anonymity_groups,
    k_anonymity_report,
    l_diversity_report,
)
from etl_hero_spark.profile import approx_set_overlap


def test_k_anonymity_report_matches_duckdb(spark, sf_dir):
    got = k_anonymity_report(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        ["c_mktsegment", "c_nationkey"],
        k=5,
    ).collect()[0]
    want = duckdb.sql(
        f"""
        WITH g AS (
          SELECT c_mktsegment, c_nationkey, count(*) AS gs
          FROM read_parquet('{sf_dir}/customer.parquet')
          GROUP BY 1, 2
        )
        SELECT sum(gs) AS n_rows, count(*) AS n_groups,
               min(gs) AS k_achieved,
               sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS below,
               sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS at_risk
        FROM g
        """
    ).fetchone()
    assert (
        got["n_rows"], got["n_groups"], got["k_achieved"],
        got["n_groups_below_k"], got["n_rows_at_risk"],
    ) == want
    assert got["pct_rows_at_risk"] == pytest.approx(
        want[4] * 100.0 / want[0], abs=1e-3
    )


def test_nulls_group_as_their_own_level(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), (None, 1), (None, 1)], "q string, x int"
    )
    rows = k_anonymity_groups(df, ["q"]).collect()
    got = sorted(
        ((r["q"], r["group_size"]) for r in rows),
        key=lambda p: (p[0] is not None, p[0] or ""),
    )
    assert got == [(None, 2), ("a", 2)]


def test_generalization_monotonically_raises_k(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_mktsegment", "c_nationkey", "c_acctbal"
    )
    qi = ["c_mktsegment", "c_nationkey", "c_acctbal"]
    raw = k_anonymity_report(cust, qi).collect()[0]
    g1 = k_anonymity_report(
        generalize(cust, {"c_acctbal": ("bin", 1000)}), qi
    ).collect()[0]
    g2 = k_anonymity_report(
        generalize(cust, {"c_acctbal": ("suppress",)}), qi
    ).collect()[0]
    assert raw["k_achieved"] == 1  # exact balances are unique-ish
    assert g1["k_achieved"] >= raw["k_achieved"]
    assert g2["k_achieved"] >= g1["k_achieved"]
    assert g2["n_groups"] <= g1["n_groups"] <= raw["n_groups"]


def test_generalize_rungs(spark):
    df = spark.createDataFrame(
        [(1234.5, "Customer#42", "2024-03-07", None)],
        "bal double, name string, d string, miss string",
    ).withColumn("d", F.to_date("d"))
    out = generalize(
        df,
        {
            "bal": ("bin", 1000),
            "name": ("prefix", 8),
            "d": ("year",),
            "miss": ("suppress",),
        },
    ).collect()[0]
    assert out["bal"] == "[1000,2000)"
    assert out["name"] == "Customer*"
    assert out["d"] == "2024"
    assert out["miss"] is None  # NULL stays NULL through every rung
    with pytest.raises(ValueError, match="unknown generalization"):
        generalize(df, {"bal": ("nope",)})


def test_generalize_negative_bin_left_closed(spark):
    df = spark.createDataFrame([(-1.0,), (-1000.0,), (0.0,)], "bal double")
    got = sorted(
        r["bal"] for r in generalize(df, {"bal": ("bin", 1000)}).collect()
    )
    assert got == ["[-1000,0)", "[-1000,0)", "[0,1000)"]


def test_l_diversity_matches_duckdb(spark, sf_dir):
    joined = spark.read.parquet(f"{sf_dir}/orders.parquet").join(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment",
            "c_nationkey",
        ),
        "o_custkey",
    )
    got = l_diversity_report(
        joined, ["c_mktsegment", "c_nationkey"], "o_orderpriority", l_req=3
    ).collect()[0]
    want = duckdb.sql(
        f"""
        WITH j AS (
          SELECT c_mktsegment, c_nationkey, o_orderpriority
          FROM read_parquet('{sf_dir}/orders.parquet') o
          JOIN read_parquet('{sf_dir}/customer.parquet') c
            ON o.o_custkey = c.c_custkey
        ), g AS (
          SELECT c_mktsegment, c_nationkey,
                 count(DISTINCT o_orderpriority) AS l_d,
                 count(*) AS gs
          FROM j GROUP BY 1, 2
        )
        SELECT count(*), min(l_d),
               sum(CASE WHEN l_d < 3 THEN 1 ELSE 0 END),
               sum(CASE WHEN l_d < 3 THEN gs ELSE 0 END)
        FROM g
        """
    ).fetchone()
    assert (
        got["n_groups"], got["l_achieved"],
        got["n_groups_below_l"], got["n_rows_at_risk"],
    ) == want


def test_l_diversity_flags_planted_homogeneous_group(spark):
    # group ('z', 9) is size 50 (high k!) but every sensitive value is
    # identical -> the homogeneity leak k-anonymity alone cannot see
    rows = [("z", 9, "SECRET")] * 50 + [
        ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z")
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    got = l_diversity_report(df, ["q1", "q2"], "s", l_req=2).collect()[0]
    assert got["l_achieved"] == 1
    assert got["n_groups_below_l"] == 1
    assert got["n_rows_at_risk"] == 50


def test_approx_set_overlap_near_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    got = approx_set_overlap(a, b, "o_custkey", rsd=0.02).collect()[0]
    ea = a.select("o_custkey").distinct().count()
    eb = b.select("o_custkey").distinct().count()
    eu = (
        a.select("o_custkey").union(b.select("o_custkey")).distinct().count()
    )
    ei = ea + eb - eu
    # inclusion-exclusion compounds three 2% sketches; 10% slack on the
    # big numbers, absolute slack on the (smaller) intersection
    assert got["n_a"] == pytest.approx(ea, rel=0.1)
    assert got["n_b"] == pytest.approx(eb, rel=0.1)
    assert got["n_union"] == pytest.approx(eu, rel=0.1)
    assert got["n_intersect"] == pytest.approx(ei, abs=max(20, 0.2 * eu))
    assert 0.0 <= got["jaccard"] <= 1.0


def test_approx_set_overlap_disjoint_clamps_at_zero(spark):
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(10_000, 10_500).select(F.col("id").alias("k"))
    got = approx_set_overlap(a, b, "k").collect()[0]
    assert got["n_intersect"] >= 0
    assert got["jaccard"] <= 0.05
