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


def test_t_closeness_matches_duckdb(spark, sf_dir):
    """TVD distances per QI group == a DuckDB replica over the same
    completed (group x domain) grid."""
    import duckdb

    from etl_hero_spark.privacy import t_closeness_distances

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = orders.join(
        F.broadcast(
            cust.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            )
        ),
        "o_custkey",
    )
    got = sorted(
        (r["c_mktsegment"], r["group_size"], r["distance"])
        for r in t_closeness_distances(
            joined, ["c_mktsegment"], "o_orderpriority"
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH j AS (
              SELECT c_mktsegment AS g, o_orderpriority AS sv
              FROM '{sf_dir}/orders.parquet'
              JOIN '{sf_dir}/customer.parquet' ON o_custkey = c_custkey
            ), per AS (
              SELECT g, sv, count(*) AS n FROM j GROUP BY 1, 2
            ), dom AS (SELECT sv, sum(n) AS gn FROM per GROUP BY 1),
            tot AS (SELECT sum(gn) AS totn FROM dom),
            sz AS (SELECT g, sum(n) AS size FROM per GROUP BY 1),
            grid AS (SELECT g, size, sv, gn, totn FROM sz, dom, tot),
            d AS (
              SELECT g, size,
                coalesce(per.n, 0) / CAST(size AS DOUBLE)
                  - gn / CAST(totn AS DOUBLE) AS diff
              FROM grid LEFT JOIN per USING (g, sv)
            )
            SELECT g, CAST(size AS BIGINT),
                   round(0.5 * sum(abs(diff)), 6)
            FROM d GROUP BY g, size
            """
        ).fetchall()
    )
    assert got == want and len(got) == 5


def test_t_closeness_flags_planted_skewed_group(spark):
    """A group whose sensitive mix collapses to one value must show a
    large distance and trip the report; a group mirroring the global
    mix must not."""
    from etl_hero_spark.privacy import t_closeness_report

    rows = (
        [("skewed", "A")] * 50
        + [("balanced", "A")] * 25
        + [("balanced", "B")] * 25
    )
    df = spark.createDataFrame(rows, "g string, sv string")
    got = t_closeness_report(df, ["g"], "sv", t=0.2).first()
    # global: A=75%, B=25%. skewed: A=100% -> TVD=0.25; balanced:
    # 50/50 -> TVD=0.25... both actually trip at t=0.2; tighten the
    # planted case instead with a dominant global mix
    rows2 = (
        [("skewed", "A")] * 40
        + [("mirror", "A")] * 48 + [("mirror", "B")] * 12
        + [("tiny", "A")] * 8 + [("tiny", "B")] * 2
    )
    df2 = spark.createDataFrame(rows2, "g string, sv string")
    rep = t_closeness_report(df2, ["g"], "sv", t=0.15).first()
    # global: A=96/110, B=14/110. mirror and tiny are both 80/20
    # (TVD ~ 0.0727); skewed is 100/0 (TVD ~ 0.1273 < 0.15)... compute:
    # |1-0.8727|*0.5+|0-0.1273|*0.5 = 0.1273 -> below 0.15, none trip
    assert rep["n_groups"] == 3
    assert rep["n_groups_above_t"] == 0
    strict = t_closeness_report(df2, ["g"], "sv", t=0.1).first()
    assert strict["n_groups_above_t"] == 1  # only the skewed group
    assert strict["n_rows_at_risk"] == 40
    assert got["n_groups"] == 2


def test_t_closeness_ordered_emd(spark):
    """Ordinal EMD: a group shifted one step along an ordered domain
    is closer than a group at the far end — TVD can't tell them
    apart, the ordered metric must."""
    from etl_hero_spark.privacy import t_closeness_distances

    # global spread across 3 ordered values; one group sits at '1',
    # another at '3' — identical TVD, different EMD? No: both are
    # point masses vs the same global -> symmetric. Use asymmetric
    # global: heavy at '1'.
    rows = (
        [("at1", "1")] * 30
        + [("at3", "3")] * 10
        + [("spread", "1")] * 20 + [("spread", "2")] * 20
    )
    df = spark.createDataFrame(rows, "g string, sv string")
    d = {
        r["g"]: r["distance"]
        for r in t_closeness_distances(
            df, ["g"], "sv", ordered=True
        ).collect()
    }
    # global: 1->50/80, 2->20/80, 3->10/80
    # at1: p=(1,0,0): cums of diff = (0.375, 0.125, 0) -> sum/2=0.25
    # at3: p=(0,0,1): cums = (-0.625, -0.875, 0) -> 1.5/2 = 0.75
    assert d["at1"] == pytest.approx(0.25, abs=1e-6)
    assert d["at3"] == pytest.approx(0.75, abs=1e-6)
    assert d["at3"] > d["at1"]


def test_kmv_set_overlap_near_exact(spark, sf_dir):
    """Theta-sketch estimates vs the exact counts on the same key
    sets — the direct-intersection sibling of the HLL test above."""
    from etl_hero_spark.profile import kmv_set_overlap

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    got = kmv_set_overlap(a, b, "o_custkey", k=512).first()
    ea = a.select("o_custkey").distinct().count()
    eb = b.select("o_custkey").distinct().count()
    eu = (
        a.select("o_custkey").union(b.select("o_custkey")).distinct().count()
    )
    ei = ea + eb - eu
    # KMV rel error ~ 1/sqrt(k) ~ 4.4% at k=512; allow 3 sigma
    assert got["n_a_est"] == pytest.approx(ea, rel=0.15)
    assert got["n_b_est"] == pytest.approx(eb, rel=0.15)
    assert got["n_union_est"] == pytest.approx(eu, rel=0.15)
    assert got["n_intersect_est"] == pytest.approx(
        ei, abs=max(20, 0.2 * ei)
    )
    assert 0.0 <= got["jaccard_est"] <= 1.0
    assert got["jaccard_est"] == pytest.approx(ei / eu, abs=0.1)


def test_kmv_unsaturated_sketches_are_exact(spark):
    """Sets smaller than k: theta stays 1.0 and every estimate is the
    EXACT distinct count — the sketch degrades to truth, not noise."""
    from etl_hero_spark.profile import kmv_set_overlap

    a = spark.range(0, 300).select(F.col("id").alias("k"))
    b = spark.range(200, 500).select(F.col("id").alias("k"))
    got = kmv_set_overlap(a, b, "k", k=1024).first()
    assert got["theta"] == 1.0
    assert (got["n_a_est"], got["n_b_est"]) == (300.0, 300.0)
    assert got["n_intersect_est"] == 100.0
    assert got["n_union_est"] == 500.0
    assert got["jaccard_est"] == pytest.approx(0.2, abs=1e-9)


def test_kmv_disjoint_intersection_is_zero(spark):
    from etl_hero_spark.profile import kmv_set_overlap

    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(100000, 105000).select(F.col("id").alias("k"))
    got = kmv_set_overlap(a, b, "k", k=256).first()
    assert got["n_intersect_est"] == 0.0
    assert got["jaccard_est"] == 0.0
