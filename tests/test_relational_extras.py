"""Semi/anti-join SQL analytics and the pivot->unpivot round trip,
pinned against DuckDB running the textbook correlated-subquery forms
on the same parquet."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in (
        "orders", "lineitem", "customer", "supplier", "events",
        "nation", "region", "part",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def test_orders_with_returns_matches_duckdb(spark, qs):
    # registered entry is merged/tagged since r5 — the returns_exists
    # part carries the TPC-H Q4 shape
    rows = qs["sql_orders_with_returns"](spark, SF).collect()
    got = sorted(
        (r["key"], r["n"]) for r in rows if r["part"] == "returns_exists"
    )
    ref = _duck(
        SF,
        """
        SELECT o_orderpriority, count(*)::BIGINT
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    )
    assert got == ref


def test_dormant_rich_customers_matches_duckdb(spark, qs):
    # absorbed into sql_orders_with_returns in r5; the standalone
    # helper keeps its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_dormant_rich_customers

    got = [
        (r["c_mktsegment"], r["n_customers"], r["total_bal"])
        for r in q_sql_dormant_rich_customers(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        WITH seg AS (
          SELECT c_mktsegment AS seg,
                 sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
                 count(*) AS cnt
          FROM customer WHERE c_acctbal > 0 GROUP BY 1)
        SELECT c.c_mktsegment, count(*)::BIGINT,
               round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                     AS DOUBLE), 2)
        FROM customer c JOIN seg ON seg.seg = c.c_mktsegment
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * seg.cnt > seg.tot
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= '2000-01-01')
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
    )
    assert got == ref
    assert got, "fixture produced no dormant rich customers"


def test_top_revenue_suppliers_matches_duckdb(spark, qs):
    got = [
        (r["s_suppkey"], r["s_name"], r["total_rev"])
        for r in qs["sql_top_revenue_suppliers"](spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS r
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 2)
        FROM supplier JOIN rev ON l_suppkey = s_suppkey
        WHERE r = (SELECT max(r) FROM rev)
        ORDER BY s_suppkey
        """,
    )
    assert got == ref
    assert got, "no top supplier found"


def test_unpivot_round_trips_direct_groupby(spark, qs):
    """The part='long' branch of the merged pivot/unpivot query (the
    former events_unpivot_daily window entry) still equals the direct
    (day, type) aggregation."""
    from etl_hero_spark.registry import _events

    long = qs["events_pivot_daily_types"](spark, SF).filter(
        F.col("part") == "long"
    )
    got = sorted(
        (str(r["day"]), r["event_type"], r["n_events"])
        for r in long.collect()
    )
    direct = (
        _events(spark, SF)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day", "event_type")
        .collect()
    )
    assert got == [
        (str(r["day"]), r["event_type"], r["n"]) for r in direct
    ]


def test_market_share_matches_duckdb(spark, qs):
    # the Q8 body is an unregistered helper since the r8 trade-panel
    # merge; the standalone shape keeps its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_market_share_inner

    got = [
        (r["o_year"], r["focal_revenue"], r["region_revenue"], r["mkt_share"])
        for r in q_sql_market_share_inner(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        WITH j AS (
          SELECT year(o_orderdate) AS o_year, n.n_name,
                 CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,6))
                      - CAST(l_discount AS DECIMAL(18,6))) AS vol
          FROM orders o
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'AMERICA'
            AND o.o_orderdate >= '1995-01-01'
            AND o.o_orderdate < '1997-01-01'
        )
        SELECT o_year,
               round(CAST(sum(CASE WHEN n_name = 'NATION_1' THEN vol
                 ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE), 2),
               round(CAST(sum(vol) AS DOUBLE), 2),
               round(CAST(sum(CASE WHEN n_name = 'NATION_1' THEN vol
                 ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6)
        FROM j GROUP BY o_year ORDER BY o_year
        """,
    )
    assert got == ref
    assert got, "AMERICA region produced no revenue rows"


def test_disjunctive_promo_matches_duckdb(spark, qs):
    got = [
        (r["p_brand"], r["n_lines"], r["revenue"])
        for r in qs["sql_disjunctive_promo"](spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT p_brand, count(*)::BIGINT,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 50)
        GROUP BY p_brand ORDER BY p_brand
        """,
    )
    assert got == ref and got


def test_returned_item_ranking_matches_duckdb(spark, qs):
    # the Q10 body is an unregistered helper since the r8 lost-revenue
    # panel merge; the standalone shape keeps its own pin here
    from etl_hero_spark.registry_ext2 import (
        q_sql_returned_item_ranking_inner,
    )

    got = [
        (r["c_custkey"], r["c_mktsegment"], r["n_returned_lines"],
         r["lost_revenue"])
        for r in q_sql_returned_item_ranking_inner(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT c_custkey, c_mktsegment, count(*)::BIGINT,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
                 AS lost
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
        GROUP BY c_custkey, c_mktsegment
        ORDER BY lost DESC, c_custkey ASC LIMIT 20
        """,
    )
    assert got == ref and got


def test_volume_shipping_matches_duckdb(spark, qs):
    # absorbed into sql_market_share (part='volume_shipping') in r8;
    # the standalone helper keeps its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_volume_shipping

    got = [
        (r["supp_nation"], r["cust_nation"], r["l_year"], r["revenue"])
        for r in q_sql_volume_shipping(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,6))
                    - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
          AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
    )
    assert got == ref and got


def test_customer_distribution_matches_duckdb(spark, qs):
    # absorbed into sql_orders_with_returns (part='cust_distribution')
    # in r8; the standalone helper keeps its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_customer_distribution

    got = [
        (r["c_count"], r["custdist"])
        for r in q_sql_customer_distribution(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT c_count, count(*)::BIGINT AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
    )
    assert got == ref and got
    # the counts histogram must cover every customer exactly once
    n_cust = _duck(SF, "SELECT count(*) FROM customer")[0][0]
    assert sum(d for _, d in got) == n_cust
    assert len(got) > 1


def test_small_quantity_revenue_matches_duckdb(spark, qs):
    # absorbed into sql_returned_item_ranking
    # (part='small_qty_avg_yearly') in r8; the standalone helper keeps
    # its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_small_quantity_revenue

    got = q_sql_small_quantity_revenue(spark, SF).first()
    ref = _duck(
        SF,
        """
        WITH pp AS (
          SELECT l_partkey AS pk,
                 sum(CAST(l_quantity AS DECIMAL(28,6))) AS sq,
                 count(l_quantity) AS nq
          FROM lineitem GROUP BY 1
        )
        SELECT count(*)::BIGINT,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 2)
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN pp ON l_partkey = pk
        WHERE p_brand = 'Brand#13' AND p_size <= 25
          AND CAST(l_quantity AS DECIMAL(28,6)) * 5 * nq < sq
        """,
    )[0]
    assert (got["n_small_lines"], got["avg_yearly"]) == ref
    assert got["n_small_lines"] > 0


def test_supplier_relationship_matches_duckdb(spark, qs):
    # absorbed into sql_excess_suppliers (part='q16') in r9; the
    # standalone helper keeps its own pin here
    from etl_hero_spark.registry_ext2 import q_sql_supplier_relationship

    got = [
        (r["p_brand"], r["p_type_prefix"], r["p_size"], r["supplier_cnt"])
        for r in q_sql_supplier_relationship(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT p_brand, substring(p_type, 1, 6) AS tp, p_size,
               count(DISTINCT l_suppkey)::BIGINT AS cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY 1, 2, 3
        ORDER BY cnt DESC, p_brand, tp, p_size
        """,
    )
    assert sorted(got) == sorted(ref) and got
    # deterministic presentation order
    cnts = [c for *_, c in got]
    assert cnts == sorted(cnts, reverse=True)


def test_pricing_summary_matches_duckdb(spark, qs):
    """TPC-H Q1: every money aggregate decimal-exact, rounded once."""
    got = [tuple(r) for r in qs["sql_pricing_summary"](spark, SF).collect()]
    ref = _duck(
        SF,
        """
        SELECT l_returnflag, l_linestatus,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2),
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2),
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,6))
               - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2),
          round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,6))
               - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
            * (CAST(1 AS DECIMAL(18,6))
               + CAST(l_tax AS DECIMAL(18,6)))) AS DOUBLE), 2),
          round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            / count(l_quantity), 6),
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / count(l_extendedprice), 6),
          round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
            / count(l_discount), 6),
          count(*)::BIGINT
        FROM lineitem WHERE l_shipdate <= '2001-09-01'
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )
    assert got == ref and len(got) >= 4  # R/A x F/O at least


def test_local_supplier_volume_matches_duckdb(spark, qs):
    """TPC-H Q5: same-nation customer+supplier revenue per nation."""
    got = [
        (r["n_name"], r["revenue"])
        for r in qs["sql_local_supplier_volume"](spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT n_name,
          round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,6))
               - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        GROUP BY 1 ORDER BY rev DESC, n_name ASC
        """,
    )
    assert got == ref and got


def test_shipmode_priority_matches_duckdb(spark, qs):
    """TPC-H Q12 shape: CASE-sum priority split per shipping class."""
    # the registered query is the part-tagged wrapper since the r10
    # absorption; the Q12 body stays as an unregistered helper
    from etl_hero_spark.registry_ext2 import q_sql_shipmode_priority_body

    got = [
        tuple(r)
        for r in q_sql_shipmode_priority_body(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT l_returnflag,
          sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END)::BIGINT,
          sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END)::BIGINT
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY 1 ORDER BY 1
        """,
    )
    assert got == ref and len(got) >= 2
    # both priority classes actually occur
    assert any(h > 0 for _, h, _ in got) and any(lo > 0 for *_, lo in got)


def test_waiting_suppliers_matches_duckdb(spark, qs):
    """TPC-H Q21 shape: the EXISTS + NOT EXISTS pair as semi/anti
    joins; the oracle runs the textbook correlated form."""
    # absorbed into sql_shipmode_priority part='q21' (r10); the body
    # stays as an unregistered helper
    from etl_hero_spark.registry_ext2 import q_sql_waiting_suppliers

    got = [
        (r["s_name"], r["numwait"])
        for r in q_sql_waiting_suppliers(spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s_name, count(*)::BIGINT AS numwait
        FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC LIMIT 20
        """,
    )
    assert got == ref and got


def test_important_parts_matches_duckdb(spark, qs):
    """TPC-H Q11 shape: HAVING against a global scalar subquery."""
    # absorbed into sql_excess_suppliers part='q11' (r10); the body
    # stays as an unregistered helper
    from etl_hero_spark.registry_ext2 import q_sql_important_parts

    got = [tuple(r) for r in q_sql_important_parts(spark, SF).collect()]
    ref = _duck(
        SF,
        """
        WITH v AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY 1)
        SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value
        FROM v
        WHERE CAST(val AS DECIMAL(38,6))
              > (SELECT sum(CAST(val AS DECIMAL(38,6))) FROM v) * 0.01
        ORDER BY part_value DESC, l_partkey ASC
        """,
    )
    assert got == ref and got
    # the 1% cut is decimal-exact in BOTH engines: a value landing
    # EXACTLY on the boundary is excluded (strict >) with no double
    # rounding able to flip it — replay the cut on a planted boundary
    boundary = spark.createDataFrame(
        # parts: 1.00 (exactly 1% of 100.00), 98.00, 1.00
        [(1, "1.00"), (2, "98.00"), (3, "1.00")],
        "pk bigint, v string",
    ).select("pk", F.col("v").cast("decimal(18,2)").alias("_val"))
    tot = boundary.agg(F.sum("_val").alias("_tot"))
    winners = (
        boundary.crossJoin(F.broadcast(tot))
        .filter(
            F.col("_val").cast("decimal(32,2)") * F.lit(100)
            > F.col("_tot").cast("decimal(38,2)")
        )
        .select("pk")
        .collect()
    )
    assert [r["pk"] for r in winners] == [2]
    # selective: strictly fewer winners than the per-part table has rows
    n_parts = _duck(
        SF,
        """
        SELECT count(DISTINCT l_partkey) FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        """,
    )[0][0]
    assert len(got) < n_parts


def test_excess_suppliers_matches_duckdb(spark, qs):
    """TPC-H Q20 shape: nested IN with aggregate threshold,
    decorrelated to co-partitioned groupBys + a semi join. The
    registered entry is merged/tagged since r9 (absorbed Q16) — the
    part='excess' rows carry the Q20 shape."""
    got = [
        (r["s_suppkey"], r["s_name"], r["s_acctbal"])
        for r in qs["sql_excess_suppliers"](spark, SF).collect()
        if r["part"] == "excess"
    ]
    ref = _duck(
        SF,
        """
        SELECT s_suppkey, s_name,
               round(CAST(s_acctbal AS DOUBLE), 2)
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM (
            SELECT l_suppkey, l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(28,6))) AS q
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2) sq
          JOIN (
            SELECT l_partkey AS pk,
                   sum(CAST(l_quantity AS DECIMAL(28,6))) AS tq
            FROM lineitem GROUP BY 1) pt
          ON sq.l_partkey = pt.pk
          WHERE q * 5 > tq)
        ORDER BY s_suppkey
        """,
    )
    assert got == ref and got
    # the threshold genuinely filters (not every supplier qualifies)
    n_sup = _duck(SF, "SELECT count(*) FROM supplier")[0][0]
    assert len(got) < n_sup


def test_forecast_revenue_matches_duckdb(spark, qs):
    """TPC-H Q6 (r9): exact-decimal conditional revenue sum — the
    single-scan benchmark; the oracle runs the textbook form."""
    got = [tuple(r) for r in qs["sql_forecast_revenue"](spark, SF).collect()]
    ref = _duck(
        SF,
        """
        SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR)
                 AS DOUBLE) AS revenue,
               count(*)::BIGINT AS n_lines
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN CAST(0.05 AS DOUBLE)
                             AND CAST(0.07 AS DOUBLE)
          AND l_quantity < 24
        """,
    )
    assert got == ref and got[0][1] > 0


def test_nation_profit_matches_duckdb(spark, qs):
    """TPC-H Q9 shape (r9, no-partsupp adaptation): separate exact
    decimal sums combined as doubles once per group — bit-identical
    cross-engine."""
    got = [
        (r["nation"], r["o_year"], r["sum_profit"])
        for r in qs["sql_nation_profit"](spark, SF).collect()
    ]
    ref = _duck(
        SF,
        """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,6))
                       - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR)
                 AS DOUBLE)
               - 0.6 * CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                 AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation ASC, o_year DESC
        """,
    )
    assert got == ref and len(got) > 3


def test_min_cost_supplier_matches_duckdb(spark, qs):
    """TPC-H Q2 shape (r9, no-partsupp adaptation): the correlated
    scalar-min subquery decorrelated; min-of-quotients is bit-exact
    cross-engine with no accumulation."""
    got = [tuple(r) for r in qs["sql_min_cost_supplier"](spark, SF).collect()]
    ref = _duck(
        SF,
        """
        WITH costs AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          GROUP BY 1, 2)
        SELECT round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal,
               s_name, n_name, p_partkey, p_name, unit_cost
        FROM costs
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size < 11 AND p_type = 'LARGE'
          AND unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                           WHERE c2.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 100
        """,
    )
    assert got == ref and len(got) >= 5
