"""Unit tests for the profiling pack (A1-A11, P1) on micro-fixtures
(FIXTURES.md §C edge cases) and the sf0.001 tables."""

import pyspark.sql.functions as F

from etl_hero_spark import profile


def test_null_counts_all_null_col(spark):
    df = spark.createDataFrame([(None,), (None,), (None,)], "x string")
    row = profile.null_counts(df).first()
    assert row["n_null_x"] == 3
    assert row["n_rows"] == 3
    assert row["n_null_total"] == 3


def test_null_counts_empty_table(spark):
    df = spark.createDataFrame([], "x string, y double")
    row = profile.null_counts(df).first()
    assert row["n_null_x"] == 0 and row["n_null_y"] == 0 and row["n_rows"] == 0


def test_distinct_counts_ignore_nulls(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "x string")
    assert profile.distinct_counts(df).first()["n_unique_x"] == 2


def test_duplicate_count_all_dups(spark):
    df = spark.createDataFrame([(1, "a")] * 5, "k long, v string")
    assert profile.duplicate_count(df).first()["n_duplicates"] == 4


def test_duplicate_count_no_dups(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    assert profile.duplicate_count(df).first()["n_duplicates"] == 0


def test_stddev_pop_is_population(spark):
    # ddof=0: pop std of [1,2,3,4] = sqrt(1.25); sample std would be ~1.29
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "x double")
    row = profile.numeric_stats(df, ["x"]).first()
    assert abs(row["std_x"] - 1.118034) < 1e-6
    assert row["mean_x"] == 2.5


def test_median_interpolates_even_count(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], "x double")
    assert profile.quantiles(df, "x", [0.5]) == [2.5]


def test_mode_tiebreak_smallest_wins(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "x string"
    )
    assert profile.mode_value(df, "x") == "a"


def test_mode_empty_returns_empty_string(spark):
    df = spark.createDataFrame([(None,)], "x string")
    assert profile.mode_value(df, "x") == ""


def test_profile_table_shape(lineitem):
    pdf = profile.profile_table(lineitem).toPandas()
    assert set(pdf.columns) == {"column", "dtype", "n_null", "n_unique"}
    assert len(pdf) == len(lineitem.columns)
    assert (pdf["n_null"] == 0).all()


def test_nan_vs_null_normalization(spark):
    # SQL NULL and float NaN are distinct in Spark; count() skips NULL but
    # counts NaN — nanvl normalizes on ingest (SURVEY §7 null semantics)
    df = spark.createDataFrame([(float("nan"),), (None,), (1.0,)], "x double")
    norm = df.withColumn("x", F.nanvl("x", F.lit(None)))
    assert profile.null_counts(norm).first()["n_null_x"] == 2


def test_histogram_buckets_and_edges(spark):
    from etl_hero_spark.profile import histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "x double",
    )
    rows = {r["bucket"]: r for r in histogram(df, "x", bins=5).collect()}
    # [0,10] in 5 buckets of width 2; max lands in the last bucket
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0]["n"] == 2 and rows[4]["n"] == 3  # 8, 9, 10
    assert rows[0]["lo_edge"] == 0.0 and rows[0]["hi_edge"] == 2.0
    assert rows[4]["lo_edge"] == 8.0 and rows[4]["hi_edge"] == 10.0
    # nulls excluded
    assert sum(r["n"] for r in rows.values()) == 11


def test_histogram_degenerate_single_value(spark):
    from etl_hero_spark.profile import histogram

    df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = histogram(df, "x", bins=10).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 2


def test_psi_drift_detects_shift_and_stability(spark):
    import pyspark.sql.functions as F

    from etl_hero_spark.profile import psi_drift

    base = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    # x shifted by +80 in snapshot b -> large PSI; y identical -> ~0
    shifted = base.withColumn("x", F.col("x") + 80.0)
    rows = {r["column"]: r for r in psi_drift(base, shifted, ["x", "y"]).collect()}
    assert rows["x"]["psi"] > 0.25
    assert rows["y"]["psi"] < 1e-9
    assert rows["x"]["n_a"] == 2000 and rows["x"]["n_b"] == 2000


def test_psi_drift_matches_duckdb(spark, sf_dir):
    import duckdb

    from etl_hero_spark.registry import all_queries

    got = {tuple(r) for r in all_queries()["profile_psi_drift"](spark, sf_dir).collect()}
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linenumber"]
    per_col = " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col, cast(l_orderkey % 2 = 0 as int) AS is_a,
          CASE WHEN _hi > _lo THEN least(9, cast(floor(
            (cast({c} as double) - _lo) * 10 / (_hi - _lo)) as int))
          ELSE 0 END AS bucket
        FROM t, (SELECT cast(min({c}) as double) AS _lo,
                        cast(max({c}) as double) AS _hi FROM t) b
        WHERE {c} IS NOT NULL
        """
        for c in cols
    )
    want = set(
        duckdb.sql(
            f"WITH t AS (SELECT * FROM '{sf_dir}/lineitem.parquet'), "
            f"x AS ({per_col}), "
            "cnt AS (SELECT col, bucket, is_a, count(*) AS n FROM x "
            "GROUP BY col, bucket, is_a), "
            "tot AS (SELECT col, is_a, sum(n) AS tot FROM cnt GROUP BY col, is_a), "
            "sh AS (SELECT cnt.col, bucket, cnt.is_a, "
            "cast(n as double)/cast(tot as double) AS p, tot "
            "FROM cnt JOIN tot ON cnt.col = tot.col AND cnt.is_a = tot.is_a), "
            "pv AS (SELECT col, bucket, "
            "greatest(coalesce(max(CASE WHEN is_a = 1 THEN p END), 0.0), 1e-6) AS pa, "
            "greatest(coalesce(max(CASE WHEN is_a = 0 THEN p END), 0.0), 1e-6) AS pb, "
            "max(CASE WHEN is_a = 1 THEN tot END) AS n_a, "
            "max(CASE WHEN is_a = 0 THEN tot END) AS n_b "
            "FROM sh GROUP BY col, bucket) "
            "SELECT col, round(cast(sum(cast(round((pa - pb) * ln(pa / pb), 9) "
            "as decimal(18,9))) as double), 6) AS psi, "
            "cast(max(n_a) as bigint), cast(max(n_b) as bigint) "
            "FROM pv GROUP BY col"
        ).fetchall()
    )
    assert got == want and len(got) == 5


def test_contract_rules_semantics(spark):
    from etl_hero_spark.contracts import (
        accepted_values,
        in_range,
        matches,
        not_null,
        validate_contract,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (1, "ok", 500.0),     # dup id, out of range
            (2, None, None),      # null cat, null x (nulls not range viols)
            (3, "bad cat", 7.0),  # not accepted, regex violation
        ],
        "id long, cat string, x double",
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in validate_contract(
            df,
            rules=[
                not_null("cat"),
                accepted_values("cat", ["ok"]),
                in_range("x", 0, 100),
                matches("cat", "^[a-z]+$"),
            ],
            unique_keys=[["id"]],
        ).collect()
    }
    assert got == {
        "not_null:cat": 1,
        "accepted_values:cat": 1,
        "range:x": 1,
        "matches:cat": 1,  # 'bad cat' has a space
        "unique:id": 1,
    }


def test_contract_validate_matches_duckdb(spark, sf_dir):
    """Cross-engine oracle for the rows-only registered query."""
    import duckdb

    from etl_hero_spark.registry_ext import q_contract_validate_lineitem

    got = {
        r["rule"]: r["n_violations"]
        for r in q_contract_validate_lineitem(spark, sf_dir).collect()
    }
    (n_null, n_acc, n_rng, n_re, n_uq2, n_uq1) = duckdb.sql(
        "WITH t AS (SELECT l.*, CASE WHEN l_orderkey % 97 = 0 THEN NULL "
        f"ELSE l_extendedprice END AS price_n FROM '{sf_dir}/lineitem.parquet' l) "
        "SELECT "
        "sum(CASE WHEN price_n IS NULL THEN 1 ELSE 0 END), "
        "sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN "
        "('A','N','R') THEN 1 ELSE 0 END), "
        "sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1 AND 50 "
        "THEN 1 ELSE 0 END), "
        "sum(CASE WHEN l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, "
        "'^[A-Z]+$') THEN 1 ELSE 0 END), "
        "count(*) - count(DISTINCT (l_orderkey, l_linenumber)), "
        "count(*) - count(DISTINCT l_orderkey) FROM t"
    ).fetchone()
    assert got == {
        "not_null:price_n": n_null,
        "accepted_values:l_returnflag": n_acc,
        "range:l_quantity": n_rng,
        "matches:l_linestatus": n_re,
        "unique:l_orderkey,l_linenumber": n_uq2,
        "unique:l_orderkey": n_uq1,
    }
    assert got["not_null:price_n"] > 0 and got["unique:l_orderkey"] > 0


def test_mergeable_snapshots_bit_match_full_rescan(spark, sf_dir):
    """finalize(merge(snapshot(batch1), snapshot(batch2))) must be
    BIT-identical to numeric_stats over the union — decimal states make
    the merge exact, and finalize repeats dec_avg/dec_stddev_pop's
    float64 expression order."""
    from etl_hero_spark.profile import (
        finalize_stats,
        merge_stats_snapshots,
        numeric_stats,
        stats_snapshot,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    snaps = stats_snapshot(a, cols).unionByName(stats_snapshot(b, cols))
    got = finalize_stats(merge_stats_snapshots(snaps, cols), cols).first()
    want = numeric_stats(li, cols).first()
    assert got.asDict() == want.asDict()


def test_mergeable_snapshots_order_invariant(spark):
    """Snapshots merge associatively: (a+b)+c == a+(b+c) == one-shot."""
    from etl_hero_spark.profile import (
        finalize_stats,
        merge_stats_snapshots,
        stats_snapshot,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 300)], "x double"
    )
    parts = [
        df.filter((F.col("x") % 3) == k) for k in range(3)
    ]
    snaps = [stats_snapshot(p, ["x"]) for p in parts]
    u1 = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    u2 = snaps[2].unionByName(snaps[0]).unionByName(snaps[1])
    r1 = finalize_stats(merge_stats_snapshots(u1, ["x"]), ["x"]).first()
    r2 = finalize_stats(merge_stats_snapshots(u2, ["x"]), ["x"]).first()
    one = finalize_stats(
        merge_stats_snapshots(stats_snapshot(df, ["x"]), ["x"]), ["x"]
    ).first()
    assert r1.asDict() == r2.asDict() == one.asDict()


def test_contract_unique_rule_null_keys_are_groups(spark):
    """NULL key values form ordinary groups (A4 semantics): [1, NULL,
    NULL] has exactly one duplicate occurrence, not two."""
    from etl_hero_spark.contracts import validate_contract

    df = spark.createDataFrame(
        [(1,), (None,), (None,)], "k long"
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in validate_contract(df, rules=[], unique_keys=[["k"]]).collect()
    }
    assert got == {"unique:k": 1}


def test_topk_values_semantics(spark):
    from etl_hero_spark.profile import topk_values

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", None), ("b", "y"), ("a", None)],
        "c1 string, c2 string",
    )
    rows = {
        (r["column"], r["rnk"]): (r["value"], r["n"])
        for r in topk_values(df, ["c1", "c2"], k=2).collect()
    }
    assert rows[("c1", 1)] == ("a", 3) and rows[("c1", 2)] == ("b", 2)
    # y(2) first, then the tie between '<null>'(2)... null tied with y:
    # order is n desc then value asc -> '<null>' < 'y' lexicographically
    assert rows[("c2", 1)] == ("<null>", 2) and rows[("c2", 2)] == ("y", 2)


def test_topk_values_matches_duckdb(spark, sf_dir):
    """Cross-engine oracle for the rows-only registered query."""
    import duckdb

    from etl_hero_spark.registry_ext import q_profile_topk_values

    got = {
        (r["column"], r["value"], r["n"], r["rnk"])
        for r in q_profile_topk_values(spark, sf_dir).collect()
    }
    want = set(
        duckdb.sql(
            "WITH l AS ("
            + " UNION ALL ".join(
                f"SELECT '{c}' AS col, coalesce(cast({c} as varchar), '<null>') "
                f"AS value FROM '{sf_dir}/orders.parquet'"
                for c in ["o_orderpriority", "o_orderstatus"]
            )
            + "), c AS (SELECT col, value, count(*) AS n FROM l GROUP BY 1, 2), "
            "r AS (SELECT col, value, n, cast(row_number() OVER "
            "(PARTITION BY col ORDER BY n DESC, value ASC) as int) AS rnk FROM c) "
            "SELECT col, value, n, rnk FROM r WHERE rnk <= 5"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_topk_values_window_is_partitioned(spark, sf_dir):
    from etl_hero_spark.registry_ext import q_profile_topk_values

    plan = (
        q_profile_topk_values(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    window_lines = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert window_lines, "expected a Window node in the plan"
    for line in window_lines:
        assert "column" in line.split("windowspecdefinition")[1][:60]


# ---------------------------------------------------------------------------
# mergeable quantile sketch
# ---------------------------------------------------------------------------


def test_quantile_sketch_merge_is_exact(spark, lineitem):
    from etl_hero_spark.profile import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    lo, hi = 0.0, 120000.0
    whole = quantile_sketch(lineitem, "l_extendedprice", lo, hi, 64)
    parts = [
        quantile_sketch(
            lineitem.filter(F.col("l_orderkey") % 3 == i),
            "l_extendedprice", lo, hi, 64,
        )
        for i in range(3)
    ]
    merged = merge_quantile_sketches(
        parts[0].unionByName(parts[1]).unionByName(parts[2])
    )
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b  # bin counts add EXACTLY — not approximately


def test_quantile_sketch_estimates_within_bin_width(spark, lineitem):
    from etl_hero_spark.profile import quantile_sketch, quantiles_from_sketch

    bounds = lineitem.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    lo, hi = float(bounds[0]), float(bounds[1])
    n_bins = 256
    sk = quantile_sketch(lineitem, "l_extendedprice", lo, hi, n_bins)
    est = quantiles_from_sketch(sk, lo, hi, n_bins, [0.01, 0.5, 0.99])
    exact = lineitem.selectExpr(
        "percentile(l_extendedprice, array(0.01, 0.5, 0.99)) AS q"
    ).first()["q"]
    width = (hi - lo) / n_bins
    for p, ex in zip([0.01, 0.5, 0.99], exact):
        assert abs(est[p] - ex) <= width, (p, est[p], ex, width)


def test_quantile_sketch_overflow_bins_visible_and_clamped(spark):
    from etl_hero_spark.profile import quantile_sketch, quantiles_from_sketch

    df = spark.createDataFrame(
        [(float(v),) for v in [-5.0, 1.0, 2.0, 3.0, 99.0]], "x double"
    )
    sk = quantile_sketch(df, "x", 0.0, 10.0, 10)
    rows = {r["bin"]: r["n"] for r in sk.collect()}
    assert rows.get(0) == 1  # underflow visible
    assert rows.get(11) == 1  # overflow visible
    est = quantiles_from_sketch(sk, 0.0, 10.0, 10, [0.0, 1.0])
    assert est[0.0] == 0.0 and est[1.0] == 10.0  # clamped to range


def test_distinct_sketch_merge_estimates_exactly_like_whole(spark, sf_dir):
    from etl_hero_spark.profile import (
        distinct_sketch,
        estimate_distincts,
        merge_distinct_sketches,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_orderpriority"]
    whole = estimate_distincts(distinct_sketch(orders, cols), cols).first()
    parts = [
        distinct_sketch(
            orders.filter(F.col("o_orderkey") % 3 == i), cols
        )
        for i in range(3)
    ]
    merged = merge_distinct_sketches(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), cols
    )
    inc = estimate_distincts(merged, cols).first()
    # HLL registers fold by max -> merged sketch == whole-corpus sketch
    assert tuple(inc) == tuple(whole)
    # and the estimate is close to exact
    exact = orders.agg(
        F.countDistinct("o_custkey"), F.countDistinct("o_orderpriority")
    ).first()
    assert abs(inc[0] - exact[0]) / exact[0] < 0.05
    assert inc[1] == exact[1]  # 5 priorities: tiny cardinality is exact


def test_correlation_matrix_matches_duckdb(spark, lineitem):
    import duckdb

    from etl_hero_spark.profile import correlation_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n_pairs"])
        for r in correlation_matrix(lineitem, cols).collect()
    }
    assert len(got) == 6  # 4 choose 2
    for (a, b), (c, n) in got.items():
        dc, dn = duckdb.sql(
            f"SELECT corr({a}, {b}), count(*) FROM "
            f"read_parquet('/root/testdata/sf0.001/lineitem.parquet') "
            f"WHERE {a} IS NOT NULL AND {b} IS NOT NULL"
        ).fetchone()
        assert n == dn
        assert abs(c - dc) < 1e-9, (a, b, c, dc)
    # sanity on constructed data: a linear pair is exactly 1
    lin = spark.createDataFrame(
        [(float(i), 2.0 * i + 3) for i in range(50)], "x double, y double"
    )
    [r] = correlation_matrix(lin, ["x", "y"]).collect()
    assert abs(r["corr"] - 1.0) < 1e-12 and r["n_pairs"] == 50


def test_benford_profile_semantics(spark):
    import math

    from etl_hero_spark.profile import benford_profile

    # a perfectly Benford-ish synthetic: exponential spread 10^u
    rows = [(10 ** (i / 997.0),) for i in range(997)] + [
        (None,), (0.0,), (-25.0,)  # null + zero excluded; sign ignored
    ]
    df = spark.createDataFrame(rows, "x double")
    out = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    assert sum(r["n"] for r in out.values()) == 998  # 997 + |-25|
    for d in range(1, 10):
        assert out[d]["expected_p"] == round(math.log10(1 + 1 / d), 6)
        # log-uniform sample tracks Benford within a few percent
        assert abs(out[d]["deviation"]) < 0.02
    # -25 counted under first digit 2
    exact2 = sum(
        1 for i in range(997) if str(10 ** (i / 997.0))[0] == "2"
    ) + 1
    assert out[2]["n"] == exact2


def test_benford_profile_matches_duckdb(spark, lineitem):
    import duckdb

    from etl_hero_spark.profile import benford_profile

    got = sorted(
        (r["digit"], r["n"], r["observed_p"])
        for r in benford_profile(lineitem, "l_extendedprice").collect()
    )
    want = sorted(
        (d, n, p)
        for d, n, p in duckdb.sql(
            """
            WITH v AS (
              SELECT abs(l_extendedprice) AS x
              FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
              WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) > 0
            ), c AS (
              SELECT CAST(floor(x / power(10, floor(log10(x)))) AS INT)
                AS digit, CAST(count(*) AS BIGINT) AS n
              FROM v GROUP BY 1
            )
            SELECT digit, n,
              round(n / CAST((SELECT sum(n) FROM c) AS DOUBLE), 6)
            FROM c
            """
        ).fetchall()
    )
    assert got == want


def test_histogram2d_matches_duckdb(spark, lineitem):
    import duckdb

    from etl_hero_spark.profile import histogram2d

    got = sorted(
        map(
            tuple,
            histogram2d(
                lineitem, "l_quantity", "l_extendedprice", bins=8,
                bounds=(1.0, 50.0, 900.0, 105000.0),
            ).collect(),
        )
    )
    want = sorted(
        duckdb.sql(
            """
            -- DuckDB has no width_bucket: mirror Spark's arithmetic
            -- floor((v - lo) / ((hi - lo) / n)) + 1, top-folded
            SELECT CAST(least(floor((CAST(l_quantity AS DOUBLE) - 1.0)
                     / ((50.0 - 1.0) / 8)) + 1, 8) AS INT) AS bx,
                   CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - 900.0)
                     / ((105000.0 - 900.0) / 8)) + 1, 8) AS INT) AS by,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want
    assert sum(n for _, _, n in got) == lineitem.count()


# ---------------------------------------------------------------------------
# count-min sketch (round 4)
# ---------------------------------------------------------------------------


def test_countmin_overcounts_only(spark, lineitem):
    """CMS structural invariant: est >= exact for EVERY key (min over
    depth rows can only be inflated by collisions, never deflated), and
    the sketch is bounded at depth*width cells regardless of corpus."""
    keyed = lineitem.select(F.col("l_partkey").alias("k"))
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    sk = profile.countmin_sketch(keyed, "k", width=16, depth=4)
    est = profile.estimate_counts(
        sk, exact.select("k"), "k", width=16, depth=4
    )
    rows = exact.join(est, "k").collect()
    assert len(rows) == exact.count() > 16  # far more keys than width
    assert all(r["est_count"] >= r["exact"] for r in rows)
    # width 16 << distinct part keys: collisions must exist
    assert any(r["est_count"] > r["exact"] for r in rows)
    assert sk.count() <= 16 * 4


def test_countmin_merge_equals_whole_corpus(spark, lineitem):
    """Mergeability: cell-summing two disjoint shards' sketches is
    IDENTICAL to sketching the whole corpus — the property that lets
    shards/days sketch independently and fold without rescans."""
    keyed = lineitem.select(F.col("l_partkey").alias("k"))
    whole = profile.countmin_sketch(keyed, "k", width=64, depth=4)
    a = profile.countmin_sketch(
        keyed.filter(F.col("k") % 2 == 0), "k", width=64, depth=4
    )
    b = profile.countmin_sketch(
        keyed.filter(F.col("k") % 2 != 0), "k", width=64, depth=4
    )
    merged = profile.merge_countmin_sketches(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_countmin_unseen_key_estimates_zero(spark):
    """A key hitting only empty cells estimates 0 (left join coalesce),
    and NULL keys never enter the sketch."""
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "k string"
    )
    sk = profile.countmin_sketch(df, "k", width=1024, depth=4)
    assert sk.agg(F.sum("cnt")).first()[0] == 3 * 4  # NULL excluded
    probe = spark.createDataFrame([("zzz-unseen",)], "k string")
    est = profile.estimate_counts(sk, probe, "k", width=1024, depth=4)
    assert est.first()["est_count"] == 0


# ---------------------------------------------------------------------------
# quarantine split (round 4)
# ---------------------------------------------------------------------------


def test_quarantine_matches_duckdb(spark, sf_dir):
    """Per-rule violation counts and the clean/quarantined split over
    orders, mirrored in DuckDB with the same predicates."""
    import duckdb

    from etl_hero_spark.contracts import (
        accepted_values,
        in_range,
        matches,
        quarantine_split,
    )

    rules = [
        in_range("o_totalprice", 1000.0, 400000.0),
        accepted_values("o_orderstatus", ["O", "F"]),
        matches("o_orderpriority", "^[1-3]-"),
    ]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    clean, bad = quarantine_split(orders, rules)
    r_range, r_vals, r_re, n_bad, n_clean = duckdb.sql(
        f"""
        WITH o AS (
          SELECT *,
            (o_totalprice IS NOT NULL
             AND o_totalprice NOT BETWEEN 1000.0 AND 400000.0) AS v1,
            (o_orderstatus IS NOT NULL
             AND o_orderstatus NOT IN ('O', 'F')) AS v2,
            (o_orderpriority IS NOT NULL
             AND NOT regexp_matches(o_orderpriority, '^[1-3]-')) AS v3
          FROM read_parquet('{sf_dir}/orders.parquet')
        )
        SELECT sum(v1::int), sum(v2::int), sum(v3::int),
               sum((v1 OR v2 OR v3)::int),
               sum((NOT (v1 OR v2 OR v3))::int)
        FROM o
        """
    ).fetchone()
    assert clean.count() == n_clean
    assert bad.count() == n_bad
    by_rule = (
        bad.select(F.explode("violations").alias("v"))
        .groupBy("v")
        .count()
        .collect()
    )
    got = {r["v"]: r["count"] for r in by_rule}
    assert got["range:o_totalprice"] == r_range
    assert got["accepted_values:o_orderstatus"] == r_vals
    assert got["matches:o_orderpriority"] == r_re
    # clean + bad partition the input, and clean rows carry no column
    assert clean.count() + bad.count() == orders.count()
    assert "violations" not in clean.columns


def test_quarantine_null_handling(spark):
    """NULLs violate only not_null, never range/membership/regex (the
    rule-builder contract) — a NULL-priced row with a declared range
    rule stays CLEAN unless not_null is also declared."""
    from etl_hero_spark.contracts import (
        in_range,
        not_null,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 50.0), (3, 5.0)], "id bigint, price double"
    )
    clean, bad = quarantine_split(df, [in_range("price", 10.0, 100.0)])
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    assert [r["id"] for r in bad.collect()] == [3]
    clean2, bad2 = quarantine_split(
        df, [in_range("price", 10.0, 100.0), not_null("price")]
    )
    assert sorted(r["id"] for r in bad2.collect()) == [1, 3]
    assert {
        tuple(r["violations"]) for r in bad2.collect()
    } == {("not_null:price",), ("range:price",)}


# ---------------------------------------------------------------------------
# JSON schema profiling (round 4)
# ---------------------------------------------------------------------------


def test_json_schema_profile_matches_python_reference(spark):
    """Presence, fill, distincts, and the type lattice (bigint ⊂ double
    ⊂ string, boolean ⊂ string) pinned against json.loads + pure
    Python over a heterogeneous fixture."""
    import json

    from etl_hero_spark.profile import json_schema_profile

    rows = [
        '{"a": 1, "b": 2.5, "c": "x", "d": true}',
        '{"a": 7, "b": 3, "d": false}',     # b int here: still double overall
        '{"a": -2, "c": "y"}',
        '{"a": 9, "e": 1}',
        None,                               # NULL json contributes nothing
        '{"a": "not-a-number"}',            # a degrades to string
    ]
    df = spark.createDataFrame([(r,) for r in rows], "props string")
    got = {
        r["key"]: (
            r["n_present"], r["fill_rate"], r["n_distinct"],
            r["inferred_type"],
        )
        for r in json_schema_profile(df, "props").collect()
    }

    vals: dict = {}
    for r in rows:
        if r is None:
            continue
        for k, v in json.loads(r).items():
            vals.setdefault(k, []).append(v)
    want = {}
    n_rows = len(rows)
    for k, vs in vals.items():
        if all(isinstance(v, bool) for v in vs):
            t = "boolean"
        elif all(isinstance(v, int) and not isinstance(v, bool) for v in vs):
            t = "bigint"
        elif all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in vs
        ):
            t = "double"
        else:
            t = "string"
        want[k] = (
            len(vs),
            round(len(vs) / n_rows, 6),
            len({str(v) for v in vs}),
            t,
        )
    # normalize: Spark stringifies json scalars (True -> 'true'), so
    # distinct-count compares on the stringified form both sides
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, k
        assert got[k][3] == want[k][3], k
    assert got["a"][3] == "string" and got["b"][3] == "double"
    assert got["d"][3] == "boolean" and got["e"][3] == "bigint"


def test_json_schema_profile_fill_and_registered(spark, sf_dir):
    """The registered widened-props query reports the planted keys with
    the planted types and quarter fills."""
    from etl_hero_spark.registry import all_queries

    got = {
        r["key"]: r
        for r in all_queries()["profile_json_schema"](spark, sf_dir).collect()
    }
    assert got["k"]["inferred_type"] == "bigint"
    assert got["k"]["fill_rate"] == 1.0
    assert got["amt"]["inferred_type"] == "double"
    assert got["ua"]["inferred_type"] == "string"
    assert got["flag"]["inferred_type"] == "boolean"
    for k in ("amt", "ua", "flag"):
        assert 0.2 < got[k]["fill_rate"] < 0.3


# ---------------------------------------------------------------------------
# mutual information (round 4)
# ---------------------------------------------------------------------------


def test_mutual_information_matches_python_reference(spark):
    import math
    import random

    random.seed(7)
    rows = [
        (round(random.uniform(0, 10), 3), round(random.uniform(0, 5), 3))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    bins = 6
    lo_x, hi_x = min(r[0] for r in rows), max(r[0] for r in rows)
    lo_y, hi_y = min(r[1] for r in rows), max(r[1] for r in rows)
    got = profile.mutual_information(
        df, "x", "y", bins=bins, bounds=(lo_x, hi_x, lo_y, hi_y)
    )

    def bucket(v, lo, hi):
        # mirror histogram2d: floor((v-lo)/((hi-lo)/n))+1, top-folded
        return min(bins, int((v - lo) // ((hi - lo) / bins)) + 1)

    from collections import Counter

    joint = Counter(
        (bucket(x, lo_x, hi_x), bucket(y, lo_y, hi_y)) for x, y in rows
    )
    n = len(rows)
    px = Counter()
    py = Counter()
    for (bx, by), c in joint.items():
        px[bx] += c
        py[by] += c
    want = sum(
        (c / n) * math.log((c / n) / ((px[bx] / n) * (py[by] / n)))
        for (bx, by), c in joint.items()
    )
    assert abs(got - max(0.0, want)) < 1e-9


def test_mutual_information_sees_what_correlation_misses(spark):
    """y = x^2 on symmetric x: Pearson corr ~0 (no linear trend) but MI
    is large (y is a deterministic function of x); independent noise
    shows near-zero MI."""
    import random

    random.seed(11)
    xs = [random.uniform(-1, 1) for _ in range(800)]
    dep = spark.createDataFrame(
        [(x, x * x) for x in xs], "x double, y double"
    )
    corr = dep.stat.corr("x", "y")
    assert abs(corr) < 0.15
    mi_dep = profile.mutual_information(dep, "x", "y", bins=8)
    ind = spark.createDataFrame(
        [(x, random.uniform(0, 1)) for x in xs], "x double, y double"
    )
    mi_ind = profile.mutual_information(ind, "x", "y", bins=8)
    assert mi_dep > 5 * mi_ind
    assert mi_dep > 0.5
