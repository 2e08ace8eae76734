"""Registry entries for the round-4 wave-3 extensions: two-sample
hypothesis tests, autocorrelation, PMI collocations, item-item
similarity, Naive Bayes language classification, semi/anti-join SQL
analytics, and unpivot. Imported by registry for its side effects,
same split as registry_ext."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hero_spark.registry import _events, _t, register

# ===========================================================================
# two-sample hypothesis tests (stattests.py)
# ===========================================================================


# the three single-row hypothesis tests (Welch t, Mann-Whitney U,
# one-way ANOVA) share one test-tagged registration since r6 — driver-
# window slot policy: merge mature tagged entries instead of
# registering more. Inner oracle SQL is unchanged from when each was a
# standalone window entry; the union only NULL-fills the columns the
# other tests don't produce.
_WELCH_SQL = (
    "WITH m AS (SELECT "
        "count(CASE WHEN c_mktsegment = 'BUILDING' THEN x END) AS n_a, "
        "sum(CASE WHEN c_mktsegment = 'BUILDING' THEN x END) AS s_a, "
        "sum(CASE WHEN c_mktsegment = 'BUILDING' THEN "
        "CAST(x AS DECIMAL(19,6)) * x END) AS q_a, "
        "count(CASE WHEN c_mktsegment = 'MACHINERY' THEN x END) AS n_b, "
        "sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN x END) AS s_b, "
        "sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN "
        "CAST(x AS DECIMAL(19,6)) * x END) AS q_b "
        "FROM (SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,6)) AS x "
        "FROM customer WHERE c_acctbal IS NOT NULL "
        "AND c_mktsegment IN ('BUILDING','MACHINERY'))), "
        "d AS (SELECT CAST(n_a AS DOUBLE) na, CAST(s_a AS DOUBLE) sa, "
        "CAST(q_a AS DOUBLE) qa, CAST(n_b AS DOUBLE) nb, "
        "CAST(s_b AS DOUBLE) sb, CAST(q_b AS DOUBLE) qb, n_a, n_b FROM m), "
        "v AS (SELECT *, sa / na AS ma, sb / nb AS mb, "
        "(qa - sa * sa / na) / (na - 1.0) AS va, "
        "(qb - sb * sb / nb) / (nb - 1.0) AS vb FROM d), "
        "w AS (SELECT *, va / na AS ea, vb / nb AS eb FROM v) "
        "SELECT 'BUILDING' AS group_a, 'MACHINERY' AS group_b, "
        "n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b, "
        "round(va, 6) AS var_a, round(vb, 6) AS var_b, "
        "round((ma - mb) / sqrt(ea + eb), 6) AS t_stat, "
        "round((ea + eb) * (ea + eb) / "
        "(ea * ea / (na - 1) + eb * eb / (nb - 1)), 6) AS df_welch FROM w"
)

_MW_SQL = (
    "WITH t AS (SELECT o_totalprice AS v, o_orderpriority AS g "
        "FROM orders WHERE o_totalprice IS NOT NULL "
        "AND o_orderpriority IN ('1-URGENT', '5-LOW')), "
        "d AS (SELECT v, "
        "sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS ca, "
        "sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END) AS cb "
        "FROM t GROUP BY v), "
        # st = EXCLUSIVE prefix tie-count; all rank arithmetic exact in
        # HUGEINT (mirrors Spark's DECIMAL(38,0))
        "c AS (SELECT ca, cb, ca + cb AS tt, "
        "coalesce(sum(ca + cb) OVER (ORDER BY v ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st "
        "FROM d), "
        "a AS (SELECT "
        "sum(cast(ca as hugeint) * (2 * cast(st as hugeint) + tt + 1)) "
        "AS r2, "
        "cast(sum(ca) as double) AS na, cast(sum(cb) as double) AS nb, "
        "cast(sum(cast(tt as hugeint) * tt * tt - tt) as double) AS ties "
        "FROM c), "
        "f AS (SELECT na, nb, "
        "cast(r2 as double) / 2.0 - na * (na + 1) / 2 AS u, "
        "na * nb / 2 AS mu, "
        "sqrt(na * nb / 12 * ((na + nb + 1) "
        "- ties / ((na + nb) * (na + nb - 1)))) AS sg FROM a) "
        "SELECT '1-URGENT' AS group_a, '5-LOW' AS group_b, "
        "cast(na as bigint) AS n_a, cast(nb as bigint) AS n_b, "
        "round(u, 6) AS u_stat, round(mu, 6) AS mu_u, "
        "round(sg, 6) AS sigma_u, round((u - mu) / sg, 6) AS z_score "
        "FROM f"
)

# union schema of the three tests: every column each test emits, NULL-
# typed elsewhere (the part/strategy tagged-union pattern)
_HTEST_COLS = {
    "group_a": "string",
    "group_b": "string",
    "n_a": "bigint",
    "n_b": "bigint",
    "mean_a": "double",
    "mean_b": "double",
    "var_a": "double",
    "var_b": "double",
    "t_stat": "double",
    "df_welch": "double",
    "u_stat": "double",
    "mu_u": "double",
    "sigma_u": "double",
    "z_score": "double",
    "k_groups": "bigint",
    "n_total": "bigint",
    "ss_between": "double",
    "ss_within": "double",
    "df1": "bigint",
    "df2": "bigint",
    "f_stat": "double",
    "rho": "double",
}

_HTEST_DUCK_TYPES = {"string": "varchar", "bigint": "bigint", "double": "double"}


def _spearman_pair_sql(x_expr: str, y_expr: str, ga: str, gb: str) -> str:
    """Exact-integer Spearman SQL mirroring stattests.spearman_corr:
    DOUBLED tie-averaged ranks (2r = 2*rank + t - 1, exact integers)
    summed in HUGEINT (the oracle twin of Spark's DECIMAL(38,0) fold),
    final rho as the identical double expression tree. Window ranks are
    fine oracle-side (DuckDB, bounded fixture); the Spark side uses the
    distributed two-phase prefix scan instead."""
    return (
        f"WITH b AS (SELECT {x_expr} AS x, {y_expr} AS y FROM lineitem "
        f"WHERE ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL), "
        "r AS (SELECT "
        "cast(2*rank() OVER (ORDER BY x) "
        "+ count(*) OVER (PARTITION BY x) - 1 AS hugeint) AS rx, "
        "cast(2*rank() OVER (ORDER BY y) "
        "+ count(*) OVER (PARTITION BY y) - 1 AS hugeint) AS ry "
        "FROM b), "
        "m AS (SELECT cast(count(*) AS hugeint) AS n, "
        "sum(rx) AS sx, sum(ry) AS sy, sum(rx*ry) AS sxy, "
        "sum(rx*rx) AS sxx, sum(ry*ry) AS syy FROM r), "
        "d AS (SELECT cast(n as bigint) AS nb, cast(n as double) AS nd, "
        "cast(sx as double) AS sxd, cast(sy as double) AS syd, "
        "cast(sxy as double) AS sxyd, cast(sxx as double) AS sxxd, "
        "cast(syy as double) AS syyd FROM m) "
        f"SELECT '{ga}' AS group_a, '{gb}' AS group_b, nb AS n_total, "
        "CASE WHEN nd*sxxd - sxd*sxd > 0 AND nd*syyd - syd*syd > 0 "
        "THEN round((nd*sxyd - sxd*syd) / "
        "sqrt((nd*sxxd - sxd*sxd) * (nd*syyd - syd*syd)), 6) END AS rho "
        "FROM d"
    )


_SPEARMAN_SQL = (
    "SELECT * FROM ("
    + _spearman_pair_sql(
        "l_quantity", "l_extendedprice", "l_quantity", "l_extendedprice"
    )
    + ") UNION ALL SELECT * FROM ("
    + _spearman_pair_sql(
        "l_extendedprice",
        "floor(l_extendedprice)",
        "l_extendedprice",
        "floor_price",
    )
    + ")"
)


def _htest_branch_sql(tag: str, inner: str) -> str:
    cols = ", ".join(
        c if c in _HTEST_OWN[tag]
        else f"cast(NULL as {_HTEST_DUCK_TYPES[t]}) AS {c}"
        for c, t in _HTEST_COLS.items()
    )
    return f"SELECT '{tag}' AS test, {cols} FROM ({inner})"


_HTEST_OWN = {
    "welch": {
        "group_a", "group_b", "n_a", "n_b", "mean_a", "mean_b",
        "var_a", "var_b", "t_stat", "df_welch",
    },
    "mannwhitney": {
        "group_a", "group_b", "n_a", "n_b", "u_stat", "mu_u",
        "sigma_u", "z_score",
    },
    "anova": {
        "k_groups", "n_total", "ss_between", "ss_within", "df1",
        "df2", "f_stat",
    },
    "spearman": {"group_a", "group_b", "n_total", "rho"},
}


def _nullfill(df, tag: str, tag_col: str = "test"):
    have = set(df.columns)
    return df.select(
        F.lit(tag).alias(tag_col),
        *[
            (F.col(c) if c in have else F.lit(None).cast(t)).alias(c)
            for c, t in _HTEST_COLS.items()
        ],
    )


@register(
    "profile_ks_test",
    oracle=None,
    note=(
        "extension: two-sample Kolmogorov-Smirnov D between event-type "
        "value distributions — sup|ECDF_a-ECDF_b| as exact integer "
        "arithmetic over the distinct-value table (|cum_a*n_b-cum_b*n_a| "
        "in DECIMAL(38,0), one division at the end), cumulative counts "
        "via the same two-phase prefix scan as mann_whitney. Asymptotic "
        "one-term p-value. Python-reference parity pinned in "
        "tests/test_stattests.py"
    ),
)
def q_profile_ks_test(spark, sf_dir):
    from etl_hero_spark.stattests import ks_2samp

    return ks_2samp(
        _events(spark, sf_dir),
        "value",
        "event_type",
        "click",
        "purchase",
    )


# ===========================================================================
# autocorrelation + PMI collocations
# ===========================================================================


@register(
    "events_acf",
    oracle=None,
    note=(
        "extension: autocorrelation function r_1..r_24 of the hourly "
        "event-count series — the corpus contributes ONE groupBy (the "
        "bucket fold, empty hours densified to 0); the bounded series is "
        "parquet_checkpoint'ed and lags come from explode(sequence)+ "
        "equi-join on t-k, never a global window. Biased 1/n estimator. "
        "Python-reference parity + periodic-fixture peak pinned in "
        "tests/test_acf_pmi.py"
    ),
)
def q_events_acf(spark, sf_dir):
    from etl_hero_spark.timeseries import acf

    return acf(_events(spark, sf_dir), "ts", max_lag=24)


@register(
    "text_pmi_collocations",
    oracle=None,
    note=(
        "extension: top-50 adjacent-token collocations by PMI over the "
        "documents corpus — one corpus pass builds the (persistable) "
        "bigram table, checkpointed for its four consumers; marginals "
        "join back on flat single-token keys; four-ln form (no c_ab*N "
        "overflow); min_count floors the hapax-pair pathology; top-k is "
        "TakeOrderedAndProject. Python-reference parity pinned in "
        "tests/test_acf_pmi.py"
    ),
)
def q_text_pmi_collocations(spark, sf_dir):
    from etl_hero_spark.textops import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_count=5
    )


# ===========================================================================
# Naive Bayes language ID + item-item similarity
# ===========================================================================


@register(
    "ml_nb_language",
    oracle=None,
    note=(
        "extension: multinomial Naive Bayes language ID — train on the "
        "doc_id%5!=0 split of documents (the model IS two aggregation "
        "tables: (label,token) counts + label priors, checkpointed as "
        "the persistable artifact), classify the held-out split with "
        "add-1 smoothing over the dense token x label grid, DECIMAL "
        "log-score sums for an order-independent argmax; returns the "
        "confusion matrix. NOTE the fixture's lang labels are random wrt "
        "its token-soup text, so the matrix is chance-level BY "
        "CONSTRUCTION — the verified semantics are exact-formula "
        "Python-reference parity plus perfect classification of a "
        "separable synthetic corpus, both pinned in "
        "tests/test_classify_itemsim.py"
    ),
)
def q_ml_nb_language(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.classify import nb_confusion, nb_train

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    counts, priors = nb_train(train, "lang", "text")
    counts = parquet_checkpoint(counts, "nb-counts")
    priors = parquet_checkpoint(priors, "nb-priors")
    return nb_confusion(test, counts, priors, "doc_id", "lang", "text")


@register(
    "analytics_item_similarity",
    oracle=None,
    note=(
        "extension: item-item collaborative-filtering neighbors — "
        "top-5 by cosine (Jaccard alongside) over order-basket "
        "co-occurrence of parts; pair table from the capped basket "
        "explode (never all-pairs), degrees via one distinct-count "
        "groupBy + two flat joins, per-item window top-k. Python- "
        "reference parity pinned in tests/test_classify_itemsim.py"
    ),
)
def q_analytics_item_similarity(spark, sf_dir):
    from etl_hero_spark.analytics import item_similarity_topk

    return item_similarity_topk(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey", k=5
    )


# ===========================================================================
# relational analytics: semi/anti joins, scalar subqueries, unpivot
# ===========================================================================


@register(
    "sql_orders_with_returns",
    oracle=(
        "WITH seg AS (SELECT c_mktsegment AS seg, "
        "sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS cnt "
        "FROM customer WHERE c_acctbal > 0 GROUP BY 1) "
        "SELECT 'returns_exists' AS part, o_orderpriority AS key, "
        "cast(count(*) as bigint) AS n, cast(NULL as double) AS total_bal "
        "FROM orders "
        "WHERE EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority "
        "UNION ALL "
        "SELECT 'dormant_rich' AS part, c.c_mktsegment AS key, "
        "cast(count(*) as bigint) AS n, "
        "round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) "
        "AS total_bal "
        "FROM customer c JOIN seg ON seg.seg = c.c_mktsegment "
        "WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * seg.cnt > seg.tot "
        "AND NOT EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c.c_custkey AND o_orderdate >= '2000-01-01') "
        "GROUP BY c.c_mktsegment "
        "UNION ALL "
        "SELECT 'cust_distribution' AS part, "
        "cast(c_count as varchar) AS key, custdist AS n, "
        "cast(NULL as double) AS total_bal FROM ("
        "SELECT c_count, cast(count(*) as bigint) AS custdist FROM ("
        "SELECT c_custkey, count(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders "
        "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey"
        ") GROUP BY c_count)"
    ),
    note=(
        "extension, tagged per part (the customer-order behavior "
        "panel): part='returns_exists' (TPC-H Q4 shape) is the order "
        "count per priority where EXISTS a returned "
        "lineitem — LEFT SEMI join (no fanout however many lines match, "
        "the decorrelated-EXISTS physical form) + one groupBy; the "
        "returnflag filter pushes to the lineitem scan. "
        "part='dormant_rich' (TPC-H Q22 shape; absorbed in r5, was the "
        "separate sql_dormant_rich_customers query) is customers with "
        "above-segment-average positive balance and NO order since "
        "2000-01-01 — broadcast segment-stats join compared "
        "multiply-through (bal * seg_cnt > seg_total, exact decimal), "
        "NOT EXISTS as a LEFT ANTI join with the date filter pushed to "
        "the orders scan. part='cust_distribution' (TPC-H Q13 shape; "
        "absorbed r8, was the separate sql_customer_distribution query "
        "— oracle SQL byte-unchanged inside the wrapper) is the "
        "distribution of orders per customer INCLUDING zero-order "
        "customers: customer LEFT JOIN filtered orders, count the "
        "non-null side, histogram the counts; key = orders-per-"
        "customer bucket, n = customers in it. DuckDB parity for all "
        "three also pinned in tests/test_relational_extras.py — "
        "driver-window slot policy: merge mature tagged entries "
        "instead of registering more"
    ),
)
def q_sql_orders_with_returns(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    ret = (
        orders.join(
            returned,
            orders["o_orderkey"] == returned["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("returns_exists").alias("part"),
            F.col("o_orderpriority").alias("key"),
            "n",
            F.lit(None).cast("double").alias("total_bal"),
        )
    )
    dor = q_sql_dormant_rich_customers(spark, sf_dir).select(
        F.lit("dormant_rich").alias("part"),
        F.col("c_mktsegment").alias("key"),
        F.col("n_customers").alias("n"),
        "total_bal",
    )
    dist = q_sql_customer_distribution(spark, sf_dir).select(
        F.lit("cust_distribution").alias("part"),
        F.col("c_count").cast("string").alias("key"),
        F.col("custdist").alias("n"),
        F.lit(None).cast("double").alias("total_bal"),
    )
    return ret.unionByName(dor).unionByName(dist)


# sql_dormant_rich_customers was absorbed into sql_orders_with_returns
# (part='dormant_rich' tagged rows) in r5 — driver-window slot policy.
# The body stays as an unregistered helper: the merged entry and
# tests/test_relational_extras.py both call it.
def q_sql_dormant_rich_customers(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    seg = (
        cust.filter(F.col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("_tot"),
            F.count(F.lit(1)).alias("_cnt"),
        )
    )
    rich = cust.join(F.broadcast(seg), "c_mktsegment").filter(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("_cnt")
        > F.col("_tot")
    )
    dormant = rich.join(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "sql_top_revenue_suppliers",
    oracle=None,
    note=(
        "extension (TPC-H Q15 shape): suppliers whose 1996 revenue "
        "equals the maximum — revenue CTE is one lineitem groupBy with "
        "exact decimal sums (ties at the max are exact, not float-"
        "lucky), the scalar max is a broadcast single-row join, winners "
        "join supplier for names. DuckDB parity pinned in "
        "tests/test_relational_extras.py"
    ),
)
def q_sql_top_revenue_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,4)")
        ).alias("_rev")
    )
    from etl_hero_spark.checkpoint import parquet_checkpoint

    rev = parquet_checkpoint(rev, "q15-rev")  # max + winners share it
    mx = rev.agg(F.max("_rev").alias("_mx"))
    winners = rev.join(
        F.broadcast(mx), F.col("_rev") == F.col("_mx")
    ).select("l_suppkey", "_rev")
    return (
        winners.join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev").cast("double"), 2).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


# ===========================================================================
# multi-source BFS hop distances
# ===========================================================================


@register(
    "analytics_bfs_hops",
    oracle=None,
    note=(
        "extension: multi-source BFS over the co-purchase graph "
        "(support>=3) from the smallest part id — semi-naive frontier "
        "iteration (edge join against the CURRENT frontier only, "
        "anti-join keeps minimal dist), every frontier behind a "
        "lineage-truncating boundary so the early-exit probe is "
        "metadata-cheap; registered with boundary='local' since r5 "
        "(VERDICT #5: frontier localCheckpoint skips the per-hop "
        "parquet round-trip that dominated the benched cost; edges "
        "stay parquet; local==parquet equality pinned in "
        "tests/test_bfs.py); returns nodes-per-hop counts. "
        "Python-reference BFS parity + planted path/disconnected "
        "fixtures pinned in tests/test_bfs.py"
    ),
)
def q_analytics_bfs_hops(spark, sf_dir):
    from etl_hero_spark.analytics import bfs_distances
    from etl_hero_spark.registry_ext import _copurchase_pairs_memo

    pairs = _copurchase_pairs_memo(spark, sf_dir, min_count=3).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    seeds = pairs.agg(F.min("src").alias("node"))
    dist = bfs_distances(pairs, seeds, max_hops=4, boundary="local")
    return (
        dist.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("dist")
    )


# ===========================================================================
# RFM segmentation + association rules
# ===========================================================================


@register(
    "analytics_rfm_segments",
    oracle=(
        "WITH pk AS (SELECT o_custkey AS key, max(o_orderdate) AS _last, "
        "count(*) AS frequency, "
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) "
        "AS monetary FROM orders WHERE o_orderdate IS NOT NULL "
        "GROUP BY o_custkey), "
        "rfm AS (SELECT key, "
        "date_diff('day', _last, (SELECT max(_last) FROM pk)) "
        "AS recency_days, frequency, monetary FROM pk), "
        # quantile_cuts collapses duplicate cuts to a strictly
        # increasing list; bin(x) = #cuts strictly below x (qcut
        # right-closed semantics, features.with_quantile_bin)
        "c AS (SELECT "
        "list_sort(list_distinct(quantile_cont(recency_days, "
        "[0.2, 0.4, 0.6, 0.8]))) AS rc, "
        "list_sort(list_distinct(quantile_cont(frequency, "
        "[0.2, 0.4, 0.6, 0.8]))) AS fc, "
        "list_sort(list_distinct(quantile_cont(monetary, "
        "[0.2, 0.4, 0.6, 0.8]))) AS mc FROM rfm), "
        "s AS (SELECT "
        "5 - len(list_filter(c.rc, x -> x < recency_days)) AS r_score, "
        "len(list_filter(c.fc, x -> x < frequency)) + 1 AS f_score, "
        "len(list_filter(c.mc, x -> x < monetary)) + 1 AS m_score "
        "FROM rfm, c) "
        "SELECT cast(r_score as varchar) || cast(f_score as varchar) || "
        "cast(m_score as varchar) AS segment, "
        "cast(count(*) as bigint) AS n_customers "
        "FROM s GROUP BY 1 "
        "ORDER BY n_customers DESC, segment ASC LIMIT 25"
    ),
    note=(
        "extension: RFM customer segmentation — one groupBy folds "
        "orders to the per-customer (recency, frequency, monetary) "
        "table (checkpointed: three percentile fits + the apply read "
        "it), exact equal-frequency score cuts become literal "
        "when-chains (features.with_quantile_bin machinery, t-digest "
        "twin via approx=True), recency scores reversed so 555 = best. "
        "Returns per-segment counts (deterministic tie-break: count "
        "desc, segment asc). Promoted into the verified window r5 "
        "(slot freed by the funnel/cohort merge); Python-reference "
        "parity pinned in tests/test_rfm_assoc.py"
    ),
)
def q_analytics_rfm_segments(spark, sf_dir):
    from etl_hero_spark.analytics import rfm_segments

    seg = rfm_segments(
        _t(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        n_bins=5,
    )
    return (
        seg.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("segment"))
        .limit(25)
    )


@register(
    "analytics_assoc_rules",
    oracle=None,
    note=(
        "extension: pairwise association rules a->b with "
        "support/confidence/lift over order baskets — capped-explode "
        "pair counts (checkpointed), flat degree joins, broadcast "
        "basket total, both rule directions (confidence is "
        "asymmetric), one division at the end of exact longs. "
        "Python-reference parity + hand-computed fixture pinned in "
        "tests/test_rfm_assoc.py"
    ),
)
def q_analytics_assoc_rules(spark, sf_dir):
    from etl_hero_spark.analytics import association_rules

    rules = association_rules(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support_count=3,
        min_confidence=0.2,
    )
    return rules.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    ).limit(50)


@register(
    "profile_bootstrap_ci",
    oracle=None,
    note=(
        "extension: Poisson-bootstrap 95% CI for the mean (the "
        "distributed bootstrap — B replicate estimates in ONE pass, no "
        "materialized resamples): per (row, replicate) weight = "
        "inverse-Poisson(1)-CDF of a deterministic uniform — "
        "registered path hashes (id, b) with JVM-native xxhash64 "
        "(r5, VERDICT #6: the B-per-row hash IS the cost; no string "
        "concat/hex/base-16 parse), md5 twin kept as the "
        "cross-language spec with bit-exact hashlib parity in "
        "tests/test_stattests.py (same-semantics pin for both paths "
        "there too); repartition/retry-invariant, truncated at 8; "
        "explode fanout folds map-side so the shuffle carries "
        "O(partitions x B) rows; decimal-exact weighted sums; exact "
        "percentile over the B bounded replicate means"
    ),
)
def q_profile_bootstrap_ci(spark, sf_dir):
    from etl_hero_spark.stattests import bootstrap_ci_mean

    return bootstrap_ci_mean(
        _events(spark, sf_dir), "value", "event_id", n_replicates=200
    )


_ANOVA_SQL = (
    "WITH g AS (SELECT c_mktsegment AS _g, count(x) AS _n, "
        "sum(x) AS _s, sum(CAST(x AS DECIMAL(19,6)) * x) AS _q "
        "FROM (SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,6)) "
        "AS x FROM customer WHERE c_acctbal IS NOT NULL) GROUP BY 1), "
        # the one k-term double sum folds SEQUENTIALLY in group-name
        # order (list_reduce), mirroring Spark's sorted collect_list +
        # aggregate fold — a plain SUM(double) is fold-order-dependent
        "a AS (SELECT cast(count(*) as bigint) AS k_groups, "
        "cast(sum(_n) as bigint) AS n_total, "
        "cast(sum(_s) as double) AS ts, cast(sum(_q) as double) AS tq, "
        "list_reduce(list(cast(_s as double) * cast(_s as double) / "
        "cast(_n as double) ORDER BY cast(_g as varchar) ASC), "
        "(x, y) -> x + y) AS sg, "
        "cast(count(*) as double) AS kd, "
        "cast(sum(_n) as double) AS nd FROM g) "
        "SELECT k_groups, n_total, "
        "round(sg - ts * ts / nd, 6) AS ss_between, "
        "round(tq - sg, 6) AS ss_within, "
        "cast(kd - 1 as bigint) AS df1, cast(nd - kd as bigint) AS df2, "
        "round(((sg - ts * ts / nd) / (kd - 1)) / "
        "((tq - sg) / (nd - kd)), 6) AS f_stat FROM a"
)


@register(
    "profile_welch_ttest",
    oracle=(
        _htest_branch_sql("welch", _WELCH_SQL)
        + " UNION ALL "
        + _htest_branch_sql("mannwhitney", _MW_SQL)
        + " UNION ALL "
        + _htest_branch_sql("anova", _ANOVA_SQL)
        + " UNION ALL "
        + _htest_branch_sql("spearman", _SPEARMAN_SQL)
    ),
    note=(
        "extension, test-tagged union of the hypothesis-test/"
        "correlation panel (formerly the separate profile_welch_ttest "
        "/ profile_mann_whitney / profile_anova_oneway window entries, "
        "merged r6 to free two driver-window slots with zero lost "
        "coverage — each branch's oracle SQL is byte-unchanged, only "
        "NULL-fill columns added). test='welch': unequal-variance t "
        "between two customer segments on acctbal — ONE conditional "
        "multi-agg scan, decimal-exact moments, ddof=1, Welch-"
        "Satterthwaite df. test='mannwhitney': U between two order "
        "priorities on totalprice — distinct-value fold, tie-averaged "
        "ranks via the two-phase distributed prefix scan, 2*R integral "
        "in DECIMAL(38,0) (HUGEINT oracle-side), tie-corrected z. "
        "test='anova': one-way F across all market segments — "
        "SS_between/SS_within from ONE groupBy of exact per-group "
        "moments; the k-term double sum folds sequentially in "
        "group-name order on both engines. test='spearman' (absorbed "
        "r8, was the rows-only profile_spearman query — PROMOTED into "
        "the verified window by the merge): Spearman rank correlation "
        "— Pearson over tie-averaged DOUBLED ranks (exact integer "
        "DECIMAL(38,0) folds, HUGEINT oracle-side; ranks via the "
        "mann_whitney two-phase prefix scan, never a partition-less "
        "window), rho bit-stable under any partitioning; group_a/"
        "group_b carry the column pair — the independent-by-fixture "
        "(quantity, price) pair beside a deterministically monotone "
        "engineered pair (price vs floor(price), ties included) that "
        "must read ~1. Exact-formula Python parity for all four "
        "pinned in tests/test_stattests.py"
    ),
)
def q_profile_welch_ttest(spark, sf_dir):
    from etl_hero_spark.stattests import (
        anova_oneway,
        mann_whitney_u,
        spearman_corr_pairs,
        welch_ttest,
    )

    cust = _t(spark, sf_dir, "customer")
    w = welch_ttest(
        cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
    )
    u = mann_whitney_u(
        _t(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderpriority",
        "1-URGENT",
        "5-LOW",
    )
    a = anova_oneway(cust, "c_acctbal", "c_mktsegment")
    li = _t(spark, sf_dir, "lineitem")
    # Both spearman rows share ONE complete-case base and the price
    # rank table (it is pair 1's y AND pair 2's x): spearman_corr_pairs
    # builds each distinct column's doubled-rank table once and folds
    # both pairs' moments in one aggregation — bit-identical (n, rho)
    # per pair (the lineitem numerics carry no NULLs at any SF, so the
    # per-pair complete-case frames coincide; parity-pinned). The
    # engineered pair keeps the monotone-with-ties floor transform:
    # Spearman must read ~1 where Pearson reads < 1.
    sp = spearman_corr_pairs(
        li.select(
            "l_quantity",
            "l_extendedprice",
            F.floor(F.col("l_extendedprice"))
            .cast("double")
            .alias("_floor_price"),
        ),
        [
            ("l_quantity", "l_extendedprice"),
            ("l_extendedprice", "_floor_price"),
        ],
    )
    s_both = sp.select(
        F.col("col_x").alias("group_a"),
        F.when(F.col("col_y") == "_floor_price", F.lit("floor_price"))
        .otherwise(F.col("col_y"))
        .alias("group_b"),
        F.col("n").alias("n_total"),
        "rho",
    )
    return (
        _nullfill(w, "welch")
        .unionByName(_nullfill(u, "mannwhitney"))
        .unionByName(_nullfill(a, "anova"))
        .unionByName(_nullfill(s_both, "spearman"))
    )


@register(
    "features_woe_encoding",
    oracle=(
        "WITH m AS (SELECT cast(o_orderpriority as varchar) AS category, "
        "(o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem "
        "WHERE l_returnflag = 'R')) AS lab FROM orders), "
        "cats AS (SELECT category, "
        "cast(sum(CASE WHEN lab THEN 1 ELSE 0 END) as bigint) AS n_pos, "
        "cast(sum(CASE WHEN NOT lab THEN 1 ELSE 0 END) as bigint) "
        "AS n_neg FROM m GROUP BY category), "
        "t AS (SELECT cast(sum(n_pos) as double) AS tp, "
        "cast(sum(n_neg) as double) AS tn, "
        "cast(count(*) as double) AS k FROM cats), "
        "w AS (SELECT category, n_pos, n_neg, "
        "(n_pos + 0.5) / (tp + 0.5 * k) AS p_pos, "
        "(n_neg + 0.5) / (tn + 0.5 * k) AS p_neg FROM cats, t) "
        "SELECT category, n_pos, n_neg, "
        "round(ln(p_pos / p_neg), 6) AS woe, "
        "round((p_pos - p_neg) * ln(p_pos / p_neg), 6) AS iv_contrib "
        "FROM w"
    ),
    note=(
        "extension: weight-of-evidence + information-value table for "
        "order priority against the is-returned label (order has a "
        "returned lineitem, via LEFT SEMI) — one conditional groupBy, "
        "broadcast totals, add-s smoothing keeps empty cells finite; "
        "fitted table applies as a plain join (train/serve symmetric). "
        "Every double is a scalar expression over exact counts (the "
        "ln() pairing matches the tfidf precedent at 6dp). Promoted "
        "into the verified window r5 (slot freed by the "
        "sql_dormant_rich merge); Python parity pinned in "
        "tests/test_woe_anova.py"
    ),
)
def q_features_woe_encoding(spark, sf_dir):
    from etl_hero_spark.features import woe_encoding

    orders = _t(spark, sf_dir, "orders")
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    # membership flag via a left join on the distinct returned keys
    marked = orders.join(
        returned.select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("_ret", F.lit(1)),
        "o_orderkey",
        "left",
    ).withColumn("is_returned", F.col("_ret").isNotNull())
    return woe_encoding(marked, "o_orderpriority", "is_returned")


@register(
    "events_holt_forecast",
    oracle=None,
    note=(
        "extension: Holt linear-trend (double exponential) smoothing "
        "per user over event values — the two-state recursive sibling "
        "of events_ewma_smooth, folded JVM-side with F.aggregate over "
        "each key's sorted series (serial per key is inherent; cross-"
        "key distributes, loud series cap); emits level/trend/h-step "
        "forecast per point. Python-loop parity + exact-slope-on-"
        "linear-series + null-carry pinned in "
        "tests/test_timeseries_extra.py"
    ),
)
def q_events_holt_forecast(spark, sf_dir):
    from etl_hero_spark.timeseries import holt_linear

    return holt_linear(
        _events(spark, sf_dir),
        ["user_id"],
        "ts",
        "value",
        alpha=0.3,
        beta=0.1,
        horizon=2,
    )


@register(
    "profile_entropy",
    oracle=None,
    note=(
        "extension: per-column Shannon entropy + 0..1 normalized form "
        "over orders categoricals (NULL is its own category — a "
        "99%-NULL column is low-entropy, exactly the signal) — one "
        "stack-unpivot scan, one (column,value) groupBy, entropy fold "
        "over bounded frequency tables. Python parity + "
        "constant/uniform extremes pinned in tests/test_woe_anova.py"
    ),
)
def q_profile_entropy(spark, sf_dir):
    from etl_hero_spark.profile import column_entropy

    return column_entropy(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority"],
    )


# ===========================================================================
# nullity correlation, class balancing, JSONL quarantine, window ranks
# ===========================================================================


@register(
    "profile_nullity_corr",
    oracle=None,
    note=(
        "extension: missingno-style nullity correlation — which columns "
        "go missing TOGETHER (joint sensor failure vs independent "
        "gaps changes the imputation story); fixture plants a joint "
        "null pattern (price+qty on %97) and an independent one (qty "
        "on %89) so the matrix has real structure. ONE aggregation "
        "pass for all indicator moments (exact integers), one exploded "
        "projection for the pairs; zero-variance pairs emit NULL not "
        "0. Python parity + planted-pattern assertions pinned in "
        "tests/test_nullity_balance.py"
    ),
)
def q_profile_nullity_corr(spark, sf_dir):
    from etl_hero_spark.profile import nullity_correlation

    li = _t(spark, sf_dir, "lineitem")
    fixture = li.select(
        F.when(F.col("l_orderkey") % 97 == 0, None)
        .otherwise(F.col("l_extendedprice"))
        .alias("price_n"),
        F.when(
            (F.col("l_orderkey") % 97 == 0) | (F.col("l_orderkey") % 89 == 0),
            None,
        )
        .otherwise(F.col("l_quantity"))
        .alias("qty_n"),
        F.when(F.col("l_linenumber") % 7 == 0, None)
        .otherwise(F.col("l_discount"))
        .alias("disc_n"),
        F.col("l_tax").alias("tax_full"),  # never NULL: undefined corr
    )
    return nullity_correlation(
        fixture, ["disc_n", "price_n", "qty_n", "tax_full"]
    )


@register(
    "sample_balance_classes",
    oracle=None,
    note=(
        "extension: class rebalancing by deterministic downsampling — "
        "every lang class cut to the minority count in md5(id) hash "
        "order (unbiased, repartition-stable, growth-consistent: "
        "adding docs to one class never changes another's survivors); "
        "returns per-class count + id-sum audit. Exact kept-set Python "
        "parity + growth-consistency pinned in "
        "tests/test_nullity_balance.py"
    ),
)
def q_sample_balance_classes(spark, sf_dir):
    from etl_hero_spark.sampling import balance_classes

    kept = balance_classes(
        _t(spark, sf_dir, "documents"), "lang", "doc_id"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("lang")
    )


@register(
    "quality_quarantine_jsonl",
    oracle=None,
    note=(
        "extension: PERMISSIVE JSON-lines ingest with quarantine — the "
        "CSV posture's twin for the other ubiquitous training-data "
        "format: a deterministic JSONL file is synthesized from "
        "documents (every 13th line truncated mid-object, every 17th "
        "given a wrong-typed field), read back with explicit schema + "
        "corrupt-record column; returns the ingest report + per-defect "
        "counts. Planted-count parity pinned in "
        "tests/test_nullity_balance.py"
    ),
)
def q_quality_quarantine_jsonl(spark, sf_dir):
    from etl_hero_spark.io import csv_ingest_report, read_jsonl_permissive
    from etl_hero_spark.registry_ext2 import _write_jsonl_fixture

    from etl_hero_spark.checkpoint import parquet_checkpoint

    path = _write_jsonl_fixture(spark, sf_dir)
    # the stage boundary both materializes a normal relation (Spark
    # disallows corrupt-column-only queries straight off a raw JSON
    # scan) and serves the report + clean-split consumers one scan
    df = parquet_checkpoint(
        read_jsonl_permissive(
            spark, path, "doc_id bigint, lang string, n_chars bigint"
        ),
        "jsonl-ingest",
    )
    report = csv_ingest_report(df).select(
        F.lit("report").alias("part"),
        F.col("n_rows"),
        F.col("n_corrupt"),
        F.col("corrupt_ratio").cast("string").alias("detail"),
    )
    clean = df.filter(F.col("_corrupt_record").isNull())
    per_lang = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    langs = per_lang.select(
        F.lit("clean_lang").alias("part"),
        F.col("n").alias("n_rows"),
        F.lit(0).cast("bigint").alias("n_corrupt"),
        F.col("lang").alias("detail"),
    )
    return report.unionByName(langs).orderBy("part", "detail")


def _write_jsonl_fixture(spark, sf_dir: str) -> str:
    """Deterministic JSONL with planted defects, memoized per sf_dir in
    the session tmpdir: every 13th line truncated (unparseable), every
    17th line's n_chars a string (type mismatch -> PERMISSIVE nulls the
    field and quarantines the line)."""
    import json
    import os

    from etl_hero_spark.checkpoint import session_tmpdir

    key = ("jsonl_fixture", sf_dir)
    path = _JSONL_MEMO.get(key)
    if path is not None and os.path.exists(path):
        return path
    rows = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    d = session_tmpdir("ehs_jsonl_")
    path = os.path.join(d, "docs.jsonl")
    with open(path, "w") as f:
        for r in rows:
            line = json.dumps(
                {
                    "doc_id": r["doc_id"],
                    "lang": r["lang"],
                    "n_chars": int(r["n_chars"]),
                }
            )
            if r["doc_id"] % 13 == 0:
                line = line[: len(line) // 2]  # truncated mid-object
            elif r["doc_id"] % 17 == 0:
                line = line.replace(
                    f'"n_chars": {int(r["n_chars"])}',
                    f'"n_chars": "{int(r["n_chars"])}"',
                )
            f.write(line + "\n")
    _JSONL_MEMO[key] = path
    return path


_JSONL_MEMO: dict = {}


@register(
    "window_order_percentiles",
    oracle=None,
    note=(
        "extension: per-segment rank analytics over orders — "
        "percent_rank, cume_dist, and ntile(4) of totalprice within "
        "each market segment (broadcast dim join, one segment-"
        "partitioned window, never global); rounded to the 9dp grid. "
        "DuckDB window-function parity pinned in "
        "tests/test_nullity_balance.py"
    ),
)
def q_window_order_percentiles(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = orders.join(F.broadcast(cust), "o_custkey")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return j.select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume_dist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "er_blocking_eval",
    oracle=None,
    note=(
        "extension: blocking-scheme evaluation report — pair "
        "completeness (measured recall vs the fixture's "
        "known-by-construction clone pairs) and reduction ratio "
        "(candidate pairs COUNTED from block sizes, never "
        "materialized) for four candidate keys on the ER customer "
        "fixture, incl. the r3-weak fixed-cardinality seg x nation "
        "key vs the r4 digit-suffix fix — the ANN-recall-report "
        "sibling for ER: blocking recall is measured, not assumed. "
        "Python parity pinned in tests/test_blocking_eval.py"
    ),
)
def q_er_blocking_eval(spark, sf_dir):
    from etl_hero_spark.er import (
        blocking_quality,
        phonetic_block_key_expr,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lower("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("string").alias("nation"),
    )
    dirty = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.expr("concat(substring(name, 1, 8), substring(name, 10, 100))")
        .alias("name"),
        "seg",
        "nation",
    )
    both = cust.unionByName(dirty)
    truth = cust.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + 1_000_000).alias("id_b"),
    )
    digits = F.expr("right(regexp_replace(name, '[^0-9]', ''), 6)")
    schemes = {
        "seg_nation": F.concat_ws("|", "seg", "nation"),
        "seg_nation_digits": F.concat_ws(
            "|", F.col("seg"), F.col("nation"), digits
        ),
        "name_digits": digits,
        "soundex_name": phonetic_block_key_expr("name"),
    }
    return blocking_quality(both, "c_custkey", truth, schemes)


@register(
    "dedup_lsh_recall_report",
    oracle=None,
    note=(
        "extension: MinHash-LSH candidate recall MEASURED against the "
        "exact n-gram Jaccard rung (the oracle-backed ground truth) on "
        "the near-dup fixture — completes the measured-recall trilogy "
        "(ANN recall@k, ER blocking completeness, dedup LSH): per "
        "banding config (b x r), recall of true >=0.8-Jaccard pairs, "
        "candidate count, and the theoretical s-curve hit probability "
        "1-(1-s^r)^b at s=0.8 alongside the measurement. Python "
        "s-curve parity + monotonicity pinned in "
        "tests/test_blocking_eval.py"
    ),
)
def q_dedup_lsh_recall_report(spark, sf_dir):
    from etl_hero_spark.dedup import (
        minhash_lsh_candidates_multi,
        ngram_jaccard_pairs,
    )
    from etl_hero_spark.registry_ext import _docs_nearvar

    import os

    from etl_hero_spark.checkpoint import (
        memo_parquet_checkpoint,
        memo_parquet_get,
    )

    docs = _docs_nearvar(spark, sf_dir)
    fixture_key = (
        sf_dir,
        os.path.getmtime(f"{sf_dir}/documents.parquet"),
    )
    # the exact-Jaccard ground truth, the 32-hash signature table, and
    # the config-tagged candidate table are all build-once artifacts
    # over the immutable fixture (the stored-index posture sim_topk_*
    # uses). VERDICT r10 #3: the three banding configs (8x4, 4x8,
    # 16x2 — all 32 hashes) previously each re-banded and re-joined
    # the shared signature table (3 band builds + 3 self-joins + 6
    # count jobs); they now ride ONE config-tagged band table through
    # ONE self-join (minhash_lsh_candidates_multi — per-config pair
    # sets pinned identical to the per-config form in
    # tests/test_dedup.py), and ONE aggregation emits every config's
    # candidate count and truth-hit count together. Probe-before-build
    # both memos: even CONSTRUCTING the LSH plan costs ~1s, so the
    # warm path must read the stored tables, not rebuild plans.
    tkey = ("lshrecall_truth", fixture_key)
    truth = memo_parquet_get(spark, tkey)
    if truth is None:
        truth = memo_parquet_checkpoint(
            ngram_jaccard_pairs(docs, threshold=0.8).select(
                "id_a", "id_b"
            ),
            tkey,
            "lshrecall-truth",
        )
    n_truth = truth.count()
    configs = [(8, 4), (4, 8), (16, 2)]  # (n_bands, rows_per_band)
    ckey = ("lshrecall_cand_multi", fixture_key, tuple(configs))
    cand = memo_parquet_get(spark, ckey)
    if cand is None:
        cand = memo_parquet_checkpoint(
            minhash_lsh_candidates_multi(
                docs,
                configs,
                n_hashes=32,
                stage_key=("lshrecall", fixture_key),
            ),
            ckey,
            "lshrecall-cand-multi",
        )
    stats = {
        (row["n_bands"], row["rows_per_band"]): (
            int(row["n_cand"]),
            int(row["n_hits"]),
        )
        for row in (
            cand.join(
                truth.withColumn("_hit", F.lit(1)),
                ["id_a", "id_b"],
                "left",
            )
            .groupBy("n_bands", "rows_per_band")
            .agg(
                F.count(F.lit(1)).alias("n_cand"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias(
                    "n_hits"
                ),
            )
            .collect()
        )
    }
    outs = []
    for b, r in configs:
        n_cand, hits = stats.get((b, r), (0, 0))
        s_curve = 1.0 - (1.0 - 0.8 ** r) ** b
        outs.append(
            (f"b{b}_r{r}", b, r, n_cand,
             round(hits / n_truth, 6) if n_truth else None,
             round(s_curve, 6))
        )
    return spark.createDataFrame(
        outs,
        "config string, n_bands int, rows_per_band int, "
        "n_candidates bigint, recall double, s_curve_at_080 double",
    ).orderBy("config")


@register(
    "layout_format_roundtrip",
    oracle=None,
    note=(
        "extension: storage-format round-trip audit — the same "
        "lineitem slice written to parquet, ORC, and JSON-lines, read "
        "back, and content-checksummed (order-independent sum of "
        "xxhash64 over canonicalized rows, wrapped mod 2^63): all "
        "three formats must carry identical content (pinned in the "
        "output itself via the all_match flag and in "
        "tests/test_blocking_eval.py), with rows and on-disk bytes per "
        "format alongside — the compression/fidelity tradeoff table a "
        "format decision needs"
    ),
)
def q_layout_format_roundtrip(spark, sf_dir):
    import os

    from etl_hero_spark.checkpoint import session_tmpdir

    slice_df = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 11 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_returnflag",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_s"),
        )
    )

    def checksum(df):
        # canonicalize: fixed column order, string-rendered decimals so
        # JSON (which round-trips doubles, not decimals) hashes the same
        canon = df.select(
            F.xxhash64(
                F.col("l_orderkey").cast("long"),
                F.col("l_linenumber").cast("long"),
                F.format_number(F.col("l_quantity").cast("double"), 2),
                F.format_number(
                    F.col("l_extendedprice").cast("double"), 2
                ),
                F.col("l_returnflag"),
                F.col("ship_s"),
            ).alias("h")
        )
        row = canon.agg(
            F.sum(F.col("h") % F.lit(2**31)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return int(row["s"]) % (2**63), int(row["n"])

    base = session_tmpdir("ehs_fmt_")
    schema = (
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_extendedprice double, l_returnflag string, ship_s string"
    )
    results = []
    for fmt in ("parquet", "orc", "json"):
        path = os.path.join(base, fmt)
        slice_df.write.mode("overwrite").format(fmt).save(path)
        reader = spark.read.schema(schema) if fmt == "json" else spark.read
        back = reader.format(fmt).load(path)
        cs, n = checksum(back)
        nbytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
        results.append((fmt, n, cs, nbytes > 0))
    checks = {cs for _, _, cs, _ in results}
    return spark.createDataFrame(
        [
            (fmt, n, cs, has_bytes, len(checks) == 1)
            for fmt, n, cs, has_bytes in results
        ],
        "format string, n_rows bigint, checksum bigint, "
        "has_bytes boolean, all_match boolean",
    ).orderBy("format")


# ===========================================================================
# round-5 wave: DSIR data selection, linear gap-fill, MP4 triage
# ===========================================================================


@register(
    "text_dsir_weights",
    oracle=None,
    note=(
        "extension (r5): DSIR importance weights (Xie et al. 2023, "
        "arXiv:2302.03169) — log p_target/p_raw of each document under "
        "hashed unigram+bigram bag models (md5 buckets, reproducible "
        "outside the JVM), target = the src0 domain of the documents "
        "fixture. Fit is ONE conditional groupBy to a bounded "
        "n_buckets-row table broadcast back; per-doc sums are "
        "decimal-exact over 12dp-rounded log-ratios, so weights are "
        "bit-stable under any partitioning. hashlib/math Python "
        "parity + planted-vocabulary ordering pinned in "
        "tests/test_dsir.py. Top 25 by weight"
    ),
)
def q_text_dsir_weights(spark, sf_dir):
    from etl_hero_spark.dsir import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    out = dsir_log_weights(
        docs, F.col("source") == "src0", n_buckets=1024
    )
    return (
        out.select(
            "doc_id", "source", "is_target", "n_features", "log_weight"
        )
        .orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(25)
    )


@register(
    "sample_dsir_resample",
    oracle=None,
    note=(
        "extension (r5): Gumbel-top-k importance resampling over the "
        "DSIR weights — sampling WITHOUT replacement with probability "
        "proportional to exp(log_weight/temperature), via key = "
        "logw/T + Gumbel(md5 uniform): deterministic, repartition/"
        "retry-invariant, and a distributed TakeOrdered (bounded "
        "budget rows to the driver merge, never a global sort). "
        "Per-source summary of the selected set; target-domain "
        "enrichment + determinism pinned in tests/test_dsir.py"
    ),
)
def q_sample_dsir_resample(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.dsir import dsir_log_weights, dsir_resample

    docs = _t(spark, sf_dir, "documents")
    weighted = parquet_checkpoint(
        dsir_log_weights(
            docs, F.col("source") == "src0", n_buckets=1024
        ).select("doc_id", "source", "is_target", "log_weight"),
        "dsir-weighted",
    )
    picked = dsir_resample(weighted, budget=200, temperature=1.0)
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum(F.col("is_target").cast("int")).cast("bigint").alias(
                "n_target"
            ),
            F.round(
                F.sum(F.col("log_weight").cast("decimal(28,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_log_weight"),
        )
        .orderBy("source")
    )


@register(
    "sample_dsir_kl_report",
    oracle=None,
    note=(
        "extension (r6, VERDICT r5 #7): DSIR selection-quality report — "
        "the paper measures selection by target-domain KL reduction, so "
        "this reports KL(target || raw pool) vs KL(target || selected) "
        "over the same add-alpha-smoothed hashed-n-gram bucket models "
        "the fit uses (full n_buckets support: unoccupied buckets' "
        "smoothed mass enters as one closed-form term), kl_reduction "
        "> 0 == the Gumbel-top-k resample moved the pool toward the "
        "target — the measured-recall posture: selection quality "
        "measured, not assumed. ONE checkpointed feature pass feeds "
        "both the weight fit and the evaluation counts; the selected-id "
        "set is budget-bounded and broadcast; all three distributions "
        "come from one bounded n_buckets groupBy; KL terms fold "
        "12dp-rounded into DECIMAL(38,18) (the k-term double-sum "
        "gotcha). Python-reference parity + enrichment direction "
        "pinned in tests/test_dsir.py"
    ),
)
def q_sample_dsir_kl_report(spark, sf_dir):
    from etl_hero_spark.dsir import dsir_kl_report

    docs = _t(spark, sf_dir, "documents")
    return dsir_kl_report(
        docs,
        F.col("source") == "src0",
        budget=200,
        n_buckets=1024,
    )


# identical interpolation expression order to temporal.
# resample_interpolate: pv + (nv-pv) * (double(t-pt)/double(nt-pt))
# — every factor exact integer micros or a raw stored double, so
# the IEEE result is bit-identical cross-engine. Absorbed r8 into
# events_windows (kind='gap_fill_daily' tagged rows, this SQL
# byte-unchanged inside the wrapper) — driver-window slot policy.
_GAPFILL_SQL = (
        "WITH o AS (SELECT user_id, "
        "epoch_us(cast(ts as timestamp)) AS t, "
        "max(CAST(value AS DOUBLE)) AS v FROM events "
        "WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2), "
        "b AS (SELECT user_id, "
        "cast(floor(min(t) / 3600000000) as bigint) * 3600000000 AS lo, "
        "max(t) AS hi FROM o GROUP BY 1), "
        "g AS (SELECT user_id, "
        "unnest(range(lo, hi + 1, 3600000000)) AS gt FROM b), "
        "p AS (SELECT g.user_id, g.gt, o.t AS pt, o.v AS pv "
        "FROM g ASOF LEFT JOIN o "
        "ON g.user_id = o.user_id AND g.gt >= o.t), "
        "nx AS (SELECT p.user_id, p.gt, p.pt, p.pv, o.t AS nt, o.v AS nv "
        "FROM p ASOF LEFT JOIN o "
        "ON p.user_id = o.user_id AND p.gt <= o.t), "
        "iv AS (SELECT user_id, gt, "
        "CASE WHEN pt IS NULL OR nt IS NULL THEN pv "
        "WHEN nt = pt THEN pv "
        "ELSE pv + (nv - pv) * "
        "(CAST(gt - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END "
        "AS value FROM nx) "
        "SELECT strftime(make_timestamp(gt), '%Y-%m-%d') AS day, "
        "cast(count(*) as bigint) AS n_points, "
        "cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) as bigint) "
        "AS n_leading_null, "
        "round(CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(28,6))) "
        "AS DOUBLE), 4) AS sum_value "
        "FROM iv GROUP BY 1"
)


# events_gap_fill_linear (r5; linear-interpolation resample — the
# continuous-signal sibling of events_resample_hourly's LOCF) was
# absorbed into events_windows (kind='gap_fill_daily' tagged rows) in
# r8 — driver-window slot policy. The body stays as an unregistered
# helper: the merged windowed-metrics panel calls it; hand-grid /
# Python-reference fixtures stay in tests/test_temporal.py.
def q_events_gap_fill_linear(spark, sf_dir):
    from etl_hero_spark.temporal import resample_interpolate

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    grid = resample_interpolate(
        ev, "user_id", "ts", "value", step_seconds=3600
    )
    return (
        grid.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("value").isNull().cast("int")).cast("bigint")
            .alias("n_leading_null"),
            F.round(
                F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast(
                    "decimal(28,6)"
                )).cast("double"),
                4,
            ).alias("sum_value"),
        )
        .orderBy("day")
    )


@register(
    "multimodal_mp4_metadata",
    oracle=None,
    note=(
        "extension (r5): zero-codec MP4/ISO-BMFF triage — completes "
        "the image/audio/VIDEO ladder (jpeg/png/wav siblings): two "
        "bounded unrolled box walks (top-level -> moov; moov children "
        "-> mvhd + trak count) parse brand, timescale, duration "
        "(version 0 AND 1 field layouts), track count as pure "
        "dynamic-offset binary expressions — no Python, no shuffle, "
        "largesize/to-EOF boxes stop the walk -> NULL -> route to a "
        "real demuxer. Headers synthesized per row from spec bytes "
        "(key-derived duration/timescale/track count; every 5th row "
        "WAV magic -> is_mp4=0); planted-arithmetic parity + spec "
        "fixtures in tests/test_io_pipeline.py"
    ),
)
def q_multimodal_mp4_metadata(spark, sf_dir):
    from etl_hero_spark.multimodal import mp4_metadata
    from etl_hero_spark.skew import ensure_min_partitions

    # the part fixture is ONE file: spread it or the unrolled box walk
    # runs on a single task (the expression-heavy-scan gotcha)
    part = ensure_min_partitions(
        _t(spark, sf_dir, "part").select("p_partkey")
    )
    ts_h = "lpad(hex(pmod(p_partkey, 9) + 1), 8, '0')"          # timescale 1..9
    dur_h = "lpad(hex(pmod(p_partkey * 3, 1000) + 10), 8, '0')"  # duration
    # one or two trak stubs (8-byte empty boxes) by key parity
    trak = "'000000087472616B'"
    traks = (
        f"CASE WHEN p_partkey % 2 = 0 THEN concat({trak}, {trak}) "
        f"ELSE {trak} END"
    )
    # moov = 8 header + 108 mvhd + 8 per trak stub
    moov_size = "CASE WHEN p_partkey % 2 = 0 THEN 132 ELSE 124 END"
    hdr = (
        "unhex(concat("
        "'00000010', '66747970', '69736F6D', '00000200', "  # ftyp isom
        "'00000008', '66726565', "  # free box
        f"lpad(hex({moov_size}), 8, '0'), '6D6F6F76', "  # moov
        "'0000006C', '6D766864', '00', '000000', "  # mvhd v0 len 108
        "'00000000', '00000000', "  # ctime mtime
        f"{ts_h}, {dur_h}, "
        "repeat('00', 80), "  # rate/volume/matrix/predefined/next_track
        f"{traks}"
        "))"
    )
    media = part.withColumn(
        "media",
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.expr("unhex('52494646')"),  # RIFF magic: not an MP4
        ).otherwise(F.expr(hdr)),
    )
    return mp4_metadata(media).select(
        "p_partkey",
        "is_mp4",
        "mp4_brand",
        "mp4_timescale",
        "mp4_duration_s",
        "mp4_n_tracks",
    )


@register(
    "multimodal_gif_webp_metadata",
    oracle=None,
    note=(
        "extension (r6): zero-codec GIF + WebP dimension triage — "
        "extends the image ladder (png/jpeg siblings) with the two "
        "remaining dominant web formats. GIF's logical screen "
        "descriptor is fixed-offset little-endian; WebP is a RIFF "
        "container whose first chunk fourcc selects one of THREE "
        "layouts (VP8 lossy sync-coded 14-bit dims, VP8L packed "
        "bitfield, VP8X 24-bit canvas) — all pure binary expressions, "
        "no Python, no shuffle. Headers synthesized per row from spec "
        "bytes (key-derived dims; every 5th row JPEG magic -> neither "
        "format). Spec-fixture parses incl. bad-sync and "
        "unknown-chunk routing pinned in tests/test_io_pipeline.py"
    ),
)
def q_multimodal_gif_webp_metadata(spark, sf_dir):
    from etl_hero_spark.multimodal import (
        gif_metadata,
        synth_gif_webp_media,
        webp_metadata,
    )
    from etl_hero_spark.skew import ensure_min_partitions

    part = ensure_min_partitions(
        _t(spark, sf_dir, "part").select("p_partkey")
    )
    # key-derived synthesis SHARED with the streaming triage twin
    # (stream_media_triage) — stream == batch is a statement about one
    # expression, not two
    media = part.withColumn("media", synth_gif_webp_media("p_partkey"))
    return webp_metadata(gif_metadata(media)).select(
        "p_partkey",
        "is_gif",
        "gif_width",
        "gif_height",
        "is_webp",
        "webp_format",
        "webp_width",
        "webp_height",
    )


@register(
    "multimodal_triage_routed",
    oracle=None,
    note=(
        "extension (r6, VERDICT r5 #9): triage-routing observability — "
        "the jpeg/mp4 walks deliberately stop at progressive-boundary/"
        "largesize/to-EOF structures and emit NULL ('route to a real "
        "demuxer'); at corpus scale that NULL path must be COUNTED, "
        "not silent. One summary row per format: n_rows, n_format "
        "(magic matched), n_parsed (metadata extracted), n_routed "
        "(format recognized but walk stopped -> the real-decoder "
        "queue), n_foreign (other magic). Reuses the registered triage "
        "fixtures and unions planted boundary rows that MUST route "
        "(SOS-before-SOF + truncated-SOF JPEGs; largesize + to-EOF "
        "MP4 boxes), so a parser change that silently starts "
        "swallowing boundary structures flips a pinned count. "
        "Identity n_format == n_parsed + n_routed pinned in "
        "tests/test_io_pipeline.py"
    ),
)
def q_multimodal_triage_routed(spark, sf_dir):
    from etl_hero_spark.multimodal import jpeg_metadata, mp4_metadata
    from etl_hero_spark.registry_ext import (
        q_multimodal_jpeg_metadata,
        q_multimodal_png_metadata,
    )

    # planted boundary payloads, built driver-side from spec bytes:
    # two JPEGs that must route (SOS before any SOF; truncation inside
    # the segment walk) and two MP4s that must route (largesize box;
    # to-EOF box)
    jpeg_boundary = spark.createDataFrame(
        [
            (
                1_000_000_001,
                bytes.fromhex(
                    "FFD8"
                    "FFE000104A46494600010100000100010000"
                    "FFDA0008000000000000"  # SOS first -> route
                ),
            ),
            (
                1_000_000_002,
                bytes.fromhex("FFD8FFE00010"),  # truncated mid-APP0
            ),
        ],
        "p_partkey long, media binary",
    )
    mp4_boundary = spark.createDataFrame(
        [
            (
                1_000_000_001,
                bytes.fromhex(
                    "00000001"  # size==1 -> 64-bit largesize follows
                    "66747970" "69736F6D" "00000200"
                    "0000000000000018"
                ),
            ),
            (
                1_000_000_002,
                bytes.fromhex(
                    "00000010" "66747970" "69736F6D" "00000200"
                    "00000000" "6D6F6F76"  # size==0: to-EOF moov
                ),
            ),
        ],
        "p_partkey long, media binary",
    )
    jpeg = q_multimodal_jpeg_metadata(spark, sf_dir).unionByName(
        jpeg_metadata(jpeg_boundary, max_segments=12).select(
            "p_partkey", "is_jpeg", "jpeg_sof", "jpeg_width",
            "jpeg_height", "jpeg_components",
        )
    )
    mp4 = q_multimodal_mp4_metadata(spark, sf_dir).unionByName(
        mp4_metadata(mp4_boundary).select(
            "p_partkey", "is_mp4", "mp4_brand", "mp4_timescale",
            "mp4_duration_s", "mp4_n_tracks",
        )
    )
    png = q_multimodal_png_metadata(spark, sf_dir)

    def summary(df, fmt: str, is_col: str, parsed_col: str):
        is_fmt = F.col(is_col) == 1
        parsed = is_fmt & F.col(parsed_col).isNotNull()
        routed = is_fmt & F.col(parsed_col).isNull()
        return df.agg(
            F.lit(fmt).alias("format"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_fmt.cast("int")).cast("bigint").alias("n_format"),
            F.sum(parsed.cast("int")).cast("bigint").alias("n_parsed"),
            F.sum(routed.cast("int")).cast("bigint").alias("n_routed"),
            F.sum((~is_fmt).cast("int")).cast("bigint").alias(
                "n_foreign"
            ),
        )
    return (
        summary(jpeg, "jpeg", "is_jpeg", "jpeg_width")
        .unionByName(summary(mp4, "mp4", "is_mp4", "mp4_timescale"))
        .unionByName(summary(png, "png", "is_png", "png_width"))
        .orderBy("format")
    )


# dedup_keep_best was absorbed into dedup_clusters (tag='keep_best'
# row, oracle SQL byte-unchanged inside the wrapper — the string below
# is the source of truth; registry_ext.py carries a byte-identical
# copy pinned equal in tests/test_registry_order.py) in r9 — driver-
# window slot policy, freeing the slot pipeline_quality_serve takes.
# The body stays as an unregistered helper the merged entry calls.
DEDUP_KEEP_BEST_SQL = (
    "WITH pool AS (SELECT doc_id, text FROM documents "
    "UNION ALL "
    "SELECT doc_id + 1000000, upper(text) FROM documents "
    "WHERE doc_id % 9 = 0), "
    "q AS (SELECT doc_id, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp, "
    "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)"
    " / greatest(length(text), 1) AS qual FROM pool), "
    "kept AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER "
    "(PARTITION BY fp ORDER BY qual DESC, doc_id ASC) AS rn FROM q) "
    "WHERE rn = 1) "
    "SELECT cast(count(*) as bigint) AS n_kept, "
    "cast(sum(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END) "
    "as bigint) AS n_clone_survivors, "
    "cast(sum(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END) "
    "as bigint) AS n_variant_group_survivors FROM kept"
)


def q_dedup_keep_best(spark, sf_dir):
    from etl_hero_spark.dedup import dedup_keep_best

    d = _t(spark, sf_dir, "documents")
    clones = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.upper("text").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    pool = d.unionByName(clones)
    # quality: share of lowercase letters — originals beat the
    # uppercased clones, identical for unrelated docs
    quality = (
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    kept = dedup_keep_best(pool, quality, "doc_id", "text")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("doc_id") >= 1_000_000).cast("int"))
        .cast("bigint")
        .alias("n_clone_survivors"),
        F.sum((F.col("doc_id") % 9 == 0).cast("int"))
        .cast("bigint")
        .alias("n_variant_group_survivors"),
    )


_SPAN_SQL_NORM = "lower(trim(regexp_replace({c}, '\\s+', ' ', 'g')))"
_SPAN_SQL_TOKS = (
    "CASE WHEN length(trim({c})) = 0 THEN [] "
    "ELSE string_split_regex(trim({c}), '\\s+') END"
)
_SPAN_TOKS_OF_TEXT = _SPAN_SQL_TOKS.format(
    c=_SPAN_SQL_NORM.format(c="text")
)


@register(
    "dedup_repeated_spans",
    oracle=(
        # full DuckDB replica of the positional-window span detection:
        # same clone pool, same 0-based positions, same >=2 corpus
        # count, same gaps-and-islands merge (touching = pos <= prev+n)
        "WITH frag AS (SELECT array_to_string(list_slice("
        f"{_SPAN_TOKS_OF_TEXT}, 1, 24), ' ') AS f "
        "FROM documents WHERE doc_id = 1), "
        "pool AS (SELECT doc_id, text FROM documents "
        "UNION ALL "
        "SELECT doc_id + 3000000 AS doc_id, "
        "concat_ws(' ', text, (SELECT f FROM frag)) AS text "
        "FROM documents WHERE doc_id % 7 = 3), "
        f"tok AS (SELECT doc_id, {_SPAN_TOKS_OF_TEXT} AS toks "
        "FROM pool), "
        "wi AS (SELECT doc_id, toks, unnest(generate_series(1, "
        "greatest(len(toks) - 7, 0))) AS i FROM tok), "
        "w AS (SELECT doc_id, i - 1 AS pos, concat_ws(' ', "
        "toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4], "
        "toks[i+5], toks[i+6], toks[i+7]) AS gram FROM wi), "
        "dk AS (SELECT gram FROM w GROUP BY gram "
        "HAVING count(*) >= 2), "
        "d AS (SELECT doc_id, pos FROM w JOIN dk USING (gram)), "
        "nb AS (SELECT doc_id, pos, CASE WHEN "
        "lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
        "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
        "THEN 1 ELSE 0 END AS newisl FROM d), "
        "s AS (SELECT doc_id, pos, sum(newisl) OVER ("
        "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) "
        "AS isl FROM nb), "
        "sp AS (SELECT doc_id, min(pos) AS st, max(pos) + 8 AS en "
        "FROM s GROUP BY doc_id, isl) "
        "SELECT cast(count(*) as bigint) AS n_spans, "
        "cast(count(DISTINCT doc_id) as bigint) AS n_docs_with_spans, "
        "cast(sum(en - st) as bigint) AS total_span_tokens, "
        "cast(max(en - st) as bigint) AS max_span_tokens, "
        "cast(sum(CASE WHEN doc_id >= 3000000 THEN 1 ELSE 0 END) "
        "as bigint) AS n_spans_in_clones "
        "FROM sp"
    ),
    note=(
        "extension (r6; PROMOTED to the verified oracle window r7 — "
        "slots freed by the r7 absorptions; the oracle replays the "
        "whole pipeline in DuckDB SQL: window grams by position, "
        "corpus count >= 2, gaps-and-islands merge): repeated-span "
        "(substring) dedup — the "
        "distributed re-expression of suffix-array substring "
        "deduplication (Lee et al. 2022, arXiv:2107.06499): any "
        "8-token window occurring >=2 times in the corpus marks "
        "duplicated text; overlapping windows merge to maximal spans "
        "via per-doc gaps-and-islands. All linear: ONE positional "
        "window-hash pass (lead window, uniform keys, checkpointed), "
        "ONE corpus-wide count groupBy, one id-keyed island window — "
        "no suffix array, no quadratic path. Fixture plants a 24-token "
        "fragment of doc 1 at the tail of every doc_id%7==3 clone so "
        "cross-doc spans exist to find; exact span boundaries, "
        "intra-doc repeats, and the strip remediation "
        "(strip_repeated_spans: order-preserving relational rebuild, "
        "no interpreted per-token lambda) pinned in "
        "tests/test_dedup.py. Summary row"
    ),
)
def q_dedup_repeated_spans(spark, sf_dir):
    from etl_hero_spark.dedup import repeated_spans
    from etl_hero_spark.textops import normalized_text_expr, tokens_expr

    d = _t(spark, sf_dir, "documents")
    frag = d.filter(F.col("doc_id") == 1).select(
        F.array_join(
            F.slice(tokens_expr(normalized_text_expr("text")), 1, 24),
            " ",
        ).alias("_frag")
    )
    clones = (
        d.filter(F.col("doc_id") % 7 == 3)
        .crossJoin(F.broadcast(frag))
        .select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.col("_frag")).alias(
                "text"
            ),
        )
    )
    pool = d.select("doc_id", "text").unionByName(clones)
    spans = repeated_spans(pool, n=8)
    return spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("doc_id").cast("bigint").alias(
            "n_docs_with_spans"
        ),
        F.sum("span_tokens").cast("bigint").alias("total_span_tokens"),
        F.max("span_tokens").cast("bigint").alias("max_span_tokens"),
        F.sum(
            F.when(F.col("doc_id") >= 3_000_000, 1).otherwise(0)
        ).cast("bigint").alias("n_spans_in_clones"),
    )


# profile_weighted_quantile was absorbed into profile_stats (its five
# columns appended to the one-row stats panel via a 1x1 cross join,
# oracle SQL byte-unchanged inside the wrapper) in r8 — driver-window
# slot policy. The body stays as an unregistered helper the merged
# panel calls; window-replication parity stays in
# tests/test_stattests.py.


def q_profile_weighted_quantile(spark, sf_dir):
    from etl_hero_spark.stattests import weighted_quantile

    return weighted_quantile(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        ps=[0.25, 0.5, 0.9],
    )


@register(
    "sim_hybrid_rrf",
    oracle=None,
    note=(
        "extension (r5): hybrid retrieval — reciprocal-rank fusion "
        "(Cormack et al. 2009) of a BM25 lexical list and a dense "
        "cosine list for one query: fused = sum 1/(60+rank), rank-"
        "based so the incomparable score scales never need "
        "calibration. The corpus-scale work stays in the two rungs "
        "(bm25_query_scores TakeOrdered; topk_cosine broadcast-probe); "
        "fusion is bounded-list arithmetic with ranks from a broadcast "
        "self-join (no partition-less window). Python parity + "
        "membership properties in tests/test_simsearch.py"
    ),
)
def q_sim_hybrid_rrf(spark, sf_dir):
    from etl_hero_spark.simsearch import rank_bounded, rrf_fuse, topk_cosine
    from etl_hero_spark.textops import bm25_query_scores

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = rank_bounded(
        bm25_query_scores(
            docs, ["spark", "table", "window"], top_n=50
        ),
        "score",
        "id",
    ).withColumnRenamed("id", "doc_id")
    dense = topk_cosine(
        emb,
        emb.filter(F.col("vec_id") == 7).select("vec_id", "embedding"),
        k=50,
        query_id_col="vec_id",
    ).withColumnRenamed("corpus_id", "doc_id")
    return rrf_fuse(lex, dense, id_col="doc_id", k=10)


_Q8_SQL = (
        "WITH j AS (SELECT year(o_orderdate) AS o_year, n.n_name, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"
        " AS vol "
        "FROM orders o "
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'AMERICA' "
        "AND o.o_orderdate >= '1995-01-01' "
        "AND o.o_orderdate < '1997-01-01') "
        "SELECT o_year, "
        "round(CAST(sum(CASE WHEN n_name = 'NATION_1' THEN vol "
        "ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE), 2) "
        "AS focal_revenue, "
        "round(CAST(sum(vol) AS DOUBLE), 2) AS region_revenue, "
        "round(CAST(sum(CASE WHEN n_name = 'NATION_1' THEN vol "
        "ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE) "
        "/ CAST(sum(vol) AS DOUBLE), 6) AS mkt_share "
        "FROM j GROUP BY o_year"
)

_Q7_SQL = (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "year(l_shipdate) AS l_year, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "- CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS revenue "
        "FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01' "
        "AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19') "
        "OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')) "
        "GROUP BY 1, 2, 3"
)


@register(
    "sql_market_share",
    oracle=(
        "SELECT 'market_share' AS part, "
        "cast(NULL as varchar) AS supp_nation, "
        "cast(NULL as varchar) AS cust_nation, o_year AS yr, "
        "focal_revenue AS revenue, region_revenue, mkt_share "
        f"FROM ({_Q8_SQL}) "
        "UNION ALL "
        "SELECT 'volume_shipping' AS part, supp_nation, cust_nation, "
        "l_year AS yr, revenue, cast(NULL as double) AS region_revenue, "
        "cast(NULL as double) AS mkt_share "
        f"FROM ({_Q7_SQL})"
    ),
    note=(
        "extension, tagged per part (the international trade panel). "
        "part='market_share' (r5, TPC-H Q8 shape): one focal nation's (NATION_1) share of its "
        "region's yearly gross revenue over the Q8 two-year window "
        "(1995-1996) — five-table join (region -> nation -> customer -> "
        "orders -> lineitem) with the region filter and the date range "
        "pushed to their scans (the date predicate reaches the orders "
        "parquet scan, so at 100 TB the fact read is two years, not "
        "all of them — pinned in tests/test_plans.py), dimension side "
        "broadcast, decimal-exact revenue sums, share = one IEEE "
        "divide per year row; revenue carries the focal nation's "
        "revenue. part='volume_shipping' (r6, TPC-H Q7 shape; absorbed "
        "r8, was the separate sql_volume_shipping query — oracle SQL "
        "byte-unchanged inside the wrapper): bilateral shipping volume "
        "between two nations by year — supplier nation x customer "
        "nation resolved through two BROADCAST probes of the same "
        "25-row nation dim, the (n1,n2)|(n2,n1) pair filter applied to "
        "the broadcast side, l_shipdate two-year range pushed to the "
        "lineitem scan, decimal-exact volume. DuckDB parity for both "
        "in tests/test_relational_extras.py — driver-window slot "
        "policy: merge mature tagged entries instead of registering "
        "more"
    ),
)
def q_sql_market_share(spark, sf_dir):
    share = q_sql_market_share_inner(spark, sf_dir).select(
        F.lit("market_share").alias("part"),
        F.lit(None).cast("string").alias("supp_nation"),
        F.lit(None).cast("string").alias("cust_nation"),
        F.col("o_year").alias("yr"),
        F.col("focal_revenue").alias("revenue"),
        "region_revenue",
        "mkt_share",
    )
    vol = q_sql_volume_shipping(spark, sf_dir).select(
        F.lit("volume_shipping").alias("part"),
        "supp_nation",
        "cust_nation",
        F.col("l_year").alias("yr"),
        "revenue",
        F.lit(None).cast("double").alias("region_revenue"),
        F.lit(None).cast("double").alias("mkt_share"),
    )
    return share.unionByName(vol)


# the Q8 body stays as an unregistered helper: the merged trade panel
# and tests/test_relational_extras.py both call it
def q_sql_market_share_inner(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    dim = (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("n_nationkey", "n_name")
    )
    joined = (
        orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        )
        .join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(dim),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("n_name"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,6)")
                    - F.col("l_discount").cast("decimal(18,6)")
                )
            ).alias("_vol"),
        )
    )
    per_year = joined.groupBy("o_year").agg(
        F.sum("_vol").alias("_tot"),
        F.sum(
            F.when(F.col("n_name") == "NATION_1", F.col("_vol")).otherwise(
                F.lit(0).cast("decimal(38,8)")
            )
        ).alias("_focal"),
    )
    return per_year.select(
        "o_year",
        F.round(F.col("_focal").cast("double"), 2).alias("focal_revenue"),
        F.round(F.col("_tot").cast("double"), 2).alias("region_revenue"),
        F.round(
            F.col("_focal").cast("double") / F.col("_tot").cast("double"),
            6,
        ).alias("mkt_share"),
    ).orderBy("o_year")


@register(
    "features_isotonic_calibration",
    oracle=None,
    note=(
        "extension (r5): isotonic probability calibration (PAV, "
        "sklearn IsotonicRegression semantics) of the is-returned "
        "label on a quantized order-value score — the honest "
        "distributed shape for an inherently sequential fit (the "
        "BPE/k-means posture): corpus contributes ONE groupBy to the "
        "bounded distinct-score table (loud CalibrationCapError past "
        "max_distinct, never a silent sample); the driver-side PAV "
        "fold is exact integer arithmetic, one divide per pool at the "
        "end. Returns the monotone fitted step table (train/serve "
        "symmetric via range join). Python-PAV parity + monotonicity "
        "in tests/test_features.py"
    ),
)
def q_features_isotonic_calibration(spark, sf_dir):
    from etl_hero_spark.features import isotonic_calibration

    orders = _t(spark, sf_dir, "orders")
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("_ret", F.lit(1))
    )
    marked = orders.join(returned, "o_orderkey", "left").select(
        F.round(F.col("o_totalprice") / 1000, 0).alias("score"),
        F.col("_ret").isNotNull().alias("is_returned"),
    )
    return isotonic_calibration(
        marked, "score", "is_returned", max_distinct=10_000
    ).orderBy("pool_id")


@register(
    "pipeline_dsir_curate",
    oracle=None,
    note=(
        "extension (r5): targeted-curation capstone — the DSIR recipe "
        "end to end: importance weights against the src0 target domain "
        "(bounded hashed-ngram models), Gumbel-top-k resample to a "
        "token budget's worth of documents, exact-8-gram benchmark "
        "decontamination of the SELECTED set only (decontaminating "
        "after selection touches budget-many docs, not the corpus), "
        "token-count summary per source. Each stage is its own tested "
        "operator (dsir.py, dedup.py); this query pins the composition "
        "+ the stage boundaries between them (weighted table feeds the "
        "resampler AND the final join; checkpointed once). Stage "
        "counts reported so a drop is attributable"
    ),
)
def q_pipeline_dsir_curate(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.dedup import flag_benchmark_contamination
    from etl_hero_spark.dsir import dsir_log_weights, dsir_resample
    from etl_hero_spark.textops import token_count_expr

    docs = _t(spark, sf_dir, "documents")
    weighted = parquet_checkpoint(
        dsir_log_weights(
            docs, F.col("source") == "src0", n_buckets=1024
        ).select("doc_id", "text", "source", "is_target", "log_weight"),
        "dsir-curate-w",
    )
    picked = parquet_checkpoint(
        dsir_resample(weighted, budget=300, temperature=1.0),
        "dsir-curate-pick",
    )
    # benchmark = a deterministic slice of the corpus posing as an eval
    # set; overlap flags on exact 8-gram collision
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    flagged = flag_benchmark_contamination(
        picked.select("doc_id", "text", "source"), bench, n=8
    )
    clean = flagged.filter(F.col("contaminated") == 0)
    return (
        clean.withColumn("n_tokens", token_count_expr("text"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(
            F.broadcast(
                flagged.agg(
                    F.count(F.lit(1)).alias("n_selected"),
                    F.sum("contaminated").cast("bigint")
                    .alias("n_contaminated"),
                )
            )
        )
        .orderBy("source")
    )


@register(
    "sql_disjunctive_promo",
    oracle=None,
    note=(
        "extension (r5, TPC-H Q19 shape): revenue under an OR of "
        "brand/size/quantity conjunction clauses — the classic "
        "disjunctive-predicate pushdown test: the part-side brand/size "
        "conjunctions and the lineitem quantity bounds each reach "
        "their own scan (asserted in tests/test_plans.py), the join "
        "stays an equi-join on partkey with the residual OR applied "
        "post-join, dimension side broadcast, decimal-exact revenue. "
        "DuckDB parity in tests/test_relational_extras.py"
    ),
)
def q_sql_disjunctive_promo(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    clause = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 25)
         & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & size.between(1, 35)
           & qty.between(10, 35))
        | ((F.col("p_brand") == "Brand#34") & size.between(1, 50)
           & qty.between(20, 50))
    )
    joined = li.join(
        F.broadcast(
            part.filter(
                F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
                & size.between(1, 50)
            )
        ),
        li["l_partkey"] == part["p_partkey"],
    ).filter(clause)
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(vol).cast("double"), 2).alias("revenue"),
    ).orderBy("p_brand")


_Q10_SQL = (
        "SELECT c_custkey, c_mktsegment, "
        "cast(count(*) as bigint) AS n_returned_lines, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "- CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) "
        "AS lost_revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE l_returnflag = 'R' "
        "AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01' "
        "GROUP BY c_custkey, c_mktsegment "
        "ORDER BY lost_revenue DESC, c_custkey ASC LIMIT 20"
)

_Q17_SQL = (
        "WITH pp AS ("
        "SELECT l_partkey AS pk, "
        "sum(CAST(l_quantity AS DECIMAL(28,6))) AS sq, "
        "count(l_quantity) AS nq "
        "FROM lineitem GROUP BY 1) "
        "SELECT cast(count(*) as bigint) AS n_small_lines, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / 7.0, 2) AS avg_yearly "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN pp ON l_partkey = pk "
        "WHERE p_brand = 'Brand#13' AND p_size <= 25 "
        "AND CAST(l_quantity AS DECIMAL(28,6)) * 5 * nq < sq"
)


@register(
    "sql_returned_item_ranking",
    oracle=(
        "SELECT 'returned_ranking' AS part, c_custkey, c_mktsegment, "
        "n_returned_lines AS n, lost_revenue AS revenue "
        f"FROM ({_Q10_SQL}) "
        "UNION ALL "
        "SELECT 'small_qty_avg_yearly' AS part, "
        "cast(NULL as bigint) AS c_custkey, "
        "cast(NULL as varchar) AS c_mktsegment, "
        "n_small_lines AS n, avg_yearly AS revenue "
        f"FROM ({_Q17_SQL})"
    ),
    note=(
        "extension, tagged per part (the lost-revenue panel). "
        "part='returned_ranking' (r5, TPC-H Q10 shape): top customers "
        "by revenue lost to returns in one quarter — orders "
        "date-filtered at the scan, lineitem returnflag-filtered at "
        "the scan, two equi-joins, decimal-exact lost revenue, "
        "deterministic top-20 (revenue desc, custkey asc — ties cannot "
        "reorder the cut). part='small_qty_avg_yearly' (r6, TPC-H Q17 "
        "shape; absorbed r8, was the separate sql_small_quantity_"
        "revenue query — oracle SQL byte-unchanged inside the "
        "wrapper): yearly revenue lost if small-quantity orders of one "
        "brand's parts moved to bulk — the correlated-average subquery "
        "decorrelates to ONE per-part moment groupBy joined back on "
        "partkey (co-partitioned), and the 'quantity < 0.2 * avg' "
        "predicate is evaluated EXACTLY as 5 * quantity * n < "
        "sum_quantity in decimals (no double rounding at the cut); "
        "p_size <= 25 stands in for the absent p_container filter; "
        "n carries the small-line count, revenue the avg yearly loss. "
        "DuckDB parity for both in tests/test_relational_extras.py — "
        "driver-window slot policy: merge mature tagged entries "
        "instead of registering more"
    ),
)
def q_sql_returned_item_ranking(spark, sf_dir):
    rank = q_sql_returned_item_ranking_inner(spark, sf_dir).select(
        F.lit("returned_ranking").alias("part"),
        "c_custkey",
        "c_mktsegment",
        F.col("n_returned_lines").alias("n"),
        F.col("lost_revenue").alias("revenue"),
    )
    small = q_sql_small_quantity_revenue(spark, sf_dir).select(
        F.lit("small_qty_avg_yearly").alias("part"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.col("n_small_lines").alias("n"),
        F.col("avg_yearly").alias("revenue"),
    )
    return rank.unionByName(small)


# the Q10 body stays as an unregistered helper: the merged lost-revenue
# panel and tests/test_relational_extras.py both call it
def q_sql_returned_item_ranking_inner(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = _t(spark, sf_dir, "customer")
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_returned_lines"),
            F.round(F.sum(vol).cast("double"), 2).alias("lost_revenue"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ===========================================================================
# round-6 TPC-H shapes: Q7 / Q13 / Q17 / Q16 (fixture-adapted where a
# TPC-H column is absent — each adaptation documented in its note)
# ===========================================================================


# sql_volume_shipping (TPC-H Q7 shape) was absorbed into
# sql_market_share (part='volume_shipping' tagged rows, oracle SQL
# byte-unchanged inside the wrapper) in r8 — driver-window slot
# policy. The body stays as an unregistered helper: the merged trade
# panel and tests/test_relational_extras.py both call it.
def q_sql_volume_shipping(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        "s_nationkey",
    ).select("s_suppkey", "supp_nation")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        "c_nationkey",
    ).select("c_custkey", "cust_nation")
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_18")
        & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19")
        & (F.col("cust_nation") == "NATION_18")
    )
    return (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(vol).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# sql_customer_distribution (TPC-H Q13 shape) was absorbed into
# sql_orders_with_returns (part='cust_distribution' tagged rows,
# oracle SQL byte-unchanged inside the wrapper) in r8 — driver-window
# slot policy. The body stays as an unregistered helper: the merged
# entry and tests/test_relational_extras.py both call it. The Q13
# o_comment NOT LIKE filter has no fixture column; the non-urgent-
# priority filter stands in (same shape: a join-side predicate that
# removes rows but must not remove customers).
def q_sql_customer_distribution(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per = (
        cust.join(
            orders.select(
                F.col("o_custkey").alias("c_custkey"), "o_orderkey"
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# sql_small_quantity_revenue (TPC-H Q17 shape) was absorbed into
# sql_returned_item_ranking (part='small_qty_avg_yearly' tagged rows,
# oracle SQL byte-unchanged inside the wrapper) in r8 — driver-window
# slot policy. The body stays as an unregistered helper: the merged
# lost-revenue panel and tests/test_relational_extras.py both call it.
def q_sql_small_quantity_revenue(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 25)
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_sq"),
        F.count("l_quantity").alias("_nq"),
    )
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, F.col("l_partkey") == F.col("_pk"))
    )
    small = joined.filter(
        F.col("l_quantity").cast("decimal(28,6)") * 5 * F.col("_nq")
        < F.col("_sq")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / 7.0,
            2,
        ).alias("avg_yearly"),
    )


# sql_supplier_relationship (TPC-H Q16 shape, in the verified window
# since r7) was absorbed into sql_excess_suppliers (part='q16' tagged
# rows, oracle SQL byte-unchanged inside the wrapper) in r9 — driver-
# window slot policy, freeing the slot features_linreg takes. The body
# stays as the unregistered helper the merged entry calls.
SQL_SUPPLIER_RELATIONSHIP_SQL = (
    "SELECT p_brand, substring(p_type, 1, 6) AS p_type_prefix, "
    "p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_brand <> 'Brand#45' "
    "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
    "GROUP BY 1, 2, 3 "
    "ORDER BY supplier_cnt DESC, p_brand, p_type_prefix, p_size"
)


def q_sql_supplier_relationship(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select(
        "p_partkey",
        "p_brand",
        F.substring("p_type", 1, 6).alias("p_type_prefix"),
        "p_size",
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type_prefix", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias(
                "supplier_cnt"
            )
        )
        .orderBy(
            F.desc("supplier_cnt"),
            "p_brand",
            "p_type_prefix",
            "p_size",
        )
    )


@register(
    "er_fellegi_sunter",
    oracle=None,
    note=(
        "extension (r6): Fellegi-Sunter probabilistic record linkage "
        "(Fellegi & Sunter 1969; the Splink formulation) - completes "
        "the ER family's scoring rung: the heuristic-weight "
        "fuzzy_pairs_multi becomes a FITTED model with per-field "
        "m/u probabilities learned by EM. The honest distributed "
        "shape: candidate pairs (bounded exact blocking on "
        "segment x nation x acctbal-band, the established cap "
        "posture) fold to ONE <= 2^3-row agreement-pattern table; EM "
        "iterates driver-side over that bounded table; scoring "
        "re-enters the plan as literal log2-weight expressions (no "
        "join). Clone plants (%97 name typo keeping the other "
        "attributes) give the fit a real match class. Output "
        "part-tagged: per-field m/u/log2-weights + a summary row with "
        "the prior, pair count, and high-posterior match count. "
        "Numpy-EM parity + planted-separation + literal-apply "
        "arithmetic pinned in tests/test_er.py"
    ),
)
def q_er_fellegi_sunter(spark, sf_dir):
    import math

    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.er import fs_fit, fs_score

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lower("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("string").alias("nation"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    clones = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.expr(
            "concat(substring(name, 1, 8), substring(name, 10, 100))"
        ).alias("name"),
        "seg",
        "nation",
        "bal",
    )
    both = (
        cust.unionByName(clones)
        .withColumn(
            "_blk",
            F.concat_ws(
                "",
                "seg",
                "nation",
                F.floor(F.col("bal") / 1000).cast("string"),
            ),
        )
        .withColumn(
            "_digits",
            F.expr("right(regexp_replace(name, '[^0-9]', ''), 6)"),
        )
    )
    left = both.select(
        F.col("c_custkey").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("_digits").alias("dig_a"),
        F.col("bal").alias("bal_a"),
        "_blk",
    )
    right = both.select(
        F.col("c_custkey").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("_digits").alias("dig_b"),
        F.col("bal").alias("bal_b"),
        "_blk",
    )
    pairs = (
        left.join(right, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.levenshtein("name_a", "name_b") <= 2)
            .cast("int")
            .alias("a_name"),
            (F.col("dig_a") == F.col("dig_b")).cast("int").alias(
                "a_digits"
            ),
            (F.col("bal_a") == F.col("bal_b")).cast("int").alias(
                "a_bal"
            ),
        )
    )
    pairs = parquet_checkpoint(pairs, "fs-pairs")
    fields = ["a_name", "a_digits", "a_bal"]
    model = fs_fit(pairs, fields)
    field_rows = spark.createDataFrame(
        [
            (
                "field",
                c,
                round(model["m"][c], 6),
                round(model["u"][c], 6),
                round(math.log2(model["m"][c] / model["u"][c]), 6),
                round(
                    math.log2(
                        (1 - model["m"][c]) / (1 - model["u"][c])
                    ),
                    6,
                ),
                None,
                None,
                None,
            )
            for c in fields
        ],
        "part string, key string, m double, u double, w_agree double, "
        "w_disagree double, lam double, n_pairs bigint, "
        "n_high_posterior bigint",
    )
    summary = fs_score(pairs, fields, model).agg(
        F.lit("summary").alias("part"),
        F.lit("model").alias("key"),
        F.lit(None).cast("double").alias("m"),
        F.lit(None).cast("double").alias("u"),
        F.lit(None).cast("double").alias("w_agree"),
        F.lit(None).cast("double").alias("w_disagree"),
        F.lit(round(model["p"], 6)).alias("lam"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("match_posterior") > 0.9).cast("int"))
        .cast("bigint")
        .alias("n_high_posterior"),
    )
    return field_rows.unionByName(summary).orderBy("part", "key")


@register(
    "features_logreg",
    oracle=None,
    note=(
        "extension (r6): binary logistic regression by distributed "
        "IRLS — the iterative sibling of features_linreg with the "
        "same honest shape: each Newton step is ONE corpus "
        "aggregation folding the (p+1)^2 weighted normal matrix and "
        "score under the current coefficients (literal expressions); "
        "numpy solves the bounded system driver-side; the serve side "
        "is a literal sigmoid. Fits P(order has a returned lineitem) "
        "on order value and urgency. Output part-tagged: per-feature "
        "coefficient rows + a summary row (n, iterations, mean log "
        "loss, AUC-free separation check = mean p(pos) - mean p(neg)). "
        "Independent numpy-IRLS parity pinned in "
        "tests/test_features.py"
    ),
)
def q_features_logreg(spark, sf_dir):
    from etl_hero_spark.features import logreg_apply, logreg_fit

    orders = _t(spark, sf_dir, "orders")
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("_ret", F.lit(1))
    )
    base = (
        orders.join(returned, "o_orderkey", "left")
        .select(
            (F.col("o_totalprice").cast("double") / 100000.0).alias(
                "x_value"
            ),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("double")
            .alias("x_urgent"),
            F.col("_ret").isNotNull().cast("int").alias("y"),
        )
    )
    from etl_hero_spark.checkpoint import parquet_checkpoint

    base = parquet_checkpoint(base, "logreg-base")
    feats = ["x_value", "x_urgent"]
    model = logreg_fit(base, feats, "y")
    coef_rows = spark.createDataFrame(
        [
            ("coef", c, round(model["coef"][c], 6), None, None, None)
            for c in feats
        ]
        + [
            (
                "coef",
                "intercept",
                round(model["intercept"], 6),
                None,
                None,
                None,
            )
        ],
        "part string, key string, value double, n bigint, "
        "n_iter bigint, separation double",
    )
    scored = logreg_apply(base, model)
    summary = scored.agg(
        F.lit("summary").alias("part"),
        F.lit("fit").alias("key"),
        F.lit(round(model["log_loss"], 6)).alias("value"),
        F.count(F.lit(1)).alias("n"),
        F.lit(model["n_iter"]).cast("bigint").alias("n_iter"),
        F.round(
            F.avg(F.when(F.col("y") == 1, F.col("probability")))
            - F.avg(F.when(F.col("y") == 0, F.col("probability"))),
            6,
        ).alias("separation"),
    )
    return coef_rows.unionByName(summary).orderBy("part", "key")


@register(
    "features_conformal_interval",
    oracle=None,
    note=(
        "extension (r6): split-conformal prediction intervals (Vovk "
        "et al.) — the distribution-free coverage guarantee as a "
        "first-class query: deterministic xxhash64 2:1:1 "
        "train/calibration/test split, OLS fit (one aggregation), "
        "half-width = the k-th smallest calibration residual "
        "(TakeOrdered, k = ceil((n+1)(1-alpha))), and the held-out "
        "fold MEASURES coverage next to the nominal target (the "
        "measured-recall posture — the theorem is checked, not "
        "assumed). lineitem price ~ quantity at alpha = 0.1. "
        "Python-reference q + coverage floor pinned in "
        "tests/test_features.py"
    ),
)
def q_features_conformal_interval(spark, sf_dir):
    from etl_hero_spark.features import conformal_interval_report

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    ).withColumn(
        "rid", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return conformal_interval_report(
        li, ["l_quantity"], "l_extendedprice", "rid", alpha=0.1
    )


@register(
    "pipeline_span_curate",
    oracle=None,
    note=(
        "extension capstone (r6): the substring-dedup curation recipe "
        "in the STANDARD order — quality-aware keep-best exact dedup "
        "FIRST (casing/whitespace variants and the fixture's injected "
        "exact duplicates collapse to their cleanest rendition; "
        "running span-stripping before this would empty every exact "
        "duplicate on BOTH sides, since strip_repeated_spans removes "
        "all occurrences, the public ExactSubstr default), THEN strip "
        "corpus-repeated 8-token spans from the survivors (Lee et al. "
        "substring dedup, the remediation form — cross-doc boilerplate "
        "like the planted fragment disappears everywhere), then drop "
        "docs emptied outright. Per-source accounting panel: docs "
        "in/emptied/out, span tokens removed, tokens surviving. Every "
        "stage is the registered operator unchanged (semantics already "
        "pinned); the composition test asserts the chain equals "
        "applying the stages one at a time. Fixture plants a 24-token "
        "boilerplate fragment onto every doc_id%7==3 document and "
        "uppercased near-clones so both stages have real work."
    ),
)
def q_pipeline_span_curate(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.dedup import dedup_keep_best, strip_repeated_spans
    from etl_hero_spark.textops import normalized_text_expr, tokens_expr

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    frag = d.filter(F.col("doc_id") == 1).select(
        F.array_join(
            F.slice(tokens_expr(normalized_text_expr("text")), 1, 24),
            " ",
        ).alias("_frag")
    )
    with_boiler = d.crossJoin(F.broadcast(frag)).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 7 == 3,
            F.concat_ws(" ", F.col("text"), F.col("_frag")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    case_clones = with_boiler.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        "source",
        F.upper("text").alias("text"),
    )
    pool = with_boiler.unionByName(case_clones)
    quality = (
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    deduped = parquet_checkpoint(
        dedup_keep_best(pool, quality, "doc_id", "text"),
        "span-curate-deduped",
    )
    stripped = parquet_checkpoint(
        strip_repeated_spans(deduped, n=8).select(
            "doc_id",
            "source",
            F.col("text_stripped").alias("text"),
            "n_tokens_removed",
        ),
        "span-curate-stripped",
    )
    n_in = pool.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input")
    )
    out = (
        stripped.groupBy("source")
        .agg(
            F.sum((F.length("text") == 0).cast("int"))
            .cast("bigint")
            .alias("n_emptied"),
            F.sum((F.length("text") > 0).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.sum("n_tokens_removed").cast("bigint").alias(
                "span_tokens_removed"
            ),
            F.sum(
                F.when(
                    F.length("text") > 0,
                    F.size(F.split(F.col("text"), " ")),
                ).otherwise(0)
            ).cast("bigint").alias("tokens_kept"),
            F.sum((F.col("doc_id") >= 4_000_000).cast("int"))
            .cast("bigint")
            .alias("n_case_clone_survivors"),
        )
        .join(n_in, "source")
        .select(
            "source",
            "n_input",
            "n_emptied",
            "n_kept",
            "span_tokens_removed",
            "tokens_kept",
            "n_case_clone_survivors",
        )
        .orderBy("source")
    )
    return out


@register(
    "features_huber_regression",
    oracle=None,
    note=(
        "extension (r6): Huber robust regression by distributed IRLS "
        "next to its OLS twin on the SAME corrupted corpus — every "
        "101st lineitem's price is inflated 10x (key-derived, "
        "deterministic), and the panel shows what each estimator does "
        "with that: OLS (squared loss) absorbs the planted mass into "
        "its slope/intercept, Huber (delta-winsorized loss, "
        "MAD-tuned) stays near the clean fit. Each IRLS step is ONE "
        "corpus aggregation under literal current coefficients (the "
        "logreg posture); numpy solves the bounded system per step. "
        "Independent numpy-IRLS parity + outlier-resistance pinned in "
        "tests/test_features.py. Output: (estimator, slope_quantity, "
        "intercept, n, n_iter)"
    ),
)
def q_features_huber_regression(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.features import huber_fit, linreg_fit

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x_qty"),
        F.when(
            F.col("l_orderkey") % 101 == 0,
            F.col("l_extendedprice").cast("double") * 10.0,
        )
        .otherwise(F.col("l_extendedprice").cast("double"))
        .alias("y_price"),
    )
    li = parquet_checkpoint(li, "huber-base")
    ols = linreg_fit(li, ["x_qty"], "y_price")
    # the panel's OLS row doubles as huber's warm start (identical
    # exact-decimal fit over the same frame — one aggregation, not two)
    hub = huber_fit(li, ["x_qty"], "y_price", init=ols)
    return spark.createDataFrame(
        [
            (
                "ols",
                round(ols["coef"]["x_qty"], 4),
                round(ols["intercept"], 4),
                ols["n"],
                1,
            ),
            (
                "huber",
                round(hub["coef"]["x_qty"], 4),
                round(hub["intercept"], 4),
                hub["n"],
                hub["n_iter"],
            ),
        ],
        "estimator string, slope_quantity double, intercept double, "
        "n bigint, n_iter int",
    ).orderBy("estimator")



@register(
    "pipeline_quality_classifier",
    oracle=None,
    note=(
        "extension (r7, capstone): model-based quality scoring — the "
        "CCNet/fastText-style quality filter (Wenzek et al. 2020; the "
        "GPT-3/LLaMA data recipes), the curation family's last "
        "first-class stage: where Gopher/C4 are fixed rule gates, this "
        "LEARNS the quality boundary from a trusted subset (target = "
        "the src0 domain, the same trusted-domain convention as DSIR) "
        "and scores the whole corpus with the fitted model. "
        "Composition of two verified shapes: hashed_token_features "
        "(signed md5 hashing trick, L1-normalized — ONE explode+"
        "groupBy shuffle, features checkpointed once) feeds logreg_fit "
        "(distributed IRLS: each Newton step is ONE corpus aggregation "
        "under literal coefficients); scoring is a literal sigmoid — "
        "the 100 TB apply pass is a map-only scan. Output: per-source "
        "score-distribution report (n_docs, n_target, mean/min/max "
        "probability, fraction above threshold). Rows-only for "
        "driver-window budget; numpy-IRLS parity and planted-"
        "separation (quality-vocab corpus -> target sources score "
        "higher) pinned in tests/test_features.py"
    ),
)
def q_pipeline_quality_classifier(spark, sf_dir):
    from etl_hero_spark.features import quality_classifier_report
    from etl_hero_spark.registry import _quality_model

    docs = _t(spark, sf_dir, "documents")
    report, _model = quality_classifier_report(
        docs,
        F.col("source") == "src0",
        dim=16,
        model=_quality_model(spark, sf_dir, dim=16),
    )
    return report


# --- pipeline_quality_serve: the classifier family's oracle-window
# member (VERDICT r8 #2). The FITTED model's coefficients are corpus-
# derived double sums (IRLS partials are partition-order dependent at
# the last ulp), so the fitted report can never be a static SQL
# oracle; what IS hash-checkable end-to-end is the SERVE path — the
# 100 TB-hot half — under a FROZEN PUBLISHED model. The reference
# model compiles a seed vocabulary into hashed-bucket space exactly
# the way fastText compiles word weights (coef_j = sum of sign(w) *
# weight(w) over vocab words hashing to bucket j, so a vocab token's
# margin contribution is sign(w)^2 * weight / n = weight / n), and
# the report lives in MARGIN space: sigmoid is monotone, so the serve
# decision p >= 0.5 is exactly margin >= 0 while every reported value
# stays in exact cross-engine arithmetic (integer-valued sign sums,
# one IEEE division per feature, a fixed-order literal dot product —
# no exp, no raw double accumulation; the mean is over floor-
# quantized micro-margins summed as exact bigints).
_QUALITY_REF_POS = ["fast", "merge", "vector", "spark", "agg"]
_QUALITY_REF_NEG = ["slow", "small", "dup"]
_QUALITY_REF_DIM = 16


def _quality_ref_coefs() -> dict[int, float]:
    """Bucket weights of the frozen reference model — pure hashlib
    (engine-free, deterministic), same md5 bucket/sign convention as
    hashed_token_feature_exprs (conv(substr(md5,1,14),16,10) % dim;
    sign from hex digit 15 parity)."""
    import hashlib

    coef: dict[int, float] = {}
    for w, wt in [(w, 1.0) for w in _QUALITY_REF_POS] + [
        (w, -1.0) for w in _QUALITY_REF_NEG
    ]:
        h = hashlib.md5(w.encode()).hexdigest()
        j = int(h[:14], 16) % _QUALITY_REF_DIM
        s = 1.0 if int(h[14], 16) % 2 == 0 else -1.0
        coef[j] = coef.get(j, 0.0) + s * wt
    return {j: c for j, c in sorted(coef.items()) if c != 0.0}


def _quality_serve_oracle() -> str:
    toks = (
        "CASE WHEN length(trim(lower(text))) = 0 THEN [] "
        "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
    )
    coefs = _quality_ref_coefs()
    coef_case = (
        f"CASE ('0x' || substring(md5(t), 1, 14))::BIGINT "
        f"% {_QUALITY_REF_DIM} "
        + " ".join(f"WHEN {j} THEN {c!r}" for j, c in coefs.items())
        + " ELSE 0.0 END"
    )
    sign = (
        "CASE WHEN ('0x' || substring(md5(t), 15, 1))::INT % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END"
    )
    return (
        f"WITH tok AS (SELECT doc_id, source, {toks} AS toks "
        "FROM documents), "
        "ex AS (SELECT doc_id, unnest(toks) AS t FROM tok), "
        "per AS (SELECT doc_id, "
        f"sum({coef_case} * {sign}) AS num FROM ex GROUP BY doc_id), "
        # unnest drops zero-token docs — the LEFT JOIN reinstates them
        # (Spark's explode_outer mirror); margin = num / n_tokens is
        # ONE division of an exact-integer double by an int
        "m AS (SELECT tok.source, "
        # + 0.0 normalizes a -0.0 quotient (a doc whose every
        # contribution is a signed zero) to +0.0 — sum-init order
        # differs between engines only in the SIGN of zero, and raw
        # min/max margins are hash-compared
        "(CASE WHEN len(tok.toks) > 0 THEN "
        "coalesce(per.num, 0.0) / CAST(len(tok.toks) AS DOUBLE) "
        "ELSE 0.0 END) + 0.0 AS margin "
        "FROM tok LEFT JOIN per ON tok.doc_id = per.doc_id) "
        "SELECT source, cast(count(*) as bigint) AS n_docs, "
        "cast(sum(CASE WHEN margin >= 0.0 THEN 1 ELSE 0 END) as bigint) "
        "AS n_keep, "
        "cast(sum(CASE WHEN margin >= 0.05 THEN 1 ELSE 0 END) as bigint) "
        "AS n_keep_strict, "
        "min(margin) AS min_margin, max(margin) AS max_margin, "
        "cast(sum(cast(floor(margin * 1000000.0) as bigint)) as bigint) "
        "AS sum_margin_micro, "
        "cast(sum(cast(floor(margin * 1000000.0) as bigint)) as double) "
        "/ count(*) AS mean_margin_micro "
        "FROM m GROUP BY source ORDER BY source"
    )


@register(
    "pipeline_quality_serve",
    oracle=_quality_serve_oracle(),
    note=(
        "PROMOTED into the verified oracle window r9 (VERDICT r8 #2; "
        "slot freed by absorbing dedup_keep_best into dedup_clusters): "
        "the quality-classifier family's SERVE capstone under a FROZEN "
        "published reference model — the production posture where the "
        "fit is a build-once artifact and the map-only scoring pass is "
        "what touches 100 TB. The reference model compiles a seed "
        "vocabulary (5 positive / 3 negative markers) into md5-hashed "
        "bucket space with the EXACT hashed_token_feature_exprs "
        "bucket/sign convention (hashlib-derived literals — engine-"
        "free); the corpus pass is the RELATIONAL compiled form (r8 "
        "encoder doctrine: explode once, two md5 per token, exact "
        "small-integer contribution sums per doc, ONE division — "
        "never 2*dim interpreted lambdas per token), with agreement "
        "to the per-row serving expressions (the stream/classifier "
        "path) pinned in tests within float-association tolerance "
        "and exactly on keep/drop decisions. "
        "Report is in MARGIN space: keep/drop counts at margin >= 0 "
        "(== p >= 0.5, sigmoid is monotone) and >= 0.05, raw min/max "
        "margins (per-doc margins are bit-identical cross-engine: "
        "integer-valued sign sums, one IEEE division, signed zeros "
        "normalized), and floor-quantized micro-margin "
        "sum/mean (exact bigint accumulation — no raw double sums, "
        "no exp, no decimal-rounding midpoints anywhere). The FITTED "
        "report stays the rows-only pipeline_quality_classifier (its "
        "IRLS coefficients are corpus-derived double sums — never a "
        "static SQL oracle)"
    ),
)
def q_pipeline_quality_serve(spark, sf_dir):
    from etl_hero_spark.textops import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    coefs = _quality_ref_coefs()
    # RELATIONAL compiled form (the r8 encoder doctrine: interpreted
    # per-row lambdas are the serving path, never the corpus path) —
    # explode once, md5 each token TWICE (bucket + sign), fold
    # coef(bucket)*sign as exact small-integer doubles per doc, ONE
    # division by the token count. Agreement with the per-row
    # hashed_token_feature_exprs margin (identical up to float
    # association; keep/drop decisions exact) is pinned in
    # tests/test_features.py (serve/batch symmetry).
    base = docs.select(
        "doc_id",
        "source",
        tokens_expr(F.lower(F.col("text"))).alias("toks"),
    )
    ex = base.select(
        "doc_id", F.explode_outer("toks").alias("t")
    )
    coef_case = F.expr(
        f"CASE cast(conv(substring(md5(t), 1, 14), 16, 10) as bigint) "
        f"% {_QUALITY_REF_DIM} "
        + " ".join(f"WHEN {j} THEN {c!r}" for j, c in coefs.items())
        + " ELSE 0.0 END"
    )
    sign = F.expr(
        "CASE WHEN cast(conv(substring(md5(t), 15, 1), 16, 10) as int) "
        "% 2 = 0 THEN 1.0 ELSE -1.0 END"
    )
    per = ex.groupBy("doc_id").agg(
        F.sum(coef_case * sign).alias("num")
    )
    # + 0.0 normalizes a -0.0 quotient to +0.0 (see the oracle's note)
    margin = (
        F.when(
            F.size("toks") > 0,
            F.coalesce(F.col("num"), F.lit(0.0))
            / F.size("toks").cast("double"),
        ).otherwise(F.lit(0.0))
        + F.lit(0.0)
    )
    scored = base.join(per, "doc_id", "left").select(
        "source", margin.alias("margin")
    )
    micro = F.floor(F.col("margin") * F.lit(1000000.0))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("margin") >= 0.0).cast("int"))
            .cast("bigint")
            .alias("n_keep"),
            F.sum((F.col("margin") >= 0.05).cast("int"))
            .cast("bigint")
            .alias("n_keep_strict"),
            F.min("margin").alias("min_margin"),
            F.max("margin").alias("max_margin"),
            F.sum(micro).cast("bigint").alias("sum_margin_micro"),
            (
                F.sum(micro).cast("double") / F.count(F.lit(1))
            ).alias("mean_margin_micro"),
        )
        .orderBy("source")
    )


# ===========================================================================
# round-7 TPC-H shapes: Q1 / Q5 / Q12 / Q21 (fixture-adapted where a
# TPC-H column is absent — each adaptation documented in its note)
# ===========================================================================


@register(
    "sql_pricing_summary",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) "
        "AS sum_qty, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE), 2) AS sum_base_price, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "- CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) "
        "AS sum_disc_price, "
        "round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "- CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "+ CAST(l_tax AS DECIMAL(18,6)))) AS DOUBLE), 2) AS sum_charge, "
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
        "/ count(l_quantity), 6) AS avg_qty, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / count(l_extendedprice), 6) AS avg_price, "
        "round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) "
        "/ count(l_discount), 6) AS avg_disc, "
        "cast(count(*) as bigint) AS count_order "
        "FROM lineitem WHERE l_shipdate <= '2001-09-01' "
        "GROUP BY 1, 2"
    ),
    note=(
        "PROMOTED to the verified oracle window r8 (slots freed by the "
        "r8 absorptions). "
        "extension (r7, TPC-H Q1 — the canonical pricing summary "
        "report, fully expressible on the fixture): per "
        "(returnflag, linestatus) sums/averages of quantity, base "
        "price, discounted price, and charge over shipped lines — ONE "
        "scan, one small-key groupBy, every money aggregate "
        "decimal-exact (all money columns are <=2dp, so the charge "
        "product is exact at 6dp; the (18,6)-staged intermediate "
        "keeps every factor on DuckDB's int128 path AND Spark's "
        "unclamped-multiply path) and rounded ONCE at the end. The "
        "shipdate cutoff pushes to the parquet scan. DuckDB parity in "
        "tests/test_relational_extras.py"
    ),
)
def q_sql_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    one_minus_disc = F.lit(1).cast("decimal(18,6)") - F.col(
        "l_discount"
    ).cast("decimal(18,6)")
    one_plus_tax = F.lit(1).cast("decimal(18,6)") + F.col("l_tax").cast(
        "decimal(18,6)"
    )
    # price(2dp) x (1-disc)(2dp) is exact at 4dp -> the (18,6) restage
    # is lossless and keeps the second multiply's precision bounded
    disc_price = (price * one_minus_disc).cast("decimal(18,6)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(price * one_minus_disc).cast("double"), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(disc_price * one_plus_tax).cast("double"),
                2,
            ).alias("sum_charge"),
            F.round(
                F.sum(qty).cast("double") / F.count("l_quantity"), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(price).cast("double")
                / F.count("l_extendedprice"),
                6,
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("l_discount"),
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "sql_local_supplier_volume",
    oracle=(
        "SELECT n_name, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) "
        "- CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "AND c_nationkey = s_nationkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE' "
        "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01' "
        "GROUP BY 1"
    ),
    note=(
        "PROMOTED to the verified oracle window r8 (slots freed by the "
        "r8 second-wave absorptions). "
        "extension (r7, TPC-H Q5 shape): revenue from orders where "
        "customer and supplier share a nation, per nation within one "
        "region over a two-year window — the classic snowflake join "
        "(lineitem x orders x customer x supplier x nation x region) "
        "with the SAME-NATION equality folded into the supplier join "
        "condition, region/nation dims broadcast, date range pushed "
        "to the orders scan, decimal-exact revenue. Region EUROPE "
        "(fixture-probed: every region has 5 nations; EUROPE carries "
        "same-nation volume at every sf). DuckDB parity in "
        "tests/test_relational_extras.py"
    ),
)
def q_sql_local_supplier_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            sup,
            (li["l_suppkey"] == sup["s_suppkey"])
            & (cust["c_nationkey"] == sup["s_nationkey"]),
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# Pre-absorption oracle SQL, kept byte-exact (r10 merge contract:
# the absorbed query's SQL runs unchanged inside the wrapper)
_SQL_SHIPMODE_PRIORITY_SQL = (
    "SELECT l_returnflag, "
    "cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) as bigint) AS high_line_count, "
    "cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) as bigint) AS low_line_count "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
    "GROUP BY 1"
)

_SQL_WAITING_SUPPLIERS_SQL = (
    "WITH l AS ("
    "SELECT l_orderkey, l_suppkey, "
    "l_shipdate > o_orderdate + INTERVAL 90 DAY AS late "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE o_orderstatus = 'F') "
    "SELECT s_name, cast(count(*) as bigint) AS numwait "
    "FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey "
    "WHERE l1.late "
    "AND EXISTS (SELECT 1 FROM l l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey "
    "AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM l l3 "
    "WHERE l3.l_orderkey = l1.l_orderkey "
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.late) "
    "GROUP BY s_name "
    "ORDER BY numwait DESC, s_name ASC LIMIT 20"
)


@register(
    "sql_shipmode_priority",
    oracle=(  # see _SQL_SHIPMODE_PRIORITY_SQL / _SQL_WAITING_SUPPLIERS_SQL
        "SELECT 'q12' AS part, l_returnflag, high_line_count, "
        "low_line_count, cast(NULL as varchar) AS s_name, "
        "cast(NULL as bigint) AS numwait "
        f"FROM ({_SQL_SHIPMODE_PRIORITY_SQL}) "
        "UNION ALL "
        # --- absorbed sql_waiting_suppliers (r10 merge, TPC-H Q21
        # shape): oracle SQL byte-unchanged inside the wrapper ---
        "SELECT 'q21' AS part, cast(NULL as varchar) AS l_returnflag, "
        "cast(NULL as bigint) AS high_line_count, "
        "cast(NULL as bigint) AS low_line_count, s_name, numwait "
        f"FROM ({_SQL_WAITING_SUPPLIERS_SQL})"
    ),
    note=(
        "PROMOTED to the verified oracle window r8 (slots freed by the "
        "r8 second-wave absorptions). "
        "extension (r7, TPC-H Q12 shape): order-priority split per "
        "shipping class over a one-year receipt window — the "
        "conditional-count (CASE-sum) aggregation pattern. The fixture "
        "has no l_shipmode/l_receiptdate: l_returnflag stands in for "
        "the mode class and l_shipdate for the receipt date (same "
        "shape: join orders, year-window filter pushed to the lineitem "
        "scan, two CASE-sums per group). part='q21' (absorbed r10, was "
        "the separate sql_waiting_suppliers query — TPC-H Q21, the "
        "correlated EXISTS + NOT EXISTS shape decorrelated to LEFT "
        "SEMI/ANTI joins; both 'shipping delay' analyses, merged to "
        "free the slot events_anomaly_mad takes; oracle SQL "
        "byte-unchanged inside the wrapper) carries s_name/numwait, "
        "NULL on the Q12 columns. DuckDB parity in "
        "tests/test_relational_extras.py"
    ),
)
def q_sql_shipmode_priority(spark, sf_dir):
    q12 = q_sql_shipmode_priority_body(spark, sf_dir).select(
        F.lit("q12").alias("part"),
        "l_returnflag",
        "high_line_count",
        "low_line_count",
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("bigint").alias("numwait"),
    )
    # absorbed sql_waiting_suppliers (r10): the Q21 rows, body kept as
    # the unregistered helper below
    q21 = q_sql_waiting_suppliers(spark, sf_dir).select(
        F.lit("q21").alias("part"),
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("bigint").alias("high_line_count"),
        F.lit(None).cast("bigint").alias("low_line_count"),
        "s_name",
        F.col("numwait").cast("bigint").alias("numwait"),
    )
    return q12.unionByName(q21)


def q_sql_shipmode_priority_body(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("int")).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum((~high).cast("int")).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


# sql_waiting_suppliers was absorbed into sql_shipmode_priority
# (part='q21' tagged rows) in r10 — driver-window slot policy; the
# slot funds the events_anomaly_mad promotion. The body stays as an
# unregistered helper; semantics stay pinned in
# tests/test_relational_extras.py. TPC-H Q21 shape — the hardest
# relational shape in the suite (correlated EXISTS + NOT EXISTS over
# the same fact table): suppliers whose line was the ONLY late one in
# a finished multi-supplier order; EXISTS -> LEFT SEMI, NOT EXISTS ->
# LEFT ANTI, supplier-inequality as residual predicates; late =
# shipped >90 days after order date (no l_receiptdate in the fixture).
def q_sql_waiting_suppliers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "_late",
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate").cast("date"), 90),
        )
        .select("l_orderkey", "l_suppkey", "_late")
    )
    from etl_hero_spark.checkpoint import parquet_checkpoint

    # three consumers of the same joined subtree (probe, semi, anti)
    l = parquet_checkpoint(l, "q21-lines")
    l1 = l.filter(F.col("_late")).select("l_orderkey", "l_suppkey")
    other = l.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_late = l.filter(F.col("_late")).select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    waiting = l1.join(
        other,
        (l1["l_orderkey"] == other["_ok"])
        & (l1["l_suppkey"] != other["_sk"]),
        "leftsemi",
    ).join(
        other_late,
        (l1["l_orderkey"] == other_late["_ok"])
        & (l1["l_suppkey"] != other_late["_sk"]),
        "leftanti",
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(
            F.broadcast(sup), waiting["l_suppkey"] == sup["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# sql_important_parts was absorbed into sql_excess_suppliers
# (part='q11' tagged rows) in r10 — driver-window slot policy; the
# slot funds the profile_psi_drift promotion. Natural family fit:
# Q11 is the value-fraction threshold-against-aggregate shape, Q20
# (excess) the quantity-fraction one, Q16 already rides along. The
# body stays as an unregistered helper; semantics stay pinned in
# tests/test_relational_extras.py. TPC-H Q11 shape: parts whose
# shipped value through one nation's suppliers exceeds a fraction of
# the global total — HAVING-against-a-scalar-subquery, decorrelated
# through a checkpointed per-part table + broadcast total; the 1% cut
# is decimal-exact in both engines (val*100 > tot vs val > tot*0.01).
_SQL_IMPORTANT_PARTS_SQL = (
    "WITH v AS ("
    "SELECT l_partkey, "
    "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val "
    "FROM lineitem "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_3' GROUP BY 1) "
    "SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value "
    "FROM v "
    "WHERE CAST(val AS DECIMAL(38,6)) "
    "> (SELECT sum(CAST(val AS DECIMAL(38,6))) FROM v) * 0.01 "
    "ORDER BY part_value DESC, l_partkey ASC"
)


def q_sql_important_parts(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint

    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # per-part value table computes ONCE (two consumers: rows + total)
    per_part = parquet_checkpoint(
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "_val"
            )
        ),
        "q11-per-part",
    )
    total = per_part.agg(
        F.sum("_val").alias("_tot")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        # keep the 1%-of-total threshold decimal-exact: val > tot*0.01
        # rewritten as val*100 > tot so no double promotion can move a
        # part sitting exactly on the boundary (the oracle's DECIMAL
        # 0.01 arithmetic is exact too — identical cut in both engines)
        .filter(
            F.col("_val").cast("decimal(32,2)") * F.lit(100)
            > F.col("_tot").cast("decimal(38,2)")
        )
        .select(
            "l_partkey",
            F.round(F.col("_val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_SQL_EXCESS_SUPPLIERS_SQL = (
    "SELECT s_suppkey, s_name, "
    "round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal "
    "FROM supplier "
    "WHERE s_suppkey IN ("
    "SELECT l_suppkey FROM ("
    "SELECT l_suppkey, l_partkey, "
    "sum(CAST(l_quantity AS DECIMAL(28,6))) AS q "
    "FROM lineitem "
    "JOIN part ON l_partkey = p_partkey "
    "WHERE p_name LIKE '%widget%' "
    "GROUP BY 1, 2) sq "
    "JOIN ("
    "SELECT l_partkey AS pk, "
    "sum(CAST(l_quantity AS DECIMAL(28,6))) AS tq "
    "FROM lineitem GROUP BY 1) pt "
    "ON sq.l_partkey = pt.pk "
    "WHERE q * 5 > tq) "
    "ORDER BY s_suppkey"
)


@register(
    "sql_excess_suppliers",
    oracle=(
        "SELECT 'excess' AS part, s_suppkey, s_name, s_acctbal, "
        "cast(NULL as varchar) AS p_brand, "
        "cast(NULL as varchar) AS p_type_prefix, "
        "cast(NULL as int) AS p_size, "
        "cast(NULL as bigint) AS supplier_cnt, "
        "cast(NULL as bigint) AS l_partkey, "
        "cast(NULL as double) AS part_value "
        f"FROM ({_SQL_EXCESS_SUPPLIERS_SQL}) "
        "UNION ALL "
        # --- absorbed sql_supplier_relationship (r9 merge, TPC-H Q16
        # shape): oracle SQL byte-unchanged inside the wrapper ---
        "SELECT 'q16' AS part, cast(NULL as bigint) AS s_suppkey, "
        "cast(NULL as varchar) AS s_name, "
        "cast(NULL as double) AS s_acctbal, "
        "p_brand, p_type_prefix, p_size, supplier_cnt, "
        "cast(NULL as bigint) AS l_partkey, "
        "cast(NULL as double) AS part_value "
        f"FROM ({SQL_SUPPLIER_RELATIONSHIP_SQL}) "
        "UNION ALL "
        # --- absorbed sql_important_parts (r10 merge, TPC-H Q11
        # shape): oracle SQL byte-unchanged inside the wrapper ---
        "SELECT 'q11' AS part, cast(NULL as bigint) AS s_suppkey, "
        "cast(NULL as varchar) AS s_name, "
        "cast(NULL as double) AS s_acctbal, "
        "cast(NULL as varchar) AS p_brand, "
        "cast(NULL as varchar) AS p_type_prefix, "
        "cast(NULL as int) AS p_size, "
        "cast(NULL as bigint) AS supplier_cnt, "
        "l_partkey, part_value "
        f"FROM ({_SQL_IMPORTANT_PARTS_SQL})"
    ),
    note=(
        "PROMOTED to the verified oracle window r8 (slots freed by the "
        "r8 absorptions; the oracle runs the textbook nested-IN form "
        "the semi join decorrelates). "
        "extension (r7, TPC-H Q20 shape): suppliers who shipped more "
        "than a fifth of a matching part's corpus-wide quantity — the "
        "nested-IN-with-aggregate-threshold pattern decorrelated: the "
        "(supplier, part) quantity groupBy joins the per-part total "
        "groupBy on the co-partitioned part key, the threshold filter "
        "runs on the joined row, and the surviving supplier keys "
        "SEMI-join the supplier dim. p_name LIKE stands in for Q20's "
        "prefix filter; shipped quantity for availqty (no partsupp). "
        "part='q16' (absorbed r9, was the separate "
        "sql_supplier_relationship query — TPC-H Q16: distinct "
        "suppliers per (brand, type-prefix, size), the bridge join + "
        "single-column exact COUNT DISTINCT that plans WITHOUT an "
        "Expand; oracle SQL byte-unchanged inside the wrapper, "
        "freeing the slot features_linreg takes) carries "
        "p_brand/p_type_prefix/p_size/supplier_cnt, NULL on the "
        "supplier-row columns. DuckDB parity in "
        "tests/test_relational_extras.py"
    ),
)
def q_sql_excess_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    widget_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    sq = (
        li.join(
            F.broadcast(widget_parts),
            li["l_partkey"] == widget_parts["p_partkey"],
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_q")
        )
    )
    pt = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_tq")
    )
    excess_keys = (
        sq.join(pt, sq["l_partkey"] == pt["_pk"])
        .filter(F.col("_q") * 5 > F.col("_tq"))
        .select("l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    q16_nulls = [
        F.lit(None).cast("string").alias("p_brand"),
        F.lit(None).cast("string").alias("p_type_prefix"),
        F.lit(None).cast("int").alias("p_size"),
        F.lit(None).cast("bigint").alias("supplier_cnt"),
    ]
    q11_nulls = [
        F.lit(None).cast("bigint").alias("l_partkey"),
        F.lit(None).cast("double").alias("part_value"),
    ]
    excess = (
        sup.join(
            excess_keys, sup["s_suppkey"] == excess_keys["l_suppkey"],
            "leftsemi",
        )
        .select(
            F.lit("excess").alias("part"),
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.round(F.col("s_acctbal").cast("double"), 2).alias(
                "s_acctbal"
            ),
            *q16_nulls,
            *q11_nulls,
        )
        .orderBy("s_suppkey")
    )
    # absorbed sql_supplier_relationship (r9): the Q16 rows, body kept
    # as the unregistered helper above
    q16 = q_sql_supplier_relationship(spark, sf_dir).select(
        F.lit("q16").alias("part"),
        F.lit(None).cast("bigint").alias("s_suppkey"),
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("double").alias("s_acctbal"),
        "p_brand",
        "p_type_prefix",
        F.col("p_size").cast("int").alias("p_size"),
        "supplier_cnt",
        *q11_nulls,
    )
    # absorbed sql_important_parts (r10): the Q11 rows, body kept as
    # the unregistered helper above
    q11 = q_sql_important_parts(spark, sf_dir).select(
        F.lit("q11").alias("part"),
        F.lit(None).cast("bigint").alias("s_suppkey"),
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("double").alias("s_acctbal"),
        *q16_nulls,
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
        "part_value",
    )
    return excess.unionByName(q16).unionByName(q11)


# profile_spearman was absorbed into profile_welch_ttest
# (test='spearman' tagged rows — a PROMOTION: the rows-only query
# gained oracle hash coverage through the merge) in r8 — driver-window
# slot policy. The body stays as an unregistered helper for direct
# callers; semantics stay pinned in tests/test_stattests.py.
def q_profile_spearman(spark, sf_dir):
    from etl_hero_spark.stattests import spearman_corr

    li = _t(spark, sf_dir, "lineitem")
    raw = spearman_corr(li, "l_quantity", "l_extendedprice").select(
        F.lit("qty_vs_price").alias("pair"), "n", "rho"
    )
    engineered = li.select(
        F.col("l_extendedprice").alias("x"),
        # a monotone nonlinear transform WITH ties (2dp floor):
        # Spearman must read ~1 where Pearson reads < 1
        F.floor(F.col("l_extendedprice")).cast("double").alias("y"),
    )
    mono = spearman_corr(engineered, "x", "y").select(
        F.lit("price_vs_floor_price").alias("pair"), "n", "rho"
    )
    return raw.unionByName(mono).orderBy("pair")


_URL_TLDS = ["com", "org", "net", "info", "xyz"]


@register(
    "text_url_filter",
    oracle=(
        "WITH tlds AS (SELECT ['com','org','net','info','xyz'] AS ts), "
        "d AS (SELECT doc_id, "
        "source || '-' || cast(doc_id % 97 as varchar) || '.' || "
        "ts[cast(doc_id % 5 + 1 as int)] AS host "
        "FROM documents, tlds), "
        "x AS (SELECT doc_id, host, "
        "regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld, "
        "CASE WHEN md5(host) LIKE '0%' THEN 1 ELSE 0 END AS blocked "
        "FROM d) "
        "SELECT tld, cast(count(*) as bigint) AS n_docs, "
        "cast(sum(blocked) as bigint) AS n_blocked, "
        "cast(sum(1 - blocked) as bigint) AS n_kept, "
        "cast(count(DISTINCT host) as bigint) AS n_hosts "
        "FROM x GROUP BY tld"
    ),
    note=(
        "PROMOTED to the verified oracle window r8 (slot freed by the "
        "r8 weighted-quantile absorption; the oracle replays the "
        "deterministic URL synthesis + md5-prefix blocklist in DuckDB). "
        "extension (r7): C4-style URL/domain curation — the first gate "
        "every web-corpus recipe applies (Raffel et al. 2020 §2.2): "
        "host + TLD parsed with builtin parse_url/regexp (map-only, no "
        "UDF), bad-domain blocklist applied as a broadcast join. The "
        "documents fixture carries no URL, so one is synthesized "
        "DETERMINISTICALLY from (source, doc_id) — the WAV/PII "
        "synthesis posture, identical construction available to any "
        "engine — and the blocklist is every domain whose md5 starts "
        "with '0' (~1/16 of domains, engine-neutral). Per-TLD panel: "
        "docs, blocked, kept, distinct hosts. DuckDB parity in "
        "tests/test_textops.py"
    ),
)
def q_text_url_filter(spark, sf_dir):
    from etl_hero_spark.textops import url_domain_stats

    tld = F.element_at(
        F.array(*[F.lit(t) for t in _URL_TLDS]),
        (F.col("doc_id") % len(_URL_TLDS) + 1).cast("int"),
    )
    docs = _t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("."),
            tld,
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    hosts = docs.select(
        F.parse_url("url", F.lit("HOST")).alias("domain")
    ).distinct()
    blocklist = hosts.filter(F.md5("domain").startswith("0"))
    out = url_domain_stats(docs, "url", blocklist)
    return (
        out.groupBy(F.col("url_tld").alias("tld"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("url_blocked").cast("bigint").alias("n_blocked"),
            F.sum(
                (F.col("url_blocked") == 0).cast("int")
            ).cast("bigint").alias("n_kept"),
            F.countDistinct("url_host").cast("bigint").alias("n_hosts"),
        )
        .orderBy("tld")
    )


_QREG_MEMO: dict = {}


@register(
    "features_quantile_regression",
    oracle=None,
    note=(
        "extension (r7): linear quantile regression by pinball-loss "
        "IRLS — completes the regression family's loss axis (OLS = "
        "conditional mean, Huber = robust mean, logistic = class "
        "probability, this = the tau-th conditional QUANTILE: P90 "
        "latency curves, demand floors). Smoothed Schnabel-Eilers "
        "weights |tau - 1{r<0}|/max(|r|, eps); each IRLS step is ONE "
        "corpus aggregation under literal coefficients (the family "
        "shape). Panel fits tau in {0.1, 0.5, 0.9} of price on "
        "quantity and reports each fit NEXT TO its measured "
        "below-fraction (the quantile property, checked not assumed). "
        "Independent numpy-IRLS parity + monotone-in-tau + the "
        "property pinned in tests/test_features.py"
    ),
)
def q_features_quantile_regression(spark, sf_dir):
    import os

    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.features import quantile_reg_fit_multi

    # the three-tau fit is a BUILD-ONCE panel per fixture (the
    # trained-model memo posture); the LOCKSTEP multi-tau fitter folds
    # all three taus' moment sums into one aggregation per IRLS pass
    # (VERDICT r9 #6: max(iters) corpus passes, not sum(iters)); the
    # frac_below column MEASURES the quantile property of the cached
    # fit rather than assuming it
    p = os.path.realpath(f"{sf_dir}/lineitem.parquet")
    key = (p, os.path.getmtime(p))
    rows = _QREG_MEMO.get(key)
    if rows is None:
        base = parquet_checkpoint(
            _t(spark, sf_dir, "lineitem").select(
                F.col("l_quantity").cast("double").alias("x_qty"),
                F.col("l_extendedprice").cast("double").alias("y"),
            ),
            "qreg-base",
        )
        rows = [
            (
                m["tau"],
                round(m["coef"]["x_qty"], 4),
                round(m["intercept"], 4),
                m["n"],
                m["n_iter"],
                round(m["frac_below"], 4),
            )
            for m in quantile_reg_fit_multi(
                base, ["x_qty"], "y", taus=[0.1, 0.5, 0.9]
            )
        ]
        _QREG_MEMO[key] = rows
    return spark.createDataFrame(
        rows,
        "tau double, slope_quantity double, intercept double, "
        "n bigint, n_iter int, frac_below double",
    ).orderBy("tau")


@register(
    "pipeline_quality_calibration",
    oracle=None,
    note=(
        "extension (r7): measured calibration of the fitted quality "
        "classifier — reliability buckets + Brier score "
        "(Niculescu-Mizil & Caruana 2005): a p>=0.9 keep-filter is "
        "only as good as P(target | p~0.9) actually being ~0.9, so "
        "the curve is MEASURED next to the model (the measured-recall "
        "posture applied to the classifier itself; "
        "features_isotonic_calibration is the sibling remediation "
        "when it bows). Reuses the fixture-memoized fit "
        "(registry._quality_model) — the report itself is one scored "
        "pass + one groupBy. part='reliability' rows (bucket, n, "
        "mean_p, frac_target) + part='brier' summary (mean_p carries "
        "the Brier score, frac_target the base rate). The composed "
        "isotonic remediation is its own registered query since r8 "
        "(pipeline_quality_remediation) so this entry's bench prior "
        "stays comparable. Brier-vs-hand-computed parity and "
        "separation behavior pinned in tests/test_features.py"
    ),
)
def q_pipeline_quality_calibration(spark, sf_dir):
    from etl_hero_spark.features import quality_calibration_report
    from etl_hero_spark.registry import _quality_model

    docs = _t(spark, sf_dir, "documents")
    return quality_calibration_report(
        docs,
        F.col("source") == "src0",
        _quality_model(spark, sf_dir, dim=16),
    )


@register(
    "pipeline_quality_remediation",
    oracle=None,
    note=(
        "extension (r8, VERDICT r7 #6): the isotonic remediation "
        "COMPOSED onto the quality classifier's measured calibration — "
        "when the reliability curve bows, fit isotonic PAV on the "
        "classifier's quantized scores over one deterministic xxhash "
        "half of the corpus, apply the monotone map to the OTHER half "
        "via the existing broadcast interval join (isotonic_apply), "
        "and report the OUT-OF-SAMPLE before/after panel: "
        "part='reliability_raw'/'reliability_calibrated' + "
        "'brier_raw'/'brier_calibrated' (mean_p carries the Brier "
        "score on those rows). One checkpointed scored pass feeds the "
        "fit and the apply; the PAV fold is bounded by the quantized "
        "score grid. Rows-only (the fit is corpus-derived — "
        "un-oracle-able as a static SQL string); the planted-"
        "miscalibration Brier win, monotone calibrated curve, and "
        "train/serve symmetry pinned in tests/test_features.py"
    ),
)
def q_pipeline_quality_remediation(spark, sf_dir):
    from etl_hero_spark.features import quality_calibration_remediate
    from etl_hero_spark.registry import _quality_model

    docs = _t(spark, sf_dir, "documents")
    return quality_calibration_remediate(
        docs,
        F.col("source") == "src0",
        _quality_model(spark, sf_dir, dim=16),
    )


@register(
    "sql_forecast_revenue",
    oracle=None,
    note=(
        "extension (r9, TPC-H Q6 — the canonical single-scan "
        "conditional aggregate, fully expressible on the fixture): "
        "revenue delta from hypothetically eliminating small-quantity "
        "discounts in one ship-year — ONE lineitem scan with every "
        "predicate (shipdate range, discount band, quantity cap) "
        "pushed to the parquet reader, one global aggregate, zero "
        "shuffles beyond the final partial-merge. The discount band "
        "compares doubles against double-cast literals on BOTH "
        "engines (the fixture's 2dp grid round-trips exactly). "
        "revenue = sum(extendedprice * discount) accumulated in exact "
        "decimal ((18,2)x(18,6) -> (37,8), unclamped in Spark, int128 "
        "in DuckDB) and emitted as the UNROUNDED IEEE double of the "
        "exact sum. At 100 TB this is the pure scan-throughput "
        "benchmark: no join, no wide shuffle — the plan is the scan. "
        "DuckDB parity in tests/test_relational_extras.py"
    ),
)
def q_sql_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,6)")
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "sql_nation_profit",
    oracle=None,
    note=(
        "extension (r9, TPC-H Q9 shape, no-partsupp adaptation — the "
        "Q11/Q20 precedent): profit per supplier nation per order "
        "year over parts matching a name fragment. The fixture has no "
        "partsupp, so supply cost stands in as 0.6 * p_retailprice * "
        "l_quantity (deterministic, same arithmetic shape as "
        "ps_supplycost * l_quantity). The 5-table star joins "
        "broadcast part (name-filtered) and the supplier->nation dim; "
        "lineitem->orders rides the orderkey equi-join (AQE picks "
        "broadcast at fixture scale; co-partitioned shuffle at 100 "
        "TB). Revenue and cost accumulate as SEPARATE exact decimal "
        "sums ((18,2)x(18,6) and (18,2)x(18,2) — both unclamped) and "
        "combine as IEEE doubles ONCE per group row "
        "(profit = rev - 0.6*cost), so the result is bit-identical "
        "cross-engine with no 38-precision clamp anywhere. DuckDB "
        "parity in tests/test_relational_extras.py"
    ),
)
def q_sql_nation_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supnat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)")
        - F.col("l_discount").cast("decimal(18,6)")
    )
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(F.broadcast(supnat), li["l_suppkey"] == supnat["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            (
                F.sum(rev).cast("double")
                - F.lit(0.6) * F.sum(cost).cast("double")
            ).alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "sql_min_cost_supplier",
    oracle=None,
    note=(
        "extension (r9, TPC-H Q2 shape, no-partsupp adaptation): for "
        "each qualifying part (size cap + type), the EUROPE supplier "
        "with the MINIMUM per-unit shipped price — the correlated "
        "scalar-min subquery joined back on equality, decorrelated: "
        "per-(part, supplier) unit costs compute ONCE behind a "
        "checkpoint (two consumers: the per-part min and the "
        "join-back — the self-join re-execution gotcha), the min "
        "table joins back on (part, cost) equality. unit_cost = "
        "min(l_extendedprice / l_quantity) is a MIN of IEEE "
        "quotients — order-independent, no accumulation, bit-exact "
        "cross-engine. Region/nation/supplier dims broadcast; the "
        "part filter broadcasts into the join-back. Deterministic "
        "full-order + LIMIT 100 (Q2's top-100 contract). DuckDB "
        "parity in tests/test_relational_extras.py"
    ),
)
def q_sql_min_cost_supplier(spark, sf_dir):
    from etl_hero_spark.checkpoint import parquet_checkpoint

    eur_sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    costs = parquet_checkpoint(
        li.join(
            F.broadcast(eur_sup.select("s_suppkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost")
        ),
        "q2-pair-costs",
    )
    best = costs.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("unit_cost").alias("_best")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") < 11) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    return (
        costs.join(
            best,
            (costs["l_partkey"] == best["_pk"])
            & (costs["unit_cost"] == best["_best"]),
        )
        .join(F.broadcast(parts), costs["l_partkey"] == parts["p_partkey"])
        .join(eur_sup, costs["l_suppkey"] == eur_sup["s_suppkey"])
        .select(
            F.round(F.col("s_acctbal").cast("double"), 2).alias(
                "s_acctbal"
            ),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost",
        )
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )
