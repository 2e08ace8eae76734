"""WOE encoding and one-way ANOVA vs exact pure-Python references."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from etl_hero_spark.features import woe_encoding
from etl_hero_spark.stattests import anova_oneway


def test_anova_matches_reference(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = anova_oneway(cust, "c_acctbal", "c_mktsegment").first()
    groups = collections.defaultdict(list)
    for r in cust.select("c_acctbal", "c_mktsegment").collect():
        if r[0] is not None:
            groups[r[1]].append(float(r[0]))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ss_b = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ss_w = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f = (ss_b / (k - 1)) / (ss_w / (n - k))
    assert got["k_groups"] == k and got["n_total"] == n
    assert got["df1"] == k - 1 and got["df2"] == n - k
    assert got["ss_between"] == pytest.approx(ss_b, rel=1e-9)
    assert got["ss_within"] == pytest.approx(ss_w, rel=1e-9)
    assert got["f_stat"] == pytest.approx(round(f, 6), abs=1e-6)


def test_anova_identical_groups_f_zero(spark):
    rows = [(float(v), g) for v in (1, 2, 3) for g in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "v double, g string")
    got = anova_oneway(df, "v", "g").first()
    assert got["f_stat"] == 0.0 and got["ss_between"] == 0.0


def test_woe_matches_reference(spark):
    rows = [("a", True)] * 8 + [("a", False)] * 2 + \
           [("b", True)] * 3 + [("b", False)] * 7 + \
           [("c", False)] * 5 + [(None, True)] * 2
    df = spark.createDataFrame(rows, "cat string, y boolean")
    got = {
        r["category"]: (r["n_pos"], r["n_neg"], r["woe"], r["iv_contrib"])
        for r in woe_encoding(df, "cat", "y", smoothing=0.5).collect()
    }
    pos = collections.Counter()
    neg = collections.Counter()
    for c, y in rows:
        key = None if c is None else c
        (pos if y else neg)[key] += 1
    cats = set(pos) | set(neg)
    tp, tn, k, s = sum(pos.values()), sum(neg.values()), len(cats), 0.5
    for c in cats:
        p = (pos[c] + s) / (tp + s * k)
        q = (neg[c] + s) / (tn + s * k)
        w = math.log(p / q)
        g = got[str(c) if c is not None else None]
        assert g[0] == pos[c] and g[1] == neg[c], c
        assert g[2] == pytest.approx(round(w, 6), abs=1e-6), c
        assert g[3] == pytest.approx(round((p - q) * w, 6), abs=1e-6), c
    # NULL category is its own row; zero-pos category 'c' stays finite
    assert None in got and got["c"][2] == got["c"][2]  # not NaN


def test_woe_registered_query_labels_by_semi_membership(spark, sf_dir):
    from etl_hero_spark.registry import all_queries

    got = {
        r["category"]: (r["n_pos"], r["n_neg"])
        for r in all_queries()["features_woe_encoding"](
            spark, sf_dir
        ).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ret_keys = {
        r[0]
        for r in li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    ref = collections.defaultdict(lambda: [0, 0])
    for r in orders.select("o_orderkey", "o_orderpriority").collect():
        ref[r[1]][0 if r[0] in ret_keys else 1] += 1
    assert got == {c: tuple(v) for c, v in ref.items()}


def test_entropy_matches_reference(spark, sf_dir):
    from etl_hero_spark.profile import column_entropy

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["column"]: (r["n_distinct"], r["entropy"], r["entropy_norm"])
        for r in column_entropy(
            orders, ["o_orderstatus", "o_orderpriority"]
        ).collect()
    }
    for col in ("o_orderstatus", "o_orderpriority"):
        vals = collections.Counter(
            str(r[0]) if r[0] is not None else None
            for r in orders.select(col).collect()
        )
        n = sum(vals.values())
        h = -sum(c / n * math.log2(c / n) for c in vals.values())
        k = len(vals)
        g = got[col]
        assert g[0] == k
        assert g[1] == pytest.approx(round(h, 9), abs=1e-9)
        assert g[2] == pytest.approx(round(h / math.log2(k), 9), abs=1e-9)


def test_entropy_extremes(spark):
    from etl_hero_spark.profile import column_entropy

    df = spark.createDataFrame(
        [("x", a, None) for a in "abcd"] * 3,
        "const string, uniform string, nulls string",
    )
    got = {
        r["column"]: (r["entropy"], r["entropy_norm"], r["n_distinct"])
        for r in column_entropy(df, ["const", "uniform", "nulls"]).collect()
    }
    assert got["const"] == (0.0, 0.0, 1)
    assert got["uniform"][0] == pytest.approx(2.0)  # log2(4)
    assert got["uniform"][1] == pytest.approx(1.0)
    assert got["nulls"] == (0.0, 0.0, 1)  # all-NULL = constant


def test_woe_null_labels_drop(spark):
    """Unlabeled rows are not negative evidence — they drop."""
    rows = [("a", True), ("a", False), ("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "cat string, y boolean")
    got = {
        r["category"]: (r["n_pos"], r["n_neg"])
        for r in woe_encoding(df, "cat", "y").collect()
    }
    assert got["a"] == (1, 1)
    # 'b' has ONLY unlabeled rows: present with zero counts or absent —
    # it must not appear as (0, 1)
    assert got.get("b", (0, 0)) == (0, 0)


def test_balance_classes_median_target(spark):
    from etl_hero_spark.sampling import balance_classes

    rows = (
        [(i, "a") for i in range(10)]
        + [(i + 100, "b") for i in range(4)]
        + [(i + 200, "c") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    got = collections.Counter(
        r["lang"]
        for r in balance_classes(
            df, "lang", "doc_id", target="median"
        ).collect()
    )
    # median class size = 4: 'a' cut to 4, 'b' kept, 'c' keeps its 2
    assert got == {"a": 4, "b": 4, "c": 2}
