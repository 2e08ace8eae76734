"""Nullity correlation, class balancing, JSONL quarantine, and window
rank analytics vs Python/DuckDB references."""

import collections
import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.registry import all_queries
from etl_hero_spark.sampling import balance_classes

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_nullity_corr_matches_reference(spark, qs):
    got = {
        (r["col_a"], r["col_b"]): (
            r["n_null_a"], r["n_null_b"], r["n_null_both"], r["corr"]
        )
        for r in qs["profile_nullity_corr"](spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.select("l_orderkey", "l_linenumber").collect()
    flags = {
        "price_n": [int(r[0] % 97 == 0) for r in rows],
        "qty_n": [int(r[0] % 97 == 0 or r[0] % 89 == 0) for r in rows],
        "disc_n": [int(r[1] % 7 == 0) for r in rows],
        "tax_full": [0] * len(rows),
    }
    n = len(rows)
    for (a, b), (na, nb, nab, corr) in got.items():
        fa, fb = flags[a], flags[b]
        sa, sb = sum(fa), sum(fb)
        sab = sum(x * y for x, y in zip(fa, fb))
        assert (na, nb, nab) == (sa, sb, sab), (a, b)
        den = math.sqrt((n * sa - sa * sa) * (n * sb - sb * sb))
        if den == 0:
            assert corr is None, (a, b)
        else:
            ref = (n * sab - sa * sb) / den
            assert corr == pytest.approx(round(ref, 6), abs=1e-6), (a, b)
    # the planted structure: joint pattern strongly positive, the
    # never-null column undefined against everything
    assert got[("price_n", "qty_n")][3] > 0.5
    assert got[("price_n", "tax_full")][3] is None
    # independent patterns are near zero
    assert abs(got[("disc_n", "price_n")][3]) < 0.1


def _ref_balance(rows, target="min"):
    by_cls = collections.defaultdict(list)
    for did, lang in rows:
        by_cls[lang].append(did)
    counts = sorted(len(v) for v in by_cls.values())
    if target == "min":
        tgt = counts[0]
    else:
        k = len(counts)
        tgt = int(
            counts[k // 2]
            if k % 2
            else (counts[k // 2 - 1] + counts[k // 2]) / 2
        )
    kept = {}
    for lang, ids in by_cls.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        kept[lang] = set(ids[:tgt])
    return kept


def test_balance_classes_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r[0], r[1]) for r in docs.select("doc_id", "lang").collect()]
    ref = _ref_balance(rows)
    got = collections.defaultdict(set)
    for r in balance_classes(docs, "lang", "doc_id").collect():
        got[r["lang"]].add(r["doc_id"])
    assert dict(got) == ref
    sizes = {len(v) for v in got.values()}
    assert len(sizes) == 1  # every class at exactly the minority count


def test_balance_classes_growth_consistent(spark, sf_dir):
    """Adding docs to one class never changes another class's
    survivors (the md5-order reservoir property)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {
        r["doc_id"]
        for r in balance_classes(docs, "lang", "doc_id")
        .filter(F.col("lang") == "de")
        .collect()
    }
    grown = docs.unionByName(
        docs.filter(F.col("lang") == "en").withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
    )
    after = {
        r["doc_id"]
        for r in balance_classes(grown, "lang", "doc_id")
        .filter(F.col("lang") == "de")
        .collect()
    }
    assert base == after


def test_jsonl_quarantine_counts_planted_defects(spark, qs):
    rows = {
        (r["part"], r["detail"]): (r["n_rows"], r["n_corrupt"])
        for r in qs["quality_quarantine_jsonl"](spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r[0] for r in docs.select("doc_id").collect()]
    n_bad = sum(1 for i in ids if i % 13 == 0 or i % 17 == 0)
    report = [v for (p, _), v in rows.items() if p == "report"][0]
    assert report == (len(ids), n_bad)
    # clean per-lang counts add up to the non-defective lines
    langs = {
        d: v[0] for (p, d), v in rows.items() if p == "clean_lang"
    }
    ref = collections.Counter(
        r["lang"]
        for r in docs.select("doc_id", "lang").collect()
        if r["doc_id"] % 13 != 0 and r["doc_id"] % 17 != 0
    )
    assert langs == dict(ref)


def test_window_percentiles_match_duckdb(spark, qs):
    got = [
        (
            r["c_mktsegment"], r["o_orderkey"],
            r["pct_rank"], r["cume_dist"], r["quartile"],
        )
        for r in qs["window_order_percentiles"](spark, SF)
        .orderBy("c_mktsegment", "o_orderkey")
        .collect()
    ]
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT c_mktsegment, o_orderkey,
               round(percent_rank() OVER w, 9),
               round(cume_dist() OVER w, 9),
               ntile(4) OVER w
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON c_custkey = o_custkey
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
        ORDER BY c_mktsegment, o_orderkey
        """
    ).fetchall()
    assert got == [tuple(r) for r in ref]
