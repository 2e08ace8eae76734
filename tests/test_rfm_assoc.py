"""RFM segmentation and association rules vs pure-Python references."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from etl_hero_spark.analytics import association_rules, rfm_segments


def _interp_percentiles(vals, ps):
    """Spark/numpy 'linear' percentile over sorted values."""
    v = sorted(vals)
    out = []
    for p in ps:
        h = (len(v) - 1) * p
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        out.append(v[lo] + (h - lo) * (v[hi] - v[lo]))
    return out


def _bin(x, cuts):
    """with_quantile_bin semantics: first bin whose cut >= x."""
    for i, c in enumerate(cuts):
        if x <= c:
            return i
    return len(cuts)


def _dedup_cuts(cuts):
    out = []
    for c in cuts:
        if not out or c > out[-1]:
            out.append(c)
    return out


def test_rfm_matches_reference(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["o_custkey"]: (
            r["recency_days"], r["frequency"], r["monetary"],
            r["r_score"], r["f_score"], r["m_score"], r["segment"],
        )
        for r in rfm_segments(
            orders, "o_custkey", "o_orderdate", "o_totalprice", n_bins=5
        ).collect()
    }
    rows = orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    ).collect()
    per = collections.defaultdict(lambda: [None, 0, 0.0])
    for r in rows:
        e = per[r["o_custkey"]]
        e[0] = r["d"] if e[0] is None else max(e[0], r["d"])
        e[1] += 1
        e[2] += float(r["o_totalprice"])
    hmax = max(e[0] for e in per.values())
    rfm = {
        k: ((hmax - e[0]).days, e[1], round(e[2], 10))
        for k, e in per.items()
    }
    ps = [i / 5 for i in range(1, 5)]
    cuts = {
        i: _dedup_cuts(
            _interp_percentiles([v[i] for v in rfm.values()], ps)
        )
        for i in range(3)
    }
    assert set(got) == set(rfm)
    for k, (rec, freq, mon) in rfm.items():
        g = got[k]
        assert (g[0], g[1]) == (rec, freq), k
        assert g[2] == pytest.approx(mon, abs=1e-6), k
        r_s = 5 - _bin(rec, cuts[0])
        f_s = _bin(freq, cuts[1]) + 1
        m_s = _bin(mon, cuts[2]) + 1
        assert (g[3], g[4], g[5]) == (r_s, f_s, m_s), k
        assert g[6] == f"{r_s}{f_s}{m_s}", k


def test_assoc_rules_hand_fixture(spark):
    # baskets: {1:ab, 2:ab, 3:ac, 4:b} -> n_baskets=4
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
            (4, "b")]
    df = spark.createDataFrame(rows, "bk int, it string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["support"], r["confidence"], r["lift"]
        )
        for r in association_rules(
            df, "bk", "it", min_support_count=1
        ).collect()
    }
    # a->b: n_ab=2, d_a=3, d_b=3: supp=.5, conf=2/3, lift=(2*4)/(3*3)
    assert got[("a", "b")] == (
        2, 0.5, round(2 / 3, 6), round(8 / 9, 6)
    )
    # b->a asymmetric confidence: d_b=3 -> same here; c->a conf=1, lift
    assert got[("c", "a")] == (1, 0.25, 1.0, round(4 / 3, 6))


def test_assoc_rules_match_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["support"], r["confidence"], r["lift"]
        )
        for r in association_rules(
            li, "l_orderkey", "l_partkey", min_support_count=3
        ).collect()
    }
    baskets = collections.defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r[0]].add(r[1])
    nb = len(baskets)
    deg = collections.Counter()
    pair = collections.Counter()
    for its in baskets.values():
        for it in its:
            deg[it] += 1
        s = sorted(its)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] += 1
    ref = {}
    for (a, b), n in pair.items():
        if n < 3:
            continue
        for x, y in ((a, b), (b, a)):
            ref[(x, y)] = (
                n,
                round(n / nb, 6),
                round(n / deg[x], 6),
                round(n * nb / (deg[x] * deg[y]), 6),
            )
    assert got == ref
    assert got, "fixture produced no rules at support>=3"
