"""ACF and PMI collocations vs exact pure-Python references."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from etl_hero_spark.registry import _events
from etl_hero_spark.textops import pmi_collocations, tokens_expr
from etl_hero_spark.timeseries import acf


def _ref_acf(counts_by_t, max_lag):
    lo, hi = min(counts_by_t), max(counts_by_t)
    y = [float(counts_by_t.get(t, 0)) for t in range(lo, hi + 1)]
    n = len(y)
    ybar = sum(y) / n
    den = sum((v - ybar) ** 2 for v in y)
    out = {}
    for k in range(1, max_lag + 1):
        num = sum((y[t] - ybar) * (y[t - k] - ybar) for t in range(k, n))
        out[k] = (n - k, num / den)
    return out


def test_acf_matches_reference_on_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {r["lag"]: (r["n_pairs"], r["acf"]) for r in acf(ev, "ts", 12).collect()}
    counts = collections.Counter(
        r[0]
        for r in ev.select(
            (F.unix_timestamp("ts") / 3600).cast("bigint")
        ).collect()
    )
    ref = _ref_acf(counts, 12)
    assert set(got) == set(range(1, 13))
    for k in ref:
        assert got[k][0] == ref[k][0], f"n_pairs lag {k}"
        assert got[k][1] == pytest.approx(ref[k][1], abs=1e-9), f"acf lag {k}"


def test_acf_periodic_fixture_peaks_at_period(spark):
    """A period-3 spike train: r_3 and r_6 dominate every other lag,
    and empty buckets between spikes count as real zeros."""
    rows = [(f"2026-01-01 {h:02d}:00:00",) for h in range(0, 24, 3)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    got = {r["lag"]: r["acf"] for r in acf(df, "ts", 6).collect()}
    assert got[3] > got[1] and got[3] > got[2]
    assert got[6] > got[4] and got[6] > got[5]
    assert got[3] == pytest.approx(1.0, abs=0.15)  # near-perfect period


def _ref_pmi(texts, min_count):
    pair = collections.Counter()
    for t in texts:
        toks = [w.lower() for w in t.split()]
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] += 1
    pair = {k: v for k, v in pair.items() if v >= min_count}
    n = sum(pair.values())
    ca = collections.Counter()
    cb = collections.Counter()
    for (a, b), v in pair.items():
        ca[a] += v
        cb[b] += v
    return {
        k: math.log(v) + math.log(n) - math.log(ca[k[0]]) - math.log(cb[k[1]])
        for k, v in pair.items()
    }


def test_pmi_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = pmi_collocations(docs, "doc_id", "text", min_count=2, top_k=20)
    got = [(r["tok"], r["next_tok"], r["n_pair"], r["pmi"]) for r in got.collect()]
    assert got, "fixture produced no collocations"
    texts = [r[0] for r in docs.select("text").collect()]
    ref = _ref_pmi(texts, 2)
    # every returned pair scores exactly as the reference says, and the
    # list is the reference's top-k under the same ordering
    for tok, nxt, n_pair, pmi in got:
        assert ref[(tok, nxt)] == pytest.approx(pmi, abs=1e-6)
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(t, nx) for (t, nx), _ in ranked] == [(t, nx) for t, nx, _, _ in got]


def test_pmi_min_count_floors_hapax(spark):
    rows = [(1, "alpha beta alpha beta alpha beta"), (2, "gamma delta")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = pmi_collocations(df, "doc_id", "text", min_count=2, top_k=10).collect()
    pairs = {(r["tok"], r["next_tok"]) for r in got}
    assert ("gamma", "delta") not in pairs  # hapax pair floored
    assert ("alpha", "beta") in pairs


def test_pmi_tokens_match_engine_tokenizer(spark, sf_dir):
    """The Python reference's .split() must agree with tokens_expr on
    the fixture (whitespace corpus) — guard the convention lockstep."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    eng = docs.select(F.size(tokens_expr("text")).alias("n")).collect()
    py = [len(r[0].split()) for r in docs.select("text").collect()]
    assert [r["n"] for r in eng] == py


def test_acf_constant_series_is_null(spark):
    """Zero-variance series: every acf is NULL (undefined), not 0 or
    NaN — absence of signal, not absence of correlation."""
    const = spark.createDataFrame(
        [(f"2026-01-01 {h:02d}:00:00",) for h in range(6)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    got = acf(const, "ts", 3).collect()
    assert len(got) == 3 and all(r["acf"] is None for r in got)
