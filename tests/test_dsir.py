"""DSIR importance weighting + Gumbel-top-k resampling vs pure-Python
references (hashlib buckets, math.log ratios) and planted-vocabulary
orderings."""

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_hero_spark.dsir import dsir_log_weights, dsir_resample

B = 64
ALPHA = 0.5


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:14], 16) % B


def _features(text: str):
    toks = [t.lower() for t in text.split()]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights(rows):
    """rows: (id, text, is_target) -> {id: (n_features, log_weight)}."""
    t_counts, r_counts = collections.Counter(), collections.Counter()
    for _id, text, is_t in rows:
        for f_ in _features(text):
            b = _bucket(f_)
            r_counts[b] += 1
            if is_t:
                t_counts[b] += 1
    tt = sum(t_counts.values())
    tr = sum(r_counts.values())
    ratio = {
        b: round(
            math.log((t_counts[b] + ALPHA) / (tt + ALPHA * B))
            - math.log((r_counts[b] + ALPHA) / (tr + ALPHA * B)),
            12,
        )
        for b in r_counts
    }
    out = {}
    for _id, text, is_t in rows:
        buckets = collections.Counter(_bucket(f_) for f_ in _features(text))
        lw = sum(c * ratio[b] for b, c in buckets.items())
        out[_id] = (sum(buckets.values()), round(lw, 6))
    return out


FIXTURE = [
    (1, "alpha beta gamma alpha", True),
    (2, "alpha beta beta", True),
    (3, "delta epsilon zeta delta epsilon", False),
    (4, "alpha delta zeta", False),
    (5, "", False),
    (6, "eta theta iota kappa", False),
]


def test_weights_match_python_reference(spark):
    df = spark.createDataFrame(
        FIXTURE, "doc_id long, text string, is_t boolean"
    )
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_log_weights(
            df, F.col("is_t"), n_buckets=B, alpha=ALPHA
        ).collect()
    }
    want = _ref_weights(FIXTURE)
    want[5] = (0, 0.0)  # empty doc: no features, no evidence
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6), k


def test_target_vocabulary_scores_above_raw_vocabulary(spark):
    """Docs written in the target domain's vocabulary must outweigh
    docs written in raw-only vocabulary — the whole point of DSIR."""
    rows = (
        [(i, "alpha beta gamma delta", True) for i in range(20)]
        + [(100 + i, "alpha beta gamma delta", False) for i in range(3)]
        + [(200 + i, "omega psi chi phi", False) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(df, F.col("is_t"), n_buckets=B).collect()
    }
    assert got[100] > 0 > got[200]
    assert got[100] == got[101] == got[102]  # same text, same weight


def test_weights_are_repartition_invariant(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string, is_t boolean")
    a = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(df, F.col("is_t"), n_buckets=B).collect()
    }
    b = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            df.repartition(7), F.col("is_t"), n_buckets=B
        ).collect()
    }
    assert a == b  # decimal-exact sums over 12dp-rounded ratios


def test_resample_is_deterministic_and_enriches_target(spark):
    rows = (
        [(i, "alpha beta gamma", True) for i in range(30)]
        + [(1000 + i, "alpha beta gamma", False) for i in range(30)]
        + [(2000 + i, "omega psi chi", False) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = dsir_log_weights(df, F.col("is_t"), n_buckets=B).select(
        "doc_id", "is_t", "log_weight"
    )
    picked = dsir_resample(w, budget=30).collect()
    assert len(picked) == 30
    again = dsir_resample(w.repartition(5), budget=30).collect()
    assert sorted(r["doc_id"] for r in picked) == sorted(
        r["doc_id"] for r in again
    )
    # target-vocab docs (ids < 2000) hold positive weights: they must
    # dominate the selection over the negative-weight omega docs
    n_high = sum(1 for r in picked if r["doc_id"] < 2000)
    assert n_high >= 24, n_high


def test_resample_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 0.0)], "doc_id long, log_weight double")
    with pytest.raises(ValueError, match="budget"):
        dsir_resample(df, budget=0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(df, budget=1, temperature=0.0)


def test_pipeline_dsir_curate_stage_accounting(spark, sf_dir):
    """Composition pins: budget honored, contaminated docs really
    leave, per-source counts sum to selected minus contaminated, and
    src0 (the target domain) is enriched relative to its corpus share."""
    from etl_hero_spark.registry import all_queries

    rows = all_queries()["pipeline_dsir_curate"](spark, sf_dir).collect()
    assert rows
    n_selected = rows[0]["n_selected"]
    n_cont = rows[0]["n_contaminated"]
    assert n_selected == 300
    assert sum(r["n_docs"] for r in rows) == n_selected - n_cont
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.count()
    src0 = docs.filter(F.col("source") == "src0").count()
    got_src0 = next(r["n_docs"] for r in rows if r["source"] == "src0")
    kept = n_selected - n_cont
    assert got_src0 / kept > src0 / total, "target domain not enriched"


def _ref_kl_report(rows, budget, temperature=1.0):
    """Pure-Python mirror of dsir_kl_report over (id, text, is_target)
    rows: same md5 buckets, same 12dp-rounded terms, same Gumbel keys."""
    t_counts, r_counts = collections.Counter(), collections.Counter()
    per_doc = {}
    for _id, text, is_t in rows:
        buckets = collections.Counter(_bucket(f_) for f_ in _features(text))
        per_doc[_id] = buckets
        for b, c in buckets.items():
            r_counts[b] += c
            if is_t:
                t_counts[b] += c
    tt, tr = sum(t_counts.values()), sum(r_counts.values())
    ratio = {
        b: round(
            math.log((t_counts[b] + ALPHA) / (tt + ALPHA * B))
            - math.log((r_counts[b] + ALPHA) / (tr + ALPHA * B)),
            12,
        )
        for b in r_counts
    }
    lw = {
        _id: round(sum(c * ratio[b] for b, c in bk.items()), 6)
        for _id, bk in per_doc.items()
    }

    def gumbel_key(_id):
        u = (
            int(hashlib.md5(f"dsir:{_id}".encode()).hexdigest()[:13], 16)
            + 1.0
        ) / float((1 << 52) + 2)
        return lw[_id] / temperature + -math.log(-math.log(u))

    chosen = sorted(lw, key=lambda i: (-gumbel_key(i), i))[:budget]
    s_counts = collections.Counter()
    for _id in chosen:
        for b, c in per_doc[_id].items():
            s_counts[b] += c
    ts = sum(s_counts.values())

    def kl(qc, qt):
        total = 0.0
        for b in r_counts:
            p = (t_counts[b] + ALPHA) / (tt + ALPHA * B)
            q = (qc[b] + ALPHA) / (qt + ALPHA * B)
            total += round(p * (math.log(p) - math.log(q)), 12)
        p0 = ALPHA / (tt + ALPHA * B)
        n_missing = B - len(r_counts)
        q0r = ALPHA / (qt + ALPHA * B)
        total += n_missing * round(p0 * (math.log(p0) - math.log(q0r)), 12)
        return total

    return {
        "n_buckets_occupied": len(r_counts),
        "kl_target_raw": round(kl(r_counts, tr), 6),
        "kl_target_selected": round(kl(s_counts, ts), 6),
    }


def test_kl_report_matches_python_reference(spark):
    from etl_hero_spark.dsir import dsir_kl_report

    rows = FIXTURE + [
        (7, "alpha beta alpha beta gamma", False),
        (8, "delta delta epsilon", False),
        (9, "alpha gamma beta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = dsir_kl_report(
        df, F.col("is_t"), budget=4, n_buckets=B, alpha=ALPHA
    ).first()
    want = _ref_kl_report(rows, budget=4)
    assert got["n_buckets_occupied"] == want["n_buckets_occupied"]
    assert got["kl_target_raw"] == pytest.approx(
        want["kl_target_raw"], abs=1e-6
    )
    assert got["kl_target_selected"] == pytest.approx(
        want["kl_target_selected"], abs=1e-6
    )
    assert got["kl_reduction"] == pytest.approx(
        round(got["kl_target_raw"] - got["kl_target_selected"], 6),
        abs=1e-9,
    )


def test_kl_report_selection_reduces_target_divergence(spark, sf_dir):
    """On the documents fixture, resampling toward src0 must move the
    selected distribution closer to the target than the raw pool —
    the quality claim the report exists to measure."""
    from etl_hero_spark.dsir import dsir_kl_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = dsir_kl_report(
        docs, F.col("source") == "src0", budget=100, n_buckets=256
    ).first()
    assert row["kl_target_raw"] > 0
    assert row["kl_reduction"] > 0
    assert row["kl_target_selected"] < row["kl_target_raw"]
