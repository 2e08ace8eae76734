"""Two-sample hypothesis tests vs an exact pure-Python reference
(same formulas, same tie conventions), plus tie-heavy and edge
fixtures. The reference is computed inline so the pinned convention
(no continuity correction, one-term KS tail) is one formula in one
place."""

import collections
import math

import pytest

from etl_hero_spark.stattests import ks_2samp, mann_whitney_u, welch_ttest


def _ref(rows, a_key, b_key):
    a = sorted(v for v, g in rows if g == a_key and v is not None)
    b = sorted(v for v, g in rows if g == b_key and v is not None)
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    dfw = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    ca, cb = collections.Counter(a), collections.Counter(b)
    start, r2, ties = 0, 0, 0
    for v in sorted(set(a + b)):
        tcnt = ca[v] + cb[v]
        r2 += ca[v] * (2 * start + tcnt + 1)
        ties += tcnt**3 - tcnt
        start += tcnt
    u = r2 / 2 - na * (na + 1) / 2
    mu = na * nb / 2
    n = na + nb
    sigma = math.sqrt(na * nb / 12 * ((n + 1) - ties / (n * (n - 1))))
    cum_a = cum_b = best = 0
    at = None
    for v in sorted(set(a + b)):
        cum_a += ca[v]
        cum_b += cb[v]
        num = abs(cum_a * nb - cum_b * na)
        if num > best:
            best, at = num, v
    d = best / (na * nb)
    p = min(1.0, 2 * math.exp(-2 * d * d * na * nb / n))
    return {
        "n_a": na, "n_b": nb,
        "t_stat": t, "df_welch": dfw,
        "mean_a": ma, "mean_b": mb, "var_a": va, "var_b": vb,
        "u_stat": u, "mu_u": mu, "sigma_u": sigma,
        "z_score": (u - mu) / sigma,
        "d_stat": d, "d_at": at, "p_asymptotic": p,
    }


@pytest.fixture(scope="module")
def cust_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return [
        (float(r[0]), r[1])
        for r in df.select("c_acctbal", "c_mktsegment").collect()
    ]


def test_welch_matches_reference(spark, sf_dir, cust_rows):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = welch_ttest(
        cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
    ).first()
    ref = _ref(cust_rows, "BUILDING", "MACHINERY")
    assert got["n_a"] == ref["n_a"] and got["n_b"] == ref["n_b"]
    for k in ("mean_a", "mean_b", "var_a", "var_b", "t_stat", "df_welch"):
        assert got[k] == pytest.approx(round(ref[k], 6), abs=1e-6), k


def test_mann_whitney_matches_reference(spark, sf_dir, cust_rows):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = mann_whitney_u(
        cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
    ).first()
    ref = _ref(cust_rows, "BUILDING", "MACHINERY")
    for k in ("u_stat", "mu_u", "sigma_u", "z_score"):
        assert got[k] == pytest.approx(round(ref[k], 6), abs=1e-6), k


def test_ks_matches_reference(spark, sf_dir, cust_rows):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = ks_2samp(
        cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
    ).first()
    ref = _ref(cust_rows, "BUILDING", "MACHINERY")
    assert got["d_stat"] == pytest.approx(round(ref["d_stat"], 6))
    assert got["d_at"] == pytest.approx(ref["d_at"])
    assert got["p_asymptotic"] == pytest.approx(
        round(ref["p_asymptotic"], 6), abs=1e-6
    )


def test_tie_heavy_fixture(spark):
    """Integer-valued, tie-saturated data: the tie-averaged rank and
    tie-corrected sigma paths are the whole computation here."""
    rows = [(float(v), g) for v, g in [
        (1, "a"), (1, "a"), (2, "a"), (2, "a"), (2, "a"), (3, "a"),
        (5, "a"), (1, "b"), (2, "b"), (2, "b"), (3, "b"), (3, "b"),
        (4, "b"), (4, "b"), (5, "b"),
    ]]
    df = spark.createDataFrame(rows, "v double, g string")
    ref = _ref(rows, "a", "b")
    mw = mann_whitney_u(df, "v", "g", "a", "b").first()
    for k in ("u_stat", "mu_u", "sigma_u", "z_score"):
        assert mw[k] == pytest.approx(round(ref[k], 6), abs=1e-6), k
    ks = ks_2samp(df, "v", "g", "a", "b").first()
    assert ks["d_stat"] == pytest.approx(round(ref["d_stat"], 6))
    assert ks["d_at"] == pytest.approx(ref["d_at"])


def test_identical_groups_are_null_effect(spark):
    """Same distribution in both groups: t=0, z=0, D=0 exactly
    (integer/decimal arithmetic — no float wobble to approx away)."""
    vals = [(float(v), g) for v in (1, 2, 3, 4, 5, 6) for g in ("a", "b")]
    df = spark.createDataFrame(vals, "v double, g string")
    assert welch_ttest(df, "v", "g", "a", "b").first()["t_stat"] == 0.0
    mw = mann_whitney_u(df, "v", "g", "a", "b").first()
    assert mw["u_stat"] == mw["mu_u"] and mw["z_score"] == 0.0
    ks = ks_2samp(df, "v", "g", "a", "b").first()
    assert ks["d_stat"] == 0.0 and ks["p_asymptotic"] == 1.0


def test_nulls_and_extra_groups_excluded(spark):
    """NULL values drop; rows from groups other than the named two
    never contaminate counts."""
    rows = [(1.0, "a"), (2.0, "a"), (None, "a"), (3.0, "b"), (4.0, "b"),
            (99.0, "c"), (None, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    got = welch_ttest(df, "v", "g", "a", "b").first()
    assert (got["n_a"], got["n_b"]) == (2, 2)
    mw = mann_whitney_u(df, "v", "g", "a", "b").first()
    assert (mw["n_a"], mw["n_b"]) == (2, 2)
    # a < b everywhere: U = 0, D = 1
    assert mw["u_stat"] == 0.0
    assert ks_2samp(df, "v", "g", "a", "b").first()["d_stat"] == 1.0


def test_bootstrap_ci_matches_hashlib_reference(spark, sf_dir):
    """The deterministic Poisson weights (md5 inverse-CDF) and the
    replicate-mean percentiles reproduce bit-for-bit in pure Python."""
    import hashlib

    from etl_hero_spark.stattests import _POIS1_CDF, bootstrap_ci_mean

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = bootstrap_ci_mean(
        cust, "c_acctbal", "c_custkey", n_replicates=60,
        hash_method="md5",
    ).first()

    def w_of(u):
        for k, c in enumerate(_POIS1_CDF):
            if u < c:
                return k
        return len(_POIS1_CDF)

    rows = [
        (str(r[0]), float(r[1]))
        for r in cust.select("c_custkey", "c_acctbal").collect()
        if r[1] is not None
    ]
    means = []
    for b in range(60):
        sw = swx = 0.0
        for i, x in rows:
            u = (
                int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:13], 16)
                / 2**52
            )
            w = w_of(u)
            sw += w
            swx += w * x
        means.append(swx / sw)
    means.sort()

    def perc(v, p):
        h = (len(v) - 1) * p
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        return v[lo] + (h - lo) * (v[hi] - v[lo])

    assert got["n_rows"] == len(rows)
    assert got["ci_lo"] == pytest.approx(round(perc(means, 0.025), 6), abs=1e-6)
    assert got["ci_hi"] == pytest.approx(round(perc(means, 0.975), 6), abs=1e-6)
    assert got["point_mean"] == pytest.approx(
        round(sum(x for _, x in rows) / len(rows), 6), abs=1e-6
    )
    # the CI brackets the point estimate
    assert got["ci_lo"] < got["point_mean"] < got["ci_hi"]


def test_bootstrap_ci_xxhash_path_same_semantics(spark, sf_dir):
    """The registered xxhash64 weight path (VERDICT r4 #6: JVM-native,
    no hex/conv round-trip) carries the SAME estimator semantics as
    the md5 spec path: identical n/point estimate, repartition-
    invariant CI, and a CI statistically indistinguishable from the
    md5 path's (both are B=200 draws of the same Poisson bootstrap —
    they differ only in which uniform stream drives the weights)."""
    from etl_hero_spark.stattests import bootstrap_ci_mean

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fast = bootstrap_ci_mean(
        cust, "c_acctbal", "c_custkey", n_replicates=200
    ).first()
    slow = bootstrap_ci_mean(
        cust, "c_acctbal", "c_custkey", n_replicates=200,
        hash_method="md5",
    ).first()
    assert fast["n_rows"] == slow["n_rows"]
    assert fast["point_mean"] == slow["point_mean"]
    assert fast["ci_lo"] < fast["point_mean"] < fast["ci_hi"]
    # same bootstrap, different uniform stream: intervals overlap and
    # widths agree within 50%
    w_fast = fast["ci_hi"] - fast["ci_lo"]
    w_slow = slow["ci_hi"] - slow["ci_lo"]
    assert fast["ci_lo"] < slow["ci_hi"] and slow["ci_lo"] < fast["ci_hi"]
    assert 0.5 < w_fast / w_slow < 2.0
    # repartition invariance: the hash keys off (id, b), never the
    # physical layout
    again = bootstrap_ci_mean(
        cust.repartition(7), "c_acctbal", "c_custkey", n_replicates=200
    ).first()
    assert (again["ci_lo"], again["ci_hi"]) == (fast["ci_lo"], fast["ci_hi"])
    # the fast path really dropped the hex/conv round-trip
    plan = (
        bootstrap_ci_mean(cust, "c_acctbal", "c_custkey", n_replicates=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" in plan and "conv(" not in plan and "md5" not in plan


def test_bootstrap_ci_narrows_with_n(spark):
    """4x the data should shrink the CI roughly in half — the sanity
    property that separates a bootstrap from a band of noise."""
    import pyspark.sql.functions as F

    from etl_hero_spark.stattests import bootstrap_ci_mean

    base = spark.range(400).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    small = base.filter(F.col("id") < 100)
    wide = bootstrap_ci_mean(small, "v", "id", n_replicates=80).first()
    tight = bootstrap_ci_mean(base, "v", "id", n_replicates=80).first()
    assert (tight["ci_hi"] - tight["ci_lo"]) < (
        wide["ci_hi"] - wide["ci_lo"]
    )


def test_degenerate_inputs_yield_null_not_garbage(spark):
    """n=1 groups and zero-df cases produce NULL statistics (Spark's
    non-ANSI double division), never Inf/NaN garbage — pinned so a
    future ANSI or arithmetic change can't silently alter the
    degenerate contract."""
    from etl_hero_spark.stattests import anova_oneway

    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "b")], "v double, g string"
    )
    got = welch_ttest(df, "v", "g", "a", "b").first()
    assert got["n_a"] == 1 and got["mean_a"] == 1.0
    assert got["var_a"] is None and got["t_stat"] is None
    singletons = spark.createDataFrame(
        [(1.0, "a"), (1.0, "b")], "v double, g string"
    )
    a = anova_oneway(singletons, "v", "g").first()
    assert a["df2"] == 0 and a["f_stat"] is None


def test_weighted_quantile_matches_duckdb_window_replication(spark, sf_dir):
    """Exact weighted quantiles == a DuckDB cumulative-window replica
    with the identical inclusive-threshold convention."""
    import duckdb

    from etl_hero_spark.stattests import weighted_quantile

    got = weighted_quantile(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "l_extendedprice",
        "l_quantity",
        ps=[0.25, 0.5, 0.9],
    ).first()
    want = duckdb.sql(
        f"""
        WITH v AS (
          SELECT l_extendedprice AS v,
                 sum(CAST(l_quantity AS DECIMAL(38,6))) AS w
          FROM '{sf_dir}/lineitem.parquet'
          WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
          GROUP BY 1
        ), c AS (
          SELECT v, w,
                 sum(w) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS incl,
                 sum(w) OVER () AS tot
          FROM v
        )
        SELECT count(*) AS n_values,
               round(CAST(max(tot) AS DOUBLE), 6) AS total_weight,
               round(min(CASE WHEN CAST(incl AS DOUBLE)
                 >= 0.25 * CAST(tot AS DOUBLE) THEN v END), 6) AS q25,
               round(min(CASE WHEN CAST(incl AS DOUBLE)
                 >= 0.5 * CAST(tot AS DOUBLE) THEN v END), 6) AS q50,
               round(min(CASE WHEN CAST(incl AS DOUBLE)
                 >= 0.9 * CAST(tot AS DOUBLE) THEN v END), 6) AS q90
        FROM c
        """
    ).fetchone()
    assert got["n_values"] == want[0]
    assert got["total_weight"] == pytest.approx(want[1], abs=1e-6)
    assert got["wq_0_25"] == pytest.approx(want[2], abs=1e-6)
    assert got["wq_0_5"] == pytest.approx(want[3], abs=1e-6)
    assert got["wq_0_9"] == pytest.approx(want[4], abs=1e-6)


def test_weighted_quantile_unit_weights_and_validation(spark):
    from etl_hero_spark.stattests import weighted_quantile

    df = spark.createDataFrame(
        [(float(v), 1.0) for v in (1, 2, 3, 4)] + [(5.0, 0.0), (None, 3.0)],
        "v double, w double",
    )
    row = weighted_quantile(df, "v", "w", ps=[0.5, 1.0]).first()
    # unit weights, lower-tail: p=0.5 -> cum 2 >= 2 at v=2
    assert row["n_values"] == 4  # zero-weight and NULL rows dropped
    assert row["wq_0_5"] == 2.0
    assert row["wq_1_0"] == 4.0
    with pytest.raises(ValueError, match="ps"):
        weighted_quantile(df, "v", "w", ps=[0.0])


def test_spearman_matches_duckdb_and_scipy_semantics(spark, sf_dir):
    """rho == DuckDB's Pearson over tie-averaged window ranks (the
    textbook Spearman with ties), and detects a monotone-nonlinear
    relationship Pearson understates."""
    import duckdb

    from etl_hero_spark.stattests import spearman_corr

    got = spearman_corr(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "l_quantity",
        "l_extendedprice",
    ).first()
    want = duckdb.sql(
        f"""
        WITH b AS (
          SELECT l_quantity AS x, l_extendedprice AS y
          FROM '{sf_dir}/lineitem.parquet'
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        r AS (
          SELECT
            rank() OVER (ORDER BY x)
              + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
            rank() OVER (ORDER BY y)
              + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
          FROM b)
        SELECT count(*) AS n, round(corr(rx, ry), 6) AS rho FROM r
        """
    ).fetchone()
    assert got["n"] == want[0]
    assert got["rho"] == pytest.approx(want[1], abs=2e-6)
    # the synthetic fixture draws price independently of quantity —
    # near-zero rho is the CORRECT answer here (sensitivity to a real
    # monotone signal is pinned by the next test)
    assert got["rho"] is not None and abs(got["rho"]) < 0.2


def test_spearman_monotone_and_degenerate_edges(spark):
    from etl_hero_spark.stattests import spearman_corr

    # perfect monotone (nonlinear) relationship -> rho == 1 exactly
    df = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(1, 40)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").first()
    assert r["rho"] == 1.0 and r["n"] == 39
    # reversed -> -1
    df2 = spark.createDataFrame(
        [(float(i), float(-(i**3))) for i in range(1, 40)],
        "x double, y double",
    )
    assert spearman_corr(df2, "x", "y").first()["rho"] == -1.0
    # constant column -> NULL rho (undefined), not a crash or a 0
    df3 = spark.createDataFrame(
        [(float(i), 7.0) for i in range(10)], "x double, y double"
    )
    r3 = spearman_corr(df3, "x", "y").first()
    assert r3["rho"] is None and r3["n"] == 10


def test_spearman_pairs_matches_single_calls(spark):
    """spearman_corr_pairs must return bit-identical (n, rho) to the
    per-pair spearman_corr calls it replaces (the welch-panel share),
    including a repeated column (one rank table, two pairs), ties and
    a degenerate constant column."""
    import random

    from etl_hero_spark.stattests import spearman_corr, spearman_corr_pairs

    rng = random.Random(7)
    rows = [
        (
            float(rng.randint(0, 30)),          # ties
            round(rng.uniform(0.0, 100.0), 2),  # mostly distinct
            7.0,                                 # constant -> NULL rho
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    pairs = [("a", "b"), ("b", "c"), ("a", "a")]
    got = {
        (r["col_x"], r["col_y"]): (r["n"], r["rho"])
        for r in spearman_corr_pairs(df, pairs).collect()
    }
    assert set(got) == set(pairs) and len(got) == 3
    for x, y in pairs:
        want = spearman_corr(df, x, y).first()
        assert got[(x, y)] == (want["n"], want["rho"]), (x, y)
    assert got[("a", "a")][1] == 1.0
    assert got[("b", "c")][1] is None
