"""EWMA / CUSUM / Kaplan-Meier / chi-square: recursive per-key sequence
ops pinned against pandas ewm, a Python CUSUM loop, a hand-computed KM
table, and DuckDB SQL."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.profile import chi_square_independence
from etl_hero_spark.timeseries import SeriesCapError, cusum, ewma, km_survival


@pytest.fixture(scope="module")
def series_pdf():
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "k": np.repeat(list("abcd"), 25),
            "t": np.tile(np.arange(25), 4),
            "x": rng.normal(10, 2, 100),
        }
    )
    pdf.loc[pdf.sample(8, random_state=3).index, "x"] = None
    return pdf


@pytest.mark.parametrize("adjust", [False, True])
def test_ewma_matches_pandas(spark, series_pdf, adjust):
    got = (
        ewma(spark.createDataFrame(series_pdf), ["k"], "t", "x",
             alpha=0.3, adjust=adjust)
        .orderBy("k", "t")
        .toPandas()
    )
    want = (
        series_pdf.sort_values(["k", "t"])
        .groupby("k", group_keys=False)
        .apply(lambda g: g["x"].ewm(alpha=0.3, adjust=adjust,
                                    ignore_na=True).mean())
    )
    assert np.allclose(got["ewma"].fillna(-1), want.fillna(-1).values)
    # null inputs surface as carried-forward smoothed values, and the
    # leading row of an all-null prefix is null
    assert got["ewma"].notna().sum() == want.notna().sum()


def test_ewma_oversized_key_excluded_loudly(spark):
    df = spark.createDataFrame(
        [("big", i, float(i)) for i in range(50)]
        + [("ok", i, float(i)) for i in range(5)],
        "k string, t int, x double",
    )
    with pytest.warns(UserWarning, match="exceed max_series_len"):
        out = ewma(df, ["k"], "t", "x", max_series_len=10).collect()
    assert {r["k"] for r in out} == {"ok"}
    with pytest.raises(SeriesCapError):
        ewma(df, ["k"], "t", "x", max_series_len=10,
             on_oversized="error").collect()


def _py_cusum(xs, k=0.5):
    clean = [x for x in xs if x is not None and not np.isnan(x)]
    mu, sig = np.mean(clean), np.std(clean)
    sp = sn = 0.0
    out = []
    for x in xs:
        if x is not None and not np.isnan(x) and sig > 0:
            z = (x - mu) / sig
            sp = max(0.0, sp + z - k)
            sn = max(0.0, sn - z - k)
        out.append((sp, sn))
    return out


def test_cusum_matches_python_reference(spark, series_pdf):
    got = (
        cusum(spark.createDataFrame(series_pdf), ["k"], "t", "x")
        .orderBy("k", "t")
        .toPandas()
    )
    for k, g in series_pdf.sort_values(["k", "t"]).groupby("k"):
        want = _py_cusum(g["x"].tolist())
        sub = got[got.k == k][["s_pos", "s_neg"]].values
        assert np.allclose(np.array(want), sub, atol=1e-6), k


def test_cusum_flags_injected_mean_shift_only(spark):
    rng = np.random.RandomState(11)
    steady = rng.normal(0, 1, 60)
    shifted = np.concatenate([rng.normal(0, 1, 30), rng.normal(3, 1, 30)])
    rows = [("steady", i, float(v)) for i, v in enumerate(steady)] + [
        ("shifted", i, float(v)) for i, v in enumerate(shifted)
    ]
    out = (
        cusum(
            spark.createDataFrame(rows, "k string, t int, x double"),
            ["k"], "t", "x", k_sigma=0.5, h_sigma=5.0,
        )
        .filter("alarm")
        .toPandas()
    )
    assert set(out["k"]) == {"shifted"}
    # whole-series standardization makes the low pre-shift half drift
    # s_neg, so the NEGATIVE side may alarm inside it; the positive-side
    # alarm (the shift itself) can only fire after t=30
    assert out[out.s_pos > 5.0]["t"].min() >= 30


def test_cusum_constant_series_no_alarm(spark):
    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(10)], "k string, t int, x double"
    )
    out = cusum(df, ["k"], "t", "x").toPandas()
    assert (out["s_pos"] == 0).all() and (~out["alarm"]).all()


def test_km_survival_hand_computed(spark):
    # durations 1,2,2c,3,5,5,7c — the classic small KM example
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (5, 1), (5, 1), (7, 0)],
        "d int, e int",
    )
    rows = km_survival(df, "d", "e").collect()
    got = [(r["duration"], r["n_risk"], r["n_events"], r["survival"])
           for r in rows]
    assert got == [
        (1.0, 7, 1, round(6 / 7, 9)),
        (2.0, 6, 1, round(6 / 7 * 5 / 6, 9)),
        (3.0, 4, 1, round(6 / 7 * 5 / 6 * 3 / 4, 9)),
        (5.0, 3, 2, round(6 / 7 * 5 / 6 * 3 / 4 * 1 / 3, 9)),
    ]
    # censored-only times don't appear; all-events-die tail -> S=0 exact
    df2 = spark.createDataFrame([(1, 1), (2, 1)], "d int, e int")
    assert km_survival(df2, "d", "e").collect()[-1]["survival"] == 0.0


def test_km_survival_matches_duckdb(spark, sf_dir):
    dur = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.floor(F.col("o_totalprice") / 10000).alias("d"),
            (F.col("o_orderstatus") == "F").cast("int").alias("e"),
        )
    )
    got = [
        (r["duration"], r["n_risk"], r["n_events"], r["n_censored"],
         r["survival"])
        for r in km_survival(dur, "d", "e").collect()
    ]
    want = duckdb.sql(
        f"""
        WITH s AS (
          SELECT floor(o_totalprice/10000) AS d,
                 CAST(o_orderstatus = 'F' AS INT) AS e
          FROM read_parquet('{sf_dir}/orders.parquet')
        ), per_t AS (
          SELECT CAST(d AS DOUBLE) AS duration, SUM(e) AS n_events,
                 COUNT(*) - SUM(e) AS n_censored, COUNT(*) AS c
          FROM s GROUP BY 1
        ), risk AS (
          SELECT duration, n_events, n_censored,
                 SUM(c) OVER () - SUM(c) OVER w + c AS n_risk
          FROM per_t
          WINDOW w AS (ORDER BY duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), km AS (
          SELECT duration, n_events, n_censored, n_risk,
                 SUM(CASE WHEN n_events >= n_risk THEN -1e308*10
                          WHEN n_events > 0
                          THEN ln(1 - n_events / n_risk)
                          ELSE 0 END) OVER w AS ls
          FROM risk
          WINDOW w AS (ORDER BY duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT duration, CAST(n_risk AS BIGINT), CAST(n_events AS BIGINT),
               CAST(n_censored AS BIGINT), round(exp(ls), 9)
        FROM km WHERE n_events > 0 ORDER BY duration
        """
    ).fetchall()
    assert got == [tuple(r) for r in want] and len(got) > 3


def test_chi_square_matches_python_and_duckdb(spark, sf_dir):
    got = chi_square_independence(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "c_mktsegment", "c_nationkey",
    ).collect()[0]
    pdf = pd.read_parquet(f"{sf_dir}/customer.parquet")
    ct = pd.crosstab(pdf["c_mktsegment"], pdf["c_nationkey"])
    # full-table Pearson: zero cells contribute their expected counts
    # (the closed form N(sum n^2/(ra*cb) - 1) folds them in without
    # enumerating them)
    n = ct.values.sum()
    chi2 = 0.0
    for a in ct.index:
        for b in ct.columns:
            o = ct.loc[a, b]
            e = ct.loc[a].sum() * ct[b].sum() / n
            chi2 += (o - e) ** 2 / e
    assert got["n"] == n
    assert got["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert 0 <= got["cramers_v"] <= 1


def test_chi_square_perfect_association_reaches_v1(spark):
    """A purely diagonal table (a determines b) must hit Cramér's V ==
    1.0 — only true when unobserved cells contribute their expected
    mass (the sparse-table regime the screen exists for)."""
    rows = [(f"a{i}", f"b{i}") for i in range(5) for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r["chi2"] == pytest.approx(50 * (5 - 1), abs=1e-6)  # N(k-1)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-9)


def test_chi_square_single_level_guard(spark):
    df = spark.createDataFrame(
        [("only", "x"), ("only", "y")], "a string, b string"
    )
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r["dof"] == 0 and r["cramers_v"] is None
