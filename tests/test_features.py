"""Feature engineering: quantile binning, hashing trick, scalers, and
multi-touch attribution pinned against DuckDB / hashlib / invariants."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.features import (
    apply_scaler,
    attribution_credit,
    fit_scaler,
    hash_features,
    with_quantile_bin,
)
from etl_hero_spark.registry import _events


def test_quantile_bin_matches_duckdb_deciles(spark, sf_dir):
    got = (
        with_quantile_bin(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            "o_totalprice",
            10,
        )
        .groupBy("o_totalprice_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_totalprice_bin")
        .collect()
    )
    want = duckdb.sql(
        f"""
        WITH c AS (
          SELECT quantile_cont(o_totalprice,
                 [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
          FROM read_parquet('{sf_dir}/orders.parquet')
        )
        SELECT b, count(*) FROM (
          SELECT (SELECT count(*) FROM unnest((SELECT cuts FROM c)) t(x)
                  WHERE x < o_totalprice) AS b
          FROM read_parquet('{sf_dir}/orders.parquet')
        ) GROUP BY b ORDER BY b
        """
    ).fetchall()
    assert [(r["o_totalprice_bin"], r["n"]) for r in got] == [
        (int(b), n) for b, n in want
    ]


def test_quantile_bin_null_passthrough_and_skew_collapse(spark):
    df = spark.createDataFrame(
        [(1.0,)] * 95 + [(9.0,)] * 5 + [(None,)], "x double"
    )
    out = with_quantile_bin(df, "x", 10).groupBy("x_bin").count().collect()
    bins = {r["x_bin"]: r["count"] for r in out}
    assert bins[None] == 1  # NULL passes through
    # 95% identical mass: duplicate cuts collapse instead of empty bins
    assert set(bins) == {None, 0, 1}
    assert bins[0] == 95 and bins[1] == 5


def test_hash_features_reproduce_hashlib(spark, sf_dir):
    rows = (
        hash_features(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            ["c_mktsegment", "c_nationkey"],
            dim=64,
        )
        .select("c_mktsegment", "c_nationkey", "f_indices", "f_values")
        .limit(20)
        .collect()
    )

    def py_hash(col, val, dim=64):
        h = hashlib.md5(f"{col}={val}".encode()).hexdigest()
        return int(h[:14], 16) % dim, (
            1.0 if int(h[14], 16) % 2 == 0 else -1.0
        )

    assert len(rows) == 20
    for r in rows:
        exp: dict = {}
        for cname in ("c_mktsegment", "c_nationkey"):
            i, s = py_hash(cname, r[cname])
            exp[i] = exp.get(i, 0.0) + s
        assert list(r["f_indices"]) == sorted(exp)
        assert list(r["f_values"]) == [exp[i] for i in sorted(exp)]


def test_hash_features_null_contributes_nothing(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    r = hash_features(df, ["x", "y"], dim=8).collect()[0]
    assert len(r["f_indices"]) == 1 and len(r["f_values"]) == 1


def test_hash_features_collisions_sum(spark):
    # same column+value twice via duplicated col list -> one index,
    # summed signed value (|v| == 2)
    df = spark.createDataFrame([("a",)], "x string")
    df = df.withColumn("x2", F.col("x"))
    # x and x2 hash differently (feature name differs) — instead force
    # a collision with dim=1: every feature lands at index 0
    r = hash_features(df, ["x", "x2"], dim=1).collect()[0]
    assert list(r["f_indices"]) == [0]
    assert abs(r["f_values"][0]) in (0.0, 2.0)  # signs sum, never drop


@pytest.mark.parametrize("method", ["zscore", "minmax"])
def test_scaler_self_certifies(spark, sf_dir, method):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    stats = fit_scaler(li, cols, method)
    out = apply_scaler(li, stats, method)
    r = out.agg(
        *[F.round(F.avg(f"{c}_scaled"), 6).alias(f"m_{c}") for c in cols],
        *[F.round(F.stddev_pop(f"{c}_scaled"), 6).alias(f"s_{c}") for c in cols],
        *[F.min(f"{c}_scaled").alias(f"lo_{c}") for c in cols],
        *[F.max(f"{c}_scaled").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    for c in cols:
        if method == "zscore":
            assert r[f"m_{c}"] == pytest.approx(0.0, abs=1e-5)
            assert r[f"s_{c}"] == pytest.approx(1.0, abs=1e-5)
        else:
            assert r[f"lo_{c}"] == 0.0 and r[f"hi_{c}"] == 1.0


def test_scaler_train_serve_and_degenerate(spark):
    train = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    serve = spark.createDataFrame([(5.0,), (20.0,)], "x double")
    stats = fit_scaler(train, ["x"], "minmax")
    got = [
        r["x_scaled"]
        for r in apply_scaler(serve, stats, "minmax").collect()
    ]
    assert got == [0.5, 2.0]  # serve rows outside train range extrapolate
    const = spark.createDataFrame([(3.0,), (3.0,)], "x double")
    s2 = fit_scaler(const, ["x"], "zscore")
    assert [
        r["x_scaled"] for r in apply_scaler(const, s2, "zscore").collect()
    ] == [0.0, 0.0]
    with pytest.raises(ValueError, match="unknown scaler"):
        fit_scaler(train, ["x"], "nope")


@pytest.mark.parametrize(
    "model", ["linear", "first_touch", "last_touch", "time_decay"]
)
def test_attribution_credit_is_conserved(spark, sf_dir, model):
    ev = _events(spark, sf_dir)
    out = attribution_credit(
        ev, "user_id", "ts", "event_type", "purchase", model=model
    )
    total = out.agg(F.round(F.sum("credit"), 3)).first()[0]
    n_converters = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == pytest.approx(n_converters, abs=1e-2)


def test_attribution_linear_matches_duckdb(spark, sf_dir):
    got = sorted(
        (r["channel"], r["credit"])
        for r in attribution_credit(
            _events(spark, sf_dir),
            "user_id", "ts", "event_type", "purchase", model="linear",
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH e AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
              FROM read_parquet('{sf_dir}/events.parquet')
            ), conv AS (
              SELECT user_id, min(ts) AS conv_ts FROM e
              WHERE event_type = 'purchase' GROUP BY 1
            ), t AS (
              SELECT e.user_id, e.event_type,
                     count(*) OVER (PARTITION BY e.user_id) AS n
              FROM e JOIN conv USING (user_id)
              WHERE e.ts <= conv.conv_ts
            )
            SELECT event_type, round(sum(1.0/n), 6) FROM t GROUP BY 1
            """
        ).fetchall()
    )
    assert got == [(c, v) for c, v in want]


def test_attribution_first_last_hand_fixture(spark):
    rows = [
        ("u1", 1.0, "ad"), ("u1", 2.0, "email"), ("u1", 3.0, "purchase"),
        ("u2", 1.0, "email"), ("u2", 2.0, "purchase"),
        ("u3", 5.0, "ad"),  # never converts -> no credit at all
    ]
    df = spark.createDataFrame(rows, "k string, t double, ch string")
    first = {
        r["channel"]: r["credit"]
        for r in attribution_credit(
            df, "k", "t", "ch", "purchase", model="first_touch"
        ).collect()
    }
    assert first == {"ad": 1.0, "email": 1.0}
    last = {
        r["channel"]: r["credit"]
        for r in attribution_credit(
            df, "k", "t", "ch", "purchase", model="last_touch"
        ).collect()
    }
    assert last == {"purchase": 2.0}  # conversion itself is the last touch
    with pytest.raises(ValueError, match="unknown attribution"):
        attribution_credit(df, "k", "t", "ch", "purchase", model="nope")


def test_robust_scaler_is_outlier_immune(spark):
    """One planted 1e9 outlier barely moves the robust (median/IQR)
    stats, while it wrecks zscore's; post-scale median is 0."""
    base = [(float(i),) for i in range(1, 100)]
    df = spark.createDataFrame(base + [(1e9,)], "x double")
    robust = fit_scaler(df, ["x"], "robust")
    med, iqr = robust["x"]
    assert med == pytest.approx(50.5) and iqr == pytest.approx(49.5)
    z = fit_scaler(df, ["x"], "zscore")
    assert z["x"][1] > 1e6  # sigma exploded; IQR did not
    out = apply_scaler(df, robust, "robust")
    got = out.agg(
        F.expr("percentile(x_scaled, 0.5)").alias("m")
    ).first()["m"]
    assert got == pytest.approx(0.0, abs=1e-12)
    # degenerate: constant column -> IQR 0 -> scaled 0
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    st = fit_scaler(const, ["x"], "robust")
    assert [
        r["x_scaled"]
        for r in apply_scaler(const, st, "robust").collect()
    ] == [0.0, 0.0]


def test_zscore_scaler_preserves_small_scale_columns(spark):
    """Rate-like columns (values ~1e-3) must not quantize to zero in
    the fit — the price-grid decimal(18,2) cast would erase them."""
    df = spark.createDataFrame(
        [(i / 10000.0,) for i in range(1, 101)], "ctr double"
    )
    mu, sigma = fit_scaler(df, ["ctr"], "zscore")["ctr"]
    assert mu == pytest.approx(0.00505, abs=1e-9)
    assert sigma > 0.001


def test_scaler_and_linreg_empty_input_contracts(spark):
    empty = spark.createDataFrame([], "x double")
    for method in ("zscore", "minmax", "robust"):
        assert fit_scaler(empty, ["x"], method)["x"] == (0.0, 0.0)
    from etl_hero_spark.features import linreg_fit

    with pytest.raises(ValueError, match="no complete cases"):
        linreg_fit(empty, ["x"], "x")


def _pav_ref(pairs):
    """Pure-Python PAV over (score, label) pairs -> [(smin, smax, n,
    npos, rate)] — the textbook stack merge, exact integers."""
    import collections

    agg = collections.defaultdict(lambda: [0, 0])
    for s, y in pairs:
        if s is None or y is None:
            continue
        agg[float(s)][0] += 1
        agg[float(s)][1] += int(bool(y))
    pools = []
    for s in sorted(agg):
        cur = [s, s, agg[s][0], agg[s][1]]
        while pools and pools[-1][3] * cur[2] > cur[3] * pools[-1][2]:
            prev = pools.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        pools.append(cur)
    return pools


def test_isotonic_calibration_matches_python_pav(spark):
    from etl_hero_spark.features import isotonic_calibration

    # noisy but upward-trending label rate in score
    pairs = []
    for i in range(200):
        s = i % 10
        y = (i * 7 + s * 13) % 10 < (2 + s)  # rate grows with s, noisily
        pairs.append((float(s), y))
    df = spark.createDataFrame(pairs, "score double, y boolean")
    got = [
        (r["score_min"], r["score_max"], r["n"], r["n_pos"], r["calibrated"])
        for r in isotonic_calibration(df, "score", "y")
        .orderBy("pool_id")
        .collect()
    ]
    want = [
        (p[0], p[1], p[2], p[3], round(p[3] / p[2], 6)) for p in _pav_ref(pairs)
    ]
    assert got == want
    # the fit is monotone non-decreasing
    rates = [g[4] for g in got]
    assert rates == sorted(rates)
    assert len(got) >= 2, "fixture should produce a non-trivial fit"


def test_isotonic_calibration_cap_and_nulls(spark):
    import pytest as _pytest

    from etl_hero_spark.features import (
        CalibrationCapError,
        isotonic_calibration,
    )

    df = spark.createDataFrame(
        [(float(i), i % 2 == 0) for i in range(50)]
        + [(None, True), (1.0, None)],
        "score double, y boolean",
    )
    with _pytest.raises(CalibrationCapError, match="distinct"):
        isotonic_calibration(df, "score", "y", max_distinct=10)
    out = isotonic_calibration(df, "score", "y").collect()
    assert sum(r["n"] for r in out) == 50  # NULL score/label dropped


def test_isotonic_apply_steps_and_clamps(spark):
    from etl_hero_spark.features import isotonic_apply, isotonic_calibration

    train = spark.createDataFrame(
        [(1.0, False)] * 8 + [(1.0, True)] * 2
        + [(5.0, False)] * 5 + [(5.0, True)] * 5
        + [(9.0, True)] * 9 + [(9.0, False)] * 1,
        "score double, y boolean",
    )
    fitted = isotonic_calibration(train, "score", "y")
    serve = spark.createDataFrame(
        [(0, -3.0), (1, 1.0), (2, 3.0), (3, 5.0), (4, 7.5), (5, 9.0),
         (6, 42.0), (7, None)],
        "id long, score double",
    )
    got = {
        r["id"]: r["calibrated"]
        for r in isotonic_apply(serve, fitted, "score").collect()
    }
    assert got[1] == 0.2 and got[3] == 0.5 and got[5] == 0.9
    assert got[0] == 0.2  # below first pool clamps to first rate
    assert got[2] == 0.2  # between pools -> nearest below
    assert got[4] == 0.5
    assert got[6] == 0.9  # above last clamps to last rate
    assert got[7] is None  # NULL passes through
    # monotone mapping on the serve set (ignoring the NULL)
    ordered = [got[i] for i in (0, 1, 2, 3, 4, 5, 6)]
    assert ordered == sorted(ordered)


def test_isotonic_apply_preserves_duplicate_rows(spark):
    """Fully-identical serve rows each keep their own output row — the
    serve side must never change input cardinality (an earlier
    group-by-all-columns apply silently collapsed duplicates; no unique
    id is required by the signature)."""
    from etl_hero_spark.features import isotonic_apply, isotonic_calibration

    train = spark.createDataFrame(
        [(1.0, 0), (1.0, 1), (2.0, 1), (2.0, 1)],
        "score double, y int",
    )
    fitted = isotonic_calibration(train, "score", "y")
    serve = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (2.0,), (None,), (None,)],
        "score double",
    )
    out = isotonic_apply(serve, fitted, "score").collect()
    assert len(out) == 6  # cardinality preserved, duplicates intact
    vals = sorted(
        (r["score"], r["calibrated"]) for r in out
        if r["score"] is not None
    )
    assert vals == [(1.0, 0.5), (1.0, 0.5), (1.0, 0.5), (2.0, 1.0)]
    assert all(
        r["calibrated"] is None for r in out if r["score"] is None
    )


def _numpy_irls(X, y, iters=30, tol=1e-10, ridge=1e-9):
    import numpy as np

    Xd = np.column_stack([X, np.ones(len(y))])
    beta = np.zeros(Xd.shape[1])
    for _ in range(iters):
        mu = 1.0 / (1.0 + np.exp(-Xd @ beta))
        w = mu * (1 - mu)
        H = Xd.T @ (Xd * w[:, None]) + ridge * np.eye(Xd.shape[1])
        g = Xd.T @ (y - mu)
        step = np.linalg.solve(H, g)
        beta = beta + step
        if np.abs(step).sum() < tol:
            break
    return beta


def test_logreg_fit_matches_numpy_irls(spark):
    """Distributed per-iteration aggregation IRLS == an independent
    in-memory numpy IRLS on the same rows."""
    import numpy as np

    from etl_hero_spark.features import logreg_apply, logreg_fit

    rng = np.random.default_rng(7)
    n = 2000
    x1 = rng.normal(0, 1, n).round(4)
    x2 = rng.normal(0, 1, n).round(4)
    p = 1.0 / (1.0 + np.exp(-(1.5 * x1 - 0.8 * x2 + 0.3)))
    y = (rng.random(n) < p).astype(int)
    rows = [(float(a), float(b), int(t)) for a, b, t in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    model = logreg_fit(df, ["x1", "x2"], "y")
    beta = _numpy_irls(np.column_stack([x1, x2]), y.astype(float))
    assert model["coef"]["x1"] == pytest.approx(beta[0], abs=1e-6)
    assert model["coef"]["x2"] == pytest.approx(beta[1], abs=1e-6)
    assert model["intercept"] == pytest.approx(beta[2], abs=1e-6)
    assert model["n"] == n and model["log_loss"] > 0
    # recovered signs and rough magnitudes of the generating process
    assert model["coef"]["x1"] > 0.5 and model["coef"]["x2"] < -0.3
    # serve side: literal sigmoid, monotone in the score
    probs = {
        r["x1"]: r["probability"]
        for r in logreg_apply(
            spark.createDataFrame(
                [(-2.0, 0.0), (0.0, 0.0), (2.0, 0.0)],
                "x1 double, x2 double",
            ),
            model,
        ).collect()
    }
    assert probs[-2.0] < probs[0.0] < probs[2.0]


def test_conformal_interval_guarantee_and_python_q(spark, sf_dir):
    """Split-conformal on lineitem (price ~ quantity): the k-th
    calibration residual must equal a pure-Python recomputation over
    the same deterministic folds, and measured test coverage must sit
    at-or-above nominal minus binomial slack."""
    import math

    from etl_hero_spark.features import (
        conformal_interval_report,
        linreg_apply,
        linreg_fit,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).withColumn(
        "rid",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
    )
    got = conformal_interval_report(
        li, ["l_quantity"], "l_extendedprice", "rid", alpha=0.1
    ).first()
    # python reference over the same folds
    fold = F.pmod(F.xxhash64("rid"), F.lit(4))
    base = li.withColumn("_fold", fold)
    model = linreg_fit(
        base.filter(F.col("_fold") < 2), ["l_quantity"], "l_extendedprice"
    )
    cal = [
        abs(float(r["l_extendedprice"]) - float(r["_pred"]))
        for r in linreg_apply(
            base.filter(F.col("_fold") == 2), model, "_pred"
        ).collect()
    ]
    k = min(len(cal), math.ceil((len(cal) + 1) * 0.9))
    q = sorted(cal)[k - 1]
    assert got["q_halfwidth"] == pytest.approx(round(q, 6), abs=1e-6)
    assert got["n_calib"] == len(cal)
    # the theorem: coverage >= 1 - alpha in expectation; allow 3-sigma
    # binomial slack at the test fold's size
    n_t = got["n_test"]
    slack = 3 * math.sqrt(0.1 * 0.9 / n_t)
    assert got["coverage_test"] >= 0.9 - slack
    assert got["nominal"] == 0.9


def test_conformal_validates_alpha(spark):
    from etl_hero_spark.features import conformal_interval_report

    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="alpha"):
        conformal_interval_report(df, ["x"], "y", "id", alpha=1.5)


def _numpy_huber_irls(X, y, delta, beta0, iters=30, tol=1e-9):
    import numpy as np

    Xd = np.column_stack([X, np.ones(len(y))])
    beta = beta0.copy()
    for _ in range(iters):
        r = y - Xd @ beta
        w = np.where(np.abs(r) <= delta, 1.0, delta / np.abs(r))
        H = Xd.T @ (Xd * w[:, None])
        g = Xd.T @ (w * y)
        nb = np.linalg.solve(H, g)
        if np.abs(nb - beta).sum() < tol:
            beta = nb
            break
        beta = nb
    return beta


def test_huber_fit_matches_numpy_irls_and_resists_outliers(spark):
    """Distributed Huber IRLS == an independent numpy IRLS at the same
    fixed delta; planted gross outliers drag OLS visibly but leave the
    Huber slope near the generating value."""
    import numpy as np

    from etl_hero_spark.features import huber_fit, linreg_fit

    rng = np.random.default_rng(11)
    n = 1500
    x = rng.normal(0, 1, n).round(4)
    y = (2.0 * x + 1.0 + rng.normal(0, 0.5, n)).round(4)
    # gross one-sided outliers in 2% of rows
    idx = rng.choice(n, 30, replace=False)
    y[idx] += 50.0
    rows = [(float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = huber_fit(df, ["x"], "y", delta=1.0)
    # independent reference from the same OLS warm start
    ols = linreg_fit(df, ["x"], "y")
    beta0 = np.array([ols["coef"]["x"], ols["intercept"]])
    ref = _numpy_huber_irls(x.reshape(-1, 1), y, 1.0, beta0)
    assert got["coef"]["x"] == pytest.approx(ref[0], abs=1e-6)
    assert got["intercept"] == pytest.approx(ref[1], abs=1e-6)
    # robustness: OLS intercept is dragged ~1.0 by the planted mass;
    # Huber stays near the generating (2.0, 1.0)
    assert abs(got["coef"]["x"] - 2.0) < 0.1
    assert abs(got["intercept"] - 1.0) < 0.2
    assert abs(ols["intercept"] - 1.0) > 0.5
    # default-delta path (MAD tuning) also converges sanely
    auto = huber_fit(df, ["x"], "y")
    assert abs(auto["coef"]["x"] - 2.0) < 0.1 and auto["delta"] > 0


def test_hashed_token_features_matches_hashlib_and_l1(spark):
    """Bucket index and sign replicate the md5 spec exactly (hashlib
    reference); vectors are L1-normalized by token count; a zero-token
    document keeps a defined all-zero vector."""
    from etl_hero_spark.features import hashed_token_features

    df = spark.createDataFrame(
        [(1, "Alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in hashed_token_features(df, dim=8).collect()
    }

    def ref_vec(text):
        toks = text.lower().split()
        v = [0.0] * 8
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            idx = int(h[:14], 16) % 8
            sign = 1.0 if int(h[14], 16) % 2 == 0 else -1.0
            v[idx] += sign
        n = len(toks)
        return [x / n for x in v] if n else v, n

    for doc_id, text in [(1, "Alpha beta alpha"), (3, "gamma")]:
        want, n = ref_vec(text)
        got = [out[doc_id][f"f_{j}"] for j in range(8)]
        assert got == pytest.approx(want)
        assert out[doc_id]["n_toks_f"] == n
    # zero-token doc: all-zero, not NULL
    assert [out[2][f"f_{j}"] for j in range(8)] == [0.0] * 8
    assert out[2]["n_toks_f"] == 0


def test_quality_classifier_planted_separation(spark):
    """The CCNet-style fit separates a planted quality vocabulary:
    target-domain docs draw from one token set, junk from another —
    the fitted model must score held-in target sources far above junk
    sources, and the model dict must carry the fit metadata."""
    from etl_hero_spark.features import quality_classifier_report

    good_vocab = ["insight", "theorem", "analysis", "rigorous", "proof"]
    junk_vocab = ["buy", "click", "now", "spam", "winner"]
    rows = []
    for i in range(120):
        if i % 2 == 0:
            toks = [good_vocab[(i + j) % 5] for j in range(12)]
            src = "wiki" if i % 4 == 0 else "books"
        else:
            toks = [junk_vocab[(i + j) % 5] for j in range(12)]
            src = "crawl"
        rows.append((i, " ".join(toks), src))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    report, model = quality_classifier_report(
        docs, F.col("source").isin("wiki", "books"), dim=16
    )
    by = {r["group"]: r for r in report.collect()}
    assert set(by) == {"wiki", "books", "crawl"}
    # separation: every target source scores above the junk source
    assert by["wiki"]["mean_p"] > 0.9
    assert by["books"]["mean_p"] > 0.9
    assert by["crawl"]["mean_p"] < 0.1
    assert by["wiki"]["frac_above"] == 1.0
    assert by["crawl"]["frac_above"] == 0.0
    # counts: n_target counts only the target-domain docs per group
    assert by["crawl"]["n_target"] == 0
    assert by["wiki"]["n_target"] == by["wiki"]["n_docs"]
    assert model["dim"] == 16 and model["n"] == 120
    assert model["log_loss"] < 0.2


def test_quality_classifier_planted_separation_dim256(spark):
    """fastText-width buckets: the array-typed encoder + the
    diagonal-Newton scale fit (dim > 32 routes to logreg_fit_gd —
    O(p) aggregates per pass, never the (p+1)^2 normal matrix) still
    separate a planted quality vocabulary with a wide margin at
    dim=256."""
    from etl_hero_spark.features import quality_classifier_report

    good_vocab = ["insight", "theorem", "analysis", "rigorous", "proof"]
    junk_vocab = ["buy", "click", "now", "spam", "winner"]
    rows = []
    for i in range(120):
        if i % 2 == 0:
            toks = [good_vocab[(i + j) % 5] for j in range(12)]
            src = "wiki" if i % 4 == 0 else "books"
        else:
            toks = [junk_vocab[(i + j) % 5] for j in range(12)]
            src = "crawl"
        rows.append((i, " ".join(toks), src))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    report, model = quality_classifier_report(
        docs, F.col("source").isin("wiki", "books"), dim=256
    )
    by = {r["group"]: r for r in report.collect()}
    # the separation margin survives the larger hash space (fewer
    # collisions, if anything, than dim=16)
    assert by["wiki"]["mean_p"] > 0.9
    assert by["books"]["mean_p"] > 0.9
    assert by["crawl"]["mean_p"] < 0.1
    assert by["wiki"]["frac_above"] == 1.0
    assert by["crawl"]["frac_above"] == 0.0
    assert model["dim"] == 256 and len(model["coef"]) == 256
    assert model["log_loss"] < 0.2


def test_logreg_gd_agrees_with_full_newton_small_p(spark):
    """On a small well-conditioned problem the diagonal-Newton scale
    fit converges to the same optimum as the full-Newton IRLS: near-
    equal log-loss and same-direction coefficients."""
    import numpy as np

    from etl_hero_spark.features import logreg_fit, logreg_fit_gd

    rng = np.random.default_rng(11)
    n = 2000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    eta = 1.5 * x1 - 0.8 * x2 + 0.3
    y = rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))
    df = spark.createDataFrame(
        [
            (float(a), float(b), bool(c))
            for a, b, c in zip(x1, x2, y)
        ],
        "x1 double, x2 double, y boolean",
    )
    full = logreg_fit(df, ["x1", "x2"], "y")
    gd = logreg_fit_gd(df, ["x1", "x2"], "y", max_iter=200, tol=1e-9)
    # both sit at (near) the same optimum of the same convex loss
    assert abs(full["log_loss"] - gd["log_loss"]) < 1e-3
    for c in ("x1", "x2"):
        assert abs(full["coef"][c] - gd["coef"][c]) < 0.05
    assert abs(full["intercept"] - gd["intercept"]) < 0.05


def test_quality_classifier_rejects_one_class_target(spark):
    """A target predicate selecting everything (or nothing) cannot be
    fitted — the guard must fail loudly, not score everything alike."""
    from etl_hero_spark.features import quality_classifier_report

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1}", "only") for i in range(10)],
        "doc_id bigint, text string, source string",
    )
    with pytest.raises(ValueError, match="BOTH a target and a non-target"):
        quality_classifier_report(docs, F.lit(True), dim=4)
    with pytest.raises(ValueError, match="BOTH a target and a non-target"):
        quality_classifier_report(docs, F.lit(False), dim=4)
    # dim mismatch against a pre-fitted model is equally loud
    with pytest.raises(ValueError, match="dim"):
        quality_classifier_report(
            docs,
            F.col("doc_id") % 2 == 0,
            dim=8,
            model={"coef": {"f_0": 1.0}, "intercept": 0.0, "dim": 4},
        )
    # a hand-built model MISSING the 'dim' key must not silently pass:
    # the guard falls back to the model's true width (len(coef))
    with pytest.raises(ValueError, match="dim"):
        quality_classifier_report(
            docs,
            F.col("doc_id") % 2 == 0,
            dim=8,
            model={
                "coef": {"f_0": 1.0, "f_1": -0.5},
                "intercept": 0.0,
            },
        )


def test_logreg_gd_damped_on_correlated_copies(spark):
    """ADVICE r8: three IDENTICAL feature columns give the undamped
    Jacobi iteration a growth factor of ~3 (each diagonal step acts as
    if its column were alone) — the gradient-norm-growth damping must
    pull it back to a finite, genuinely-fitted model instead of
    oscillating divergence."""
    import numpy as np

    from etl_hero_spark.features import logreg_fit_gd

    rng = np.random.default_rng(7)
    n = 1500
    x = rng.normal(size=n)
    y = rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-(2.0 * x - 0.5)))
    df = spark.createDataFrame(
        [(float(a), float(a), float(a), bool(c)) for a, c in zip(x, y)],
        "x1 double, x2 double, x3 double, y boolean",
    )
    m = logreg_fit_gd(df, ["x1", "x2", "x3"], "y", max_iter=80)
    coefs = np.array(list(m["coef"].values()) + [m["intercept"]])
    assert np.isfinite(coefs).all()
    # the combined effect approximates the true slope and the loss is
    # that of a real fit, not a diverged iterate
    assert abs(float(coefs[:3].sum()) - 2.0) < 0.5
    assert m["log_loss"] < 0.55


def test_logreg_gd_nonfinite_raises_loudly(spark):
    """ADVICE r8: a 1e200-scaled feature overflows the double Hessian
    sum (w * x^2 ~ 1e400) — the fit must raise ValueError at the
    offending iteration, never embed inf/nan literals into selectExpr
    (which would surface as an opaque SQL parse/analysis error)."""
    import numpy as np

    from etl_hero_spark.features import logreg_fit_gd

    rng = np.random.default_rng(9)
    rows = [
        (float(rng.normal() * 1e200), bool(i % 2)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "x double, y boolean")
    with pytest.raises(ValueError, match="non-finite|diverged"):
        logreg_fit_gd(df, ["x"], "y", max_iter=10)


def test_quantile_reg_matches_numpy_irls_and_quantile_property(spark):
    """Distributed pinball IRLS == an independent numpy IRLS on the
    same data; fitted surfaces are monotone in tau and each one's
    measured below-fraction sits near its tau."""
    import numpy as np

    from etl_hero_spark.features import quantile_reg_fit

    rng = np.random.default_rng(3)
    n = 4000
    x = rng.uniform(1.0, 10.0, size=n)
    # heteroscedastic noise: quantile curves genuinely fan out
    y = 2.0 * x + 1.0 + rng.normal(size=n) * x
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )

    def np_irls(tau, smooth=1e-6, iters=50, tol=1e-8):
        X = np.column_stack([x, np.ones(n)])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        for _ in range(iters):
            r = y - X @ beta
            wn = np.where(r < 0, 1.0 - tau, tau)
            w = wn / np.maximum(np.abs(r), smooth)
            H = (X * w[:, None]).T @ X
            g = (X * w[:, None]).T @ y
            nb = np.linalg.solve(H, g)
            if np.abs(nb - beta).sum() < tol:
                beta = nb
                break
            beta = nb
        return beta

    def pinball(beta, tau):
        r = y - (beta[0] * x + beta[1])
        return float(np.where(r < 0, (tau - 1) * r, tau * r).sum())

    fits = {}
    for tau in (0.1, 0.5, 0.9):
        got = quantile_reg_fit(df, ["x"], "y", tau=tau)
        want = np_irls(tau)
        # the pinball minimum is FLAT along data-crossing boundaries, so
        # coordinate-level parity is ill-posed; the honest check is
        # mutual near-optimality of the LOSS both solvers reach, plus
        # the structural pins below
        lg = pinball([got["coef"]["x"], got["intercept"]], tau)
        lw = pinball(list(want), tau)
        assert lg <= lw * 1.001 and lw <= lg * 1.001, (tau, lg, lw)
        assert got["frac_below"] == pytest.approx(tau, abs=0.03)
        fits[tau] = got
    # monotone in tau at a midpoint x=5
    at5 = {
        t: f["coef"]["x"] * 5.0 + f["intercept"] for t, f in fits.items()
    }
    assert at5[0.1] < at5[0.5] < at5[0.9]
    with pytest.raises(ValueError, match="tau"):
        quantile_reg_fit(df, ["x"], "y", tau=1.5)


def test_hashed_bigram_features_hashlib_and_serving_parity(spark):
    """ngrams=2 adds fastText's word bigrams: the relational build
    matches a hashlib reference over unigrams + '_'-joined bigrams,
    and the per-row serving expressions reproduce it bit-for-bit;
    one-token and zero-token docs get no bigrams (never a descending
    sequence walk)."""
    from etl_hero_spark.features import (
        hashed_token_feature_exprs,
        hashed_token_features,
    )

    df = spark.createDataFrame(
        [
            (1, "New York city"),
            (2, "solo"),
            (3, ""),
            (4, "a b a b"),
        ],
        "doc_id bigint, text string",
    )
    rel = {
        r["doc_id"]: r
        for r in hashed_token_features(df, dim=8, ngrams=2).collect()
    }

    def ref_vec(text):
        toks = text.lower().split()
        terms = toks + [
            f"{a}_{b}" for a, b in zip(toks, toks[1:])
        ]
        v = [0.0] * 8
        for t in terms:
            h = hashlib.md5(t.encode()).hexdigest()
            idx = int(h[:14], 16) % 8
            v[idx] += 1.0 if int(h[14], 16) % 2 == 0 else -1.0
        n = len(terms)
        return [x / n for x in v] if n else v, n

    for doc_id, text in [
        (1, "New York city"),
        (2, "solo"),
        (3, ""),
        (4, "a b a b"),
    ]:
        want, n = ref_vec(text)
        got = [rel[doc_id][f"f_{j}"] for j in range(8)]
        assert got == pytest.approx(want), doc_id
        assert rel[doc_id]["n_toks_f"] == n, doc_id
    # serving expressions == relational build, including bigrams
    serving = {
        r["doc_id"]: [r[f"f_{j}"] for j in range(8)]
        for r in df.select(
            "doc_id", *hashed_token_feature_exprs("text", 8, ngrams=2)
        ).collect()
    }
    for doc_id in (1, 2, 3, 4):
        assert serving[doc_id] == [
            rel[doc_id][f"f_{j}"] for j in range(8)
        ], doc_id


def test_quality_calibration_matches_hand_computation(spark):
    """Reliability buckets and the Brier row equal a pandas-side hand
    computation over the same scored corpus; the planted separable
    corpus calibrates sharply (low Brier, extreme buckets pure)."""
    from etl_hero_spark.features import (
        hashed_token_features,
        logreg_apply,
        quality_calibration_report,
        quality_classifier_report,
    )

    good = ["insight", "theorem", "analysis", "rigorous", "proof"]
    junk = ["buy", "click", "now", "spam", "winner"]
    rows = []
    for i in range(120):
        vocab = good if i % 2 == 0 else junk
        src = "wiki" if i % 2 == 0 else "crawl"
        rows.append(
            (i, " ".join(vocab[(i + j) % 5] for j in range(10)), src)
        )
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    target = F.col("source") == "wiki"
    _report, model = quality_classifier_report(docs, target, dim=16)
    got = quality_calibration_report(docs, target, model).collect()
    rel = {r["bucket"]: r for r in got if r["part"] == "reliability"}
    brier = [r for r in got if r["part"] == "brier"][0]
    # hand computation over the same scores
    scored = logreg_apply(
        hashed_token_features(docs, dim=16), model, "_p"
    ).select("_p", target.cast("double").alias("_y")).collect()
    import math

    hand_brier = sum((r["_p"] - r["_y"]) ** 2 for r in scored) / len(scored)
    assert brier["mean_p"] == pytest.approx(round(hand_brier, 6), abs=1e-6)
    assert brier["frac_target"] == 0.5 and brier["n"] == 120
    b0 = min(rel)
    b9 = max(rel)
    # a separable planted corpus calibrates sharply
    assert brier["mean_p"] < 0.05
    assert rel[b0]["frac_target"] == 0.0 and rel[b9]["frac_target"] == 1.0
    assert sum(r["n"] for r in rel.values()) == 120


def test_quality_calibration_remediate_brier_win_and_symmetry(spark):
    """Composed remediation (VERDICT r7 #6): on a PLANTED
    miscalibrated model (coefficients tempered x4 — overconfident
    probabilities with the same ranking), the isotonic map fitted on
    one xxhash half must cut the OTHER half's measured Brier; and the
    map itself is monotone (train/serve symmetric via the broadcast
    interval join)."""
    from etl_hero_spark.features import (
        quality_classifier_report,
        quality_calibration_remediate,
    )

    good_vocab = ["insight", "theorem", "analysis", "rigorous", "proof"]
    junk_vocab = ["buy", "click", "now", "spam", "winner"]
    rows = []
    for i in range(400):
        # noisy labels: 1/5 of each side flips source so probabilities
        # should NOT saturate — an overconfident model miscalibrates
        good = i % 2 == 0
        toks = [
            (good_vocab if good else junk_vocab)[(i + j) % 5]
            for j in range(12)
        ]
        # flip period (7) is coprime to the feature-pattern period
        # (i%5 x parity), so every feature group mixes both labels —
        # the model CANNOT separate and probabilities must not
        # saturate
        if i % 7 == 3:
            src = "crawl" if good else "wiki"
        else:
            src = "wiki" if good else "crawl"
        rows.append((i, " ".join(toks), src))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    _report, model = quality_classifier_report(
        docs, F.col("source") == "wiki", dim=16
    )
    # plant the miscalibration: same decision boundary, 4x tempered
    hot = dict(model)
    hot["coef"] = {c: 4.0 * b for c, b in model["coef"].items()}
    hot["intercept"] = 4.0 * model["intercept"]
    panel = quality_calibration_remediate(
        docs, F.col("source") == "wiki", hot
    )
    by = {r["part"]: r for r in panel.collect() if r["bucket"] is None}
    assert set(by) == {"brier_raw", "brier_calibrated"}
    # out-of-sample Brier must improve on the planted overconfidence
    assert by["brier_calibrated"]["mean_p"] < by["brier_raw"]["mean_p"]
    # both halves' n agree (same eval rows scored twice)
    assert by["brier_calibrated"]["n"] == by["brier_raw"]["n"] > 0
    # the calibrated reliability curve is monotone in bucket (the
    # isotonic map cannot cross itself)
    cal = sorted(
        (
            (r["bucket"], r["mean_p"])
            for r in panel.collect()
            if r["part"] == "reliability_calibrated"
            and r["bucket"] is not None
        ),
    )
    ps = [p for _, p in cal]
    assert ps == sorted(ps)


def test_quality_serve_frozen_model_semantics(spark):
    """The frozen reference model compiles vocab words into bucket
    space: a doc of positive markers must score margin > 0, a doc of
    negative markers < 0 (sign(w)^2 * weight / n = weight / n per
    vocab token), and the margin is n-invariant for pure-vocab docs."""
    from etl_hero_spark.features import hashed_token_feature_exprs
    from etl_hero_spark.registry_ext2 import (
        _QUALITY_REF_DIM,
        _quality_ref_coefs,
    )

    feats = hashed_token_feature_exprs("text", dim=_QUALITY_REF_DIM)
    coefs = _quality_ref_coefs()
    margin = None
    for j, c in coefs.items():
        term = F.lit(c) * feats[j]
        margin = term if margin is None else margin + term
    df = spark.createDataFrame(
        [
            (1, "fast merge vector spark agg"),
            (2, "slow small dup slow small"),
            (3, "fast fast fast fast"),
            (4, "fast"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", margin.alias("m")).collect()
    }
    assert got[1] == 1.0   # 5 positive tokens / 5 = +1 each
    assert got[2] == -1.0  # all negative markers
    assert got[3] == got[4] == 1.0  # rate, not count


def test_chunked_op_sql_depth_and_value():
    """r9: balanced chunking keeps expression depth bounded — a flat
    1024-term chain breaks BOTH stacks (parser: FAILED_TO_PARSE_TOO_
    COMPLEX; Column API: converter StackOverflow). Pure string checks
    here; the end-to-end dim=1024 fit is exercised by the scaling
    probe (SCALING.md r9)."""
    from etl_hero_spark.features import _chunked_op_sql, _chunked_sum_sql

    # small inputs pass through un-grouped
    assert _chunked_sum_sql(["1.0", "2.0"]) == "1.0 + 2.0"
    # 1025 terms: grouped into 64-term parens, then one outer level
    terms = [f"`f_{i}`" for i in range(1025)]
    s = _chunked_sum_sql(terms)
    # max run of terms between parens is the chunk size
    assert s.count("(") == s.count(")") == 17  # ceil(1025/64)
    # nesting depth stays 1 level here (17 < 64)
    assert "((" not in s
    # every term present exactly once
    assert all(t in s for t in terms[:3] + terms[-3:])
    # AND variant exact associativity form
    a = _chunked_op_sql([f"`c{i}` IS NOT NULL" for i in range(130)], " AND ")
    assert a.count("(") == 3 and " AND " in a


def test_logreg_gd_small_p_unaffected_by_chunking(spark):
    """At small p the chunked builder emits the identical flat chain,
    so the fit trajectory is unchanged (guards the dim<=64 behavior
    the r8 numbers were recorded under)."""
    import numpy as np

    from etl_hero_spark.features import logreg_fit_gd

    rng = np.random.default_rng(5)
    n = 800
    x = rng.normal(size=n)
    y = rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-(1.2 * x)))
    df = spark.createDataFrame(
        [(float(a), bool(c)) for a, c in zip(x, y)],
        "x double, y boolean",
    )
    m = logreg_fit_gd(df, ["x"], "y", max_iter=40)
    assert abs(m["coef"]["x"] - 1.2) < 0.35
    assert m["log_loss"] < 0.65


def test_quality_serve_relational_matches_per_row_form(spark):
    """Serve/batch symmetry for the frozen reference model: the
    registered RELATIONAL margin (explode + exact integer contribution
    sums + one division) agrees with the per-row serving-expression
    margin within float association, and keep/drop decisions match
    exactly on both thresholds."""
    from etl_hero_spark.features import hashed_token_feature_exprs
    from etl_hero_spark.registry_ext2 import (
        _QUALITY_REF_DIM,
        _quality_ref_coefs,
    )
    from etl_hero_spark.textops import tokens_expr

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    coefs = _quality_ref_coefs()
    # per-row serving form
    feats = hashed_token_feature_exprs("text", dim=_QUALITY_REF_DIM)
    row_margin = None
    for j, c in coefs.items():
        term = F.lit(c) * feats[j]
        row_margin = term if row_margin is None else row_margin + term
    per_row = {
        r["doc_id"]: r["m"]
        for r in docs.select("doc_id", row_margin.alias("m")).collect()
    }
    # relational compiled form (the registered query's construction)
    base = docs.select(
        "doc_id", tokens_expr(F.lower(F.col("text"))).alias("toks")
    )
    ex = base.select("doc_id", F.explode_outer("toks").alias("t"))
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
    per = ex.groupBy("doc_id").agg(F.sum(coef_case * sign).alias("num"))
    margin = (
        F.when(
            F.size("toks") > 0,
            F.coalesce(F.col("num"), F.lit(0.0))
            / F.size("toks").cast("double"),
        ).otherwise(F.lit(0.0))
        + F.lit(0.0)
    )
    rel = {
        r["doc_id"]: r["m"]
        for r in base.join(per, "doc_id", "left")
        .select("doc_id", margin.alias("m"))
        .collect()
    }
    assert set(per_row) == set(rel) and len(rel) == 500
    for k in rel:
        assert abs(per_row[k] - rel[k]) < 1e-12
        for thr in (0.0, 0.05):
            if abs(per_row[k] - thr) > 1e-12:
                # away from the boundary the decisions must agree;
                # ON the boundary the relational form is the exact
                # one (a net-zero doc reads exactly 0.0 relationally,
                # while the per-row sum of rounded quotients carries
                # ~1e-18 residue — the registered query uses the
                # exact form)
                assert (per_row[k] >= thr) == (rel[k] >= thr)


def test_logreg_fit_gd_intercept_only(spark):
    """ADVICE r9: x_cols=[] must fit the intercept-only model (the
    Column-API path supported it; the chunked-SQL conjunction briefly
    turned it into an F.expr('') parse error). The MLE intercept of a
    featureless logit is log(p/(1-p)) of the label mean."""
    import math

    from etl_hero_spark.features import logreg_fit_gd

    df = spark.createDataFrame(
        [(True,)] * 30 + [(False,)] * 10, "y boolean"
    )
    m = logreg_fit_gd(df, [], "y", max_iter=60)
    assert m["coef"] == [] or list(m["coef"]) == []
    assert m["n"] == 40
    assert abs(m["intercept"] - math.log(3.0)) < 1e-3


def test_quantile_reg_multi_matches_serial_trajectory(spark):
    """VERDICT r9 #6: the lockstep multi-tau fitter shares each IRLS
    pass across taus without touching any tau's trajectory — per step
    a tau's aggregate expressions are exactly the serial fit's. Pins
    coefficient/intercept/n_iter/frac_below equality to tight
    tolerance on a deterministic fixture."""
    from etl_hero_spark.features import (
        quantile_reg_fit,
        quantile_reg_fit_multi,
    )

    df = spark.createDataFrame(
        [
            (float(i % 17), float((i * 7) % 31) + 0.1 * (i % 5))
            for i in range(400)
        ],
        "x double, y double",
    ).coalesce(1)
    taus = [0.25, 0.5, 0.75]
    # max_iter=5 keeps the test to ~20 bounded aggregations; five
    # lockstep steps exercise warm start, per-step parity, and the
    # per-tau n_iter bookkeeping (none of the taus converges by 5, so
    # all stay active the whole way — the shared-pass path)
    multi = quantile_reg_fit_multi(df, ["x"], "y", taus=taus, max_iter=5)
    for tau, m in zip(taus, multi):
        s = quantile_reg_fit(df, ["x"], "y", tau=tau, max_iter=5)
        assert m["tau"] == s["tau"] == tau
        assert m["n"] == s["n"] == 400
        assert m["n_iter"] == s["n_iter"]
        assert abs(m["intercept"] - s["intercept"]) < 1e-9
        assert abs(m["coef"]["x"] - s["coef"]["x"]) < 1e-9
        assert abs(m["frac_below"] - s["frac_below"]) < 1e-12


def test_hashed_map_features_match_dense(spark):
    """VERDICT r9 #7: the map-typed encoder carries EXACTLY the dense
    form's operands — fmap[j]/n_toks_f is bit-identical to f_j for
    every bucket, empty docs get an empty map + n=0."""
    from etl_hero_spark.features import (
        hashed_token_features,
        hashed_token_features_map,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, ""),
            (4, "the the the repeated token stress the the"),
        ],
        "doc_id long, text string",
    )
    dim = 16
    dense = {
        r["doc_id"]: r
        for r in hashed_token_features(docs, dim=dim, ngrams=2).collect()
    }
    mapped = {
        r["doc_id"]: r
        for r in hashed_token_features_map(
            docs, dim=dim, ngrams=2
        ).collect()
    }
    assert set(dense) == set(mapped) == {1, 2, 3, 4}
    for did in dense:
        d, m = dense[did], mapped[did]
        assert d["n_toks_f"] == m["n_toks_f"]
        fmap = m["fmap"]
        for j in range(dim):
            got = (
                fmap[j] / m["n_toks_f"]
                if j in fmap and m["n_toks_f"]
                else 0.0
            )
            assert got == d[f"f_{j}"], (did, j)
    assert mapped[3]["fmap"] == {} and mapped[3]["n_toks_f"] == 0


def test_logreg_map_fit_matches_dense_fit(spark):
    """The never-densified diagonal-Newton fit agrees with the dense
    logreg_fit_gd on the same corpus at dense-feasible width (pinned
    passes), and the relational serve path scores identically to the
    dense serve."""
    import numpy as np

    from etl_hero_spark.features import (
        hashed_token_features,
        hashed_token_features_map,
        logreg_apply,
        logreg_apply_map,
        logreg_fit_gd,
        logreg_fit_gd_map,
    )

    docs = spark.createDataFrame(
        [
            (
                i,
                ("excellent prose with careful structure and clarity"
                 if i % 3 == 0
                 else "spam spam buy now click here free offer"),
            )
            for i in range(90)
        ],
        "doc_id long, text string",
    )
    dim = 32
    target = (F.col("doc_id") % 3 == 0).cast("int")
    dense_feats = hashed_token_features(docs, dim=dim)
    map_feats = hashed_token_features_map(docs, dim=dim)
    dm = logreg_fit_gd(
        dense_feats, [f"f_{j}" for j in range(dim)], target,
        max_iter=4, tol=0.0,
    )
    mm = logreg_fit_gd_map(map_feats, target, max_iter=4, tol=0.0)
    assert mm["n"] == dm["n"] == 90
    assert mm["n_iter"] == dm["n_iter"]
    assert abs(mm["intercept"] - dm["intercept"]) < 1e-6
    assert abs(mm["log_loss"] - dm["log_loss"]) < 1e-9
    for j, c in mm["coef"].items():
        assert abs(c - dm["coef"][f"f_{j}"]) < 1e-6, j
    # every dense coefficient the map fit omits belongs to an
    # unobserved bucket and stayed at its zero init
    omitted = set(range(dim)) - set(mm["coef"])
    for j in omitted:
        assert dm["coef"][f"f_{j}"] == 0.0
    # serve parity: relational map serve == dense literal serve
    ps_d = {
        r["doc_id"]: r["probability"]
        for r in logreg_apply(dense_feats, dm).collect()
    }
    ps_m = {
        r["doc_id"]: r["probability"]
        for r in logreg_apply_map(map_feats, mm).collect()
    }
    assert set(ps_d) == set(ps_m)
    arr = np.array([[ps_d[k], ps_m[k]] for k in ps_d])
    assert np.allclose(arr[:, 0], arr[:, 1], atol=1e-6)
    # the classifier actually separates the planted classes
    for k in ps_m:
        assert (ps_m[k] > 0.5) == (k % 3 == 0)


def test_logreg_map_fit_wide_dim_is_nnz_bounded(spark):
    """dim=65536 costs the same plan as dim=32 — the fit's state and
    per-pass relations depend only on OBSERVED buckets (nnz), never
    the declared width."""
    from etl_hero_spark.features import (
        hashed_token_features_map,
        logreg_fit_gd_map,
    )

    docs = spark.createDataFrame(
        [
            (i, "alpha beta gamma" if i % 2 else "delta epsilon zeta")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    feats = hashed_token_features_map(docs, dim=65536)
    m = logreg_fit_gd_map(
        feats, (F.col("doc_id") % 2 == 1).cast("int"), max_iter=3,
        tol=0.0,
    )
    # 6 distinct tokens -> at most 6 observed buckets carried
    assert 1 <= len(m["coef"]) <= 6
    assert m["n"] == 40 and m["n_iter"] == 3
