"""Recursive per-key sequence analytics: EWMA smoothing, CUSUM
changepoint detection, and Kaplan-Meier survival curves (extension
mandate — the monitoring/lifetime ops a training-data pipeline runs
over its event telemetry; the reference has no counterpart).

EWMA and CUSUM are RECURSIVE — s_t depends on s_{t-1} — which no Spark
window/builtin aggregate expresses. The scale-honest shape used here
keeps the recursion JVM-side anyway: collect each key's series into one
sorted array (``sort_array(collect_list(struct(ts, x)))``) and run the
recurrence with ``F.aggregate``'s fold — whole-stage-codegen lambda
over the array, zero Python in the hot path, one shuffle (the groupBy).
The contract is the same as every collect_list window in this repo: a
single KEY's series must fit in one task (telemetry keys are users /
devices — thousands of points, not billions); the cross-key dimension
is the distributed one. A per-key cap guards the degenerate key.

Kaplan-Meier is NOT recursive — S(t) = Π(1 - d_i/n_i) is a cumulative
product = exp(running sum of logs), so it's a plain ordered window over
the DISTINCT-duration table (bounded: durations are day-granularity),
after one groupBy folds the corpus to that table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SeriesCapError(RuntimeError):
    """A key's series exceeded max_series_len with on_oversized='error'."""


def _guard_series(
    seqs: DataFrame, max_series_len: int, on_oversized: str, op: str
) -> DataFrame:
    """Exclude (loudly) keys whose collected series exceed the cap —
    the skew.guarded_join posture: a million-point key would serialize
    a million-element array through one task."""
    seqs = seqs.withColumn("_len", F.size("seq"))
    if on_oversized != "silent":
        over = (
            seqs.filter(F.col("_len") > max_series_len)
            .agg(F.count(F.lit(1)).alias("n"), F.max("_len").alias("worst"))
            .first()
        )
        if over["n"]:
            msg = (
                f"{op}: {over['n']} key(s) exceed max_series_len="
                f"{max_series_len} (worst {over['worst']} points) and are "
                "excluded — raise the cap or pre-segment the key."
            )
            if on_oversized == "error":
                raise SeriesCapError(msg)
            import warnings

            warnings.warn(msg, stacklevel=3)
    return seqs.filter(F.col("_len") <= max_series_len).drop("_len")


def _collect_series(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str
) -> DataFrame:
    """(keys..., seq array<struct<ts,x>>) with seq sorted by (ts, x) —
    the struct sort gives a deterministic total order even on tied
    timestamps."""
    return df.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("seq")
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    adjust: bool = False,
    max_series_len: int = 100_000,
    on_oversized: str = "warn",
) -> DataFrame:
    """Per-key exponentially weighted moving average, pandas
    ``ewm(alpha, adjust).mean()`` semantics with ignore_na=True:

    * adjust=False: s_t = α·x_t + (1-α)·s_{t-1} (s_0 = first x)
    * adjust=True:  s_t = Σ(1-α)^i·x_{t-i} / Σ(1-α)^i via the
      num/den recurrence (num_t = x_t + (1-α)·num_{t-1}, same for den)
    * null x: state carries unchanged; the row's ewma is the prior
      smoothed value (null until the first observation).

    Output: one row per input point — (keys..., ts, x, ewma). The fold
    runs inside whole-stage codegen (``F.aggregate``); per-key series
    bounded by ``max_series_len`` (oversized keys excluded loudly).
    pandas parity pinned in tests/test_timeseries.py.
    """
    a = float(alpha)
    seqs = _guard_series(
        _collect_series(df, key_cols, ts_col, value_col),
        max_series_len,
        on_oversized,
        "ewma",
    )
    nullD = F.lit(None).cast("double")
    if not adjust:
        # acc: struct(prev double, out array<double>)
        def step(acc, p):
            new = (
                F.when(p["x"].isNull(), acc["prev"])
                .when(acc["prev"].isNull(), p["x"])
                .otherwise(a * p["x"] + (1.0 - a) * acc["prev"])
            )
            return F.struct(
                new.alias("prev"),
                F.concat(acc["out"], F.array(new)).alias("out"),
            )

        init = F.struct(
            nullD.alias("prev"),
            F.array().cast("array<double>").alias("out"),
        )
    else:
        # acc: struct(num double, den double, out array<double>)
        def step(acc, p):
            num = F.when(p["x"].isNull(), acc["num"]).otherwise(
                p["x"] + (1.0 - a) * acc["num"]
            )
            den = F.when(p["x"].isNull(), acc["den"]).otherwise(
                1.0 + (1.0 - a) * acc["den"]
            )
            val = F.when(den > 0.0, num / den).otherwise(nullD)
            return F.struct(
                num.alias("num"),
                den.alias("den"),
                F.concat(acc["out"], F.array(val)).alias("out"),
            )

        init = F.struct(
            F.lit(0.0).alias("num"),
            F.lit(0.0).alias("den"),
            F.array().cast("array<double>").alias("out"),
        )

    out = seqs.withColumn(
        "_ew", F.aggregate("seq", init, step, lambda acc: acc["out"])
    )
    exploded = out.select(
        *[F.col(k) for k in key_cols],
        F.posexplode(F.arrays_zip("seq", "_ew")).alias("_i", "_z"),
    )
    return exploded.select(
        *key_cols,
        F.col("_z.seq.ts").alias(ts_col),
        F.col("_z.seq.x").alias(value_col),
        F.col("_z._ew").alias("ewma"),
    )


def cusum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    k_sigma: float = 0.5,
    h_sigma: float = 5.0,
    max_series_len: int = 100_000,
    on_oversized: str = "warn",
) -> DataFrame:
    """Two-sided standardized CUSUM drift detector per key:

        z_t  = (x_t - μ_key) / σ_key          (population σ, exact
                                               decimal-free but per-key
                                               μ/σ from the same pass)
        s+_t = max(0, s+_{t-1} + z_t - k)
        s-_t = max(0, s-_{t-1} - z_t - k)
        alarm_t = s+_t > h  or  s-_t > h      (no reset — s keeps
                                               accumulating; first
                                               alarm = changepoint)

    Output: (keys..., ts, x, s_pos, s_neg, alarm). σ=0 / single-point
    keys emit s=0, no alarms. Null x carries state (no drift evidence).
    Python-loop parity pinned in tests/test_timeseries.py.
    """
    kk, hh = float(k_sigma), float(h_sigma)
    seqs = _guard_series(
        _collect_series(df, key_cols, ts_col, value_col),
        max_series_len,
        on_oversized,
        "cusum",
    )
    xs = F.filter("seq", lambda p: p["x"].isNotNull())
    n = F.size(xs).cast("double")
    mu = F.when(
        n > 0,
        F.aggregate(xs, F.lit(0.0), lambda acc, p: acc + p["x"]) / n,
    )
    var = F.when(
        n > 0,
        F.aggregate(
            xs,
            F.lit(0.0),
            lambda acc, p: acc + (p["x"] - F.col("_mu")) * (p["x"] - F.col("_mu")),
        )
        / n,
    )
    seqs = (
        seqs.withColumn("_mu", mu)
        .withColumn("_sigma", F.sqrt(var))
    )

    # acc: struct(sp double, sn double, out array<struct<sp,sn>>)
    def step(acc, p):
        z = F.when(
            p["x"].isNull() | F.col("_sigma").isNull() | (F.col("_sigma") <= 0.0),
            F.lit(None).cast("double"),
        ).otherwise((p["x"] - F.col("_mu")) / F.col("_sigma"))
        sp = F.when(z.isNull(), acc["sp"]).otherwise(
            F.greatest(F.lit(0.0), acc["sp"] + z - kk)
        )
        sn = F.when(z.isNull(), acc["sn"]).otherwise(
            F.greatest(F.lit(0.0), acc["sn"] - z - kk)
        )
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.concat(
                acc["out"],
                F.array(F.struct(sp.alias("sp"), sn.alias("sn"))),
            ).alias("out"),
        )

    init = F.struct(
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
        F.array().cast("array<struct<sp:double,sn:double>>").alias("out"),
    )
    out = seqs.withColumn(
        "_cs", F.aggregate("seq", init, step, lambda acc: acc["out"])
    )
    exploded = out.select(
        *[F.col(k) for k in key_cols],
        F.posexplode(F.arrays_zip("seq", "_cs")).alias("_i", "_z"),
    )
    return exploded.select(
        *key_cols,
        F.col("_z.seq.ts").alias(ts_col),
        F.col("_z.seq.x").alias(value_col),
        F.round(F.col("_z._cs.sp"), 9).alias("s_pos"),
        F.round(F.col("_z._cs.sn"), 9).alias("s_neg"),
        (
            (F.col("_z._cs.sp") > hh) | (F.col("_z._cs.sn") > hh)
        ).alias("alarm"),
    )


def km_survival(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier estimator from (duration, event) pairs — event=1 is
    an observed event at `duration`, event=0 a right-censored subject
    last seen at `duration`. Returns the standard KM table at EVENT
    times only (censoring changes the at-risk count, not the curve):

        (duration, n_risk, n_events, n_censored, survival)
        n_risk_i  = subjects with duration >= t_i
        survival  = Π_{j<=i} (1 - d_j / n_j)
                  = exp(Σ ln(1 - d/n))   — log-sum window, exact to
                                           double round-off, rounded 9dp

    Plan: one groupBy folds N subjects to the distinct-duration table
    (bounded — durations are day/hour-granularity, k ~ hundreds), then
    the two cumulatives (at-risk count, log-survival) come from
    BROADCAST self-joins over that k-row table — the packing
    `_bucket_offsets` shape — never a partition-less window (a
    single-task global sort; the O(k²) nested-loop join over a bounded
    table is cheaper and fully parallel). d_j = n_j (everyone at risk
    dies) takes an explicit -inf branch — Spark's log(0) is NULL with
    ANSI off, which would silently DROP the terminal step — so
    survival hits exactly 0.0, the right limit. DuckDB-SQL parity
    pinned in tests/test_timeseries.py.
    """
    ev = F.col(event_col).cast("int")
    per_t = df.groupBy(
        F.col(duration_col).cast("double").alias("duration")
    ).agg(
        F.sum(ev).cast("bigint").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(ev)).cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).alias("_n_at_t"),
    )
    # n_risk_i = sum of subjects at every duration >= t_i
    later = per_t.select(
        F.col("duration").alias("_d2"), F.col("_n_at_t").alias("_c2")
    )
    risk = (
        per_t.join(F.broadcast(later), F.col("_d2") >= F.col("duration"))
        .groupBy("duration", "n_events", "n_censored")
        .agg(F.sum("_c2").cast("bigint").alias("n_risk"))
    )
    terms = risk.select(
        F.col("duration").alias("_d3"),
        F.when(
            F.col("n_events") >= F.col("n_risk"), F.lit(float("-inf"))
        )
        .when(
            F.col("n_events") > 0,
            F.log(
                1.0
                - F.col("n_events").cast("double")
                / F.col("n_risk").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("_lt"),
    )
    km = (
        risk.join(F.broadcast(terms), F.col("_d3") <= F.col("duration"))
        .groupBy("duration", "n_events", "n_censored", "n_risk")
        .agg(F.round(F.exp(F.sum("_lt")), 9).alias("survival"))
    )
    return (
        km.filter(F.col("n_events") > 0)
        .select("duration", "n_risk", "n_events", "n_censored", "survival")
        .orderBy("duration")
    )


# ---------------------------------------------------------------------------
# autocorrelation function over a bucketed series
# ---------------------------------------------------------------------------


def acf(
    df: DataFrame,
    ts_col: str,
    max_lag: int = 24,
    bucket_seconds: int = 3600,
    value_col: str | None = None,
    scale: int = 9,
) -> DataFrame:
    """Sample autocorrelation r_k for k = 1..max_lag over the
    bucket-aggregated series (hourly by default):

        r_k = sum_{t>k} (y_t - ybar)(y_{t-k} - ybar) / sum_t (y_t - ybar)^2

    y_t is the event COUNT per bucket (or the exact-decimal SUM of
    ``value_col``), with EMPTY buckets densified to 0 — the estimator
    assumes a contiguous series, and a gap is a real zero in event
    telemetry, not missing data. The biased (1/n shared-denominator)
    estimator, the standard plotting convention.

    Scale shape: the 100 TB corpus contributes exactly ONE groupBy (the
    bucket fold); the bounded series is parquet_checkpoint'ed so its
    five consumers (bounds spine, mean, denominator, both self-join
    sides) re-read a tiny columnar stage instead of re-scanning the
    corpus. The lag fan-out is explode(sequence(1, K)) on one side of
    an equi-join on (t - k) — K bounded rows per bucket, never a
    window over the whole series.

    Output: (lag, n_pairs, acf) for k = 1..max_lag, ascending.
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    idx = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("bigint")
    y = (
        F.count(F.lit(1)).cast("double")
        if value_col is None
        else F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
    )
    series = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(idx.alias("t"))
        .agg(y.alias("y"))
    )
    series = parquet_checkpoint(series, "acf-series")

    bounds = series.agg(F.min("t").alias("_lo"), F.max("t").alias("_hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("t")
    )
    dense = parquet_checkpoint(
        spine.join(series, "t", "left").select(
            "t", F.coalesce("y", F.lit(0.0)).alias("y")
        ),
        "acf-dense",
    )
    stats = dense.agg(
        F.avg("y").alias("_ybar"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    # shared denominator needs ybar first: one more tiny pass over the
    # checkpointed series
    denom = (
        dense.crossJoin(F.broadcast(stats))
        .agg(
            F.sum(
                (F.col("y") - F.col("_ybar")) * (F.col("y") - F.col("_ybar"))
            ).alias("_den"),
            F.first("_ybar").alias("_ybar"),
        )
    )
    left = dense.select(
        F.col("t"),
        F.col("y").alias("y_t"),
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
    ).withColumn("_probe", F.col("t") - F.col("lag"))
    lagged = dense.select(
        F.col("t").alias("_probe"), F.col("y").alias("y_lag")
    )
    pairs = left.join(lagged, "_probe")
    return (
        pairs.crossJoin(F.broadcast(denom))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(
                    (F.col("y_t") - F.col("_ybar"))
                    * (F.col("y_lag") - F.col("_ybar"))
                )
                / F.first("_den"),
                scale,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 1,
    max_series_len: int = 100_000,
    on_oversized: str = "warn",
) -> DataFrame:
    """Per-key Holt linear-trend (double exponential) smoothing — the
    two-state sibling of ewma, the standard short-range forecaster for
    trending telemetry:

        level_t = α·x_t + (1-α)·(level_{t-1} + trend_{t-1})
        trend_t = β·(level_t - level_{t-1}) + (1-β)·trend_{t-1}

    initialized the textbook way (level_0 = x_0; trend_0 = x_1 - x_0
    on the second observation). Null x carries both states unchanged
    (the row's outputs are the prior states, mirroring ewma's
    ignore_na). Output: one row per input point — (keys..., ts, x,
    level, trend, forecast) where forecast = level + horizon·trend,
    the h-step-ahead prediction AS OF that row.

    Same scale contract as ewma: the recursion is inherently serial
    per key, so each key's series folds inside whole-stage codegen
    (``F.aggregate``) over one sorted array; the cross-key dimension
    distributes, a per-key cap guards the degenerate key. Python-loop
    parity pinned in tests/test_timeseries_extra.py.
    """
    a, b = float(alpha), float(beta)
    seqs = _guard_series(
        _collect_series(df, key_cols, ts_col, value_col),
        max_series_len,
        on_oversized,
        "holt_linear",
    )
    nullD = F.lit(None).cast("double")

    # acc: struct(lvl, trd, n long, out array<struct<lvl,trd>>)
    def step(acc, p):
        first = acc["n"] == 0
        second = acc["n"] == 1
        new_lvl = (
            F.when(p["x"].isNull(), acc["lvl"])
            .when(first, p["x"])
            .otherwise(
                a * p["x"]
                + (1.0 - a) * (acc["lvl"] + F.coalesce(acc["trd"], F.lit(0.0)))
            )
        )
        new_trd = (
            F.when(p["x"].isNull(), acc["trd"])
            .when(first, nullD)
            .when(second, p["x"] - acc["lvl"])
            .otherwise(
                b * (new_lvl - acc["lvl"])
                + (1.0 - b) * F.coalesce(acc["trd"], F.lit(0.0))
            )
        )
        new_n = F.when(p["x"].isNull(), acc["n"]).otherwise(acc["n"] + 1)
        return F.struct(
            new_lvl.alias("lvl"),
            new_trd.alias("trd"),
            new_n.alias("n"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        new_lvl.alias("lvl"), new_trd.alias("trd")
                    )
                ),
            ).alias("out"),
        )

    init = F.struct(
        nullD.alias("lvl"),
        nullD.alias("trd"),
        F.lit(0).cast("long").alias("n"),
        F.array().cast("array<struct<lvl: double, trd: double>>").alias(
            "out"
        ),
    )
    out = seqs.withColumn(
        "_h", F.aggregate("seq", init, step, lambda acc: acc["out"])
    )
    exploded = out.select(
        *[F.col(k) for k in key_cols],
        F.posexplode(F.arrays_zip("seq", "_h")).alias("_i", "_z"),
    )
    h = float(horizon)
    lvl = F.col("_z._h.lvl")
    trd = F.col("_z._h.trd")
    return exploded.select(
        *key_cols,
        F.col("_z.seq.ts").alias(ts_col),
        F.col("_z.seq.x").alias(value_col),
        lvl.alias("level"),
        trd.alias("trend"),
        F.when(trd.isNotNull(), lvl + F.lit(h) * trd).alias("forecast"),
    )
