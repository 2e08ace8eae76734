"""Temporal join operators Spark lacks as primitives (as-of join, range
join) — extension mandate examples, composed from DataFrame ops.

Both are written as the distributed plans you would run at 100 TB:

* as-of join — the union/last_value construction: tag both sides, union,
  one window over (keys, ts) carrying the right side's payload forward
  with last(ignorenulls). ONE shuffle on the join keys, no row
  explosion, no per-key driver loop. (A sort-merge as-of needs engine
  support; this is the standard DataFrame-level equivalent.)
* range join — bucketize time, equi-join on (key, bucket) for the
  buckets a range can touch, then exact predicate. Turns an
  O(n x m) theta-join into an equi-join Catalyst can hash/broadcast;
  bucket width should match the range width (each probe touches
  ceil(range/width)+1 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row with equal keys by time:

    * ``backward`` (default): the latest right with right_ts <= left_ts
      (inclusive — DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``);
    * ``forward``: the earliest right with right_ts >= left_ts
      (inclusive);
    * ``nearest``: whichever of the two is closer in absolute time,
      ties preferring backward (pandas ``merge_asof`` direction
      semantics).

    Plan: tag + unionByName + last/first(ignorenulls) over ONE
    (keys, ts, tag) window sort — a single hash shuffle for every
    direction; ``nearest`` evaluates the preceding and following frames
    over the same sorted partition (two Window nodes, zero extra
    exchanges) and picks per row. The tag orders the right row at an
    identical timestamp INSIDE the frame, so ties match inclusively.
    Left rows with no candidate keep NULLs (left-join semantics).

    ``nearest`` measures distance on any orderable ts dtype (timestamps
    in micros, dates in days, numerics raw). Caveat: the picked value
    is first/last(ignorenulls) within the chosen side's frame — if the
    nearest right row carries a NULL in a value column, that column
    falls back to the next non-null row on the SAME side (farther in
    time), while the side choice itself is made on b_ts/f_ts distance.
    Keep right value columns non-null (or pre-filter) when exact
    row-alignment of NULLs matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    carried = [f"{c}{suffix}" for c in value_cols]
    # right sorts before left at equal ts for backward/nearest frames,
    # after left for the forward frame — keeps equal-ts rows inside the
    # relevant frame in every direction
    r_rank = 0 if direction in ("backward", "nearest") else 1
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_src", F.lit(1 - r_rank)
    )
    for c in carried:
        l_tag = l_tag.withColumn(c, F.lit(None))
    l_tag = l_tag.withColumn("_is_left", F.lit(1))
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(r_rank).alias("_src"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = W.partitionBy(*keys).orderBy(
        F.col("_ts").asc(), F.col("_src").asc()
    )
    back = order.rowsBetween(W.unboundedPreceding, 0)
    fwd = order.rowsBetween(0, W.unboundedFollowing)
    rts = F.when(F.col("_is_left") == 0, F.col("_ts"))
    if direction == "backward":
        picks = {c: F.last(c, ignorenulls=True).over(back) for c in carried}
    elif direction == "forward":
        picks = {c: F.first(c, ignorenulls=True).over(fwd) for c in carried}
    else:
        b_ts = F.last(rts, ignorenulls=True).over(back)
        f_ts = F.first(rts, ignorenulls=True).over(fwd)

        # distance works on any orderable ts dtype, matching backward/
        # forward (ADVICE r3): timestamps compare in micros, dates in
        # days, numerics (epoch longs/doubles) on their raw difference
        from pyspark.sql import types as T

        ts_type = dict(zip(both.columns, both.schema.fields))[
            "_ts"
        ].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            axis = F.unix_micros
        elif isinstance(ts_type, T.DateType):
            axis = F.unix_date
        else:
            axis = lambda c: c.cast("double")  # noqa: E731
        # backward wins ties and missing-forward; forward wins only when
        # strictly closer (or backward missing)
        use_fwd = b_ts.isNull() | (
            f_ts.isNotNull()
            & (
                (axis(f_ts) - axis(F.col("_ts")))
                < (axis(F.col("_ts")) - axis(b_ts))
            )
        )
        picks = {
            c: F.when(
                use_fwd, F.first(c, ignorenulls=True).over(fwd)
            ).otherwise(F.last(c, ignorenulls=True).over(back))
            for c in carried
        }
    filled = both.select(
        "*", *[picks[c].alias(f"_f_{c}") for c in carried]
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *left.columns, *[F.col(f"_f_{c}").alias(c) for c in carried]
    )
    return out


def resample_forward_fill(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize an irregular per-key time series: one output row per
    key per ``step_seconds`` grid point (epoch-aligned, spanning that
    key's [floor(min ts), max ts]), each carrying the last observation
    at-or-before the grid point (LOCF forward fill). The standard
    resample/gap-fill operator (pandas ``resample().ffill()``,
    TimescaleDB ``time_bucket_gapfill``+``locf``) the reference has no
    equivalent for.

    Plan: one per-key (min, max) aggregate expands to grid rows via
    ``sequence``+``explode`` (generation is distributed — each key's
    grid materializes on its executor, never the driver); grid rows
    union with observations and ONE window over (keys, ts) carries
    values forward exactly like ``asof_join``. Two key-partitioned
    shuffles total, no range explosion beyond the requested grid, no
    per-key driver loop. Observations sort before the grid marker at an
    identical timestamp, so a grid point lying on an observation takes
    that observation's value.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = value_cols or [
        c for c in df.columns if c not in keys + [ts_col]
    ]
    # a NULL timestamp sorts before every grid point and would leak its
    # values into the first fill — an untimed observation is not on the
    # series
    df = df.filter(F.col(ts_col).isNotNull())
    step = int(step_seconds)
    lo = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.min(ts_col)) / step) * step
    )
    grid = (
        df.groupBy(*keys)
        .agg(lo.alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    "_lo", "_hi", F.expr(f"INTERVAL {step} SECOND")
                )
            ).alias(ts_col),
            F.lit(1).alias("_src"),
            *[F.lit(None).alias(c) for c in value_cols],
        )
    )
    obs = df.select(
        *keys, ts_col, F.lit(0).alias("_src"), *value_cols
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_src").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = obs.unionByName(grid).select(
        *keys,
        ts_col,
        "_src",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_src") == 1).drop("_src")


def resample_interpolate(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Linear-interpolation sibling of resample_forward_fill (pandas
    ``resample().interpolate('linear')``, TimescaleDB
    ``time_bucket_gapfill``+``interpolate``): one row per key per
    ``step_seconds`` grid point, value linearly interpolated between
    the surrounding observations

        v(t) = v_prev + (v_next - v_prev) * (t - t_prev)/(t_next - t_prev)

    A grid point on an observation takes that observation's value
    exactly; grid points before the key's first observation stay NULL
    (no extrapolation — LOCF covers the trailing side by construction
    since the grid ends at max ts). The right fill for continuously
    varying signals (sensor readings, prices) where LOCF's staircase
    biases downstream windows.

    Plan: the same distributed grid union as resample_forward_fill,
    then ONE (keys, ts) window pass computes both the
    last-non-null-before (value, ts) and the first-non-null-after
    (value, ts) — two frames over one sort, two key-partitioned
    shuffles total, no per-key driver loop. The interpolation itself
    is a scalar IEEE expression (DuckDB-mirrorable; parity pinned in
    tests/test_temporal.py).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    df = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    step = int(step_seconds)
    lo = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.min(ts_col)) / step) * step
    )
    grid = (
        df.groupBy(*keys)
        .agg(lo.alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    "_lo", "_hi", F.expr(f"INTERVAL {step} SECOND")
                )
            ).alias(ts_col),
            F.lit(1).alias("_grid"),
            F.lit(None).cast("double").alias("_v"),
        )
    )
    # collapse duplicate-timestamp observations deterministically (MAX)
    # — a tie under the window sort would otherwise make last()/first()
    # partition-order dependent
    obs = (
        df.groupBy(*keys, ts_col)
        .agg(F.max(F.col(value_col).cast("double")).alias("_v"))
        .select(*keys, F.col(ts_col), F.lit(0).alias("_grid"), "_v")
    )
    # observations sort before the grid marker at an identical ts, so
    # an on-observation grid point interpolates trivially (frac crosses
    # zero-length span -> guarded to take the observation value)
    order = [F.col(ts_col).asc(), F.col("_grid").asc()]
    w_back = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_ts = F.when(F.col("_grid") == 0, F.unix_micros(F.col(ts_col)))
    both = obs.unionByName(grid).select(
        *keys,
        ts_col,
        "_grid",
        F.last("_v", ignorenulls=True).over(w_back).alias("_pv"),
        F.last(obs_ts, ignorenulls=True).over(w_back).alias("_pt"),
        F.first("_v", ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(obs_ts, ignorenulls=True).over(w_fwd).alias("_nt"),
    )
    t = F.unix_micros(F.col(ts_col))
    frac = (t - F.col("_pt")).cast("double") / (
        (F.col("_nt") - F.col("_pt")).cast("double")
    )
    interp = F.when(
        F.col("_pt").isNull() | F.col("_nt").isNull(),
        # before first / after last observation: LOCF on the trailing
        # side (grid ends at max ts so _pv exists there), NULL leading
        F.col("_pv"),
    ).when(
        F.col("_nt") == F.col("_pt"), F.col("_pv")
    ).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    )
    return (
        both.filter(F.col("_grid") == 1)
        .select(*keys, ts_col, interp.alias(value_col))
    )


def range_join_count(
    probe: DataFrame,
    events: DataFrame,
    keys: list[str] | str,
    probe_ts: str = "ts",
    event_ts: str = "ts",
    lookback_seconds: int = 300,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each probe row: count of event rows with the same keys in the
    half-open window (probe_ts - lookback, probe_ts]. (The probe row
    itself is excluded only if it is not in `events`.)

    Bucketized range join: both sides bucket ts by lookback width; a
    probe's window spans at most 2 adjacent buckets, so the probe side
    explodes x2 onto (keys, bucket), the equi-join does the heavy
    lifting, and the exact time predicate filters the boundary slack.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    width = int(lookback_seconds)
    p_bucket = F.floor(F.unix_micros(F.col(probe_ts)) / (width * 1_000_000))
    e_bucket = F.floor(F.unix_micros(F.col(event_ts)) / (width * 1_000_000))
    p = probe.withColumn(
        "_bucket", F.explode(F.array(p_bucket.cast("long"), (p_bucket - 1).cast("long")))
    ).withColumn("_pts", F.unix_micros(F.col(probe_ts)))
    e = events.select(
        *keys,
        e_bucket.cast("long").alias("_bucket"),
        F.unix_micros(F.col(event_ts)).alias("_ets"),
    )
    lo = F.col("_pts") - F.lit(width * 1_000_000)
    joined = p.join(e, keys + ["_bucket"]).filter(
        (F.col("_ets") > lo) & (F.col("_ets") <= F.col("_pts"))
    )
    grouped = joined.groupBy(*[F.col(c) for c in probe.columns]).agg(
        F.count(F.lit(1)).alias(count_alias)
    )
    # probes with zero matches drop out of the inner join: restore them
    return (
        probe.join(grouped, probe.columns, "left")
        .na.fill({count_alias: 0})
        .withColumn(count_alias, F.col(count_alias).cast("bigint"))
    )


def rolling_features(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int | None = None,
    window_rows: int | None = None,
) -> DataFrame:
    """Per-key trailing-window features (the feature-engineering
    staple): adds roll_n / roll_sum / roll_min / roll_max / roll_mean
    over either a TIME frame (rangeBetween on epoch seconds — the
    window covers (t - window_seconds, t], late-arriving density
    changes included) or a ROW frame (last N observations). Exactly
    one of window_seconds / window_rows.

    ONE window over (keys, ts) — single hash shuffle, sorted once,
    every feature shares the frame. Sums accumulate in DECIMAL so
    roll_sum/roll_mean are order-independent (engine-exact to 9dp,
    DuckDB-pinned in tests); NULL values leave roll_n of non-null
    observations intact via count(value). The RANGE frame includes all
    equal-timestamp peers, so the time form is deterministic under
    ties; the ROW form is only deterministic when (keys, ts) is unique
    — prefer the time form on real event data."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if (window_seconds is None) == (window_rows is None):
        raise ValueError("pass exactly one of window_seconds/window_rows")
    if window_seconds is not None:
        base = df.withColumn("_sec", F.unix_timestamp(F.col(ts_col)))
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("_sec").asc())
            .rangeBetween(-int(window_seconds) + 1, 0)
        )
    else:
        base = df.withColumn("_sec", F.lit(None))
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(-(int(window_rows) - 1), 0)
        )
    v = F.col(value_col)
    dec = v.cast("decimal(28,9)")
    n = F.count(v).over(w)
    s = F.sum(dec).over(w).cast("double")
    out = (
        base.withColumn("roll_n", n.cast("bigint"))
        .withColumn("roll_sum", F.round(s, 9))
        .withColumn("roll_min", F.min(v).over(w))
        .withColumn("roll_max", F.max(v).over(w))
        .withColumn(
            "roll_mean",
            F.round(s / n.cast("double"), 9),
        )
        .drop("_sec")
    )
    return out


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str] | str,
    a_start: str = "start",
    a_end: str = "end",
    b_start: str = "start",
    b_end: str = "end",
    bucket_seconds: int = 3600,
    suffixes: tuple = ("_a", "_b"),
) -> DataFrame:
    """All pairs of intervals (one from each side, same keys) that
    OVERLAP under closed-interval semantics (a_start <= b_end AND
    b_start <= a_end; touching endpoints overlap) — the session-
    alignment / campaign-attribution join Spark has no primitive for,
    and a naive theta-join plans as a per-key cartesian product.

    Plan: both sides explode onto the time buckets their interval
    covers (sequence over floor(start/w)..floor(end/w) — distributed,
    one row per covered bucket); overlapping intervals necessarily
    share >= 1 bucket, so a (keys, bucket) equi-join finds every
    candidate, the exact predicate removes boundary slack, and a
    distinct collapses multi-bucket double-matches. Row expansion is
    len(interval)/bucket_seconds per side — size ``bucket_seconds``
    near the typical interval length (expansion ~2x), never far below
    it. Columns colliding across sides take ``suffixes``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    shared = (set(a.columns) & set(b.columns)) - set(keys)
    a_r = a
    b_r = b
    for c in shared:
        a_r = a_r.withColumnRenamed(c, f"{c}{suffixes[0]}")
        b_r = b_r.withColumnRenamed(c, f"{c}{suffixes[1]}")
    asfx = lambda c: f"{c}{suffixes[0]}" if c in shared else c  # noqa: E731
    bsfx = lambda c: f"{c}{suffixes[1]}" if c in shared else c  # noqa: E731
    w = int(bucket_seconds)

    def bucketed(df, start, end):
        lo = F.floor(F.unix_timestamp(F.col(start)) / w).cast("long")
        hi = F.floor(F.unix_timestamp(F.col(end)) / w).cast("long")
        return df.withColumn(
            "_bucket", F.explode(F.sequence(lo, hi))
        )

    ab = bucketed(a_r, asfx(a_start), asfx(a_end))
    bb = bucketed(b_r, bsfx(b_start), bsfx(b_end))
    joined = ab.join(bb, keys + ["_bucket"]).filter(
        (F.col(asfx(a_start)) <= F.col(bsfx(b_end)))
        & (F.col(bsfx(b_start)) <= F.col(asfx(a_end)))
    )
    out_cols = (
        keys
        + [asfx(c) for c in a.columns if c not in keys]
        + [bsfx(c) for c in b.columns if c not in keys]
    )
    return joined.select(*out_cols).distinct()


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str] | str,
    fact_ts: str = "ts",
    valid_from: str = "effective_from",
    valid_to: str = "effective_to",
    how: str = "left",
) -> DataFrame:
    """Join each fact to the dimension VERSION that was valid at the
    fact's own timestamp — the feature-store / Kimbal correctness
    primitive (training-serving skew is exactly what you get when
    features join to today's dimension instead of the one in force at
    event time). ``history`` is an SCD2 table (cdc.scd2_history's
    shape): half-open [valid_from, valid_to) validity, open version has
    NULL valid_to.

    Plan: equi-join on the keys + interval filter. Because a key's
    versions are non-overlapping, at most one version survives per
    fact; pre-filter fanout is versions-per-key (run-length of the
    change log — small by construction, no cap needed). One shuffle on
    the keys for each side; with ``how='left'`` facts predating the
    first version keep NULL dimension columns instead of dropping.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    cond = (F.col(fact_ts) >= F.col(valid_from)) & (
        F.col(valid_to).isNull() | (F.col(fact_ts) < F.col(valid_to))
    )
    for k in keys:
        cond = cond & (facts[k] == history[k])
    joined = facts.join(history, cond, how)
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[
            history[c]
            for c in history.columns
            if c not in keys
        ],
    )
