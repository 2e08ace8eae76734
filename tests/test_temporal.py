"""Temporal joins: as-of (backward, inclusive) and bucketized range join."""

import pyspark.sql.functions as F


def _ts_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")


def test_asof_backward_inclusive_and_left_semantics(spark):
    from etl_hero_spark.temporal import asof_join

    left = _ts_df(
        spark,
        [
            (1, 1, "2024-01-01 00:10:00"),  # after r@00:05 -> matches 100
            (2, 1, "2024-01-01 00:05:00"),  # EXACTLY r@00:05 -> inclusive
            (3, 1, "2024-01-01 00:01:00"),  # before any right -> NULL
            (4, 2, "2024-01-01 00:30:00"),  # user 2 has no right rows
        ],
        "event_id long, user_id long, ts_s string",
    )
    right = _ts_df(
        spark,
        [
            (1, "2024-01-01 00:05:00", 100.0),
            (1, "2024-01-01 00:09:00", 200.0),
        ],
        "user_id long, ts_s string, value double",
    )
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, "user_id").collect()
    }
    assert out[1] == 200.0  # latest prior (00:09), not the first
    assert out[2] == 100.0  # tie on timestamp matches (inclusive)
    assert out[3] is None  # no prior right row
    assert out[4] is None  # key with no right rows survives (left join)


def test_asof_join_single_shuffle_no_row_explosion(spark):
    """The union/last_value construction must plan ONE key shuffle and
    preserve left cardinality exactly."""
    from etl_hero_spark.temporal import asof_join

    left = _ts_df(
        spark,
        [(i, i % 3, f"2024-01-01 00:{i:02d}:00") for i in range(30)],
        "event_id long, user_id long, ts_s string",
    )
    right = _ts_df(
        spark,
        [(i % 3, f"2024-01-01 00:{i:02d}:30", float(i)) for i in range(30)],
        "user_id long, ts_s string, value double",
    )
    out = asof_join(left, right, "user_id")
    assert out.count() == 30


def test_range_join_count_boundaries(spark):
    from etl_hero_spark.temporal import range_join_count

    events = _ts_df(
        spark,
        [
            (1, 1, "2024-01-01 00:00:00"),  # exactly lookback before probe: excluded (>)
            (2, 1, "2024-01-01 00:00:01"),  # inside
            (3, 1, "2024-01-01 00:05:00"),  # == probe ts: included (<=)
            (4, 2, "2024-01-01 00:04:59"),  # other key: never counted
        ],
        "event_id long, user_id long, ts_s string",
    )
    probe = _ts_df(
        spark,
        [(100, 1, "2024-01-01 00:05:00")],
        "event_id long, user_id long, ts_s string",
    )
    row = range_join_count(probe, events, "user_id", lookback_seconds=300).first()
    assert row["n_in_range"] == 2  # events 2 and 3


def test_range_join_zero_match_probe_survives(spark):
    from etl_hero_spark.temporal import range_join_count

    events = _ts_df(
        spark,
        [(1, 9, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts_s string",
    )
    probe = _ts_df(
        spark,
        [(100, 1, "2024-01-01 00:05:00")],
        "event_id long, user_id long, ts_s string",
    )
    row = range_join_count(probe, events, "user_id", lookback_seconds=300).first()
    assert row["n_in_range"] == 0


def test_resample_forward_fill_semantics(spark):
    from etl_hero_spark.temporal import resample_forward_fill

    rows = [
        # key 1: obs at 00:10, 02:55 -> grid 00:00..02:00 hourly
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 02:55:00", 30.0),
        # key 2: single obs exactly on a grid point
        (2, "2024-01-01 05:00:00", 50.0),
        # untimed observation must not leak
        (1, None, 999.0),
    ]
    df = _ts_df(spark, rows, "k bigint, ts_s string, v double")
    out = {
        (r["k"], str(r["ts"])): r["v"]
        for r in resample_forward_fill(df, "k", "ts", ["v"], 3600).collect()
    }
    assert out == {
        # grid floors to the hour; 00:00 has no obs yet -> NULL
        (1, "2024-01-01 00:00:00"): None,
        (1, "2024-01-01 01:00:00"): 10.0,
        (1, "2024-01-01 02:00:00"): 10.0,
        (2, "2024-01-01 05:00:00"): 50.0,  # on-grid obs is taken
    }


def test_resample_matches_duckdb_asof_grid(spark):
    import duckdb

    from etl_hero_spark.registry import _events
    from etl_hero_spark.temporal import resample_forward_fill

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf).filter(F.col("user_id") < 10).select(
        "user_id", "ts", "value"
    )
    got = sorted(
        (r["user_id"], str(r["ts"]), r["value"])
        for r in resample_forward_fill(
            ev, "user_id", "ts", ["value"], 3600
        ).collect()
    )
    want = sorted(
        (u, str(t), v)
        for u, t, v in duckdb.sql(
            f"""
            WITH obs AS (
              SELECT user_id, ts, value
              FROM read_parquet('{sf}/events.parquet') WHERE user_id < 10
            ), rng AS (
              SELECT user_id,
                CAST(to_timestamp(floor(epoch(min(ts)) / 3600) * 3600)
                     AS TIMESTAMP) AS lo,
                max(ts) AS hi
              FROM obs GROUP BY user_id
            ), grid AS (
              SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g
              FROM rng
            )
            SELECT grid.user_id, g, obs.value
            FROM grid ASOF LEFT JOIN obs
              ON grid.user_id = obs.user_id AND g >= obs.ts
            """
        ).fetchall()
    )
    assert got == want


def test_rolling_features_match_duckdb_range_frame(spark):
    import duckdb

    from etl_hero_spark.registry import _events
    from etl_hero_spark.temporal import rolling_features

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf).filter(F.col("user_id") < 10).select(
        "user_id", "ts", "value"
    )
    got = sorted(
        (r["user_id"], str(r["ts"]), r["roll_n"], r["roll_sum"],
         r["roll_min"], r["roll_max"], r["roll_mean"])
        for r in rolling_features(
            ev, "user_id", "ts", "value", window_seconds=3600
        ).collect()
    )
    want = sorted(
        (u, str(t), n, s, lo, hi, m)
        for u, t, n, s, lo, hi, m in duckdb.sql(
            f"""
            SELECT user_id, ts,
              CAST(count(value) OVER w AS BIGINT),
              round(CAST(sum(CAST(value AS DECIMAL(28,9))) OVER w
                    AS DOUBLE), 9),
              min(value) OVER w, max(value) OVER w,
              round(CAST(sum(CAST(value AS DECIMAL(28,9))) OVER w
                    AS DOUBLE)
                / CAST(count(value) OVER w AS DOUBLE), 9)
            FROM read_parquet('{sf}/events.parquet') WHERE user_id < 10
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 3599 SECONDS PRECEDING
                AND CURRENT ROW)
            """
        ).fetchall()
    )
    assert got == want


def test_rolling_features_row_frame(spark):
    from etl_hero_spark.temporal import rolling_features

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 00:20:00", None),
        (1, "2024-01-01 00:30:00", 4.0),
    ]
    df = _ts_df(spark, rows, "k bigint, ts_s string, value double")
    out = {
        str(r["ts"]): (r["roll_n"], r["roll_sum"], r["roll_mean"])
        for r in rolling_features(
            df, "k", "ts", "value", window_rows=2
        ).collect()
    }
    assert out["2024-01-01 00:10:00"] == (2, 3.0, 1.5)
    assert out["2024-01-01 00:20:00"] == (1, 2.0, 2.0)  # NULL skipped
    assert out["2024-01-01 00:30:00"] == (1, 4.0, 4.0)


def test_interval_overlap_join_semantics(spark):
    from etl_hero_spark.temporal import interval_overlap_join

    a = _ts_df(spark, [
        (1, 1, "2024-01-01 00:00:00"),
    ], "a_id long, k long, ts_s string").withColumnRenamed("ts", "start")
    import pyspark.sql.functions as FF
    a = a.withColumn("end", FF.col("start") + FF.expr("INTERVAL 2 HOURS"))
    b_rows = [
        # overlaps middle
        (10, 1, "2024-01-01 01:00:00", "2024-01-01 03:00:00"),
        # touches endpoint exactly (closed intervals overlap)
        (11, 1, "2024-01-01 02:00:00", "2024-01-01 04:00:00"),
        # disjoint after
        (12, 1, "2024-01-01 02:00:01", "2024-01-01 04:00:00"),
        # long interval fully covering a (starts buckets earlier)
        (13, 1, "2023-12-31 00:00:00", "2024-01-02 00:00:00"),
        # other key
        (14, 2, "2024-01-01 01:00:00", "2024-01-01 01:30:00"),
        # disjoint before
        (15, 1, "2023-12-31 00:00:00", "2023-12-31 23:59:59"),
    ]
    b = spark.createDataFrame(
        b_rows, "b_id long, k long, s string, e string"
    ).select(
        "b_id", "k",
        FF.to_timestamp("s").alias("start"),
        FF.to_timestamp("e").alias("end"),
    )
    out = interval_overlap_join(
        a, b, "k", "start", "end", "start", "end", bucket_seconds=3600
    )
    hits = sorted(r["b_id"] for r in out.collect())
    assert hits == [10, 11, 13]
    # each pair appears exactly ONCE despite multi-bucket overlap
    assert out.count() == 3


def test_interval_overlap_join_matches_duckdb_theta(spark):
    import duckdb

    from etl_hero_spark.temporal import interval_overlap_join

    # sessions from two "systems" over the events fixture: per user,
    # hourly activity intervals vs 90-minute shifted intervals
    import pyspark.sql.functions as FF

    from etl_hero_spark.registry import _events

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf).filter(FF.col("user_id") < 8)
    a = ev.groupBy(
        "user_id", FF.window("ts", "2 hours").alias("w")
    ).agg(FF.count(FF.lit(1)).alias("n_a")).select(
        "user_id", FF.col("w.start").alias("start"),
        FF.col("w.end").alias("end"), "n_a",
    )
    b = ev.groupBy(
        "user_id", FF.window("ts", "3 hours", "3 hours", "90 minutes").alias("w")
    ).agg(FF.count(FF.lit(1)).alias("n_b")).select(
        "user_id", FF.col("w.start").alias("start"),
        FF.col("w.end").alias("end"), "n_b",
    )
    got = sorted(
        (r["user_id"], str(r["start_a"]), str(r["start_b"]))
        for r in interval_overlap_join(
            a, b, "user_id", bucket_seconds=3600
        ).collect()
    )
    a.createOrReplaceTempView("_")  # unused; duckdb gets pandas below
    pa, pb = a.toPandas(), b.toPandas()
    con = duckdb.connect()
    con.register("ia", pa)
    con.register("ib", pb)
    want = sorted(
        (u, str(s1), str(s2))
        for u, s1, s2 in con.execute(
            "SELECT ia.user_id, ia.start, ib.start FROM ia JOIN ib ON "
            "ia.user_id = ib.user_id AND ia.start <= ib.\"end\" "
            "AND ib.start <= ia.\"end\""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_asof_forward_and_nearest_directions(spark):
    from etl_hero_spark.temporal import asof_join

    left = _ts_df(
        spark,
        [
            (1, 1, "2024-01-01 00:10:00"),  # between rights 00:05/00:20
            (2, 1, "2024-01-01 00:05:00"),  # exactly on a right
            (3, 1, "2024-01-01 00:30:00"),  # after the last right
            (4, 1, "2024-01-01 00:00:00"),  # before the first right
            (5, 1, "2024-01-01 00:13:00"),  # nearest tie-ish: 8min back,
                                            # 7min fwd -> forward wins
        ],
        "event_id long, user_id long, ts_s string",
    )
    right = _ts_df(
        spark,
        [
            (1, "2024-01-01 00:05:00", 100.0),
            (1, "2024-01-01 00:20:00", 200.0),
        ],
        "user_id long, ts_s string, value double",
    )

    def run(direction):
        return {
            r["event_id"]: r["value_asof"]
            for r in asof_join(
                left, right, "user_id", direction=direction
            ).collect()
        }

    back = run("backward")
    assert back == {1: 100.0, 2: 100.0, 3: 200.0, 4: None, 5: 100.0}
    fwd = run("forward")
    assert fwd == {1: 200.0, 2: 100.0, 3: None, 4: 100.0, 5: 200.0}
    near = run("nearest")
    assert near == {1: 100.0, 2: 100.0, 3: 200.0, 4: 100.0, 5: 200.0}
    # 1: 5min back vs 10min fwd -> backward; 5: 8 back vs 7 fwd -> fwd


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Directions must agree with pandas merge_asof on the events data
    (the API whose semantics `direction` mirrors)."""
    import pandas as pd

    from etl_hero_spark.registry import _events
    from etl_hero_spark.temporal import asof_join

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf).filter(F.col("user_id") < 6)
    left = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    for direction in ["backward", "forward", "nearest"]:
        got = {
            r["event_id"]: r["value_asof"]
            for r in asof_join(
                left, right, "user_id", direction=direction
            ).collect()
        }
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction=direction
        )
        want = {
            int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in want_df.itertuples()
        }
        assert got == want, direction


def test_resample_multiple_value_columns_default(spark):
    """value_cols defaults to every non-key non-ts column; each fills
    independently (a NULL in one column does not disturb the other)."""
    from etl_hero_spark.temporal import resample_forward_fill

    rows = [
        (1, "2024-01-01 00:10:00", 1.0, None),
        (1, "2024-01-01 01:10:00", None, "a"),
        (1, "2024-01-01 02:10:00", 3.0, "b"),
    ]
    df = _ts_df(spark, rows, "k bigint, ts_s string, v double, s string")
    out = {
        str(r["ts"]): (r["v"], r["s"])
        for r in resample_forward_fill(df, "k", "ts", step_seconds=3600).collect()
    }
    assert out["2024-01-01 01:00:00"] == (1.0, None)
    # last(ignorenulls) carries v=1.0 past the NULL observation at 01:10
    assert out["2024-01-01 02:00:00"] == (1.0, "a")


def test_asof_nearest_on_numeric_and_date_axes(spark):
    """direction='nearest' must accept any orderable ts dtype, like
    backward/forward always did (ADVICE r3): numeric epochs measure
    distance on the raw difference, dates in days."""
    from etl_hero_spark.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 19)], "key string, ts bigint"
    )
    right = spark.createDataFrame(
        [("k", 8, "a"), ("k", 13, "b"), ("k", 20, "c")],
        "key string, ts bigint, v string",
    )
    got = {
        r["ts"]: r["v_asof"]
        for r in asof_join(
            left, right, "key", direction="nearest"
        ).collect()
    }
    # ts=10: dist 2 back (8) vs 3 fwd (13) -> a; ts=19: 6 back vs 1 fwd -> c
    assert got == {10: "a", 19: "c"}

    import datetime as dt

    d = dt.date
    left_d = spark.createDataFrame(
        [("k", d(2024, 1, 10))], "key string, ts date"
    )
    right_d = spark.createDataFrame(
        [("k", d(2024, 1, 7), "x"), ("k", d(2024, 1, 12), "y")],
        "key string, ts date, v string",
    )
    (row,) = asof_join(left_d, right_d, "key", direction="nearest").collect()
    assert row["v_asof"] == "y"  # 2 days forward beats 3 back


# ---------------------------------------------------------------------------
# point-in-time join (round 4)
# ---------------------------------------------------------------------------


def test_point_in_time_join_semantics(spark):
    """Half-open validity: a fact AT valid_from takes the new version, a
    fact AT valid_to takes the NEXT version; facts before the first
    version keep NULL (left join); open version catches everything
    after."""
    from etl_hero_spark.temporal import point_in_time_join

    hist = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "v1"),
            (1, "2024-02-01 00:00:00", None, "v2"),
        ],
        "k bigint, effective_from string, effective_to string, state string",
    ).select(
        "k",
        F.to_timestamp("effective_from").alias("effective_from"),
        F.to_timestamp("effective_to").alias("effective_to"),
        "state",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, "2023-12-31 23:59:59"),  # before any version -> NULL
            (11, 1, "2024-01-01 00:00:00"),  # exactly at from -> v1
            (12, 1, "2024-01-15 00:00:00"),  # mid v1
            (13, 1, "2024-02-01 00:00:00"),  # exactly at boundary -> v2
            (14, 1, "2030-01-01 00:00:00"),  # open version -> v2
            (15, 2, "2024-01-15 00:00:00"),  # unknown key -> NULL
        ],
        "fid bigint, k bigint, s string",
    ).select("fid", "k", F.to_timestamp("s").alias("ts"))
    got = {
        r["fid"]: r["state"]
        for r in point_in_time_join(facts, hist, "k").collect()
    }
    assert got == {10: None, 11: "v1", 12: "v1", 13: "v2", 14: "v2", 15: None}


def test_registered_pit_join_matches_duckdb(spark, sf_dir):
    """The registered query's whole pipeline (synthetic change log ->
    SCD2 -> PIT join -> summary) mirrored in DuckDB: the version in
    force is the newest change at-or-before the order date."""
    import duckdb

    from etl_hero_spark.registry import all_queries

    got = sorted(
        map(
            tuple,
            all_queries()["cdc_point_in_time_join"](spark, sf_dir).collect(),
        )
    )
    segs = "['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY']"
    want = sorted(
        duckdb.sql(
            f"""
            WITH chg AS (
              SELECT c_custkey, v,
                make_timestamp(1993 + v * 2, 1, 1, 0, 0, 0) AS ts,
                ({segs})[cast((c_custkey + v) % 5 AS INT) + 1] AS segment
              FROM read_parquet('{sf_dir}/customer.parquet'),
                   (SELECT unnest([0, 1, 2]) AS v)
            ), pit AS (
              SELECT o.o_totalprice,
                (SELECT c.segment FROM chg c
                 WHERE c.c_custkey = o.o_custkey
                   AND c.ts <= cast(o.o_orderdate AS TIMESTAMP)
                 ORDER BY c.ts DESC LIMIT 1) AS segment
              FROM read_parquet('{sf_dir}/orders.parquet') o
            )
            SELECT segment, cast(count(*) AS BIGINT) AS n_orders,
              round(cast(sum(cast(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE), 2) AS sum_price
            FROM pit GROUP BY segment
            """
        ).fetchall()
    )
    assert got == want and len(got) >= 5


def test_resample_interpolate_hand_grid(spark):
    from etl_hero_spark.temporal import resample_interpolate

    obs = _ts_df(
        spark,
        [
            ("a", 6.0, "2024-01-01 00:30:00"),
            ("a", 10.0, "2024-01-01 02:30:00"),
            ("b", 5.0, "2024-01-01 00:00:00"),  # grid-aligned single obs
        ],
        "k string, value double, ts_s string",
    )
    got = {
        (r["k"], str(r["ts"])): r["value"]
        for r in resample_interpolate(obs, "k", "ts", "value").collect()
    }
    # a's grid: 00:00 (before first obs -> NULL), 01:00 (frac 30/120),
    # 02:00 (frac 90/120); grid ends at max ts 02:30 -> no 03:00 point
    assert got[("a", "2024-01-01 00:00:00")] is None
    assert got[("a", "2024-01-01 01:00:00")] == 7.0
    assert got[("a", "2024-01-01 02:00:00")] == 9.0
    assert ("a", "2024-01-01 03:00:00") not in got
    # exact on an observation, single-point key collapses to one row
    assert got[("b", "2024-01-01 00:00:00")] == 5.0
    assert len([k for k in got if k[0] == "b"]) == 1


def test_resample_interpolate_duplicate_ts_and_determinism(spark):
    from etl_hero_spark.temporal import resample_interpolate

    obs = _ts_df(
        spark,
        [
            ("a", 2.0, "2024-01-01 00:00:00"),
            ("a", 4.0, "2024-01-01 00:00:00"),  # dup ts -> MAX wins
            ("a", 8.0, "2024-01-01 02:00:00"),
        ],
        "k string, value double, ts_s string",
    )
    for df in (obs, obs.repartition(7)):
        got = {
            str(r["ts"]): r["value"]
            for r in resample_interpolate(df, "k", "ts", "value").collect()
        }
        assert got["2024-01-01 00:00:00"] == 4.0
        assert got["2024-01-01 01:00:00"] == 6.0  # (4+8)/2
        assert got["2024-01-01 02:00:00"] == 8.0


def test_resample_interpolate_matches_python_reference(spark, sf_dir):
    """Full events fixture vs a per-key pure-Python linear
    interpolation over the same epoch-aligned hourly grid."""
    import collections

    from etl_hero_spark.registry import _events
    from etl_hero_spark.temporal import resample_interpolate

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    got = {
        (r["user_id"], str(r["ts"])): r["value"]
        for r in resample_interpolate(
            ev, "user_id", "ts", "value"
        ).collect()
    }
    from datetime import timezone

    STEP = 3600 * 1_000_000  # grid step in MICROS — events ts is sub-second
    series = collections.defaultdict(dict)
    for r in ev.filter(F.col("value").isNotNull()).collect():
        t = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        k = r["user_id"]
        # duplicate-ts collapse: MAX
        series[k][t] = max(series[k].get(t, float("-inf")), r["value"])
    n_checked = 0
    for k, pts in series.items():
        ts_sorted = sorted(pts)
        lo = ts_sorted[0] // STEP * STEP
        hi = ts_sorted[-1]
        t = lo
        while t <= hi:
            if t < ts_sorted[0]:
                want = None
            elif t in pts:
                want = pts[t]
            else:
                import bisect

                i = bisect.bisect_left(ts_sorted, t)
                p, n = ts_sorted[i - 1], ts_sorted[i]
                want = pts[p] + (pts[n] - pts[p]) * float(t - p) / float(n - p)
            from datetime import datetime

            key = (
                k,
                str(
                    datetime.fromtimestamp(
                        t / 1_000_000, tz=timezone.utc
                    ).replace(tzinfo=None)
                ),
            )
            assert key in got, key
            if want is None:
                assert got[key] is None, key
            else:
                assert got[key] == __import__("pytest").approx(
                    want, abs=1e-9
                ), key
            n_checked += 1
            t += STEP
    assert n_checked == len(got) > 1000
