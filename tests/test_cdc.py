"""CDC / table-maintenance operators: latest-wins merge, SCD2 history
(+ incremental apply equivalence), snapshot diff. DuckDB parity pins the
SQL semantics for the window-based ops (rows-only registry entries)."""

import duckdb

from etl_hero_spark.cdc import (
    merge_upsert,
    scd2_apply,
    scd2_history,
    snapshot_diff,
)

TARGET = [
    (1, "alice", 100.0, "2024-01-01 00:00:00"),
    (2, "bob", 200.0, "2024-01-01 00:00:00"),
    (3, "carol", 300.0, "2024-01-01 00:00:00"),
]
# update key 1 (newer), stale update key 2 (older ts loses), delete key 3,
# insert key 4, same-ts update key 1 variant is covered separately
CHANGES = [
    (1, "alice2", 111.0, "2024-02-01 00:00:00", "U"),
    (2, "bob_old", 0.0, "2023-12-01 00:00:00", "U"),
    (3, None, None, "2024-02-01 00:00:00", "D"),
    (4, "dave", 400.0, "2024-02-01 00:00:00", "I"),
]

CHANGELOG = [
    # key 10: three versions, one no-op in the middle
    (10, "a", "2024-01-01 00:00:00"),
    (10, "a", "2024-01-05 00:00:00"),  # no-op -> suppressed
    (10, "b", "2024-01-10 00:00:00"),
    (10, "c", "2024-02-01 00:00:00"),
    # key 20: single version
    (20, "x", "2024-01-03 00:00:00"),
    # key 30: flip back to the original value (a real new version)
    (30, "p", "2024-01-01 00:00:00"),
    (30, "q", "2024-01-02 00:00:00"),
    (30, "p", "2024-01-03 00:00:00"),
]

SCD2_ORACLE = """
WITH boundaries AS (
  SELECT *,
    lag(state) OVER w IS DISTINCT FROM state
      OR row_number() OVER w = 1 AS is_boundary
  FROM log
  WINDOW w AS (PARTITION BY id ORDER BY ts)
), v AS (SELECT * FROM boundaries WHERE is_boundary)
SELECT id, state, ts AS effective_from,
  lead(ts) OVER (PARTITION BY id ORDER BY ts) AS effective_to,
  CASE WHEN lead(ts) OVER (PARTITION BY id ORDER BY ts) IS NULL
       THEN 1 ELSE 0 END AS is_current
FROM v
"""


def _ts(spark, rows, schema):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_merge_upsert_latest_wins_and_tombstones(spark):
    target = _ts(spark, TARGET, "id bigint, name string, v double, ts string")
    changes = _ts(
        spark, CHANGES, "id bigint, name string, v double, ts string, op string"
    )
    out = {
        r["id"]: (r["name"], r["v"])
        for r in merge_upsert(target, changes, "id", "ts", op_col="op").collect()
    }
    assert out == {
        1: ("alice2", 111.0),  # newer change wins
        2: ("bob", 200.0),  # stale change loses
        4: ("dave", 400.0),  # insert; 3 deleted
    }


def test_merge_upsert_same_ts_change_beats_base(spark):
    target = _ts(spark, [(1, "old", 1.0, "2024-01-01 00:00:00")],
                 "id bigint, name string, v double, ts string")
    changes = _ts(spark, [(1, "new", 2.0, "2024-01-01 00:00:00")],
                  "id bigint, name string, v double, ts string")
    [r] = merge_upsert(target, changes, "id", "ts").collect()
    assert (r["name"], r["v"]) == ("new", 2.0)
    # schema = target's columns exactly
    assert merge_upsert(target, changes, "id", "ts").columns == target.columns


def _hist_rows(df):
    return {
        (r["id"], r["state"], str(r["effective_from"]),
         str(r["effective_to"]), r["is_current"])
        for r in df.collect()
    }


def test_scd2_history_matches_duckdb(spark):
    log = _ts(spark, CHANGELOG, "id bigint, state string, ts string")
    got = _hist_rows(scd2_history(log, "id", "ts", ["state"]))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE log(id bigint, state varchar, ts timestamp)"
    )
    con.executemany("INSERT INTO log VALUES (?, ?, ?)", CHANGELOG)
    want = {
        (i, s, str(f), str(t), c)
        for i, s, f, t, c in con.execute(SCD2_ORACLE).fetchall()
    }
    assert got == want
    # shape facts: no-op suppressed (key 10 has 3 versions), flip-back is
    # a real version (key 30 has 3), exactly one current row per key
    per_key = {}
    for r in got:
        per_key[r[0]] = per_key.get(r[0], 0) + 1
    assert per_key == {10: 3, 20: 1, 30: 3}
    assert sum(1 for r in got if r[4] == 1) == 3


def test_scd2_apply_equals_full_rebuild(spark):
    schema = "id bigint, state string, ts string"
    # split the log mid-stream; the second batch carries late arrivals:
    # key 10's z lands after its suppressed no-op (recoverable — see the
    # scd2_apply docstring boundary), key 30's r lands mid-history
    # between two retained versions
    first = [r for r in CHANGELOG if r[2] < "2024-01-06"]
    second = [r for r in CHANGELOG if r[2] >= "2024-01-06"] + [
        (10, "z", "2024-01-07 00:00:00"),
        (30, "r", "2024-01-01 12:00:00"),
    ]
    full = _ts(spark, first + second, schema)
    hist_full = scd2_history(full, "id", "ts", ["state"])
    hist_inc = scd2_apply(
        scd2_history(_ts(spark, first, schema), "id", "ts", ["state"]),
        _ts(spark, second, schema),
        "id",
        "ts",
        ["state"],
    )
    assert _hist_rows(hist_inc) == _hist_rows(hist_full)


def test_scd2_apply_leaves_untouched_keys_alone(spark):
    schema = "id bigint, state string, ts string"
    hist = scd2_history(_ts(spark, CHANGELOG, schema), "id", "ts", ["state"])
    batch = _ts(spark, [(20, "y", "2024-03-01 00:00:00")], schema)
    out = scd2_apply(hist, batch, "id", "ts", ["state"])
    rows = _hist_rows(out)
    # keys 10/30 byte-identical to before
    assert {r for r in rows if r[0] != 20} == {
        r for r in _hist_rows(hist) if r[0] != 20
    }
    # key 20 now has two versions, old one closed
    k20 = sorted(r for r in rows if r[0] == 20)
    assert len(k20) == 2
    assert k20[0][3] == "2024-03-01 00:00:00" and k20[0][4] == 0
    assert k20[1][1] == "y" and k20[1][4] == 1


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", None)],
        "id bigint, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b2", 2.0), (4, "d", 4.0), (5, "e", 5.0)],
        "id bigint, name string, v double",
    )
    out = {
        r["id"]: (r["diff_status"], tuple(r["changed_cols"]), r["name"], r["v"])
        for r in snapshot_diff(old, new, "id").collect()
    }
    assert out == {
        1: ("unchanged", (), "a", 1.0),
        2: ("changed", ("name",), "b2", 2.0),
        3: ("removed", (), "c", 3.0),
        4: ("changed", ("v",), "d", 4.0),  # NULL -> 4.0 is a change
        5: ("added", (), "e", 5.0),
    }


def test_snapshot_diff_single_shuffle_plan(spark):
    import pyspark.sql.functions as F

    old = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    new = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    plan = (
        snapshot_diff(old, new, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one join, no window, no extra exchange beyond the join's own
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "Window" not in plan


ORDERS = "'/root/testdata/sf0.001/orders.parquet'"
EVENTS = "'/root/testdata/sf0.001/events.parquet'"

MERGE_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate AS ts,
         o_orderpriority, CAST(NULL AS VARCHAR) AS op, 0 AS src
  FROM read_parquet({ORDERS})
), upd AS (
  SELECT o_orderkey, o_custkey, o_totalprice, ts + INTERVAL 30 DAY,
         '0-REVISED', 'U', 1 FROM base WHERE o_orderkey % 7 = 3
), del AS (
  SELECT o_orderkey, o_custkey, o_totalprice, ts + INTERVAL 30 DAY,
         o_orderpriority, 'D', 1 FROM base WHERE o_orderkey % 7 = 5
), unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del
), latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey ORDER BY ts DESC, src DESC) AS rn
  FROM unioned
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS sum_price,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(count(o_totalprice) AS DOUBLE), 6) AS avg_price
FROM latest WHERE rn = 1 AND (op IS NULL OR op <> 'D')
GROUP BY 1 ORDER BY 1
"""

DIFF_ORACLE = f"""
WITH old AS (SELECT * FROM read_parquet({ORDERS})),
niu AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    CASE WHEN o_orderkey % 5 = 1 THEN o_totalprice + 1.0
         ELSE o_totalprice END AS o_totalprice,
    o_orderdate,
    CASE WHEN o_orderkey % 11 = 2 THEN '9-RECLASSIFIED'
         ELSE o_orderpriority END AS o_orderpriority
  FROM old WHERE o_orderkey % 13 <> 0
), j AS (
  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
    list_sort(list_filter([
      CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
           THEN 'o_custkey' END,
      CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           THEN 'o_orderstatus' END,
      CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
           THEN 'o_totalprice' END,
      CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate
           THEN 'o_orderdate' END,
      CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
           THEN 'o_orderpriority' END
    ], x -> x IS NOT NULL)) AS ch
  FROM old o FULL OUTER JOIN niu n USING (o_orderkey)
), tagged AS (
  SELECT CASE WHEN ko IS NULL THEN 'added'
              WHEN kn IS NULL THEN 'removed'
              WHEN len(ch) > 0 THEN 'changed'
              ELSE 'unchanged' END AS diff_status,
         CASE WHEN ko IS NOT NULL AND kn IS NOT NULL AND len(ch) > 0
              THEN array_to_string(ch, ',') ELSE '' END AS cols
  FROM j
)
SELECT diff_status, cols, CAST(count(*) AS BIGINT) AS n
FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
"""

SCD2_USERS_ORACLE = f"""
WITH log AS (
  SELECT user_id, ts, event_type FROM read_parquet({EVENTS})
), b AS (
  SELECT *, (lag(event_type) OVER w IS DISTINCT FROM event_type
             OR row_number() OVER w = 1) AS is_b
  FROM log WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
), v AS (SELECT * FROM b WHERE is_b), h AS (
  SELECT user_id, event_type, ts AS eff_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS eff_to
  FROM v
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_versions,
  CAST(sum(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_current,
  min(eff_from) AS first_seen, max(eff_from) AS last_opened
FROM h GROUP BY 1 ORDER BY 1
"""


def _rows_vs_duck(spark_df, sql):
    got = [tuple(str(v) for v in r) for r in spark_df.collect()]
    want = [
        tuple(str(v) for v in r) for r in duckdb.sql(sql).fetchall()
    ]
    assert got == want


def test_registered_cdc_merge_matches_duckdb(spark):
    # the registered entry is merged/tagged since r5 — the
    # part='merge_upsert' rows carry the latest-wins MERGE summary
    from etl_hero_spark.registry_ext import q_cdc_merge_upsert

    rows = q_cdc_merge_upsert(spark, "/root/testdata/sf0.001").collect()
    got = sorted(
        (r["key"], str(r["n"]), str(r["sum_price"]), str(r["avg_price"]))
        for r in rows
        if r["part"] == "merge_upsert"
    )
    want = [
        (r[0], str(r[1]), str(r[2]), str(r[3]))
        for r in duckdb.sql(MERGE_ORACLE).fetchall()
    ]
    assert got == want


def test_registered_cdc_diff_matches_duckdb(spark):
    from etl_hero_spark.registry_ext import q_cdc_snapshot_diff

    _rows_vs_duck(
        q_cdc_snapshot_diff(spark, "/root/testdata/sf0.001"), DIFF_ORACLE
    )


def test_registered_cdc_scd2_matches_duckdb(spark):
    from etl_hero_spark.registry_ext import q_cdc_scd2_users

    _rows_vs_duck(
        q_cdc_scd2_users(spark, "/root/testdata/sf0.001"),
        SCD2_USERS_ORACLE,
    )


def test_scd2_single_shuffle_plan(spark):
    from etl_hero_spark.registry_ext import q_cdc_scd2_users

    plan = (
        q_cdc_scd2_users(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # boundary-lag and close-lead windows share one (user_id) exchange;
    # + the final tiny groupBy pair = 3 exchanges total, and never a
    # partition-less global window
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Exchange SinglePartition" not in plan or (
        plan.count("Exchange SinglePartition") == 0
    )


def test_merge_upsert_idempotent_and_batch_splittable(spark):
    """Maintenance-job properties: applying the same change batch twice
    changes nothing; applying two batches sequentially equals applying
    their union when timestamps are distinct."""
    target = _ts(spark, TARGET, "id bigint, name string, v double, ts string")
    changes = _ts(
        spark, CHANGES, "id bigint, name string, v double, ts string, op string"
    )
    import pyspark.sql.functions as F

    once = merge_upsert(target, changes, "id", "ts", op_col="op")
    twice = merge_upsert(once, changes, "id", "ts", op_col="op")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(twice) == key(once)
    # split application == union application
    c1 = changes.filter(F.col("id") <= 2)
    c2 = changes.filter(F.col("id") > 2)
    seq = merge_upsert(
        merge_upsert(target, c1, "id", "ts", op_col="op"),
        c2, "id", "ts", op_col="op",
    )
    assert key(seq) == key(once)


def test_scd2_apply_inserts_brand_new_keys(spark):
    schema = "id bigint, state string, ts string"
    hist = scd2_history(_ts(spark, CHANGELOG, schema), "id", "ts", ["state"])
    batch = _ts(
        spark,
        [(99, "new", "2024-03-01 00:00:00"),
         (99, "newer", "2024-03-02 00:00:00")],
        schema,
    )
    out = scd2_apply(hist, batch, "id", "ts", ["state"])
    k99 = sorted(r for r in _hist_rows(out) if r[0] == 99)
    assert len(k99) == 2
    assert k99[0][1] == "new" and k99[0][4] == 0
    assert k99[1][1] == "newer" and k99[1][4] == 1
    # existing keys untouched
    assert {r for r in _hist_rows(out) if r[0] != 99} == _hist_rows(hist)


def test_warehouse_sync_composition_equals_direct_state(spark):
    """The diff->changes->merge composition must land exactly on the
    incoming snapshot's state (plus nothing, minus nothing): syncing IS
    convergence to the source."""
    import pyspark.sql.functions as F

    from etl_hero_spark.registry_ext import q_pipeline_warehouse_sync

    sf = "/root/testdata/sf0.001"
    [row] = q_pipeline_warehouse_sync(spark, sf).collect()
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    incoming = (
        orders.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 1, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 11 == 2, F.lit("9-RECLASSIFIED"))
            .otherwise(F.col("o_orderpriority")),
        )
    )
    want = incoming.agg(
        F.count(F.lit(1)),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ),
        F.sum((F.col("o_orderpriority") == "9-RECLASSIFIED").cast("long")),
    ).first()
    assert row["n_rows"] == want[0]
    assert row["sum_price"] == want[1]
    assert row["n_reclassified"] == want[2]
    assert row["n_contract_violations"] == 0


def test_schema_diff_reports_all_change_kinds(spark):
    from etl_hero_spark.cdc import schema_diff

    old = spark.createDataFrame(
        [], "id bigint, name string, price double, legacy int"
    )
    new = spark.createDataFrame(
        [], "id bigint, price decimal(18,2), name string, extra date"
    )
    got = schema_diff(old, new)
    assert got == [
        ("extra", "added"),
        ("legacy", "removed"),
        ("name", "reordered:1->2"),
        ("price", "retyped:double->decimal(18,2)"),
    ]
    assert schema_diff(old, old) == []


# ---------------------------------------------------------------------------
# GDPR erasure cascade (round 4)
# ---------------------------------------------------------------------------


def test_gdpr_erasure_matches_duckdb(spark, sf_dir):
    """Direct anti-join deletes (customer, orders) and the transitive
    cascade (lineitem through doomed orders) audited against DuckDB."""
    from pyspark.sql import functions as F

    from etl_hero_spark.cdc import erasure_audit, propagate_erasure

    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("customer", "orders", "lineitem")
    }
    erase = (
        tables["customer"]
        .filter(F.col("c_custkey") % 1000 == 7)
        .select(F.col("c_custkey").alias("k"))
    )
    cleaned = propagate_erasure(
        tables,
        erase,
        key_map={"customer": "c_custkey", "orders": "o_custkey"},
        cascade=[("lineitem", "l_orderkey", "orders", "o_orderkey")],
    )
    got = {
        r["table"]: (r["n_before"], r["n_deleted"], r["n_after"])
        for r in erasure_audit(tables, cleaned).collect()
    }
    want = {}
    for t, pred in (
        ("customer", "c_custkey % 1000 = 7"),
        ("orders", "o_custkey % 1000 = 7"),
        (
            "lineitem",
            "l_orderkey IN (SELECT o_orderkey FROM "
            f"read_parquet('{sf_dir}/orders.parquet') "
            "WHERE o_custkey % 1000 = 7)",
        ),
    ):
        n, d = duckdb.sql(
            f"SELECT count(*), sum(CASE WHEN {pred} THEN 1 ELSE 0 END) "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchone()
        want[t] = (n, int(d or 0), n - int(d or 0))
    assert got == want
    assert got["customer"][1] > 0  # the fixture actually deletes someone


def test_gdpr_erasure_leaves_no_orphans(spark, sf_dir):
    """After the cascade, no surviving lineitem references a deleted
    order and no surviving order references a deleted customer."""
    from pyspark.sql import functions as F

    from etl_hero_spark.cdc import propagate_erasure

    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("customer", "orders", "lineitem")
    }
    erase = (
        tables["customer"]
        .filter(F.col("c_custkey") % 1000 == 7)
        .select(F.col("c_custkey").alias("k"))
    )
    cleaned = propagate_erasure(
        tables,
        erase,
        key_map={"customer": "c_custkey", "orders": "o_custkey"},
        cascade=[("lineitem", "l_orderkey", "orders", "o_orderkey")],
    )
    orphan_orders = cleaned["orders"].join(
        cleaned["customer"].select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    )
    orphan_lines = cleaned["lineitem"].join(
        cleaned["orders"].select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    assert orphan_orders.count() == 0
    assert orphan_lines.count() == 0


# ---------------------------------------------------------------------------
# incremental join maintenance (round 4)
# ---------------------------------------------------------------------------


def _join_key(df):
    return sorted(map(tuple, df.collect()))


def test_join_refresh_equals_full_recompute(spark, sf_dir):
    """M' from the delta-join identity must equal re-joining the
    upserted fact table from scratch — updates replaced, inserts
    appended, bit-exact."""
    from pyspark.sql import functions as F

    from etl_hero_spark.cdc import merge_upsert, refresh_join_fact_delta

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    mat = orders.join(dim, "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
    )
    # delta: update every 7th order's price + insert brand-new orders
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
    )
    inserts = orders.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    delta = updates.unionByName(inserts)
    got = refresh_join_fact_delta(mat, delta, dim, "o_orderkey", "o_custkey")
    new_fact = (
        orders.join(
            delta.select("o_orderkey").distinct(), "o_orderkey", "left_anti"
        ).unionByName(delta)
    )
    want = new_fact.join(dim, "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
    )
    assert _join_key(got) == _join_key(want)
    assert got.count() > mat.count()  # inserts landed


def test_join_refresh_drops_unmatched_delta_rows(spark):
    """A delta row whose join key no longer matches any dim row leaves
    the materialization, exactly as a recompute would."""
    from etl_hero_spark.cdc import refresh_join_fact_delta

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 7.0)], "pk bigint, k bigint, v double"
    )
    dim = spark.createDataFrame([(10, "x"), (20, "y")], "k bigint, name string")
    mat = fact.join(dim, "k").select("pk", "k", "v", "name")
    delta = spark.createDataFrame(
        [(1, 99, 6.0)], "pk bigint, k bigint, v double"  # k=99: no dim
    )
    got = refresh_join_fact_delta(mat, delta, dim, "pk", "k")
    assert _join_key(got) == _join_key(
        mat.filter("pk != 1")
    )


def test_retractable_agg_refresh_equals_recompute(spark, sf_dir):
    """Signed delta folding must be BIT-identical (decimal partials) to
    recomputing the aggregate over (base - deletes + inserts), and a
    fully-deleted group must vanish."""
    from pyspark.sql import functions as F

    from etl_hero_spark.cdc import agg_partials, retractable_agg_refresh

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    mat = agg_partials(orders, "o_orderpriority", ["o_totalprice"])
    deletes = orders.filter(F.col("o_orderkey") % 9 == 0)
    inserts = orders.filter(F.col("o_orderkey") % 9 == 1).select(
        (F.col("o_orderkey") + 5_000_000).alias("o_orderkey"),
        F.lit("6-RUSH").alias("o_orderpriority"),
        "o_totalprice",
    )
    got = sorted(
        map(
            tuple,
            retractable_agg_refresh(
                mat, inserts, deletes, "o_orderpriority", ["o_totalprice"]
            ).collect(),
        )
    )
    new_base = (
        orders.join(
            deletes.select("o_orderkey"), "o_orderkey", "left_anti"
        ).unionByName(inserts)
    )
    want = sorted(
        map(
            tuple,
            agg_partials(
                new_base, "o_orderpriority", ["o_totalprice"]
            ).collect(),
        )
    )
    assert got == want and len(got) == 6  # 5 priorities + 6-RUSH


def test_retractable_agg_drops_emptied_group(spark):
    from etl_hero_spark.cdc import agg_partials, retractable_agg_refresh

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    mat = agg_partials(base, "g", ["v"])
    refreshed = retractable_agg_refresh(
        mat,
        base.filter("1=0"),  # no inserts
        base.filter("g = 'a'"),  # delete all of group a
        "g",
        ["v"],
    )
    rows = refreshed.collect()
    assert [r["g"] for r in rows] == ["b"]
    assert float(rows[0]["_sum_v"]) == 5.0


def test_erasure_composes_direct_key_and_cascade(spark):
    """A child that is BOTH directly keyed and cascaded loses rows from
    both causes (the cascade must not overwrite the direct anti-join),
    and two cascade edges on one child compose."""
    from pyspark.sql import functions as F

    from etl_hero_spark.cdc import propagate_erasure

    cust = spark.createDataFrame([(1,), (2,), (3,)], "c bigint")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "o bigint, c bigint"
    )
    # payments keyed directly on c AND cascaded from orders
    payments = spark.createDataFrame(
        [(100, 10, 2), (101, 11, 3), (102, 12, 1)],
        "p bigint, o bigint, c bigint",
    )
    erase = spark.createDataFrame([(1,)], "k bigint")
    cleaned = propagate_erasure(
        {"customer": cust, "orders": orders, "payments": payments},
        erase,
        key_map={"customer": "c", "orders": "c", "payments": "c"},
        cascade=[("payments", "o", "orders", "o")],
    )
    # direct: payment 102 (c=1) gone; cascade: payment 100 (order 10 of
    # c=1) gone; only 101 survives
    assert [r["p"] for r in cleaned["payments"].collect()] == [101]


def test_erasure_chained_cascade_and_order_validation(spark):
    """A grandchild cascading from a cascade-cleaned parent deletes via
    the parent's DOOMED rows; an edge whose parent has no cleaned state
    yet raises instead of silently mis-deleting."""
    import pytest as _pytest

    from etl_hero_spark.cdc import propagate_erasure

    cust = spark.createDataFrame([(1,), (2,)], "c bigint")
    orders = spark.createDataFrame([(10, 1), (11, 2)], "o bigint, c bigint")
    lines = spark.createDataFrame([(7, 10), (8, 11)], "l bigint, o bigint")
    details = spark.createDataFrame([(70, 7), (80, 8)], "d bigint, l bigint")
    erase = spark.createDataFrame([(1,)], "k bigint")
    tables = {
        "customer": cust, "orders": orders,
        "lineitem": lines, "detail": details,
    }
    cleaned = propagate_erasure(
        tables,
        erase,
        key_map={"customer": "c", "orders": "c"},
        cascade=[
            ("lineitem", "o", "orders", "o"),
            ("detail", "l", "lineitem", "l"),  # parent is cascade-cleaned
        ],
    )
    assert [r["l"] for r in cleaned["lineitem"].collect()] == [8]
    assert [r["d"] for r in cleaned["detail"].collect()] == [80]
    with _pytest.raises(ValueError, match="no cleaned state"):
        propagate_erasure(
            tables,
            erase,
            key_map={"customer": "c", "orders": "c"},
            cascade=[("detail", "l", "lineitem", "l")],  # lineitem not cleaned
        )
