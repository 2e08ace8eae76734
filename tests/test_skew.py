"""Skew-mitigation operators: results must be IDENTICAL to the unsalted
plans; the plans must actually spread the keys."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").cache()


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").cache()


def _j(orders, customer, fn):
    return fn(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        ),
    )


def test_salted_join_equals_plain_join(orders, customer):
    from etl_hero_spark.skew import salted_join

    plain = sorted(
        map(tuple, _j(orders, customer, lambda a, b: a.join(b, "custkey")).collect())
    )
    salted = sorted(
        map(
            tuple,
            _j(orders, customer, lambda a, b: salted_join(a, b, "custkey")).collect(),
        )
    )
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark):
    from etl_hero_spark.skew import salted_join

    big = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, v string")
    small = spark.createDataFrame([(1, "A")], "k long, w string")
    out = sorted(
        map(tuple, salted_join(big, small, "k", how="left", n_salts=4).collect())
    )
    assert out == [(1, "x", "A"), (2, "y", None), (3, "z", None)]


def test_salted_join_key_includes_salt(orders, customer):
    """The hash-partitioning of the join must include _salt — that is the
    whole point (a hot custkey spreads over n_salts partitions)."""
    import contextlib
    import io

    from etl_hero_spark.skew import salted_join

    df = _j(orders, customer, lambda a, b: salted_join(a, b, "custkey"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    assert "_salt" in buf.getvalue()


def test_two_phase_distinct_count_matches_direct(orders):
    from etl_hero_spark.skew import two_phase_distinct_count

    direct = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    two_phase = {
        r["o_orderpriority"]: r["n_distinct"]
        for r in two_phase_distinct_count(
            orders, "o_orderpriority", "o_custkey"
        ).collect()
    }
    assert two_phase == direct


def test_two_phase_distinct_ignores_nulls(spark):
    from etl_hero_spark.skew import two_phase_distinct_count

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)], "k string, x long"
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in two_phase_distinct_count(df, "k", "x").collect()
    }
    # COUNT(DISTINCT x) semantics: NULLs don't count; all-null key absent
    assert got == {"a": 1}


def test_ensure_min_partitions_spreads_small_scan(spark, sf_dir):
    """A small parquet scan (one row group -> one task) must be spread to
    cluster parallelism before CPU-heavy stages."""
    from etl_hero_spark.skew import ensure_min_partitions

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ensure_min_partitions(docs, min_parts=8)
    assert out.rdd.getNumPartitions() >= 8


def test_ensure_min_partitions_never_probes_rdd(spark, sf_dir, monkeypatch):
    """The big/small probe must read logical-plan stats, never df.rdd:
    the RDD property physically plans and wraps the query per call."""
    from pyspark.sql import DataFrame

    from etl_hero_spark.skew import ensure_min_partitions

    def _boom(self):
        raise AssertionError("ensure_min_partitions probed df.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ensure_min_partitions(docs, min_parts=8)  # must not raise


def test_ensure_min_partitions_noops_on_large_estimate(spark, sf_dir):
    """An input whose optimizer size estimate already yields >= min_parts
    scan splits keeps its natural partitioning (no repartition shuffle)."""
    from etl_hero_spark.skew import ensure_min_partitions

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        out = ensure_min_partitions(docs, min_parts=2)
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert out is docs


def test_guarded_join_allows_sane_and_blocks_explosive(spark):
    import pytest

    from etl_hero_spark.skew import JoinFanoutError, guarded_join

    left = spark.createDataFrame(
        [(i % 10, i) for i in range(100)], "k long, a long"
    )
    right_ok = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "k long, b long"
    )
    out = guarded_join(left, right_ok, "k", max_key_fanout=100)
    assert out.count() == 100  # 10 dups x unique dim
    # a hot key on BOTH sides crosses the bound
    right_hot = spark.createDataFrame(
        [(7, i) for i in range(50)] + [(1, 0)], "k long, b long"
    )
    with pytest.raises(JoinFanoutError) as e:
        guarded_join(left, right_hot, "k", max_key_fanout=100)
    assert "10 x 50" in str(e.value)
    # NULL keys never match -> never counted against the bound
    left_null = spark.createDataFrame(
        [(None, i) for i in range(1000)] + [(1, 0)], "k long, a long"
    )
    assert (
        guarded_join(left_null, right_ok, "k", max_key_fanout=10).count()
        == 1
    )


def test_key_skew_report_matches_duckdb(spark, sf_dir):
    import duckdb

    from etl_hero_spark.skew import key_skew_report

    got = sorted(
        map(
            tuple,
            key_skew_report(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                "l_suppkey",
                top_k=5,
            ).collect(),
        )
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH c AS (
              SELECT CAST(l_suppkey AS VARCHAR) AS key,
                     CAST(count(*) AS BIGINT) AS n
              FROM read_parquet('{sf_dir}/lineitem.parquet')
              GROUP BY 1
            ), t AS (
              SELECT CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(n) AS BIGINT) AS n_rows,
                     max(n) AS max_n FROM c
            ), top AS (
              SELECT * FROM c ORDER BY n DESC, key LIMIT 5
            )
            SELECT key, n,
              round(n / CAST(n_rows AS DOUBLE), 6),
              round(sum(n) OVER (ORDER BY n DESC, key)
                    / CAST(n_rows AS DOUBLE), 6),
              n_keys, n_rows,
              round(max_n * n_keys / CAST(n_rows AS DOUBLE), 2)
            FROM top, t
            """
        ).fetchall()
    )
    assert got == want and len(got) == 5


def test_key_skew_report_finds_planted_hot_key(spark):
    import pyspark.sql.functions as F

    from etl_hero_spark.skew import key_skew_report

    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k")
    )
    top = key_skew_report(df, "k", top_k=3).orderBy(F.desc("n")).collect()
    assert top[0]["key"] == "7" and top[0]["n"] == 900
    assert abs(top[0]["share"] - 0.9) < 1e-9
    assert top[0]["max_over_mean"] > 50  # 900 vs mean ~9.9


# ---------------------------------------------------------------------------
# bloom-pruned join
# ---------------------------------------------------------------------------


def test_bloom_pruned_join_equals_plain_join(spark, sf_dir):
    from etl_hero_spark.skew import bloom_pruned_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_size") <= 2
    )
    got = sorted(
        map(
            tuple,
            bloom_pruned_join(li, part, "l_partkey", "p_partkey")
            .select("l_orderkey", "l_linenumber", "p_partkey")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            li.join(part, li.l_partkey == part.p_partkey)
            .select("l_orderkey", "l_linenumber", "p_partkey")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_bloom_filter_prunes_before_the_join(spark, sf_dir):
    """The point of the bloom: most non-matching fact rows die BEFORE
    the join shuffle. Measure the pre-join survivor count directly."""
    from etl_hero_spark.skew import build_bloom_filter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_size") <= 2
    )
    m_bits, k = 1 << 20, 4
    bloom = build_bloom_filter(part, "p_partkey", m_bits, k)
    probed = li.crossJoin(F.broadcast(bloom))
    for i in range(k):
        probed = probed.withColumn(
            f"_bp{i}",
            F.pmod(F.xxhash64(F.lit(i), F.col("l_partkey")), F.lit(m_bits)),
        )
    cond = None
    for i in range(k):
        word = F.element_at("bloom", (F.col(f"_bp{i}") / 64).cast("int") + 1)
        bit = F.expr(f"shiftleft(1L, cast(_bp{i} % 64 as int))")
        c = word.bitwiseAND(bit) != 0
        cond = c if cond is None else cond & c
    survivors = probed.filter(cond).count()
    true_matches = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey")
    ).count()
    assert survivors >= true_matches  # no false negatives, ever
    # 1M bits for ~tens of keys -> essentially zero false positives
    assert survivors <= true_matches * 1.05
    assert survivors < li.count() * 0.5  # and it actually pruned


def test_bloom_tiny_filter_still_exact(spark):
    """Undersized bitmap -> false positives -> MORE rows pass the
    pre-filter, but the end-to-end join result stays exact."""
    from etl_hero_spark.skew import bloom_pruned_join

    fact = spark.range(0, 2000).select(F.col("id").alias("k"))
    dim = spark.range(0, 2000, 100).select(F.col("id").alias("d"))
    out = bloom_pruned_join(fact, dim, "k", "d", m_bits=64, k_hashes=2)
    assert sorted(r["k"] for r in out.collect()) == list(range(0, 2000, 100))


def test_bloom_join_heterogeneous_key_types_still_exact(spark):
    """xxhash64 is type-sensitive; the dim key is cast to the fact
    key's type before hashing, so int-vs-bigint key pairs (the common
    cross-table mismatch) keep the no-false-negative contract."""
    from etl_hero_spark.skew import bloom_pruned_join

    fact = spark.range(0, 500).select(F.col("id").cast("int").alias("k"))
    dim = spark.range(0, 500, 25).select(F.col("id").alias("d"))  # bigint
    got = sorted(
        r["k"] for r in bloom_pruned_join(fact, dim, "k", "d").collect()
    )
    assert got == list(range(0, 500, 25))


def test_bloom_join_rejects_outer(spark):
    """Pre-filtering the fact side drops exactly the rows an outer join
    must keep null-extended — so outer joins are refused, not wrong."""
    import pytest

    from etl_hero_spark.skew import bloom_pruned_join

    a = spark.range(3).select(F.col("id").alias("k"))
    b = spark.range(1).select(F.col("id").alias("d"))
    with pytest.raises(ValueError, match="only how='inner'"):
        bloom_pruned_join(a, b, "k", "d", how="left")
