"""Co-occurrence analytics: market-basket pairs and Markov transitions
pinned against DuckDB over the same parquet, plus cap semantics."""

import duckdb
import pyspark.sql.functions as F
import pytest

from etl_hero_spark.analytics import (
    BasketCapError,
    copurchase_pairs,
    transition_matrix,
)


def test_copurchase_pairs_match_duckdb(spark, sf_dir):
    got = sorted(
        map(
            tuple,
            copurchase_pairs(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                "l_orderkey",
                "l_partkey",
                max_basket_size=50,
                min_count=2,
            ).collect(),
        )
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH i AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
              FROM read_parquet('{sf_dir}/lineitem.parquet')
            ), ok AS (
              SELECT bk, it FROM i
              WHERE bk IN (SELECT bk FROM i GROUP BY bk
                           HAVING count(*) <= 50)
            )
            SELECT a.it AS item_a, b.it AS item_b,
                   CAST(count(*) AS BIGINT) AS n
            FROM ok a JOIN ok b ON a.bk = b.bk AND a.it < b.it
            GROUP BY 1, 2 HAVING count(*) >= 2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_copurchase_support_counts_baskets_not_rows(spark):
    """Duplicate item rows inside one basket count the pair ONCE."""
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")],
        "bk bigint, it string",
    )
    rows = copurchase_pairs(df, "bk", "it").collect()
    assert len(rows) == 1
    assert (rows[0]["item_a"], rows[0]["item_b"], rows[0]["n_baskets"]) == (
        "x", "y", 2,
    )


def test_copurchase_mega_basket_is_loud(spark):
    big = [(1, i) for i in range(30)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(big, "bk bigint, it bigint")
    with pytest.raises(BasketCapError, match="exceed max_basket_size"):
        copurchase_pairs(df, "bk", "it", max_basket_size=10,
                         on_oversized="error")
    with pytest.warns(UserWarning, match="excluded"):
        rows = copurchase_pairs(
            df, "bk", "it", max_basket_size=10, on_oversized="warn"
        ).collect()
    # the mega-basket contributed nothing; basket 2's single pair remains
    assert len(rows) == 1 and rows[0]["n_baskets"] == 1


def test_transition_matrix_matches_duckdb(spark, sf_dir):
    from etl_hero_spark.registry import _events

    got = sorted(
        map(tuple, transition_matrix(_events(spark, sf_dir)).collect())
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH s AS (
              SELECT event_type AS f,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) AS t
              FROM read_parquet('{sf_dir}/events.parquet')
            ), c AS (
              SELECT f, t, CAST(count(*) AS BIGINT) AS n
              FROM s WHERE t IS NOT NULL GROUP BY f, t
            )
            SELECT f, t, n,
              round(CAST(n AS DOUBLE) /
                CAST(sum(n) OVER (PARTITION BY f) AS DOUBLE), 6) AS p
            FROM c
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # probabilities row-normalize
    import collections

    sums = collections.defaultdict(float)
    for f, _t, _n, p in got:
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_transition_matrix_single_event_keys_emit_nothing(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a", "2024-01-01 00:00:00"),
         (2, 20, "b", "2024-01-01 00:00:00")],
        "event_id long, user_id long, event_type string, s string",
    ).select("event_id", "user_id", "event_type",
             F.to_timestamp("s").alias("ts"))
    assert transition_matrix(ev).count() == 0


def test_pagerank_matches_numpy_power_iteration(spark):
    """Ranks after k iterations must match a numpy reference running
    the same damped power iteration with uniform dangling
    redistribution — including a dangling node and an unreferenced
    source."""
    import numpy as np

    from etl_hero_spark.analytics import pagerank

    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),
        (3, 5),  # 5 is dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    iters, d = 7, 0.85
    got = {
        r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()
    }

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: [w for (s, w) in edges if s == v] for v in nodes}
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = sum(r[idx[v]] for v in nodes if not out[v])
        for v in nodes:
            for w in out[v]:
                nxt[idx[w]] += r[idx[v]] / len(out[v])
        r = (1 - d) / n + d * dangling / n + d * nxt
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-6, v
    assert abs(sum(got.values()) - 1.0) < 1e-6  # still a distribution


def test_pagerank_deterministic_under_repartition(spark):
    from etl_hero_spark.analytics import pagerank

    edges = spark.range(60).selectExpr(
        "id % 12 AS src", "(id * 7 + 3) % 12 AS dst"
    )
    r1 = sorted(map(tuple, pagerank(edges, iters=5).collect()))
    r2 = sorted(
        map(tuple, pagerank(edges.repartition(13), iters=5).collect())
    )
    assert r1 == r2
