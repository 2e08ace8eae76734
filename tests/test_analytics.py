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
