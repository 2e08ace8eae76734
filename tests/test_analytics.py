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


def test_funnel_latency_matches_duckdb(spark, sf_dir):
    from etl_hero_spark.registry import all_queries

    got = sorted(
        map(
            tuple,
            all_queries()["events_funnel_latency"](spark, sf_dir).collect(),
        )
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH e AS (
              SELECT user_id, event_type,
                epoch_us(cast(ts AS TIMESTAMP)) AS tsu
              FROM read_parquet('{sf_dir}/events.parquet')
            ), t0 AS (
              SELECT user_id, min(tsu) AS t0 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), t1 AS (
              SELECT e.user_id, t0, min(tsu) AS t1 FROM e JOIN t0 USING (user_id)
              WHERE event_type = 'click' AND tsu > t0
              GROUP BY e.user_id, t0
            ), t2 AS (
              SELECT e.user_id, t0, t1, min(tsu) AS t2
              FROM e JOIN t1 USING (user_id)
              WHERE event_type = 'purchase' AND tsu > t1
              GROUP BY e.user_id, t0, t1
            ), l1 AS (SELECT (t1 - t0) / 1000000.0 AS lat FROM t1),
               l2 AS (SELECT (t2 - t1) / 1000000.0 AS lat FROM t2)
            SELECT 'view', 'click', CAST(count(*) AS BIGINT),
              round(cast(sum(cast(lat AS DECIMAL(18,2))) as double)
                    / cast(count(lat) as double), 6),
              round(quantile_cont(lat, 0.5), 6),
              round(quantile_cont(lat, 0.9), 6)
            FROM l1
            UNION ALL
            SELECT 'click', 'purchase', CAST(count(*) AS BIGINT),
              round(cast(sum(cast(lat AS DECIMAL(18,2))) as double)
                    / cast(count(lat) as double), 6),
              round(quantile_cont(lat, 0.5), 6),
              round(quantile_cont(lat, 0.9), 6)
            FROM l2
            """
        ).fetchall()
    )
    assert got == want and len(got) == 2
    assert all(r[2] > 0 for r in got)  # fixture actually converts


def test_target_encoding_is_leak_free_and_matches_reference(spark):
    """A row's encoding must exclude its own fold: plant fold-specific
    targets and verify the out-of-fold means, including smoothing
    toward the global prior."""
    from etl_hero_spark.analytics import target_encode_oof

    n_folds, w = 3, 10.0
    rows = [(i, "A", 0.0) for i in range(60)] + [
        (i, "B", 10.0) for i in range(60, 120)
    ]
    df = spark.createDataFrame(rows, "id bigint, cat string, y double")
    enc = target_encode_oof(
        df, "cat", "y", n_folds=n_folds, id_col="id", prior_weight=w
    ).collect()
    prior = 5.0  # global mean of y
    by_fold: dict = {}
    for r in enc:
        by_fold.setdefault((r["cat"], r["fold"]), []).append(r["te_cat"])
    import collections

    fold_counts = collections.Counter(
        (r["cat"], r["fold"]) for r in enc
    )
    for (cat, fold), vals in by_fold.items():
        n_own = fold_counts[(cat, fold)]
        n_other = 60 - n_own
        mean_y = 0.0 if cat == "A" else 10.0
        want = (mean_y * n_other + w * prior) / (n_other + w)
        assert all(abs(v - want) < 1e-9 for v in vals), (cat, fold)
    # determinism: same salt -> same folds under repartition
    enc2 = target_encode_oof(
        df.repartition(7), "cat", "y", n_folds=n_folds, id_col="id",
        prior_weight=w,
    ).collect()
    assert sorted(map(tuple, enc)) == sorted(map(tuple, enc2))


def test_target_encoding_registered_summary_invariants(spark, sf_dir):
    """Fold assignment is engine-specific (xxhash64), so the check is a
    pure-Python reference over Spark\'s own fold column: collect the
    (cat, fold) target sums/counts once, recompute every leave-fold-out
    smoothed encoding in Python, and require exact agreement — plus
    DuckDB-checked segment row counts for the registered summary."""
    from pyspark.sql import functions as F

    from etl_hero_spark.analytics import target_encode_oof
    from etl_hero_spark.registry import all_queries

    got = {
        r["c_mktsegment"]: (r["n_rows"], r["sum_te"])
        for r in all_queries()["sample_target_encode"](
            spark, sf_dir
        ).collect()
    }
    counts = dict(
        duckdb.sql(
            f"""
            SELECT c_mktsegment, CAST(count(*) AS BIGINT)
            FROM read_parquet('{sf_dir}/orders.parquet') o
            JOIN read_parquet('{sf_dir}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1
            """
        ).fetchall()
    )
    assert {k: v[0] for k, v in got.items()} == counts

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet").select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .select("o_orderkey", "c_mktsegment", "o_totalprice")
    )
    enc = target_encode_oof(
        orders, "c_mktsegment", "o_totalprice", id_col="o_orderkey"
    )
    parts = (
        enc.groupBy("c_mktsegment", "fold")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("s"),
            F.count("o_totalprice").alias("n"),
            F.min("te_c_mktsegment").alias("te_min"),
            F.max("te_c_mktsegment").alias("te_max"),
        )
        .collect()
    )
    w = 10.0
    tot_s = sum(float(r["s"]) for r in parts)
    tot_n = sum(r["n"] for r in parts)
    prior = tot_s / tot_n
    cat_s: dict = {}
    cat_n: dict = {}
    for r in parts:
        cat_s[r["c_mktsegment"]] = cat_s.get(r["c_mktsegment"], 0.0) + float(r["s"])
        cat_n[r["c_mktsegment"]] = cat_n.get(r["c_mktsegment"], 0) + r["n"]
    for r in parts:
        c = r["c_mktsegment"]
        want = ((cat_s[c] - float(r["s"])) + w * prior) / (
            (cat_n[c] - r["n"]) + w
        )
        assert r["te_min"] == r["te_max"]  # one encoding per (cat, fold)
        assert abs(r["te_min"] - want) < 1e-6, (c, r["fold"])


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _py_lpa(edges, iters):
    """Synchronous LPA with self-vote, smallest-label tie-break."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n in adj:
            votes: dict = {labels[n]: 1}
            for m in adj[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_two_cliques(spark):
    from etl_hero_spark.analytics import label_propagation

    edges = (
        [(a, b) for a in range(5) for b in range(5) if a < b]
        + [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
        + [(4, 10)]  # one bridge must not merge the cliques
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(
            spark.createDataFrame(edges, "src bigint, dst bigint"), iters=6
        ).collect()
    }
    assert out == _py_lpa(edges, 6)
    assert len({out[n] for n in range(5)}) == 1
    assert len({out[n] for n in range(10, 15)}) == 1
    assert out[0] != out[10]


def test_label_propagation_matches_python_on_random_graph(spark):
    import random

    from etl_hero_spark.analytics import label_propagation

    rng = random.Random(5)
    edges = list(
        {
            tuple(sorted((rng.randrange(30), rng.randrange(30))))
            for _ in range(60)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            spark.createDataFrame(edges, "src bigint, dst bigint"), iters=5
        ).collect()
    }
    assert got == _py_lpa(edges, 5)


# ---------------------------------------------------------------------------
# triangle counting / session paths
# ---------------------------------------------------------------------------


def test_triangle_count_k4_plus_isolated_edge(spark):
    from etl_hero_spark.analytics import triangle_count

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5)]
    got = sorted(
        map(
            tuple,
            triangle_count(
                spark.createDataFrame(edges, "src bigint, dst bigint")
            ).collect(),
        )
    )
    # K4: each of the 4 nodes sits in C(3,2)=3 triangles; 4-5 in none
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_triangle_count_matches_python_on_random_graph(spark):
    import itertools
    import random

    from etl_hero_spark.analytics import triangle_count

    rng = random.Random(9)
    edges = sorted(
        {
            tuple(sorted((rng.randrange(25), rng.randrange(25))))
            for _ in range(90)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, "src bigint, dst bigint")
        ).collect()
    }
    assert got == want and sum(want.values()) > 0


def test_top_session_paths_match_duckdb(spark, sf_dir):
    import duckdb

    from etl_hero_spark.analytics import top_session_paths
    from etl_hero_spark.registry import _events

    got = [
        (r["path"], r["n_sessions"])
        for r in top_session_paths(
            _events(spark, sf_dir), gap_minutes=30, k=10
        ).collect()
    ]
    want = duckdb.sql(
        f"""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                 lag(CAST(ts AS TIMESTAMP)) OVER
                   (PARTITION BY user_id ORDER BY ts) AS prev
          FROM read_parquet('{sf_dir}/events.parquet')
        ), s AS (
          SELECT user_id, ts, event_type,
                 sum(CASE WHEN prev IS NULL
                          OR epoch(ts) - epoch(prev) > 1800
                     THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
          FROM e
        ), p AS (
          SELECT string_agg(event_type, '>' ORDER BY ts) AS path
          FROM s GROUP BY user_id, sid
        )
        SELECT path, count(*) AS n FROM p
        GROUP BY path ORDER BY n DESC, path ASC LIMIT 10
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_top_session_paths_truncates_pathological_key(spark):
    from etl_hero_spark.analytics import top_session_paths

    rows = [(1, float(i), "x") for i in range(60)]  # one endless session
    df = spark.createDataFrame(rows, "k bigint, t double, y string")
    out = top_session_paths(
        df, "k", "t", "y", gap_minutes=1, max_path_len=5
    ).collect()
    assert len(out) == 1
    assert out[0]["path"] == "x>x>x>x>x>…"


def test_gini_concentration_matches_duckdb(spark, sf_dir):
    from etl_hero_spark.analytics import gini_concentration

    got = gini_concentration(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "o_custkey", "o_totalprice",
    ).collect()[0]
    n, gini, top20 = duckdb.sql(
        f"""
        WITH pk AS (
          SELECT o_custkey k, sum(CAST(o_totalprice AS DECIMAL(18,2))) x
          FROM read_parquet('{sf_dir}/orders.parquet')
          GROUP BY 1 HAVING x >= 0
        ), r AS (
          SELECT x, row_number() OVER (ORDER BY x ASC, k ASC) rnk FROM pk
        ), t AS (SELECT max(rnk) n, sum(x) sx FROM r)
        SELECT n,
          round(2.0*(SELECT sum(rnk*x) FROM r)/(n*sx) - (n+1.0)/n, 6),
          round(CAST((SELECT sum(x) FROM r
                      WHERE rnk > n - floor(n*0.2)) AS DOUBLE)
                / CAST(sx AS DOUBLE), 6)
        FROM t
        """
    ).fetchone()
    assert got["n_keys"] == n
    assert got["gini"] == gini
    assert got["top20_share"] == top20
    assert 0 <= got["gini"] <= 1
    # shares are nested: top10 <= top20 <= top50 <= 1
    assert (
        got["top10_share"] <= got["top20_share"]
        <= got["top50_share"] <= 1.0
    )


def test_gini_extremes_and_negative_exclusion(spark):
    from etl_hero_spark.analytics import gini_concentration

    equal = spark.createDataFrame(
        [(i, 10.0) for i in range(100)], "k int, v double"
    )
    assert gini_concentration(equal, "k", "v").collect()[0]["gini"] == 0.0
    skewed = spark.createDataFrame(
        [(0, 1000000.0)] + [(i, 0.01) for i in range(1, 100)],
        "k int, v double",
    )
    r = gini_concentration(skewed, "k", "v").collect()[0]
    assert r["gini"] > 0.97
    neg = spark.createDataFrame(
        [(0, 5.0), (1, -3.0)], "k int, v double"
    )
    r2 = gini_concentration(neg, "k", "v").collect()[0]
    assert r2["n_excluded_negative"] == 1 and r2["n_keys"] == 1
