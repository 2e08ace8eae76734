"""Multi-source BFS vs a pure-Python reference, plus planted
path/disconnected fixtures."""

import collections

from pyspark.sql import functions as F

from etl_hero_spark.analytics import bfs_distances, copurchase_pairs


def _ref_bfs(edge_list, seeds, max_hops):
    adj = collections.defaultdict(set)
    for s, d in edge_list:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for k in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = k
                    nxt.add(m)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_matches_reference_on_copurchase_graph(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = copurchase_pairs(
        li, "l_orderkey", "l_partkey", max_basket_size=50, min_count=3
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    edge_list = [(r["src"], r["dst"]) for r in pairs.collect()]
    seed = min(s for s, _ in edge_list)
    seeds = spark.createDataFrame([(seed,)], "node bigint")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(pairs, seeds, max_hops=4).collect()
    }
    assert got == _ref_bfs(edge_list, {seed}, 4)
    assert got[seed] == 0 and len(got) > 1


def test_bfs_path_graph_exact_hops(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=3).collect()
    }
    # hop cap respected: node 4 (dist 4) excluded; disconnected 10/11 absent
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_early_exit_and_min_dist(spark):
    # diamond: two paths to node 3 — dist must be the MINIMUM (2), and
    # the component saturates at hop 2 so hops 3..6 are skipped
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_multi_source_takes_nearest_seed(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,), (4,)], "node bigint")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=4).collect()
    }
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_local_boundary_equals_parquet(spark, sf_dir):
    """boundary='local' (the registered/bench posture since r5) and
    boundary='parquet' (the durable cluster default) are the same
    algorithm behind different lineage-truncation mechanics — results
    must be identical on the real co-purchase graph."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = copurchase_pairs(
        li, "l_orderkey", "l_partkey", max_basket_size=50, min_count=3
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    seeds = pairs.agg(F.min("src").alias("node"))
    durable = {
        (r["node"], r["dist"])
        for r in bfs_distances(
            pairs, seeds, max_hops=3, boundary="parquet"
        ).collect()
    }
    local = {
        (r["node"], r["dist"])
        for r in bfs_distances(
            pairs, seeds, max_hops=3, boundary="local"
        ).collect()
    }
    assert durable == local and durable


def test_bfs_rejects_unknown_boundary(spark):
    import pytest

    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(ValueError, match="boundary"):
        bfs_distances(edges, seeds, boundary="memory")
