"""Similarity-search tests: exact top-k sanity + ANN recall vs exact."""

import pyspark.sql.functions as F
import pytest

from etl_hero_spark import simsearch


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_topk_self_is_rank_one(emb, queries):
    out = simsearch.topk_cosine(emb, queries, k=5).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["corpus_id"] == qid  # self-similarity = 1.0 wins
        assert abs(top["score"] - 1.0) < 1e-6
        assert len(rows) == 5
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_topk_scores_bounded(emb, queries):
    out = simsearch.topk_cosine(emb, queries, k=5)
    assert out.filter((F.col("score") > 1.000001) | (F.col("score") < -1.000001)).count() == 0


def test_lsh_topk_recall(emb, queries):
    """Single-probe LSH top-k: every returned hit must be in the exact
    ranking's top-20 (no garbage hits), and rank-1 self-hit must survive
    (query shares its own bucket by construction)."""
    exact = simsearch.topk_cosine(emb, queries, k=20).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["corpus_id"])
    approx = simsearch.topk_cosine_lsh(emb, queries, k=5).collect()
    assert approx, "LSH must return hits"
    for r in approx:
        if r["rank"] == 1:
            assert r["corpus_id"] == r["query_id"]


def test_embedding_near_dup_finds_scaled_clones(spark, emb):
    clones = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
        .withColumn("embedding", F.transform("embedding", lambda x: x * F.lit(2.0)))
    )
    pairs = simsearch.embedding_near_dup_pairs(
        emb.unionByName(clones), threshold=0.95
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {
        (r["vec_id"], r["vec_id"] + 1000000)
        for r in emb.filter(F.col("vec_id") % 100 == 0).select("vec_id").collect()
    }
    # scaled clone has identical signature and cosine ~1.0 -> must be found
    assert expected <= found


def test_ivf_full_probe_equals_brute_force(emb, queries):
    """nprobe == n_centroids probes every inverted list -> exhaustive
    search; result must be IDENTICAL to the exact brute-force top-k."""
    exact = sorted(
        map(tuple, simsearch.topk_cosine(emb, queries, k=5).collect())
    )
    cents = simsearch.train_centroids(emb, n_centroids=8)
    full = sorted(
        map(
            tuple,
            simsearch.topk_cosine_ivf(
                emb, queries, k=5, centroids=cents, nprobe=8
            ).collect(),
        )
    )
    assert full == exact


def test_ivf_partial_probe_recall(emb, queries):
    """nprobe=2/8: self-hit must survive (the query's own vector shares
    its nearest list) and every hit must come from the exact top-50."""
    cents = simsearch.train_centroids(emb, n_centroids=8)
    approx = simsearch.topk_cosine_ivf(
        emb, queries, k=5, centroids=cents, nprobe=2
    ).collect()
    assert approx, "IVF must return hits"
    exact50 = {
        (r["query_id"], r["corpus_id"])
        for r in simsearch.topk_cosine(emb, queries, k=50).collect()
    }
    for r in approx:
        if r["rank"] == 1:
            assert r["corpus_id"] == r["query_id"]
        assert (r["query_id"], r["corpus_id"]) in exact50
