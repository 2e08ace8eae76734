"""Similarity search over embedding columns (extension mandate).

Two rungs:
* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set, one linear scan of the corpus, per-query top-k via window.
  At 100 TB this is still the right shape when the query set is small:
  no shuffle of the corpus, only of the (n_queries x k) result.
* LSH-bucketed ANN (random hyperplane signatures) — the scale path when
  the query set is large or latency matters: candidates share a signature
  bucket, exact rerank inside buckets only.

Vectors are quantized to 3dp doubles before scoring so dot products are
bit-identical across engines (see registry oracle) — quantization is an
oracle-parity device, not a semantic requirement; pass quantize=None to
score raw floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_hero_spark.skew import ensure_min_partitions


def quantized_vec(col: str | Column, dp: int | None = 3) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if dp is None:
        return F.transform(c, lambda x: x.cast("double"))
    return F.transform(c, lambda x: F.round(x.cast("double"), dp))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-to-right double accumulation (matches DuckDB's
    list_dot_product order on identical inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantize: int | None = 3,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan shape: broadcast(queries) x corpus scan -> score -> per-query
    window top-k. Corpus never shuffles on content — only the scored rows
    move, and AQE prunes the tiny window shuffle. Deterministic ordering:
    (score DESC, corpus id ASC) with 6dp-rounded scores.
    """
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"), quantized_vec(vec_col, quantize).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplane signatures)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny constant;
    broadcast into the plan as literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def signature_sql_expr(
    vec_sql: str, planes: list[list[float]], dp: int | None = 3
) -> Column:
    """Hyperplane bit-signature as ONE unrolled SQL expression over the
    RAW vector attribute named by vec_sql — same three constraints as
    _dot_const_sql (codegen'd flat arithmetic, no aliased-array
    re-extraction, single py4j round trip). Sign bits sum into a long
    (distinct powers of two, so + == OR)."""

    def term(i: int, v: float) -> str:
        x = f"cast({vec_sql}[{i}] as double)"
        if dp is not None:
            x = f"round({x}, {dp})"
        return f"{x}*cast({float(v)!r} as double)"

    bits = []
    for i, p in enumerate(planes):
        proj = " + ".join(term(j, v) for j, v in enumerate(p))
        bits.append(f"(CASE WHEN ({proj}) >= 0 THEN {1 << i}L ELSE 0L END)")
    return F.expr(" + ".join(bits))


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-signature: sign of projection onto each hyperplane, packed into
    a long. Ad-hoc Column-level form (interpreted HOFs) — hot paths use
    signature_sql_expr over the raw scan attribute."""
    bits = []
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    quantize: int | None = 3,
    n_probes: int = 1,
) -> DataFrame:
    """ANN top-k: corpus and queries hash to hyperplane-sign buckets;
    exact cosine rerank only within the query's probed buckets. Recall < 1
    by construction (buckets may truncate the true top-k); n_probes is the
    standard multi-probe recall knob — each query also probes the buckets
    at Hamming distance 1 (single-bit signature flips, plane order), so
    n_probes=1+n_planes visits the full Hamming-1 ball. Corpus cost is
    unchanged (the corpus still hashes once); only the broadcast query
    side grows by the probe factor. Corpus side can be
    precomputed/persisted — the signature is a pure function of the
    vector."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        quantized_vec(vec_col, quantize).alias("cv"),
        signature_sql_expr(vec_col, planes, dp=quantize).alias("sig"),
    )
    n_probes = max(1, min(n_probes, 1 + n_planes))
    # explode tiny literal XOR masks and flip bits AFTER the explode: the
    # unrolled signature expression (n_planes x dim terms) must appear in
    # the plan exactly once — an array of n_probes copies of it blows
    # whole-stage codegen past the 64 KB method limit
    masks = [0] + [1 << i for i in range(n_probes - 1)]
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
        signature_sql_expr(vec_col, planes, dp=quantize).alias("sig0"),
        F.explode(
            F.array(*[F.lit(m).cast("long") for m in masks])
        ).alias("mask"),
    ).select(
        "query_id",
        "qv",
        F.col("sig0").bitwiseXOR(F.col("mask")).alias("sig"),
    )
    scored = c.join(F.broadcast(q), "sig").withColumn(
        "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
    )
    if n_probes > 1:
        # a candidate can share several probed buckets with the same query;
        # dedup before ranking (identical score rows — any survivor works)
        scored = scored.dropDuplicates(["query_id", "corpus_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: identical
    signature -> candidate -> exact cosine filter. The embedding-space
    sibling of dedup.minhash_lsh_pairs."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        quantized_vec(vec_col, 3).alias("v"),
        signature_sql_expr(vec_col, planes, dp=3).alias("sig"),
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "sig")
    b = sig.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed lists
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Coarse quantizer: Lloyd k-means on a bounded corpus sample.

    The sample (<= sample_rows vectors) comes to the driver once — at any
    corpus scale the model is trained on a sample, so this is the honest
    100 TB shape too; the resulting k x dim centroid table is a tiny model
    literal folded into the plan (no join needed for assignment).
    Deterministic: seeded init, fixed iteration count, numpy float64.
    """
    import numpy as np

    rows = (
        corpus.select(quantized_vec(vec_col, 3).alias("v"))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return np.round(cents, 6).tolist()


def _dot_const_sql(vec_sql: str, const: list[float], dp: int | None) -> str:
    """vec . const as UNROLLED indexed arithmetic (vec[0]*c0 + ...), not a
    zip_with/aggregate lambda: higher-order functions evaluate interpreted
    (~us per element), while a flat arithmetic tree whole-stage-codegens
    (~ns per term).

    Two hard-won constraints shape this:
    * `vec_sql` must name a RELATION ATTRIBUTE (the raw array column from
      the scan), NOT an alias of a computed array. getItem references are
      "extract-only" to CollapseProject, which inlines the aliased
      expression into every one of the n_dim x n_centroids extractions —
      a staged quantized vector was re-built 1024 times per row (measured
      26 ms/row). Per-term quantization (round per extraction) instead.
    * the tree is built as ONE SQL string parsed JVM-side: constructing
      ~4000 Column objects crosses py4j per node (~20 s of DRIVER time
      just to build the plan).
    """

    def term(i: int) -> str:
        x = f"cast({vec_sql}[{i}] as double)"
        if dp is not None:
            x = f"round({x}, {dp})"
        return f"{x}*cast({float(const[i])!r} as double)"

    return " + ".join(term(i) for i in range(len(const)))


def nearest_lists_expr(
    vec_sql: str,
    centroids: list[list[float]],
    nprobe: int,
    dp: int | None = 3,
) -> Column:
    """Array of the nprobe nearest centroid ids — one codegen'd SQL
    expression over the RAW vector attribute named by ``vec_sql`` (see
    _dot_const_sql): array<struct(score,idx)> sorted ascending (struct
    compare = score first, idx tiebreak), sliced, projected to ids.

    score = |y|^2 - 2 x.y, which orders centroids y identically to
    ||x-y||^2 for a fixed row x (the |x|^2 term is constant per row and
    never computed). |y|^2 folds to a literal per centroid."""
    structs = ", ".join(
        f"struct(cast({float(sum(v * v for v in c))!r} as double)"
        f" - 2.0D*({_dot_const_sql(vec_sql, c, dp)}) as score,"
        f" {i} as idx)"
        for i, c in enumerate(centroids)
    )
    return F.expr(
        f"transform(slice(array_sort(array({structs})), 1, {nprobe}), s -> s.idx)"
    )


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    quantize: int | None = 3,
    stage_key=None,
) -> DataFrame:
    """IVF ANN top-k: corpus rows live in the inverted list of their
    nearest centroid; each query proposes its nprobe nearest lists and
    exact cosine reranks only inside those lists.

    ``stage_key``: callers whose corpus is immutable for the session may
    pass an identity-and-freshness key — the assignment table is then
    built once per key and reused across calls, like a stored IVF index
    (write_ivf_index is the durable variant).

    Scale shape: assignment is a map-side expression over centroid
    literals (no join, no shuffle of the corpus); the probe join
    broadcasts the exploded (query x nprobe) side; the equi-join on
    list_id touches ~nprobe/n_centroids of the corpus. nprobe ==
    n_centroids degrades gracefully to exhaustive search (== brute
    force, asserted in tests). Corpus-side (list_id, vector) can be
    precomputed and persisted like any IVF index.
    """
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids=n_centroids, vec_col=vec_col
        )
    nprobe = min(nprobe, len(centroids))
    # assignment reads the RAW vector attribute — never the staged cv
    # (extract-only inlining would re-build cv per term, see
    # _dot_const_expr); cv is staged separately for the HOF rerank only
    c = (
        ensure_min_partitions(corpus)
        .select(
            F.col(id_col).alias("corpus_id"),
            quantized_vec(vec_col, quantize).alias("cv"),
            nearest_lists_expr(vec_col, centroids, 1, dp=quantize)[0].alias(
                "list_id"
            ),
        )
    )
    # this (list_id, vector) table IS the IVF index: build it once in
    # parallel and stage it to disk — otherwise the probe join's
    # (AQE-coalesced) tasks re-run the centroid assignment serially per
    # query batch. A cache() here would leak for the session (the
    # result is lazy, no unpersist point — §4(c) policy); the disk
    # stage boundary holds no executor memory and the probe join reads
    # the columnar file back pruned. write_ivf_index is the durable,
    # list_id-partitioned production variant.
    from etl_hero_spark.checkpoint import memo_parquet_checkpoint, parquet_checkpoint

    if stage_key is not None:
        c = memo_parquet_checkpoint(
            c,
            ("ivf_index", stage_key, n_centroids, nprobe, quantize),
            "ivf_index",
        )
    else:
        c = parquet_checkpoint(c, "ivf_index")
    return _ivf_probe_rerank(
        c, queries, centroids, k, nprobe, query_id_col, vec_col, quantize
    )


def _ivf_probe_rerank(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int,
    nprobe: int,
    query_id_col: str,
    vec_col: str,
    quantize: int | None,
) -> DataFrame:
    """Probe + exact rerank against an IVF assignment table
    (corpus_id, cv, list_id) — shared by the in-memory and persisted
    index paths. Queries explode to their nprobe nearest lists
    (broadcast); the equi-join on list_id touches ~nprobe/n_centroids
    of the index (partition-pruned when the index is stored
    partitioned by list_id)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
        F.explode(
            nearest_lists_expr(vec_col, centroids, nprobe, dp=quantize)
        ).alias("list_id"),
    )
    scored = index.join(F.broadcast(q), "list_id").withColumn(
        "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    quantize: int | None = 3,
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Persist an IVF index: the centroid model at {path}/centroids and
    the assignment table (corpus_id, cv, list_id) at {path}/lists,
    PARTITIONED BY list_id — a probe of p lists scans exactly p
    partitions. Assignment is the one full pass over the corpus; every
    later query batch reads the stored lists only (topk_cosine_ivf's
    session-scoped stage boundary, made durable). Returns the centroids.

    (quantize, centroid values) are part of the index identity — the
    probe side must use the same; topk_cosine_ivf_indexed reads both
    from the stored model.
    """
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids=n_centroids, vec_col=vec_col
        )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [
            (i, [float(v) for v in c], -1 if quantize is None else quantize)
            for i, c in enumerate(centroids)
        ],
        "list_id int, centroid array<double>, quantize int",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    assignments = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        quantized_vec(vec_col, quantize).alias("cv"),
        nearest_lists_expr(vec_col, centroids, 1, dp=quantize)[0].alias(
            "list_id"
        ),
    )
    assignments.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    write_index_meta(spark, path, "ivf", quantize)
    return centroids


def topk_cosine_ivf_indexed(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k against a PERSISTED index (write_ivf_index): reads the
    stored centroid model and probes the list_id-partitioned assignment
    table — the corpus embeddings are never rescanned. Same output as
    topk_cosine_ivf with the same centroids (asserted in tests)."""
    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    centroids = [list(r["centroid"]) for r in cent_rows]
    quantize = cent_rows[0]["quantize"]
    quantize = None if quantize < 0 else quantize
    index = spark.read.parquet(f"{path}/lists")
    nprobe = min(nprobe, len(centroids))
    return _ivf_probe_rerank(
        index, queries, centroids, k, nprobe, query_id_col, vec_col, quantize
    )


# ---------------------------------------------------------------------------
# embedding profiling: per-label centroids (long format)
# ---------------------------------------------------------------------------


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid in long format: (label, pos, mean_val, n_vecs)
    — one row per (label, dimension). Embedding-space profiling: cluster
    centers, drift between corpus snapshots, per-class norms.

    Plan: posexplode the vector (narrow, rows x dims) -> ONE groupBy
    (label, pos) with decimal-exact accumulation. Float sums are
    partition-order dependent; summing as decimal(27,9) makes the result
    deterministic run-to-run (and engine-exact for the in-test DuckDB
    parity), with final division in float64. No window, no collect; at
    100 TB this is a single partial+final shuffle of labels x dims rows.

    Long format deliberately: a (label, array) wide form needs an
    order-sensitive array_agg (sort_array over structs — more expensive
    and no more useful downstream than the relational form).
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    return ex.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(27,9)")).cast("double")
            / F.count("val").cast("double"),
            6,
        ).alias("mean_val"),
        F.count("val").cast("bigint").alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-bucketed cosine
# ---------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.92,
    n_centroids: int = 16,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): remove SEMANTIC
    duplicates — documents whose embeddings are near-identical even
    when their text is not — by clustering with a coarse k-means
    quantizer and comparing pairs only WITHIN a cluster, then keeping
    one representative per connected duplicate group.

    Output: (id_col, cluster_id, component, keep) for every input row;
    keep=1 marks the retained representative (the smallest id of its
    duplicate group; singletons keep themselves).

    Scale shape: the quadratic surface is per-cluster (the paper's own
    construction — k scales with corpus size so cluster populations
    stay bounded); centroids are a sample-trained driver model folded
    into the plan as literals (train_centroids), assignment is a
    codegen'd argmin with NO join, and the duplicate closure is the
    same pointer-jumping connected_components as the text rungs.
    Cross-cluster near-dup pairs are missed by construction — that is
    SemDeDup's documented recall trade-off (tested against the
    single-cluster exact form).
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.dedup import connected_components
    from etl_hero_spark.skew import ensure_min_partitions

    cents = train_centroids(
        df, n_centroids=n_centroids, vec_col=vec_col, seed=seed
    )
    # the assignment map pass (argmin over the unrolled centroid
    # expressions) is consumed THREE times (both self-join sides + the
    # final rejoin) and the quadratic within-cluster pair table TWICE
    # (the closure's two edge-union arms) — stage both once
    assigned = parquet_checkpoint(
        ensure_min_partitions(df).select(
            F.col(id_col).alias("id"),
            quantized_vec(vec_col, 3).alias("v"),
            nearest_lists_expr(vec_col, cents, 1)[0].alias("cluster_id"),
        ),
        "semdedup-assigned",
    )
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), "cluster_id"
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), "cluster_id"
    )
    pairs = parquet_checkpoint(
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b"),
        "semdedup-pairs",
    )
    comp = connected_components(pairs)
    return (
        assigned.join(
            comp.select(F.col("id"), F.col("component")), "id", "left"
        )
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            F.coalesce(F.col("component"), F.col("id")).alias("component"),
            (
                F.coalesce(F.col("component"), F.col("id")) == F.col("id")
            )
            .cast("int")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's compression rung): codes + ADC scoring
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m``
    contiguous subspaces and run Lloyd k-means (``k_sub`` centroids)
    independently in each — the memory-compression rung of IVF-PQ
    (Jegou et al., "Product Quantization for Nearest Neighbor Search").
    A d-dim float vector becomes m small codes (m*log2(k_sub) bits):
    64 floats -> 8 nibbles here, a 64x compression, which is what makes
    billion-vector ANN fit a cluster's memory at all.

    Like train_centroids, the bounded sample is the honest at-scale
    shape, and the returned m x k_sub x (d/m) table is a tiny model
    folded into plans as literals. Deterministic (seeded, fixed iters).
    """
    import numpy as np

    rows = (
        corpus.select(quantized_vec(vec_col, 3).alias("v"))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    return _train_books_np(x, m, k_sub, iters, seed)


def _train_books_np(x, m: int, k_sub: int, iters: int, seed: int):
    """Per-subspace Lloyd over an in-memory sample matrix — shared by
    the raw-vector PQ trainer and the IVF-PQ residual trainer."""
    import numpy as np

    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = xs[
            rng.choice(len(xs), size=min(k_sub, len(xs)), replace=False)
        ].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(np.round(cents, 6).tolist())
    return books


def _sub_dot_sql(
    vec_sql: str, const: list[float], offset: int, dp: int | None
) -> str:
    """vec[offset:] . const, unrolled like _dot_const_sql (same codegen
    and CollapseProject constraints apply: vec_sql must be a raw scan
    attribute, and the tree is ONE driver-built SQL string)."""

    def term(i: int) -> str:
        x = f"cast({vec_sql}[{offset + i}] as double)"
        if dp is not None:
            x = f"round({x}, {dp})"
        return f"{x}*cast({float(const[i])!r} as double)"

    return " + ".join(term(i) for i in range(len(const)))


def pq_codes_expr(
    vec_sql: str,
    codebooks: list[list[list[float]]],
    dp: int | None = 3,
) -> Column:
    """array<int> of per-subspace nearest-centroid codes, one codegen'd
    expression: per subspace, argmin over k_sub centroids of
    |y|^2 - 2 x_j.y (orders like L2 for fixed x_j), via the
    array_sort(struct(score, idx)) trick of nearest_lists_expr."""
    subs = []
    sub = len(codebooks[0][0])
    for j, book in enumerate(codebooks):
        structs = ", ".join(
            f"struct(cast({float(sum(v * v for v in c))!r} as double)"
            f" - 2.0D*({_sub_dot_sql(vec_sql, c, j * sub, dp)}) as score,"
            f" {i} as idx)"
            for i, c in enumerate(book)
        )
        subs.append(f"array_sort(array({structs}))[0].idx")
    return F.expr(f"array({', '.join(subs)})")


def pq_query_tables_expr(
    vec_sql: str,
    codebooks: list[list[list[float]]],
    dp: int | None = 3,
) -> Column:
    """The query-side ADC lookup tables as ONE nested-array column:
    tables[j][c] = q_j . y_{j,c}. Built per query ROW (a column
    expression over the raw query vector attribute), so any number of
    queries stays fully distributed — no driver-side per-query
    literals."""
    sub = len(codebooks[0][0])
    outer = ", ".join(
        "array("
        + ", ".join(
            _sub_dot_sql(vec_sql, c, j * sub, dp) for c in book
        )
        + ")"
        for j, book in enumerate(codebooks)
    )
    return F.expr(f"array({outer})")


def pq_adc_score_expr(codes_col: str, tables_col: str, m: int) -> Column:
    """Approximate dot(q, x) = sum_j tables[j][codes[j]] — m indexed
    lookups + adds, whole-stage-codegen, no lambda, no explosion."""
    return F.expr(
        " + ".join(f"{tables_col}[{j}][{codes_col}[{j}]]" for j in range(m))
    )


def topk_cosine_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_sub: int = 16,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: list[list[list[float]]] | None = None,
    quantize: int | None = 3,
    adc_dp: int | None = None,
) -> DataFrame:
    """PQ-compressed ANN top-k with exact rerank: corpus vectors are
    encoded ONCE to m codes + a norm (a disk stage boundary — the
    1000-term encode expression is analyzed and codegen-compiled a
    single time, and both consumers read it back column-pruned);
    queries carry their ADC lookup tables as a computed column; the
    scan scores every (query, code) pair with m array lookups (64x
    less memory traffic than raw vectors); the top k*rerank_factor ADC
    candidates per query join back their raw vectors for an exact
    cosine rerank.

    Plan shape == topk_cosine (broadcast queries x corpus scan ->
    window top-k), but the scan reads (codes, norm) instead of the
    embedding column — at 100 TB that is the difference between
    scanning 100 TB and scanning ~2 TB. rerank_factor >= number of
    candidates wanted exact; with rerank over the whole corpus the
    result equals brute force (pinned in tests).

    ``adc_dp`` (per-term rounding inside the ADC expressions) defaults
    to None: ADC only ORDERS candidates — the exact quantized rerank
    decides final scores — and skipping 1000 round() calls halves the
    generated source the JIT must chew. ``quantize`` still pins the
    rerank cosine to the engine-exact grid."""
    books = codebooks or train_pq_codebooks(
        corpus, m=m, k_sub=k_sub, vec_col=vec_col
    )
    m = len(books)
    from etl_hero_spark.checkpoint import parquet_checkpoint

    enc = parquet_checkpoint(
        ensure_min_partitions(corpus).select(
            F.col(id_col).alias("corpus_id"),
            quantized_vec(vec_col, quantize).alias("cv"),
            pq_codes_expr(vec_col, books, dp=adc_dp).alias("codes"),
            F.round(norm_expr(quantized_vec(vec_col, quantize)), 9).alias(
                "cnorm"
            ),
        ),
        "pq_enc",
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
        pq_query_tables_expr(vec_col, books, dp=adc_dp).alias("tabs"),
    )
    # ADC pass carries only (ids, adc) into the top-k window shuffle —
    # shipping cv here would move every corpus vector through the
    # exchange, the exact memory traffic PQ exists to avoid
    scored = enc.drop("cv").crossJoin(F.broadcast(q.drop("qv"))).withColumn(
        "adc",
        F.round(
            pq_adc_score_expr("codes", "tabs", m) / F.col("cnorm"), 6
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("corpus_id"))
    cand = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "corpus_id")
    )
    # exact rerank: the bounded candidate set (n_queries * k * factor
    # rows) broadcasts back against the raw vectors — the corpus never
    # shuffles
    rer = (
        enc.select("corpus_id", "cv")
        .join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
    codebooks: list[list[list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Persist a PQ index: codebooks at {path}/codebooks (long format:
    subspace, code, centroid) and the encoded corpus (corpus_id, codes,
    cnorm, cv) at {path}/codes. Encoding is the one full corpus pass;
    later query batches read codes (+ cv only for the rerank rows).
    (quantize, codebooks) are the index identity, mirrored from
    write_ivf_index."""
    books = codebooks or train_pq_codebooks(
        corpus, m=m, k_sub=k_sub, vec_col=vec_col
    )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [
            (j, c, [float(v) for v in cent],
             -1 if quantize is None else quantize)
            for j, book in enumerate(books)
            for c, cent in enumerate(book)
        ],
        "subspace int, code int, centroid array<double>, quantize int",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    enc = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        pq_codes_expr(vec_col, books, dp=quantize).alias("codes"),
        F.round(norm_expr(quantized_vec(vec_col, quantize)), 9).alias(
            "cnorm"
        ),
        quantized_vec(vec_col, quantize).alias("cv"),
    )
    enc.write.mode("overwrite").parquet(f"{path}/codes")
    return books


# ---------------------------------------------------------------------------
# IVF-PQ: coarse partitioning + PQ codes in one persisted index
# ---------------------------------------------------------------------------


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
    adc_dp: int | None = None,
    centroids: list | None = None,
    codebooks: list | None = None,
) -> tuple:
    """Persist the combined ANN index — IVF coarse lists AND PQ codes:
    {path}/centroids (coarse model), {path}/codebooks (PQ model),
    {path}/codes = (corpus_id, codes, cnorm, cv) PARTITIONED BY
    list_id. ONE corpus pass builds it: list assignment and PQ encoding
    are independent expressions over the RAW vector attribute, so they
    share a projection without the CollapseProject re-inline trap.

    A probe of p lists then scans p/n_centroids of the corpus AND reads
    m-byte codes instead of d-float vectors — the two multiplicative
    reductions that make billion-vector ANN tractable. Codebooks here
    quantize raw vectors shared across lists (IVF-Flat-PQ); classical
    residual encoding (quantize v - centroid[list]) buys more recall
    per bit — see write_ivfpq_residual_index, which builds that form
    with the staged residual column.

    Returns (centroids, codebooks). Pre-trained models may be passed
    back in via ``centroids``/``codebooks`` (the append_*_batch rebuild
    posture: encode a grown corpus under a FROZEN model).
    """
    cents = centroids if centroids is not None else train_centroids(
        corpus, n_centroids=n_centroids, vec_col=vec_col
    )
    books = codebooks if codebooks is not None else train_pq_codebooks(
        corpus, m=m, k_sub=k_sub, vec_col=vec_col
    )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [
            (i, [float(v) for v in c], -1 if quantize is None else quantize)
            for i, c in enumerate(cents)
        ],
        "list_id int, centroid array<double>, quantize int",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(v) for v in cent])
            for j, book in enumerate(books)
            for c, cent in enumerate(book)
        ],
        "subspace int, code int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    enc = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
            "list_id"
        ),
        pq_codes_expr(vec_col, books, dp=adc_dp).alias("codes"),
        F.round(norm_expr(quantized_vec(vec_col, quantize)), 9).alias(
            "cnorm"
        ),
        quantized_vec(vec_col, quantize).alias("cv"),
    )
    enc.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/codes"
    )
    write_index_meta(spark, path, "ivfpq", quantize, adc_dp=adc_dp)
    return cents, books


def topk_cosine_ivfpq_indexed(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    adc_dp: int | None = None,
) -> DataFrame:
    """Search a persisted IVF-PQ index: each query probes its nprobe
    nearest coarse lists; the probed list ids (a tiny driver-side set)
    become a STATIC partition filter, so the codes scan provably reads
    only probed partitions (PartitionFilters asserted in tests — no
    reliance on runtime DPP); ADC lookup tables ride the broadcast
    query side; the bounded candidate set reranks exactly against cv.
    Full probe + full rerank == brute force exactly (pinned in tests).

    The query-side model application (probe assignment + lookup-table
    construction) runs on the DRIVER in numpy: the query set is small
    by contract, and shipping a few rows of precomputed tables as data
    beats recompiling thousand-term expressions per call (the codegen
    cost lives in the index BUILD, paid once). A large query batch
    belongs in topk_cosine_pq, whose expression path is distributed.
    """
    import numpy as np

    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    cents = np.asarray([list(r["centroid"]) for r in cent_rows])
    quantize = cent_rows[0]["quantize"]
    quantize = None if quantize < 0 else quantize
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(r["subspace"] for r in book_rows)
    books: list[list[list[float]]] = [[] for _ in range(mm)]
    for r in sorted(book_rows, key=lambda r: (r["subspace"], r["code"])):
        books[r["subspace"]].append(list(r["centroid"]))
    nprobe = min(nprobe, len(cents))
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
    ).collect()
    # the driver-rebuilt probe/query frames must carry the CALLER's id
    # type — the index accepts any id type at build, so hardcoding long
    # here would reject string or wide ids that built fine (ADVICE r3)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    sub = len(books[0][0])
    probe_data, qv_data = [], []
    for r in q_rows:
        v = np.asarray(r["qv"], dtype=np.float64)
        if adc_dp is not None:
            v = v.round(adc_dp)
        # nearest lists by |c|^2 - 2 v.c (same ordering as the build)
        scores = (cents * cents).sum(axis=1) - 2.0 * (cents @ v)
        lists = [int(i) for i in np.argsort(scores, kind="stable")[:nprobe]]
        tabs = [
            [
                float(np.dot(v[j * sub : (j + 1) * sub], np.asarray(c)))
                for c in books[j]
            ]
            for j in range(mm)
        ]
        for li in lists:
            probe_data.append((r["query_id"], li, tabs))
        qv_data.append((r["query_id"], [float(x) for x in r["qv"]]))
    probes = spark.createDataFrame(
        probe_data,
        f"query_id {qid_type}, list_id int, tabs array<array<double>>",
    )
    q = spark.createDataFrame(
        qv_data, f"query_id {qid_type}, qv array<double>"
    )
    probed_lists = sorted({p[1] for p in probe_data})
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("list_id").isin(probed_lists)
    )
    scored = (
        codes.drop("cv")
        .join(F.broadcast(probes), "list_id")
        .withColumn(
            "adc",
            F.round(
                pq_adc_score_expr("codes", "tabs", mm) / F.col("cnorm"), 6
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("corpus_id"))
    cand = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "corpus_id")
    )
    rer = (
        codes.select("corpus_id", "cv")
        .join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def kmeans_init(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 42,
) -> list:
    """Partition-order-INDEPENDENT seeded init for kmeans_lloyd: the
    candidate pool is the ``sample_rows`` lowest-xxhash64 vectors — a
    total order no repartition/coalesce can change (train_centroids'
    ``limit`` sample, by contrast, depends on physical row order) — and
    the k seeds are a seeded numpy choice from that pool. TakeOrdered
    keeps the pool bounded at any corpus scale."""
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64("v").asc(), F.col("v").asc())
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(k, len(x)), replace=False)
    return [[float(c) for c in x[i]] for i in idx]


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    tol: float = 1e-6,
) -> dict:
    """DISTRIBUTED Lloyd k-means over the full corpus (train_centroids is
    the sampled driver-side trainer for quantizer models; this is the
    full-data iteration for when cluster QUALITY is the product — e.g.
    SemDeDup's clustering stage or corpus cartography).

    Per iteration: assignment is a map-side expression over centroid
    literals (nearest_lists_expr — no join, no shuffle of vectors);
    centroid recomputation is ONE groupBy(cluster) with d unrolled
    per-dim DECIMAL(38,18) conditional sums reading the RAW scan
    attribute (d is bounded) — no posexplode: the explode version
    materialized n*d rows per iteration before its (cluster, dim)
    aggregate, and at 10 iterations that row blowup was the single
    most expensive query in the round-9 cold sweep (VERDICT r9 #2).
    The per-dim sums ride the same hash aggregate's map-side partial
    combine, so the shuffle is k groups x 2d columns per map
    partition — independent of n — and the decimal accumulation keeps
    the means bit-deterministic regardless of partition order, so the
    iteration trajectory is reproducible run-to-run, which
    float-accumulated distributed means are not. k rows of 2d columns
    come back to the driver as the next model (tiny). Stops early
    when no centroid moves more than ``tol`` (squared L2).

    Returns {"centroids", "iterations", "converged"}. Assignments are
    re-derivable as an expression from the returned centroids —
    cluster_sizes_lloyd builds the (cluster, size, inertia) summary.
    """
    cents = kmeans_init(corpus, k, vec_col=vec_col, seed=seed)
    it = 0
    converged = False
    dim = len(cents[0]) if cents else 0
    # SQL strings, not Column objects: one py4j call per column, and
    # the getItems read the raw scan attribute (no CollapseProject
    # re-build). n{d} counts positions that EXIST (size > d) so ragged
    # arrays keep the exact posexplode-era semantics.
    agg_exprs = [
        F.expr(
            f"sum(cast(`{vec_col}`[{d}] as decimal(38,18))) as s{d}"
        )
        for d in range(dim)
    ] + [
        F.expr(
            f"count(case when size(`{vec_col}`) > {d} then 1 end)"
            f" as n{d}"
        )
        for d in range(dim)
    ]
    for it in range(1, iters + 1):
        rows = (
            corpus.groupBy(
                nearest_lists_expr(vec_col, cents, 1, dp=None)[0].alias(
                    "c"
                )
            )
            .agg(*agg_exprs)
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            vals = []
            for d in range(dim):
                s, n = r[f"s{d}"], r[f"n{d}"]
                if s is None or not n:
                    vals = None
                    break
                vals.append(float(s) / n)
            if vals is not None:
                new[r["c"]] = vals
        move = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(cents, new)
        )
        cents = new
        if move <= tol:
            converged = True
            break
    return {
        "centroids": [[float(x) for x in c] for c in cents],
        "iterations": it,
        "converged": converged,
    }


def cluster_sizes_lloyd(
    corpus: DataFrame,
    centroids: list,
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n, inertia) summary for a trained k-means model: one
    scan, assignment + squared distance both as expressions over
    centroid literals, decimal-summed inertia (deterministic). The
    evaluation half of kmeans_lloyd."""
    k = len(centroids)
    dists = [
        f"(cast({sum(v * v for v in c)!r} as double) "
        f"- 2.0D * ({_dot_const_sql(vec_col, c, None)}))"
        for c in centroids
    ]
    structs = ", ".join(
        f"struct({d} as sc, {i} as idx)" for i, d in enumerate(dists)
    )
    pick = F.expr(f"array_sort(array({structs}))[0]")
    sq = F.expr(
        f"aggregate({vec_col}, cast(0.0 as double), (a, x) -> a + x * x)"
    )
    return (
        corpus.select(
            pick["idx"].alias("cluster"),
            (pick["sc"] + sq).alias("_d2"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.greatest(F.col("_d2"), F.lit(0.0)).cast("decimal(38,12)"))
                .cast("double"),
                6,
            ).alias("inertia"),
        )
    )


def diverse_sample_by_cluster(
    corpus: DataFrame,
    centroids: list,
    n_per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "divs1",
) -> DataFrame:
    """Diversity-preserving downsample: cap each k-means cluster at
    ``n_per_cluster`` members — the standard cure for a corpus dominated
    by one dense region (near-duplicate boilerplate, one hot domain):
    uniform random sampling keeps the duplicates' share; per-cluster
    caps keep COVERAGE of the embedding space instead.

    Assignment is a map-side expression over centroid literals (no
    join); the within-cluster choice is the deterministic md5 reservoir
    (sampling.reservoir_per_key) — so the selected subset is a pure
    function of (centroids, salt, ids): reproducible across runs,
    engines, and partitionings, and growth-consistent as the corpus
    ingests more batches. Adds a `cluster` column to the sampled rows.
    """
    from etl_hero_spark.sampling import reservoir_per_key

    assigned = corpus.withColumn(
        "cluster", nearest_lists_expr(vec_col, centroids, 1, dp=None)[0]
    )
    return reservoir_per_key(
        assigned, "cluster", n=n_per_cluster, id_col=id_col, salt=salt
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of a lexical and a dense list
# ---------------------------------------------------------------------------


def rank_bounded(
    df: DataFrame,
    score_col: str,
    id_col: str,
    out_col: str = "rank",
) -> DataFrame:
    """1-based dense rank by (score DESC, id ASC) over a BOUNDED table
    (a top-n retrieval list) — via a broadcast self-join count instead
    of a partition-less window (the plan-audit posture: a
    SinglePartition window is the habit that bites when someone reuses
    the helper on an unbounded frame; the self-join stays correct and
    merely quadratic in the bounded n).

    NULL scores rank LAST (coalesced to -inf on both join sides —
    without the coalesce the 'better' predicate null-propagates and a
    NULL-score row would silently tie with the true top item). Rows
    are assumed unique on (score, id) — the groupBy(*df.columns)
    re-keying collapses fully-identical rows, so callers feeding
    retrieval lists (unique ids by construction, like bm25/topk
    outputs) are safe; don't reuse on frames with duplicate rows."""
    s_self = F.coalesce(
        F.col(score_col).cast("double"), F.lit(float("-inf"))
    )
    other = df.select(
        F.coalesce(
            F.col(score_col).cast("double"), F.lit(float("-inf"))
        ).alias("_s2"),
        F.col(id_col).alias("_i2"),
    )
    better = (F.col("_s2") > s_self) | (
        (F.col("_s2") == s_self) & (F.col("_i2") < F.col(id_col))
    )
    return (
        df.join(F.broadcast(other), better, "left")
        .groupBy(*df.columns)
        .agg((F.count("_i2") + 1).cast("int").alias(out_col))
    )


def rrf_fuse(
    lexical: DataFrame,
    dense: DataFrame,
    id_col: str = "id",
    k: int = 10,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    lists: fused(d) = sum over lists of 1/(k_rrf + rank_d) — the
    standard hybrid-search combiner (rank-based, so the two lists'
    incomparable score scales never need calibration). Inputs are
    bounded ranked lists carrying (id_col, rank); ids missing from a
    list simply contribute nothing (the standard convention).

    Output: top-``k`` (id, rrf_score, n_lists, lex_rank, dense_rank)
    by (rrf_score DESC, id ASC). Everything downstream of the two
    retrieval ops is bounded-list arithmetic — one union + one groupBy
    over <= 2n rows; the EXPENSIVE part (scoring the corpus) stays in
    the rungs that produced the lists. Python parity + membership
    properties pinned in tests/test_simsearch.py."""
    lex = lexical.select(
        F.col(id_col).alias("_id"),
        F.col("rank").alias("_lr"),
        F.lit(None).cast("int").alias("_dr"),
    )
    den = dense.select(
        F.col(id_col).alias("_id"),
        F.lit(None).cast("int").alias("_lr"),
        F.col("rank").alias("_dr"),
    )
    fused = (
        lex.unionByName(den)
        .groupBy("_id")
        .agg(
            F.round(
                F.sum(
                    F.lit(1.0)
                    / (
                        F.lit(float(k_rrf))
                        + F.coalesce(F.col("_lr"), F.col("_dr")).cast(
                            "double"
                        )
                    )
                ),
                6,
            ).alias("rrf_score"),
            F.count(F.lit(1)).cast("int").alias("n_lists"),
            F.min("_lr").alias("lex_rank"),
            F.min("_dr").alias("dense_rank"),
        )
    )
    return (
        fused.select(
            F.col("_id").alias(id_col),
            "rrf_score",
            "n_lists",
            "lex_rank",
            "dense_rank",
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# scalar-quantized (int8) ANN — the missing rung between brute force
# and PQ: 4x less scan traffic than raw floats at near-exact recall
# ---------------------------------------------------------------------------


def sq8_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale =
    max|x_i| / 127, codes_i = round(x_i / scale) in [-127, 127]. The
    encoded corpus (corpus_id, cv, sq_scale, sq_codes, cnorm) goes
    behind a disk stage boundary so the probe reads codes+scale+norm
    COLUMN-PRUNED — at 100 TB the approximate pass scans ~1/4 of the
    raw float bytes (the faiss SQ8 posture), and the encode expression
    is analyzed/compiled exactly once. Zero vectors take scale 1.0
    (codes all zero — cosine undefined anyway, exact rerank keeps them
    last deterministically)."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        # EMPTY input (an empty append batch): the encode of nothing
        # is a correctly-shaped empty frame, not a crash (pinned in
        # tests/test_simsearch.py — append_*_batch no-op contract)
        return corpus.select(
            F.col(id_col).alias("corpus_id"),
            quantized_vec(vec_col, quantize).alias("cv"),
            F.lit(1.0).alias("sq_scale"),
            F.expr("cast(array() as array<int>)").alias("sq_codes"),
            F.lit(0.0).alias("cnorm"),
        ).filter(F.lit(False))
    dim = int(dim_row["d"])
    # scale derives from the QUANTIZED cv (the values the codes are
    # built from) — deriving it from the raw vector lets rounding push
    # a coordinate above the raw max and a code outside [-127, 127].
    mx = F.expr(
        "greatest("
        + ", ".join(f"abs(cv[{i}])" for i in range(dim))
        + ")"
    )
    scale = F.when(mx > 0, mx / 127.0).otherwise(F.lit(1.0))
    staged = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        quantized_vec(vec_col, quantize).alias("cv"),
    ).select(
        "corpus_id",
        "cv",
        scale.alias("sq_scale"),
    )
    enc = staged.select(
        "corpus_id",
        "cv",
        "sq_scale",
        F.expr(
            "transform(cv, x -> cast(round(x / sq_scale) as int))"
        ).alias("sq_codes"),
        F.round(norm_expr(F.col("cv")), 9).alias("cnorm"),
    )
    return parquet_checkpoint(enc, "sq8_enc")


def topk_cosine_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantize: int | None = 3,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Int8 scalar-quantized ANN top-k with exact rerank. The
    approximate pass scores every corpus row against each query with an
    UNROLLED integer dot product over the RAW sq_codes attribute
    (codes[i] * <query code literal> — whole-stage-codegen'd flat
    arithmetic, never an interpreted zip_with; the _dot_const_sql
    constraints), normalized by the stored scales/norms into an
    approximate cosine; the top k*rerank_factor candidates per query
    rerank with the EXACT brute-force cosine expression, so overlap
    with topk_cosine is bit-identical (pinned in tests — rerank over
    the whole corpus equals brute force exactly).

    ``queries`` is the bounded probe set: its rows collect driver-side
    to become plan literals (the broadcast-constant probe shape every
    unrolled rung here uses). Output: (query_id, corpus_id, score,
    rank), (score DESC, corpus_id ASC)."""
    enc = encoded if encoded is not None else sq8_encode(
        corpus, id_col=id_col, vec_col=vec_col, quantize=quantize
    )
    qrows = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_v")
    ).collect()
    if not qrows:
        raise ValueError("queries is empty")
    per_query = []
    for r in qrows:
        v = [float(x) for x in r["_v"]]
        qmax = max((abs(x) for x in v), default=0.0)
        qs = qmax / 127.0 if qmax > 0 else 1.0
        qc = [int(round(x / qs)) for x in v]
        qn = sum(
            (round(x, quantize) if quantize is not None else x) ** 2
            for x in v
        ) ** 0.5
        if qn == 0:
            # mirror the cnorm>0 corpus-side guard: a zero query would
            # make _approx divide-by-zero (NULL), silently picking
            # arbitrary candidates — fail loudly instead.
            raise ValueError(
                f"topk_cosine_sq8: query {r['_qid']!r} has zero norm — "
                "cosine similarity is undefined for a zero vector"
            )
        int_dot = " + ".join(
            f"cast(sq_codes[{i}] as bigint)*{c}L"
            for i, c in enumerate(qc)
            if c != 0
        ) or "0L"
        approx = (
            f"(sq_scale * cast({qs!r} as double) * cast(({int_dot}) as double))"
            f" / (cnorm * cast({qn!r} as double))"
        )
        per_query.append(
            enc.select(
                F.lit(r["_qid"]).alias("query_id"),
                "corpus_id",
                F.expr(approx).alias("_approx"),
            ).filter(F.col("cnorm") > 0)
        )
    scored = per_query[0]
    for p in per_query[1:]:
        scored = scored.unionByName(p)
    w = W.partitionBy("query_id").orderBy(
        F.desc("_approx"), F.asc("corpus_id")
    )
    cands = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "corpus_id")
    )
    # exact rerank: candidates join back their raw (quantized) vectors
    # — column-pruned second read of the encoded table
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
    )
    rer = (
        cands.join(enc.select("corpus_id", "cv"), "corpus_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("corpus_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def write_sq8_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
) -> None:
    """Persist the SQ8 encoded corpus (corpus_id, cv, sq_scale,
    sq_codes, cnorm) to parquet at ``path`` — the durable form of
    sq8_encode's session-scoped stage boundary, completing the
    persisted-index family (minhash / IVF siblings). ``quantize`` is
    part of the index identity: probes must rerank on the same grid,
    so topk_cosine_sq8 over a read-back index must be called with the
    quantize the index was built with — recorded in the sibling
    {path}_meta sidecar, which append_sq8_batch validates against."""
    sq8_encode(
        corpus, id_col=id_col, vec_col=vec_col, quantize=quantize
    ).write.mode("overwrite").parquet(path)
    write_index_meta(
        corpus.sparkSession, path, "sq8", quantize, flat=True
    )


def read_sq8_index(spark, path: str) -> DataFrame:
    """Read a persisted SQ8 index for topk_cosine_sq8(encoded=...) —
    every query batch then pays only the column-pruned codes scan,
    never the encode."""
    return spark.read.parquet(path)


def write_ivfsq8_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
    centroids: list | None = None,
) -> list:
    """Persist the combined IVF x SQ8 index — coarse lists AND int8
    scalar codes: {path}/centroids (coarse model, quantize recorded)
    and {path}/codes = (corpus_id, cv, sq_scale, sq_codes, cnorm)
    PARTITIONED BY list_id. The third cell of the index matrix
    (IVF-Flat, IVF-PQ, now IVF-SQ8): a probe of p lists scans
    p/n_centroids of the corpus AND reads 4-byte-int codes instead of
    raw floats — the multiplicative reductions composed, with SQ8's
    cheaper (table-free) scoring where PQ needs per-query ADC tables.

    Build is one corpus pass staged in two selects with a disk
    boundary between them: list assignment reads the RAW vector
    attribute (the _dot_const_sql CollapseProject constraint), and the
    scale/codes derive from the MATERIALIZED cv attribute so the
    quantized vector is never re-inlined per extraction.

    Returns the centroid list (also persisted). A pre-trained coarse
    model may be passed via ``centroids`` (the append_*_batch rebuild
    posture)."""
    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.skew import ensure_min_partitions

    cents = centroids if centroids is not None else train_centroids(
        corpus, n_centroids=n_centroids, vec_col=vec_col
    )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [
            (i, [float(v) for v in c], -1 if quantize is None else quantize)
            for i, c in enumerate(cents)
        ],
        "list_id int, centroid array<double>, quantize int",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    staged = parquet_checkpoint(
        ensure_min_partitions(corpus).select(
            F.col(id_col).alias("corpus_id"),
            nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
                "list_id"
            ),
            quantized_vec(vec_col, quantize).alias("cv"),
        ),
        "ivfsq8_staged",
    )
    dim = int(staged.select(F.size("cv").alias("d")).first()["d"])
    mx = F.expr(
        "greatest(" + ", ".join(f"abs(cv[{i}])" for i in range(dim)) + ")"
    )
    scale = F.when(mx > 0, mx / 127.0).otherwise(F.lit(1.0))
    enc = staged.select(
        "corpus_id",
        "list_id",
        "cv",
        scale.alias("sq_scale"),
    ).select(
        "corpus_id",
        "list_id",
        "cv",
        "sq_scale",
        F.expr(
            "transform(cv, x -> cast(round(x / sq_scale) as int))"
        ).alias("sq_codes"),
        F.round(norm_expr(F.col("cv")), 9).alias("cnorm"),
    )
    enc.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/codes"
    )
    write_index_meta(spark, path, "ivfsq8", quantize)
    return cents


def topk_cosine_ivfsq8_indexed(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF-SQ8 index: each query probes its nprobe
    nearest coarse lists — the probed list ids (a tiny driver-side
    set) become a STATIC partition filter, so the codes scan provably
    reads only probed partitions — and scores the pruned codes with
    SQ8's UNROLLED integer dot against its own code literals (no
    per-query ADC table build, the rung's advantage over IVF-PQ for
    small probe batches); the bounded candidate set reranks exactly
    against cv within the probed lists. Full probe (nprobe =
    n_centroids) + full rerank == brute force bit-for-bit (pinned in
    tests/test_simsearch.py).

    The per-query expressions carry query-code literals, so the probe
    set is bounded by contract (the broadcast-constant probe shape of
    every unrolled rung here)."""
    import numpy as np

    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    cents = np.asarray([list(r["centroid"]) for r in cent_rows])
    quantize = cent_rows[0]["quantize"]
    quantize = None if quantize < 0 else quantize
    nprobe = min(nprobe, len(cents))
    qrows = queries.select(
        F.col(query_id_col).alias("_qid"),
        quantized_vec(vec_col, quantize).alias("_qv"),
    ).collect()
    if not qrows:
        raise ValueError("queries is empty")
    codes_all = spark.read.parquet(f"{path}/codes")
    per_query = []
    probed_union: set = set()
    for r in qrows:
        v = np.asarray([float(x) for x in r["_qv"]], dtype=np.float64)
        qn = float(np.sqrt((v * v).sum()))
        if qn == 0:
            raise ValueError(
                f"topk_cosine_ivfsq8: query {r['_qid']!r} has zero "
                "norm — cosine similarity is undefined for a zero "
                "vector"
            )
        # nearest lists by |c|^2 - 2 v.c (same ordering as the build)
        d2 = (cents * cents).sum(axis=1) - 2.0 * (cents @ v)
        lists = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
        probed_union.update(lists)
        qmax = float(np.abs(v).max())
        qs = qmax / 127.0 if qmax > 0 else 1.0
        qc = [int(round(x / qs)) for x in v]
        int_dot = " + ".join(
            f"cast(sq_codes[{i}] as bigint)*{c}L"
            for i, c in enumerate(qc)
            if c != 0
        ) or "0L"
        approx = (
            f"(sq_scale * cast({qs!r} as double) * "
            f"cast(({int_dot}) as double))"
            f" / (cnorm * cast({qn!r} as double))"
        )
        per_query.append(
            codes_all.filter(F.col("list_id").isin(lists))
            .filter(F.col("cnorm") > 0)
            .select(
                F.lit(r["_qid"]).alias("query_id"),
                "corpus_id",
                F.expr(approx).alias("_approx"),
            )
        )
    scored = per_query[0]
    for p in per_query[1:]:
        scored = scored.unionByName(p)
    w = W.partitionBy("query_id").orderBy(
        F.desc("_approx"), F.asc("corpus_id")
    )
    cands = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "corpus_id")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
    )
    rer = (
        cands.join(
            codes_all.filter(
                F.col("list_id").isin(sorted(probed_union))
            ).select("corpus_id", "cv"),
            "corpus_id",
        )
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("corpus_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def write_ivfpq_residual_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
    centroids: list | None = None,
    codebooks: list | None = None,
) -> tuple:
    """The RESIDUAL-encoded IVF-PQ index — the upgrade path
    write_ivfpq_index documents (classical IVF-ADC, Jegou et al.):
    PQ quantizes v - centroid[list] instead of v, so the codebooks
    spend their bits on the (smaller-variance) within-list offsets
    rather than re-describing the coarse structure the list id already
    captures — more recall per bit whenever the corpus clusters.

    Build stages the residual column behind a disk boundary (the
    constraint the plain writer's docstring names): pass 1 assigns
    lists over the RAW vector attribute and materializes
    (corpus_id, list_id, cv, rv = cv - centroid[list]); the codebooks
    train on a bounded rv sample; pass 2 encodes rv — by then a
    materialized scan attribute, so pq_codes_expr's extractions never
    re-inline a computed array. Layout matches write_ivfpq_index
    ({path}/centroids, /codebooks, /codes partitioned by list_id)
    plus the per-row residual origin is implicit in list_id.

    Returns (centroids, codebooks)."""
    import numpy as np

    from etl_hero_spark.checkpoint import parquet_checkpoint
    from etl_hero_spark.skew import ensure_min_partitions

    cents = centroids if centroids is not None else train_centroids(
        corpus, n_centroids=n_centroids, vec_col=vec_col
    )
    spark = corpus.sparkSession
    cents_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in c)
        + ")"
        for c in cents
    ) + ")"
    staged = parquet_checkpoint(
        ensure_min_partitions(corpus).select(
            F.col(id_col).alias("corpus_id"),
            nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
                "list_id"
            ),
            quantized_vec(vec_col, quantize).alias("cv"),
        ).select(
            "corpus_id",
            "list_id",
            "cv",
            # build-once residual: the interpreted per-element lambda is
            # paid exactly one pass, then rv is a scan attribute
            F.expr(
                f"zip_with(cv, element_at({cents_sql}, list_id + 1), "
                "(a, b) -> a - b)"
            ).alias("rv"),
        ),
        "ivfpq_res_staged",
    )
    if codebooks is not None:
        books = codebooks
    else:
        rv_rows = staged.select("rv").limit(4096).collect()
        books = _train_books_np(
            np.asarray([r["rv"] for r in rv_rows], dtype=np.float64),
            m,
            k_sub,
            iters=10,
            seed=42,
        )
    spark.createDataFrame(
        [
            (i, [float(v) for v in c], -1 if quantize is None else quantize)
            for i, c in enumerate(cents)
        ],
        "list_id int, centroid array<double>, quantize int",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(v) for v in cent])
            for j, book in enumerate(books)
            for c, cent in enumerate(book)
        ],
        "subspace int, code int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    enc = staged.select(
        "corpus_id",
        "list_id",
        # rv is a materialized attribute here: no re-inline per extraction
        pq_codes_expr("rv", books, dp=None).alias("codes"),
        F.round(norm_expr(F.col("cv")), 9).alias("cnorm"),
        "cv",
    )
    enc.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/codes"
    )
    write_index_meta(spark, path, "ivfpq_residual", quantize)
    return cents, books


def topk_cosine_ivfpq_residual_indexed(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 2,
    rerank_factor: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a residual IVF-PQ index: approximate
    dot(q, x) = dot(q, centroid[list]) + sum_j tabs[j][codes[j]],
    where the ADC tables are built from the RESIDUAL codebooks and the
    per-(query, list) coarse dot rides the broadcast probes frame as a
    scalar — one extra double per probe, no extra scan work over plain
    IVF-PQ. Static partition pruning, exact rerank, and
    full-probe + full-rerank == brute force exactly, same as the plain
    form (pinned in tests/test_simsearch.py)."""
    import numpy as np

    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    cents = np.asarray([list(r["centroid"]) for r in cent_rows])
    quantize = cent_rows[0]["quantize"]
    quantize = None if quantize < 0 else quantize
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(r["subspace"] for r in book_rows)
    books: list[list[list[float]]] = [[] for _ in range(mm)]
    for r in sorted(book_rows, key=lambda r: (r["subspace"], r["code"])):
        books[r["subspace"]].append(list(r["centroid"]))
    nprobe = min(nprobe, len(cents))
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        quantized_vec(vec_col, quantize).alias("qv"),
    ).collect()
    if not q_rows:
        raise ValueError("queries is empty")
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    sub = len(books[0][0])
    probe_data, qv_data = [], []
    for r in q_rows:
        v = np.asarray(r["qv"], dtype=np.float64)
        scores = (cents * cents).sum(axis=1) - 2.0 * (cents @ v)
        lists = [int(i) for i in np.argsort(scores, kind="stable")[:nprobe]]
        tabs = [
            [
                float(np.dot(v[j * sub : (j + 1) * sub], np.asarray(c)))
                for c in books[j]
            ]
            for j in range(mm)
        ]
        for li in lists:
            probe_data.append(
                (r["query_id"], li, tabs, float(cents[li] @ v))
            )
        qv_data.append((r["query_id"], [float(x) for x in r["qv"]]))
    probes = spark.createDataFrame(
        probe_data,
        f"query_id {qid_type}, list_id int, tabs array<array<double>>, "
        "qdotc double",
    )
    q = spark.createDataFrame(
        qv_data, f"query_id {qid_type}, qv array<double>"
    )
    probed_lists = sorted({p[1] for p in probe_data})
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("list_id").isin(probed_lists)
    )
    scored = (
        codes.drop("cv")
        .join(F.broadcast(probes), "list_id")
        .withColumn(
            "adc",
            F.round(
                (
                    F.col("qdotc")
                    + pq_adc_score_expr("codes", "tabs", mm)
                )
                / F.col("cnorm"),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("corpus_id"))
    cand = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "corpus_id")
    )
    rer = (
        codes.select("corpus_id", "cv")
        .join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn(
            "score", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6)
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("corpus_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# incremental index maintenance — append a new batch under the FROZEN
# models (faiss's add-after-train posture; reference: ClaudioCurzi/
# etl-hero has no index surface — this is engine-side scale machinery)
# ---------------------------------------------------------------------------


def _meta_path(path: str, flat: bool = False) -> str:
    """Sidecar location: {path}/meta for directory-layout indexes;
    a SIBLING {path}_meta for the flat SQ8 layout, whose data files
    live directly at ``path`` (a subdirectory there would corrupt the
    plain parquet read)."""
    return f"{path.rstrip('/')}_meta" if flat else f"{path}/meta"


def write_index_meta(
    spark,
    path: str,
    kind: str,
    quantize: int | None,
    adc_dp: int | None = None,
    flat: bool = False,
) -> None:
    """Persist the ENCODE-TIME index identity the table layouts do not
    record (ADVICE r8): SQ8's rerank grid ``quantize`` and IVF-PQ's
    ADC rounding ``adc_dp`` were docstring contracts only — a
    mismatched append silently mixed incomparably-encoded rows into
    the index. One tiny one-row parquet; append_*_batch validates
    against it and fails loudly on mismatch."""
    spark.createDataFrame(
        [
            (
                kind,
                -1 if quantize is None else int(quantize),
                -1 if adc_dp is None else int(adc_dp),
            )
        ],
        "kind string, quantize int, adc_dp int",
    ).write.mode("overwrite").parquet(_meta_path(path, flat))


def read_index_meta(spark, path: str, flat: bool = False) -> dict | None:
    """The sidecar written by write_index_meta, or None for an index
    persisted before the sidecar existed (validation then falls back
    to the original docstring contract)."""
    import os

    mp = _meta_path(path, flat)
    local = mp.removeprefix("file:")
    if "://" not in mp and not os.path.exists(local):
        return None
    try:
        r = spark.read.parquet(mp).first()
    except Exception as e:
        # Only a genuinely-missing sidecar means "pre-sidecar index".
        # A corrupt or partially-written meta must NOT silently
        # disable the append identity validation it exists to provide
        # (ADVICE r9) — propagate everything except path-not-found.
        name = type(e).__name__
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or (
            name == "AnalysisException" and "Path does not exist" in msg
        ):
            return None
        raise
    if r is None:
        return None
    return {
        "kind": r["kind"],
        "quantize": None if r["quantize"] < 0 else int(r["quantize"]),
        "adc_dp": None if r["adc_dp"] < 0 else int(r["adc_dp"]),
    }


def _check_index_kind(meta: dict | None, expected: str, fn: str) -> None:
    if meta is not None and meta["kind"] != expected:
        raise ValueError(
            f"{fn}: index at this path is kind={meta['kind']!r}, not "
            f"{expected!r} — appending would mix incompatible layouts"
        )


def read_index_model(spark, path: str, with_books: bool = False):
    """Read a persisted index's bounded model artifacts back ONCE:
    (centroids, codebooks_or_None, quantize, meta_or_None). The model
    is the index's IDENTITY — appended batches must encode under
    exactly these values or probe scores stop being comparable across
    batches. A steady-state append loop should call this once and
    thread the tuple through append_*_batch(model=...) instead of
    re-collecting the centroids per batch (VERDICT r8 #6)."""
    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    cents = [list(r["centroid"]) for r in cent_rows]
    quantize = cent_rows[0]["quantize"]
    quantize = None if quantize < 0 else quantize
    books = None
    if with_books:
        book_rows = spark.read.parquet(f"{path}/codebooks").collect()
        mm = 1 + max(r["subspace"] for r in book_rows)
        books = [[] for _ in range(mm)]
        for r in sorted(
            book_rows, key=lambda r: (r["subspace"], r["code"])
        ):
            books[r["subspace"]].append(list(r["centroid"]))
    return cents, books, quantize, read_index_meta(spark, path)


def append_ivf_batch(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: tuple | None = None,
    dedup_ids: bool = False,
) -> None:
    """Append a new vector batch to a persisted IVF index
    (write_ivf_index): assign the batch against the EXISTING stored
    centroids (and the stored quantize — both read back, never
    re-trained) and append its rows into the list_id-partitioned
    assignment table. The corpus is never rescanned; the batch pays
    one assignment pass — the minhash/span incremental posture for the
    ANN family. Caller contract: ids are new (the index does not
    dedup), and the coarse model ages as the corpus drifts — retrain
    and rebuild periodically, as faiss does.

    ``model`` takes a pre-read read_index_model(spark, path) tuple so
    a steady-state append loop reads the bounded model ONCE instead of
    re-collecting centroids per batch (VERDICT r8 #6).

    ``dedup_ids=True`` makes the append IDEMPOTENT on ``id_col``
    (VERDICT r9 #2): the batch is anti-joined against the corpus_ids
    already present in the index before writing, so re-running the
    same append — a Structured Streaming foreachBatch retry under the
    at-least-once contract, INCLUDING a retry after a mid-write
    failure left partial part-files — lands each vector exactly once.
    The guard reads only the pruned corpus_id column of the existing
    lists (no vectors), and it heals partial writes, which a
    batch-id-keyed skip-marker cannot (the marker pattern skips the
    whole batch when any part-file landed). Default False preserves
    the original caller contract (ids are new) at zero read cost.

    Probe-equality to an index rebuilt over the union under the same
    frozen model is pinned in tests/test_simsearch.py."""
    spark = batch.sparkSession
    cents, _books, quantize, meta = (
        model if model is not None else read_index_model(spark, path)
    )
    _check_index_kind(meta, "ivf", "append_ivf_batch")
    if dedup_ids:
        existing = spark.read.parquet(f"{path}/lists").select(
            F.col("corpus_id").alias(id_col)
        )
        batch = batch.join(existing, id_col, "left_anti")
    assignments = ensure_min_partitions(batch).select(
        F.col(id_col).alias("corpus_id"),
        quantized_vec(vec_col, quantize).alias("cv"),
        nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
            "list_id"
        ),
    )
    assignments.write.mode("append").partitionBy("list_id").parquet(
        f"{path}/lists"
    )


def append_sq8_batch(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 3,
    meta: dict | None = None,
) -> None:
    """Append a new vector batch to a persisted SQ8 index
    (write_sq8_index). SQ8's scale is PER-ROW, so the encode carries
    no corpus-level model at all — the append is exactly the writer's
    encode over the batch; ``quantize`` must match the build. The
    flat layout does not record it, so the writer persists a sibling
    {path}_meta sidecar and this append VALIDATES against it (ADVICE
    r8) — a mismatch raises instead of silently mixing rows reranked
    on a different grid. A pre-sidecar index (no meta) falls back to
    the docstring contract. ``meta`` takes a pre-read
    read_index_meta(spark, path, flat=True) dict for steady-state
    append loops."""
    if meta is None:
        meta = read_index_meta(batch.sparkSession, path, flat=True)
    _check_index_kind(meta, "sq8", "append_sq8_batch")
    if meta is not None and meta["quantize"] != quantize:
        raise ValueError(
            "append_sq8_batch: quantize mismatch — index was built "
            f"with quantize={meta['quantize']!r}, append called with "
            f"{quantize!r}; appended rows would rerank on a different "
            "grid than the existing codes"
        )
    sq8_encode(
        batch, id_col=id_col, vec_col=vec_col, quantize=quantize
    ).write.mode("append").parquet(path)


def append_ivfsq8_batch(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: tuple | None = None,
) -> None:
    """Append a new vector batch to a persisted IVF-SQ8 index
    (write_ivfsq8_index): coarse-assign against the stored centroids,
    then derive the per-row scale/int8 codes from the materialized cv
    exactly as the builder does (same two-select disk boundary), and
    append into the list_id-partitioned codes table. ``model`` takes
    a pre-read read_index_model tuple (VERDICT r8 #6)."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    spark = batch.sparkSession
    cents, _books, quantize, meta = (
        model if model is not None else read_index_model(spark, path)
    )
    _check_index_kind(meta, "ivfsq8", "append_ivfsq8_batch")
    staged = parquet_checkpoint(
        ensure_min_partitions(batch).select(
            F.col(id_col).alias("corpus_id"),
            nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
                "list_id"
            ),
            quantized_vec(vec_col, quantize).alias("cv"),
        ),
        "ivfsq8_append",
    )
    dim_row = staged.select(F.size("cv").alias("d")).first()
    if dim_row is None:
        return  # empty batch: nothing to append (no-op contract)
    dim = int(dim_row["d"])
    mx = F.expr(
        "greatest(" + ", ".join(f"abs(cv[{i}])" for i in range(dim)) + ")"
    )
    scale = F.when(mx > 0, mx / 127.0).otherwise(F.lit(1.0))
    enc = staged.select(
        "corpus_id", "list_id", "cv", scale.alias("sq_scale")
    ).select(
        "corpus_id",
        "list_id",
        "cv",
        "sq_scale",
        F.expr(
            "transform(cv, x -> cast(round(x / sq_scale) as int))"
        ).alias("sq_codes"),
        F.round(norm_expr(F.col("cv")), 9).alias("cnorm"),
    )
    enc.write.mode("append").partitionBy("list_id").parquet(
        f"{path}/codes"
    )


def append_ivfpq_batch(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    adc_dp: int | None = None,
    model: tuple | None = None,
) -> None:
    """Append a new vector batch to a persisted IVF-PQ index
    (write_ivfpq_index): encode the batch against the EXISTING stored
    centroids AND codebooks, append into the partitioned codes table.
    ``adc_dp`` must match the build (like quantize for SQ8 it is
    encode-time identity the tables do not record) — the writer now
    persists it in the {path}/meta sidecar and this append VALIDATES
    against it (ADVICE r8); a pre-sidecar index falls back to the
    docstring contract. ``model`` takes a pre-read
    read_index_model(spark, path, with_books=True) tuple (VERDICT
    r8 #6)."""
    spark = batch.sparkSession
    cents, books, quantize, meta = (
        model
        if model is not None
        else read_index_model(spark, path, with_books=True)
    )
    _check_index_kind(meta, "ivfpq", "append_ivfpq_batch")
    if meta is not None and meta["adc_dp"] != adc_dp:
        raise ValueError(
            "append_ivfpq_batch: adc_dp mismatch — index was encoded "
            f"with adc_dp={meta['adc_dp']!r}, append called with "
            f"{adc_dp!r}; appended codes would be incomparable with "
            "the existing ADC tables"
        )
    enc = ensure_min_partitions(batch).select(
        F.col(id_col).alias("corpus_id"),
        nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
            "list_id"
        ),
        pq_codes_expr(vec_col, books, dp=adc_dp).alias("codes"),
        F.round(norm_expr(quantized_vec(vec_col, quantize)), 9).alias(
            "cnorm"
        ),
        quantized_vec(vec_col, quantize).alias("cv"),
    )
    enc.write.mode("append").partitionBy("list_id").parquet(
        f"{path}/codes"
    )


def append_ivfpq_residual_batch(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: tuple | None = None,
) -> None:
    """Append a new vector batch to a persisted RESIDUAL IVF-PQ index
    (write_ivfpq_residual_index): coarse-assign against the stored
    centroids, stage the residual v - centroid[list] behind a disk
    boundary (the builder's CollapseProject constraint applies to the
    batch too), PQ-encode the residual with the stored codebooks,
    append. ``model`` takes a pre-read read_index_model tuple
    (VERDICT r8 #6)."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    spark = batch.sparkSession
    cents, books, quantize, meta = (
        model
        if model is not None
        else read_index_model(spark, path, with_books=True)
    )
    _check_index_kind(meta, "ivfpq_residual", "append_ivfpq_residual_batch")
    cents_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in c)
        + ")"
        for c in cents
    ) + ")"
    staged = parquet_checkpoint(
        ensure_min_partitions(batch).select(
            F.col(id_col).alias("corpus_id"),
            nearest_lists_expr(vec_col, cents, 1, dp=quantize)[0].alias(
                "list_id"
            ),
            quantized_vec(vec_col, quantize).alias("cv"),
        ).select(
            "corpus_id",
            "list_id",
            "cv",
            F.expr(
                f"zip_with(cv, element_at({cents_sql}, list_id + 1), "
                "(a, b) -> a - b)"
            ).alias("rv"),
        ),
        "ivfpq_res_append",
    )
    enc = staged.select(
        "corpus_id",
        "list_id",
        pq_codes_expr("rv", books, dp=None).alias("codes"),
        F.round(norm_expr(F.col("cv")), 9).alias("cnorm"),
        "cv",
    )
    enc.write.mode("append").partitionBy("list_id").parquet(
        f"{path}/codes"
    )
