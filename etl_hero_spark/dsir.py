"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pretraining documents whose hashed-n-gram
distribution looks like a TARGET domain, by importance weighting the
raw pool and resampling without replacement.

The recipe, re-expressed as Spark plans:

1. **Features**: every document is a bag of hashed unigram+bigram
   features over ``n_buckets`` buckets (the paper's hashed n-gram
   parameterization — bounded model state regardless of vocabulary).
   Hashing uses the md5-prefix convention of features.hash_features,
   so any engine/language reproduces the bucket ids.
2. **Fit**: bucket unigram counts under the target subset (p) and the
   full raw pool (q), add-alpha smoothed — ONE conditional groupBy to
   a bounded ``n_buckets``-row table.
3. **Weight**: log w(x) = sum_b c_b(x) * (ln p_b - ln q_b) — per-doc
   bucket counts joined against the BROADCAST log-ratio table. The
   per-bucket log-ratio is rounded to 12dp and the per-doc sum
   accumulates in DECIMAL(38,18), so weights are bit-stable under any
   partitioning (the engine-exactness posture of registry.py).
4. **Resample**: Gumbel-top-k over key = log w / temperature + G,
   G = -ln(-ln(u)) with u a deterministic md5 uniform — equivalent to
   sampling without replacement with probability proportional to
   exp(log w / temperature) (Gumbel-max trick), with no RNG state and
   full repartition/retry invariance.

The reference (a 411-line pandas cleaning app) has nothing in this
family; this is part of the 100 TB training-data mandate. Not a port
of the DSIR repo — only the published method is used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_hero_spark.textops import tokens_expr

_DEC = "decimal(38,18)"


def _hashed_feature_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """One row per (doc, feature occurrence) with its hash bucket —
    unigrams plus adjacent bigrams, lowercased whitespace tokens (the
    textops convention). Relational adjacency (posexplode + lead), no
    interpreted array lambdas; md5-prefix bucket ids reproducible
    outside the JVM."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_expr(text_col)).alias("_pos", "_tok"),
    ).withColumn("_tok", F.lower(F.col("_tok")))
    w = W.partitionBy("_id").orderBy("_pos")
    with_next = toks.withColumn("_next", F.lead("_tok").over(w))
    uni = with_next.select("_id", F.col("_tok").alias("_feat"))
    bi = with_next.filter(F.col("_next").isNotNull()).select(
        "_id",
        F.concat(F.col("_tok"), F.lit(" "), F.col("_next")).alias("_feat"),
    )
    feats = uni.unionByName(bi)
    bucket = (
        F.conv(F.substring(F.md5(F.col("_feat")), 1, 14), 16, 10).cast(
            "bigint"
        )
        % n_buckets
    ).cast("int")
    return feats.select("_id", bucket.alias("_bucket"))


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    scale: int = 6,
) -> DataFrame:
    """Importance log-weights for every document: log w = log
    p_target(x) - log p_raw(x) under hashed-n-gram bag models. Rows
    where ``target_pred`` is true define the target domain; the raw
    model is the WHOLE pool (target included — the paper's q is the
    source distribution the pool was drawn from).

    Output: input columns + is_target, n_features, log_weight
    (documents with no features weight 0.0 — no evidence either way).

    Plan: one corpus pass builds the feature stream; one groupBy fits
    both models (conditional agg); the bounded log-ratio table joins
    back by BROADCAST; per-doc sums are decimal-exact. Fit tables are
    ``n_buckets`` rows — model state, never corpus-sized.
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    base = docs.withColumn("_is_t", target_pred.cast("boolean"))
    fb = parquet_checkpoint(
        _hashed_feature_buckets(base, id_col, text_col, n_buckets).join(
            base.select(F.col(id_col).alias("_id"), F.col("_is_t")),
            "_id",
        ),
        "dsir-feats",
    )
    counts = fb.groupBy("_bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_t"),
        F.count(F.lit(1)).alias("_r"),
    )
    totals = counts.agg(
        F.sum("_t").cast("double").alias("_tt"),
        F.sum("_r").cast("double").alias("_tr"),
    )
    a = float(alpha)
    b = float(n_buckets)
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "_bucket",
        # rounded to a fixed 12dp grid so the per-doc DECIMAL sum below
        # is exact over deterministic terms (bit-stable weights under
        # any partitioning)
        F.round(
            F.log((F.col("_t") + a) / (F.col("_tt") + a * b))
            - F.log((F.col("_r") + a) / (F.col("_tr") + a * b)),
            12,
        ).alias("_lr"),
    )
    per_doc = (
        fb.groupBy("_id", "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(F.broadcast(ratio), "_bucket")
        .groupBy("_id")
        .agg(
            F.sum("_c").cast("bigint").alias("n_features"),
            F.sum(
                (F.col("_c") * F.col("_lr")).cast(_DEC)
            ).alias("_lw"),
        )
    )
    return (
        base.join(
            per_doc.withColumnRenamed("_id", id_col), id_col, "left"
        )
        .withColumn(
            "log_weight",
            F.round(
                F.coalesce(F.col("_lw").cast("double"), F.lit(0.0)), scale
            ),
        )
        .withColumn(
            "n_features", F.coalesce(F.col("n_features"), F.lit(0))
        )
        .withColumnRenamed("_is_t", "is_target")
        .drop("_lw")
    )


def dsir_resample(
    weighted: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    logw_col: str = "log_weight",
    temperature: float = 1.0,
) -> DataFrame:
    """Select ``budget`` documents WITHOUT replacement with probability
    proportional to exp(log_weight / temperature) — the Gumbel-top-k
    equivalence, with deterministic md5 uniforms instead of an RNG
    (repartition/retry-invariant, like every sampler here). Higher
    temperature flattens toward uniform; temperature -> 0 approaches
    deterministic top-k by weight.

    The top-k itself is a distributed TakeOrdered (per-partition
    heads, bounded ``budget`` rows to the driver-side merge) — never a
    global sort materialization.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    t = float(temperature)
    if t <= 0:
        raise ValueError("temperature must be positive")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dsir:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(float((1 << 52) + 2))
    gumbel = -F.log(-F.log(u))
    key = F.col(logw_col) / t + gumbel
    return (
        weighted.withColumn("_gk", key)
        .orderBy(F.desc("_gk"), F.asc(id_col))
        .limit(int(budget))
        .drop("_gk")
    )


def dsir_kl_report(
    docs: DataFrame,
    target_pred: Column,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    temperature: float = 1.0,
    scale: int = 6,
) -> DataFrame:
    """Selection-quality evaluation for DSIR (the paper's measure): did
    resampling move the pool's hashed-n-gram distribution TOWARD the
    target domain? Reports

        kl_target_raw      = KL(p_target || q_raw_pool)
        kl_target_selected = KL(p_target || q_selected)
        kl_reduction       = kl_target_raw - kl_target_selected

    over the same add-alpha-smoothed bucket models the fit uses —
    positive reduction means the selected subset is closer to the
    target than the pool it came from (the ANN-recall posture: measure
    the quality claim, never assume it).

    Plan: ONE feature pass (checkpointed) feeds both the weight fit and
    the evaluation counts; the selected-id set is budget-bounded and
    joins back by BROADCAST; all three distributions come from one
    conditional groupBy to an ``n_buckets``-row table, and the two
    KL sums fold 12dp-rounded per-bucket terms in DECIMAL(38,18) —
    deterministic under any partitioning (the k-term double-sum
    gotcha). One output row. Python-reference parity pinned in
    tests/test_dsir.py.
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    base = docs.withColumn("_is_t", target_pred.cast("boolean"))
    fb = parquet_checkpoint(
        _hashed_feature_buckets(base, id_col, text_col, n_buckets).join(
            base.select(F.col(id_col).alias("_id"), F.col("_is_t")),
            "_id",
        ),
        "dsir-kl-feats",
    )
    # fit log-weights from the SAME feature stream (inline rather than
    # via dsir_log_weights so the corpus is tokenized exactly once)
    counts = fb.groupBy("_bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_t"),
        F.count(F.lit(1)).alias("_r"),
    )
    totals = counts.agg(
        F.sum("_t").cast("double").alias("_tt"),
        F.sum("_r").cast("double").alias("_tr"),
    )
    a, b = float(alpha), float(n_buckets)
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "_bucket",
        F.round(
            F.log((F.col("_t") + a) / (F.col("_tt") + a * b))
            - F.log((F.col("_r") + a) / (F.col("_tr") + a * b)),
            12,
        ).alias("_lr"),
    )
    per_doc = (
        fb.groupBy("_id", "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(F.broadcast(ratio), "_bucket")
        .groupBy("_id")
        .agg(
            F.round(
                F.sum((F.col("_c") * F.col("_lr")).cast(_DEC)).cast(
                    "double"
                ),
                scale,
            ).alias("log_weight")
        )
    )
    # zero-feature docs enter the resample with weight 0.0, matching
    # dsir_log_weights ("no evidence either way")
    weights = (
        base.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            "_id",
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias(
                "log_weight"
            ),
        )
    )
    chosen = dsir_resample(
        weights.withColumnRenamed("_id", id_col),
        budget,
        id_col=id_col,
        temperature=temperature,
    ).select(F.col(id_col).alias("_id"), F.lit(1).alias("_sel"))
    # evaluation counts: target / raw / selected occupancy per bucket
    tri = (
        fb.join(F.broadcast(chosen), "_id", "left")
        .groupBy("_bucket")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_t"),
            F.count(F.lit(1)).alias("_r"),
            F.sum(F.when(F.col("_sel").isNotNull(), 1).otherwise(0)).alias(
                "_s"
            ),
        )
    )
    tri_tot = tri.agg(
        F.sum("_t").cast("double").alias("_tt"),
        F.sum("_r").cast("double").alias("_tr"),
        F.sum("_s").cast("double").alias("_ts"),
        F.count(F.lit(1)).alias("_nb"),
    )
    j = tri.crossJoin(F.broadcast(tri_tot))
    p = (F.col("_t") + a) / (F.col("_tt") + a * b)
    qr = (F.col("_r") + a) / (F.col("_tr") + a * b)
    qs = (F.col("_s") + a) / (F.col("_ts") + a * b)
    term_raw = F.round(p * (F.log(p) - F.log(qr)), 12).cast(_DEC)
    term_sel = F.round(p * (F.log(p) - F.log(qs)), 12).cast(_DEC)
    # buckets with no occurrences anywhere still carry smoothed mass
    # p0 = a/(tt+ab); their per-bucket term is a closed form of the
    # totals, added once x (n_buckets - occupied) — the KL is over the
    # FULL model support, not just occupied buckets
    p0 = F.lit(a) / (F.col("_tt") + a * b)
    qr0 = F.lit(a) / (F.col("_tr") + a * b)
    qs0 = F.lit(a) / (F.col("_ts") + a * b)
    missing = (F.lit(b) - F.col("_nb")).cast("double")
    out = j.agg(
        F.max("_nb").cast("bigint").alias("n_buckets_occupied"),
        F.round(
            F.sum(term_raw).cast("double")
            + F.max(
                missing * F.round(p0 * (F.log(p0) - F.log(qr0)), 12)
            ),
            scale,
        ).alias("kl_target_raw"),
        F.round(
            F.sum(term_sel).cast("double")
            + F.max(
                missing * F.round(p0 * (F.log(p0) - F.log(qs0)), 12)
            ),
            scale,
        ).alias("kl_target_selected"),
    )
    return out.select(
        "n_buckets_occupied",
        "kl_target_raw",
        "kl_target_selected",
        F.round(
            F.col("kl_target_raw") - F.col("kl_target_selected"), scale
        ).alias("kl_reduction"),
    )
