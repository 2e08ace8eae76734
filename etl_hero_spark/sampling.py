"""Stratified sampling for training-data pipelines.

Two forms:
* exact-n per stratum, DETERMINISTIC — rank rows inside each stratum by
  a content hash (md5 of the id) and keep the first n. Same rows on any
  cluster, any partitioning, any engine (oracle-checked); this is the
  form for reproducible dataset curation.
* fractional via df.sampleBy — Bernoulli per stratum, seeded; cheap and
  single-pass but engine-specific RNG (rows-only checked).

Scale: the exact form is one window over the strata keys — uniform
strata hash-partition cleanly; a hot stratum is bounded by n output rows
but its sort input is the stratum size (use the fractional form first if
a stratum is pathologically large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str] | str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Keep exactly min(n, |stratum|) rows per stratum, chosen by md5
    hash order of the id — unbiased w.r.t. any meaningful ordering,
    reproducible everywhere. Ties impossible (md5 of distinct ids)."""
    strata_cols = (
        [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    )
    w = W.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def stratified_sample_fraction(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy): single pass, no
    shuffle, approximate counts. Engine-specific RNG — reproducible
    within Spark for a fixed seed, not across engines."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    salt: str = "ws",
    modulus: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with acceptance
    probability = clamp(weight, 0, 1): keep a row iff
    pmod(xxhash64(salt, id), M) < weight * M.

    The standard quality-weighted downsampling step of a curation
    pipeline (keep high-quality documents with high probability, low-
    quality with low), made REPRODUCIBLE: no RNG state — the decision is
    a pure function of (salt, id, weight), so re-runs, retried tasks,
    and incremental batches all agree, and flipping the salt draws an
    independent sample. A codegen'd filter over a linear scan: no
    shuffle, no sort, works identically under Structured Streaming.

    Weight granularity is 1/modulus (default 1e-6).
    """
    u = F.pmod(
        F.xxhash64(F.lit(salt), F.col(id_col).cast("string")),
        F.lit(modulus),
    )
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(weight_col)))
    return df.filter(u < p * F.lit(float(modulus)))


def mix_sources_budget(
    df: DataFrame,
    weights: dict,
    total_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic data-mixing: select documents so each source
    contributes ~weights[source] * total_tokens tokens to a training
    mixture (the per-domain reweighting step of every large pretraining
    corpus recipe). Sources absent from `weights` are dropped.

    Within a source, docs are taken in md5(id) order — a deterministic
    pseudo-random shuffle, so the selected prefix is an unbiased sample
    of the source AND re-runs/backfills select the same docs on any
    engine. A doc is selected iff the EXCLUSIVE per-source running
    token total before it is under the source's budget: the straddling
    doc is kept (packing semantics), so any source with data and
    positive weight contributes at least one doc.

    Scale: the running total is the two-phase distributed scan of
    pack_token_shards, keyed per (source, md5-range-bucket): the local
    window partitions on (source, bucket) — uniform md5 bucketing
    spreads a hot source over n_buckets tasks — and per-(source,bucket)
    offsets come from a broadcast self-join over the tiny
    n_sources x n_buckets totals table. No per-source single-task
    window, no global window, two uniform shuffles.

    A positive weight's budget is clamped to >= 1 token so the
    at-least-one-doc guarantee holds even when round(w * total) is 0;
    NULL token counts count as 0 (the doc is selectable, not silently
    dropped by NULL arithmetic).
    """
    budgets = df.sparkSession.createDataFrame(
        [
            (s, max(1, int(round(w * total_tokens))) if w > 0 else 0)
            for s, w in sorted(weights.items())
        ],
        f"{source_col} string, _budget bigint",
    )
    h = F.md5(F.col(id_col).cast("string"))
    b = (
        df.join(F.broadcast(budgets), source_col)
        .withColumn("_h", h)
        .withColumn(
            "_bucket",
            F.floor(
                F.conv(F.substring("_h", 1, 4), 16, 10).cast("long")
                * n_buckets
                / 65536
            ),
        )
    )
    local_w = W.partitionBy(source_col, "_bucket").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    tok0 = F.coalesce(F.col(token_col), F.lit(0))
    b = b.withColumn("_local_incl", F.sum(tok0).over(local_w))
    totals = b.groupBy(source_col, "_bucket").agg(
        F.sum(tok0).alias("_tot")
    )
    earlier = totals.select(
        F.col(source_col).alias("_es"),
        F.col("_bucket").alias("_eb"),
        F.col("_tot").alias("_et"),
    )
    offsets = (
        totals.join(
            F.broadcast(earlier),
            (F.col("_es") == F.col(source_col))
            & (F.col("_eb") < F.col("_bucket")),
            "left",
        )
        .groupBy(source_col, "_bucket")
        .agg(F.coalesce(F.sum("_et"), F.lit(0)).alias("_offset"))
    )
    excl = F.col("_local_incl") - tok0 + F.col("_offset")
    return (
        b.join(F.broadcast(offsets), [source_col, "_bucket"])
        .withColumn("_excl", excl)
        .filter(F.col("_excl") < F.col("_budget"))
        .drop("_h", "_bucket", "_local_incl", "_offset", "_budget", "_excl")
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> dict:
    """Per-source mixture weights w_i = t_i**alpha / sum_j t_j**alpha
    from the observed per-source token totals t_i — the temperature-
    scaled sampling rule of multilingual/multi-domain pretraining
    recipes (alpha=1 reproduces natural proportions, alpha->0 uniform;
    alpha~0.3-0.7 upsamples small sources without flattening entirely).

    One tiny aggregate (n_sources rows) collected to the driver — the
    weights are pipeline CONFIG, like IVF centroids: computing them is
    an O(sources) action, applying them stays fully distributed.
    Sources with a zero/NULL total get weight 0.
    """
    totals = (
        df.groupBy(source_col)
        .agg(F.sum(F.coalesce(F.col(token_col), F.lit(0))).alias("_t"))
        .collect()
    )
    scaled = {
        r[source_col]: (float(r["_t"]) ** alpha if r["_t"] else 0.0)
        for r in totals
    }
    z = sum(scaled.values())
    if z == 0:
        return {s: 0.0 for s in scaled}
    return {s: v / z for s, v in sorted(scaled.items())}


def mix_sources_temperature(
    df: DataFrame,
    alpha: float,
    total_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 32,
) -> DataFrame:
    """Temperature-scaled data mixing: derive the per-source weights
    from the corpus itself (``temperature_weights``) and select with the
    deterministic budgeted mix (``mix_sources_budget``). The one-call
    form of the standard "flatten the source distribution to
    temperature alpha" curation step; same determinism and two-shuffle
    scale shape as mix_sources_budget."""
    w = temperature_weights(df, alpha, source_col, token_col)
    return mix_sources_budget(
        df,
        w,
        total_tokens,
        source_col=source_col,
        id_col=id_col,
        token_col=token_col,
        n_buckets=n_buckets,
    )


def with_split(
    df: DataFrame,
    id_col: str,
    fractions: dict | None = None,
    salt: str = "split",
    modulus: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a `split` column
    chosen by hashing (salt, id) into [0,1) and cutting at the
    cumulative fraction boundaries (fractions must sum to 1).

    No RNG state: the assignment is a pure function of (salt, id), so
    re-runs, retried tasks, incremental batches, and different
    partitionings all agree — and a document NEVER migrates between
    splits as the corpus grows (the leakage guarantee that matters for
    eval integrity). Changing the salt draws an independent split.
    A codegen'd when-chain over a linear scan: no shuffle, works
    identically under Structured Streaming. Granularity 1/modulus.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = F.pmod(
        F.xxhash64(F.lit(salt), F.col(id_col).cast("string")), F.lit(modulus)
    ) / F.lit(float(modulus))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def reservoir_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    salt: str = "rsv1",
) -> DataFrame:
    """Deterministic fixed-size sample per key: each key keeps the n
    rows whose md5(salt || id) sorts lowest — the distributed stand-in
    for per-key reservoir sampling. Hash-ordering makes it (a)
    deterministic across runs/engines (md5 is everywhere; no RNG state),
    (b) CONSISTENT under growth: a row's inclusion can only be displaced
    by a lower-hash newcomer, never reshuffled wholesale, and (c)
    mergeable — the union of two shards' reservoirs re-ranked is the
    corpus reservoir. One (key) window shuffle; ties impossible while
    md5 is collision-free on distinct ids."""
    from pyspark.sql import Window as W

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = W.partitionBy(key_col).orderBy(h.asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )


def balance_classes(
    df: DataFrame,
    class_col: str,
    id_col: str,
    target: str = "min",
) -> DataFrame:
    """Class rebalancing by deterministic downsampling: every class is
    cut to the same count — the minority class size (``target='min'``,
    the no-information-invented default) or the median class size
    (``target='median'``; classes below it keep everything — this mode
    downsamples the heavy head without pretending to upsample). Rows
    within a class are kept in md5(id) hash order — unbiased w.r.t.
    any meaningful ordering, reproducible on any partitioning, and
    GROWTH-CONSISTENT: adding rows to one class never changes which of
    another class's rows survive.

    Plan: one groupBy for class counts, the scalar target via one tiny
    agg broadcast back, then the same per-class hash-rank window as
    stratified_sample_exact. NULL class is its own class (consistent
    with the profiler).
    """
    if target not in ("min", "median"):
        raise ValueError(f"unknown target {target!r}")
    counts = df.groupBy(F.col(class_col).alias("_cls")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    tgt = counts.agg(
        (
            F.min("_n")
            if target == "min"
            else F.expr("cast(median(_n) as bigint)")
        ).alias("_tgt")
    )
    w = W.partitionBy(class_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.crossJoin(F.broadcast(tgt))
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= F.col("_tgt"))
        .drop("_rank", "_tgt")
    )
