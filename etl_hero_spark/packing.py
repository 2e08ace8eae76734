"""Token-budget shard packing for training-data export (extension
mandate).

Assigns each document to a contiguous training shard such that every
shard's token total stays within a budget (the last doc of a shard may
straddle the boundary — standard exclusive-prefix-sum packing, so the
assignment is a pure function of the deterministic document order):

    shard_id = floor(exclusive_prefix_sum(n_tokens) / budget)

The naive formulation is one global `sum() OVER (ORDER BY ...)` window
— a partition-less window that funnels the whole corpus through a
single task (the exact scale bug fixed in text_top_tokens). Here the
prefix sum is two-phase, the classic distributed scan:

1. range-bucket rows by the order column (bounds from one tiny min/max
   agg, broadcast) — buckets preserve global order;
2. per-bucket local prefix sums (window PARTITIONED by bucket — spreads
   across the cluster);
3. per-bucket offsets = sum of all earlier buckets' totals, computed on
   the n_buckets-row totals table via a broadcast self-join (no
   partition-less window even on the tiny side);
4. global exclusive prefix = local prefix - own + bucket offset.

Two shuffles total (bucket window sort + the tiny totals agg), both on
uniform keys. No counterpart in the reference; the operator exists for
the 100 TB training-export path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_hero_spark.textops import token_count_expr



def _bucket_offsets(totals):
    """Exclusive per-bucket prefix of ``_tot`` -> (_bucket, _offset):
    each bucket's offset is the sum of all EARLIER buckets' totals,
    via a broadcast self-join over the tiny n_buckets-row table — never
    a partition-less window, even on the small side. Shared by every
    two-phase distributed scan in this module."""
    earlier = totals.select(
        F.col("_bucket").alias("_eb"), F.col("_tot").alias("_et")
    )
    return (
        totals.join(
            F.broadcast(earlier), F.col("_eb") < F.col("_bucket"), "left"
        )
        .groupBy("_bucket")
        .agg(F.coalesce(F.sum("_et"), F.lit(0)).alias("_offset"))
    )


def pack_token_shards(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Adds ``n_tokens`` (if not supplied via token_col) and ``shard_id``.

    order_col must be numeric and unique (doc ids); the shard layout is
    deterministic given the order. budget is in tokens per shard.
    """
    if token_col is None:
        df = df.withColumn("n_tokens", token_count_expr(text_col))
        token_col = "n_tokens"
    o = F.col(order_col).cast("double")
    bounds = df.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    b = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.floor(
                (o - F.col("_lo")) * n_buckets / (F.col("_hi") - F.col("_lo") + 1)
            ),
        ).otherwise(F.lit(0)),
    )
    # ROWS frame, not the default RANGE: RANGE includes all PEERS of an
    # equal order value in the running sum, double-counting ties. The
    # order key is documented unique; with ROWS an accidental duplicate
    # at least degrades to an arbitrary-but-consistent tie order rather
    # than a corrupted prefix sum.
    local_w = (
        W.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    b = b.withColumn(
        "_local_incl", F.sum(token_col).over(local_w)
    )
    totals = b.groupBy("_bucket").agg(F.sum(token_col).alias("_tot"))
    offsets = _bucket_offsets(totals)
    prefix_excl = F.col("_local_incl") - F.col(token_col) + F.col("_offset")
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "shard_id", F.floor(prefix_excl / F.lit(float(budget))).cast("bigint")
        )
        .drop("_lo", "_hi", "_bucket", "_local_incl", "_offset")
    )


def shard_manifest(
    packed: DataFrame,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """One row per shard: doc count, token total, id range — the export
    manifest a downstream trainer consumes. order_col must match the
    column pack_token_shards ordered by."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.min(order_col).alias("first_doc_id"),
        F.max(order_col).alias("last_doc_id"),
    )


def global_rank(
    df: DataFrame,
    metric_col: str,
    id_col: str,
    ascending: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """Adds ``rank``: the GLOBAL 1-based row number under
    ORDER BY metric [DESC], id ASC — curriculum ordering (hardest/
    highest-quality first), leaderboards, deterministic train/eval
    splits by rank range.

    The naive row_number() over an unpartitioned window funnels the
    corpus through one task; this is the same two-phase distributed
    scan as pack_token_shards, counting rows instead of summing tokens:
    range-bucket by metric value (equal metrics share a bucket, so the
    id tie-break stays inside one window), local row_number per bucket,
    bucket offsets from a broadcast self-join over the tiny totals
    table. Two uniform shuffles, no single-task stage.

    Rows with a NULL metric are dropped (rank is over the non-null
    subset) — filter or impute first if they must be ranked. The filter
    is explicit and up-front: without it the degenerate all-equal-metric
    branch would bucket NULL rows at rank 1 while the normal branch
    silently dropped them via the inner offsets join.
    """
    df = df.filter(F.col(metric_col).isNotNull())
    sign = 1.0 if ascending else -1.0
    k = (F.col(metric_col).cast("double") * sign).alias("_k")
    bounds = df.select(k).agg(
        F.min("_k").alias("_lo"), F.max("_k").alias("_hi")
    )
    b = (
        df.withColumn("_k", F.col(metric_col).cast("double") * sign)
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "_bucket",
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col("_k") - F.col("_lo"))
                        * n_buckets
                        / (F.col("_hi") - F.col("_lo"))
                    ),
                ),
            ).otherwise(F.lit(0)),
        )
    )
    local_w = W.partitionBy("_bucket").orderBy(
        F.col("_k").asc(), F.col(id_col).asc()
    )
    b = b.withColumn("_local_rn", F.row_number().over(local_w))
    totals = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_tot"))
    offsets = _bucket_offsets(totals)
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "rank", (F.col("_local_rn") + F.col("_offset")).cast("bigint")
        )
        .drop("_k", "_lo", "_hi", "_bucket", "_local_rn", "_offset")
    )


# ---------------------------------------------------------------------------
# fixed-length sequence packing — the GPT-style concatenate-and-chunk
# pipeline (shard packing keeps documents whole per shard; a trainer's
# context window does not: the global token stream is cut every
# context_len tokens, and a document may straddle the cut)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    context_len: int,
    order_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document its span in the concatenated fixed-length
    context stream: tokens are laid out in ``order_col`` order and cut
    every ``context_len`` tokens. Adds

      tok_start      global offset of the doc's first token (exclusive
                     prefix sum — two-phase distributed, see module doc)
      ctx_first/_last  first/last context the doc's tokens land in
      n_ctx          contexts the doc touches (>1 = straddles a cut)

    ``order_col`` must be numeric and UNIQUE (doc ids) — the stream
    position of a document is defined by it. Zero-token docs occupy no
    tokens: they attach to the context their
    offset points at (ctx_first == ctx_last, degenerate span). The
    assignment is a pure function of the document order — re-runs and
    re-partitionings agree, the property that makes the packed corpus
    reproducible for a training run.
    """
    if token_col is None:
        df = df.withColumn("n_tokens", token_count_expr(text_col))
        token_col = "n_tokens"
    o = F.col(order_col).cast("double")
    bounds = df.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    b = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.floor(
                (o - F.col("_lo")) * n_buckets / (F.col("_hi") - F.col("_lo") + 1)
            ),
        ).otherwise(F.lit(0)),
    )
    # ROWS frame (see pack_token_shards): the default RANGE frame sums
    # all PEERS of a tied order value, double-counting duplicates
    local_w = (
        W.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    b = b.withColumn("_local_incl", F.sum(token_col).over(local_w))
    offsets = _bucket_offsets(
        b.groupBy("_bucket").agg(F.sum(token_col).alias("_tot"))
    )
    start = F.col("_local_incl") - F.col(token_col) + F.col("_offset")
    end_incl = F.greatest(start + F.col(token_col) - 1, start)  # 0-tok docs
    L = F.lit(float(context_len))
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn("tok_start", start.cast("bigint"))
        .withColumn("ctx_first", F.floor(start / L).cast("bigint"))
        .withColumn("ctx_last", F.floor(end_incl / L).cast("bigint"))
        .withColumn(
            "n_ctx", (F.col("ctx_last") - F.col("ctx_first") + 1).cast("bigint")
        )
        .drop("_lo", "_hi", "_bucket", "_local_incl", "_offset")
    )


def sequence_manifest(
    packed: DataFrame,
    context_len: int,
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-context packing report from a pack_sequences result:
    (ctx_id, n_docs, n_tokens, n_straddlers). Docs explode to the
    contexts they touch (sequence(ctx_first, ctx_last) — bounded fanout:
    a doc touches ceil(len/L)+1 contexts); each context sums the token
    slice that actually lands in it, so every context reports exactly
    context_len tokens except the final partial one — the invariant a
    trainer's data loader depends on."""
    L = F.lit(context_len).cast("bigint")
    ex = packed.select(
        F.col(token_col).alias("_n"),
        F.col("tok_start"),
        F.col("ctx_first"),
        F.explode(
            F.sequence(F.col("ctx_first"), F.col("ctx_last"))
        ).alias("ctx_id"),
    )
    lo = F.greatest(F.col("tok_start"), F.col("ctx_id") * L)
    hi = F.least(F.col("tok_start") + F.col("_n"), (F.col("ctx_id") + 1) * L)
    return (
        ex.groupBy("ctx_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.greatest(hi - lo, F.lit(0))).alias("n_tokens"),
            F.sum(
                (F.col("ctx_id") > F.col("ctx_first")).cast("long")
            ).alias("n_straddlers"),
        )
    )
