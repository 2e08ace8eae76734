"""Skew-mitigation operators for the 100 TB design point.

Spark's defaults already cover much of the skew surface: map-side
partial aggregation absorbs skewed groupBy keys for algebraic
aggregates, and AQE splits skewed sort-merge-join partitions at runtime
(spark.sql.adaptive.skewJoin). What they do NOT cover:

* broadcast-ineligible joins where one/few key values dominate AND AQE
  is off or the skew exceeds its thresholds -> salted_join: the big side
  salts each row into one of n_salts sub-keys, the small side replicates
  n_salts times, the join key becomes (key, salt) — a hot key's rows
  spread over n_salts reducers. Result set is IDENTICAL to the unsalted
  join (oracle-checked in the registry).
* per-key COUNT(DISTINCT x) where one key holds most rows -> a single
  reducer receives the key's whole value set. two_phase_distinct_count
  first dedups on (key, x) — map-side combine shrinks the hot key before
  any single reducer sees it — then counts per key.

Salting is deterministic here (hash of a stable row expression, not
rand()) so retried/speculated tasks salt identically — rand() salts can
double-count rows under task retry with non-idempotent sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_expr(cols: list[str], n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the full row's
    stable columns. xxhash64 is JVM-side and cheap."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts times. Same rows as big.join(small, on, how); the hot key's
    rows land on n_salts reducers instead of one.

    The small side grows n_salts x — keep it the dimension side. For
    how='left'/'inner' semantics are exact; right/full would need the
    mirrored construction (not provided — swap the sides instead).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'; swap sides otherwise")
    on = [on] if isinstance(on, str) else list(on)
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn("_salt", salt_expr(big_cols, n_salts))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, on + ["_salt"], how).drop("_salt")


def two_phase_distinct_count(
    df: DataFrame, keys: list[str] | str, col: str, alias: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT col) per key without funnelling a hot key's value
    set through one reducer: dedup on (keys, col) first — partial
    aggregation combines map-side — then count per key. Two shuffles,
    both skew-tolerant; bit-identical to the direct COUNT DISTINCT."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*keys, col)
        # COUNT(DISTINCT col) ignores NULLs — drop them before the dedup
        # or the null row would be counted
        .filter(F.col(col).isNotNull())
        .dropDuplicates(keys + [col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def _parse_byte_conf(v: str) -> int:
    """Spark size confs render as '134217728', '134217728b' or '128MB'."""
    s = str(v).strip().lower()
    units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
             "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
    num = s.rstrip("bkmg")
    return int(num) * units.get(s[len(num):], 1)


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a few-split input before CPU-heavy per-row work.

    A small parquet file is one row group -> ONE scan task, so an
    expression-heavy stage (shingling, hashing, vector math) runs on one
    core no matter how many the cluster has. A round-robin repartition of
    the raw rows (cheap: input is small by premise) buys full parallelism.
    No-op when the input is big enough to split naturally — large inputs
    keep their natural partitioning.

    The big/small probe reads the OPTIMIZER'S size estimate
    (logical-plan stats over file-source sizes), never
    `df.rdd.getNumPartitions()`: the RDD property physically plans the
    query and wraps it in a pickling JavaRDD on every call, pure
    overhead for a yes/no answer. sizeInBytes / maxPartitionBytes is
    exactly the split count a splittable file scan will produce; plans
    with unknown stats report Long.Max and are (correctly) left alone —
    they are post-shuffle or parallelized inputs that already spread.
    """
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        split = _parse_byte_conf(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )
        )
        if size // max(split, 1) >= min_parts:
            return df
    except Exception:
        # stats unavailable (exotic plan/py4j surface change): fall
        # through to the repartition — harmless for the intended
        # "spread a small input" call sites
        pass
    return df.repartition(min_parts)


class JoinFanoutError(RuntimeError):
    """Raised by guarded_join when the worst-case per-key fanout of a
    join exceeds the declared bound."""


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    how: str = "inner",
    max_key_fanout: int = 1_000_000,
) -> DataFrame:
    """Join with a pre-flight fanout guard: before shuffling anything
    big, two tiny aggregates find each side's most-duplicated key; if
    the worst-case per-key output (max_left_dups x max_right_dups)
    exceeds ``max_key_fanout``, raise JoinFanoutError naming the bound
    instead of silently materializing a key explosion.

    At 100 TB the classic incident is a 'unique' key that isn't — one
    NULL-heavy or default-valued key turns an innocent join into a
    quadratic blowup discovered only when the stage has run for hours.
    The guard costs two key-grouped COUNTs (cheap, map-side combined)
    and fails in seconds with the offending numbers. NULL join keys
    never match in SQL joins, so rows with any NULL key are excluded
    from the guard's counts.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def max_dups(df: DataFrame) -> int:
        cond = None
        for k in keys:
            c = F.col(k).isNotNull()
            cond = c if cond is None else cond & c
        row = (
            df.filter(cond)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n"))
            .first()
        )
        return int(row[0] or 0)

    ml, mr = max_dups(left), max_dups(right)
    if ml * mr > max_key_fanout:
        raise JoinFanoutError(
            f"join on {keys} would fan out up to {ml} x {mr} = "
            f"{ml * mr} rows for one key (bound {max_key_fanout}); "
            "deduplicate a side or raise max_key_fanout deliberately"
        )
    return left.join(right, keys, how)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """The pre-flight skew PROFILE behind every mitigation choice here:
    per-key row counts summarized as the top-k heavy keys with their
    share and cumulative share of all rows, plus corpus-level context
    (n_keys, n_rows, max/mean ratio). A key holding >> 1/n_partitions
    of the rows is the one that needs salting / hot-cold splitting /
    AQE skew-join — this report is how you find it BEFORE the 4-hour
    straggler does.

    Plan: one groupBy(key) count (map-side combined), a 1-row global
    agg broadcast back, TakeOrderedAndProject for the top-k, one tiny
    window over k rows for the cumulative share. NULL keys count as a
    key (a NULL hot key is still a hot key)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    top = (
        counts.select(F.col("key").cast("string").alias("key"), "n")
        .orderBy(F.desc("n"), F.asc_nulls_first("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    # cumulative share WITHOUT a partition-less window (the plan-audit
    # invariant): a k x k broadcast self-join over the top-k rows —
    # "earlier" = higher count, key ascending on ties, NULL key first
    earlier = top.select(
        F.col("key").alias("_ek"), F.col("n").alias("_en")
    )
    order_cmp = (F.col("_en") > F.col("n")) | (
        (F.col("_en") == F.col("n"))
        & (
            F.col("_ek").isNull()
            | (F.col("_ek") <= F.col("key"))
        )
    )
    cum = (
        top.join(F.broadcast(earlier), order_cmp, "left")
        .groupBy("key", "n", "n_keys", "n_rows", "max_n")
        .agg(F.sum("_en").alias("_cum"))
    )
    return cum.select(
        "key",
        "n",
        F.round(F.col("n") / F.col("n_rows"), 6).alias("share"),
        F.round(F.col("_cum") / F.col("n_rows"), 6).alias("cum_share"),
        "n_keys",
        "n_rows",
        F.round(
            F.col("max_n") * F.col("n_keys") / F.col("n_rows"), 2
        ).alias("max_over_mean"),
    )


def build_bloom_filter(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Distributed Bloom-filter build over a key column: a 1-row
    DataFrame holding the bitmap as ``array<bigint>`` (m_bits/64
    words). Each key sets k_hashes bits at pmod(xxhash64(seed_i, key),
    m); word-level OR folds distributed (groupBy word, bit_or), the
    m/64-word table folds to one array. 1M bits = 16K longs = 128 KB —
    broadcastable at any corpus size, the point: the FILTER is
    constant-size no matter how many keys built it."""
    words = m_bits // 64
    pos = [
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m_bits))
        for i in range(k_hashes)
    ]
    bits = (
        df.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bm"))
    )
    # densify the sparse word table DRIVER-side (<= words rows, the
    # fitted-model shape): a transform(sequence, element_at(map)) fold
    # was tried and is quadratic — Spark maps are entry ARRAYS, so each
    # of the 16K interpreted lookups scans the map (measured 9.9 s for
    # what the driver loop does in ms)
    arr = [0] * words
    for r in bits.collect():
        arr[r["w"]] = r["bm"]
    return df.sparkSession.createDataFrame(
        [(arr,)], "bloom array<bigint>"
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_col: str,
    dim_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    how: str = "inner",
) -> DataFrame:
    """INNER equi-join with an explicit Bloom runtime filter: build a
    constant-size bitmap from the (selective) dim side, broadcast it,
    and pre-filter the fact side BEFORE the join shuffle — the
    runtime-filter pattern a 100 TB star join lives on when partition
    pruning can't apply (the AQE bloom injection made explicit and
    deterministic). False positives only (they fall out in the real
    join, which still runs); false negatives impossible — result ==
    plain join, pinned in tests/test_skew.py along with the measured
    pre-shuffle row reduction. The k membership probes are pure
    codegen bit arithmetic against one broadcast 128 KB array.

    Two correctness guards (both pinned in tests):
    * the dim key is CAST to the fact key's type before hashing —
      xxhash64 is type-sensitive (int 5 != bigint 5), and a dim value
      outside the fact type's range casts to NULL, which is fine: it
      could never equi-match the fact side anyway;
    * only ``how='inner'`` is accepted — pre-filtering the fact side
      is wrong for outer joins (unmatched left rows must survive
      null-extended, but the bloom would drop them)."""
    if how != "inner":
        raise ValueError(
            "bloom_pruned_join supports only how='inner': the bloom "
            "pre-filter drops exactly the rows an outer join must keep"
        )
    fact_type = fact.schema[fact_col].dataType
    dim_keyed = dim.withColumn("_bk", F.col(dim_col).cast(fact_type))
    bloom = build_bloom_filter(dim_keyed, "_bk", m_bits, k_hashes)
    # stage each probe position once (seed type MUST match the build
    # side: xxhash64 hashes typed values, int-0 != long-0)
    probed = fact.crossJoin(F.broadcast(bloom))
    for i in range(k_hashes):
        probed = probed.withColumn(
            f"_bp{i}",
            F.pmod(F.xxhash64(F.lit(i), F.col(fact_col)), F.lit(m_bits)),
        )
    cond = None
    for i in range(k_hashes):
        word = F.element_at(
            "bloom", (F.col(f"_bp{i}") / 64).cast("int") + 1
        )
        bit = F.expr(f"shiftleft(1L, cast(_bp{i} % 64 as int))")
        check = word.bitwiseAND(bit) != 0
        cond = check if cond is None else (cond & check)
    pruned = probed.filter(cond).drop(
        "bloom", *[f"_bp{i}" for i in range(k_hashes)]
    )
    return pruned.join(
        dim, pruned[fact_col] == dim[dim_col], how
    )
