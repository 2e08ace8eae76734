"""Co-occurrence analytics: market-basket pairs and event-sequence
transitions (extension mandate — the two classic "what goes together"
aggregations the reference has no counterpart for).

Both are bounded-fanout relational plans, never all-pairs:

* co-occurrence pairs explode each BASKET into its item pairs — fanout
  is per-basket size squared, bounded by the basket cap (a real basket
  holds tens of items; a degenerate mega-basket is excluded LOUDLY,
  the skew.guarded_join posture), then one pair groupBy.
* transitions are consecutive-event bigrams per key: one (key) window
  lead, one pair groupBy — the same relational shape that replaced the
  array-shingle pipeline in textops (HOF-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


class BasketCapError(RuntimeError):
    """A basket exceeded max_basket_size with on_oversized='error'."""


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 100,
    min_count: int = 1,
    on_oversized: str = "warn",
) -> DataFrame:
    """(item_a, item_b, n_baskets) for every unordered item pair sharing
    at least ``min_count`` baskets, item_a < item_b. A pair counts once
    per basket (distinct items within a basket first), so n_baskets is
    support in the association-rule sense.

    Scale contract: fanout per basket is k*(k-1)/2 for k distinct items.
    Baskets over ``max_basket_size`` are EXCLUDED from pair generation —
    loudly (warn default / error like skew.guarded_join; a single
    million-item basket would otherwise emit 5e11 pairs). Plan: distinct
    (basket, item), per-basket size count, size-filtered self-join on
    the basket, pair groupBy — three bounded shuffles.
    """
    items = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    sizes = items.groupBy("bk").agg(F.count(F.lit(1)).alias("_n"))
    if on_oversized != "silent":
        over = (
            sizes.filter(F.col("_n") > max_basket_size)
            .agg(F.count(F.lit(1)).alias("n"), F.max("_n").alias("worst"))
            .first()
        )
        if over["n"]:
            msg = (
                f"copurchase_pairs: {over['n']} basket(s) exceed "
                f"max_basket_size={max_basket_size} (worst {over['worst']} "
                "items) and are excluded from pair generation — raise the "
                "cap or pre-split the mega-baskets."
            )
            if on_oversized == "error":
                raise BasketCapError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    ok = items.join(
        sizes.filter(F.col("_n") <= max_basket_size).select("bk"), "bk"
    )
    a = ok.select("bk", F.col("it").alias("item_a"))
    b = ok.select("bk", F.col("it").alias("item_b"))
    pairs = (
        a.join(b, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    return pairs.filter(F.col("n_baskets") >= min_count)


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each key's event
    sequence: (from_state, to_state, n, p) where p is the row-normalized
    probability — the path-analysis primitive behind "what do users do
    after X". One (key) window lead (deterministic (ts, tiebreak)
    ordering), one pair groupBy, a per-from_state re-aggregation of the
    tiny states*states table for the normalizer. p is an unrounded IEEE
    quotient of exact longs — engine-portable."""
    w = W.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    steps = (
        events.select(
            key_col,
            ts_col,
            order_tiebreak,
            F.col(state_col).alias("from_state"),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .withColumn(
            "p",
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 6
            ),
        )
        .drop("_tot")
    )
