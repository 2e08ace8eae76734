"""Privacy auditing and de-identification: k-anonymity, l-diversity,
quasi-identifier generalization (extension mandate — the release gate a
training-data pipeline runs before shipping user-derived tables; the
reference's PII story stops at regex redaction, `app.py` has no
re-identification-risk counterpart).

Sweeney's model: a row is k-anonymous if its QUASI-IDENTIFIER tuple
(the columns an attacker can link on — zip, segment, nation, birth
date) is shared by at least k rows; l-diversity additionally requires
every QI group to hold >= l distinct SENSITIVE values, or the group
leaks the secret even at high k (everyone in the group shares it).

All audits are one groupBy over the QI columns — the corpus folds to
the QI-group table (bounded by the generalization level) and every
number comes off that table; no second corpus scan, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Per-QI-group size table: (quasi..., group_size). NULL is a
    linkable value too (an attacker sees the blank), so it groups as
    its own level — no null-filtering."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row audit: (n_rows, n_groups, k_achieved, n_groups_below_k,
    n_rows_at_risk, pct_rows_at_risk). ``k_achieved`` is the minimum
    group size — the k the release actually provides; ``rows_at_risk``
    counts rows in groups smaller than the requested k. DuckDB parity
    in tests/test_privacy.py."""
    g = k_anonymity_groups(df, quasi_cols)
    below = F.col("group_size") < k
    return g.agg(
        F.sum("group_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("k_achieved"),
        F.sum(below.cast("int")).alias("n_groups_below_k"),
        F.sum(F.when(below, F.col("group_size")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.round(
            F.sum(F.when(below, F.col("group_size")).otherwise(0))
            * 100.0
            / F.sum("group_size"),
            4,
        ).alias("pct_rows_at_risk"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_req: int = 2,
) -> DataFrame:
    """One-row distinct-l-diversity audit: (n_groups, l_achieved,
    n_groups_below_l, n_rows_at_risk). A group with fewer than l_req
    DISTINCT sensitive values leaks the attribute no matter its size —
    the failure k-anonymity alone can't see (homogeneity attack).
    Exact count-distinct per QI group (one groupBy on quasi+sensitive,
    then one on quasi — both partial-aggregated); the HLL variant is
    the at-scale default for very wide QI spaces. DuckDB parity in
    tests/test_privacy.py."""
    per_sv = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_n"))
    g = per_sv.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("_n").alias("group_size"),
    )
    below = F.col("l_distinct") < l_req
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l_distinct").alias("l_achieved"),
        F.sum(below.cast("int")).alias("n_groups_below_l"),
        F.sum(F.when(below, F.col("group_size")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
    )


def generalize(df: DataFrame, specs: dict[str, tuple]) -> DataFrame:
    """Apply one generalization rung per column — the k-anonymity
    remediation (coarser QI values merge small groups into big ones).
    Spec per column:

    * ``("bin", width)``      — numeric to left-closed width buckets,
                                emitted as '[lo,hi)' strings
    * ``("prefix", n)``       — string to its first n chars + '*'
    * ``("year",)``           — date/timestamp to its year
    * ``("suppress",)``       — the column becomes '*' (the top rung)

    NULLs stay NULL through every rung (suppressing a blank fabricates
    data). Pure codegen projections — no shuffle; audit → generalize →
    re-audit is the intended loop, pinned monotone in tests."""
    out = df
    for col, spec in specs.items():
        kind = spec[0]
        c = F.col(col)
        if kind == "bin":
            w = spec[1]
            lo = F.floor(c / w) * w
            expr = F.when(
                c.isNotNull(),
                F.concat(
                    F.lit("["),
                    lo.cast("bigint").cast("string"),
                    F.lit(","),
                    (lo + w).cast("bigint").cast("string"),
                    F.lit(")"),
                ),
            )
        elif kind == "prefix":
            expr = F.when(
                c.isNotNull(),
                F.concat(F.substring(c, 1, spec[1]), F.lit("*")),
            )
        elif kind == "year":
            expr = F.when(c.isNotNull(), F.year(c).cast("string"))
        elif kind == "suppress":
            expr = F.when(c.isNotNull(), F.lit("*"))
        else:
            raise ValueError(f"unknown generalization kind: {kind!r}")
        out = out.withColumn(col, expr)
    return out


def t_closeness_distances(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    ordered: bool = False,
) -> DataFrame:
    """Per-QI-group distance between the group's sensitive-value
    distribution and the GLOBAL one (Li, Li & Venkatasubramanian 2007,
    't-Closeness: Privacy Beyond k-Anonymity and l-Diversity'): the
    homogeneity leak l-diversity can't see — a group can hold l
    distinct values yet still be revealing if its mix differs sharply
    from the population's.

    ``ordered=False``: total variation distance 0.5 * sum|p_i - q_i|
    (the paper's equal-distance EMD for categorical attributes).
    ``ordered=True``: ordinal EMD sum|cumsum(p - q)| / (m - 1) over the
    sensitive domain sorted ascending (m = domain size).

    Plan: one groupBy on (QI, sensitive) folds the corpus; the global
    distribution and the sensitive DOMAIN are bounded tables that
    broadcast; every group is completed to the full domain (absent
    values count 0 — their probability mass matters) via group-table x
    broadcast-domain, so no corpus re-scan. The ordinal cumsum is a
    (QI)-partitioned window over m rows. Output: (quasi...,
    group_size, distance)."""
    per = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_n"))
    domain = per.groupBy("_sv").agg(F.sum("_n").alias("_gn"))
    grand = domain.agg(
        F.sum("_gn").alias("_N"), F.count(F.lit(1)).alias("_m")
    )
    sizes = per.groupBy(*quasi_cols).agg(
        F.sum("_n").alias("group_size")
    )
    grid = sizes.crossJoin(F.broadcast(domain)).crossJoin(
        F.broadcast(grand)
    )
    # re-project the per-cell counts under a fresh name: grid's lineage
    # also descends from `per`, so joining the raw frame back is a
    # self-join with an ambiguous `_n`
    cells = per.select(
        *quasi_cols, "_sv", F.col("_n").alias("_cell_n")
    )
    full = grid.join(cells, [*quasi_cols, "_sv"], "left").withColumn(
        "_diff",
        F.coalesce(F.col("_cell_n"), F.lit(0))
        / F.col("group_size").cast("double")
        - F.col("_gn") / F.col("_N").cast("double"),
    )
    if ordered:
        from pyspark.sql import Window as W

        w = (
            W.partitionBy(*quasi_cols)
            .orderBy(F.col("_sv").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        stepped = full.withColumn("_cum", F.sum("_diff").over(w))
        return (
            stepped.groupBy(*quasi_cols, "group_size", "_m")
            .agg(F.sum(F.abs(F.col("_cum"))).alias("_emd_raw"))
            .select(
                *quasi_cols,
                "group_size",
                F.round(
                    F.col("_emd_raw")
                    / F.greatest(F.col("_m") - 1, F.lit(1)).cast(
                        "double"
                    ),
                    6,
                ).alias("distance"),
            )
        )
    return (
        full.groupBy(*quasi_cols, "group_size")
        .agg(
            F.round(0.5 * F.sum(F.abs(F.col("_diff"))), 6).alias(
                "distance"
            )
        )
        .select(*quasi_cols, "group_size", "distance")
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    ordered: bool = False,
) -> DataFrame:
    """One-row t-closeness audit off the bounded group-distance table:
    (n_groups, t_achieved, n_groups_above_t, n_rows_at_risk) —
    ``t_achieved`` is the MAX group distance (the t the release
    actually provides; the release satisfies t-closeness iff
    t_achieved <= t). DuckDB parity + planted-skew detection in
    tests/test_privacy.py."""
    d = t_closeness_distances(
        df, quasi_cols, sensitive_col, ordered=ordered
    )
    above = F.col("distance") > float(t)
    return d.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("distance").alias("t_achieved"),
        F.sum(above.cast("int")).alias("n_groups_above_t"),
        F.sum(F.when(above, F.col("group_size")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
    )
