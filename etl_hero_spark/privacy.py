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
