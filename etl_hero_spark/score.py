"""Quality score / insights / report-sample operators (M1-M3, app.py:83-92,362-379)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_hero_spark.profile import duplicate_count, null_counts

# reference weights, app.py:88-91
_BASE, _W_NULL, _W_DUP = 50.0, 0.5, 1.0


def _table_badness(df: DataFrame) -> tuple[int, int]:
    """(total nulls, duplicate rows) in two small jobs (one scan each)."""
    nulls = null_counts(df).first()["n_null_total"]
    dups = duplicate_count(df).first()["n_duplicates"]
    return int(nulls), int(dups)


def quality_score(before: DataFrame, after: DataFrame) -> float:
    """M1 (compute_quality_score, app.py:83-92):
    clamp(50 + 0.5*max(0, d_nulls) + 1.0*max(0, d_dups), 0, 100), 2dp."""
    nb, db = _table_badness(before)
    na, da = _table_badness(after)
    score = _BASE + _W_NULL * max(0, nb - na) + _W_DUP * max(0, db - da)
    return round(max(0.0, min(100.0, score)), 2)


def quality_score_df(before: DataFrame, after: DataFrame) -> DataFrame:
    """Lazy single-row variant: (nulls_before, nulls_after, dups_before,
    dups_after, quality_score) — oracle-checkable as one SQL expression."""

    def one(df: DataFrame, tag: str) -> DataFrame:
        return (
            null_counts(df)
            .select(F.col("n_null_total").alias(f"nulls_{tag}"))
            .crossJoin(
                duplicate_count(df).select(
                    F.col("n_duplicates").alias(f"dups_{tag}")
                )
            )
        )

    joined = one(before, "before").crossJoin(one(after, "after"))
    raw = (
        F.lit(_BASE)
        + F.lit(_W_NULL)
        * F.greatest(F.lit(0), F.col("nulls_before") - F.col("nulls_after"))
        + F.lit(_W_DUP)
        * F.greatest(F.lit(0), F.col("dups_before") - F.col("dups_after"))
    )
    return joined.withColumn(
        "quality_score",
        F.round(F.least(F.lit(100.0), F.greatest(F.lit(0.0), raw)), 2),
    )


def insights(df_before: DataFrame, df_after: DataFrame) -> dict:
    """M2 (app.py:372-376): rows before/after, columns, nulls remaining."""
    nb_rows = df_before.count()
    na_rows = df_after.count()
    nulls_after = null_counts(df_after).first()["n_null_total"]
    return {
        "rows_before": nb_rows,
        "rows_after": na_rows,
        "columns": df_after.columns,
        "nulls_after": int(nulls_after),
    }


def head_sample(df: DataFrame, order_by: list[str], n: int = 10) -> DataFrame:
    """M3 (app.py:368-370): deterministic head — pandas head(10) is
    first-10-in-order; Spark limit without order is not, so an explicit
    natural-key ordering is required for reproducible reports."""
    return df.orderBy(*order_by).limit(n)
