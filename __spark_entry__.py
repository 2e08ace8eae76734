"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship profile->detect->clean->score pipeline at sf0.001.
queries()     : one entry per implemented operator from SURVEY.md §2
                (+ scale extensions) — see etl_hero_spark/registry.py.
oracle_sql()  : matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full E1->E2->E3 loop on sf0.001
    lineitem — profile, detect outliers, remediate (replace with median of
    non-outliers), and emit a before/after summary row (SURVEY §7 step 1).
    """
    from etl_hero_spark.clean import replace_outliers
    from etl_hero_spark.profile import dec_avg, dec_stddev_pop
    from etl_hero_spark.session import ensure_oracle_safe_conf

    ensure_oracle_safe_conf(spark)
    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cleaned = replace_outliers(df, "l_extendedprice", strategy="median")
    before = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_avg("l_extendedprice", "mean_before"),
        dec_stddev_pop("l_extendedprice", "std_before"),
    )
    after = cleaned.agg(
        dec_avg("l_extendedprice", "mean_after"),
        dec_stddev_pop("l_extendedprice", "std_after"),
    )
    return before.crossJoin(after)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_hero_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from etl_hero_spark.registry import all_oracles

    return all_oracles()
