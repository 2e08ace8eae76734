"""SparkSession factory with engine defaults.

Local mode for tests/bench; the same config keys are what you would set
on a 1000-executor cluster (AQE on, sensible shuffle partitioning, UTC,
Arrow for the pandas boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-hero-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    # SPARK_MASTER lets the same entry points run against a real cluster
    # (yarn / k8s / spark://...); everything else below is master-agnostic
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Engine semantics: parse/convert failures yield NULL (the reference's
        # try/except -> NaT model, app.py:322-346), not ANSI runtime errors.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_oracle_safe_conf(spark: SparkSession) -> None:
    """Pin runtime-settable confs that oracle-checked queries depend on.

    queries() callables receive the *driver's* session, whose defaults we
    don't control (Spark 4 ships ANSI on). Both keys are runtime-settable.
    """
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
