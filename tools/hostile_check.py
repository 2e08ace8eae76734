"""Run every registered query under a deliberately HOSTILE session —
Spark 4 driver-style defaults we do not control: ANSI on, non-UTC
timezone, AQE off, 200 shuffle partitions.

The per-query wrapper (registry.register -> ensure_oracle_safe_conf)
must neutralize all of it at call time; any query that throws or
changes semantics under these confs is a portability bug. Streaming
queries are skipped (they run real streams; their equality is asserted
in tests). Usage:

    python tools/hostile_check.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SKIP = {
    "stream_window_tumbling",
    "stream_session_window",
    "stream_dedup",
    "stream_user_gaps",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("hostile")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_hero_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    failed = []
    for name, spec in REGISTRY.items():
        if name in SKIP:
            continue
        try:
            spec.spark(spark, sf).count()
        except Exception as e:  # noqa: BLE001 - report-all harness
            failed.append((name, str(e).splitlines()[0][:160]))
    if failed:
        for name, err in failed:
            print(f"FAIL  {name}: {err}")
        sys.exit(1)
    n = len(REGISTRY) - len(SKIP)
    print(f"OK — all {n} queries ran under hostile session conf")


if __name__ == "__main__":
    main()
