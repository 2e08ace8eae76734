"""Physical layout operators: z-order clustering must demonstrably
shrink per-file spans (= enable stats pruning) on BOTH clustered
columns vs a time-sorted layout; compaction must reduce file count
without changing data."""

import pyspark.sql.functions as F
import pytest

from etl_hero_spark.layout import (
    compact_files,
    file_stats,
    pruning_fraction,
    zorder_write,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from etl_hero_spark.registry import _events

    return _events(spark, sf_dir).select("event_id", "ts", "user_id", "value")


def test_zorder_prunes_both_dims_vs_time_layout(spark, events, tmp_path):
    lin = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    # append-order layout: range-partitioned + sorted by ts (what a
    # naive ingest produces)
    (
        events.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(lin)
    )
    zorder_write(events, zo, ["user_id", "value"], n_files=8, bits_per_col=6)

    mid = events.selectExpr(
        "percentile(user_id, 0.5) AS u", "percentile(value, 0.5) AS v"
    ).first()
    lin_stats = file_stats(spark, lin, ["user_id", "value"]).collect()
    zo_stats = file_stats(spark, zo, ["user_id", "value"]).collect()
    assert len(zo_stats) == 8
    for col, val in [("user_id", mid["u"]), ("value", mid["v"])]:
        lin_frac = pruning_fraction(lin_stats, col, val)
        zo_frac = pruning_fraction(zo_stats, col, val)
        # the time layout cannot prune on either dimension
        assert lin_frac == 1.0
        assert zo_frac < lin_frac
        assert zo_frac <= 0.75
    # and the data round-trips exactly
    a = events.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id")
    ).first()
    b = spark.read.parquet(zo).agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id")
    ).first()
    assert tuple(a) == tuple(b)


def test_zorder_handles_low_cardinality_column(spark, tmp_path):
    # constant column -> all boundaries equal -> dedupe must not emit an
    # empty/broken CASE
    df = spark.range(1000).select(
        F.col("id"), F.lit(7.0).alias("c"), (F.col("id") % 50).alias("d")
    )
    path = str(tmp_path / "lowcard")
    zorder_write(df, path, ["c", "d"], n_files=4, bits_per_col=4)
    assert spark.read.parquet(path).count() == 1000


def test_compact_files(spark, events, tmp_path):
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    events.repartition(40).write.parquet(small)
    out = compact_files(spark, small, big, target_bytes=1 << 40)
    assert out["files_in"] == 40
    assert out["files_out"] == 1
    assert (
        spark.read.parquet(big).count()
        == spark.read.parquet(small).count()
    )


def test_optimize_table_compacts_and_clusters(spark, events, tmp_path):
    from etl_hero_spark.layout import optimize_table

    small = str(tmp_path / "ingest")
    opt = str(tmp_path / "optimized")
    events.repartition(32).write.parquet(small)
    out = optimize_table(
        spark, small, opt, ["user_id", "value"], target_bytes=1 << 13
    )
    assert out["files_in"] == 32
    n_out = (
        spark.read.parquet(opt)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert n_out <= out["files_out"]  # empty z-ranges may drop
    assert n_out < 32
    # data intact and clustered: a point predicate prunes
    assert spark.read.parquet(opt).count() == events.count()
    mid = events.selectExpr("percentile(user_id, 0.5) AS u").first()["u"]
    st = file_stats(spark, opt, ["user_id"]).collect()
    assert pruning_fraction(st, "user_id", mid) < 1.0
