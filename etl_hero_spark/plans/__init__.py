"""Plan/lineage namespace — the recorded-step pipeline (SURVEY §1.1, M4)."""

from etl_hero_spark.pipeline import Pipeline, Step  # noqa: F401
