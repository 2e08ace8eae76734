"""Source/sink namespace (SURVEY §2.1 S1-S5) — re-exported from io."""

from etl_hero_spark.io import (  # noqa: F401
    TABLES,
    load_tables,
    messy_orders,
    read_csv,
    read_excel,
    read_parquet,
    to_html_report,
    write_csv,
    write_parquet,
)
