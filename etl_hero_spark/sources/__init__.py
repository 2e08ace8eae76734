"""Source/sink namespace (SURVEY §2.1 S1-S5 + format extensions) —
re-exported from io."""

from etl_hero_spark.io import (  # noqa: F401
    TABLES,
    load_tables,
    messy_orders,
    read_avro,
    read_binary_files,
    read_csv,
    read_csv_permissive,
    read_excel,
    read_jsonl,
    read_jsonl_permissive,
    read_orc,
    read_parquet,
    export_pdf_report,
    to_html_report,
    to_pdf_report,
    write_bucketed,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_pdf_report,
)
