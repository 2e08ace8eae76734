"""Sources & sinks (S1-S5, app.py:127-151) + the messy_orders fixture
generator (S3, app.py:27-41) rebuilt Spark-native.

Parquet is the engine's primary format (columnar, predicate pushdown,
column pruning); CSV/Excel are edge ingest, HTML/CSV export are
driver-side conveniences over small results — exactly the places where
toPandas() is allowed (SURVEY §7).
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# ---------------------------------------------------------------------------
# scans
# ---------------------------------------------------------------------------


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver test tables (TESTDATA.md) as a dict of DataFrames."""
    names = names or TABLES
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out


def read_csv(spark: SparkSession, path: str, infer: bool = True) -> DataFrame:
    """S1 (app.py:148-149): header + type inference. In production prefer an
    explicit schema (inference double-reads the file)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", infer)
        .csv(path)
    )


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """S1 hardened for real-world ingest: explicit schema + PERMISSIVE
    mode — malformed rows land with NULL fields and their raw text in
    ``corrupt_col`` instead of failing the job (FAILFAST) or silently
    vanishing (DROPMALFORMED). The cleaning pipeline then treats corrupt
    rows as one more detectable/remediable defect class:

        df = read_csv_permissive(...).cache()       # cache REQUIRED
        df.filter(F.col(corrupt_col).isNotNull())   # quarantine
        df.filter(F.col(corrupt_col).isNull())      # clean rows

    The cache() is not an optimization: Spark refuses a query whose
    referenced columns are ONLY the internal corrupt-record column
    ("queries from raw CSV files are disallowed..."), so filtering on
    the quarantine column straight off the raw scan raises
    AnalysisException — caching first materializes a normal relation.

    Requires an explicit schema (the corrupt column must be declared;
    inference + PERMISSIVE cannot coexist in one pass). At scale this is
    the only sane CSV posture: one bad row in 100 TB must not kill the
    read, and the quarantine count is a data-quality metric (see
    csv_ingest_report).
    """
    full = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def csv_ingest_report(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """One row: (n_rows, n_corrupt, corrupt_ratio) for a PERMISSIVE read
    — the ingest-quality gate a pipeline checks before proceeding."""
    n = F.count(F.lit(1))
    bad = F.count(F.col(corrupt_col))
    return df.agg(
        n.cast("bigint").alias("n_rows"),
        bad.cast("bigint").alias("n_corrupt"),
        F.round(
            F.when(n > 0, bad.cast("double") / n.cast("double")).otherwise(
                0.0
            ),
            6,
        ).alias("corrupt_ratio"),
    )


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """S2 (app.py:150-151): edge ingest only — pandas reads the (small,
    <=10 MB per the reference's own cap) workbook on the driver, Arrow
    ships it to the JVM. Gated: openpyxl may be absent in this image."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "Excel ingest requires pandas+openpyxl on the driver"
        ) from e
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S4 (app.py:127-133). single_file=True coalesces to one part —
    convenience for small exports only; distributed multi-part otherwise."""
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    writer.option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_html_report(
    before: DataFrame,
    after: DataFrame,
    log: list[str],
    insights: dict,
    order_by: list[str],
    n: int = 10,
) -> str:
    """S5 (to_html_report, app.py:94-125): timestamp + insights list +
    actions list + deterministic before/after head samples. Driver-side
    templating over df.limit(n) — no distributed work beyond two tiny
    ordered-limit jobs."""
    from etl_hero_spark.score import head_sample

    stamp = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC")
    b_html = head_sample(before, order_by, n).toPandas().to_html(index=False)
    a_html = head_sample(after, order_by, n).toPandas().to_html(index=False)
    ins = "".join(f"<li>{_html.escape(f'{k}: {v}')}</li>" for k, v in insights.items())
    acts = "".join(f"<li>{_html.escape(a)}</li>" for a in log) or "<li>none</li>"
    return (
        "<html><head><meta charset='utf-8'><title>ETL report</title></head><body>"
        f"<h1>Data cleaning report</h1><p>Generated: {stamp}</p>"
        f"<h2>Insights</h2><ul>{ins}</ul>"
        f"<h2>Actions applied</h2><ul>{acts}</ul>"
        f"<h2>Before (sample)</h2>{b_html}"
        f"<h2>After (sample)</h2>{a_html}"
        "</body></html>"
    )


# ---------------------------------------------------------------------------
# S3 — messy_orders synthetic fixture (app.py:27-41), Spark-native
# ---------------------------------------------------------------------------


def messy_orders(spark: SparkSession, n: int = 200, seed: int = 123) -> DataFrame:
    """Deterministic defect-injected sample, FIXTURES.md §B: sequential
    order_id; daily date strings; |N(50,20)| prices with 3 injected
    outliers (rows 5,17,50 -> 999, -100, 5000); 2 malformed dates (rows
    2,3); ~5% null category; rows 10,11 cloned from row 9 (2 duplicate
    rows). Exact pandas-RNG parity is impossible and NOT required — the
    contract is the schema + known defect counts.
    """
    df = (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "order_id")
        .withColumn("_u", F.rand(seed))
        .withColumn("_g", F.randn(seed + 1))
        .withColumn(
            "date",
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), (F.col("order_id") - 1).cast("int")),
                "yyyy-MM-dd",
            ),
        )
        .withColumn("price", F.round(F.abs(F.lit(50.0) + F.lit(20.0) * F.col("_g")), 2))
        .withColumn("quantity", (F.floor(F.rand(seed + 2) * 9) + 1).cast("long"))
        .withColumn(
            "category",
            F.when(F.col("_u") < 0.40, "A")
            .when(F.col("_u") < 0.80, "B")
            .when(F.col("_u") < 0.95, "C")
            .otherwise(F.lit(None).cast("string")),
        )
    )
    # defect injection (app.py:38-40); order_id is 1-based, reference rows 0-based
    df = (
        df.withColumn(
            "price",
            F.when(F.col("order_id") == 6, 999.0)
            .when(F.col("order_id") == 18, -100.0)
            .when(F.col("order_id") == 51, 5000.0)
            .otherwise(F.col("price")),
        )
        .withColumn(
            "date",
            F.when(F.col("order_id") == 3, "2024/13/01")
            .when(F.col("order_id") == 4, "01-02-2024")
            .otherwise(F.col("date")),
        )
    )
    base = df.select("order_id", "date", "price", "quantity", "category")
    # rows 10,11 overwritten with row 9 (pandas df.iloc[i] = df.iloc[9] copies
    # the WHOLE row, id included) -> three identical full rows, dup count 2
    row9 = base.filter(F.col("order_id") == 10)
    kept = base.filter(~F.col("order_id").isin(11, 12))
    return kept.unionByName(row9).unionByName(row9)


# ---------------------------------------------------------------------------
# bucketed tables — co-located joins without a shuffle (100 TB design)
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sort-bucketed) catalog table.

    Two tables bucketed the same way on the join key equi-join with NO
    exchange on either side (verified by plan test) — at 100 TB this is
    the difference between re-shuffling petabytes per join and reading
    co-located buckets. Bucket count should be sized so one bucket of the
    big table fits an executor core's working memory.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# JSONL training-data export (extension mandate: the interchange format
# LLM pipelines actually consume)
# ---------------------------------------------------------------------------


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL scan. Pass an explicit schema ('a long, b string') in
    production — inference double-reads the input."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return r.json(path)


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines twin of read_csv_permissive — the other ubiquitous
    ingest format for training-data pipelines, where a truncated shard
    or a stray log line mid-file is routine at 100 TB: explicit schema +
    PERMISSIVE mode, malformed lines land whole in ``corrupt_col``
    (type mismatches null the field, unparseable lines quarantine)
    instead of failing the job (FAILFAST) or silently vanishing
    (DROPMALFORMED). Same caveats as CSV: the corrupt column must be
    declared in the schema (inference and PERMISSIVE cannot coexist),
    and a query referencing ONLY the corrupt column off the raw scan is
    disallowed by Spark — cache or project real columns alongside.
    ``csv_ingest_report`` works unchanged on the result (it aggregates
    real + corrupt columns together)."""
    full = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    target_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Plain JSONL export; target_shards round-robins rows into that many
    uniform part files (omit to keep the input partitioning — the right
    call when upstream already repartitioned for size)."""
    out = df.repartition(target_shards) if target_shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_packed_jsonl(
    packed: DataFrame,
    path: str,
    compression: str | None = None,
) -> DataFrame:
    """Export a pack_token_shards result as one JSONL file per shard
    (path/shard_id=N/part-*.json) and return the shard manifest.

    repartition('shard_id') first so each shard's rows land in a single
    task -> a single file inside its partition directory; partitionBy
    then routes rows by shard. Both are one shuffle on the (uniform by
    construction — shards are budget-balanced) shard key, so the export
    scales with the cluster, and a trainer can read one shard directory
    per data-loader worker.
    """
    from etl_hero_spark.packing import shard_manifest

    w = (
        packed.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return shard_manifest(packed)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (both verified by the plan tests' PushedFilters/ReadSchema checks).
    Not in the reference (its only sources are CSV/XLSX, app.py:148-151);
    included so the engine covers the standard columnar lake formats."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the spark-avro package (external to core
    Spark, absent from this image). Gated like read_excel: a clean
    NotImplementedError instead of an opaque ClassNotFound; the call
    shape is the standard format reader either way."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: failed to find data source
        # match ONLY the missing-data-source error: a broad 'avro'-in-
        # message match would swallow unrelated failures (e.g. 'Path
        # does not exist: /data/avro/...') as classpath problems
        if "FAILED_FIND_DATA_SOURCE" in str(e) or "Failed to find data source" in str(e):
            raise NotImplementedError(
                "avro needs the org.apache.spark:spark-avro package on the "
                "session classpath; add it via spark.jars.packages"
            ) from e
        raise


def write_avro(df: DataFrame, path: str) -> None:
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:
        # match ONLY the missing-data-source error: a broad 'avro'-in-
        # message match would swallow unrelated failures (e.g. 'Path
        # does not exist: /data/avro/...') as classpath problems
        if "FAILED_FIND_DATA_SOURCE" in str(e) or "Failed to find data source" in str(e):
            raise NotImplementedError(
                "avro needs the org.apache.spark:spark-avro package on the "
                "session classpath; add it via spark.jars.packages"
            ) from e
        raise


def _pdf_escape(s: str) -> str:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )


def to_pdf_report(lines: list[str], title: str = "ETL report") -> bytes:
    """S5's declared-but-unshipped sibling: the reference lists PDF
    export as future work (app.py:392, 'Esporta report PDF') and never
    implements it. This ships it with ZERO dependencies: PDF 1.4 is a
    plain-text object graph, and a paginated Helvetica text report
    (catalog -> pages -> page/content streams + a byte-exact xref
    table) is small enough to emit by hand. Driver-side rendering of an
    already-aggregated summary, like to_html_report — never row data.
    """
    per_page = 46
    chunks = [
        lines[i : i + per_page] for i in range(0, len(lines), per_page)
    ] or [[]]
    n_pages = len(chunks)
    # object ids: 1 catalog, 2 pages, 3 font, then per page: page obj,
    # content obj
    objs: dict[int, bytes] = {}
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, chunk in enumerate(chunks):
        pid, cid = page_ids[i], page_ids[i] + 1
        body = [f"BT /F1 14 Tf 50 752 Td ({_pdf_escape(title)}) Tj ET"]
        y = 726
        for ln in chunk:
            body.append(
                f"BT /F1 10 Tf 50 {y} Td ({_pdf_escape(ln[:110])}) Tj ET"
            )
            y -= 14
        stream = "\n".join(body).encode("latin-1", "replace")
        objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents "
            + f"{cid} 0 R >>".encode()
        )
        objs[cid] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, n_objs):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def write_pdf_report(
    lines: list[str], path: str, title: str = "ETL report"
) -> None:
    with open(path, "wb") as f:
        f.write(to_pdf_report(lines, title))


def read_binary_files(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
) -> DataFrame:
    """Real multimodal ingest: Spark's binaryFile source reads raw files
    as (path, modificationTime, length, content binary) — the actual
    entry point for image/audio/video corpora (one row per file; the
    payload column then flows through validate_media / wav_metadata /
    decode without ever leaving the JVM). ``pattern`` is a glob pushed
    into the file listing (pathGlobFilter), so non-matching files are
    never opened. Partition parallelism = file parallelism; cap
    per-task memory with spark.sql.files.maxPartitionBytes as usual."""
    r = spark.read.format("binaryFile")
    if pattern:
        r = r.option("pathGlobFilter", pattern)
    return r.load(path)


def export_pdf_report(
    before: DataFrame,
    after: DataFrame,
    log: list[str],
    insights: dict,
    path: str,
    title: str = "Data cleaning report",
) -> None:
    """The PDF form of to_html_report (same inputs, same driver-side
    rendering contract): timestamp, insights, applied actions, and
    before/after row counts — aggregates only, never row data (a PDF is
    a report, not an export format). Completes the reference's S5
    surface with its declared-but-unshipped PDF variant."""
    stamp = _dt.datetime.now(_dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S UTC"
    )
    lines = [f"Generated: {stamp}", ""]
    lines += ["Insights:"] + [
        f"  - {k}: {v}" for k, v in insights.items()
    ]
    lines += ["", "Actions applied:"] + (
        [f"  - {a}" for a in log] or ["  - none"]
    )
    lines += [
        "",
        f"Rows before: {before.count()}",
        f"Rows after:  {after.count()}",
    ]
    write_pdf_report(lines, path, title=title)
