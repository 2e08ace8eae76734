"""JSONL training-export sinks: round-trips, shard layout, manifest."""

import glob
import os

import pyspark.sql.functions as F


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    from etl_hero_spark.io import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, target_shards=4)
    parts = [p for p in glob.glob(f"{out}/part-*") if not p.endswith(".crc")]
    assert len(parts) == 4
    back = read_jsonl(spark, out, "doc_id long, text string, lang string")
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_packed_jsonl_shard_layout(spark, sf_dir, tmp_path):
    """One directory per shard, each with exactly one data file; manifest
    totals match; reading everything back recovers the corpus."""
    from etl_hero_spark.io import read_jsonl, write_packed_jsonl
    from etl_hero_spark.packing import pack_token_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    packed = pack_token_shards(docs, budget=5000)
    out = str(tmp_path / "packed")
    manifest = write_packed_jsonl(packed, out).collect()
    n_shards = len(manifest)
    assert n_shards >= 2
    shard_dirs = sorted(glob.glob(f"{out}/shard_id=*"))
    assert len(shard_dirs) == n_shards
    for d in shard_dirs:
        files = [
            p
            for p in glob.glob(f"{d}/part-*")
            if not p.endswith(".crc")
        ]
        assert len(files) == 1, d
    back = read_jsonl(
        spark, out, "doc_id long, text string, n_tokens int"
    )
    assert back.count() == docs.count()
    assert sum(m["n_docs"] for m in manifest) == docs.count()


def test_pdf_report_structure_and_xref(tmp_path):
    """The hand-rolled PDF (reference future work app.py:392) must be a
    structurally valid PDF 1.4: header, trailer, and an xref table whose
    byte offsets actually land on each object's 'N 0 obj' marker."""
    from etl_hero_spark.io import to_pdf_report, write_pdf_report

    lines = [f"metric {i}: value ({i * 1.5})" for i in range(100)]
    pdf = to_pdf_report(lines, title="Cleaning report \\ (test)")
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # 100 lines at 46/page -> 3 pages
    assert pdf.count(b"/Type /Page ") == 3
    # parse xref and verify every offset
    xref_at = int(pdf.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    table = pdf[xref_at:].split(b"trailer")[0].splitlines()
    n_objs = int(table[1].split()[1])
    for oid, entry in enumerate(table[2 : 2 + n_objs]):
        off, _gen, kind = entry.split()
        if kind == b"f":
            continue
        assert pdf[int(off) :].startswith(
            f"{oid} 0 obj".encode()
        ), f"object {oid} offset wrong"
    # escaping: parens and backslash in the title cannot break the
    # content stream
    assert rb"\( test\)" in pdf or rb"\(test\)" in pdf
    p = tmp_path / "report.pdf"
    write_pdf_report(lines, str(p), title="Cleaning report \\ (test)")
    assert p.read_bytes() == pdf


def test_export_pdf_report_end_to_end(spark, tmp_path):
    from etl_hero_spark.io import export_pdf_report

    before = spark.range(100)
    after = spark.range(90)
    p = tmp_path / "clean.pdf"
    export_pdf_report(
        before,
        after,
        log=["remove_outliers(price)", "drop_duplicates()"],
        insights={"quality_score": 93.5, "nulls": 0},
        path=str(p),
    )
    pdf = p.read_bytes()
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    assert b"Rows before: 100" in pdf and b"Rows after:  90" in pdf
    assert b"remove_outliers" in pdf and b"quality_score" in pdf
