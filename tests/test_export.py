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
