"""Text-analysis operator tests."""

import pyspark.sql.functions as F

from etl_hero_spark import textops


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text string"
    )
    got = [
        r["n_tokens"]
        for r in textops.with_token_counts(df).orderBy(F.length("text").desc()).collect()
    ]
    assert sorted(got) == [0, 0, 1, 3]


def test_bpe_ish_splits_punct(spark):
    df = spark.createDataFrame([("a,b cc9-x",)], "text string")
    row = textops.with_token_counts(df).first()
    assert row["n_tokens"] == 2  # whitespace tokens
    assert row["n_pieces"] == 4  # a, b, cc9, x


def test_quality_signals(spark):
    df = spark.createDataFrame([("the cat, the hat!",)], "text string")
    r = textops.with_quality_signals(df).first()
    assert r["n_tokens_q"] == 4
    assert r["stopword_ratio"] == 0.5  # 'the' twice of 4
    assert 0 < r["punct_ratio"] < 0.2  # ',' and '!'
    assert r["distinct_ratio"] == 0.75  # the,cat,hat of 4


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("el que de la casa los",),
            ("der hund und die katze ist",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r["predicted_lang"] for r in textops.with_lang_id(df).collect()]
    assert got == ["en", "es", "de", "und"]


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "different text")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp_md5"] for r in textops.with_fingerprints(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_shingle_fingerprint_order_insensitive(spark):
    # same sentence set, reordered -> same shingle fingerprint only if the
    # shingle *sets* coincide; reordering words changes shingles -> differs
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "e d c b a")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp_shingle"] for r in textops.with_fingerprints(df).collect()}
    assert fps[1] == fps[2] != fps[3]
