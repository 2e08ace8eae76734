"""Fuzzy entity-resolution tests: blocked levenshtein pairs.

fuzzy_pairs is registered rows-only (driver-window budget), so its
cross-engine oracle lives HERE: DuckDB's levenshtein() implements the
same classic edit distance as Spark's F.levenshtein, and the blocked
plan must reproduce the brute-force all-pairs answer whenever blocking
is lossless for the fixture (same first token, lengths within band).
"""

import duckdb
import pyspark.sql.functions as F

from etl_hero_spark.er import block_key_expr, fuzzy_pairs

# (id, name): three typo clusters sharing first tokens + unrelated rows.
NAMES = [
    (1, "acme widget deluxe"),
    (2, "acme widget delux"),  # 1 deletion from #1
    (3, "acme widget deluxe pro"),  # 4 inserts from #1
    (4, "bolt cutter small"),
    (5, "bolt cutter smal"),  # 1 deletion from #4
    (6, "bolt sander large"),
    (7, "candle holder brass"),
    (8, "candle holdre brass"),  # transposition = 2 edits
    (9, "different thing entirely"),
]


def _fixture(spark):
    return spark.createDataFrame(NAMES, "id bigint, name string")


def test_fuzzy_pairs_match_duckdb_bruteforce(spark):
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(
            _fixture(spark), "id", "name", max_dist=4, band=8
        ).collect()
    }
    want = {
        (a, b, d)
        for a, b, d in duckdb.sql(
            "WITH t AS (SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{n}')" for i, n in NAMES)
            + ") v(id, name)) "
            "SELECT a.id, b.id, levenshtein(a.name, b.name) AS d "
            "FROM t a JOIN t b ON a.id < b.id "
            "AND split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1) "
            "WHERE levenshtein(a.name, b.name) <= 4"
        ).fetchall()
    }
    # brute force within first-token blocks == the blocked+banded plan
    # (all fixture lengths sit within one band of each other)
    assert got == want
    assert (1, 2, 1) in got and (4, 5, 1) in got and (7, 8, 2) in got
    assert not any(9 in (a, b) for a, b, _ in got)


def test_fuzzy_pairs_block_cap_drops_mega_block(spark):
    # 12 clones of one name -> 66 pairs uncapped; cap at 10 removes the
    # whole block, the small block survives
    rows = [(i, "hot block name") for i in range(12)] + [
        (100, "cold pair x"),
        (101, "cold pair y"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    uncapped = fuzzy_pairs(df, "id", "name", max_dist=3, max_block_size=1000)
    capped = fuzzy_pairs(df, "id", "name", max_dist=3, max_block_size=10)
    assert uncapped.count() == 66 + 1
    got = capped.collect()
    assert len(got) == 1 and got[0]["id_a"] == 100 and got[0]["id_b"] == 101


def test_length_prefilter_is_conservative(spark):
    # pairs differing by > max_dist in length can never match: the
    # pre-filter must not change the result, only the work
    df = _fixture(spark)
    loose = fuzzy_pairs(df, "id", "name", max_dist=1)
    assert {(r["id_a"], r["id_b"]) for r in loose.collect()} == {
        (1, 2),
        (4, 5),
    }


def test_block_key_groups_by_first_token(spark):
    df = spark.createDataFrame(
        [("Acme Widget",), ("acme  other",), ("bolt thing",)], "name string"
    )
    keys = [
        r["k"] for r in df.select(block_key_expr("name").alias("k")).collect()
    ]
    assert keys[0].startswith("acme|") and keys[1].startswith("acme|")
    assert keys[2].startswith("bolt|")


def test_registered_query_matches_duckdb(spark, sf_dir):
    """The registered dictionary-matching query vs a DuckDB brute-force
    within the same first-token blocks — the rows-only query's oracle."""
    from etl_hero_spark.registry import all_queries

    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in all_queries()["fuzzy_pairs_parts"](spark, sf_dir).collect()
    }
    want = set(
        duckdb.sql(
            "WITH t AS (SELECT DISTINCT p_name AS name FROM "
            f"'{sf_dir}/part.parquet'), "
            "k AS (SELECT name, split_part(lower(trim(name)), ' ', 1) AS f "
            "FROM t) "
            "SELECT a.name, b.name, levenshtein(a.name, b.name) "
            "FROM k a JOIN k b ON a.f = b.f AND a.name < b.name "
            "WHERE levenshtein(a.name, b.name) <= 3"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_resolve_entities_semantics(spark):
    from etl_hero_spark.er import resolve_entities

    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corpx"),   # dist 1 from #1
            (3, "acme corpxy"),  # dist 1 from #2, 2 from #1 -> same chain
            (10, "zenith labs"),
            (11, "zenith labz"),  # dist 1 from #10
            (20, "solo entity"),
        ],
        "id long, name string",
    )
    rows = {
        r["id"]: (r["canonical_id"], r["is_canonical"])
        for r in resolve_entities(df, "id", "name", max_dist=2).collect()
    }
    assert rows[1] == (1, 1) and rows[2] == (1, 0) and rows[3] == (1, 0)
    assert rows[10] == (10, 1) and rows[11] == (10, 0)
    assert rows[20] == (20, 1)
    assert len(rows) == 6


def test_resolve_entities_consistent_with_pairs(spark, sf_dir):
    """Every matched pair must share a canonical id, every record gets
    exactly one row, and each group has exactly one canonical member."""
    import pyspark.sql.functions as SF

    from etl_hero_spark.registry_ext import q_er_resolve_parts

    res = q_er_resolve_parts(spark, sf_dir)
    n_in = (
        spark.read.parquet(f"{sf_dir}/part.parquet").count()
    )
    rows = res.collect()
    assert len(rows) == n_in
    by_group = {}
    for r in rows:
        by_group.setdefault(r["canonical_id"], []).append(r)
    for cid, members in by_group.items():
        assert sum(m["is_canonical"] for m in members) == 1
        assert min(m["p_partkey"] for m in members) == cid
    # the linkage property itself: every matched candidate pair must
    # land in the same canonical group
    from etl_hero_spark.er import fuzzy_pairs

    names = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_name")
        .withColumn("p_name", SF.lower(SF.col("p_name")))
    )
    pairs = fuzzy_pairs(
        names, id_col="p_partkey", name_col="p_name", max_dist=2,
        band=64, max_block_size=10_000,
    ).select("id_a", "id_b").collect()
    canon = {r["p_partkey"]: r["canonical_id"] for r in rows}
    assert pairs, "fixture produced no candidate pairs"
    for pr in pairs:
        assert canon[pr["id_a"]] == canon[pr["id_b"]], pr
