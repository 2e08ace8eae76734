"""Dedup ladder tests: each approximate rung is validated against the
exact n-gram Jaccard ground truth on the sf0.001 documents fixture."""

import pyspark.sql.functions as F
import pytest

from etl_hero_spark import dedup


@pytest.fixture(scope="module")
def docs_with_neardups(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clones = (
        d.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz9q")))
    )
    return d.unionByName(clones).cache()


def test_exact_dedup_collapses_normalized_clones(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clones = (
        d.withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.upper(F.col("text")))
    )
    out = dedup.dedup_exact_content(d.unionByName(clones))
    assert out.count() == d.count()
    # keep-first: all survivors are the original (small) ids
    assert out.agg(F.max("doc_id")).first()[0] < 1000000


def test_ngram_jaccard_finds_injected_pairs(docs_with_neardups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_neardups, threshold=0.8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {
        (r["doc_id"], r["doc_id"] + 1000000)
        for r in docs_with_neardups.filter(F.col("doc_id") % 25 == 0)
        .filter(F.col("doc_id") < 1000000)
        .select("doc_id")
        .collect()
    }
    assert expected <= got  # all injected pairs found


def test_jaccard_values_bounded(docs_with_neardups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_neardups, threshold=0.8)
    bad = pairs.filter((F.col("jaccard") < 0.8) | (F.col("jaccard") > 1.0))
    assert bad.count() == 0


def test_minhash_recall_vs_exact(docs_with_neardups):
    """MinHash-LSH at a low threshold must recover (almost) all exact
    Jaccard>=0.8 pairs — the standard candidate-generation guarantee."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs_with_neardups, threshold=0.8).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs_with_neardups, threshold=0.5).collect()
    }
    assert exact, "fixture must produce exact pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "entirely other words here")],
        "doc_id long, text string",
    )
    buckets = dedup.simhash_buckets(df).collect()
    assert len(buckets) == 1
    assert buckets[0]["ids"] == [1, 2]


def test_simhash_candidates_cover_near_dups(docs_with_neardups):
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_candidate_pairs(
            docs_with_neardups, max_hamming=6
        ).collect()
    }
    expected = {
        (r["doc_id"], r["doc_id"] + 1000000)
        for r in docs_with_neardups.filter(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 1000000)
        ).select("doc_id").collect()
    }
    recall = len(expected & cand) / len(expected)
    assert recall >= 0.8, f"simhash recall {recall}"


def test_ngram_jaccard_df_cap_noop_when_above_corpus_max(docs_with_neardups):
    """Default cap (1000) exceeds any fixture shingle's document frequency,
    so results are identical to an effectively-uncapped run."""
    lo = dedup.ngram_jaccard_pairs(docs_with_neardups, threshold=0.8)
    hi = dedup.ngram_jaccard_pairs(
        docs_with_neardups, threshold=0.8, max_shingle_df=10**9
    )
    assert sorted(map(tuple, lo.collect())) == sorted(map(tuple, hi.collect()))


def test_ngram_jaccard_df_cap_shrinks_join_input(spark):
    """With a tiny cap, stop shingles leave the join sides: a corpus where
    every doc shares one hot shingle must produce zero candidate pairs at
    cap=1 while keeping exact set sizes (no crash, no residual pairs)."""
    docs = [(i, f"common shingle base unique{i} word{i} tail{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # every doc contains the shingle "common shingle base" (DF=20)
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=1000)
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=1)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_connected_components_chain_and_islands(spark):
    """A 9-node path (diameter >> 2 rounds without pointer jumping), a
    triangle, and a pair must each collapse to their min id."""
    from etl_hero_spark.dedup import connected_components

    edges = [
        # path 1-2-3-...-9 given as far-apart links
        *[(i, i + 1) for i in range(1, 9)],
        # triangle 20-21-22 (redundant edge)
        (20, 21), (21, 22), (20, 22),
        # simple pair
        (30, 31),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {
        **{i: 1 for i in range(1, 10)},
        **{i: 20 for i in (20, 21, 22)},
        30: 30, 31: 30,
    }


def test_connected_components_edge_order_invariant(spark):
    """Reversed/duplicated edges and unordered pairs give the same
    components."""
    from etl_hero_spark.dedup import connected_components

    df = spark.createDataFrame(
        [(5, 3), (3, 5), (7, 5), (1, 7), (1, 7)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {1: 1, 3: 1, 5: 1, 7: 1}


def test_assign_dedup_clusters_canonical_flags(spark):
    """Docs in no pair are their own singleton cluster; exactly one
    canonical per cluster — the minimum id."""
    from etl_hero_spark.dedup import assign_dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = assign_dedup_clusters(docs, pairs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in rows}
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0),
        10: (10, 1), 11: (10, 0),
        99: (99, 1),
    }
    # exactly one canonical per cluster
    per_cluster = {}
    for cid, can in got.values():
        per_cluster[cid] = per_cluster.get(cid, 0) + can
    assert all(v == 1 for v in per_cluster.values())


def test_contamination_flags_shared_ngram(spark):
    """A doc sharing an 8-gram with the benchmark is flagged; one
    sharing only shorter overlaps is not."""
    from etl_hero_spark.dedup import decontaminate, flag_benchmark_contamination

    eight = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"prefix words {eight} suffix words here"),
            (2, "alpha beta gamma delta nothing else shared here at all"),
            (3, "completely unrelated text with plenty of words inside it"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"question: {eight} answer: iota")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in flag_benchmark_contamination(docs, bench).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0}
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench).collect()
    )
    assert kept == [2, 3]


def test_decontamination_matches_duckdb(spark, sf_dir):
    """Cross-engine check of the registry fixture (rows-only in the
    driver: the oracle window is full) — DuckDB computes the same
    8-gram overlap flags."""
    import duckdb

    from etl_hero_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    got = {
        r["doc_id"]: r["contaminated"]
        for r in REGISTRY["decontaminate_vs_benchmark"]
        .spark(spark, sf_dir)
        .collect()
    }
    toks = (
        "CASE WHEN length(trim(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) = 0 "
        "THEN [] ELSE string_split_regex(trim(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), '\\s+') END"
    )
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks})-7,0)), "
        f"i -> concat_ws(' ', {', '.join(f'({toks})[i+{j}]' for j in range(8))}))"
    )
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"WITH d AS (SELECT doc_id, text FROM '{sf_dir}/documents.parquet'), "
            f"ds AS (SELECT doc_id, unnest({grams}) AS g FROM d), "
            f"bs AS (SELECT DISTINCT unnest({grams}) AS g FROM d WHERE doc_id % 50 = 0), "
            "hits AS (SELECT DISTINCT doc_id FROM ds JOIN bs USING (g)) "
            "SELECT d.doc_id, CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END "
            "FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        ).fetchall()
    }
    assert got == want
    # the fixture has real signal: benchmark members are contaminated
    assert sum(got.values()) >= len([k for k in got if k % 50 == 0])


def test_minhash_index_roundtrip_equals_self_join(spark, sf_dir, tmp_path):
    """The persisted-index incremental path must report exactly the
    cross (batch x corpus) subset of what the self-join form reports on
    the union — same seed, same hash family, same est_jaccard."""
    import pyspark.sql.functions as F

    from etl_hero_spark.dedup import (
        minhash_lsh_pairs,
        pairs_against_minhash_index,
        read_minhash_index,
        write_minhash_index,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = (
        corpus.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz9q")))
    )
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path)
    got = {
        (r["batch_id"], r["corpus_id"], r["est_jaccard"])
        for r in pairs_against_minhash_index(
            batch, read_minhash_index(spark, path), threshold=0.5
        ).collect()
    }
    union_pairs = minhash_lsh_pairs(
        corpus.unionByName(batch), threshold=0.5
    ).collect()
    want = {
        # batch ids are shifted by 1e6 -> the larger id of a cross pair
        (r["id_b"], r["id_a"], r["est_jaccard"])
        for r in union_pairs
        if r["id_b"] >= 1000000 > r["id_a"]
    }
    assert got == want and len(got) > 0


def test_dedup_against_index_keeps_only_novel(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from etl_hero_spark.dedup import (
        dedup_against_minhash_index,
        read_minhash_index,
        write_minhash_index,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clones = (
        corpus.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz9q")))
    )
    novel = spark.createDataFrame(
        [(5000001, "totally fresh words nobody wrote before qq ww ee rr")],
        "doc_id bigint, text string",
    )
    batch = clones.select("doc_id", "text").unionByName(novel)
    path = str(tmp_path / "mh_index2")
    write_minhash_index(corpus, path)
    kept = dedup_against_minhash_index(
        batch, read_minhash_index(spark, path), threshold=0.5
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 5000001 in ids  # novel survives
    assert not any(i >= 1000000 and i < 2000000 for i in ids)  # clones dropped


def test_incremental_query_flags(spark, sf_dir):
    from etl_hero_spark.registry import all_queries

    rows = {
        r["doc_id"]: r["is_dup"]
        for r in all_queries()["dedup_incremental_minhash"](
            spark, sf_dir
        ).collect()
    }
    clones = [k for k in rows if 1000000 <= k < 2000000]
    novel = [k for k in rows if k >= 2000000]
    assert clones and novel
    assert all(rows[k] == 1 for k in clones)  # near-dups of corpus
    assert all(rows[k] == 0 for k in novel)  # genuinely new content


def test_fuzzy_decontamination_catches_paraphrased_leakage(spark):
    """A doc that lightly edits a benchmark item must flag fuzzy even
    when no exact 8-gram survives; unrelated docs must not."""
    from etl_hero_spark.dedup import (
        flag_benchmark_contamination,
        flag_benchmark_contamination_fuzzy,
    )

    bench_text = " ".join(
        f"benchmark question token{i} asks about item{i} in context"
        for i in range(12)
    )
    # light edit: change every 7th word -> every 8-gram window covers a
    # change (kills exact decon) while ~half the 2-shingles survive
    words = bench_text.split()
    for i in range(0, len(words), 7):
        words[i] = words[i] + "x"
    edited = " ".join(words)
    docs = spark.createDataFrame(
        [
            (1, bench_text),                       # verbatim copy
            (2, edited),                           # paraphrased copy
            (3, "completely unrelated content about gardening and soil "
                "quality with many words that never overlap at all ok"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id bigint, text string"
    )
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in flag_benchmark_contamination(docs, bench).collect()
    }
    fuzzy = {
        r["doc_id"]: (r["contaminated_fuzzy"], r["max_est_jaccard"])
        for r in flag_benchmark_contamination_fuzzy(
            docs, bench, n=2, n_bands=16, threshold=0.3
        ).collect()
    }
    assert exact[1] == 1 and exact[3] == 0
    assert exact[2] == 0  # the edit defeats exact 8-grams...
    assert fuzzy[2][0] == 1  # ...but not the minhash rung
    assert fuzzy[1] == (1, 1.0)  # verbatim estimates 1.0
    assert fuzzy[2][1] >= 0.3
    assert fuzzy[3][0] == 0 and fuzzy[3][1] is None


def test_dedup_keep_best_matches_duckdb_argmax(spark, sf_dir):
    """Quality-aware survivor selection == DuckDB arg_max over the same
    normalized fingerprint groups; uppercased clones never survive."""
    import duckdb

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clones = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.upper("text").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    pool = d.unionByName(clones)
    quality = (
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.dedup_keep_best(pool, quality, "doc_id", "text").collect()
    )
    # DuckDB replica: same normalization (lower + whitespace collapse,
    # textops.normalized_text_expr), same (quality, -id) arg-max
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""
            WITH pool AS (
              SELECT doc_id, text FROM '{sf_dir}/documents.parquet'
              UNION ALL
              SELECT doc_id + 1000000, upper(text)
              FROM '{sf_dir}/documents.parquet' WHERE doc_id % 9 = 0
            ), q AS (
              SELECT doc_id,
                md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                  AS fp,
                length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                  / greatest(length(text), 1) AS qual
              FROM pool
            )
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY fp ORDER BY qual DESC, doc_id ASC) AS rn
              FROM q
            ) WHERE rn = 1
            """
        ).fetchall()
    )
    assert kept == want
    assert not any(k >= 1_000_000 for k in kept)  # no clone survives


def test_dedup_keep_best_null_quality_loses(spark):
    df = spark.createDataFrame(
        [(1, "Same Text", None), (2, "same text", 0.5)],
        "doc_id long, text string, q double",
    )
    kept = [
        r["doc_id"]
        for r in dedup.dedup_keep_best(df, F.col("q"), "doc_id", "text").collect()
    ]
    assert kept == [2]


def test_keep_best_ids_rejects_string_ids(spark):
    """The id-ascending tie-break negates the id inside the arg-max
    struct; a string id would coerce to NULL there and the advertised
    '(quality desc, id asc)' tie-break would go silently
    nondeterministic — so the type is validated loudly."""
    import pytest

    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text")],
        "doc_id string, text string",
    )
    with pytest.raises(TypeError, match="numeric id"):
        dedup.keep_best_ids(df, F.length("text"), "doc_id", "text")


def test_repeated_spans_cross_doc_exact_boundaries(spark):
    """Two docs sharing a 10-token run: overlapping duplicated windows
    merge to ONE maximal span with exact token bounds in each doc."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j unique1 unique2"),
            (2, "x y a b c d e f g h i j z"),
            (3, "nothing shared here at all in this one"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in dedup.repeated_spans(docs, n=8).collect()
    }
    assert spans[1] == (0, 10, 3)   # windows at pos 0,1,2 merge
    assert spans[2] == (2, 12, 3)
    assert 3 not in spans


def test_repeated_spans_intra_doc_and_min_count(spark):
    """An 8-token run repeated INSIDE one doc counts (the paper's
    semantics); raising min_count above the occurrence count hides
    it."""
    docs = spark.createDataFrame(
        [(1, "p q r s t u v w p q r s t u v w")],
        "doc_id long, text string",
    )
    got = dedup.repeated_spans(docs, n=8).collect()
    assert [(r["span_start"], r["span_end"]) for r in got] == [(0, 16)]
    assert got[0]["n_windows"] == 2
    assert dedup.repeated_spans(docs, n=8, min_count=3).count() == 0


def test_strip_repeated_spans_rebuilds_clean_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j unique1 unique2"),
            (2, "x y a b c d e f g h i j z"),
            (3, "m n o p q r s t u v"),
            (4, "m n o p q r s t u v"),
            (5, "plain doc without any duplicated span inside it"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_stripped"], r["n_tokens_removed"])
        for r in dedup.strip_repeated_spans(docs, n=8).collect()
    }
    assert got[1] == ("unique1 unique2", 10)
    assert got[2] == ("x y z", 10)
    # fully-duplicated docs strip to empty, not NULL
    assert got[3] == ("", 10) and got[4] == ("", 10)
    # untouched doc keeps its (normalized) text, zero removed
    assert got[5] == (
        "plain doc without any duplicated span inside it", 0
    )


def test_strip_repeated_spans_giant_doc_cap(spark):
    """A single pathological document above max_doc_tokens must raise
    the family's loud scale error (naming the chunking alternative),
    not silently concentrate the ordered rebuild on one executor."""
    import pytest

    giant = " ".join(f"tok{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(1, giant), (2, "a b c d e f g h a b c d e f g h")],
        "doc_id long, text string",
    )
    with pytest.raises(dedup.SpanDocScaleError, match="chunk"):
        dedup.strip_repeated_spans(docs, n=8, max_doc_tokens=32)
    # below the cap the same call proceeds normally
    ok = dedup.strip_repeated_spans(docs, n=8, max_doc_tokens=64)
    assert ok.count() == 2


def test_pipeline_span_curate_composition(spark, sf_dir):
    """Capstone accounting == composing the stage operators by hand:
    keep-best dedup first, span-strip second; planted case clones
    never survive, boilerplate tokens are actually removed, and the
    per-source doc accounting is exact."""
    from etl_hero_spark.registry import all_queries

    rows = all_queries()["pipeline_span_curate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_case_clone_survivors"] == 0, r["source"]
        assert r["n_kept"] + r["n_emptied"] <= r["n_input"]
        assert r["tokens_kept"] > 0
    # the planted boilerplate exists: at least the %7==3 sources lost
    # span tokens
    assert sum(r["span_tokens_removed"] for r in rows) > 0
    # stage-by-stage recomputation of the global doc accounting
    import pyspark.sql.functions as F2

    from etl_hero_spark.textops import normalized_text_expr, tokens_expr

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    frag = d.filter(F2.col("doc_id") == 1).select(
        F2.array_join(
            F2.slice(tokens_expr(normalized_text_expr("text")), 1, 24),
            " ",
        ).alias("_frag")
    )
    wb = d.crossJoin(F2.broadcast(frag)).select(
        "doc_id",
        "source",
        F2.when(
            F2.col("doc_id") % 7 == 3,
            F2.concat_ws(" ", F2.col("text"), F2.col("_frag")),
        ).otherwise(F2.col("text")).alias("text"),
    )
    clones = wb.filter(F2.col("doc_id") % 9 == 0).select(
        (F2.col("doc_id") + 4_000_000).alias("doc_id"),
        "source",
        F2.upper("text").alias("text"),
    )
    pool = wb.unionByName(clones)
    quality = (
        F2.length(F2.regexp_replace("text", "[^a-z]", "")).cast("double")
        / F2.greatest(F2.length("text"), F2.lit(1))
    )
    survivors = dedup.dedup_keep_best(pool, quality, "doc_id", "text")
    stripped = dedup.strip_repeated_spans(survivors, n=8)
    n_kept = stripped.filter(F2.length("text_stripped") > 0).count()
    n_emptied = stripped.filter(F2.length("text_stripped") == 0).count()
    assert sum(r["n_kept"] for r in rows) == n_kept
    assert sum(r["n_emptied"] for r in rows) == n_emptied
    assert sum(r["n_input"] for r in rows) == pool.count()


def test_repeated_spans_incremental_equals_full_recompute(spark, tmp_path):
    """The incremental probe against the persisted window-count index
    returns byte-identical spans for batch documents as the corpus-wide
    recompute over corpus UNION batch — and finds the corpus-informed
    spans a batch-local recompute cannot see."""
    from etl_hero_spark.dedup import (
        repeated_spans,
        repeated_spans_incremental,
        write_span_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "completely different words with no overlap at all here ok"),
        ],
        "doc_id bigint, text string",
    )
    # batch doc 101 repeats doc 1's 8-token prefix (corpus count 1 +
    # batch count 1 -> span); doc 102 is novel; docs 103/104 share an
    # 8-token run only within the batch (intra-batch dup)
    run = "red blue green cyan pink gray gold teal"
    batch = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta eta theta tail"),
            (102, "nothing here repeats anything in the corpus truly"),
            (103, f"{run} ending one"),
            (104, f"{run} ending two"),
        ],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "span_idx")
    write_span_index(corpus, idx, n=8)
    inc = sorted(
        tuple(r)
        for r in repeated_spans_incremental(batch, idx, n=8).collect()
    )
    full = sorted(
        tuple(r)
        for r in repeated_spans(corpus.unionByName(batch), n=8)
        .filter(F.col("doc_id") >= 100)
        .collect()
    )
    assert inc == full and inc
    # the cross-corpus span on doc 101 exists ONLY via the index
    batch_local = {
        r["doc_id"] for r in repeated_spans(batch, n=8).collect()
    }
    inc_ids = {d for d, *_ in inc}
    assert 101 in inc_ids and 101 not in batch_local
    assert 103 in inc_ids and 104 in inc_ids  # intra-batch still found
    assert 102 not in inc_ids


def test_multi_config_candidates_match_per_config_form(docs_with_neardups):
    """minhash_lsh_candidates_multi (VERDICT r10 #3: one config-tagged
    band table + one self-join) must emit EXACTLY the per-config
    minhash_lsh_pairs(threshold=0.0) pair set for every config — same
    hash family, same md5 band keys, only the pipeline is shared."""
    configs = [(8, 4), (4, 8), (16, 2)]
    multi = dedup.minhash_lsh_candidates_multi(
        docs_with_neardups, configs, n_hashes=32
    ).collect()
    by_cfg = {}
    for r in multi:
        by_cfg.setdefault(
            (r["n_bands"], r["rows_per_band"]), set()
        ).add((r["id_a"], r["id_b"]))
    for b, rr in configs:
        single = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(
                docs_with_neardups,
                n_hashes=b * rr,
                n_bands=b,
                threshold=0.0,
            ).collect()
        }
        assert by_cfg.get((b, rr), set()) == single, (b, rr)
    assert any(by_cfg.values()), "fixture must produce candidates"


def test_multi_config_rejects_oversized_config(docs_with_neardups):
    import pytest

    with pytest.raises(ValueError):
        dedup.minhash_lsh_candidates_multi(
            docs_with_neardups, [(8, 8)], n_hashes=32
        )
