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


def test_gopher_quality_rules(spark):
    """Each Gopher rule must fire on a doc crafted to violate exactly it;
    a clean doc must pass all."""
    from etl_hero_spark.textops import gopher_filter, with_gopher_quality

    base = ("the be to of and that have with " + "word " * 52).strip()  # 60 words
    rows = [
        (1, base),                                       # passes everything
        (2, "the be short doc"),                         # word count < 50
        (3, ("the be to of and " + "# " * 55).strip()),  # symbol ratio
        (4, "\n".join(["- " + base] * 10)),              # bullet lines
        (5, "\n".join([base + " ..."] * 10)),            # ellipsis lines
        (6, ("the be to of and " + "12345 " * 55).strip()),  # alpha ratio
        (7, ("zz " * 60).strip()),                       # no required words
        (8, ("the be to of and " + "a " * 55).strip()),  # mean word len < 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in with_gopher_quality(df).collect()
    }
    assert got[1]["passes_gopher"] == 1
    assert got[2]["passes_gopher"] == 0 and got[2]["n_words"] < 50
    assert got[3]["passes_gopher"] == 0 and got[3]["symbol_ratio"] > 0.1
    assert got[4]["passes_gopher"] == 0 and got[4]["bullet_ratio"] > 0.9
    assert got[5]["passes_gopher"] == 0 and got[5]["ellipsis_ratio"] > 0.3
    assert got[6]["passes_gopher"] == 0 and got[6]["alpha_ratio"] < 0.8
    assert got[7]["passes_gopher"] == 0 and got[7]["n_required_hits"] < 2
    assert got[8]["passes_gopher"] == 0 and got[8]["mean_word_len"] < 3.0
    kept = [r["doc_id"] for r in gopher_filter(df).select("doc_id").collect()]
    assert kept == [1]


def test_gopher_filter_is_pure_codegen(spark, sf_dir):
    """The filter must stay JVM-side: no Python eval nodes in the plan."""
    import contextlib
    import io

    from etl_hero_spark.textops import with_gopher_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with_gopher_quality(docs).explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_redaction_order_and_counts(spark):
    """Each PII kind is masked and counted once; SSN/IP digits must not
    double-count as phones (stage order), and multiple matches count."""
    from etl_hero_spark.pii import redact_pii

    rows = [
        (1, "mail a@b.io and c.d+x@e-f.org end"),
        (2, "ssn 123-45-6789 mid"),
        (3, "ips 10.0.255.254 and 192.168.1.7"),
        (4, "call +1 (555) 123-4567 now"),
        (5, "clean text with no identifiers"),
        (6, "mix a@b.io 123-45-6789 10.0.0.1 +1 (555) 123-4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 2
    assert got[1]["text"] == "mail [EMAIL] and [EMAIL] end"
    assert got[2]["n_ssns"] == 1 and got[2]["n_phones"] == 0
    assert got[2]["text"] == "ssn [SSN] mid"
    assert got[3]["n_ips"] == 2 and got[3]["n_phones"] == 0
    assert got[3]["text"] == "ips [IP] and [IP]"
    assert got[4]["n_phones"] == 1
    assert got[4]["text"] == "call [PHONE] now"
    assert all(got[5][k] == 0 for k in ("n_emails", "n_ssns", "n_ips", "n_phones"))
    assert got[5]["text"] == rows[4][1]
    assert (
        got[6]["n_emails"], got[6]["n_ssns"], got[6]["n_ips"], got[6]["n_phones"]
    ) == (1, 1, 1, 1)
    assert got[6]["text"] == "mix [EMAIL] [SSN] [IP] [PHONE]"


def test_tfidf_top_terms_semantics(spark):
    import math

    # 'apple' only in doc 1 (idf ln(3)), 'the' in all three (idf 0)
    df = spark.createDataFrame(
        [
            (1, "apple apple the pie"),
            (2, "the banana pie"),
            (3, "the cherry"),
        ],
        "doc_id bigint, text string",
    )
    out = textops.tfidf_top_terms(df, "doc_id", "text", k=2)
    rows = {(r["doc_id"], r["rnk"]): r for r in out.collect()}
    top1 = rows[(1, 1)]
    assert top1["term"] == "apple" and top1["tf"] == 2
    assert abs(top1["tfidf"] - round(2 * math.log(3.0 / 1.0), 6)) < 1e-9
    # corpus-wide 'the' has idf 0 -> tfidf 0, ranked below content words
    assert rows[(2, 1)]["term"] in {"banana", "pie"}
    # exactly k rows per doc, ranks contiguous from 1
    assert sorted(k for k in rows) == [(d, r) for d in (1, 2, 3) for r in (1, 2)]


def test_tfidf_tie_breaks_by_term_ascending(spark):
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "other words")], "doc_id bigint, text string"
    )
    out = textops.tfidf_top_terms(df, "doc_id", "text", k=2)
    doc1 = [r["term"] for r in out.filter("doc_id = 1").orderBy("rnk").collect()]
    assert doc1 == ["alpha", "zeta"]  # equal tf and idf -> ascending term


def test_chunk_documents_covers_all_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(101))),  # 2 chunks of 100/20
            (2, "a b c"),  # single short chunk
            (3, ""),  # no tokens -> no rows
            (4, " ".join(f"x{i}" for i in range(15))),  # <= overlap -> 1 chunk
        ],
        "doc_id bigint, text string",
    )
    out = textops.chunk_documents(df, chunk_tokens=100, overlap=20)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [100, 21]
    # stride 80: chunk 1 starts at t80 -> 20-token overlap with chunk 0
    assert by_doc[1][1]["chunk_text"].split()[0] == "t80"
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_chunk_tokens"] == 15
    # every source token appears in at least one chunk
    covered = {t for r in by_doc[1] for t in r["chunk_text"].split()}
    assert covered == {f"t{i}" for i in range(101)}


def test_chunk_documents_matches_duckdb(spark, sf_dir):
    """Cross-engine oracle for the rows-only registered query: the same
    chunk math in DuckDB (generate_series + list_slice)."""
    import duckdb

    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in textops.chunk_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            chunk_tokens=40,
            overlap=10,
        ).collect()
    }
    want = set(
        duckdb.sql(
            "WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 "
            "THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS toks "
            f"FROM '{sf_dir}/documents.parquet'), "
            "n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0), "
            "c AS (SELECT doc_id, toks, nt, unnest(generate_series(0, "
            "greatest(1, cast(floor((nt - 10 - 1) / 30.0) as int) + 1) - 1)) AS chunk_id "
            "FROM n) "
            "SELECT doc_id, chunk_id, "
            "array_to_string(list_slice(toks, chunk_id*30 + 1, chunk_id*30 + 40), ' ') AS chunk_text, "
            "cast(len(list_slice(toks, chunk_id*30 + 1, chunk_id*30 + 40)) as int) AS n "
            "FROM c"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        textops.chunk_documents(df, chunk_tokens=10, overlap=10)


def test_top_ngram_repetition_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "ab cd ab cd ab"),  # 'ab cd' x2, 'cd ab' x2 -> tie, max gram
            (2, "x y z"),
            (3, "solo"),  # < 2 tokens -> no row
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in textops.top_ngram_repetition(df).collect()}
    assert rows[1]["top_ngram"] == "cd ab" and rows[1]["top_count"] == 2
    assert rows[1]["rep_char_frac"] == round(2 * 5 / 14, 6)
    assert rows[2]["top_count"] == 1
    assert 3 not in rows


def test_top_ngram_repetition_matches_duckdb(spark, sf_dir):
    import duckdb

    got = {
        tuple(r)
        for r in textops.top_ngram_repetition(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), n=2
        ).collect()
    }
    want = set(
        duckdb.sql(
            "WITH t AS (SELECT doc_id, length(text) AS n_chars, "
            "CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(text), '\\s+') END AS toks "
            f"FROM '{sf_dir}/documents.parquet'), "
            "g AS (SELECT doc_id, n_chars, unnest(list_transform("
            "generate_series(1, greatest(len(toks) - 1, 0)), "
            "i -> toks[i] || ' ' || toks[i+1])) AS gram "
            "FROM t WHERE len(toks) >= 2), "
            "c AS (SELECT doc_id, n_chars, gram, count(*) AS cnt "
            "FROM g GROUP BY doc_id, n_chars, gram), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY cnt DESC, gram DESC) AS rn FROM c) "
            "SELECT doc_id, gram, cnt, "
            "round(cast(cnt * length(gram) as double) "
            "/ cast(n_chars as double), 6) FROM r WHERE rn = 1"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_c4_line_filter_rules(spark):
    doc = "\n".join(
        [
            "This line is a proper sentence.",  # kept
            "Too short.",  # < 3 words
            "no terminal punctuation here",  # no . ! ? "
            "Enable javascript to view this page.",  # boilerplate marker
            "We use cookies; see our Cookie Policy today.",  # marker (ci)
            'He said "stop right there" and left?',  # kept (ends ?)
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "if (x) { return; }")],
                               "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in textops.with_c4_line_filter(df).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 6 and r1["n_lines_kept"] == 2
    assert r1["clean_text"].splitlines() == [
        "This line is a proper sentence.",
        'He said "stop right there" and left?',
    ]
    assert r1["c4_code_like"] == 0
    assert rows[2]["c4_code_like"] == 1


def test_c4_line_stats_match_duckdb(spark, sf_dir):
    import duckdb

    from etl_hero_spark.registry import all_queries

    got = {
        tuple(r)
        for r in all_queries()["text_c4_line_stats"](spark, sf_dir).collect()
    }
    markers = ["javascript", "cookie policy", "privacy policy",
               "terms of use", "lorem ipsum"]
    marker_pred = " AND ".join(
        f"NOT contains(lower(trim(x)), '{m}')" for m in markers
    )
    want = set(
        duckdb.sql(
            "SELECT doc_id, cast(len(string_split(text, chr(10))) as int), "
            "cast(len(list_filter(string_split(text, chr(10)), "
            f"x -> len(string_split_regex(trim(x), '\\s+')) >= 3 AND {marker_pred}"
            ")) as int), "
            "cast(contains(text, '{') as int) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_global_line_dedup_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "Welcome to example.com\nunique first line.\n\nshared footer"),
            (2, "Welcome to example.com\nanother body line.\nshared footer"),
            (3, "totally original doc"),
            (4, "shared footer"),  # every line boilerplate -> empty survivor
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r for r in textops.global_line_dedup(df, min_docs=2).collect()
    }
    assert rows[1]["clean_text"] == "unique first line.\n"
    assert rows[1]["n_lines"] == 4 and rows[1]["n_lines_removed"] == 2
    assert rows[2]["clean_text"] == "another body line."
    assert rows[3]["clean_text"] == "totally original doc"
    assert rows[3]["n_lines_removed"] == 0
    assert rows[4]["clean_text"] == "" and rows[4]["n_lines_removed"] == 1


def test_global_line_dedup_matches_duckdb(spark, sf_dir):
    """Cross-engine oracle for the rows-only registered query."""
    import duckdb

    got = {
        (r["doc_id"], r["clean_text"], r["n_lines"], r["n_lines_removed"])
        for r in textops.global_line_dedup(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), min_docs=2
        ).collect()
    }
    want = set(
        duckdb.sql(
            f"WITH d AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls "
            f"FROM '{sf_dir}/documents.parquet'), "
            "l0 AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS ord FROM d), "
            "l AS (SELECT doc_id, ord, ls[ord] AS line FROM l0), "
            "b AS (SELECT trim(line) AS tl FROM l WHERE trim(line) <> '' "
            "GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT doc_id, ord, line FROM l WHERE trim(line) = '' "
            "OR trim(line) NOT IN (SELECT tl FROM b)), "
            "r AS (SELECT doc_id, count(*) AS n_kept, "
            "string_agg(line, chr(10) ORDER BY ord) AS cl FROM kept GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(r.cl, '') AS clean_text, "
            "cast(len(d.ls) AS int) AS n_lines, "
            "cast(len(d.ls) - coalesce(r.n_kept, 0) AS int) AS n_lines_removed "
            "FROM d LEFT JOIN r USING (doc_id)"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_global_line_dedup_registry_query_matches_duckdb(spark, sf_dir):
    """The registered query appends a shared footer to every 7th doc
    (the fixture corpus is dup-free); the pass must strip exactly those
    lines, matching the same augmentation + removal math in DuckDB."""
    import duckdb

    from etl_hero_spark.registry_ext import _SHARED_FOOTER, q_text_global_line_dedup

    got = {
        (r["doc_id"], r["clean_text"], r["n_lines"], r["n_lines_removed"])
        for r in q_text_global_line_dedup(spark, sf_dir).collect()
    }
    want = set(
        duckdb.sql(
            "WITH src AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
            f"text || chr(10) || '{_SHARED_FOOTER}' ELSE text END AS text "
            f"FROM '{sf_dir}/documents.parquet'), "
            "d AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM src), "
            "l0 AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS ord FROM d), "
            "l AS (SELECT doc_id, ord, ls[ord] AS line FROM l0), "
            "b AS (SELECT trim(line) AS tl FROM l WHERE trim(line) <> '' "
            "GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT doc_id, ord, line FROM l WHERE trim(line) = '' "
            "OR trim(line) NOT IN (SELECT tl FROM b)), "
            "r AS (SELECT doc_id, count(*) AS n_kept, "
            "string_agg(line, chr(10) ORDER BY ord) AS cl FROM kept GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(r.cl, '') AS clean_text, "
            "cast(len(d.ls) AS int) AS n_lines, "
            "cast(len(d.ls) - coalesce(r.n_kept, 0) AS int) AS n_lines_removed "
            "FROM d LEFT JOIN r USING (doc_id)"
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # every 7th doc lost exactly its footer line, nothing else
    removed = {t[0]: t[3] for t in got}
    assert all(n == 1 for i, n in removed.items() if i % 7 == 0)
    assert all(n == 0 for i, n in removed.items() if i % 7 != 0)


def test_unigram_logprob_semantics(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, "  ")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textops.unigram_logprob_score(df, hot_k=1).collect()
    }
    # corpus: a x3, b x1, total 4
    la, lb = math.log(3 / 4), math.log(1 / 4)
    assert rows[1]["n_scored_tokens"] == 3
    assert abs(rows[1]["mean_logprob"] - (2 * la + lb) / 3) < 1e-8
    assert abs(rows[2]["mean_logprob"] - la) < 1e-8
    assert 3 not in rows  # blank doc has nothing to score


def test_unigram_logprob_matches_duckdb(spark, sf_dir):
    """Cross-engine check for the rows-only registered query; ln differs
    by ulps across libm implementations, so mean_logprob compares within
    1e-8 (token counts are exact)."""
    import duckdb

    from etl_hero_spark.registry_ext import q_text_unigram_logprob

    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["mean_logprob"])
        for r in q_text_unigram_logprob(spark, sf_dir).collect()
    }
    want = {
        d: (n, m)
        for d, n, m in duckdb.sql(
            "WITH t AS (SELECT doc_id, lower(unnest("
            "CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(text), '\\s+') END)) AS tok "
            f"FROM '{sf_dir}/documents.parquet'), "
            "v AS (SELECT tok, count(*) AS n FROM t GROUP BY tok), "
            "tot AS (SELECT sum(n) AS total FROM v), "
            "lp AS (SELECT tok, round(ln(cast(n as double) / total), 9) AS logp "
            "FROM v CROSS JOIN tot) "
            "SELECT doc_id, cast(count(*) as int), "
            "round(cast(sum(cast(logp as decimal(20,9))) as double) / count(*), 9) "
            "FROM t JOIN lp USING (tok) GROUP BY doc_id"
        ).fetchall()
    }
    assert set(got) == set(want) and len(got) > 0
    for d, (n, m) in got.items():
        assert n == want[d][0]
        assert abs(m - want[d][1]) < 1e-8, (d, m, want[d][1])


def test_unigram_logprob_hot_tokens_broadcast(spark, sf_dir):
    """The skewed head of the token join must be a broadcast join."""
    from etl_hero_spark.registry_ext import q_text_unigram_logprob

    plan = (
        q_text_unigram_logprob(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pipeline_curate_v2_composition(spark, sf_dir):
    """The capstone chain must agree with its stages applied one at a
    time, and the mixture must respect the per-source budgets."""
    from etl_hero_spark.registry_ext import q_pipeline_curate_v2

    rows = q_pipeline_curate_v2(spark, sf_dir).collect()
    assert rows, "curation selected nothing"
    weights = {f"src{i}": 600 for i in range(5)}  # 0.2 * 3000 each
    by_src = {}
    for r in rows:
        assert r["source"] in weights
        assert r["mean_logprob"] < 0  # ln of probabilities
        by_src.setdefault(r["source"], []).append(r)
    for s, docs in by_src.items():
        total = sum(r["n_tokens"] for r in docs)
        assert total < weights[s] + max(r["n_tokens"] for r in docs)
    # stage equivalence: every selected doc survives line-dedup + gopher
    from etl_hero_spark import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cleaned = textops.global_line_dedup(docs, min_docs=2).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    survivors = {
        r["doc_id"]
        for r in textops.gopher_filter(
            cleaned, min_words=20, min_required_hits=1
        ).collect()
    }
    assert {r["doc_id"] for r in rows} <= survivors


def test_persisted_unigram_vocab_equals_in_memory(spark, sf_dir, tmp_path):
    """Scoring the corpus against its own PERSISTED vocab must equal the
    in-memory one-shot form exactly (same rounding, same join split)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vpath = str(tmp_path / "vocab.parquet")
    textops.unigram_vocab(docs).write.parquet(vpath)
    stored = spark.read.parquet(vpath)
    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["mean_logprob"])
        for r in textops.score_with_unigram_vocab(docs, stored).collect()
    }
    want = {
        r["doc_id"]: (r["n_scored_tokens"], r["mean_logprob"])
        for r in textops.unigram_logprob_score(docs).collect()
    }
    assert got == want and len(got) > 0


def test_unigram_oov_floor(spark):
    """Unseen tokens score at ln(1/(total+1)) — strictly below every
    in-vocab token's logprob."""
    import math

    corpus = spark.createDataFrame(
        [(1, "a a b")], "doc_id bigint, text string"
    )
    vocab = textops.unigram_vocab(corpus)  # total 3
    new_batch = spark.createDataFrame(
        [(10, "a zzz")], "doc_id bigint, text string"
    )
    r = textops.score_with_unigram_vocab(new_batch, vocab).first()
    la, floor = math.log(2 / 3), math.log(1 / 4)
    assert r["n_scored_tokens"] == 2
    assert abs(r["mean_logprob"] - (round(la, 9) + round(floor, 9)) / 2) < 1e-8


def test_global_line_dedup_idempotent(spark, sf_dir):
    """Applying the pass twice equals applying it once: the first pass
    removes every line with corpus DF >= min_docs, so nothing crosses
    the threshold on the rerun (removal can only lower DFs)."""
    from etl_hero_spark.registry_ext import q_text_global_line_dedup

    once = q_text_global_line_dedup(spark, sf_dir).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = textops.global_line_dedup(once, min_docs=2)
    changed = twice.filter(F.col("n_lines_removed") > 0).count()
    assert changed == 0


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------


def _bigram_reference(corpus, batch, alpha):
    """Independent Python implementation of the smoothed bigram score."""
    import math
    from collections import Counter

    pair_c = Counter()
    for _id, text in corpus:
        toks = text.strip().lower().split()
        pair_c.update(zip(toks, toks[1:]))
    ctx_c = Counter()
    vocab_tokens = set()
    for (w1, w2), n in pair_c.items():
        ctx_c[w1] += n
        vocab_tokens.update((w1, w2))
    v = float(len(vocab_tokens))
    out = {}
    for _id, text in batch:
        toks = text.strip().lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        from decimal import Decimal

        lps = [
            round(
                math.log(
                    (pair_c.get(p, 0) + alpha) / (ctx_c.get(p[0], 0) + alpha * v)
                ),
                9,
            )
            for p in pairs
        ]
        # exact decimal sum then one float divide, NO final rounding —
        # bit-identical to the engine (see score_with_bigram_vocab)
        s = float(sum(Decimal(f"{lp:.9f}") for lp in lps))
        out[_id] = (len(pairs), s / len(lps))
    return out


BIGRAM_CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat on a log"),
    (4, "single"),  # no transitions -> dropped
    (5, "  "),  # blank -> dropped
]


def test_bigram_self_score_matches_reference(spark):
    from etl_hero_spark.textops import bigram_logprob_score

    df = spark.createDataFrame(BIGRAM_CORPUS, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_transitions"], r["mean_bigram_logprob"])
        for r in bigram_logprob_score(df, alpha=0.1).collect()
    }
    want = _bigram_reference(BIGRAM_CORPUS, BIGRAM_CORPUS, 0.1)
    assert got == want
    assert 4 not in got and 5 not in got


def test_bigram_incremental_batch_with_oov(spark):
    """Scoring a NEW batch against a persisted vocab: unseen pairs and
    unseen contexts take the smoothed floor, matching the reference."""
    from etl_hero_spark.textops import bigram_vocab, score_with_bigram_vocab

    corpus_df = spark.createDataFrame(
        BIGRAM_CORPUS, "doc_id bigint, text string"
    )
    batch = [
        (10, "the cat sat"),          # all known transitions
        (11, "cat the"),              # known tokens, unseen transition
        (12, "entirely novel words"),  # unseen contexts
    ]
    batch_df = spark.createDataFrame(batch, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_transitions"], r["mean_bigram_logprob"])
        for r in score_with_bigram_vocab(
            batch_df, bigram_vocab(corpus_df), alpha=0.5
        ).collect()
    }
    want = _bigram_reference(BIGRAM_CORPUS, batch, 0.5)
    assert got == want
    # word salad scores strictly below fluent text
    assert got[11][1] < got[10][1]


def test_bigram_catches_shuffled_text_unigram_cannot(spark):
    """The discriminating property: a doc with the corpus's own words in
    impossible order scores low on bigram while its unigram score equals
    the fluent doc's (same bag of words)."""
    from etl_hero_spark.textops import (
        bigram_vocab,
        score_with_bigram_vocab,
        score_with_unigram_vocab,
        unigram_vocab,
    )

    corpus = [(i, "the cat sat on the mat") for i in range(20)]
    corpus_df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
        "doc_id bigint, text string",
    )
    uni = {
        r["doc_id"]: r["mean_logprob"]
        for r in score_with_unigram_vocab(
            probe, unigram_vocab(corpus_df)
        ).collect()
    }
    bi = {
        r["doc_id"]: r["mean_bigram_logprob"]
        for r in score_with_bigram_vocab(
            probe, bigram_vocab(corpus_df)
        ).collect()
    }
    assert uni[100] == uni[101]  # unigram is blind to order
    assert bi[101] < bi[100]  # bigram is not


def test_credit_card_luhn_validation(spark):
    """Luhn separates real card numbers from arbitrary digit runs — the
    validated count is the PII signal, the candidate count shows the
    false-positive mass a regex-only scrubber would redact. Python
    reference implementation cross-checks every candidate."""
    from etl_hero_spark.pii import redact_credit_cards, with_credit_card_flags

    rows = [
        (1, "pay 4539 1488 0343 6467 now"),       # valid visa (test no.)
        (2, "pay 4539 1488 0343 6468 now"),       # one digit off
        (3, "order 1234 5678 9012 3456 shipped"),  # random 16 digits
        (4, "call 555 123 4567"),                  # too short: no candidate
        (5, "378282246310005 amex"),               # valid amex (test no.)
        (6, "5555-5555-5555-4444 mc"),             # valid mc (test no.)
        (7, "no numbers at all"),
    ]

    def luhn_ref(s):
        ds = [int(c) for c in s if c.isdigit()]
        total = 0
        for i, d in enumerate(reversed(ds)):
            total += sum(divmod(d * 2, 10)) if i % 2 == 1 else d
        return len(ds) >= 13 and total % 10 == 0

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_ccard_candidates"], r["n_ccards"])
        for r in with_credit_card_flags(df).collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (0, 0),
                   5: (1, 1), 6: (1, 1), 7: (0, 0)}
    for _id, text in rows:
        import re

        cands = re.findall(r"[0-9](?:[0-9 -]{11,17})[0-9]", text)
        assert got[_id][1] == sum(luhn_ref(c) for c in cands)
    # redaction masks every candidate (safe-over-precise)
    red = {
        r["doc_id"]: r["text"]
        for r in redact_credit_cards(df).collect()
    }
    for i in (1, 2, 3, 5, 6):
        assert "[CCARD]" in red[i]
    assert red[4] == rows[3][1] and red[7] == rows[6][1]


def test_dedup_lines_within_doc(spark):
    from etl_hero_spark.textops import dedup_lines_within_doc

    rows = [
        (1, "nav bar\ncontent one\n\nnav bar\ncontent two\n\nnav bar"),
        (2, "unique a\nunique b"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in dedup_lines_within_doc(df).collect()}
    # first occurrence kept, later repeats dropped, blanks preserved
    assert got[1]["clean_text"] == "nav bar\ncontent one\n\ncontent two\n"
    assert got[1]["n_lines_removed"] == 2
    assert got[2]["clean_text"] == rows[1][1]
    assert got[2]["n_lines_removed"] == 0
    assert got[3]["n_lines_removed"] == 0


def test_dedup_lines_within_doc_matches_duckdb(spark, sf_dir):
    import duckdb

    from etl_hero_spark.textops import dedup_lines_within_doc

    got = sorted(
        (r["doc_id"], r["clean_text"], r["n_lines"], r["n_lines_removed"])
        for r in dedup_lines_within_doc(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM read_parquet('{sf_dir}/documents.parquet')
            ), lines AS (
              SELECT doc_id, ls[i] AS line, i AS pos
              FROM split, UNNEST(generate_series(1, len(ls))) AS t(i)
            ), kept AS (
              SELECT * FROM (
                SELECT doc_id, line, pos, row_number() OVER (
                  PARTITION BY doc_id, trim(line) ORDER BY pos) AS occ
                FROM lines
              ) WHERE occ = 1 OR length(trim(line)) = 0
            ), rebuilt AS (
              SELECT doc_id, count(*) AS n_kept,
                string_agg(line, chr(10) ORDER BY pos) AS clean_text
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.clean_text, ''),
              len(string_split(d.text, chr(10))),
              CAST(len(string_split(d.text, chr(10)))
                   - coalesce(r.n_kept, 0) AS INT)
            FROM read_parquet('{sf_dir}/documents.parquet') d
            LEFT JOIN rebuilt r USING (doc_id)
            """
        ).fetchall()
    )
    assert got == want



def test_clean_text_normalization(spark):
    from etl_hero_spark.textops import with_clean_text

    rows = [
        (1, "zero\u200bwidth\ufeff and\u00a0nbsp"),
        (2, "\u201ccurly\u201d \u2018quotes\u2019 \u2013 dash \u2014 em\u2026"),
        (3, "ctrl\x00chars\x07here\x9fbut\tkeep\ntabs"),
        (4, "line one   \nline two\n\n\n\n\nline three\r\nwindows"),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in with_clean_text(df).collect()}
    assert got[1]["text"] == "zerowidth and nbsp"
    assert got[2]["text"] == "\"curly\" 'quotes' - dash - em..."
    assert got[3]["text"] == "ctrlcharsherebut\tkeep\ntabs"
    assert got[4]["text"] == "line one\nline two\n\nline three\nwindows"
    assert got[5]["text"] == "already clean"
    assert got[5]["n_chars_removed"] == 0
    assert got[1]["n_chars_removed"] > 0
    # canonicalization makes cosmetic variants hash-identical
    from etl_hero_spark.textops import clean_text_expr, fingerprint_expr

    pair = spark.createDataFrame(
        [(1, "hello\u00a0world"), (2, "hello world")],
        "id bigint, text string",
    ).withColumn("fp", fingerprint_expr(clean_text_expr("text")))
    fps = [r["fp"] for r in pair.collect()]
    assert fps[0] == fps[1]


# ---------------------------------------------------------------------------
# BM25 (round 4)
# ---------------------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    """Full BM25 model on a small fixture: Lucene-smoothed idf,
    saturating tf, doc-length normalization — mirrored exactly in
    Python floats."""
    import math

    docs = [
        (1, "apple apple the pie"),
        (2, "the banana pie pie pie"),
        (3, "the cherry"),
        (4, "apple banana cherry the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    k1, b = 1.2, 0.75
    out = textops.bm25_top_terms(df, "doc_id", "text", k=10, k1=k1, b=b)
    got = {(r["id"], r["term"]): (r["tf"], r["dl"], r["bm25"]) for r in out.collect()}

    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    dls = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    dft = {}
    for ts in toks.values():
        for t in set(ts):
            dft[t] = dft.get(t, 0) + 1
    for i, ts in toks.items():
        for t in set(ts):
            tf = ts.count(t)
            idf = math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            score = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dls[i] / avgdl)
            )
            gtf, gdl, gscore = got[(i, t)]
            assert (gtf, gdl) == (tf, dls[i])
            assert abs(gscore - score) < 1e-6
    # every (doc, term) pair surfaced (k=10 > vocab per doc)
    assert len(got) == sum(len(set(ts)) for ts in toks.values())


def test_bm25_discounts_long_docs_and_saturates(spark):
    """The two properties TF-IDF lacks: (a) same tf in a longer doc
    scores LOWER; (b) doubling tf far less than doubles the score."""
    df = spark.createDataFrame(
        [
            (1, "target " + "filler " * 4),
            (2, "target " + "filler " * 40),
            (3, "target target " + "filler " * 4),
            (4, "pad"),
        ],
        "doc_id bigint, text string",
    )
    out = textops.bm25_top_terms(df, "doc_id", "text", k=10)
    s = {
        (r["id"]): r["bm25"]
        for r in out.filter("term = 'target'").collect()
    }
    assert s[2] < s[1]  # length discount
    assert s[3] < 2 * s[1]  # tf saturation
    assert s[3] > s[1]  # but more tf still helps


# ---------------------------------------------------------------------------
# BPE training (round 4)
# ---------------------------------------------------------------------------


def _py_bpe(word_freqs, n_merges):
    """Independent pure-python greedy BPE (the GPT-2 recipe)."""
    syms = {w: tuple(w) + ("</w>",) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, n in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + n
        if not pairs:
            break
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


def test_train_bpe_matches_python_reference(spark):
    """The distributed word-count + driver merge loop must reproduce a
    pure-python BPE run over the same raw text exactly — merges, order,
    and final per-word tokenizations."""
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest low newer",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    model = textops.train_bpe(df, n_merges=12)

    from collections import Counter

    wf = Counter(w for t in texts for w in t.lower().split())
    merges, syms = _py_bpe(dict(wf), 12)
    assert model["merges"] == merges and len(merges) > 3
    assert model["word_tokens"] == {w: list(s) for w, s in syms.items()}


def test_bpe_token_counts_apply_and_oov(spark):
    """Apply = broadcast join of the trained word map; OOV words count
    chars+1; frequent merged words count fewer tokens than chars."""
    train = spark.createDataFrame(
        [(1, "the the the the cat cat")], "doc_id bigint, text string"
    )
    model = textops.train_bpe(train, n_merges=10)
    assert len(model["word_tokens"]["the"]) == 1  # fully merged
    test_df = spark.createDataFrame(
        [(7, "the cat zzz")], "doc_id bigint, text string"
    )
    row = textops.bpe_token_counts(test_df, model).first()
    want = (
        len(model["word_tokens"]["the"])
        + len(model["word_tokens"]["cat"])
        + len("zzz") + 1  # OOV fallback
    )
    assert row["n_words"] == 3
    assert row["n_bpe_tokens"] == want


def test_bm25_query_scores_match_per_term_sum(spark):
    """Query scoring == sum of the full model's per-term scores over
    the query terms, same fixture as the reference test; ranking and
    tie-break verified; repartition-invariant (decimal-summed)."""
    docs = [
        (1, "apple apple the pie"),
        (2, "the banana pie pie pie"),
        (3, "the cherry"),
        (4, "apple banana cherry the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    full = {
        (r["id"], r["term"]): r["bm25"]
        for r in textops.bm25_top_terms(df, "doc_id", "text", k=10).collect()
    }
    q = ["apple", "pie"]
    got = {
        r["id"]: (r["score"], r["n_matched"])
        for r in textops.bm25_query_scores(df, q).collect()
    }
    import pytest as _pytest

    for i in (1, 2, 4):
        want = sum(full.get((i, t), 0.0) for t in q)
        n = sum(1 for t in q if (i, t) in full)
        assert got[i][0] == _pytest.approx(want, abs=2e-6), i
        assert got[i][1] == n
    assert 3 not in got  # matches no query term
    again = {
        r["id"]: r["score"]
        for r in textops.bm25_query_scores(df.repartition(5), q).collect()
    }
    assert again == {k: v[0] for k, v in got.items()}


def test_url_filter_matches_duckdb(spark, sf_dir):
    """The synthesized-URL domain gate: per-TLD doc/blocked/kept/host
    counts == a DuckDB replica of the same deterministic construction
    (md5-prefix blocklist, regexp host extraction)."""
    import duckdb

    from etl_hero_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    got = sorted(
        tuple(r)
        for r in REGISTRY["text_url_filter"].spark(spark, sf_dir).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH tlds AS (SELECT ['com','org','net','info','xyz'] AS ts),
            d AS (
              SELECT doc_id,
                     source || '-' || (doc_id % 97)::VARCHAR || '.' ||
                     ts[(doc_id % 5 + 1)::INT] AS host
              FROM '{sf_dir}/documents.parquet', tlds),
            x AS (
              SELECT doc_id, host,
                     regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld,
                     CASE WHEN md5(host) LIKE '0%' THEN 1 ELSE 0 END
                       AS blocked
              FROM d)
            SELECT tld, count(*)::BIGINT,
                   sum(blocked)::BIGINT,
                   sum(1 - blocked)::BIGINT,
                   count(DISTINCT host)::BIGINT
            FROM x GROUP BY tld ORDER BY tld
            """
        ).fetchall()
    )
    assert got == want and len(got) == 5
    # the blocklist genuinely bites somewhere and keeps most docs
    total_blocked = sum(b for _, _, b, _, _ in got)
    total = sum(n for _, n, _, _, _ in got)
    assert 0 < total_blocked < total


def test_url_domain_stats_handles_malformed(spark):
    from etl_hero_spark.textops import url_domain_stats

    df = spark.createDataFrame(
        [
            (1, "https://good.example.com/x"),
            (2, "not a url"),
            (3, None),
        ],
        "doc_id bigint, url string",
    )
    block = spark.createDataFrame(
        [("good.example.com",)], "domain string"
    )
    rows = {
        r["doc_id"]: r for r in url_domain_stats(df, "url", block).collect()
    }
    assert rows[1]["url_host"] == "good.example.com"
    assert rows[1]["url_tld"] == "com" and rows[1]["url_blocked"] == 1
    # malformed/NULL: NULL host, unblocked — routed, not dropped
    assert rows[2]["url_blocked"] == 0 and rows[3]["url_blocked"] == 0
    assert rows[3]["url_host"] is None


def test_url_domain_stats_no_tld_host_yields_null_tld(spark):
    """A non-null host with no '.suffix' (localhost, bare name) must
    report NULL tld as documented — regexp_extract's '' no-match
    result is nullif'd so per-TLD reports never grow a '' group."""
    from etl_hero_spark.textops import url_domain_stats

    df = spark.createDataFrame(
        [
            (1, "https://localhost/x"),
            (2, "https://intranet:8080/page"),
            (3, "https://real.example.org/y"),
        ],
        "doc_id bigint, url string",
    )
    rows = {
        r["doc_id"]: r for r in url_domain_stats(df, "url").collect()
    }
    assert rows[1]["url_host"] == "localhost"
    assert rows[1]["url_tld"] is None
    assert rows[2]["url_tld"] is None
    assert rows[3]["url_tld"] == "org"
