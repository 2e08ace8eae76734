"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference (its only string ops are date parsing,
app.py:73-81) — these are the mandated pipeline extensions: token
counting, quality scoring, language ID, document fingerprinting. All
pure JVM-side expressions (split/filter/transform/md5) — no Python in
the hot path, fully codegen'd, linear scans with no shuffle — the shape
that runs at 100 TB untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# ---------------------------------------------------------------------------
# tokenization & counting
# ---------------------------------------------------------------------------


def tokens_expr(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text; empty/blank -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_expr(col: str | Column) -> Column:
    return F.size(tokens_expr(col))


def bpe_ish_token_count_expr(col: str | Column) -> Column:
    """Sub-word-ish token estimate: count alphanumeric word pieces after
    splitting on any non-alphanumeric run (a cheap BPE proxy — regexp-
    based, still fully vectorized). The explicit [^a-zA-Z0-9] class is
    deliberate: it means the same thing in Java regex and RE2, unlike
    \\p{Punct} (ASCII-only in Java, Unicode in RE2)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"[^a-zA-Z0-9]+")
    return F.size(F.filter(pieces, lambda x: F.length(x) > 0))


def with_token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count_expr(col)).withColumn(
        "n_pieces", bpe_ish_token_count_expr(col)
    )


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / repetition ratios)
# ---------------------------------------------------------------------------

# public-domain English stopword sample (the classic closed-class words)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def with_quality_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document quality signals: n_chars, n_tokens, avg token length,
    punctuation ratio, stopword ratio, distinct-token ratio. All ratios
    rounded to 6dp (engine-exact double arithmetic from integer counts).

    Tokens are staged as a column: six signal expressions consume them,
    and an inline tree would re-run the split per expression per row."""
    df = df.withColumn("_q_toks", tokens_expr(col))
    toks = F.col("_q_toks")
    n_chars = F.length(F.col(col))
    n_tokens = F.size(toks)
    n_token_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    # "punctuation" := non-alphanumeric non-space (portable regex class)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(col), r"[^a-zA-Z0-9\s]", "")
    )
    n_stop = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*EN_STOPWORDS))
    )
    n_distinct = F.size(F.array_distinct(toks))
    safe = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 6
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens_q", n_tokens)
        .withColumn("avg_token_len", safe(n_token_chars, n_tokens))
        .withColumn("punct_ratio", safe(n_punct, n_chars))
        .withColumn("stopword_ratio", safe(n_stop, n_tokens))
        .withColumn("distinct_ratio", safe(n_distinct, n_tokens))
        .drop("_q_toks")
    )


# ---------------------------------------------------------------------------
# language identification (marker-word heuristic)
# ---------------------------------------------------------------------------

# tiny public closed-class marker lists per language; the operator contract
# is argmax(hit count) with alphabetical tie-break — deterministic
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "of", "is", "that", "with", "for", "not"],
    "es": ["el", "la", "de", "que", "los", "una", "con", "por"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "dans"],
}


def lang_scores(
    col: str | Column, pre_tokenized: bool = False
) -> dict[str, Column]:
    toks = (
        (F.col(col) if isinstance(col, str) else col)
        if pre_tokenized
        else tokens_expr(col)
    )

    def hit_counter(words: list[str]) -> Column:
        # NB: higher-order-function lambdas must be single-arg (pyspark
        # introspects the signature); capture the word list by closure.
        return F.size(F.filter(toks, lambda x: F.lower(x).isin(*words)))

    return {lang: hit_counter(words) for lang, words in LANG_MARKERS.items()}


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """predicted_lang = language with most marker hits; 'und' (undetermined)
    when no marker matches; ties -> alphabetically first language.
    Tokens staged once; four marker filters consume the same column."""
    out = df.withColumn("_lang_toks", tokens_expr(col))
    scores = lang_scores(F.col("_lang_toks"), pre_tokenized=True)
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", s)
    langs = sorted(LANG_MARKERS)  # alphabetical iteration = tie-break
    best_score = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return out.withColumn("predicted_lang", pred).drop(
        "_lang_toks", *[f"score_{lang}" for lang in langs]
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def normalized_text_expr(col: str | Column) -> Column:
    """Canonical form: lowercase, trim, collapse internal whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint_expr(col: str | Column) -> Column:
    """Content fingerprint: md5 of the normalized text (stable across
    whitespace/case variation)."""
    return F.md5(normalized_text_expr(col))


def shingles_from_tokens_expr(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (sorted, canonical) from an ALREADY
    MATERIALIZED token-array column.

    The token column must be staged via withColumn, not passed as an
    expression tree: higher-order lambdas (transform/slice) evaluate
    interpreted, with no subexpression elimination — an inline
    tokenization subtree would re-run regex split once PER SHINGLE
    (measured ~10x on the shingle pipeline)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    only_full = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_sort(F.array_distinct(only_full))


def shingles_expr(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (sorted for canonical ordering).

    Convenience form for ad-hoc use on small data. Hot paths must stage
    tokens in a column and use shingles_from_tokens_expr — see its
    docstring for why (per-shingle re-tokenization otherwise)."""
    return shingles_from_tokens_expr(tokens_expr(col), n)


def with_shingles(
    df: DataFrame, col: str = "text", n: int = 3, out: str = "sh"
) -> DataFrame:
    """Stage normalized tokens as a real column, then shingle from it —
    the evaluate-once form of shingles_expr. The intermediate token
    column is dropped; CollapseProject keeps the stages separate because
    the token alias is non-cheap and multiply-referenced."""
    toks = f"_{out}_toks"
    return (
        df.withColumn(toks, tokens_expr(normalized_text_expr(col)))
        .withColumn(out, shingles_from_tokens_expr(F.col(toks), n))
        .drop(toks)
    )


def shingle_fingerprint_expr(col: str | Column, n: int = 3) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    shingle set — robust to sentence reordering, the cheap cousin of
    MinHash for exact near-dup bucketing. Ad-hoc form; hot paths use
    with_fingerprints (staged tokens)."""
    return F.md5(F.concat_ws("\x1f", shingles_expr(normalized_text_expr(col), n)))


def with_fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    staged = with_shingles(df, col, out="_fp_sh")
    return (
        staged.withColumn("fp_md5", fingerprint_expr(col))
        .withColumn("fp_shingle", F.md5(F.concat_ws("\x1f", F.col("_fp_sh"))))
        .drop("_fp_sh")
    )


# ---------------------------------------------------------------------------
# rule-based document filtering (Gopher-style heuristics)
# ---------------------------------------------------------------------------

# the required-word presence list from the published Gopher filtering
# rules (Rae et al. 2021, "Scaling Language Models", appendix A1.1)
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def with_gopher_quality(
    df: DataFrame,
    col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_required_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule filter signals + a combined pass flag.

    The published heuristics (word-count bounds, mean word length,
    symbol-to-word ratio for '#'/'...', bullet-start and ellipsis-end
    line ratios, fraction of words with an alphabetic character,
    required-stopword presence) as pure codegen expressions: one narrow
    projection, no shuffle, no Python — a linear scan at any corpus
    size. Tokens and lines are staged once (HOF lambdas get no
    subexpression elimination)."""
    df = df.withColumn("_g_toks", tokens_expr(col)).withColumn(
        "_g_lines", F.split(F.col(col), "\n")
    )
    toks, lines, txt = F.col("_g_toks"), F.col("_g_lines"), F.col(col)
    n_words = F.size(toks)
    n_lines = F.size(lines)
    word_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: F.startswith(F.ltrim(x), F.lit("-"))
            | F.startswith(F.ltrim(x), F.lit("*")),
        )
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda x: F.endswith(F.rtrim(x), F.lit("...")))
    )
    n_alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
    n_required = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        )
    )
    safe = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            0.0
        ),
        6,
    )
    sig = {
        "n_words": n_words,
        "mean_word_len": safe(word_chars, n_words),
        "symbol_ratio": safe(n_hash + n_ellipsis, n_words),
        "bullet_ratio": safe(n_bullet_lines, n_lines),
        "ellipsis_ratio": safe(n_ellipsis_lines, n_lines),
        "alpha_ratio": safe(n_alpha_words, n_words),
        "n_required_hits": n_required,
    }
    for name, expr in sig.items():
        df = df.withColumn(name, expr)
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("n_required_hits") >= min_required_hits)
    )
    return df.withColumn("passes_gopher", passes.cast("int")).drop(
        "_g_toks", "_g_lines"
    )


def gopher_filter(df: DataFrame, col: str = "text", **thresholds) -> DataFrame:
    """Rows passing every Gopher rule, signal columns dropped — the
    curation-pipeline form of with_gopher_quality."""
    out = with_gopher_quality(df, col, **thresholds)
    return out.filter(F.col("passes_gopher") == 1).drop(
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "bullet_ratio",
        "ellipsis_ratio",
        "alpha_ratio",
        "n_required_hits",
        "passes_gopher",
    )


# ---------------------------------------------------------------------------
# TF-IDF term ranking
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    persist: bool = True,
) -> DataFrame:
    """Top-k terms per document by TF-IDF: (id, term, tf, tfidf, rnk).

    tfidf = tf * ln(N / df_t) with raw term counts and unsmoothed idf
    (df_t >= 1 always, since a term must occur to be scored; a corpus-
    wide term gets idf 0, correctly ranking stopwords last). Both
    factors are exact integers widened to double in the same expression
    order as the DuckDB oracle -> bit-identical scores; ties break by
    term ascending.

    Plan: explode(lower tokens) -> (id, term) counts [shuffle 1] ->
    term document frequencies [shuffle 2, partial agg both sides] ->
    equi-join tf x df on term [co-partitioned with shuffle 2's layout]
    -> corpus size N as a broadcast 1-row cross join -> per-doc top-k
    window [shuffle 3, partitioned by id — distributed, bounded by
    per-doc vocabulary]. No partition-less window, no collect.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("_t"),
    ).select("id", F.lower("_t").alias("term"))
    # cached: both the scored join probe AND the document-frequency agg
    # consume tf — without the cache Catalyst plans a second full
    # scan+explode for the df_t branch (no cross-DAG subplan reuse)
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if persist:
        # disk stage boundary, not cache(): the result is lazy so a
        # memory cache has no release point and leaks for the session.
        # The (id, term, tf) table is narrow and aggregated; both
        # consumers scan it columnar. persist=False skips the write at
        # the cost of one extra tokenize+agg scan.
        from etl_hero_spark.checkpoint import parquet_checkpoint

        tf = parquet_checkpoint(tf, "tfidf_tf")
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df_t").cast("double")
                ),
                6,
            ),
        )
    )
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# document chunking (fixed token windows with overlap)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows:
    (id, chunk_id, chunk_text, n_chunk_tokens) — the standard context-
    window preparation for pretraining/embedding pipelines.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk is shorter, never
    empty, and every token is covered. Docs with 0 tokens emit no rows;
    docs with <= overlap tokens emit exactly one chunk.

    Plan: tokens staged ONCE as a materialized array column (slice and
    sequence are codegen'd array ops, not interpreted lambdas), then
    posexplode of the chunk-index sequence — a narrow per-row expansion
    of ~n_tokens/stride rows, no shuffle at all. Fully streaming-
    friendly: the same expression works under readStream unchanged.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    n = F.size("_c_toks")
    # floor((n-overlap-1)/stride)+1 clamped to >=1 covers every token
    # (floor of the *double* division: integer div truncates toward
    # zero and breaks the n<=overlap branch)
    n_chunks = F.greatest(
        F.lit(1),
        (F.floor((n - F.lit(overlap) - 1) / F.lit(stride)) + 1).cast("int"),
    )
    staged = (
        df.withColumn("_c_toks", tokens_expr(text_col))
        .filter(F.size("_c_toks") > 0)
        .withColumn("_n_chunks", n_chunks)
    )
    start = F.col("chunk_id") * stride
    chunk_toks = F.slice(
        F.col("_c_toks"), start + 1, F.lit(chunk_tokens)
    )
    return (
        staged.select(
            F.col(id_col),
            F.posexplode(
                F.sequence(F.lit(0), F.col("_n_chunks") - 1)
            ).alias("chunk_id", "_i"),
            "_c_toks",
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", chunk_toks).alias("chunk_text"),
            F.size(chunk_toks).alias("n_chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# repetition signals (the other half of the Gopher rule set)
# ---------------------------------------------------------------------------


def top_ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-doc top word-n-gram repetition: (id, top_ngram, top_count,
    rep_char_frac) — Gopher's 'fraction of characters in the most
    frequent n-gram' rule. rep_char_frac = top_count * length(top_ngram)
    / n_chars, 6dp. Docs with < n tokens emit no row.

    Tie-break: highest count, then lexicographically GREATEST n-gram
    (Spark's max(struct(cnt, gram)) ordering == ORDER BY cnt DESC,
    gram DESC LIMIT 1 — deterministic, and what the in-test DuckDB
    parity encodes).

    Plan: staged tokens -> non-distinct sliding grams -> explode ->
    ONE groupBy (id, gram) count -> ONE groupBy (id) max(struct) —
    relational instead of a per-row HOF frequency fold (counting within
    an array is O(grams^2) interpreted; the two partial+final shuffles
    are linear and distributed). n_chars rides along as a per-id
    constant, so no join back to the source.
    """
    toks = F.col("_r_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = (
        df.withColumn("_r_toks", tokens_expr(text_col))
        .select(
            F.col(id_col).alias("id"),
            F.length(text_col).alias("n_chars"),
            F.explode(grams).alias("gram"),
        )
    )
    counts = ex.groupBy("id", "n_chars", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = counts.groupBy("id", "n_chars").agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_t")
    )
    return top.select(
        F.col("id").alias(id_col),
        F.col("_t.gram").alias("top_ngram"),
        F.col("_t.cnt").alias("top_count"),
        F.round(
            (F.col("_t.cnt") * F.length("_t.gram")).cast("double")
            / F.col("n_chars").cast("double"),
            6,
        ).alias("rep_char_frac"),
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning
# ---------------------------------------------------------------------------

C4_BOILERPLATE_MARKERS = [
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "lorem ipsum",
]


def with_c4_line_filter(
    df: DataFrame,
    col: str = "text",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    out_col: str = "clean_text",
) -> DataFrame:
    """C4-style line-level cleaning (published heuristics): keep only
    lines that (a) have >= min_words_per_line words, (b) end in terminal
    punctuation (. ! ? ") when required, (c) contain no boilerplate
    marker (javascript / cookie policy / privacy policy / terms of use /
    lorem ipsum, case-insensitive); docs whose text contains '{' are
    flagged as code-like. Adds:

      out_col         — surviving lines re-joined with '\\n'
      n_lines         — source line count
      n_lines_kept    — surviving line count
      c4_code_like    — 1 if '{' appears anywhere (C4 drops such docs)

    All array/lambda work runs over a STAGED line array (HOF lambdas
    get no subexpression elimination); pure codegen, no shuffle —
    line-level cleaning at any corpus size is a linear scan. The
    filtering form (drop empty survivors / code-like docs) composes as
    .filter(n_lines_kept > 0 AND c4_code_like = 0).
    """
    df = df.withColumn("_c4_lines", F.split(F.col(col), "\n"))
    lines = F.col("_c4_lines")

    def line_ok(x: Column) -> Column:
        t = F.trim(x)
        ok = F.size(F.split(t, r"\s+")) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & (
                F.endswith(t, F.lit("."))
                | F.endswith(t, F.lit("!"))
                | F.endswith(t, F.lit("?"))
                | F.endswith(t, F.lit('"'))
            )
        low = F.lower(t)
        for marker in C4_BOILERPLATE_MARKERS:
            ok = ok & ~F.contains(low, F.lit(marker))
        return ok

    kept = F.filter(lines, line_ok)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out_col, F.concat_ws("\n", kept))
        .withColumn(
            "c4_code_like",
            F.contains(F.col(col), F.lit("{")).cast("int"),
        )
        .drop("_c4_lines")
    )


# ---------------------------------------------------------------------------
# corpus-level boilerplate line removal
# ---------------------------------------------------------------------------


def global_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    min_docs: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """Corpus-LEVEL boilerplate-line removal (the RefinedWeb/Dolma
    "duplicated line" pass, complementing the per-doc C4 rules): any
    trimmed line that appears in >= min_docs DISTINCT documents is
    boilerplate (nav bars, cookie banners, legal footers) and is
    stripped from EVERY document. Whitespace-only lines are neither
    counted nor stripped.

    Output: id_col, out_col (surviving lines re-joined with '\\n',
    original order), n_lines, n_lines_removed — one row per input doc
    (docs whose every line is boilerplate survive with out_col = '').

    Plan — three bounded shuffles, no all-pairs anywhere:
      1. posexplode the line array (narrow, no shuffle);
      2. boilerplate set: distinct (line_key, doc) then count per
         line_key — shuffles on xxhash64(line) (uniform; map-side
         partial distinct bounds hot lines), HAVING >= min_docs keeps
         only frequent lines, so the set is orders of magnitude smaller
         than the corpus;
      3. left-anti join the exploded lines against that set on the
         64-bit key (AQE broadcasts it when small; hot boilerplate keys
         are on the TINY side, so no skew on the probe), then regroup
         per doc — one shuffle on id_col — and re-join lines sorted by
         ordinal.
    The final left join back to the input restores all-lines-removed
    docs; it is a join on the unique doc id (no fan-out).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lk", F.xxhash64(F.trim("_line")))
    nonblank = lines.filter(F.length(F.trim("_line")) > 0)
    boiler = (
        nonblank.select("_lk", id_col)
        .distinct()
        .groupBy("_lk")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_lk")
    )
    kept = lines.join(boiler, "_lk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias(out_col),
    )
    return (
        df.select(id_col, F.size(F.split(F.col(col), "\n")).alias("n_lines"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_lines_removed"),
        )
    )


# ---------------------------------------------------------------------------
# corpus unigram LM scoring
# ---------------------------------------------------------------------------


def unigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    hot_k: int = 256,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the CCNet-style LM quality signal (docs of
    improbable tokens score low: gibberish, boilerplate codes, OCR
    noise) computed without any external model.

    Output: id_col, n_scored_tokens, mean_logprob (ln scale; empty/
    blank docs are dropped — they have no tokens to score).

    This is exactly score_with_unigram_vocab over a vocab built from
    the SAME corpus (one definition of the vocab math and the
    skew-split scoring plan, shared with the persisted-index path; the
    OOV branch is unreachable here because every token is in its own
    corpus's vocab). See unigram_vocab/score_with_unigram_vocab for
    the plan details.
    """
    return score_with_unigram_vocab(
        df, unigram_vocab(df, col), id_col=id_col, col=col, hot_k=hot_k
    )


def unigram_vocab(
    df: DataFrame, col: str = "text"
) -> DataFrame:
    """The corpus unigram table (token, n, logp) that
    unigram_logprob_score builds internally, exposed so it can be
    PERSISTED (write.parquet) and reused: at scale the vocab is built
    once per corpus snapshot, and each incoming batch scores against
    the stored table instead of recomputing corpus-wide counts —
    the same persisted-index pattern as the MinHash/IVF rungs.

    One shuffle on token; logp is rounded to 9dp exactly as the
    in-memory path does.
    """
    toks = df.select(F.explode(tokens_expr(col)).alias("_tok")).withColumn(
        "_tok", F.lower(F.col("_tok"))
    )
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_n"))
    total = vocab.agg(F.sum("_n").alias("_total"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "_tok",
        "_n",
        F.round(
            F.log(F.col("_n").cast("double") / F.col("_total").cast("double")),
            9,
        ).alias("_logp"),
    )


def score_with_unigram_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    hot_k: int = 256,
) -> DataFrame:
    """Score a (possibly NEW) batch of documents against a prebuilt
    unigram vocab (see unigram_vocab) — the incremental form of
    unigram_logprob_score. Tokens absent from the vocab (possible for
    fresh batches) score at the OOV floor ln(1 / (total + 1)): below
    every in-vocab token, so unseen-token-heavy docs rank as
    improbable, which is the point of the signal.

    Same skew plan as the in-memory form: the hot_k most frequent
    vocab tokens broadcast-join their occurrences, the tail equi-joins
    skew-free; a LEFT join keeps OOV tokens, coalesced to the floor.
    Per-doc ln sums accumulate as 9dp DECIMAL.
    """
    total = vocab.agg(F.sum("_n").alias("_t"))
    oov = F.broadcast(
        total.select(
            F.round(F.log(F.lit(1.0) / (F.col("_t") + 1)), 9).alias("_oov")
        )
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(col)).alias("_tok")
    ).withColumn("_tok", F.lower(F.col("_tok")))
    lookup = vocab.select("_tok", "_logp")
    hot = lookup.orderBy(F.desc("_logp"), F.asc("_tok")).limit(hot_k)
    cold_vocab = lookup.join(F.broadcast(hot.select("_tok")), "_tok", "left_anti")
    hot_hits = toks.join(F.broadcast(hot), "_tok")
    cold_hits = toks.join(
        F.broadcast(hot.select("_tok")), "_tok", "left_anti"
    ).join(cold_vocab, "_tok", "left")
    scored = hot_hits.unionByName(cold_hits).crossJoin(oov)
    lp = F.coalesce(F.col("_logp"), F.col("_oov"))
    dec = lp.cast("decimal(20,9)")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_scored_tokens"),
        F.round(
            (F.sum(dec) / F.count(F.lit(1))).cast("double"), 9
        ).alias("mean_logprob"),
    )


def _token_pairs(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Adjacent token pairs per document: posexplode + window lead over
    (doc, pos) — the relational adjacency plan (array zip/slice lambdas
    evaluate interpreted; this codegens and shuffles once on the doc
    id). Output: _id, _tok, _next (one row per transition)."""
    t = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_expr(col)).alias("_pos", "_tok"),
    ).withColumn("_tok", F.lower(F.col("_tok")))
    w = W.partitionBy("_id").orderBy("_pos")
    return (
        t.withColumn("_next", F.lead("_tok").over(w))
        .filter(F.col("_next").isNotNull())
        .drop("_pos")
    )


def bigram_vocab(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Corpus bigram table (_tok, _next, _n): transition counts over
    adjacent lowercased whitespace tokens. PERSISTABLE like
    unigram_vocab — build once per corpus snapshot, score batches
    against the stored table (context totals and vocab size derive
    from it in the scorer, so ONE table is the whole model). One
    (doc) window + one (pair) shuffle."""
    return (
        _token_pairs(df, id_col, col)
        .groupBy("_tok", "_next")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def score_with_bigram_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document mean bigram log-probability ln P(w_i | w_{i-1})
    under a prebuilt transition table, with add-alpha smoothing:

        logp = ln((c(w1,w2) + alpha) / (c(w1) + alpha*V))

    where c(w1) = sum_w2 c(w1,w2) and V = |distinct tokens in vocab|.
    Unseen transitions and unseen contexts degrade smoothly (alpha
    floor) instead of -inf — the incremental-batch form, mirroring
    score_with_unigram_vocab. Docs with < 2 tokens drop (no
    transitions to score).

    Plan: batch transitions LEFT-join the pair table on (w1, w2) —
    a higher-cardinality, flatter key than the unigram token join, so
    hot-key skew is milder by construction (the most frequent English
    bigram is ~1% of mass vs ~7% for 'the') — then LEFT-join the tiny
    context table and broadcast the scalar V; per-doc means accumulate
    as 9dp DECIMAL (order-independent)."""
    return _score_bigram_pairs(
        _token_pairs(df, id_col, col), vocab, id_col, alpha
    )


def _score_bigram_pairs(
    pairs: DataFrame, vocab: DataFrame, id_col: str, alpha: float
) -> DataFrame:
    ctx = vocab.groupBy("_tok").agg(F.sum("_n").alias("_cn"))
    v_scalar = F.broadcast(
        vocab.select(F.col("_tok").alias("_t"))
        .unionByName(vocab.select(F.col("_next").alias("_t")))
        .agg(F.countDistinct("_t").cast("double").alias("_v"))
    )
    joined = (
        pairs.join(vocab, ["_tok", "_next"], "left")
        .join(ctx, "_tok", "left")
        .crossJoin(v_scalar)
    )
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("double")
    cn = F.coalesce(F.col("_cn"), F.lit(0)).cast("double")
    lp = F.round(
        F.log((n + F.lit(alpha)) / (cn + F.lit(alpha) * F.col("_v"))), 9
    )
    dec = lp.cast("decimal(20,9)")
    # exact decimal SUM cast to double, then ONE IEEE divide, and NO
    # final round: a 9dp sum divided by n lands exactly on .5 grid
    # midpoints (e.g. n=2), where Spark's shortest-repr HALF_UP and
    # Python/DuckDB's value-based rounding disagree — the unrounded
    # quotient of an exact sum is bit-identical everywhere
    return joined.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("int").alias("n_transitions"),
        (
            F.sum(dec).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_bigram_logprob"),
    )


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Self-scored form: each document's mean transition probability
    under the corpus's OWN bigram distribution — the second-order
    CCNet-style quality signal (catches shuffled/word-salad text that
    unigram scoring cannot: same words, impossible transitions).

    The transition table, its context totals, the vocab size, AND the
    scoring join all consume the same exploded-pairs subtree — four
    consumers, so the pairs stage at a disk boundary (SURVEY §4(c))
    instead of re-deriving the posexplode+window chain per consumer."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    pairs = parquet_checkpoint(
        _token_pairs(df, id_col, col), "bigram_pairs"
    )
    vocab = pairs.groupBy("_tok", "_next").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return _score_bigram_pairs(pairs, vocab, id_col, alpha)


def dedup_lines_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Within-DOCUMENT repeated-line removal — the per-doc complement
    of global_line_dedup's corpus pass: keep only the FIRST occurrence
    of each trimmed line inside a document (scraped pages repeat their
    own nav/footer blocks; LM training then memorizes the repetition).
    Blank lines pass through untouched (they are structure, not
    content).

    Output mirrors global_line_dedup: id_col, out_col (survivors
    re-joined in original order), n_lines, n_lines_removed.

    Plan: posexplode -> ONE window over (doc, line-hash) ordered by
    position (first occurrence = row_number 1) -> regroup per doc.
    Both the window and the regroup hash-partition on the doc id, so
    AQE plans a single exchange; no corpus-wide state at all.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lk", F.xxhash64(F.trim("_line")))
    w = W.partitionBy(id_col, "_lk").orderBy("_pos")
    kept = (
        lines.withColumn("_occ", F.row_number().over(w))
        .filter(
            (F.col("_occ") == 1) | (F.length(F.trim("_line")) == 0)
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias(out_col),
    )
    return (
        df.select(id_col, F.size(F.split(F.col(col), "\n")).alias("n_lines"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_lines_removed"),
        )
    )


def clean_text_expr(col: str | Column) -> Column:
    """ftfy-lite text normalization for web-scraped corpora, as pure
    codegen'd expressions (no Python, no ICU dependency -- an honest
    subset of full NFKC):

    * strip C0/C1 control characters (keep \\n and \\t);
    * remove zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) -- invisible
      codepoints that break tokenization and dedup hashing;
    * unify typographic variants tokenizers treat as distinct:
      curly quotes -> straight, en/em-dash -> '-', NBSP/ideographic
      space -> space, ellipsis char -> '...';
    * collapse runs of 3+ newlines to 2 (paragraph structure survives,
      scraped-page padding does not) and trim trailing spaces per line.

    Composes ahead of every downstream rung: fingerprints, shingles,
    LM scoring and dedup all see the canonical form, so cosmetic
    variants stop defeating exact/near-dup matching.
    """
    c = F.col(col) if isinstance(col, str) else col
    # zero-width (ZWSP/ZWNJ/ZWJ) + BOM
    c = F.regexp_replace(c, "[\u200b\u200c\u200d\ufeff]", "")
    # C0 (minus tab/newline/CR) and C1 controls
    c = F.regexp_replace(
        c, "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f]", ""
    )
    # typographic unification (incl. NBSP and ideographic space)
    c = F.translate(
        c,
        "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0\u3000",
        "''\"\"--  ",
    )
    c = F.regexp_replace(c, "\u2026", "...")
    # CRLF/CR -> LF, trailing spaces per line, 3+ newlines -> 2
    c = F.regexp_replace(c, "\r\n?", "\n")
    c = F.regexp_replace(c, "[ \t]+\n", "\n")
    c = F.regexp_replace(c, "\n{3,}", "\n\n")
    return c


def with_clean_text(
    df: DataFrame, col: str = "text", out_col: str | None = None
) -> DataFrame:
    """clean_text_expr applied as a column, plus n_chars_removed (how
    much invisible/typographic noise the document carried -- itself a
    quality signal: heavy mojibake correlates with bad extraction)."""
    out_col = out_col or col
    cleaned = clean_text_expr(col)
    return df.withColumn(
        "n_chars_removed",
        (F.length(F.col(col)) - F.length(cleaned)).cast("int"),
    ).withColumn(out_col, cleaned)


# ---------------------------------------------------------------------------
# BM25 — TF-IDF's production successor (Lucene/Elasticsearch default):
# saturating term frequency + document-length normalization
# ---------------------------------------------------------------------------


def bm25_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    persist: bool = True,
) -> DataFrame:
    """Top-k terms per document by BM25: (id, term, tf, dl, bm25, rnk).

    bm25 = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with the
    Lucene-style smoothed idf ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) —
    always positive, so corpus-wide terms rank low instead of flipping
    sign. tf saturates (doubling a term's count doesn't double its
    score) and long documents are discounted toward the corpus mean
    length — the two fixes over raw TF-IDF that made BM25 the lexical
    default. Ties break by term ascending.

    Plan mirrors tfidf_top_terms: tokenize once behind a disk stage
    boundary, df_t and per-doc length dl both re-aggregate the bounded
    (id, term, tf) table, N and avgdl ride one broadcast 1-row agg, and
    the final top-k is a per-doc window (never partition-less). All
    arithmetic is integer counts widened to double in a fixed order —
    the DuckDB parity test runs the same expression text.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("_t"),
    ).select("id", F.lower("_t").alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if persist:
        from etl_hero_spark.checkpoint import parquet_checkpoint

        tf = parquet_checkpoint(tf, "bm25_tf")
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(
            (
                F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avgdl")
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    norm = tfd + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    scored = (
        tf.join(dft, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bm25", F.round(idf * tfd * F.lit(k1 + 1.0) / norm, 6)
        )
    )
    w = W.partitionBy("id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "term", "tf", "dl", "bm25", "rnk")
    )


def bm25_query_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 100,
) -> DataFrame:
    """BM25 retrieval scores for ONE query against the corpus: score(d)
    = sum over query terms of the bm25_top_terms term formula — the
    lexical half of a hybrid (lexical + dense) retrieval stack.

    Output: (id, score, n_matched) for the ``top_n`` best documents —
    a distributed TakeOrdered (bounded rows to the driver merge, never
    a global sort). Ties break by id ascending.

    Plan: tokenize once behind a stage boundary; per-doc length dl
    aggregates the FULL token table (length normalization must see the
    whole document), while tf and df_t aggregate only the
    query-term-filtered slice (df_t = docs containing the term — the
    same value the full bm25 table would hold). N and avgdl ride one
    broadcast 1-row agg. Identical idf/saturation arithmetic to
    bm25_top_terms; DuckDB parity pinned in tests/test_textops.py."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = parquet_checkpoint(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_expr(text_col)).alias("_t"),
        ).select("id", F.lower("_t").alias("term")),
        "bm25q_toks",
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    qtf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    stats = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(
            (
                F.sum("dl").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avgdl")
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    norm = tfd + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term = (
        qtf.join(F.broadcast(dft), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        # 12dp-round each term's deterministic double, sum in DECIMAL:
        # per-doc scores are bit-stable under any partitioning (the
        # dsir_log_weights posture)
        .withColumn(
            "_s",
            F.round(idf * tfd * F.lit(k1 + 1.0) / norm, 12).cast(
                "decimal(38,18)"
            ),
        )
    )
    return (
        per_term.groupBy("id")
        .agg(
            F.round(F.sum("_s").cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(int(top_n))
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training — the LLM-pipeline step upstream of every token
# count: learn merge rules from the corpus, then tokenize with them
# ---------------------------------------------------------------------------


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over lowercase whitespace words — the ONLY corpus-scale
    aggregation BPE training needs (one explode + one map-side-combined
    groupBy). Every standard BPE trainer works on this table, not the
    raw text: at 100 TB the word-count table is GBs, not TBs."""
    return (
        df.select(F.explode(tokens_expr(text_col)).alias("_w"))
        .select(F.lower("_w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_vocab_words: int = 50_000,
) -> dict:
    """Greedy BPE merge training (the GPT-2 recipe): repeatedly merge
    the most frequent adjacent symbol pair, weighted by word frequency.

    Distribution split: the corpus contributes ONE aggregation (the
    word-count table, truncated to the ``max_vocab_words`` most frequent
    words — standard practice; the tail it drops is a vanishing share of
    pair mass); the merge loop then runs driver-side over that bounded
    table, like every production BPE trainer (and like train_centroids'
    sampled k-means — a build-once model, not a per-row path). Ties
    break by lexicographic pair order, so training is deterministic.

    Returns {"merges": [(a, b), ...], "word_tokens": {word: [sym, ...]},
    "vocab_words": int}. </w> marks word ends (so "low"/"lower" share
    prefixes but not end tokens).
    """
    wc = (
        word_counts(df, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab_words)
        .collect()
    )
    words = {r["word"]: r["n"] for r in wc}
    syms = {w: tuple(w) + ("</w>",) for w in words}
    merges: list = []
    for _ in range(n_merges):
        pair_n: dict = {}
        for w, n in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pair_n[(s[i], s[i + 1])] = pair_n.get((s[i], s[i + 1]), 0) + n
        if not pair_n:
            break
        best = max(pair_n.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), cnt = best
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
    return {
        "merges": merges,
        "word_tokens": {w: list(s) for w, s in syms.items()},
        "vocab_words": len(words),
    }


def bpe_token_counts(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts under a trained model: corpus words
    explode once and broadcast-join the word -> n_tokens map (the model
    tokenized every word ONCE at train time; the join is the whole
    apply).
    Out-of-vocabulary words fall back to chars+1 (their untrained
    symbol count). Output: (id, n_words, n_bpe_tokens)."""
    spark = df.sparkSession
    rows = [
        (w, len(toks)) for w, toks in model["word_tokens"].items()
    ]
    lut = spark.createDataFrame(rows, "word string, n_toks int")
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("_w"),
    ).select("id", F.lower("_w").alias("word"))
    joined = exploded.join(F.broadcast(lut), "word", "left").select(
        "id",
        F.coalesce(
            F.col("n_toks"), F.length("word") + F.lit(1)
        ).alias("n_toks"),
    )
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    scale: int = 6,
) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual information

        pmi(a,b) = ln( p(a,b) / (p(a) p(b)) )
                 = ln c_ab + ln N - ln c_a - ln c_b

    over the corpus transition table, where c_a / c_b are the
    first-position / second-position marginals and N the total
    transition count. ``min_count`` floors c_ab (PMI's classic
    rare-pair pathology: a hapax pair scores arbitrarily high).

    Plan: ONE corpus pass builds the bigram table (the persistable
    bigram_vocab artifact), parquet_checkpoint'ed because four
    consumers derive from it (N, both marginals, the scoring join);
    marginals join back on single-token keys (flat, bounded by vocab);
    top-k is a TakeOrderedAndProject, never a global sort of the pair
    table. All counts stay integral; the four-ln form avoids integer
    overflow of c_ab * N products.

    Output: (tok, next_tok, n_pair, pmi) ordered by pmi desc.
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    pairs = parquet_checkpoint(
        bigram_vocab(df, id_col, col).filter(F.col("_n") >= min_count),
        "pmi-pairs",
    )
    # marginals/N over the UNFILTERED table would be ideal-but-2-pass;
    # the standard corpus-linguistics convention computes them over the
    # same thresholded table it scores — pinned in tests either way.
    n_total = pairs.agg(F.sum("_n").cast("double").alias("_nt"))
    left_m = pairs.groupBy("_tok").agg(F.sum("_n").alias("_ca"))
    right_m = pairs.groupBy("_next").agg(F.sum("_n").alias("_cb"))
    scored = (
        pairs.join(left_m, "_tok")
        .join(right_m, "_next")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("_tok").alias("tok"),
            F.col("_next").alias("next_tok"),
            F.col("_n").alias("n_pair"),
            F.round(
                F.log(F.col("_n").cast("double"))
                + F.log("_nt")
                - F.log(F.col("_ca").cast("double"))
                - F.log(F.col("_cb").cast("double")),
                scale,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("tok").asc(), F.col("next_tok").asc()
    ).limit(top_k)


def url_domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    blocklist: DataFrame | None = None,
) -> DataFrame:
    """C4-style URL/domain curation signals (Raffel et al. 2020 §2.2 —
    the first gate every web-corpus recipe applies before any text is
    read): parse host and TLD from the URL column with builtin
    parse_url/regexp (pure codegen, no UDF) and, when a ``blocklist``
    frame of (domain) rows is given, flag blocked documents via a
    broadcast LEFT SEMI-shaped join (the blocklist is small by
    contract — a curated list, not a corpus).

    Adds: ``url_host``, ``url_tld``, ``url_blocked`` (int). Malformed
    URLs (no host) get NULL host/tld and url_blocked=0 — route them to
    a stricter gate rather than silently dropping. At 100 TB this is a
    map-only pass plus one broadcast."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    out = docs.withColumn("url_host", host).withColumn(
        "url_tld",
        # regexp_extract yields '' (not NULL) when a non-null host has
        # no '.suffix' match (e.g. 'https://localhost/x') — nullif so
        # no-TLD hosts report NULL as documented, not a spurious ''
        # group in per-TLD reports
        F.nullif(
            F.regexp_extract(F.col("url_host"), r"\.([a-z0-9-]+)$", 1),
            F.lit(""),
        ),
    )
    if blocklist is None:
        return out.withColumn("url_blocked", F.lit(0))
    b = blocklist.select(
        F.col(blocklist.columns[0]).alias("_blocked_domain")
    ).distinct()
    return (
        out.join(
            F.broadcast(b),
            out["url_host"] == F.col("_blocked_domain"),
            "left",
        )
        .withColumn(
            "url_blocked",
            F.col("_blocked_domain").isNotNull().cast("int"),
        )
        .drop("_blocked_domain")
    )
