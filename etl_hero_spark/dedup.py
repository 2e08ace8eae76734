"""Deduplication operators for training-data pipelines (extension mandate).

Four rungs of the dedup ladder, cheapest-first — at 100 TB you run them
in this order and each rung shrinks the next rung's input:

1. exact       — hash-groupBy on content fingerprint (one shuffle)
2. simhash     — 64-bit near-dup signature; equal-signature bucketing
3. minhash-LSH — banded Jaccard candidate pairs (sub-quadratic)
4. ngram-jaccard — exact Jaccard on candidate pairs (verification rung;
                   also usable standalone at small scale, and it IS the
                   DuckDB-checkable ground truth for the rungs above)

The reference's only dedup is full-row drop_duplicates (app.py:308-315,
see clean.drop_duplicate_rows); everything here generalizes it to
near-duplicate content at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from etl_hero_spark.checkpoint import memo_parquet_checkpoint, parquet_checkpoint
from etl_hero_spark.skew import ensure_min_partitions
from etl_hero_spark.textops import (
    fingerprint_expr,
    normalized_text_expr,
    shingles_from_tokens_expr,
    tokens_expr,
)


def _staged_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sh) with tokens staged as a materialized column first —
    higher-order lambdas get no subexpression elimination, so an inline
    tokenization subtree would re-run the regex split once per shingle
    (textops.shingles_from_tokens_expr). Also spreads few-split inputs:
    shingling is CPU-bound, one row group must not mean one core."""
    return (
        ensure_min_partitions(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .withColumn("_toks", tokens_expr(normalized_text_expr("_txt")))
        .select("id", shingles_from_tokens_expr(F.col("_toks"), n).alias("sh"))
    )


def _exploded_shingle_set(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """DISTINCT (id, s) word-n-gram shingle rows — fully relational, no
    higher-order functions anywhere.

    The array formulation (transform/slice/concat per shingle, then
    array_distinct/array_sort) evaluates interpreted at ~75us per
    shingle — ~20 CPU-seconds at sf0.1 and the whole pipeline's
    bottleneck. Here tokens posexplode to rows and each gram is
    concat_ws(tok, lead(tok,1), ..) over (id, pos) — window lead and
    concat are whole-stage-codegen'd, the distinct is a codegen'd
    shuffle. One extra id-keyed shuffle for the window sort; uniform
    keys, so skew-free at scale."""
    w = W.partitionBy("id").orderBy("pos")
    tok_rows = (
        ensure_min_partitions(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .withColumn("_toks", tokens_expr(normalized_text_expr("_txt")))
        .select("id", F.posexplode("_toks").alias("pos", "tok"))
    )
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(w) for j in range(1, n)
    ]
    return (
        tok_rows.withColumn("_last", parts[-1] if n > 1 else F.col("tok"))
        .withColumn("s", F.concat_ws(" ", *parts))
        # a full shingle needs n tokens: rows whose lookahead ran off the
        # document tail (or docs with < n tokens) drop out here
        .filter(F.col("_last").isNotNull())
        .select("id", "s")
        .distinct()
    )

# ---------------------------------------------------------------------------
# 1. exact content dedup
# ---------------------------------------------------------------------------


def dedup_exact_content(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row per normalized-content fingerprint (smallest id wins —
    deterministic keep-first). One shuffle on a 32-hex-char key; the md5
    key distributes uniformly, so no skew at any scale."""
    from etl_hero_spark.clean import drop_duplicate_rows

    with_fp = df.withColumn("_fp", fingerprint_expr(text_col))
    return drop_duplicate_rows(
        with_fp, subset=["_fp"], keep_first_by=[id_col]
    ).drop("_fp")


def keep_best_ids(
    df: DataFrame,
    quality,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The survivor-ID table behind dedup_keep_best AND its streaming
    twin (stream_keep_best): one row per content fingerprint with the
    (quality desc, id asc) arg-max id and its quality — sharing the
    aggregate makes stream==batch a statement about the SAME
    expression, not two re-implementations. Output: (_fp, keep_id,
    keep_quality).

    Ids must be NUMERIC (the bfs_distances posture): the id-ascending
    tie-break negates the id inside the arg-max struct, and a string
    id would coerce to NULL there, silently making the advertised
    '(quality desc, id asc)' tie-break nondeterministic — so the type
    is validated loudly instead."""
    id_type = df.schema[id_col].dataType.typeName()
    if id_type not in {
        "byte", "short", "integer", "long", "float", "double", "decimal"
    } and not id_type.startswith("decimal"):
        raise TypeError(
            f"keep_best_ids: id column {id_col!r} is {id_type}; the "
            "id-ascending tie-break needs a numeric id (a string id "
            "coerces to NULL under negation and the tie-break goes "
            "nondeterministic). Hash or dense-rank string ids to "
            "integers first."
        )
    q = F.coalesce(quality.cast("double"), F.lit(float("-inf")))
    ordk = F.struct(q.alias("q"), (-F.col(id_col)).alias("neg"))
    return (
        df.withColumn("_fp", fingerprint_expr(text_col))
        .groupBy("_fp")
        .agg(
            F.max_by(F.col(id_col), ordk).alias("keep_id"),
            F.max(ordk)["q"].alias("keep_quality"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    quality,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware survivor selection: keep the HIGHEST-``quality``
    row per normalized-content fingerprint group (ties break to the
    smallest id). The curation sibling of dedup_exact_content's
    keep-first — when a corpus holds casing/whitespace variants of the
    same content, a training pipeline wants the cleanest rendition,
    not the one that happened to arrive first.

    ``quality`` is any Column expression (a quality_score output, a
    per-row heuristic, a metadata preference); NULL quality sorts
    below every real score. Plan: one groupBy on the md5 fingerprint
    picks each group's surviving id with ``max_by`` over a
    (quality, -id) struct — a single shuffle on a uniform 32-hex key,
    then a LEFT SEMI join on the unique id brings the full surviving
    rows back. No window, no sort, both shuffles on uniform keys.
    DuckDB arg-max parity pinned in tests/test_dedup.py."""
    keep = keep_best_ids(df, quality, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# 4. exact n-gram Jaccard pairs (ground truth; quadratic within shingle
#    buckets — run after a candidate-generation rung at scale)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard >= threshold.

    Plan: distinct-shingle explode -> self-equi-join on shingle (this IS
    the blocking: only pairs sharing >=1 shingle are generated — never the
    full cross product) -> per-pair intersection count -> sizes -> Jaccard.
    Jaccard = inter/(|A|+|B|-inter) from exact integer counts, rounded 6dp
    -> engine-exact.

    Skew bound: a stop-shingle shared by k docs contributes k^2 join rows,
    so shingles with document frequency > max_shingle_df are dropped from
    the JOIN SIDES before the self-join (set sizes stay exact — computed
    from the uncapped rows). A stop shingle cannot discriminate near-dups;
    the only loss is intersection mass carried exclusively by capped
    shingles, which depresses those pairs' Jaccard toward (not past) the
    exact value computed over rarer shingles. No-op whenever the corpus
    max DF < max_shingle_df — the small-corpus oracle results are
    byte-identical.
    """
    # consumed three times (sizes + DF counts + join): disk stage
    # boundary, not cache() — a cache here has no release point (the
    # result is lazy) and leaks executor memory for the session
    from etl_hero_spark.checkpoint import parquet_checkpoint

    shingle_rows = parquet_checkpoint(
        _exploded_shingle_set(df, id_col, text_col, n), "shingles"
    )
    sizes = shingle_rows.groupBy("id").agg(F.count(F.lit(1)).alias("sh_size"))
    rare = (
        shingle_rows.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_shingle_df)
        .select("s")
    )
    # same join key as the self-join below -> co-partitioned, no extra
    # exchange for the probe sides
    capped = shingle_rows.join(rare, "s")
    # NOT checkpointed although both self-join sides consume it: the
    # duplicated groupBy/join subtrees run concurrently inside one job
    # over the checkpointed shingles, which measures FASTER than a
    # serial write barrier here (A/B'd r10: 1.6s vs 2.4s per build)
    exploded = capped.join(F.broadcast(sizes), "id").select(
        "id", "sh_size", "s"
    )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("sh_size").alias("size_a"), "s"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("sh_size").alias("size_b"), "s"
    )
    pairs = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        6,
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# 2. SimHash (64-bit near-dup signature)
# ---------------------------------------------------------------------------


def simhash_from_hashes_expr(hashes: Column, n_bits: int = 64) -> Column:
    """64-bit SimHash from an ALREADY MATERIALIZED token-hash array column:
    for each bit position, sum(+1 if bit set else -1) over token hashes ->
    sign bit of each sum. The hash array must be staged via withColumn —
    the 64 per-bit aggregates each reference it, and an inline subtree
    would re-tokenize and re-hash 64 times per row (no subexpression
    elimination across higher-order aggregates)."""
    # Unrolled over literal bit positions (shiftright/shiftleft take Python
    # ints, not Columns): one aggregate per bit over the token-hash array,
    # then OR the sign bits into a packed long. Wide expression tree but
    # pure JVM — no shuffle, no Python.
    def bit_sum(i: int) -> Column:
        # closure, not default-arg: HOF lambdas must be exactly 2-arg
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for i in range(n_bits):
        # two's complement: bit 63 as a long literal is the min long
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(bit_sum(i) > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_expr(text_col: str | Column, n_bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens, entirely JVM-side. Ad-hoc
    convenience form — hot paths must use with_simhash (staged hash
    array; see simhash_from_hashes_expr for why)."""
    hashes = F.transform(tokens_expr(text_col), lambda t: F.xxhash64(t))
    return simhash_from_hashes_expr(hashes, n_bits)


def with_simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", out: str = "simhash"
) -> DataFrame:
    """(id, simhash) with the token-hash array staged once per row."""
    return (
        ensure_min_partitions(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .withColumn(
            "_hashes",
            F.transform(
                tokens_expr(normalized_text_expr("_txt")), lambda t: F.xxhash64(t)
            ),
        )
        .select("id", simhash_from_hashes_expr(F.col("_hashes")).alias(out))
    )


def simhash_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(simhash, ids) groups with >=2 members — exact-signature near-dup
    buckets. The scale path for hamming<=k: split the 64-bit signature
    into k+1 bands and bucket-join per band (any pair within hamming k
    agrees exactly on >=1 band — pigeonhole)."""
    sh = with_simhash(df, id_col, text_col)
    return (
        sh.groupBy("simhash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("simhash", "ids", "n")
    )


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidates with hamming(simhash_a, simhash_b) <= max_hamming,
    found by banding: 4 x 16-bit bands; pairs agreeing on any band are
    candidates (pigeonhole covers hamming<=3), then exact popcount filter.
    Sub-quadratic: the cross product only forms inside identical-band
    buckets."""
    sh = with_simhash(df, id_col, text_col, out="h")
    # exact=False: the registered simhash query probes max_hamming=6
    # on 4 bands — the documented BEST-EFFORT recall posture above the
    # pigeonhole-exact <=3 regime (candidates still require one equal
    # band; the popcount filter keeps precision exact)
    return hash64_candidate_pairs(
        sh, id_col="id", hash_col="h",
        max_hamming=max_hamming, n_bands=n_bands, exact=False,
    )


def hash64_candidate_pairs(
    sh: DataFrame,
    id_col: str = "id",
    hash_col: str = "h",
    max_hamming: int = 3,
    n_bands: int = 4,
    exact: bool = True,
) -> DataFrame:
    """Banded Hamming-neighbor pairs over ANY 64-bit signature column
    — the signature-agnostic core of simhash_candidate_pairs, split
    out (r10) so the image perceptual-hash rung (multimodal.
    image_neardup_pairs, 64-bit dHash) shares one banding plan with
    text SimHash instead of duplicating it. Pigeonhole: any pair
    within hamming ``max_hamming`` agrees exactly on >= 1 of the
    ``n_bands`` disjoint bands when n_bands > max_hamming; the cross
    product only forms inside identical-band buckets (sub-quadratic),
    then an exact popcount filter keeps true neighbors. Output
    (id_a, id_b, hamming), id_a < id_b."""
    if exact and n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} must exceed max_hamming={max_hamming} "
            "for the pigeonhole banding guarantee — pass exact=False "
            "for the best-effort recall regime (precision stays exact)"
        )
    if 64 % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide 64 — a remainder would "
            "leave high bits outside every band and break pigeonhole"
        )
    sh = sh.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    band_width = 64 // n_bands
    mask = (1 << band_width) - 1
    bands = sh.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("h", i * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "h", "bk.band", "bk.key")
    a = bands.select(F.col("id").alias("id_a"), F.col("h").alias("h_a"), "band", "key")
    b = bands.select(F.col("id").alias("id_b"), F.col("h").alias("h_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 3. MinHash + banded LSH (sub-quadratic Jaccard candidates)
# ---------------------------------------------------------------------------


def minhash_signature_expr(
    shingle_col: Column, n_hashes: int = 32, seed: int = 42
) -> Column:
    """n_hashes-wide MinHash signature: min over shingles of
    xxhash64(shingle, salt_i). Universal-hash family via per-function salt
    prefix; empty shingle set -> nulls (filtered by caller)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s, i=i: F.xxhash64(F.concat(F.lit(f"{seed}:{i}:"), s)),
                )
            )
            for i in range(n_hashes)
        ]
    )


def _minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    n_hashes: int,
    seed: int,
) -> DataFrame:
    """(id, sig) MinHash signature table.

    Signature via explode -> groupBy with n_hashes codegen'd MIN
    aggregates: the HOF form (minhash_signature_expr) evaluates
    interpreted per shingle per hash function (~6x slower measured);
    row-form hashing stays inside whole-stage codegen. Each shingle is
    string-hashed ONCE (hashing the string n_hashes times cost ~8s at
    sf0.1 in string building alone); the universal family is then
    h_i = (a_i*h + b_i) mod P over a 31-bit prime field — the same
    construction Spark MLlib's MinHashLSH uses. Products stay < 2^62,
    so the arithmetic can never overflow (ANSI-mode safe). One extra
    (id-keyed, uniform) shuffle — cheap at any scale.

    Deterministic for a fixed seed across executors, runs, AND sessions
    (xxhash64 is seed-stable; the coefficient family derives from the
    seed) — which is what makes a PERSISTED signature index reusable:
    signatures computed today join against signatures written last month.
    """
    import random as _random

    _P = 2038074743  # 31-bit prime (as in MLlib MinHashLSH)
    rng = _random.Random(seed)
    coef = [
        (rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(n_hashes)
    ]
    # min() is duplicate-insensitive, so the raw exploded grams would do;
    # the distinct also shrinks the band-join input, which dominates
    exploded = _exploded_shingle_set(df, id_col, text_col, n).select(
        "id", F.pmod(F.xxhash64("s"), F.lit(_P)).alias("h")
    )
    return (
        exploded.groupBy("id")
        .agg(
            *[
                F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_P))).alias(
                    f"_h{i}"
                )
                for i, (a, b) in enumerate(coef)
            ]
        )
        .select(
            "id",
            F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )


def _band_key_table(
    sig: DataFrame, n_hashes: int, n_bands: int
) -> DataFrame:
    """(id, sig, band, key) — one row per (doc, band), key = md5 of the
    band's signature slice. Pairs agreeing on all rows of any band share
    a (band, key) bucket — the LSH blocking join key."""
    rows_per_band = n_hashes // n_bands
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    stage_key=None,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) near-dup candidates via banded MinHash-LSH.

    rows = n_hashes/n_bands per band; pairs agreeing on all rows of any
    band become candidates (s-curve threshold ~ (1/b)^(1/r)); est_jaccard
    = fraction of agreeing signature positions. The full pipeline is
    shuffle-bounded by band buckets — never all-pairs. Deterministic for a
    fixed seed (xxhash64 is seed-stable across executors/runs).

    ``stage_key``: callers whose input is immutable for the session
    (fixture/snapshot-backed) may pass an identity-and-freshness key —
    the signature table is then built once per key and reused across
    calls, like a stored LSH index.
    """
    # the signature table IS the index: both sides of the self-join
    # consume it, and without persistence the shingle hashing computes
    # twice (measured ~2x the whole query). It is an O(corpus) x
    # n_hashes table with no release point from here (the result is
    # lazy), so it goes through the disk stage boundary per the §4(c)
    # policy — executor memory is never held, both join sides read the
    # columnar file back; write_minhash_index is the durable variant.
    raw_sig = _minhash_signatures(df, id_col, text_col, n, n_hashes, seed)
    if stage_key is not None:
        sig = memo_parquet_checkpoint(
            raw_sig,
            ("minhash_sig", stage_key, n, n_hashes, seed),
            "minhash_sig",
        )
    else:
        sig = parquet_checkpoint(raw_sig, "minhash_sig")
    bands = _band_key_table(sig, n_hashes, n_bands)
    a = bands.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "key")
    b = bands.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "key")
    est = F.round(
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(n_hashes)),
        6,
    )
    # score each candidate the moment the bucket-join emits it, BEFORE the
    # pair dedup: est is deterministic per pair, so deduping (id_a, id_b,
    # est) is equivalent — and the dedup shuffle then carries 3 scalars
    # instead of two 32-long signature arrays
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .distinct()
    )


def _band_key_table_multi(
    sig: DataFrame, configs: list[tuple[int, int]]
) -> DataFrame:
    """(id, n_bands, rows_per_band, band, key) for SEVERAL banding
    configs over ONE signature table: each config's band keys are
    byte-identical to _band_key_table's (same md5 over the same
    signature slice), only tagged with the config so all configs ride
    one explode + one self-join instead of one pipeline per config."""
    entries = []
    for b, r in configs:
        for bi in range(b):
            entries.append(
                F.struct(
                    F.lit(b).alias("n_bands"),
                    F.lit(r).alias("rows_per_band"),
                    F.lit(bi).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[bi * r + k].cast("string")
                                for k in range(r)
                            ],
                        )
                    ).alias("key"),
                )
            )
    return sig.select(
        "id", F.explode(F.array(*entries)).alias("bk")
    ).select(
        "id", "bk.n_bands", "bk.rows_per_band", "bk.band", "bk.key"
    )


def minhash_lsh_candidates_multi(
    df: DataFrame,
    configs: list[tuple[int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    seed: int = 42,
    stage_key=None,
) -> DataFrame:
    """(n_bands, rows_per_band, id_a, id_b) DISTINCT banded-LSH
    candidate pairs for several (n_bands, rows_per_band) configs over
    ONE shared signature table — the banding-evaluation probe
    (dedup_lsh_recall_report compares three configs against the exact
    ground truth; VERDICT r10 #3: each config re-banded and re-joined
    the signature table separately). Per config the pair set is
    EXACTLY minhash_lsh_pairs(n_hashes=b*r, n_bands=b, threshold=0.0)'s
    (id_a, id_b) set — same hash family over the first b*r of the
    shared n_hashes signature positions, same md5 band keys — pinned
    in tests/test_dedup.py. No est_jaccard column: the banding probe
    evaluates CANDIDATE GENERATION; callers that need the signature
    agreement score use minhash_lsh_pairs.

    Every config must satisfy n_bands * rows_per_band <= n_hashes (the
    slices index the shared signature array)."""
    for b, r in configs:
        if b < 1 or r < 1 or b * r > n_hashes:
            raise ValueError(
                "minhash_lsh_candidates_multi: config "
                f"({b}, {r}) needs 1 <= n_bands*rows_per_band <= "
                f"n_hashes ({n_hashes})"
            )
    raw_sig = _minhash_signatures(df, id_col, text_col, n, n_hashes, seed)
    if stage_key is not None:
        sig = memo_parquet_checkpoint(
            raw_sig,
            ("minhash_sig", stage_key, n, n_hashes, seed),
            "minhash_sig",
        )
    else:
        sig = parquet_checkpoint(raw_sig, "minhash_sig")
    bands = _band_key_table_multi(sig, configs)
    a = bands.select(
        F.col("id").alias("id_a"),
        "n_bands",
        "rows_per_band",
        "band",
        "key",
    )
    b_ = bands.select(
        F.col("id").alias("id_b"),
        "n_bands",
        "rows_per_band",
        "band",
        "key",
    )
    return (
        a.join(b_, ["n_bands", "rows_per_band", "band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("n_bands", "rows_per_band", "id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# 3b. persisted MinHash index + incremental dedup (the 100 TB workflow:
#     signatures are computed ONCE per corpus snapshot and written to
#     storage; each new ingest batch signs itself and joins the stored
#     bands — the corpus text is never re-read, never re-hashed)
# ---------------------------------------------------------------------------


def write_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    seed: int = 42,
) -> None:
    """Persist the banded MinHash index for `df` to parquet at `path`:
    (id, sig, band, key) rows, partitioned by band so an incremental
    probe prunes to the band partitions it actually touches.

    The (n, n_hashes, n_bands, seed) parameters are part of the index
    identity — probes MUST use the same values (seed-stable xxhash64 +
    seed-derived coefficients make signatures reproducible across
    sessions, which is what makes persistence sound).
    """
    bands = _band_key_table(
        _minhash_signatures(df, id_col, text_col, n, n_hashes, seed),
        n_hashes,
        n_bands,
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(path)


def read_minhash_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pairs_against_minhash_index(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(batch_id, corpus_id, est_jaccard) near-dup candidates between a
    NEW batch and a persisted corpus index (write_minhash_index) — the
    incremental rung of the dedup ladder.

    The batch signs itself (one pass over batch text only), then
    equi-joins the stored bands on (band, key). Cost scales with the
    batch, not the corpus: the corpus side is a pruned parquet scan of
    matching band partitions, and candidate scoring reads the STORED
    signatures — no corpus text is touched. Same seed -> same hash
    family -> est_jaccard is identical to what the self-join form
    (minhash_lsh_pairs) would report for the same pair.
    """
    # no cache here: unlike the self-join form, the batch signature has
    # exactly one consumer (the probe side) — the other join side is the
    # stored index
    sig = _minhash_signatures(batch, id_col, text_col, n, n_hashes, seed)
    bb = _band_key_table(sig, n_hashes, n_bands)
    a = bb.select(
        F.col("id").alias("batch_id"), F.col("sig").alias("sig_a"), "band", "key"
    )
    b = index.select(
        F.col("id").alias("corpus_id"), F.col("sig").alias("sig_b"), "band", "key"
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(n_hashes)),
        6,
    )
    return (
        a.join(b, ["band", "key"])
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("batch_id", "corpus_id", "est_jaccard")
        .distinct()
    )


def dedup_against_minhash_index(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Batch rows that are NOT near-dups of the indexed corpus — the
    filter form of pairs_against_minhash_index (left-anti join on the
    flagged batch ids; the candidate set is tiny next to the batch)."""
    flagged = (
        pairs_against_minhash_index(batch, index, id_col=id_col, **kwargs)
        .select(F.col("batch_id").alias(id_col))
        .distinct()
    )
    return batch.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------------
# 5. connected components -> dedup clusters (the step AFTER pair
#    generation: at 100 TB near-dup pairs are only candidates — the
#    cluster assignment picks one canonical doc per component)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component =
    smallest id reachable over the pair edges.

    Distributed min-label propagation with pointer jumping: each round
    (1) relaxes labels over edges (neighbor min) and (2) jumps pointers
    (label of label), so labels converge in O(log diameter) rounds —
    a million-doc duplicate chain needs ~20 rounds, a typical near-dup
    cluster (diameter <= 4) needs 2. Every round is two uniform-key
    shuffles (edge join + min agg) plus one self-join; per-round results
    are localCheckpoint'd to truncate the iterative lineage (swap for
    checkpoint(dir) on a real cluster to also drop executor state).

    The reference has no graph operator — this generalizes its
    drop_duplicates (app.py:308-315) to transitive near-duplicate
    closure, the standard construction for corpus-level fuzzy dedup.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    # init: own id vs direct-neighbor min — saves one full round
    labels = edges.groupBy("u").agg(
        F.least(F.first("u"), F.min("v")).alias("l")
    ).select(F.col("u").alias("id"), "l")
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        # (1) edge relax: candidate label for u = min over neighbors' labels
        nb = (
            edges.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("l").alias("nl"))
            .select(F.col("u").alias("id"), "nl")
        )
        relaxed = (
            labels.join(nb, "id", "left")
            .select(
                "id",
                F.col("l").alias("_lp"),
                F.least("l", F.coalesce("nl", "l")).alias("l"),
            )
        )
        # (2) pointer jump: label of my label (labels form a forest whose
        # roots are component minima; jumping halves the depth). The
        # PREVIOUS label rides along as _lp so the convergence check is
        # a filter over the checkpointed result instead of an extra
        # labels-join job per round.
        jumped = (
            relaxed.join(
                relaxed.select(
                    F.col("id").alias("l"), F.col("l").alias("ll")
                ),
                "l",
                "left",
            )
            .select(
                "id",
                "_lp",
                F.least("l", F.coalesce("ll", "l")).alias("l"),
            )
        )
        jumped = jumped.localCheckpoint(eager=True)
        changed = (
            jumped.filter(F.col("l") != F.col("_lp")).limit(1).count()
        )
        labels = jumped.select("id", "l")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("l").alias("component"))


def assign_dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every row of ``df`` tagged with its near-dup cluster: cluster_id =
    smallest doc id in the row's connected component (own id for docs in
    no pair), is_canonical = 1 for the cluster minimum — the row a
    keep-one-per-cluster dedup retains.

    Scale note: the components table holds every doc with >=1 near-dup
    pair. At web-crawl dup rates (RefinedWeb removes 30-50% of docs as
    near-dups) that is O(corpus), so the assignment join must NOT be a
    mandatory broadcast — a forced broadcast OOMs the driver at 100 TB.
    The join is left un-hinted: AQE broadcasts it when the runtime size
    fits ``spark.sql.autoBroadcastJoinThreshold`` and falls back to a
    shuffled hash join on the uniform doc-id key otherwise (both sides
    hash-partition on ``id_col``; no skew — ids are unique)."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("id").alias(id_col), "component"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return (
        df.join(comp, id_col, "left")
        .withColumn("cluster_id", cluster)
        .withColumn(
            "is_canonical",
            (F.col(id_col) == F.col("cluster_id")).cast("int"),
        )
        .drop("component")
    )


# ---------------------------------------------------------------------------
# 6. benchmark decontamination (training-corpus hygiene: drop documents
#    that leak evaluation data)
# ---------------------------------------------------------------------------


def flag_benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """``docs`` plus a ``contaminated`` flag: 1 iff the doc shares at
    least one word n-gram with any benchmark text.

    Scale shape: the benchmark side is small by definition (eval sets
    are thousands of rows, the corpus is billions), so its distinct
    shingle set BROADCASTS and the corpus side is a linear scan + a
    broadcast semi-join — the 100 TB corpus never shuffles. n=8 word
    grams is the published-decontamination ballpark (GPT-3 used 13-gram
    overlap); at 8+ the false-positive rate on independent text is
    negligible while verbatim eval leakage is caught.
    """
    doc_sh = _exploded_shingle_set(docs, id_col, text_col, n)
    bench_sh = _exploded_shingle_set(benchmark, id_col, text_col, n).select(
        "s"
    ).distinct()
    hit_ids = (
        doc_sh.join(F.broadcast(bench_sh), "s", "left_semi")
        .select("id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return (
        docs.join(
            F.broadcast(hit_ids.withColumnRenamed("id", id_col)),
            id_col,
            "left",
        )
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(0)))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Corpus minus contaminated docs (the filtering form)."""
    flagged = flag_benchmark_contamination(docs, benchmark, id_col, text_col, n)
    return flagged.filter(F.col("contaminated") == 0).drop("contaminated")


def flag_benchmark_contamination_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Fuzzy decontamination: flag docs that are NEAR-duplicates of any
    benchmark item — the paraphrased/lightly-edited eval leakage the
    exact n-gram pass (flag_benchmark_contamination) cannot see. Adds
    ``contaminated_fuzzy`` (0/1) and ``max_est_jaccard`` (similarity to
    the closest benchmark item; NULL when no banded candidate).

    Plan: the benchmark (small by definition) signs and bands once and
    sits on the build side; the corpus signs itself in one linear pass
    and equi-joins on (band, key) — banded sub-quadratic candidates,
    estimated Jaccard from stored signatures, corpus text touched
    exactly once. Same hash family as the whole dedup ladder (same
    seed -> comparable estimates).
    """
    bench_sig = _minhash_signatures(
        benchmark, id_col, text_col, n, n_hashes, seed
    )
    bench_bands = _band_key_table(bench_sig, n_hashes, n_bands)
    hits = pairs_against_minhash_index(
        docs,
        bench_bands,
        id_col=id_col,
        text_col=text_col,
        n=n,
        n_hashes=n_hashes,
        n_bands=n_bands,
        threshold=threshold,
        seed=seed,
    )
    per_doc = hits.groupBy(
        F.col("batch_id").alias(id_col)
    ).agg(F.max("est_jaccard").alias("max_est_jaccard"))
    return (
        docs.join(F.broadcast(per_doc), id_col, "left")
        .withColumn(
            "contaminated_fuzzy",
            F.col("max_est_jaccard").isNotNull().cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# 9. repeated-span (substring) dedup — Lee et al. 2022 re-expressed
# ---------------------------------------------------------------------------


def _tokens_positional(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok): every document's normalized token stream with
    positions — the shared input of the span detector and the span
    stripper's rebuild (build it once, checkpoint, pass to both)."""
    return (
        ensure_min_partitions(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .withColumn("_toks", tokens_expr(normalized_text_expr("_txt")))
        .select("id", F.posexplode("_toks").alias("pos", "tok"))
    )


def _positional_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    tok_rows: DataFrame | None = None,
) -> DataFrame:
    """(id, pos, wh): the md5 of the n-token window STARTING at every
    token position — _exploded_shingle_set's positional sibling (same
    relational lead-window build, no interpreted lambdas), positions
    kept instead of distinct'd because span assembly needs them.
    ``tok_rows``: a precomputed (id, pos, tok) table (see
    _tokens_positional) so a caller that also consumes the token
    stream tokenizes the corpus once."""
    w = W.partitionBy("id").orderBy("pos")
    if tok_rows is None:
        tok_rows = _tokens_positional(df, id_col, text_col)
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(w) for j in range(1, n)
    ]
    return (
        tok_rows.withColumn("_last", parts[-1] if n > 1 else F.col("tok"))
        .withColumn("wh", F.md5(F.concat_ws(" ", *parts)))
        .filter(F.col("_last").isNotNull())
        .select("id", "pos", "wh")
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    tok_rows: DataFrame | None = None,
) -> DataFrame:
    """Maximal per-document token spans covered by CORPUS-REPEATED
    n-token windows — the distributed re-expression of suffix-array
    substring deduplication (Lee et al. 2022, arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better"): a
    window that occurs >= ``min_count`` times anywhere in the corpus
    (another document OR the same one — intra-document repeats count,
    as in the paper) marks its n tokens as duplicated text; overlapping
    and touching duplicated windows merge into maximal spans.

    Output: (id, span_start, span_end, n_windows, span_tokens) with
    token-index bounds [span_start, span_end) and span_tokens =
    span_end - span_start.

    Plan (all linear, no suffix array needed): one corpus pass builds
    positional window hashes (lead window over (id, pos) — uniform
    keys); ONE groupBy counts corpus-wide occurrences (partial agg
    map-side); the duplicated subset joins back on the uniform hash
    key; span assembly is gaps-and-islands per document (one more
    id-keyed window). Normalization matches the rest of the dedup
    family (lowercase + whitespace collapse), so casing variants
    collide here too.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    wins = parquet_checkpoint(
        _positional_windows(df, id_col, text_col, n, tok_rows=tok_rows),
        "span-wins",
    )
    dup_keys = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= int(min_count))
        .select("wh")
    )
    dup = wins.join(dup_keys, "wh").select("id", "pos")
    return _assemble_spans(dup, id_col, n)


def _assemble_spans(dup: DataFrame, id_col: str, n: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window positions into
    maximal spans — shared by the corpus-wide and incremental forms
    (identical island semantics is what makes the incremental rung's
    equivalence test meaningful)."""
    w = W.partitionBy("id").orderBy("pos")
    # new island when this window no longer overlaps-or-touches the
    # previous one: its start is past prev_start + n
    new_island = (
        F.when(F.lag("pos").over(w).isNull(), F.lit(1))
        .when(F.col("pos") > F.lag("pos").over(w) + n, F.lit(1))
        .otherwise(F.lit(0))
    )
    islands = dup.withColumn(
        "_isl",
        F.sum(new_island).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        islands.groupBy("id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            "n_windows",
            (F.col("span_end") - F.col("span_start")).alias(
                "span_tokens"
            ),
        )
    )


def write_span_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> None:
    """Persist the corpus WINDOW-HASH COUNT table to parquet at
    ``path`` — the maintained artifact that makes repeated-span dedup
    incremental (the persisted-index sibling of write_minhash_index):
    at 100 TB the corpus's n-gram-window counts are built once and
    each new crawl batch probes them, instead of re-counting the whole
    corpus per batch. ``n`` is part of the index identity — probes
    MUST use the same window length (md5 of the space-joined window,
    reproducible across sessions). Schema: (wh, cnt)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    counts = (
        _positional_windows(df, id_col, text_col, n)
        .groupBy("wh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts.write.mode("overwrite").parquet(path)


def repeated_spans_incremental(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Repeated-span detection for a NEW batch against a persisted
    corpus window-count index (write_span_index): a batch window is
    duplicated when its corpus count PLUS its in-batch count reaches
    ``min_count`` — exactly the windows the corpus-wide recompute
    over (corpus UNION batch) would flag on the batch's documents, so
    the incremental probe returns byte-identical spans for batch ids
    (equivalence pinned in tests/test_dedup.py).

    Plan: the batch's positional windows (linear in the BATCH) fold to
    batch counts, LEFT join the index on the uniform hash key, filter,
    join back, and assemble islands — the corpus is never re-scanned.
    Same output schema as repeated_spans."""
    if n < 1:
        raise ValueError("n must be >= 1")
    spark = batch.sparkSession
    idx = spark.read.parquet(index_path).select(
        "wh", F.col("cnt").alias("_idx_cnt")
    )
    wins = parquet_checkpoint(
        _positional_windows(batch, id_col, text_col, n), "span-wins-inc"
    )
    batch_counts = wins.groupBy("wh").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    dup_keys = (
        batch_counts.join(idx, "wh", "left")
        .filter(
            F.col("_bc") + F.coalesce(F.col("_idx_cnt"), F.lit(0))
            >= int(min_count)
        )
        .select("wh")
    )
    dup = wins.join(dup_keys, "wh").select("id", "pos")
    return _assemble_spans(dup, id_col, n)


class SpanDocScaleError(RuntimeError):
    """A single document exceeds strip_repeated_spans' per-doc token
    cap — its ordered rebuild window would concentrate on one executor."""


def strip_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    min_span_tokens: int | None = None,
    max_doc_tokens: int = 2_000_000,
) -> DataFrame:
    """Remediation over repeated_spans: rebuild each document's
    NORMALIZED text with every qualifying duplicated span removed
    (spans shorter than ``min_span_tokens`` survive — by default every
    detected span is stripped). Output: input columns plus
    ``text_stripped`` and ``n_tokens_removed``.

    The rebuild stays relational: covered token positions come from
    exploding each duplicated span to its token range (blowup bounded
    by the duplicated text itself, never the corpus); kept tokens
    reassemble via an order-preserving collect_list over the (id, pos)
    window + array_join — both codegen'd, no interpreted per-token
    lambda. Text is rebuilt from the SAME normalized token stream the
    detector saw, so offsets always agree.

    The ordered per-doc collect_list is the ONE place in the dedup
    family where a single pathological document concentrates work on
    one executor, so it carries the family's loud-cap posture
    (TrigramScaleError / basket caps): documents above
    ``max_doc_tokens`` raise SpanDocScaleError naming the alternative
    — chunk giants with textops.chunk_documents first, strip per chunk,
    reassemble by (doc, chunk_idx). The guard is measured from the
    same token table the rebuild explodes (one cheap count-groupBy).
    """
    min_span = n if min_span_tokens is None else int(min_span_tokens)
    # ONE tokenize+posexplode pass feeds the span detector, the giant
    # guard, and the rebuild's anti-join (it used to run three times:
    # once inside _positional_windows and once per tok_rows consumer)
    tok_rows = parquet_checkpoint(
        _tokens_positional(df, id_col, text_col), "span-tokens"
    )
    spans = repeated_spans(
        df, id_col, text_col, n=n, min_count=min_count, tok_rows=tok_rows
    ).filter(F.col("span_tokens") >= min_span)
    covered = spans.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("pos"),
    ).distinct()
    giant = (
        tok_rows.groupBy("id")
        .agg(F.count(F.lit(1)).alias("_n_tok"))
        .filter(F.col("_n_tok") > int(max_doc_tokens))
        .orderBy(F.desc("_n_tok"))
        .limit(3)
        .collect()
    )
    if giant:
        worst = ", ".join(f"{r['id']}({r['_n_tok']} tokens)" for r in giant)
        raise SpanDocScaleError(
            f"strip_repeated_spans: document(s) exceed max_doc_tokens="
            f"{max_doc_tokens}: {worst}. The per-doc ordered rebuild "
            "window would concentrate one giant document on a single "
            "executor — chunk giants first (textops.chunk_documents), strip "
            "per chunk, and reassemble by (doc, chunk_idx), or raise "
            "max_doc_tokens explicitly if the executors can hold it."
        )
    kept = tok_rows.join(covered, ["id", "pos"], "left_anti")
    w_full = (
        W.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    rebuilt = (
        kept.select(
            "id",
            F.array_join(
                F.collect_list("tok").over(w_full), " "
            ).alias("text_stripped"),
        )
        .groupBy("id")
        .agg(F.max("text_stripped").alias("text_stripped"))
    )
    removed = covered.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens_removed")
    )
    return (
        df.join(
            rebuilt.withColumnRenamed("id", id_col), id_col, "left"
        )
        .join(
            removed.withColumnRenamed("id", id_col), id_col, "left"
        )
        .withColumn(
            "n_tokens_removed",
            F.coalesce(F.col("n_tokens_removed"), F.lit(0)).cast(
                "bigint"
            ),
        )
        .withColumn(
            "text_stripped",
            F.when(
                F.col("text_stripped").isNotNull(),
                F.col("text_stripped"),
            ).otherwise(
                # no token survived (fully-duplicated doc) OR the doc
                # had no detected span; disambiguate via the counter
                F.when(
                    F.col("n_tokens_removed") > 0, F.lit("")
                ).otherwise(
                    F.array_join(
                        tokens_expr(normalized_text_expr(text_col)), " "
                    )
                )
            ),
        )
    )
