"""Fuzzy entity resolution: blocked edit-distance candidate pairs.

The reference has no record-linkage surface (it operates on one table,
SURVEY §2.3) — this is a training-data-pipeline extension: finding
near-identical *records* (names, titles, product labels) whose text is
too short for shingle/minhash rungs (dedup.py) to discriminate.

Plan shape (the classic ER blocking construction):

  1. BLOCK — derive a cheap deterministic key (default: lowercased first
     token + string length band). Only records sharing a block key are
     ever compared, so the join is an equi-join on the key — never an
     all-pairs cross product.
  2. CAP — drop blocks with more than `max_block_size` members before
     the self-join (a mega-block is the ER analogue of a stop shingle:
     a block shared by k records emits k^2 candidate rows; past the cap
     it carries no discriminating signal). Capping bounds per-task work
     at scale; it is a no-op when every block is small (asserted for the
     test corpus).
  3. MATCH — `F.levenshtein` (JVM codegen, classic Wagner-Fischer edit
     distance; identical semantics in DuckDB's `levenshtein`, which the
     tests use as a cross-engine oracle) with `id_a < id_b` dedup and a
     length-difference pre-filter (|len_a − len_b| > max_dist implies
     distance > max_dist — prunes most of the block without computing
     the O(m·n) distance).

At 100 TB: one shuffle on the block key for the self-join; block-size
capping bounds skew; the length pre-filter is codegen'd and cheap. For
higher recall, union several block keys (first token, soundex, length
band) — each one is the same bounded equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key_expr(name_col: str | Column, band: int = 8) -> Column:
    """Blocking key: lowercased first whitespace token + length band.

    The length band (len // band) keeps wildly different-length strings
    out of the same block; paired with the per-pair length pre-filter it
    is conservative (a true match within max_dist can still land in two
    adjacent bands — recall knob, not a correctness claim; union a
    shifted band for full recall at distance <= band).
    """
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    low = F.lower(F.trim(c))
    first = F.split(low, r"\s+").getItem(0)
    return F.concat_ws(
        "|", first, (F.length(low) / band).cast("int").cast("string")
    )


def phonetic_block_key_expr(name_col: str | Column) -> Column:
    """Phonetic blocking key: SOUNDEX of the first token (built-in
    F.soundex — JVM expression). Catches same-sounding spelling
    variants the prefix block separates ("jon"/"john", "smith"/
    "smyth"); blind to variants that change the leading letter
    (soundex keeps it), so compose with the prefix block via
    ``blocking="both"`` — candidates = union of both key spaces, the
    standard multi-pass blocking of record-linkage practice."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    first = F.split(F.lower(F.trim(c)), r"\s+").getItem(0)
    return F.concat(F.lit("sx:"), F.soundex(first))


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 3,
    band: int = 8,
    max_block_size: int = 1000,
    blocking: str = "prefix",
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist) for same-block record pairs
    with levenshtein(name_a, name_b) <= max_dist, id_a < id_b.

    ``blocking``: "prefix" (first token + length band), "soundex"
    (phonetic first token), or "both" (multi-pass: a pair is a
    candidate if EITHER key matches — each record explodes onto its
    <=2 keys, the self-join dedupes via id_a < id_b + distinct).
    """
    if blocking == "prefix":
        keys = F.array(block_key_expr(name_col, band))
    elif blocking == "soundex":
        keys = F.array(phonetic_block_key_expr(name_col))
    elif blocking == "both":
        keys = F.array(
            block_key_expr(name_col, band),
            phonetic_block_key_expr(name_col),
        )
    else:
        raise ValueError(f"unknown blocking {blocking!r}")
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.explode(keys).alias("blk"),
        F.length(F.col(name_col)).alias("ln"),
    )
    small = (
        keyed.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_block_size)
        .select("blk")
    )
    # same join key as the self-join -> co-partitioned, no extra exchange
    capped = keyed.join(small, "blk")
    a = capped.select(
        "blk",
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("ln").alias("ln_a"),
    )
    b = capped.select(
        "blk",
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        # length pre-filter: |len_a - len_b| > d  =>  edit distance > d
        .filter(F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
        .distinct()  # multi-pass blocking can find a pair via both keys
    )


def fuzzy_edges(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 3,
    band: int = 8,
    max_block_size: int = 10_000,
    oversized: str = "route",
    route_max_df: int = 200,
) -> DataFrame:
    """Match EDGES (id_a, id_b) sufficient for transitive closure —
    the linear-edge form of fuzzy_pairs, built for resolve_entities
    (r10, VERDICT r9 #3).

    Two structural changes vs fuzzy_pairs' all-pairs contract:

    1. DISTINCT-NAME COLLAPSE: levenshtein depends only on the
       strings, so verification runs over the distinct (block, name)
       dictionary — one representative (min id) per name — and every
       other member connects to its representative by a STAR edge
       (dist 0, no verify). A hot block of m rows with u distinct
       names costs u^2/2 verifies instead of m^2/2, and the edge
       count is (m - u) + matched-rep-pairs — LINEAR in m, never the
       m^2/2 pair blowup (exact-duplicate groups, the dominant case
       in real dirty data, become free). Components are IDENTICAL to
       closing over fuzzy_pairs' full pair set: members reach their
       rep via the star, and rep-rep edges exist exactly when any
       cross-member pair would match (same strings, same distance).

    2. SELF-HEALING CAP (``oversized``): a block whose DICTIONARY
       exceeds ``max_block_size`` is not dropped ("drop", the old
       silent posture) or errored — by default its representatives
       re-route through the rare-trigram candidate rung
       (trigram_candidate_pairs, ``route_max_df``) with the same
       levenshtein <= max_dist verify, so a saturated blocking key
       degrades to a bounded-fanout index instead of losing recall
       or going quadratic. The trigram pre-flight runs in "warn"
       mode here: the reroute is the fallback, it must not raise.

    Output: (id_a, id_b) with id_a < id_b. Edge semantics only — use
    fuzzy_pairs when the per-pair (name_a, name_b, dist) surface is
    the product."""
    if oversized not in ("route", "drop"):
        raise ValueError(f"unknown oversized policy {oversized!r}")
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block_key_expr(name_col, band).alias("blk"),
    )
    # dictionary: one representative per (block, name); the same
    # (blk, name) shuffle serves the star join-back below
    reps = keyed.groupBy("blk", "name").agg(F.min("id").alias("rid"))
    star = (
        keyed.join(reps, ["blk", "name"])
        .filter(F.col("id") != F.col("rid"))
        .select(
            F.col("rid").alias("id_a"), F.col("id").alias("id_b")
        )
    )
    sizes = reps.groupBy("blk").agg(F.count(F.lit(1)).alias("_u"))
    small = sizes.filter(F.col("_u") <= max_block_size).select("blk")
    in_small = reps.join(small, "blk")
    a = in_small.select(
        "blk",
        F.col("rid").alias("id_a"),
        F.col("name").alias("name_a"),
        F.length("name").alias("ln_a"),
    )
    b = in_small.select(
        "blk",
        F.col("rid").alias("id_b"),
        F.col("name").alias("name_b"),
        F.length("name").alias("ln_b"),
    )
    rep_edges = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
        .filter(F.levenshtein("name_a", "name_b") <= max_dist)
        .select("id_a", "id_b")
    )
    edges = star.unionByName(rep_edges)
    if oversized == "route":
        hot = sizes.filter(F.col("_u") > max_block_size).select("blk")
        hot_reps = reps.join(hot, "blk").select("rid", "name")
        cand = trigram_candidate_pairs(
            hot_reps,
            "rid",
            "name",
            max_df=route_max_df,
            on_oversized="warn",
        )
        names = hot_reps.select(
            F.col("rid").alias("id"), F.col("name").alias("s")
        )
        routed = (
            cand.join(
                names.select(
                    F.col("id").alias("id_a"), F.col("s").alias("s_a")
                ),
                "id_a",
            )
            .join(
                names.select(
                    F.col("id").alias("id_b"), F.col("s").alias("s_b")
                ),
                "id_b",
            )
            .filter(
                F.abs(F.length("s_a") - F.length("s_b")) <= max_dist
            )
            .filter(F.levenshtein("s_a", "s_b") <= max_dist)
            .select("id_a", "id_b")
        )
        edges = edges.unionByName(routed)
    return edges


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 3,
    band: int = 8,
    max_block_size: int = 10_000,
) -> DataFrame:
    """End-to-end entity resolution: fuzzy_pairs candidates -> transitive
    closure over the match edges (pointer-jumping connected components,
    the same operator as the dedup ladder) -> one CANONICAL id per
    entity group (the smallest member id; singletons are their own
    canonical). The record-linkage counterpart of simsearch's
    semantic_dedup.

    Output: one row per input record — (id_col, name_col, canonical_id,
    is_canonical). Downstream joins replace id_col with canonical_id to
    merge duplicate records.

    Scale (r10): the edge stage is fuzzy_edges — distinct-name
    collapse (verify cost = dictionary^2 per block, not members^2;
    star edges make exact-duplicate groups free) with the oversized-
    block trigram reroute, so a saturated blocking key degrades to a
    bounded-fanout index instead of silently losing recall (VERDICT
    r9 #3); the closure is O(log diameter) bounded-shuffle rounds;
    the final assignment is a left join on the record id (unique key,
    no fan-out). ``max_block_size`` caps DISTINCT NAMES per block —
    the verify-stage cost driver — not raw members.
    """
    from etl_hero_spark.dedup import assign_dedup_clusters

    pairs = fuzzy_edges(
        df.select(F.col(id_col), F.col(name_col)),
        id_col=id_col,
        name_col=name_col,
        max_dist=max_dist,
        band=band,
        max_block_size=max_block_size,
    )
    # closure + canonical assignment is the dedup ladder's
    # assign_dedup_clusters (one definition; the components join is
    # un-hinted — AQE broadcasts it only when the runtime size fits)
    return assign_dedup_clusters(
        df.select(id_col, name_col), pairs, id_col=id_col
    ).select(
        id_col,
        name_col,
        F.col("cluster_id").alias("canonical_id"),
        "is_canonical",
    )


# ---------------------------------------------------------------------------
# incremental ER: persisted canonical index + batch delta resolve
# (the record-linkage twin of dedup.py's persisted MinHash index — new
# batches resolve against stored canonicals without recomputing the
# corpus-wide closure)
# ---------------------------------------------------------------------------

N_BLK_BUCKETS = 64


def write_er_index(
    resolved: DataFrame,
    path: str,
    id_col: str = "id",
    name_col: str = "name",
    band: int = 8,
) -> None:
    """Persist a canonical index from resolve_entities output: every row
    (id, name, canonical_id) plus its block key and a stable
    xxhash64(blk) partition bucket, so an incremental probe prunes the
    scan to the buckets its batch blocks actually hash into — the same
    partition-pruning construction as write_minhash_index's
    partitionBy(band).

    ``band`` is part of the index identity: probes MUST pass the same
    value or block keys will not line up (as with the MinHash index's
    (n, n_hashes, n_bands, seed))."""
    keyed = resolved.select(
        F.col(id_col),
        F.col(name_col),
        "canonical_id",
        block_key_expr(name_col, band).alias("blk"),
        F.length(F.col(name_col)).alias("ln"),
    ).withColumn(
        "_bucket", F.pmod(F.xxhash64("blk"), F.lit(N_BLK_BUCKETS))
    )
    keyed.write.mode("overwrite").partitionBy("_bucket").parquet(path)


def read_er_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def resolve_entities_incremental(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 3,
    band: int = 8,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Resolve a NEW batch against a persisted canonical index without
    re-running the corpus-wide closure. Returns assignments for every
    AFFECTED record only:

      * every batch record — (id, name, canonical_id, is_canonical)
      * every STORED record whose canonical changed (its group merged
        with another group or with a smaller-id batch record)

    Apply with apply_er_delta(index, delta) to get the full updated
    table; tests pin apply_er_delta(index, delta) == resolve_entities
    over the union corpus.

    Why it is equivalent to the full-batch resolve: ER clustering is the
    transitive closure of the match edges, and closure composes — the
    union graph's components equal the components of the QUOTIENT graph
    where each stored cluster is contracted to its canonical node (the
    cluster's min id) plus the new batch-batch and batch-stored edges.
    Old-old edges need no recompute (blocking and levenshtein are
    deterministic, so the stored closure already contains them all).
    The canonical of a merged component is the min over its member ids
    = min(batch ids, stored canonical ids) because each stored
    canonical IS its cluster's min.

    Cost shape at scale: the probe equi-joins on the block key, so only
    index rows whose block appears in the batch participate — the index
    scan is partition-pruned to the batch's blk buckets (N_BLK_BUCKETS
    hash partitions, pruned via an isNotNull semi-join on the batch's
    tiny distinct-bucket set), the closure runs on the touched
    subgraph (O(batch + touched clusters), not O(corpus)), and no
    stored name is re-compared against any stored name. The block cap
    reproduces the full-batch semantics exactly: a block is dropped
    iff its COMBINED (stored + batch) membership exceeds
    max_block_size, the same count the full run would see.

    One inherent asymmetry of ANY incremental linkage: if batch rows
    push a block past the cap, the full-batch run would also discard
    that block's OLD-old pairs — possibly splitting stored clusters —
    while the incremental form never un-merges. Equivalence to the
    full run therefore holds whenever no block crosses the cap
    between snapshots (the tests pin both the equivalence and this
    documented divergence).
    """
    from etl_hero_spark.dedup import connected_components

    keyed_b = batch.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block_key_expr(name_col, band).alias("blk"),
        F.length(F.col(name_col)).alias("ln"),
    )
    # partition-prune the index to the batch's blk buckets (tiny set,
    # broadcast): only matching parquet partitions are read
    batch_buckets = keyed_b.select(
        F.pmod(F.xxhash64("blk"), F.lit(N_BLK_BUCKETS)).alias("_bucket")
    ).distinct()
    idx = index.join(F.broadcast(batch_buckets), "_bucket")

    # combined block sizes == what a full run over old ∪ new would see
    counts_b = keyed_b.groupBy("blk").agg(F.count(F.lit(1)).alias("_nb"))
    counts_s = (
        idx.join(F.broadcast(counts_b.select("blk")), "blk", "left_semi")
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_ns"))
    )
    ok_blocks = (
        counts_b.join(counts_s, "blk", "left")
        .filter(
            F.col("_nb") + F.coalesce(F.col("_ns"), F.lit(0))
            <= max_block_size
        )
        .select("blk")
    )
    kb = keyed_b.join(ok_blocks, "blk")
    ks = idx.join(F.broadcast(ok_blocks), "blk").select(
        "blk", "id", "name", "ln", "canonical_id"
    )

    def _match(a, b, right_cols):
        return (
            a.join(b, "blk")
            .filter(F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
            .filter(F.levenshtein("name_a", "name_b") <= max_dist)
            .select(*right_cols)
        )

    a = kb.select(
        "blk",
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("ln").alias("ln_a"),
    )
    bb = kb.select(
        "blk",
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("ln").alias("ln_b"),
    )
    # batch-batch edges (id_a < id_b dedup)
    e_bb = _match(
        a, bb, ["id_a", "id_b"]
    ).filter(F.col("id_a") < F.col("id_b"))
    # batch-stored edges, CONTRACTED to the stored cluster's canonical
    sb = ks.select(
        "blk",
        F.col("canonical_id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("ln").alias("ln_b"),
    )
    e_bs = _match(a, sb, ["id_a", "id_b"]).distinct()

    comp = connected_components(
        e_bb.unionByName(e_bs), id_a="id_a", id_b="id_b"
    )

    # batch assignments: component min (falls back to own id)
    batch_assign = (
        keyed_b.join(comp.withColumnRenamed("id", "_cid"),
                     keyed_b["id"] == F.col("_cid"), "left")
        .select(
            "id",
            "name",
            F.coalesce(F.col("component"), F.col("id")).alias("canonical_id"),
        )
    )
    # stored groups whose canonical moved: remap every member row
    remap = (
        comp.join(
            idx.select(F.col("canonical_id").alias("id")).distinct(), "id"
        )
        .filter(F.col("component") != F.col("id"))
        .select(
            F.col("id").alias("_old_canon"),
            F.col("component").alias("_new_canon"),
        )
    )
    stored_changed = (
        index.join(
            F.broadcast(remap),
            index["canonical_id"] == F.col("_old_canon"),
        )
        .select(
            "id",
            "name",
            F.col("_new_canon").alias("canonical_id"),
        )
    )
    return (
        batch_assign.unionByName(stored_changed)
        .withColumn(
            "is_canonical",
            (F.col("id") == F.col("canonical_id")).cast("int"),
        )
        .withColumnRenamed("id", id_col)
        .withColumnRenamed("name", name_col)
    )


def apply_er_delta(
    index: DataFrame,
    delta: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """Full updated canonical table = delta rows + index rows the delta
    does not supersede (anti-join on id — a unique key, no fan-out).
    At scale this is the MERGE you'd run against the stored index."""
    untouched = index.select(
        id_col, name_col, "canonical_id"
    ).join(delta.select(id_col), id_col, "left_anti").withColumn(
        "is_canonical",
        (F.col(id_col) == F.col("canonical_id")).cast("int"),
    )
    return delta.select(
        id_col, name_col, "canonical_id", "is_canonical"
    ).unionByName(untouched)


def similarity_expr(a, b) -> Column:
    """Normalized edit similarity 1 - lev(a,b)/max(len) in [0,1];
    NULL if either side is NULL (the caller decides what absence
    means — score_pairs_multi drops the attribute's weight)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(
        a.isNotNull() & b.isNotNull(),
        F.when(denom == 0, F.lit(1.0)).otherwise(
            1.0 - F.levenshtein(a, b) / denom.cast("double")
        ),
    )


class BlockCapError(RuntimeError):
    """Raised by fuzzy_pairs_multi(on_oversized="error") when blocking
    produces blocks over max_block_size — the cap would otherwise drop
    those records from candidate generation entirely."""


def fuzzy_pairs_multi(
    df: DataFrame,
    id_col: str,
    attrs: dict,
    primary: str | None = None,
    band: int = 8,
    max_block_size: int = 1000,
    min_score: float = 0.75,
    blocking: str = "both",
    block_cols: list[str] | None = None,
    primary_max_dist: int | None = None,
    on_oversized: str = "warn",
) -> DataFrame:
    """Weighted multi-attribute record matching (Fellegi-Sunter-lite):
    candidates come from blocking on the ``primary`` attribute (multi-
    pass prefix ∪ soundex by default), or — when ``block_cols`` is
    given — from EXACT blocking on those reliable attributes (the
    right posture when the noisy fields don't block well); each attribute contributes its
    normalized edit similarity weighted by ``attrs[name]``; a NULL on
    either side drops that attribute AND its weight from the pair's
    denominator (pairwise-available weighting — absence is not
    evidence either way). Output: (id_a, id_b, score, sim_<attr>...)
    with score >= min_score, id_a < id_b.

    The single-attribute rungs order record pairs by one noisy field;
    real entity resolution triangulates — a name typo is rescued by an
    exact city+segment, a coincidental name match is killed by them.
    Plan shape inherits fuzzy_pairs' blocked self-join (never all
    pairs); scoring is a codegen'd expression over the joined row.

    NO SILENT CAPS: blocks over ``max_block_size`` are excluded from
    candidate generation (quadratic blow-up containment), and
    ``on_oversized`` decides how loudly — "error" raises BlockCapError
    naming the count and worst size (guarded_join's posture, right when
    the block key is supposed to bound sizes), "warn" (default) emits a
    warnings.warn with the same numbers, "silent" skips the pre-flight
    scan entirely (callers that already measured their key). The
    pre-flight is one column-pruned aggregate over the block keys.
    """
    names = list(attrs)
    primary = primary or names[0]
    if block_cols:
        # exact blocking on RELIABLE attributes, fuzzy scoring of the
        # noisy ones — the standard ER posture when no single noisy
        # field blocks well (here: every candidate pair must agree
        # exactly on block_cols; block sizes are bounded by their
        # joint cardinality)
        keys = F.array(F.concat_ws("\u0001", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in block_cols]))
    elif blocking == "prefix":
        keys = F.array(block_key_expr(primary, band))
    elif blocking == "soundex":
        keys = F.array(phonetic_block_key_expr(primary))
    else:
        keys = F.array(
            block_key_expr(primary, band),
            phonetic_block_key_expr(primary),
        )
    keyed = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in names],
        F.explode(keys).alias("blk"),
    )
    sizes = keyed.groupBy("blk").agg(F.count(F.lit(1)).alias("_n"))
    capped = None
    if on_oversized != "silent":
        # the pre-flight is already an eager pass over sizes; collect
        # the OVERSIZED keys in the same pass (bounded — oversized
        # blocks are the anomaly) so the main plan filters on a literal
        # set instead of re-running the explode+groupBy a second time
        _cap = 10_000
        over_rows = (
            sizes.filter(F.col("_n") > max_block_size)
            .limit(_cap + 1)
            .collect()
        )
        if over_rows:
            worst = max(r["_n"] for r in over_rows)
            n_rows = sum(r["_n"] for r in over_rows)
            msg = (
                f"fuzzy_pairs_multi: {len(over_rows)} block(s) exceed "
                f"max_block_size={max_block_size} (worst {worst} "
                f"rows; {n_rows} keyed rows excluded from "
                "candidate generation). The block key's cardinality is "
                "not keeping up with the corpus — add a growing "
                "component (e.g. a name digit/char n-gram) or raise the "
                "cap."
            )
            if on_oversized == "error":
                raise BlockCapError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        if len(over_rows) <= _cap:
            bad = [r["blk"] for r in over_rows]
            capped = (
                keyed.filter(~F.col("blk").isin(bad)) if bad else keyed
            )
    if capped is None:
        small = sizes.filter(F.col("_n") <= max_block_size).select("blk")
        capped = keyed.join(small, "blk")
    a = capped.select(
        "blk", F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in names],
    )
    b = capped.select(
        "blk", F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in names],
    )
    joined = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    if primary_max_dist is not None:
        # bounded-levenshtein pre-filter on the primary attribute: the
        # threshold form early-exits the DP (returns -1 past the bound),
        # discarding the bulk of candidates for cents before any full
        # similarity is computed. Derive the bound from min_score: a
        # pair whose primary sim alone cannot reach min_score even with
        # every other attribute perfect can never pass. NULL-permissive:
        # a NULL primary makes levenshtein NULL, which must fall through
        # to the weighted scorer (absence drops the attribute AND its
        # weight — it is not a mismatch), not be filtered out.
        joined = joined.filter(
            F.col(f"{primary}_a").isNull()
            | F.col(f"{primary}_b").isNull()
            | (
                F.levenshtein(
                    f"{primary}_a", f"{primary}_b", primary_max_dist
                )
                >= 0
            )
        )
    sims = {c: similarity_expr(f"{c}_a", f"{c}_b") for c in names}
    num = F.lit(0.0)
    den = F.lit(0.0)
    for c, w in attrs.items():
        num = num + F.coalesce(sims[c] * F.lit(float(w)), F.lit(0.0))
        den = den + F.when(
            sims[c].isNotNull(), F.lit(float(w))
        ).otherwise(F.lit(0.0))
    # den == 0 (every attribute NULL on one side) -> score NULL -> the
    # >= filter drops the pair: all-absent rows assert nothing
    score = F.round(num / F.when(den > 0, den), 6)
    out = joined.select(
        "id_a",
        "id_b",
        score.alias("score"),
        *[F.round(sims[c], 6).alias(f"sim_{c}") for c in names],
    ).filter(F.col("score") >= min_score)
    return out.distinct()


class TrigramScaleError(RuntimeError):
    """Raised by trigram_block_pairs(on_oversized="error") when the
    rare-trigram index's candidate fanout exceeds the linear budget —
    the corpus has outgrown trigram blocking (measured growth exponent
    ~1.04 under the recall-preserving max_df posture, SCALING.md); the
    minhash-LSH rung (dedup.minhash_lsh_pairs, exponent 0.23) is the
    corpus-scale path."""


def trigram_block_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 200,
    min_sim: float = 0.5,
    max_candidates_per_row: float = 64.0,
    on_oversized: str = "error",
) -> DataFrame:
    """Trigram-indexed similarity join (the pg_trgm recipe as a plan):
    candidate pairs share at least one RARE character trigram, scored by
    normalized edit similarity. Output: (id_a, id_b, sim) with
    sim >= min_sim, id_a < id_b.

    Why rare-only blocking survives scale: a ubiquitous trigram (every
    'customer#' row shares 'cus') would turn the index self-join into a
    quadratic hot bucket; dropping trigrams with document frequency >
    ``max_df`` bounds every bucket's fanout at max_df^2 while keeping
    recall for genuinely similar strings, which share many trigrams and
    almost surely a rare one (two strings at edit distance d share all
    but <= 3d trigrams). Plan: posexplode to (id, trigram) rows, one
    bounded groupBy for frequencies, frequency-filtered self-join on the
    trigram, pair-distinct, thresholded-levenshtein verify — every stage
    shuffles bounded keys; no all-pairs anywhere.

    NO SILENT QUADRATICS: keeping recall as the corpus grows means
    max_df must grow with it, and then bucket fanout grows ~n^2 at the
    cap — a real tradeoff, not a tuning knob (measured exponent 1.04,
    SCALING.md). A pre-flight over the (bounded, checkpointed) trigram
    frequency table computes the exact candidate fanout
    sum(df_t*(df_t-1)/2) BEFORE any pair is materialized; if it exceeds
    ``max_candidates_per_row * n_rows`` (the linear contract every
    other rung honors), ``on_oversized`` decides how loudly — "error"
    (default: a user at 100 TB gets a TrigramScaleError naming the
    minhash-LSH rung, not a quadratic job), "warn" emits warnings.warn
    with the same numbers, "silent" skips the pre-flight (callers that
    already measured their alphabet). Guard pinned in tests/test_er.py.
    """
    cand = trigram_candidate_pairs(
        df,
        id_col,
        text_col,
        max_df=max_df,
        max_candidates_per_row=max_candidates_per_row,
        on_oversized=on_oversized,
    )
    t = F.lower(F.col(text_col))
    strs = df.select(F.col(id_col).alias("id"), t.alias("s"))
    scored = (
        cand.join(strs.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(strs.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
        .withColumn("sim", F.round(similarity_expr("s_a", "s_b"), 6))
        .filter(F.col("sim") >= min_sim)
    )
    return scored.select("id_a", "id_b", "sim")


def trigram_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 200,
    max_candidates_per_row: float = 64.0,
    on_oversized: str = "error",
) -> DataFrame:
    """The candidate half of trigram_block_pairs — (id_a, id_b) pairs
    sharing at least one rare trigram, with the same pre-flight fanout
    guard — split out (r10) so fuzzy_edges' oversized-block reroute
    can verify candidates with its own levenshtein threshold instead
    of the normalized-similarity score."""
    from etl_hero_spark.checkpoint import parquet_checkpoint

    t = F.lower(F.col(text_col))
    grams = df.select(
        F.col(id_col).alias("id"),
        t.alias("_t"),
    ).select(
        "id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(_t) - 2, 1)), "
                    "i -> substring(_t, i, 3))"
                )
            )
        ).alias("tri"),
    )
    freq = grams.groupBy("tri").agg(F.count(F.lit(1)).alias("_df"))
    if on_oversized != "silent":
        # distinct-trigram table is bounded (alphabet^3-ish);
        # checkpoint it so the pre-flight agg and the rare filter read
        # it back instead of re-running the corpus explode+groupBy
        freq = parquet_checkpoint(freq, "trigram-freq")
        kept = freq.filter(F.col("_df") <= max_df)
        pre = kept.agg(
            F.coalesce(
                F.sum(
                    F.col("_df").cast("decimal(38,0)")
                    * (F.col("_df") - 1)
                    / 2
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_cand")
        ).first()
        n_cand = int(pre["_cand"])
        n_rows = df.select(F.col(id_col)).count()
        budget = max_candidates_per_row * max(n_rows, 1)
        if n_cand > budget:
            msg = (
                f"trigram_block_pairs: rare-trigram index would emit "
                f"{n_cand} candidate pairs for {n_rows} rows "
                f"({n_cand / max(n_rows, 1):.1f} per row; budget "
                f"{max_candidates_per_row}/row) — the corpus has "
                "outgrown trigram blocking. Use the minhash-LSH rung "
                "(dedup.minhash_lsh_pairs, measured exponent 0.23) for "
                "corpora this size, lower max_df (costs recall), or "
                "raise max_candidates_per_row if the fanout is truly "
                "affordable."
            )
            if on_oversized == "error":
                raise TrigramScaleError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    rare = freq.filter(F.col("_df") <= max_df).select("tri")
    keyed = grams.join(rare, "tri")
    a = keyed.select("tri", F.col("id").alias("id_a"))
    b = keyed.select("tri", F.col("id").alias("id_b"))
    return (
        a.join(b, "tri")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def blocking_quality(
    df: DataFrame,
    id_col: str,
    truth_pairs: DataFrame,
    block_exprs: dict[str, Column],
    scale: int = 6,
) -> DataFrame:
    """Blocking-scheme evaluation — the measured-recall report for ER
    (the sibling of the ANN recall report: a blocking key's recall is
    measured against ground truth, never assumed). For each candidate
    scheme in ``block_exprs`` (name -> key Column):

    * **pair completeness** (recall): the fraction of ground-truth
      match pairs (``truth_pairs``: id_a < id_b) that share a block —
      the matches the scheme can even SEE;
    * **reduction ratio**: 1 - candidate_pairs / all_pairs, where
      candidate_pairs = sum over blocks of k*(k-1)/2 — how much of the
      quadratic comparison space the scheme eliminates.

    The tension between the two IS blocking design; this report puts
    numbers on both sides. Costs per scheme: one groupBy on the block
    key for sizes (candidate count from the size table — pairs are
    COUNTED, never materialized), one join of the truth pairs against
    the id->key map for completeness. NULL keys never block (a NULL
    key would cross-join every keyless row).

    Output: (scheme, n_blocks, max_block, n_candidates,
    pair_completeness, reduction_ratio), scheme-ordered.
    """
    from etl_hero_spark.checkpoint import parquet_checkpoint

    n_rows = df.count()
    all_pairs = n_rows * (n_rows - 1) // 2
    truth = parquet_checkpoint(
        truth_pairs.select(
            F.col("id_a").alias("_ta"), F.col("id_b").alias("_tb")
        ).distinct(),
        "blockeval-truth",
    )
    n_truth = truth.count()
    outs = []
    for scheme, key in block_exprs.items():
        keyed = parquet_checkpoint(
            df.select(F.col(id_col).alias("_id"), key.alias("_k")).filter(
                F.col("_k").isNotNull()
            ),
            f"blockeval-{scheme}",
        )
        sizes = keyed.groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("_n").alias("max_block"),
            F.sum(
                (F.col("_n").cast("decimal(38,0)") * (F.col("_n") - 1))
                / 2
            )
            .cast("bigint")
            .alias("n_candidates"),
        )
        hits = (
            truth.join(
                keyed.select(F.col("_id").alias("_ta"), F.col("_k")),
                "_ta",
            )
            .join(
                keyed.select(
                    F.col("_id").alias("_tb"),
                    F.col("_k").alias("_k2"),
                ),
                "_tb",
            )
            .filter(F.col("_k") == F.col("_k2"))
            .select("_ta", "_tb")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        outs.append(
            stats.crossJoin(F.broadcast(hits)).select(
                F.lit(scheme).alias("scheme"),
                "n_blocks",
                "max_block",
                "n_candidates",
                F.round(
                    F.when(
                        F.lit(n_truth) > 0,
                        F.col("n_hits").cast("double") / F.lit(float(n_truth)),
                    ),
                    scale,
                ).alias("pair_completeness"),
                F.round(
                    F.lit(1.0)
                    - F.col("n_candidates").cast("double")
                    / F.lit(float(max(all_pairs, 1))),
                    scale,
                ).alias("reduction_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("scheme")


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (EM-fitted m/u weights)
# ---------------------------------------------------------------------------


def fs_pattern_table(
    pairs: DataFrame, agree_cols: list[str]
) -> DataFrame:
    """Agreement-pattern contingency table for the Fellegi-Sunter
    model: one row per distinct binary agreement vector with its pair
    count — the corpus of candidate pairs folds to <= 2^f rows (the
    bounded sufficient statistic EM needs; nothing else ever leaves
    the executors). Each agree column must be 0/1 (NULL counts as
    disagreement — absence is not agreement evidence)."""
    gammas = [
        F.coalesce(F.col(c).cast("int"), F.lit(0)).alias(c)
        for c in agree_cols
    ]
    return (
        pairs.select(*gammas)
        .groupBy(*agree_cols)
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def fs_fit(
    pairs: DataFrame,
    agree_cols: list[str],
    max_iter: int = 50,
    tol: float = 1e-10,
    p_init: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
) -> dict:
    """EM fit of the Fellegi-Sunter record-linkage model (Fellegi &
    Sunter 1969; the Splink/RecordLinkage-toolkit formulation) over
    binary field-agreement vectors: latent match indicator, per-field
    conditional agreement probabilities m_j = P(agree_j | match) and
    u_j = P(agree_j | non-match), prior lambda = P(match).

    The honest distributed shape for an iterative fit (the
    BPE/k-means/PAV posture): the candidate pairs contribute ONE
    groupBy to the <= 2^f pattern table (f = len(agree_cols),
    validated <= 16); EM then iterates DRIVER-side over that bounded
    table — no per-iteration corpus pass, no RDD loop. Conditional
    independence across fields is the model's standard assumption.

    Returns {"p": lambda, "m": {field: m_j}, "u": {field: u_j},
    "n_iter": iterations, "n_pairs": N} — plain Python state, applied
    back to the corpus by fs_score as literal expressions. Probability
    estimates clamp to [1e-6, 1-1e-6] so degenerate fields (always /
    never agreeing) cannot produce infinite weights. Python-reference
    EM parity pinned in tests/test_er.py."""
    f = len(agree_cols)
    if not 0 < f <= 16:
        raise ValueError("agree_cols must have 1..16 fields")
    rows = fs_pattern_table(pairs, agree_cols).collect()
    if not rows:
        raise ValueError("no candidate pairs to fit on")
    patterns = [
        (tuple(int(r[c]) for c in agree_cols), int(r["n_pairs"]))
        for r in rows
    ]
    n_total = sum(n for _, n in patterns)
    lo, hi = 1e-6, 1.0 - 1e-6
    clamp = lambda x: min(max(x, lo), hi)  # noqa: E731
    p = clamp(p_init)
    m = [clamp(m_init)] * f
    u = [clamp(u_init)] * f
    it = 0
    for it in range(1, max_iter + 1):
        # E-step: P(match | pattern) per bounded pattern row
        g = {}
        for gamma, _ in patterns:
            pm, pu = p, 1.0 - p
            for j in range(f):
                pm *= m[j] if gamma[j] else 1.0 - m[j]
                pu *= u[j] if gamma[j] else 1.0 - u[j]
            g[gamma] = pm / (pm + pu) if pm + pu > 0 else 0.0
        # M-step
        tot_g = sum(n * g[gamma] for gamma, n in patterns)
        tot_ng = n_total - tot_g
        new_p = clamp(tot_g / n_total)
        new_m = [
            clamp(
                sum(n * g[gamma] * gamma[j] for gamma, n in patterns)
                / tot_g
            )
            if tot_g > 0
            else m[j]
            for j in range(f)
        ]
        new_u = [
            clamp(
                sum(
                    n * (1.0 - g[gamma]) * gamma[j]
                    for gamma, n in patterns
                )
                / tot_ng
            )
            if tot_ng > 0
            else u[j]
            for j in range(f)
        ]
        delta = abs(new_p - p) + sum(
            abs(a - b) for a, b in zip(new_m + new_u, m + u)
        )
        p, m, u = new_p, new_m, new_u
        if delta < tol:
            break
    return {
        "p": p,
        "m": dict(zip(agree_cols, m)),
        "u": dict(zip(agree_cols, u)),
        "n_iter": it,
        "n_pairs": n_total,
    }


def fs_score(
    pairs: DataFrame, agree_cols: list[str], model: dict
) -> DataFrame:
    """Apply a fitted Fellegi-Sunter model: adds ``match_weight`` (the
    classic log2 likelihood ratio — sum of per-field agreement /
    disagreement weights) and ``match_posterior`` (P(match | pattern)
    under the fitted prior). The model is bounded driver state, so the
    apply is a pure literal expression over the pair columns — no
    join, no shuffle, codegen'd."""
    import math

    w = None
    log_odds = math.log2(model["p"] / (1.0 - model["p"]))
    for c in agree_cols:
        m_j, u_j = model["m"][c], model["u"][c]
        gamma = F.coalesce(F.col(c).cast("int"), F.lit(0))
        term = F.when(
            gamma == 1, F.lit(math.log2(m_j / u_j))
        ).otherwise(F.lit(math.log2((1.0 - m_j) / (1.0 - u_j))))
        w = term if w is None else w + term
    posterior = F.lit(1.0) / (
        F.lit(1.0)
        + F.pow(F.lit(2.0), -(w + F.lit(log_odds)))
    )
    return pairs.withColumn(
        "match_weight", F.round(w, 6)
    ).withColumn("match_posterior", F.round(posterior, 6))
