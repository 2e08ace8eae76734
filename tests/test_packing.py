"""Token-budget shard packing: assignment must equal the naive global
prefix-sum definition while the plan stays distributed."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _naive(df, budget):
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(float(budget))
        ).cast("bigint"),
    )


def test_packing_matches_naive_prefix_sum(spark, sf_dir):
    from etl_hero_spark.packing import pack_token_shards
    from etl_hero_spark.textops import token_count_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_token_shards(docs, budget=700, n_buckets=7)
        .select("doc_id", "shard_id")
        .collect()
    }
    base = docs.withColumn("n_tokens", token_count_expr("text"))
    want = {
        r["doc_id"]: r["shard_id"]
        for r in _naive(base, 700).select("doc_id", "shard_id").collect()
    }
    assert got == want


def test_packing_shards_are_contiguous_and_bounded(spark, sf_dir):
    """Shard ids are non-decreasing in doc order, and no shard exceeds
    budget + its last straddling doc."""
    from etl_hero_spark.packing import pack_token_shards, shard_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_token_shards(docs, budget=1500)
    rows = packed.select("doc_id", "n_tokens", "shard_id").collect()
    rows.sort(key=lambda r: r["doc_id"])
    sids = [r["shard_id"] for r in rows]
    assert sids == sorted(sids)
    man = shard_manifest(packed).collect()
    max_doc = max(r["n_tokens"] for r in rows)
    for m in man:
        assert m["n_tokens"] < 1500 + max_doc
    # every doc in exactly one shard
    assert sum(m["n_docs"] for m in man) == len(rows)


def test_packing_no_global_window(spark, sf_dir):
    """Every Window node in the physical plan must carry a partition
    spec (the _bucket key) — a partition-less window would funnel the
    whole corpus through one task, the exact bug the two-phase scan
    exists to avoid."""
    from etl_hero_spark.packing import pack_token_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jplan = (
        pack_token_shards(docs, budget=2000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    window_lines = [
        ln for ln in jplan.splitlines() if "Window [" in ln
    ]
    assert window_lines, "expected a Window node in the plan"
    for ln in window_lines:
        # physical form: Window [funcs], [partition exprs], [order]
        assert "windowspecdefinition(_bucket" in ln, ln


def test_global_rank_matches_duckdb(spark, sf_dir):
    """The two-phase distributed rank must equal a global
    row_number() OVER (ORDER BY metric DESC, id ASC) — DuckDB computes
    the naive form as the oracle."""
    import duckdb
    import pyspark.sql.functions as F

    from etl_hero_spark.packing import global_rank

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", (F.col("n_chars") % 97).cast("double").alias("m"))
    )
    got = {
        (r["doc_id"], r["rank"])
        for r in global_rank(docs, "m", "doc_id").collect()
    }
    want = set(
        duckdb.sql(
            "SELECT doc_id, row_number() OVER "
            "(ORDER BY cast(n_chars % 97 as double) DESC, doc_id ASC) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_global_rank_ascending_and_single_value(spark):
    import pyspark.sql.functions as F

    from etl_hero_spark.packing import global_rank

    df = spark.range(1, 101).select(
        F.col("id").alias("doc_id"), F.lit(7.0).alias("m")
    )
    # all-equal metric: degenerate single bucket, ranks = id order
    rows = {
        r["doc_id"]: r["rank"]
        for r in global_rank(df, "m", "doc_id", ascending=True).collect()
    }
    assert rows == {i: i for i in range(1, 101)}


def test_global_rank_no_single_partition_window(spark, sf_dir):
    from etl_hero_spark.packing import global_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    plan = (
        global_rank(docs, "n_chars", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window operator must be partitioned (no global funnel)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_bucket" in line


def test_global_rank_drops_null_metrics_in_both_branches(spark):
    import pyspark.sql.functions as F

    from etl_hero_spark.packing import global_rank

    # degenerate branch: all non-null metrics equal
    deg = spark.createDataFrame(
        [(1, 7.0), (2, 7.0), (3, None)], "doc_id bigint, m double"
    )
    rows = {r["doc_id"]: r["rank"] for r in global_rank(deg, "m", "doc_id").collect()}
    assert rows == {1: 1, 2: 2}  # null row dropped, ranks unshifted
    # normal branch: distinct metrics
    norm = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None)], "doc_id bigint, m double"
    )
    rows = {r["doc_id"]: r["rank"] for r in global_rank(norm, "m", "doc_id").collect()}
    assert rows == {2: 1, 1: 2}


def test_mix_sources_budget_matches_duckdb(spark, sf_dir):
    """Cross-engine oracle for the rows-only registered query: identical
    per-source md5-order exclusive-prefix selection in DuckDB."""
    import duckdb

    from etl_hero_spark.registry_ext import q_sample_mix_sources

    got = {
        (r["doc_id"], r["source"], r["n_tokens"])
        for r in q_sample_mix_sources(spark, sf_dir).collect()
    }
    want = set(
        duckdb.sql(
            "WITH b AS (SELECT * FROM (VALUES ('src0', 1000), ('src1', 600), "
            "('src2', 400)) AS v(source, budget)), "
            "t AS (SELECT doc_id, source, "
            "cast(len(CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(text), '\\s+') END) as int) AS n_tokens "
            f"FROM '{sf_dir}/documents.parquet'), "
            "p AS (SELECT t.*, b.budget, "
            "sum(n_tokens) OVER (PARTITION BY t.source "
            "ORDER BY md5(cast(doc_id as varchar)), doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS excl "
            "FROM t JOIN b USING (source)) "
            "SELECT doc_id, source, n_tokens FROM p WHERE excl < budget"
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # every weighted source contributes, nothing else does
    assert {s for _, s, _ in got} == {"src0", "src1", "src2"}


def test_mix_sources_budget_respects_budgets(spark, sf_dir):
    """Selected token mass per source stays within budget + one
    straddling doc; order of selection is the md5 shuffle, not doc_id."""
    from etl_hero_spark.registry_ext import q_sample_mix_sources

    rows = q_sample_mix_sources(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    budgets = {"src0": 1000, "src1": 600, "src2": 400}
    for s, docs in by_src.items():
        total = sum(r["n_tokens"] for r in docs)
        biggest = max(r["n_tokens"] for r in docs)
        assert total < budgets[s] + biggest
        # removing the last-selected doc must drop under budget
        assert total >= budgets[s] or len(docs) == 25  # whole source fits


def test_mix_sources_budget_no_single_partition_window(spark, sf_dir):
    """Every Window node must partition on (source, _bucket) — a
    per-source-only window would funnel a hot source through one task."""
    from etl_hero_spark.registry_ext import q_sample_mix_sources

    plan = (
        q_sample_mix_sources(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines, "expected a Window node in the plan"
    for ln in window_lines:
        assert "windowspecdefinition(source" in ln and "_bucket" in ln, ln


def test_mix_sources_budget_prefix_monotone(spark, sf_dir):
    """Raising the total budget must only ADD documents (the md5 order
    makes per-source selections nested prefixes), and re-running with
    the same budget selects the identical set."""
    from etl_hero_spark.sampling import mix_sources_budget
    from etl_hero_spark.textops import token_count_expr

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("n_tokens", token_count_expr("text"))
    )
    w = {"src0": 0.5, "src1": 0.5}

    def sel(total):
        return {
            r["doc_id"]
            for r in mix_sources_budget(docs, w, total).select("doc_id").collect()
        }

    small, small2, big = sel(500), sel(500), sel(2000)
    assert small == small2  # deterministic
    assert small <= big  # nested prefixes
    assert len(big) > len(small)


def test_mix_sources_budget_min_one_doc_and_null_tokens(spark):
    """The at-least-one-doc guarantee must survive weights so small that
    round(w * total) == 0 (budget clamps to 1 token), and rows with NULL
    n_tokens must stay selectable (counted as 0 tokens) instead of being
    silently dropped by NULL running-sum arithmetic."""
    from etl_hero_spark.sampling import mix_sources_budget

    rows = [(f"d{i}", "big", 100) for i in range(20)]
    rows += [("tiny0", "tiny", 50), ("tiny1", "tiny", None)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tokens int")

    # weight 0.001 of 1000 tokens rounds to budget 1 -> still one doc
    out = mix_sources_budget(
        df, {"big": 0.999, "tiny": 0.001}, total_tokens=1000
    ).collect()
    assert sum(1 for r in out if r["source"] == "tiny") >= 1

    # all-NULL-token source: every row has _excl == 0 < budget -> all kept
    nulls = spark.createDataFrame(
        [(f"n{i}", "s", None) for i in range(5)],
        "doc_id string, source string, n_tokens int",
    )
    kept = mix_sources_budget(nulls, {"s": 1.0}, total_tokens=10).count()
    assert kept == 5

    # zero weight contributes nothing
    z = mix_sources_budget(df, {"big": 1.0, "tiny": 0.0}, total_tokens=500)
    assert z.filter(F.col("source") == "tiny").count() == 0


def test_with_split_deterministic_and_stable_under_growth(spark, sf_dir):
    """Assignments are a pure function of (salt, id): identical across
    runs and partitionings, and ADDING rows never moves an existing row
    between splits (the eval-leakage guarantee)."""
    from etl_hero_spark.sampling import with_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    full = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id").collect()
    }
    again = {
        r["doc_id"]: r["split"]
        for r in with_split(docs.repartition(7), "doc_id").collect()
    }
    assert full == again
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {
        r["doc_id"]: r["split"] for r in with_split(half, "doc_id").collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # proportions roughly honored (hash uniformity, 500 docs)
    from collections import Counter

    c = Counter(full.values())
    assert c["train"] > 0.8 * len(full)
    assert 0 < c["val"] < 0.15 * len(full)
    assert 0 < c["test"] < 0.15 * len(full)
    # a different salt draws a different assignment
    other = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id", salt="other").collect()
    }
    assert other != full


def test_with_split_rejects_bad_fractions(spark):
    import pytest

    from etl_hero_spark.sampling import with_split

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        with_split(df, "doc_id", {"a": 0.5, "b": 0.1})


def test_temperature_weights_interpolate_natural_to_uniform(spark):
    from etl_hero_spark.sampling import temperature_weights

    rows = (
        [("big", i, 10) for i in range(100)]
        + [("mid", 1000 + i, 10) for i in range(10)]
        + [("tiny", 2000, 10)]
    )
    docs = spark.createDataFrame(
        rows, "source string, doc_id bigint, n_tokens int"
    )
    natural = temperature_weights(docs, alpha=1.0)
    flat = temperature_weights(docs, alpha=0.0)
    mid = temperature_weights(docs, alpha=0.5)
    for w in (natural, flat, mid):
        assert abs(sum(w.values()) - 1.0) < 1e-12
    # alpha=1 reproduces natural token proportions
    assert abs(natural["big"] - 1000 / 1110) < 1e-12
    # alpha=0 is uniform over sources with data
    assert all(abs(v - 1 / 3) < 1e-12 for v in flat.values())
    # temperature strictly interpolates: small sources move up
    assert natural["tiny"] < mid["tiny"] < flat["tiny"]
    assert natural["big"] > mid["big"] > flat["big"]


def test_mix_sources_temperature_upsamples_small_sources(spark):
    from etl_hero_spark.sampling import mix_sources_temperature

    rows = [("big", i, 10) for i in range(1000)] + [
        ("small", 10_000 + i, 10) for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "source string, doc_id bigint, n_tokens int"
    )
    picked = mix_sources_temperature(docs, alpha=0.3, total_tokens=2000)
    by_src = {
        r["source"]: r["n"]
        for r in picked.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # natural share of 'small' is ~2%; at alpha=0.3 its share of the
    # 200-doc budget must exceed that several-fold, capped by its size
    assert by_src["small"] == 20  # exhausted (upsampled to its cap)
    assert by_src["big"] >= 150
    # deterministic: re-run selects identical docs
    again = mix_sources_temperature(docs, alpha=0.3, total_tokens=2000)
    assert {r["doc_id"] for r in picked.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }


# ---------------------------------------------------------------------------
# deterministic per-key reservoir sample (round 4)
# ---------------------------------------------------------------------------


def test_reservoir_per_key_matches_duckdb_md5_order(spark, sf_dir):
    """The reservoir is DEFINED as 'n lowest md5(salt||id) per key' —
    DuckDB computes the identical md5 over the identical strings, so the
    exact row set must match cross-engine (no RNG state anywhere)."""
    import duckdb

    from etl_hero_spark.sampling import reservoir_per_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["source"], r["doc_id"])
        for r in reservoir_per_key(
            docs, "source", n=7, id_col="doc_id"
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            SELECT source, doc_id FROM (
              SELECT source, doc_id,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY md5('rsv1' || CAST(doc_id AS VARCHAR))
                ) AS rk
              FROM read_parquet('{sf_dir}/documents.parquet')
            ) WHERE rk <= 7
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_reservoir_per_key_is_mergeable(spark, sf_dir):
    """Shard-mergeability: re-ranking the union of two disjoint shards'
    reservoirs reproduces the whole-corpus reservoir exactly — hash
    order is a total order, so the global top-n is in the shard top-ns."""
    from etl_hero_spark.sampling import reservoir_per_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    whole = reservoir_per_key(docs, "source", n=5, id_col="doc_id")
    sh = [
        reservoir_per_key(
            docs.filter(F.col("doc_id") % 2 == i), "source", n=5,
            id_col="doc_id",
        )
        for i in (0, 1)
    ]
    re_ranked = reservoir_per_key(
        sh[0].unionByName(sh[1]), "source", n=5, id_col="doc_id"
    )
    key = lambda df: sorted(
        (r["source"], r["doc_id"])
        for r in df.select("source", "doc_id").collect()
    )
    assert key(whole) == key(re_ranked)


def test_reservoir_per_key_growth_consistent(spark, sf_dir):
    """Adding rows can only displace per-key members one-for-one: the
    reservoir over a superset differs from the subset's by at most the
    number of newcomers admitted (no wholesale reshuffle)."""
    from etl_hero_spark.sampling import reservoir_per_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sub = docs.filter(F.col("doc_id") % 10 != 0)
    r_sub = {
        (r["source"], r["doc_id"])
        for r in reservoir_per_key(sub, "source", n=5, id_col="doc_id")
        .select("source", "doc_id").collect()
    }
    r_all = {
        (r["source"], r["doc_id"])
        for r in reservoir_per_key(docs, "source", n=5, id_col="doc_id")
        .select("source", "doc_id").collect()
    }
    newcomers = {k for k in r_all if k[1] % 10 == 0}
    # every survivor of the superset run that isn't a newcomer was
    # already in the subset's reservoir
    assert (r_all - newcomers) <= r_sub


# ---------------------------------------------------------------------------
# fixed-length sequence packing (round 4)
# ---------------------------------------------------------------------------


def test_pack_sequences_matches_duckdb_cumsum(spark, sf_dir):
    """tok_start is the exclusive prefix sum of token counts in doc_id
    order; ctx spans are pure floor arithmetic on it — all expressible
    as one DuckDB window cumsum over the same whitespace tokenization."""
    import duckdb

    from etl_hero_spark.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    L = 512
    got = sorted(
        (r["doc_id"], r["tok_start"], r["ctx_first"], r["ctx_last"], r["n_ctx"])
        for r in pack_sequences(docs, context_len=L).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH t AS (
              SELECT doc_id,
                CAST(len(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS BIGINT) AS n
              FROM read_parquet('{sf_dir}/documents.parquet')
            ), p AS (
              SELECT doc_id, n,
                CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
              FROM t
            )
            SELECT doc_id, s,
              CAST(floor(s / {L}.0) AS BIGINT),
              CAST(floor(greatest(s + n - 1, s) / {L}.0) AS BIGINT),
              CAST(floor(greatest(s + n - 1, s) / {L}.0)
                   - floor(s / {L}.0) + 1 AS BIGINT)
            FROM p
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_sequence_manifest_invariants(spark, sf_dir):
    """Every context carries exactly context_len tokens except the final
    partial; context token totals reconstruct the corpus total; a
    straddler is counted in every context after its first."""
    from etl_hero_spark.packing import pack_sequences, sequence_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    L = 512
    packed = pack_sequences(docs, context_len=L)
    man = sequence_manifest(packed, context_len=L).orderBy("ctx_id").collect()
    total = packed.agg(F.sum("n_tokens")).first()[0]
    assert [r["ctx_id"] for r in man] == list(range(len(man)))
    assert all(r["n_tokens"] == L for r in man[:-1])
    assert 0 < man[-1]["n_tokens"] <= L
    assert sum(r["n_tokens"] for r in man) == total
    n_straddle_rows = packed.filter(F.col("n_ctx") > 1).count()
    assert sum(r["n_straddlers"] for r in man) == packed.agg(
        F.sum(F.col("n_ctx") - 1)
    ).first()[0]
    assert n_straddle_rows > 0  # fixture long docs actually straddle


def test_pack_sequences_zero_token_docs_degenerate_span(spark):
    from etl_hero_spark.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "d e")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, context_len=4).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["ctx_first"] == rows[2]["ctx_last"]
    assert rows[2]["n_ctx"] == 1
    # doc 3: tokens 3..4 straddle the cut at 4
    assert rows[3]["ctx_first"] == 0 and rows[3]["ctx_last"] == 1


def test_with_split_group_key_is_leakage_safe(spark, sf_dir):
    """Passing a GROUP column as the hash key sends every row of the
    group to one split — the group-aware (URL/source-level) split that
    prevents near-duplicate train/test leakage."""
    from etl_hero_spark.sampling import with_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_split(docs, "source", {"train": 0.8, "val": 0.2})
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    assert out.select("split").distinct().count() == 2


def test_pack_sequences_rows_frame_no_peer_double_count(spark):
    """The running token sum must use a ROWS frame: with the default
    RANGE frame, equal order values would sum their peers and corrupt
    every downstream offset. Unique keys (the documented contract) must
    produce the exact hand-computed stream positions."""
    from etl_hero_spark.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h"), (3, "i j")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["tok_start"], r["ctx_first"], r["ctx_last"])
        for r in pack_sequences(df, context_len=4).collect()
    }
    assert got == {1: (0, 0, 0), 2: (4, 1, 1), 3: (8, 2, 2)}
