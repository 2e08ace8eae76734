"""Property-based invariants (hypothesis) on small generated frames.

Few examples per property (Spark jobs are ~100ms each), but the
generators explore nulls, duplicates, extreme values, and empty inputs
far more ruthlessly than hand-picked fixtures.
"""

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_doubles = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
)


@given(rows=st.lists(st.tuples(_doubles), min_size=0, max_size=30))
@_settings
def test_clip_never_widens_range_and_preserves_nulls(spark, rows):
    from etl_hero_spark.clean import clip_outliers

    df = spark.createDataFrame(rows, "x double")
    out = clip_outliers(df, "x", lower_q=0.25, upper_q=0.75, round_bounds=None)
    assert out.count() == df.count()
    n_null_in = df.filter(F.col("x").isNull()).count()
    assert out.filter(F.col("x").isNull()).count() == n_null_in
    vals = [r["x"] for r in df.collect() if r["x"] is not None]
    if vals:
        lo, hi = min(vals), max(vals)
        clipped = [r["x"] for r in out.collect() if r["x"] is not None]
        assert all(lo <= v <= hi or math.isclose(v, lo) or math.isclose(v, hi) for v in clipped)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", None])),
        min_size=0,
        max_size=40,
    )
)
@_settings
def test_dedup_matches_distinct_cardinality(spark, rows):
    from etl_hero_spark.clean import drop_duplicate_rows

    df = spark.createDataFrame(rows, "k long, v string")
    assert drop_duplicate_rows(df).count() == df.distinct().count()


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["2024-01-05", "05/01/2024", "garbage", None])),
        min_size=0,
        max_size=30,
    )
)
@_settings
def test_normalize_dates_idempotent(spark, rows):
    """Normalizing an already-normalized column is a fixed point, and
    every non-null output is yyyy-MM-dd."""
    from etl_hero_spark.clean import normalize_dates

    df = spark.createDataFrame(rows, "d string")
    once = normalize_dates(df, "d")
    twice = normalize_dates(once, "d")
    assert sorted(r["d"] for r in once.collect() if r["d"]) == sorted(
        r["d"] for r in twice.collect() if r["d"]
    )
    assert once.filter(
        F.col("d").isNotNull() & ~F.col("d").rlike(r"^\d{4}-\d{2}-\d{2}$")
    ).count() == 0


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z", None])), min_size=0, max_size=30
    )
)
@_settings
def test_quality_score_bounded_and_monotone(spark, rows):
    """Score is always in [0,100]; cleaning nulls can only raise it from
    the no-op score of 50."""
    from etl_hero_spark.score import quality_score

    df = spark.createDataFrame(rows, "c string")
    cleaned = df.na.fill("filled")
    s_noop = quality_score(df, df)
    s_clean = quality_score(df, cleaned)
    assert s_noop == 50.0
    assert 0.0 <= s_clean <= 100.0 and s_clean >= 50.0


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=0,
        max_size=25,
    ),
)
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """The union/last_value as-of construction must agree with pandas
    merge_asof (backward, inclusive, per-key) on arbitrary inputs.
    Right-side (key, ts) pairs are deduped — with equal timestamps the
    chosen right row is implementation-defined in both frameworks."""
    import pandas as pd

    from etl_hero_spark.temporal import asof_join

    left = [(i, k, t) for i, (k, t) in enumerate(left)]
    seen = set()
    r_rows = []
    for k, t in right:
        if (k, t) not in seen:
            seen.add((k, t))
            r_rows.append((k, t, float(len(r_rows))))
    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts_l long"
    ).withColumn("ts", F.timestamp_seconds("ts_l")).drop("ts_l")
    rdf = spark.createDataFrame(
        r_rows or [(None, None, None)], "user_id long, ts_r long, value double"
    )
    rdf = (
        rdf.filter(F.col("user_id").isNotNull())
        .withColumn("ts", F.timestamp_seconds("ts_r"))
        .drop("ts_r")
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(ldf, rdf, "user_id").collect()
    }

    lpd = pd.DataFrame(left, columns=["event_id", "user_id", "ts"]).sort_values(
        "ts", kind="stable"
    )
    rpd = pd.DataFrame(
        r_rows, columns=["user_id", "ts", "value"]
    ).sort_values("ts", kind="stable")
    if len(rpd):
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="user_id", direction="backward"
        )
        want = {
            int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in merged.itertuples()
        }
    else:
        want = {int(r.event_id): None for r in lpd.itertuples()}
    assert got == want


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=0,
        max_size=20,
    ),
    probes=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=8,
    ),
)
@_settings
def test_range_join_count_matches_brute_force(spark, events, probes):
    """Bucketized range join must agree with the O(n*m) definition:
    count of same-key events in (probe_ts - 300s, probe_ts]."""
    from etl_hero_spark.temporal import range_join_count

    ev = [(i, k, t) for i, (k, t) in enumerate(events)]
    pr = [(1000 + i, k, t) for i, (k, t) in enumerate(probes)]
    edf = spark.createDataFrame(
        ev or [(None, None, None)], "event_id long, user_id long, ts_s long"
    )
    edf = edf.filter(F.col("event_id").isNotNull()).withColumn(
        "ts", F.timestamp_seconds("ts_s")
    ).drop("ts_s")
    pdf = spark.createDataFrame(
        pr, "event_id long, user_id long, ts_s long"
    ).withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    got = {
        r["event_id"]: r["n_in_range"]
        for r in range_join_count(pdf, edf, "user_id", lookback_seconds=300).collect()
    }
    want = {
        pid: sum(
            1 for (_, ek, et) in ev if ek == pk and pt - 300 < et <= pt
        )
        for (pid, pk, pt) in pr
    }
    assert got == want


def test_weighted_hash_sample_properties(spark, sf_dir):
    """Deterministic, subset, monotone in weight, salt-independent."""
    import pyspark.sql.functions as F

    from etl_hero_spark.sampling import weighted_hash_sample

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .withColumn("w", (F.col("doc_id") % 10).cast("double") / 10.0)
    )
    ids = lambda d: {r["doc_id"] for r in d.collect()}  # noqa: E731
    s1 = ids(weighted_hash_sample(docs, "w", "doc_id"))
    s2 = ids(weighted_hash_sample(docs, "w", "doc_id"))
    assert s1 == s2  # no RNG state -> identical re-runs
    every = ids(docs)
    assert s1 < every  # strict subset: w<1 rows exist
    # weight 0 rows never sampled; weight ~1 rows nearly always
    zero_w = {r["doc_id"] for r in docs.filter("w = 0.0").collect()}
    assert not (s1 & zero_w)
    # doubling every weight can only ADD rows (same hash draw per id)
    bigger = ids(
        weighted_hash_sample(
            docs.withColumn("w", F.least(F.lit(1.0), F.col("w") * 2)),
            "w",
            "doc_id",
        )
    )
    assert s1 <= bigger
    # a different salt draws a genuinely different sample
    other = ids(weighted_hash_sample(docs, "w", "doc_id", salt="ws2"))
    assert other != s1
    # acceptance rate tracks mean weight (law of large numbers, loose)
    mean_w = docs.agg(F.avg("w")).first()[0]
    assert abs(len(s1) / docs.count() - mean_w) < 0.1


_scd2_changes = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),           # key
        st.sampled_from(["a", "b", "c"]),                # state
        st.integers(min_value=0, max_value=20),          # hour offset
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_scd2_changes)
@_settings
def test_scd2_history_partitions_each_keys_timeline(spark, rows):
    """For ANY change log: per key, versions are non-overlapping,
    chain exactly (effective_to == next effective_from), exactly one
    is_current=1 (the last), and adjacent versions always differ in
    state (no-op suppression is complete)."""
    from etl_hero_spark.cdc import scd2_history

    df = spark.createDataFrame(
        [(k, s, f"2024-01-01 {h:02d}:30:00") for k, s, h in rows],
        "id bigint, state string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(df, "id", "ts", ["state"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(r)
    for rs in by_key.values():
        rs.sort(key=lambda r: r["effective_from"])
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["is_current"] == 1 and rs[-1]["effective_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert a["state"] != b["state"]


_merge_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),            # key
        st.integers(min_value=0, max_value=9),            # value
        st.integers(min_value=0, max_value=30),           # day
        st.sampled_from(["U", "U", "U", "D"]),            # op (D rare)
    ),
    min_size=0,
    max_size=20,
)


@given(base=_merge_rows, batch=_merge_rows)
@_settings
def test_merge_upsert_matches_pandas_reference(spark, base, batch):
    """For ANY base snapshot and change batch: the merged state equals
    an independent pandas groupby-idxmax reference (latest wins, change
    beats base on ties, final-tombstone deletes)."""
    import pandas as pd

    from etl_hero_spark.cdc import merge_upsert

    def df_of(rows, src):
        return pd.DataFrame(
            [
                {
                    "id": k,
                    "v": v,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=d),
                    "op": op,
                    "_src": src,
                }
                for k, v, d, op in rows
            ]
        )

    pb = df_of(base, 0)
    # a base snapshot has one row per key: keep its newest
    if len(pb):
        pb = pb.sort_values(["ts", "_src"]).groupby("id").tail(1)
        pb["op"] = None
    pc = df_of(batch, 1)
    if len(pc):
        # two changes for the same (key, ts) tie arbitrarily in any
        # engine — the property is defined on unambiguous batches
        pc = pc.drop_duplicates(["id", "ts"], keep="first")
    allr = pd.concat([pb, pc], ignore_index=True)
    expect = {}
    if len(allr):
        allr = allr.sort_values(["ts", "_src"], kind="stable")
        for _, r in allr.iterrows():
            expect[r["id"]] = (r["v"], r["op"])
    expect = {
        k: v for k, (v, op) in expect.items() if op != "D"
    }

    target = spark.createDataFrame(
        [
            (int(r["id"]), int(r["v"]), r["ts"].to_pydatetime())
            for _, r in pb.iterrows()
        ],
        "id bigint, v bigint, ts timestamp",
    )
    changes = spark.createDataFrame(
        [
            (int(r["id"]), int(r["v"]), r["ts"].to_pydatetime(), r["op"])
            for _, r in pc.iterrows()
        ],
        "id bigint, v bigint, ts timestamp, op string",
    )
    got = {
        r["id"]: r["v"]
        for r in merge_upsert(target, changes, "id", "ts", op_col="op").collect()
    }
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20)), min_size=0, max_size=40
    )
)
@_settings
def test_countmin_never_undercounts(spark, rows):
    """Structural CMS invariant under arbitrary key distributions:
    estimate >= exact for every key, and the merge of any 2-way split
    equals the whole-corpus sketch."""
    from etl_hero_spark.profile import (
        countmin_sketch,
        estimate_counts,
        merge_countmin_sketches,
    )

    df = spark.createDataFrame(rows, "k long")
    sk = countmin_sketch(df, "k", width=8, depth=3)
    keys = df.distinct()
    if rows:
        exact = {r["k"]: 0 for r in keys.collect()}
        for (k,) in rows:
            exact[k] += 1
        est = {
            r["k"]: r["est_count"]
            for r in estimate_counts(sk, keys, "k", width=8, depth=3).collect()
        }
        assert all(est[k] >= n for k, n in exact.items())
    a = countmin_sketch(df.filter(F.col("k") % 2 == 0), "k", width=8, depth=3)
    b = countmin_sketch(df.filter(F.col("k") % 2 != 0), "k", width=8, depth=3)
    merged = merge_countmin_sketches(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 1000)),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    n=st.integers(1, 5),
)
@_settings
def test_reservoir_mergeable_under_any_split(spark, rows, n):
    """Union-then-rerank of any 2-way shard split reproduces the
    whole-corpus reservoir (hash order is a total order)."""
    from etl_hero_spark.sampling import reservoir_per_key

    df = spark.createDataFrame(rows, "g string, id long")
    whole = reservoir_per_key(df, "g", n=n, id_col="id")
    sh = [
        reservoir_per_key(
            df.filter(F.col("id") % 2 == i), "g", n=n, id_col="id"
        )
        for i in (0, 1)
    ]
    re_ranked = reservoir_per_key(
        sh[0].unionByName(sh[1]), "g", n=n, id_col="id"
    )
    key = lambda d: sorted((r["g"], r["id"]) for r in d.collect())
    assert key(whole) == key(re_ranked)


@given(
    base=st.lists(
        st.tuples(st.integers(0, 3), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=25,
    ),
    del_mod=st.integers(2, 4),
)
@_settings
def test_retractable_agg_random_ops_equal_recompute(spark, base, del_mod):
    """For any base set and any delete subset, signed-delta folding
    equals recomputing from the surviving rows."""
    from etl_hero_spark.cdc import agg_partials, retractable_agg_refresh

    rows = [(g, round(v, 2), i) for i, (g, v) in enumerate(base)]
    df = spark.createDataFrame(rows, "g long, v double, rid long")
    mat = agg_partials(df, "g", ["v"])
    deletes = df.filter(F.col("rid") % del_mod == 0)
    inserts = df.filter(F.col("rid") % del_mod == 1).withColumn(
        "rid", F.col("rid") + 1000
    )
    got = sorted(
        map(
            tuple,
            retractable_agg_refresh(
                mat, inserts, deletes, "g", ["v"]
            ).collect(),
        )
    )
    survivors = df.join(
        deletes.select("rid"), "rid", "left_anti"
    ).unionByName(inserts)
    want = sorted(map(tuple, agg_partials(survivors, "g", ["v"]).collect()))
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet="ab c", min_size=0, max_size=24
        ),
        min_size=0,
        max_size=15,
    ),
    ctx=st.integers(2, 9),
)
@_settings
def test_pack_sequences_partitions_the_token_stream(spark, texts, ctx):
    """For ANY corpus and context length: tok_starts are the exclusive
    prefix sums of token counts in id order, spans are consistent
    (ctx_first <= ctx_last, n_ctx matches), and the manifest's context
    totals reconstruct the corpus token count with every non-final
    context exactly full."""
    from etl_hero_spark.packing import pack_sequences, sequence_manifest

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    packed = pack_sequences(df, context_len=ctx)
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    run = 0
    for r in rows:
        assert r["tok_start"] == run
        run += r["n_tokens"]
        assert r["ctx_first"] <= r["ctx_last"]
        assert r["n_ctx"] == r["ctx_last"] - r["ctx_first"] + 1
    man = sorted(
        sequence_manifest(packed, context_len=ctx).collect(),
        key=lambda r: r["ctx_id"],
    )
    if run == 0:
        assert sum(r["n_tokens"] for r in man) == 0
        return
    assert [r["ctx_id"] for r in man] == list(range(len(man)))
    # a trailing ZERO-token doc can land a degenerate empty context
    # right after the last token-bearing one — full-context invariants
    # apply to the token-bearing prefix
    tok_man = [r for r in man if r["n_tokens"] > 0]
    assert all(r["n_tokens"] == ctx for r in tok_man[:-1])
    assert 0 < tok_man[-1]["n_tokens"] <= ctx
    assert sum(r["n_tokens"] for r in man) == run
