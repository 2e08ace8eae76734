"""Data-contract validation (dbt-test-style) for pipeline gates.

The reference's detect step hard-codes four problem classes
(app.py:210-240); production pipelines also need user-DECLARED
expectations — not-null, uniqueness, accepted values, ranges, regex
shape — checked cheaply and reported as violation counts per rule, so
a bad batch fails fast before it poisons downstream tables.

All row-level rules fold into ONE agg pass over a single scan
(sum-of-when counters, map-side partial); uniqueness is the only rule
that needs a shuffle (count minus distinct-count on the key columns).
At 100 TB: one linear scan plus one exact-distinct job per declared
unique key — the same shapes as A1/A4.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named violation predicate: rows where cond is TRUE violate."""

    name: str
    cond: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null:{col}", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Rule:
    # NULL is not a membership violation — declare not_null separately
    return Rule(
        f"accepted_values:{col}",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"range:{col}",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches:{col}",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def validate_contract(
    df: DataFrame,
    rules: list[Rule],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """One row per declared rule: (rule, n_violations).

    Row-level rules run as ONE agg pass; each unique-key declaration
    adds `n_rows - n_distinct(key)` (duplicate occurrences after the
    first, A4 semantics) as its own job. Pass the result to
    .filter('n_violations > 0') for the failure gate.
    """
    exprs = [
        F.sum(F.when(r.cond, 1).otherwise(0)).cast("bigint").alias(r.name)
        for r in rules
    ]
    wide = df.agg(*exprs).first() if rules else {}
    rows = [(r.name, wide[r.name]) for r in rules]
    for keys in unique_keys or []:
        # groupBy-based duplicate count (A4 semantics, duplicate_count's
        # shape): NULL keys form an ordinary group, unlike
        # count_distinct, which silently DROPS rows with any NULL key
        # column and would miscount every such row as a duplicate.
        n_dup = (
            df.groupBy(*keys)
            .count()
            .agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("bigint")
                .alias("d")
            )
            .first()["d"]
        )
        rows.append((f"unique:{','.join(keys)}", n_dup))
    return df.sparkSession.createDataFrame(
        rows, "rule string, n_violations bigint"
    )


def with_violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Per-ROW rule evaluation: adds `violations`, the array of names of
    the rules this row breaks (empty array = clean). One codegen pass —
    the row-level companion to validate_contract's corpus-level counts,
    for when the remedy is routing rows, not failing batches."""
    arr = F.array_compact(
        F.array(
            *[
                F.when(r.cond, F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        )
    )
    return df.withColumn("violations", arr)


def quarantine_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows breaking NO rule continue downstream;
    the rest carry their `violations` array for triage — the
    quarantine-and-continue posture (a bad 0.1% shouldn't fail a 100 TB
    batch the way validate_contract's gate would; it should be routed).

    Both returns are lazy filters of ONE flagged plan. To land both
    sides in a single scan at scale, write the flagged frame once
    partitioned by a validity flag instead of materializing each side:

        with_violations(df, rules).withColumn(
            "_valid", F.size("violations") == 0
        ).write.partitionBy("_valid").parquet(path)
    """
    flagged = with_violations(df, rules)
    clean = flagged.filter(F.size("violations") == 0).drop("violations")
    bad = flagged.filter(F.size("violations") > 0)
    return clean, bad


def referential_integrity(
    relations: list[tuple[DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """FK orphan audit across a table graph: for each (child, fk,
    parent, pk) relation, count child rows whose fk matches no parent —
    the cross-TABLE contract validate_contract's row rules can't see.
    One anti-join per relation (tiny distinct-key side when the parent
    is a dimension; AQE picks the strategy). NULL fks are reported
    separately, not as orphans — an optional FK is absence, a dangling
    one is corruption. Output: (relation, n_child, n_null_fk,
    n_orphans). The relation label is fk->pk (column names): declaring
    two relations with identical fk AND pk column names produces
    indistinguishable rows — alias a column first if that ever occurs.

    Two jobs per relation, not three (n_child and n_null_fk fold into
    ONE aggregate over one scan), and all relations' jobs run
    concurrently (thread pool over blocking actions)."""
    from concurrent.futures import ThreadPoolExecutor

    spark = relations[0][0].sparkSession

    def one(rel):
        child, fk, parent, pk = rel
        base = child.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col(fk).isNull().cast("long")), F.lit(0)
            ).alias("n_null"),
        ).first()
        n_orphans = (
            child.filter(F.col(fk).isNotNull())
            .join(
                parent.select(F.col(pk).alias(fk)).distinct(),
                fk,
                "left_anti",
            )
            .count()
        )
        return (f"{fk}->{pk}", base["n"], base["n_null"], n_orphans)

    with ThreadPoolExecutor(max_workers=min(len(relations) * 2, 16)) as ex:
        rows = list(ex.map(one, relations))
    return spark.createDataFrame(
        rows,
        "relation string, n_child bigint, n_null_fk bigint, n_orphans bigint",
    )


def schema_drift(
    old: DataFrame,
    new: DataFrame,
    null_rate_tol: float = 0.05,
) -> DataFrame:
    """Snapshot-over-snapshot drift report — the contract check between
    yesterday's table and today's, upstream of any silent breakage:

    * ``column_added`` / ``column_removed`` — schema set difference
    * ``type_changed`` — same name, different Spark type
    * ``null_rate_drift`` — a shared column whose null fraction moved
      by more than ``null_rate_tol`` (the classic "producer started
      sending empties" failure that schema equality can't see)
    * ``row_count`` — always reported (old/new counts as the detail)

    One null-pack aggregation per side (the profile.null_counts shape —
    a single scan each, no per-column jobs); schema comparison is
    driver-side metadata. Output: (kind, column, old, new) sorted.
    Detection of every kind pinned in tests/test_contracts_drift.py.
    """
    rows: list[tuple] = []
    old_types = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_types = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    for c in sorted(set(new_types) - set(old_types)):
        rows.append(("column_added", c, None, new_types[c]))
    for c in sorted(set(old_types) - set(new_types)):
        rows.append(("column_removed", c, old_types[c], None))
    shared = sorted(set(old_types) & set(new_types))
    for c in shared:
        if old_types[c] != new_types[c]:
            rows.append(("type_changed", c, old_types[c], new_types[c]))

    def null_rates(df, cols):
        r = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"_nn_{c}")
                for c in cols
            ],
        ).first()
        n = r["_n"]
        return n, {c: (r[f"_nn_{c}"] / n if n else 0.0) for c in cols}

    n_old, nr_old = null_rates(old, shared)
    n_new, nr_new = null_rates(new, shared)
    for c in shared:
        if abs(nr_new[c] - nr_old[c]) > null_rate_tol:
            rows.append(
                (
                    "null_rate_drift",
                    c,
                    f"{nr_old[c]:.4f}",
                    f"{nr_new[c]:.4f}",
                )
            )
    rows.append(("row_count", None, str(n_old), str(n_new)))
    return old.sparkSession.createDataFrame(
        sorted(rows, key=lambda r: (r[0], r[1] or "")),
        "kind string, column string, old string, new string",
    )
