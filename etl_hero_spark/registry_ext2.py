"""Registry entries for the round-4 wave-3 extensions: two-sample
hypothesis tests, autocorrelation, PMI collocations, item-item
similarity, Naive Bayes language classification, semi/anti-join SQL
analytics, and unpivot. Imported by registry for its side effects,
same split as registry_ext."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hero_spark.registry import _events, _t, register

# ===========================================================================
# two-sample hypothesis tests (stattests.py)
# ===========================================================================


@register(
    "profile_welch_ttest",
    oracle=None,
    note=(
        "extension: Welch's unequal-variance t-test between two "
        "customer segments on acctbal — ONE conditional multi-agg scan, "
        "decimal-exact moment sums (order-independent), ddof=1, "
        "Welch-Satterthwaite df. Exact-formula parity vs a pure-Python "
        "reference pinned in tests/test_stattests.py"
    ),
)
def q_profile_welch_ttest(spark, sf_dir):
    from etl_hero_spark.stattests import welch_ttest

    return welch_ttest(
        _t(spark, sf_dir, "customer"),
        "c_acctbal",
        "c_mktsegment",
        "BUILDING",
        "MACHINERY",
    )


@register(
    "profile_mann_whitney",
    oracle=None,
    note=(
        "extension: Mann-Whitney U between two order priorities on "
        "totalprice — rank test without a global per-row sort: corpus "
        "folds to the distinct-value table (ties ARE the grouped rows), "
        "tie-averaged ranks from a two-phase distributed prefix scan "
        "(range-bucket + local window + broadcast offsets, the "
        "packing.global_rank shape), 2*R held integral in DECIMAL(38,0). "
        "Tie-corrected z, no continuity correction. Python-reference "
        "parity + tie-saturated fixture in tests/test_stattests.py"
    ),
)
def q_profile_mann_whitney(spark, sf_dir):
    from etl_hero_spark.stattests import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderpriority",
        "1-URGENT",
        "5-LOW",
    )


@register(
    "profile_ks_test",
    oracle=None,
    note=(
        "extension: two-sample Kolmogorov-Smirnov D between event-type "
        "value distributions — sup|ECDF_a-ECDF_b| as exact integer "
        "arithmetic over the distinct-value table (|cum_a*n_b-cum_b*n_a| "
        "in DECIMAL(38,0), one division at the end), cumulative counts "
        "via the same two-phase prefix scan as mann_whitney. Asymptotic "
        "one-term p-value. Python-reference parity pinned in "
        "tests/test_stattests.py"
    ),
)
def q_profile_ks_test(spark, sf_dir):
    from etl_hero_spark.stattests import ks_2samp

    return ks_2samp(
        _events(spark, sf_dir),
        "value",
        "event_type",
        "click",
        "purchase",
    )
