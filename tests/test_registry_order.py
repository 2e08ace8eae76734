"""Registration-order invariants for the driver contract.

The driver's correctness harness verifies a bounded window (~50) of
queries() entries in iteration order. Every oracle-backed query is hard
cross-engine signal and must land inside that window; rows-only queries
(semantics pinned by unit tests) trail behind. These tests freeze that
arrangement so a new registration can't silently push an oracle-backed
query out of the verified window.
"""

DRIVER_WINDOW = 50


def test_every_oracle_backed_query_fits_in_driver_window():
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    # every oracle key is a registered query
    assert set(oracles) <= set(names)
    # the oracle-backed prefix fits the driver's verified window
    assert len(oracles) <= DRIVER_WINDOW, (
        f"{len(oracles)} oracle-backed queries exceed the ~{DRIVER_WINDOW}-entry "
        "driver window — merge near-redundant ones (tag-column union) instead "
        "of registering more"
    )
    assert set(oracles) <= set(names[:DRIVER_WINDOW])


def test_oracle_backed_queries_come_first():
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    seen_rows_only = False
    for n in names:
        if n in oracles:
            assert not seen_rows_only, (
                f"oracle-backed query {n!r} registered after a rows-only one"
            )
        else:
            seen_rows_only = True


def test_absorbed_keep_best_oracle_byte_unchanged():
    """r9 absorption contract: the dedup_keep_best oracle SQL inside
    dedup_clusters' wrapper is a byte-identical copy of the absorbed
    query's SQL (kept in registry_ext2 as the source of truth; the
    copy in registry_ext avoids a module-level cross-import that
    would reorder extension registration)."""
    from etl_hero_spark.registry_ext import _DEDUP_KEEP_BEST_SQL_COPY
    from etl_hero_spark.registry_ext2 import DEDUP_KEEP_BEST_SQL

    assert _DEDUP_KEEP_BEST_SQL_COPY == DEDUP_KEEP_BEST_SQL


def test_r9_rotation_window_membership():
    """pipeline_quality_serve joined the verified window in r9;
    dedup_keep_best left registration entirely (absorbed as
    dedup_clusters tag='keep_best' rows)."""
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    assert "pipeline_quality_serve" in oracles
    assert "pipeline_quality_serve" in names[:DRIVER_WINDOW]
    assert "dedup_keep_best" not in names
    # the family's fitted report stays registered rows-only
    assert "pipeline_quality_classifier" in names
    assert "pipeline_quality_classifier" not in oracles


def test_r9_second_rotation_window_membership():
    """Second r9 wave: features_linreg gained a full oracle (the
    regression family's hash-checkable member — closed-form exact
    OLS); slot freed by absorbing sql_supplier_relationship (Q16)
    into sql_excess_suppliers as part='q16' rows."""
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    assert "features_linreg" in oracles
    assert "features_linreg" in names[:DRIVER_WINDOW]
    assert "sql_supplier_relationship" not in names
    assert "sql_excess_suppliers" in oracles
    assert len(oracles) == DRIVER_WINDOW


def test_r10_rotation_window_membership():
    """r10 wave (VERDICT r9 next-5): profile_psi_drift and
    events_anomaly_mad gained full oracles (their DuckDB parity SQL,
    proven in tests since r5/r2, now runs as the driver oracle);
    slots freed by absorbing sql_waiting_suppliers (Q21) into
    sql_shipmode_priority as part='q21' rows and sql_important_parts
    (Q11) into sql_excess_suppliers as part='q11' rows."""
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    assert "profile_psi_drift" in oracles
    assert "events_anomaly_mad" in oracles
    assert "profile_psi_drift" in names[:DRIVER_WINDOW]
    assert "events_anomaly_mad" in names[:DRIVER_WINDOW]
    assert "sql_waiting_suppliers" not in names
    assert "sql_important_parts" not in names
    assert "sql_shipmode_priority" in oracles
    assert "sql_excess_suppliers" in oracles
    assert len(oracles) == DRIVER_WINDOW
    # absorbed SQL rides byte-unchanged inside each wrapper
    from etl_hero_spark.registry_ext2 import (
        _SQL_IMPORTANT_PARTS_SQL,
        _SQL_WAITING_SUPPLIERS_SQL,
    )

    assert _SQL_WAITING_SUPPLIERS_SQL in oracles["sql_shipmode_priority"]
    assert _SQL_IMPORTANT_PARTS_SQL in oracles["sql_excess_suppliers"]
