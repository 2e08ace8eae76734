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
