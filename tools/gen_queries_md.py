"""Regenerate QUERIES.md — the one-line index of every registered
query: name, check tier (oracle = driver DuckDB hash-compare /
rows-only = semantics pinned in tests), and its registry note.

Usage: python tools/gen_queries_md.py > QUERIES.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    from etl_hero_spark.registry import (
        REGISTRY,
        _load_extensions,
        _ordered_registry,
    )

    _load_extensions()
    print("# Query index — the registered contract surface")
    print()
    print(
        f"{len(REGISTRY)} queries"
        f" ({sum(1 for s in REGISTRY.values() if s.oracle)} oracle-backed,"
        " registered first so the driver's bounded verification window"
        " always covers every cross-engine hash check; the rest are"
        " rows-only with semantics pinned in tests — see each note)."
    )
    print()
    print("Regenerate with `python tools/gen_queries_md.py > QUERIES.md`.")
    print()
    print("| # | query | check | what it is |")
    print("|---|---|---|---|")
    for i, (name, spec) in enumerate(_ordered_registry(), 1):
        tier = "oracle" if spec.oracle else "rows-only"
        note = " ".join((spec.note or "").split())
        print(f"| {i} | `{name}` | {tier} | {note} |")


if __name__ == "__main__":
    main()
