"""Import-surface test for the namespace packages.

``etl_hero_spark/{operators,functions,sources,plans}`` present the flat
implementation modules (profile.py, clean.py, io.py, ...) as the
SURVEY.md package layout. They are pure re-export facades, so nothing
else imports them — this test is their consumer: it imports each one,
checks the facade is non-trivial, and verifies every public name it
exports resolves to a real callable/module object (a stale re-export —
e.g. a function renamed in its implementation module — fails at import
time here instead of silently drifting).
"""

from __future__ import annotations

import importlib
import inspect

import pytest

FACADES = [
    "etl_hero_spark.operators",
    "etl_hero_spark.functions",
    "etl_hero_spark.sources",
    "etl_hero_spark.plans",
]


@pytest.mark.parametrize("modname", FACADES)
def test_facade_imports_and_exports_resolve(modname):
    mod = importlib.import_module(modname)
    public = [n for n in dir(mod) if not n.startswith("_")]
    assert public, f"{modname} exports nothing public"
    for name in public:
        obj = getattr(mod, name)  # raises if a re-export went stale
        assert obj is not None, f"{modname}.{name} resolved to None"


def test_operators_surface_is_broad():
    """The operators facade is the main catalogue — it should re-export
    the core operator families, not a token subset."""
    ops = importlib.import_module("etl_hero_spark.operators")
    funcs = [
        n
        for n in dir(ops)
        if not n.startswith("_") and inspect.isfunction(getattr(ops, n))
    ]
    assert len(funcs) >= 40, f"only {len(funcs)} operator functions exported"
    for expected in (
        "remove_outliers",
        "drop_duplicate_rows",
        "normalize_dates",
        "minhash_lsh_pairs",
    ):
        assert expected in funcs, f"{expected} missing from operators facade"
