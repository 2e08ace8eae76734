"""PII redaction for training-data pipelines (extension mandate).

Regex-based masking of emails, SSN-shaped ids, IPv4 addresses and phone
numbers — the standard pre-release scrub pass over a text corpus. Pure
`regexp_replace`/`regexp_extract_all` expressions: JVM-side, codegen'd,
no shuffle — a linear scan at any corpus size.

Pattern portability (the point of the exact spellings below): explicit
`[a-zA-Z0-9]`-style classes, no backreferences, no lookaround — these
mean the same thing to Java's backtracking engine (Spark) and RE2
(DuckDB), and both engines match leftmost-first with greedy
quantifiers, so redactions are byte-identical cross-engine (the oracle
checks this).

Redaction ORDER is part of the contract: EMAIL -> SSN -> IP -> PHONE.
An SSN ('123-45-6789') and an IPv4 both also match the permissive
phone pattern, so each stage counts its matches on the PREVIOUS
stage's output — once '[SSN]'/'[IP]' tokens replace the digits, the
phone pass can no longer double-count them.

No counterpart in the reference (its only string ops are date parsing,
app.py:73-81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; see module docstring
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "[EMAIL]",
    ),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
    ("phone", r"\+?[0-9][0-9()\s.-]{7,}[0-9]", "[PHONE]"),
]


def redact_pii(
    df: DataFrame, col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Mask every PII pattern in ``col`` and add an ``n_<kind>`` match
    count per pattern. out_col defaults to replacing ``col`` in place."""
    out_col = out_col or col
    cur = F.col(col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        # idx=0 (whole match) explicitly: Spark's SQL default is group 1,
        # DuckDB's is group 0 — the IP pattern has a group, so the
        # default would count different things per engine
        counts[f"n_{name}s"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))
        )
        cur = F.regexp_replace(cur, pat, repl)
    for cname, cexpr in counts.items():
        df = df.withColumn(cname, cexpr)
    return df.withColumn(out_col, cur)
