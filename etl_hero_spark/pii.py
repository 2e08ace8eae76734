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


CC_CANDIDATE = r"[0-9](?:[0-9 -]{11,17})[0-9]"


def luhn_valid_expr(digits) -> "F.Column":
    """Luhn checksum validity of a digit string — the checksum every
    real payment-card number satisfies, which is what separates card
    PII from arbitrary long numbers (order ids, tracking numbers) that
    a bare regex would flag. Indexed transform over the reversed digit
    array + sum; higher-order functions evaluate interpreted, which is
    fine HERE because this only ever runs on regex-prefiltered
    candidates (rare, short arrays) — never the corpus hot path."""
    # split("") can emit boundary empties; drop them before indexing
    arr = F.reverse(
        F.filter(F.split(digits, ""), lambda x: x != F.lit(""))
    )
    # digit-sum of 2*d as a lookup table (d=5 -> 10 -> 1), all integer
    doubled = F.array(*[F.lit(v) for v in [0, 2, 4, 6, 8, 1, 3, 5, 7, 9]])
    per = F.transform(
        arr,
        lambda ch, i: F.when(
            i % 2 == 1, F.element_at(doubled, ch.cast("int") + 1)
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(per, F.lit(0), lambda acc, x: acc + x)
    return (total % 10 == 0) & (F.length(digits) >= 13)


def with_credit_card_flags(
    df: DataFrame, col: str = "text"
) -> DataFrame:
    """Adds n_ccard_candidates (13-19 digit runs with optional space/
    dash separators) and n_ccards (candidates passing Luhn) — the
    validated count is the PII signal; the gap between the two is the
    false-positive mass a regex-only scrubber would have redacted."""
    cands = F.regexp_extract_all(F.col(col), F.lit(CC_CANDIDATE), F.lit(0))
    digits = lambda s: F.regexp_replace(s, r"[ -]", "")  # noqa: E731
    valid = F.filter(cands, lambda s: luhn_valid_expr(digits(s)))
    return df.withColumn(
        "n_ccard_candidates", F.size(cands)
    ).withColumn("n_ccards", F.size(valid))


def redact_credit_cards(
    df: DataFrame, col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Mask card-shaped numbers with [CCARD]. Redaction intentionally
    masks ALL candidates (safe-over-precise — a leaked card must never
    survive because a separator confused the validator); pair with
    with_credit_card_flags when you need the validated count."""
    out_col = out_col or col
    return df.withColumn(
        out_col,
        F.regexp_replace(F.col(col), CC_CANDIDATE, "[CCARD]"),
    )
