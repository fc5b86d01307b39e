"""PII redaction for training-data curation (beyond-reference LLM
facet, r8): scrub emails, SSN-shaped ids, IPv4 addresses and phone
numbers from a text column, with per-kind match counts.

Pure row-local ``regexp_replace`` / ``regexp_count`` projections —
JVM-side, codegen, no shuffle, no UDF — so at 100 TB this is a free
rider on whatever scan the pipeline already does (the same posture as
text_stats / repetition_signals).  Not registered as a driver query:
the correctness harness caps at 50 rows; coverage lives in
tests/test_llm_ops.py against hand-built expectations.

Pattern order is specificity-first and deliberate: an SSN or IPv4 also
matches the looser phone pattern, so those kinds must consume their
text before the phone pass runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, Java regex) in application order — most specific first.
#: The phone pattern is deliberately ANCHORED to phone-like shapes —
#: an international +prefix run (year-range lookahead rejects
#: ``+2019-2025``-style spans) or 3-3-4 groups with or without an area
#: code in parentheses — so ordinary prose survives: an earlier loose
#: variant (``\+?\d[\d\-\s()]{7,}\d``) redacted every ISO date
#: (2024-01-02), year range and 9+-digit id as [PHONE] (r8 review
#: find).  A 3-3-4 group never collides with dates (4-2-2) or SSNs
#: (3-2-4, claimed earlier anyway).  DELIBERATE precision/recall
#: decision (r8 second review): a bare separator-less 10-digit run
#: (``5551234567``) is left alone — it is indistinguishable from order
#: ids / epoch timestamps, and mangling those at corpus scale costs
#: more than the rare unformatted number leaks.  The 3-3-4 branch is
#: \b-anchored on BOTH sides (r9 review): without the leading \b it
#: redacted the digit-run SUFFIX of longer ids ("invoice
#: 2024-555-1234" -> "invoice 2[PHONE]").
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    (
        "phone",
        r"(?:\+(?!\d{1,4}-\d{4}\b)\d{1,3}(?:[-.\s()]{0,2}\d){6,12}"
        r"|\(\d{3}\)\s?\d{3}[-.\s]?\d{4}"
        r"|\b\d{3}[-.\s]\d{3}[-.\s]\d{4})\b",
    ),
)


#: Dialect-portable subset (r9): identical semantics under Java regex
#: (Spark) and RE2 (DuckDB) — drops ONLY the international ``+prefix``
#: phone branch, whose year-range rejection needs a negative lookahead
#: RE2 cannot express.  This is what the oracle-checked driver query
#: uses; production defaults stay :data:`PII_PATTERNS`.  (Residual
#: dialect delta: Java ``\\s`` includes U+000B, RE2's does not —
#: irrelevant for any text without vertical tabs.)
PII_PATTERNS_PORTABLE: tuple[tuple[str, str], ...] = (
    PII_PATTERNS[0],
    PII_PATTERNS[1],
    PII_PATTERNS[2],
    (
        "phone",
        r"(?:\(\d{3}\)\s?\d{3}[-.\s]?\d{4}"
        r"|\b\d{3}[-.\s]\d{3}[-.\s]\d{4})\b",
    ),
)


def _token(kind: str) -> str:
    return f"[{kind.upper()}]"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_col: str = "redacted_text",
) -> DataFrame:
    """Append ``out_col`` (the scrubbed text), one ``pii_n_<kind>``
    count per pattern, and ``pii_n_total``.  Counts are measured on the
    text as each pass sees it, so overlapping kinds are attributed to
    the most specific pattern (application order above).  Idempotent:
    replacement tokens contain no digits or ``@``, so re-running the
    scrub is a no-op."""
    redacted: Column = F.col(text_col)
    counts = []
    for kind, pat in patterns:
        counts.append(
            F.regexp_count(redacted, F.lit(pat))
            .cast("bigint")
            .alias(f"pii_n_{kind}")
        )
        redacted = F.regexp_replace(redacted, pat, _token(kind))
    out = df.select("*", *counts, redacted.alias(out_col))
    total = None
    for kind, _ in patterns:
        c = F.col(f"pii_n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("pii_n_total", total.cast("bigint"))
