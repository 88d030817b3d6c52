"""PII scrubbing — regex redaction of emails, phone numbers, IPv4
addresses, and SSN-shaped ids, with per-type counts.

The standard pre-training hygiene pass (every public corpus pipeline —
C4, RefinedWeb, Dolma — ships a variant): detect PII spans, replace them
with stable placeholder tokens so downstream dedup/fingerprints stay
deterministic, and report per-document counts for auditing.

Engine notes: the patterns are written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences, and
NO ``\\b``: word boundaries are a genuine engine divergence (Java's
``\\b`` is Unicode-aware even though its ``\\w`` is ASCII; RE2's is
ASCII), measured as Spark keeping ``é123-45-6789`` while DuckDB scrubs
it. Boundary-free matching makes the engines agree exactly and errs
toward OVER-redaction — the safe failure mode for a PII pass. Counts
are taken on the ORIGINAL text per type; replacement is sequential in a
fixed order (email → ssn → phone → ip) so overlapping matches resolve
identically on both engines. All row-local column expressions — zero
shuffle, linear scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: (name, pattern, replacement)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (
        "phone",
        r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
        "<PHONE>",
    ),
    ("ipv4", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_scrub_col(col) -> Column:
    """Text with every PII span replaced by its placeholder token, in the
    fixed pattern order."""
    out = _c(col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    return out


def pii_scrub_sql(col_sql: str) -> str:
    out = col_sql
    for _, pat, repl in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out


def pii_count_col(col, name: str) -> Column:
    """Occurrence count of one PII type on the original text."""
    pat = {n: p for n, p, _ in PII_PATTERNS}[name]
    return F.regexp_count(_c(col), F.lit(pat)).cast("long")


def pii_count_sql(col_sql: str, name: str) -> str:
    pat = {n: p for n, p, _ in PII_PATTERNS}[name]
    escaped = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col_sql}, '{escaped}')) AS BIGINT)"


def pii_scrub_py(text: str) -> str:
    """Python twin (tests)."""
    import re

    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text
