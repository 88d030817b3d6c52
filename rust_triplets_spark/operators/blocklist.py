"""Blocklist phrase filtering — the toxicity / banned-content gate every
production corpus pipeline runs (C4 dropped documents on the "List of
Dirty, Naughty …" wordlist; CCNet/Dolma ship category blocklists). The
filter is word-boundary-aware MULTI-WORD phrase counting, expressed
entirely in native column expressions so both engines count identically
and Catalyst keeps it row-local.

Matching semantics (documented contract):
- text is inline-whitespace-normalized, then space-padded; each phrase
  is space-padded too, so ``" bad actor "`` only matches at token
  boundaries — no substring false positives ("class" never matches
  "ass").
- counts are NON-OVERLAPPING occurrences (the split-count kernel:
  ``size(split(padded, phrase)) - 1``). Inter-token gaps are rendered
  as TWO spaces while each phrase keeps single edge spaces, so adjacent
  occurrences never share a separator and back-to-back repeats count
  fully ("rogue rogue" = 2) — the classic split-count undercount,
  closed by construction and pinned in tests.
- matching is case-sensitive against the normalized text; callers who
  want case folding lower() both sides in the plan.

Scale shape at 100 TB: pure row-local expressions (one regexp_replace +
one literal split per phrase), zero shuffles before the caller's own
aggregation; the blocklist itself is a plan constant (a few KB of
literals — real blocklists of ~10k phrases would move to an
Aho-Corasick pandas-UDF kernel; this declarative form is the
oracle-checkable gate for curated phrase lists)."""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import WS

# demo categories over the synthetic corpus vocabulary — the STRUCTURE
# (multi-word phrases, several categories, per-category thresholds) is
# the deliverable; real deployments swap the phrase lists
DEFAULT_BLOCKLIST: dict[str, tuple[str, ...]] = {
    "infra": ("shuffle join", "broadcast join", "hash join"),
    "perf": ("slow scan", "slow fast", "full table"),
    "meta": ("key value", "row group"),
}


def _phrase_pat(phrase: str) -> str:
    """Boundary pattern: single edge spaces, double internal separators
    (matching the doubled inter-token gaps of the padded text)."""
    return " " + "  ".join(phrase.split()) + " "


def _phrase_hits_col(padded: Column, phrase: str) -> Column:
    return (
        F.size(F.split(padded, _re.escape(_phrase_pat(phrase)))) - 1
    ).cast("long")


def blocklist_hits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: dict[str, tuple[str, ...]] | None = None,
    flag_threshold: int = 1,
) -> DataFrame:
    """Per-document blocklist census: ``(doc_id, hits_<category>...,
    total_hits, flagged)`` — ``flagged`` when ANY category reaches
    ``flag_threshold`` non-overlapping boundary matches."""
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    if not bl or any(not ps for ps in bl.values()):
        raise ValueError("blocklist: categories must be non-empty")
    if flag_threshold < 1:
        raise ValueError(f"blocklist: bad flag_threshold={flag_threshold}")
    padded = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.col(text_col), WS, "  ")),
        F.lit(" "),
    )
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    cat_cols = []
    for cat in sorted(bl):
        c = None
        for phrase in bl[cat]:
            h = _phrase_hits_col(padded, phrase)
            c = h if c is None else c + h
        cols.append(c.alias(f"hits_{cat}"))
        cat_cols.append(f"hits_{cat}")
    out = df.select(*cols)
    total = None
    flagged = None
    for cc in cat_cols:
        total = F.col(cc) if total is None else total + F.col(cc)
        f = F.col(cc) >= flag_threshold
        flagged = f if flagged is None else flagged | f
    return out.select(
        "doc_id",
        *cat_cols,
        total.cast("long").alias("total_hits"),
        flagged.cast("long").alias("flagged"),
    ).orderBy("doc_id")


def blocklist_hits_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    blocklist: dict[str, tuple[str, ...]] | None = None,
    flag_threshold: int = 1,
) -> str:
    """DuckDB twin of :func:`blocklist_hits` — literal (non-regex)
    splits on the same padded normalized text."""
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    if not bl or any(not ps for ps in bl.values()):
        raise ValueError("blocklist: categories must be non-empty")
    if flag_threshold < 1:
        raise ValueError(f"blocklist: bad flag_threshold={flag_threshold}")
    padded = (
        f"' ' || trim(regexp_replace({text_sql}, '{WS}', '  ', 'g')) || ' '"
    )
    cat_exprs = []
    for cat in sorted(bl):
        terms = " + ".join(
            "(len(string_split(padded, ' "
            + "  ".join(p.split())
            + " ')) - 1)"
            for p in bl[cat]
        )
        cat_exprs.append((cat, terms))
    hits_cols = ",\n       ".join(
        f"CAST({terms} AS BIGINT) AS hits_{cat}" for cat, terms in cat_exprs
    )
    total = " + ".join(f"hits_{cat}" for cat, _ in cat_exprs)
    flagged = " OR ".join(
        f"hits_{cat} >= {flag_threshold}" for cat, _ in cat_exprs
    )
    return f"""
WITH bl_base AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS doc_id, {padded} AS padded
  FROM {table} t
), bl_hits AS (
  SELECT doc_id,
       {hits_cols}
  FROM bl_base
)
SELECT doc_id, {', '.join(f'hits_{cat}' for cat, _ in cat_exprs)},
       CAST({total} AS BIGINT) AS total_hits,
       CAST(CASE WHEN {flagged} THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM bl_hits
ORDER BY doc_id
"""
