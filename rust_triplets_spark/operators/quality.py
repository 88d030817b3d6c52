"""Repetition quality signals — the Gopher/RefinedWeb filter family.

Pretraining pipelines drop documents dominated by repetition; the classic
signals (Rae et al. 2021 "Scaling Language Models" Table A1; reused by
RefinedWeb/Dolma) are the fraction of duplicate lines and the fraction of
tokens inside the most-frequent n-gram. This module computes, per doc:

- ``uniq_token_frac`` — distinct tokens / tokens (row-local);
- ``dup_line_frac``   — 1 − distinct lines / lines (row-local);
- ``top{n}gram_frac`` — (count of the most frequent n-gram × n) / tokens,
  for each requested n.

The top-n-gram counts need per-(doc, gram) frequencies: explode to int64
n-gram fingerprints (the decontam combiner — fixed-width shuffle rows,
never gram strings), count per (doc, gram), take the per-doc max — two
partial-aggregable groupBys keyed by doc id, linear at any corpus size.
A fingerprint collision overcounts identically on both engines, so the
DuckDB twin stays hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col, tokens_sql

REP_SEED = 2203


def _validate_ns(ns: tuple[int, ...]) -> None:
    """Both twins validate identically: the SQL form would otherwise emit
    a syntax error for ns=() and duplicate CTE names for repeated n —
    while the Spark form silently succeeded, a cross-engine divergence."""
    if not ns:
        raise ValueError("ns must name at least one n-gram size")
    if len(set(ns)) != len(ns):
        raise ValueError(f"duplicate n-gram sizes in {ns}")
    if any(n < 1 for n in ns):
        raise ValueError(f"n-gram sizes must be >= 1, got {ns}")


def _gram_fps(text_col, n: int, seed: int):
    """NON-distinct n-gram fingerprints (frequency counting needs every
    occurrence — the dedup/decontam variants deliberately de-duplicate);
    the shared machinery of ``dedup.ngram_fingerprint_array_col``."""
    from rust_triplets_spark.operators.dedup import ngram_fingerprint_array_col

    return ngram_fingerprint_array_col(text_col, n, seed, "polymix31", distinct=False)


def _grams_sql(text_sql: str, n: int, seed: int) -> str:
    from rust_triplets_spark.operators.dedup import ngram_fingerprint_array_sql

    return ngram_fingerprint_array_sql(text_sql, n, seed, "polymix31", distinct=False)


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ns: tuple[int, ...] = (2, 3),
    seed: int = REP_SEED,
) -> DataFrame:
    """Per-document repetition signal frame:
    ``(id, n_tok, uniq_token_frac, dup_line_frac, top{n}gram_frac…)``.
    Documents with no tokens are dropped (no signal)."""
    _validate_ns(ns)
    toks = tokens_col(F.col(text_col))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("__text"),
        F.size(toks).cast("long").alias("n_tok"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
         ).alias("uniq_token_frac"),
        F.when(
            F.size(lines) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double")
            / F.size(lines).cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
    ).where(F.col("n_tok") > 0)
    # base feeds every n's gram explode AND the running join chain — and
    # each gram frame must derive from BASE, not the accumulating `out`
    # (whose lineage already contains the previous n's join+aggregate:
    # Spark cannot prune the unused join without unique-key metadata, so
    # n=3 would re-execute the whole n=2 aggregation)
    from rust_triplets_spark.functions.caching import cache_scoped

    base = cache_scoped(base, "quality.repetition.base")

    out = base
    for n in ns:
        grams = base.select(
            "id", F.explode(_gram_fps(F.col("__text"), n, seed)).alias("g")
        )
        top = (
            grams.groupBy("id", "g").agg(F.count("*").alias("__c"))
            .groupBy("id").agg(F.max("__c").alias("__top"))
        )
        # coalesce BEFORE least: both engines' least() ignores NULLs, so
        # least(1.0, NULL) would silently return 1.0 for gram-less docs
        out = out.join(top, "id", "left").withColumn(
            f"top{n}gram_frac",
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("__top"), F.lit(0)).cast("double")
                * n
                / F.col("n_tok").cast("double"),
            ),
        ).drop("__top")
    return out.drop("__text")


def repetition_signals_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    ns: tuple[int, ...] = (2, 3),
    seed: int = REP_SEED,
) -> str:
    """DuckDB twin of :func:`repetition_signals`."""
    _validate_ns(ns)
    toks = tokens_sql(text_sql)
    lines = (
        f"list_filter(list_transform(string_split({text_sql}, chr(10)), "
        f"l -> trim(l)), l -> length(l) > 0)"
    )
    gram_cols = []
    gram_joins = []
    for n in ns:
        g = _grams_sql(text_sql, n, seed)
        gram_joins.append(f"""
t{n} AS (
  SELECT id, max(c) AS top FROM (
    SELECT CAST({id_sql} AS BIGINT) AS id, u.g, count(*) AS c
    FROM {table}, UNNEST({g}) AS u(g)
    GROUP BY 1, 2
  ) GROUP BY id
)""")
        gram_cols.append(
            f"least(1.0, CAST(COALESCE(t{n}.top, 0) AS DOUBLE) * {n} / base.n_tok)"
            f" AS top{n}gram_frac"
        )
    joins = "".join(f" LEFT JOIN t{n} ON base.id = t{n}.id" for n in ns)
    return f"""
WITH base AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST(len({toks}) AS BIGINT) AS n_tok,
         CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks}) AS uniq_token_frac,
         CASE WHEN len({lines}) > 0
              THEN 1.0 - CAST(len(list_distinct({lines})) AS DOUBLE) / len({lines})
              ELSE 0.0 END AS dup_line_frac
  FROM {table}
  WHERE len({toks}) > 0
),{','.join(gram_joins)}
SELECT base.id, base.n_tok, base.uniq_token_frac, base.dup_line_frac,
       {', '.join(gram_cols)}
FROM base{joins}
"""


# ---------------------------------------------------------------------------
# corpus profiling: exact per-group discrete quantiles
# ---------------------------------------------------------------------------

QUANTILE_FRACTIONS: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4), (9, 10))


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    fractions: tuple[tuple[int, int], ...] = QUANTILE_FRACTIONS,
) -> DataFrame:
    """Per-group discrete (type-1) quantiles of an integer column — the
    corpus-profiling pass a data pipeline runs to size chunking budgets
    and spot degenerate sources (length collapse, truncation walls).

    The ``f`` quantile is the value at 1-indexed rank ``ceil(f * n)`` in
    the group's sorted order. Fractions are exact rationals ``(p, q)`` and
    the rank is computed in pure integer arithmetic ``(p*n + q - 1) div
    q`` — no floating-point rank, so Spark and DuckDB agree bit-exactly.

    Output: ``(group, n, min_v, max_v, q_<pct> ...)`` as BIGINT.

    Scale note: uses a per-group sort window — correct and exact at any
    group count, but at 100 TB with few giant groups prefer
    ``approx_percentile`` (t-digest, partial-aggregable, no global sort)
    and keep this exact form for audits on samples. Ties need no
    tiebreak: every row of a tie-run carries the same value, so the rank
    pick is deterministic regardless of row order within the run.

    NULL values are excluded before ranking (both engines): Spark windows
    default to NULLS FIRST and DuckDB to NULLS LAST, so letting NULLs
    into the rank order would silently diverge the engines — and a NULL
    quantile is meaningless anyway. ``n`` counts non-NULL values.
    """
    from pyspark.sql import Window

    _validate_fractions(fractions)
    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    v = F.col(value_col).cast("long")
    ranked = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        v.alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n"),
    )
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]
    for p, q in fractions:
        pct = round(100 * p / q)
        idx = F.expr(f"(n * {p} + {q - 1}) div {q}")
        aggs.append(F.max(F.when(F.col("rn") == idx, F.col("v"))).alias(f"q_{pct}"))
    return ranked.groupBy(F.col("grp").alias(group_col)).agg(*aggs)


def _validate_fractions(fractions: tuple[tuple[int, int], ...]) -> None:
    """Shared by both twins: rejects empty/out-of-range fractions and
    distinct fractions whose rounded percent collides (duplicate q_<pct>
    output columns would be ambiguous in Spark and invalid SQL aliases)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    seen: dict[int, tuple[int, int]] = {}
    for p, q in fractions:
        if not (0 < p <= q):
            raise ValueError(f"fraction {p}/{q} not in (0, 1]")
        pct = round(100 * p / q)
        if pct in seen:
            raise ValueError(
                f"fractions {seen[pct]} and {(p, q)} both name column q_{pct}"
            )
        seen[pct] = (p, q)


def group_quantiles_sql(
    table: str,
    group_sql: str,
    value_sql: str,
    fractions: tuple[tuple[int, int], ...] = QUANTILE_FRACTIONS,
    group_alias: str = "grp",
) -> str:
    """DuckDB twin of :func:`group_quantiles`. ``group_alias`` must match
    the Spark side's ``group_col`` output name for hash parity."""
    _validate_fractions(fractions)
    qcols = []
    for p, q in fractions:
        pct = round(100 * p / q)
        qcols.append(
            f"max(CASE WHEN rn = (n * {p} + {q - 1}) // {q} THEN v END) AS q_{pct}"
        )
    return f"""
WITH ranked AS (
  SELECT {group_sql} AS grp, CAST({value_sql} AS BIGINT) AS v,
         row_number() OVER (PARTITION BY {group_sql} ORDER BY {value_sql}) AS rn,
         count(*) OVER (PARTITION BY {group_sql}) AS n
  FROM {table}
  WHERE {value_sql} IS NOT NULL
)
SELECT grp AS {group_alias}, CAST(count(*) AS BIGINT) AS n,
       min(v) AS min_v, max(v) AS max_v,
       {', '.join(qcols)}
FROM ranked GROUP BY grp
"""


# ---------------------------------------------------------------------------
# Token-entropy quality signal: Shannon entropy of the document's unigram
# distribution. Low entropy flags repeated-token spam / keyword stuffing /
# degenerate MT output the bigram repetition signals can miss (a doc that
# is ONE word repeated 500 times has zero duplicate 2-gram *types* above
# threshold but near-zero entropy). Standard in web-corpus quality stacks.
# ---------------------------------------------------------------------------

ENTROPY_QSCALE = 1_000_000_000  # same 1e-9 grid as the LM operators


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats):
    ``(id, n_tokens, distinct_tokens, entropy_q, entropy)`` where
    ``entropy_q = Σ_types c·round(ln(n/c)·QSCALE)`` — each type's
    contribution is an integer, so the sum is order-free and the DuckDB
    twin matches bit-for-bit — and ``entropy = entropy_q / (n·QSCALE)``.
    Zero-token documents report ``(0, 0, 0, null)``.

    Scale shape: one token-scale explode → one partial-aggregable
    groupBy (id, token) → vocabulary-shaped per-doc aggregates; the
    final left join back to the id frame restores empty docs. Token
    strings ride shuffle VALUES; keys are (id, token) — same contract as
    the vocab-stats family."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    occ = (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from pyspark.sql import Window

    n = F.sum("c").over(Window.partitionBy("id"))
    per_type = occ.withColumn(
        "__contrib",
        F.col("c")
        * F.round(
            F.log(n.cast("double") / F.col("c").cast("double"))
            * F.lit(float(ENTROPY_QSCALE))
        ).cast("long"),
    )
    agg = per_type.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("distinct_tokens"),
        F.sum("__contrib").cast("long").alias("entropy_q"),
    )
    return ids.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("distinct_tokens", F.lit(0)).cast("long").alias(
            "distinct_tokens"
        ),
        F.coalesce("entropy_q", F.lit(0)).cast("long").alias("entropy_q"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.coalesce("entropy_q", F.lit(0)).cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(ENTROPY_QSCALE))),
        ).alias("entropy"),
    )


def token_entropy_sql(table: str, id_sql: str, text_sql: str) -> str:
    """DuckDB twin of :func:`token_entropy`."""
    toks = tokens_sql(text_sql)
    q = float(ENTROPY_QSCALE)
    return f"""
WITH te_ids AS (SELECT CAST({id_sql} AS BIGINT) AS id FROM {table}),
te_occ AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, u.tok, CAST(count(*) AS BIGINT) AS c
  FROM {table} t, UNNEST({toks}) AS u(tok)
  GROUP BY 1, 2
), te_typed AS (
  SELECT id, c,
         c * CAST(round(ln(CAST(sum(c) OVER (PARTITION BY id) AS DOUBLE)
                           / CAST(c AS DOUBLE)) * {q!r}) AS BIGINT) AS contrib
  FROM te_occ
), te_agg AS (
  SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_tokens,
         CAST(sum(contrib) AS BIGINT) AS entropy_q
  FROM te_typed GROUP BY id
)
SELECT i.id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.distinct_tokens, 0) AS distinct_tokens,
       COALESCE(a.entropy_q, 0) AS entropy_q,
       CASE WHEN COALESCE(a.n_tokens, 0) > 0
            THEN CAST(COALESCE(a.entropy_q, 0) AS DOUBLE)
                 / (CAST(a.n_tokens AS DOUBLE) * {q!r}) END AS entropy
FROM te_ids i LEFT JOIN te_agg a ON i.id = a.id
"""


# ---------------------------------------------------------------------------
# Unicode-script mix — the multilingual corpus audit: per-group character
# counts by Unicode script. lang_id (functions/text.py) classifies
# documents by token heuristics; this profiles the raw CHARACTER
# composition (mixed-script spam, mojibake, wrong-language contamination
# inside a source). Counts are exact integers; Java's \p{IsXxx} and
# RE2's \p{Xxx} script classes agree on these ten scripts (parity pinned
# by the oracle twin and tests).
# ---------------------------------------------------------------------------

_SCRIPTS = (
    "latin", "cyrillic", "greek", "arabic", "hebrew",
    "devanagari", "han", "hiragana", "katakana", "hangul",
)


def unicode_script_mix(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group script composition: ``(group, n_chars, latin, …, hangul,
    other, dominant_script)``. ``other`` = everything not in the ten
    script classes (digits, punctuation, whitespace, symbols);
    ``dominant_script`` = the max-count script, ties broken by the fixed
    class order. Entirely row-local (regexp_replace length deltas) + one
    partial-aggregable groupBy — zero joins, zero windows."""
    text = F.col(text_col)
    n = F.length(text)
    per = [
        (
            n - F.length(F.regexp_replace(text, f"\\p{{Is{s.capitalize()}}}", ""))
        ).cast("long").alias(s)
        for s in _SCRIPTS
    ]
    base = df.select(
        F.col(group_col).alias("group"),
        F.coalesce(n.cast("long"), F.lit(0)).alias("__n"),
        *per,  # null text -> null counts; coalesced at the agg below
    )
    agg = base.groupBy("group").agg(
        F.sum("__n").cast("long").alias("n_chars"),
        *[F.sum(F.coalesce(F.col(s), F.lit(0))).cast("long").alias(s) for s in _SCRIPTS],
    )
    # linear CASE over plain columns — NOT a running-best fold: wrapping
    # best/dominant per script doubles the expression tree per step
    # (2^10 when-branches) and overflows whole-stage codegen (caught by
    # tests/test_codegen_tripwire.py). First script in class order whose
    # count equals the max (and > 0) wins — same first-max semantics.
    best = F.greatest(*[F.col(s) for s in _SCRIPTS])
    dominant = F.lit("other")
    for s in reversed(_SCRIPTS):
        dominant = F.when(
            (F.col(s) > 0) & (F.col(s) == best), F.lit(s)
        ).otherwise(dominant)
    other = (F.col("n_chars") - sum(F.col(s) for s in _SCRIPTS)).cast("long")
    return agg.select(
        "group", "n_chars", *_SCRIPTS,
        other.alias("other"),
        dominant.alias("dominant_script"),
    )


def unicode_script_mix_sql(table: str, group_sql: str, text_sql: str) -> str:
    """DuckDB twin of :func:`unicode_script_mix` (RE2 ``\\p{Xxx}``)."""
    per = ", ".join(
        f"CAST(sum(coalesce(length({text_sql}) - length(regexp_replace("
        f"{text_sql}, '\\p{{{s.capitalize()}}}', '', 'g')), 0)) AS BIGINT) AS {s}"
        for s in _SCRIPTS
    )
    # same fixed-priority tie-break as the Spark fold (earlier wins ties)
    dom = "CASE "
    for i, s in enumerate(_SCRIPTS):
        later = _SCRIPTS[i + 1:]
        conds = [f"{s} > 0"] + [f"{s} >= {t}" for t in later] \
            + [f"{s} > {t}" for t in _SCRIPTS[:i]]
        dom += f"WHEN {' AND '.join(conds)} THEN '{s}' "
    dom += "ELSE 'other' END"
    total = " + ".join(_SCRIPTS)
    return f"""
WITH usm AS (
  SELECT {group_sql} AS "group",
         CAST(sum(coalesce(length({text_sql}), 0)) AS BIGINT) AS n_chars,
         {per}
  FROM {table} t
  GROUP BY 1
)
SELECT "group", n_chars, {', '.join(_SCRIPTS)},
       CAST(n_chars - ({total}) AS BIGINT) AS other,
       {dom} AS dominant_script
FROM usm
"""
