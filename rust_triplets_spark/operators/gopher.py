"""Gopher document-quality rules (Rae et al. 2021, Table A1 — public).

The canonical pretraining-corpus document filter, complementary to the
repetition family (:mod:`rust_triplets_spark.operators.quality` covers
Table A1's duplicate-line / top-n-gram half): per document,

- word count within ``[min_words, max_words]`` (Gopher: 50..100,000);
- mean word length within ``[min_mean_word_len, max_mean_word_len]``
  (3..10);
- symbol-to-word ratio (``#`` and ``...`` occurrences / words) ≤ 0.1;
- fraction of lines starting with a bullet (``•``/``-``/``*``) ≤ 0.9;
- fraction of lines ending with an ellipsis (``...``/``…``) ≤ 0.3;
- fraction of words containing ≥ 1 alphabetic character ≥ 0.8;
- ≥ 2 distinct hits from Gopher's 8-word stop list.

Output is the full signal frame plus the combined ``passes`` verdict —
pipelines filter on ``passes`` but audit on the signals.

Cross-engine exactness: every signal is one division of exact integer
counts (token counts, substring-occurrence counts via length-difference,
line counts), so the DOUBLE columns are single correctly-rounded IEEE
operations — bit-identical in the DuckDB twin. Scale shape: entirely
row-local column expressions over one corpus scan; no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col, tokens_sql

# Gopher Table A1 defaults
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MWL, MAX_MWL = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MIN_ALPHA_FRAC = 0.8
MIN_STOP_HITS = 2
STOP_LIST = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLETS = ("•", "-", "*")


def _occurrences(text, needle: str):
    """Exact substring-occurrence count via length difference — identical
    arithmetic in both engines, no regex semantics to align."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _occurrences_sql(text: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({text}) - length(replace({text}, '{esc}', ''))) "
        f"// {len(needle)} AS BIGINT)"
    )


def gopher_signal_cols(text) -> list:
    """The seven aliased per-document signal columns (row-local, no id) —
    shared by :func:`gopher_quality_signals` and the streaming ingest
    funnel, which needs the signals INLINE on a streaming frame (a join
    back by id would be a stream-stream join)."""
    toks = tokens_col(text)
    n_words = F.size(toks).cast("long")
    char_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    symbols = _occurrences(text, "#") + _occurrences(text, "...")
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, 1, 1).isin(*BULLETS),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    ).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOP_LIST])
    stop_hits = F.size(
        F.filter(stop_arr, lambda w: F.array_contains(
            F.transform(toks, lambda t: F.lower(t)), w
        ))
    ).cast("long")

    return [
        n_words.alias("n_words"),
        F.when(n_words > 0, char_sum.cast("double") / n_words.cast("double"))
        .alias("mean_word_len"),
        F.when(n_words > 0, symbols.cast("double") / n_words.cast("double"))
        .alias("symbol_word_ratio"),
        F.when(n_lines > 0, bullet_lines.cast("double") / n_lines.cast("double"))
        .otherwise(F.lit(0.0)).alias("bullet_line_frac"),
        F.when(n_lines > 0, ellipsis_lines.cast("double") / n_lines.cast("double"))
        .otherwise(F.lit(0.0)).alias("ellipsis_line_frac"),
        F.when(n_words > 0, alpha_words.cast("double") / n_words.cast("double"))
        .alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    ]


def gopher_pass_col(
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_stop_hits: int = MIN_STOP_HITS,
):
    """The pass predicate over the NAMED signal columns (null-safe: a
    zero-word doc has null ratios → coalesced to false)."""
    passes = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= MIN_MWL) & (F.col("mean_word_len") <= MAX_MWL)
        & (F.col("symbol_word_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") <= MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return F.coalesce(passes, F.lit(False))


def gopher_quality_signals(
    df: DataFrame, id_col: str, text_col: str,
    min_words: int = MIN_WORDS, max_words: int = MAX_WORDS,
) -> DataFrame:
    """Per-document Gopher signal frame: ``(id, n_words, mean_word_len,
    symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, stop_hits, passes)``. Documents with zero words get
    null ratio signals and ``passes = false``."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        *gopher_signal_cols(F.col(text_col)),
    )
    return base.withColumn(
        "passes", gopher_pass_col(min_words, max_words)
    )


def gopher_quality_signals_sql(
    table: str, id_sql: str, text_sql: str,
    min_words: int = MIN_WORDS, max_words: int = MAX_WORDS,
) -> str:
    """DuckDB twin of :func:`gopher_quality_signals` — same integer
    counts, same single-division doubles, same verdict expression."""
    toks = tokens_sql(text_sql)
    symbols = (
        f"({_occurrences_sql(text_sql, '#')} + {_occurrences_sql(text_sql, '...')})"
    )
    lines = (
        f"list_filter(list_transform(string_split({text_sql}, chr(10)), "
        f"l -> trim(l)), l -> length(l) > 0)"
    )
    bullets_sql = ", ".join(f"'{b}'" for b in BULLETS)
    stops_sql = ", ".join(f"'{w}'" for w in STOP_LIST)
    return f"""
WITH g_base AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST(len({toks}) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform({toks}, t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS char_sum,
         {symbols} AS symbols,
         CAST(len({lines}) AS BIGINT) AS n_lines,
         CAST(len(list_filter({lines}, l -> list_contains([{bullets_sql}], substring(l, 1, 1)))) AS BIGINT) AS bullet_lines,
         CAST(len(list_filter({lines}, l -> l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS ellipsis_lines,
         CAST(len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
         CAST(len(list_filter([{stops_sql}], w -> list_contains(list_transform({toks}, t -> lower(t)), w))) AS BIGINT) AS stop_hits
  FROM {table}
), g_sig AS (
  SELECT id, n_words,
         CASE WHEN n_words > 0 THEN CAST(char_sum AS DOUBLE) / CAST(n_words AS DOUBLE) END AS mean_word_len,
         CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / CAST(n_words AS DOUBLE) END AS symbol_word_ratio,
         CASE WHEN n_lines > 0 THEN CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN n_lines > 0 THEN CAST(ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS ellipsis_line_frac,
         CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) END AS alpha_word_frac,
         stop_hits
  FROM g_base
)
SELECT id, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
       ellipsis_line_frac, alpha_word_frac, stop_hits,
       COALESCE(
         n_words >= {min_words} AND n_words <= {max_words}
         AND mean_word_len >= {MIN_MWL!r} AND mean_word_len <= {MAX_MWL!r}
         AND symbol_word_ratio <= {MAX_SYMBOL_RATIO!r}
         AND bullet_line_frac <= {MAX_BULLET_FRAC!r}
         AND ellipsis_line_frac <= {MAX_ELLIPSIS_FRAC!r}
         AND alpha_word_frac >= {MIN_ALPHA_FRAC!r}
         AND stop_hits >= {MIN_STOP_HITS}, false) AS passes
FROM g_sig
"""
