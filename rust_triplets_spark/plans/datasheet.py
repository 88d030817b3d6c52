"""Corpus datasheet — the one-query corpus card (Gebru et al. 2021,
"Datasheets for Datasets"): size, composition, token mass, duplication
rate, quality pass rate, as ONE tall (metric, value) frame a release
process can diff between corpus versions. Every metric reuses an
already-oracle-checked primitive (token counts, the exact-dedup
fingerprint, the Gopher gate); what this query pins is the REPORT —
the artifact a data release actually ships.

Scale shape: three aggregates over one corpus scan lineage (a row-local
stats pass, the fingerprint distinct, the Gopher verdict aggregate),
each collapsing to O(1) rows before the union. Values are DOUBLE for a
uniform schema; every count is exact (integer-valued doubles are exact
to 2^53 — a 25T-token corpus sits at ~4e13)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_col, hash31_str_sql
from rust_triplets_spark.functions.text import (
    normalize_inline_whitespace_col,
    normalize_inline_whitespace_sql,
    token_count_col,
    token_count_sql,
)
from rust_triplets_spark.operators.gopher import gopher_quality_signals


def corpus_datasheet(
    df: DataFrame, id_col: str, text_col: str, source_col: str, lang_col: str
) -> DataFrame:
    """``(metric, value)`` corpus card: n_docs, n_sources, n_langs,
    total_tokens, total_chars, mean_doc_tokens, empty_doc_frac,
    exact_dup_frac (1 − distinct fingerprints / docs), gopher_pass_frac."""
    norm = normalize_inline_whitespace_col(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        token_count_col(F.col(text_col)).alias("__tok"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        F.col(source_col).alias("__src"),
        F.col(lang_col).alias("__lang"),
        # null text -> sentinel fingerprint: countDistinct skips all-null
        # tuples while DuckDB's count(DISTINCT (fh, fl)) counts the
        # (NULL, NULL) struct row; the coalesce makes both engines count
        # null-text rows as exactly one shared fingerprint.
        F.coalesce(hash31_str_col(norm), F.lit(-2147483648).cast("long")).alias("__fh"),
        F.coalesce(F.length(norm).cast("long"), F.lit(-1).cast("long")).alias("__fl"),
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.countDistinct("__src").cast("double").alias("n_sources"),
        F.countDistinct("__lang").cast("double").alias("n_langs"),
        F.sum("__tok").cast("double").alias("total_tokens"),
        F.sum("__chars").cast("double").alias("total_chars"),
        (F.sum("__tok").cast("double") / F.count("*").cast("double")).alias("mean_doc_tokens"),
        (
            F.sum(F.when(F.col("__tok") == 0, 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("empty_doc_frac"),
        (
            F.lit(1.0)
            - F.countDistinct("__fh", "__fl").cast("double") / F.count("*").cast("double")
        ).alias("exact_dup_frac"),
    )
    gq = gopher_quality_signals(df, id_col, text_col).agg(
        (
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("gopher_pass_frac")
    )
    tall = stats.crossJoin(F.broadcast(gq))
    metrics = [
        "n_docs", "n_sources", "n_langs", "total_tokens", "total_chars",
        "mean_doc_tokens", "empty_doc_frac", "exact_dup_frac",
        "gopher_pass_frac",
    ]
    pairs = F.array(*[
        F.struct(F.lit(m).alias("metric"), F.col(m).alias("value")) for m in metrics
    ])
    return tall.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.metric").alias("metric"), F.col("__p.value").alias("value")
    )


def corpus_datasheet_sql(
    table: str, id_sql: str, text_sql: str, source_sql: str, lang_sql: str
) -> str:
    """DuckDB twin of :func:`corpus_datasheet`."""
    from rust_triplets_spark.operators.gopher import gopher_quality_signals_sql

    norm = normalize_inline_whitespace_sql(text_sql)
    tc = token_count_sql(text_sql)
    gq = gopher_quality_signals_sql(table, id_sql, text_sql)
    return f"""
WITH ds_base AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST({tc} AS BIGINT) AS tok,
         CAST(length({text_sql}) AS BIGINT) AS chars,
         {source_sql} AS src,
         {lang_sql} AS lang,
         coalesce({hash31_str_sql(norm)}, -2147483648) AS fh,
         coalesce(length({norm}), -1) AS fl
  FROM {table} t
),
ds_stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(count(DISTINCT src) AS DOUBLE) AS n_sources,
         CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
         CAST(sum(tok) AS DOUBLE) AS total_tokens,
         CAST(sum(chars) AS DOUBLE) AS total_chars,
         CAST(sum(tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_doc_tokens,
         CAST(sum(CASE WHEN tok = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS empty_doc_frac,
         1.0 - CAST(count(DISTINCT (fh, fl)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS exact_dup_frac
  FROM ds_base
),
ds_gq AS (
  SELECT CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS gopher_pass_frac
  FROM ({gq})
)
SELECT u.p.m AS metric, u.p.v AS value
FROM ds_stats s CROSS JOIN ds_gq g,
     UNNEST([
       struct_pack(m := 'n_docs', v := s.n_docs),
       struct_pack(m := 'n_sources', v := s.n_sources),
       struct_pack(m := 'n_langs', v := s.n_langs),
       struct_pack(m := 'total_tokens', v := s.total_tokens),
       struct_pack(m := 'total_chars', v := s.total_chars),
       struct_pack(m := 'mean_doc_tokens', v := s.mean_doc_tokens),
       struct_pack(m := 'empty_doc_frac', v := s.empty_doc_frac),
       struct_pack(m := 'exact_dup_frac', v := s.exact_dup_frac),
       struct_pack(m := 'gopher_pass_frac', v := g.gopher_pass_frac)
     ]) AS u(p)
"""


def source_datasheet(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Per-source slice of the corpus card: ``(source, n_docs,
    total_tokens, mean_doc_tokens, empty_doc_frac, exact_dup_frac,
    gopher_pass_frac)`` — the table a release audit reads first (which
    source brought the duplicates? whose quality gate is failing?).
    ``exact_dup_frac`` counts duplicates WITHIN the source (cross-source
    duplication is `corpus_datasheet`'s global number and the dedup
    family's job). One partial-agg groupBy over the same row-local stats
    plus one gopher-verdict join — two corpus scans of one lineage, each
    collapsing to n_sources rows."""
    norm = normalize_inline_whitespace_col(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(source_col).alias("source"),
        token_count_col(F.col(text_col)).alias("__tok"),
        # null text -> sentinel fingerprint: countDistinct skips all-null
        # tuples while DuckDB's count(DISTINCT (fh, fl)) counts the
        # (NULL, NULL) struct row; the coalesce makes both engines count
        # null-text rows as exactly one shared fingerprint.
        F.coalesce(hash31_str_col(norm), F.lit(-2147483648).cast("long")).alias("__fh"),
        F.coalesce(F.length(norm).cast("long"), F.lit(-1).cast("long")).alias("__fl"),
    )
    stats = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("total_tokens"),
        (F.sum("__tok").cast("double") / F.count("*").cast("double")).alias("mean_doc_tokens"),
        (
            F.sum(F.when(F.col("__tok") == 0, 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("empty_doc_frac"),
        (
            F.lit(1.0)
            - F.countDistinct("__fh", "__fl").cast("double") / F.count("*").cast("double")
        ).alias("exact_dup_frac"),
    )
    gq = (
        gopher_quality_signals(df, id_col, text_col)
        .join(base.select("id", "source"), "id")
        .groupBy("source")
        .agg(
            (
                F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ).alias("gopher_pass_frac")
        )
    )
    return stats.join(gq, "source")


def source_datasheet_sql(
    table: str, id_sql: str, text_sql: str, source_sql: str
) -> str:
    """DuckDB twin of :func:`source_datasheet`."""
    from rust_triplets_spark.operators.gopher import gopher_quality_signals_sql

    norm = normalize_inline_whitespace_sql(text_sql)
    tc = token_count_sql(text_sql)
    gq = gopher_quality_signals_sql(table, id_sql, text_sql)
    return f"""
WITH sd_base AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         {source_sql} AS source,
         CAST({tc} AS BIGINT) AS tok,
         coalesce({hash31_str_sql(norm)}, -2147483648) AS fh,
         coalesce(length({norm}), -1) AS fl
  FROM {table} t
),
sd_stats AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS total_tokens,
         CAST(sum(tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_doc_tokens,
         CAST(sum(CASE WHEN tok = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS empty_doc_frac,
         1.0 - CAST(count(DISTINCT (fh, fl)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS exact_dup_frac
  FROM sd_base GROUP BY source
),
sd_gq AS (
  SELECT b.source,
         CAST(sum(CASE WHEN g.passes THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS gopher_pass_frac
  FROM ({gq}) g JOIN sd_base b ON g.id = b.id
  GROUP BY b.source
)
SELECT s.source, s.n_docs, s.total_tokens, s.mean_doc_tokens,
       s.empty_doc_frac, s.exact_dup_frac, g.gopher_pass_frac
FROM sd_stats s JOIN sd_gq g ON s.source = g.source
"""
