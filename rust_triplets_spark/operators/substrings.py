"""Cross-document exact substring deduplication — find and excise
duplicated n-gram SPANS, not just duplicated documents.

The Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") operation: two documents that are globally distinct can still
share a long verbatim passage (boilerplate, quoted text, licence blocks),
and training on the repeat both wastes compute and sharpens memorization.
The reference engine has no substring-level surface (its dedup is
record-identity — triplet dedup, src/sampler/mod.rs); this module is
north-star scope for the 100 TB curation pipeline, alongside
:mod:`rust_triplets_spark.operators.dedup` (document-level MinHash/SimHash)
and :mod:`rust_triplets_spark.operators.lines` (line-level C4 cleaning).

**Algorithm** (the distributed hash-window formulation of the suffix-array
method): slide a width-``n`` token window over every document and
fingerprint each window with the shared :func:`...dedup.
ngram_fingerprint_array_col` machinery, KEEPING the token position — one
``(id, pos, fp)`` row per window, all fixed-width integers. A fingerprint
seen in ≥ 2 distinct documents is a duplicated window; keep-first
semantics assign the window to its smallest document id and flag every
occurrence elsewhere. Per document, flagged windows that overlap or touch
(``pos - prev_pos <= n``) merge into MAXIMAL spans — the classic
gaps-and-islands rewrite, a per-document window function.

**Scale shape**: the gram frame is token-scale but every row is three
longs; it shuffles twice (once into the ``fp`` aggregate that finds
duplicated fingerprints, once into the gram⋈dup join — both partial-agg /
equi-join friendly, never all-pairs). The islands window partitions by
document id, so its state is bounded by the flagged-window count of one
document. Nothing collects; text never shuffles (the excise variant joins
the tiny span frame BACK to the corpus and edits row-locally). A true
suffix array finds arbitrary-length duplicates; the window formulation
finds duplicates ≥ n tokens at 1/n-th the suffix-array's memory and is
what production Spark pipelines actually run.

A fingerprint collision maps both engines to the same collision (same
hash), so the DuckDB twins match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    hash31_str_col,
    hash31_str_sql,
    polymix31_col,
    polymix31_sql,
)
from rust_triplets_spark.functions.text import tokens_col, tokens_sql

SPAN_N = 8  # window width in tokens; Lee et al. use 50 BPE tokens at web
# scale — 8 keeps the synthetic corpora's planted near-dup families
# detectable (their edit distance breaks longer runs) while random
# vocab-30 text stays clean (30^8 >> corpus windows)
SPAN_SEED = 2209


def positional_gram_structs_col(text_col, n: int, seed: int) -> Column:
    """Array of ``struct(pos, fp)`` — one element per width-``n`` token
    window of ``text_col``, ``pos`` 1-based. Row-local (no explode, no
    shuffle): the same 1-element-array lambda-let trick as
    :func:`...dedup.ngram_fingerprint_array_col` (see its docstring for
    why the naive formulations lose), plus the window's start position
    carried through. ``polymix31`` combiner — linear-size tree at any
    ``n``."""
    th_expr = F.transform(tokens_col(text_col), lambda t: hash31_str_col(t, seed))

    def pgrams(th):
        k = F.size(th) - (n - 1)
        gen = F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                polymix31_col([F.element_at(th, i + j) for j in range(n)], seed).alias("fp"),
            ),
        )
        return F.when(k > 0, gen).otherwise(
            F.array().cast("array<struct<pos:bigint,fp:bigint>>")
        )

    return F.flatten(F.transform(F.array(th_expr), pgrams))


def positional_gram_structs_sql(text_sql: str, n: int, seed: int) -> str:
    """DuckDB twin of :func:`positional_gram_structs_col`."""
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, t -> {hash31_str_sql('t', seed)})"
    mix = polymix31_sql([f"(__th)[i + {j}]" for j in range(n)], seed)
    gen = (
        f"list_transform(range(1, len(__th) - {n - 1} + 1), "
        f"i -> struct_pack(pos := CAST(i AS BIGINT), fp := {mix}))"
    )
    return f"flatten(list_transform([{th}], __th -> {gen}))"


def positional_grams(
    df: DataFrame, id_col: str, text_col: str, n: int = SPAN_N, seed: int = SPAN_SEED
) -> DataFrame:
    """``(id, pos, fp)`` exploded positional windows."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(positional_gram_structs_col(F.col(text_col), n, seed)).alias("__g"),
    ).select("id", F.col("__g.pos").alias("pos"), F.col("__g.fp").alias("fp"))


def _grams_cte(table: str, id_sql: str, text_sql: str, n: int, seed: int) -> str:
    g = positional_gram_structs_sql(text_sql, n, seed)
    return f"""
grams AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, u.g.pos AS pos, u.g.fp AS fp
  FROM {table} t, UNNEST({g}) AS u(g)
)"""


def duplicate_ngram_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SPAN_N,
    seed: int = SPAN_SEED,
) -> DataFrame:
    """Maximal duplicated token spans, keep-first.

    Returns ``(id, span_start, span_end, span_tokens, n_windows)`` — one
    row per maximal run of duplicated width-``n`` windows in a NON-keeper
    document (1-based inclusive token positions). A window is duplicated
    when its fingerprint occurs in ≥ 2 distinct documents; the occurrence
    in the smallest document id is the keeper and is never flagged
    (intra-keeper repeats of a cross-document window are also kept —
    intra-document repetition is :mod:`...operators.quality`'s signal,
    not this operator's).

    ``min(id) != max(id)`` detects "≥ 2 distinct documents" without a
    countDistinct — one partial-aggregable min/max pair per fingerprint.
    """
    from rust_triplets_spark.functions.caching import cache_scoped

    grams = cache_scoped(
        positional_grams(docs, id_col, text_col, n, seed),
        "substrings.positional_grams",
        eager=True,  # feeds the fp aggregate AND the flag join — a lazy
        # cache would re-run the token-scale explode for each
    )
    dup_fps = (
        grams.groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.max("id").alias("__max_id"))
        .filter(F.col("keep_id") != F.col("__max_id"))
        .select("fp", "keep_id")
    )
    flagged = (
        grams.join(dup_fps, "fp")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id", "pos")
    )
    w = Window.partitionBy("id").orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) <= F.lit(n), F.lit(0))
        .otherwise(F.lit(1))  # NULL lag (first row) lands here, like the twin's CASE
    )
    islands = flagged.withColumn(
        "__island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy("id", "__island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
        (F.max("pos") - F.min("pos") + F.lit(n)).cast("long").alias("span_tokens"),
        F.count("*").cast("long").alias("n_windows"),
    ).drop("__island")


def _spans_ctes(table: str, id_sql: str, text_sql: str, n: int, seed: int) -> str:
    """Shared CTE chain ``grams → dup → flagged → isl`` (islands keyed
    ``(id, island)``, ready for the span aggregate)."""
    return f"""{_grams_cte(table, id_sql, text_sql, n, seed)},
dup AS (
  SELECT fp, MIN(id) AS keep_id
  FROM grams GROUP BY fp
  HAVING MIN(id) <> MAX(id)
),
flagged AS (
  SELECT g.id, g.pos FROM grams g JOIN dup USING (fp) WHERE g.id <> dup.keep_id
),
brks AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) <= {n}
              THEN 0 ELSE 1 END AS brk
  FROM flagged
),
isl AS (
  SELECT id, pos,
         SUM(brk) OVER (PARTITION BY id ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS island
  FROM brks
)"""


def duplicate_ngram_spans_sql(
    table: str, id_sql: str, text_sql: str, n: int = SPAN_N, seed: int = SPAN_SEED
) -> str:
    """DuckDB twin of :func:`duplicate_ngram_spans`."""
    return f"""
WITH {_spans_ctes(table, id_sql, text_sql, n, seed)}
SELECT id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {n - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {n} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY id, island
"""


def excise_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SPAN_N,
    seed: int = SPAN_SEED,
) -> DataFrame:
    """Per-document substring-dedup report with the cleaned text.

    ``(id, total_tokens, dup_tokens, dup_token_frac, clean_text)`` for
    EVERY input document — ``clean_text`` is the document with all
    duplicated spans removed (tokens outside any span, space-joined;
    keepers and clean documents pass through verbatim up to whitespace
    normalization). The span frame is tiny relative to the corpus, so it
    aggregates to one ``array<struct>`` row per affected document and
    joins back; the excision itself is a row-local array filter — the
    corpus text never shuffles. ``dup_token_frac`` is one exact-integer
    division (IEEE-identical cross-engine)."""
    spans = duplicate_ngram_spans(docs, id_col, text_col, n, seed)
    per_doc = spans.groupBy("id").agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans"),
        F.sum("span_tokens").alias("__dup"),
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t")
    )
    joined = base.join(per_doc, "id", "left").select(
        "id",
        tokens_col(F.col("__t")).alias("__toks"),
        F.coalesce(
            "__spans", F.array().cast("array<struct<s:bigint,e:bigint>>")
        ).alias("__spans"),
        F.coalesce("__dup", F.lit(0)).cast("long").alias("dup_tokens"),
    )
    covered = lambda i: F.exists(  # noqa: E731 — bound per lambda below
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
    )
    clean = F.array_join(
        F.filter(
            F.transform(
                F.col("__toks"),
                lambda t, i: F.when(covered((i + 1).cast("long")), F.lit(None)).otherwise(t),
            ),
            lambda t: t.isNotNull(),
        ),
        " ",
    )
    return joined.select(
        "id",
        F.size("__toks").cast("long").alias("total_tokens"),
        "dup_tokens",
        F.when(
            F.size("__toks") > 0,
            F.col("dup_tokens").cast("double") / F.size("__toks").cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_token_frac"),
        # NULL text: coalesce to '' to match the twin (DuckDB's COALESCE
        # around array_to_string absorbs both the empty-list AND the
        # NULL-input case; Spark's array_join would propagate the NULL)
        F.coalesce(clean, F.lit("")).alias("clean_text"),
    )


def excise_duplicate_spans_sql(
    table: str, id_sql: str, text_sql: str, n: int = SPAN_N, seed: int = SPAN_SEED
) -> str:
    """DuckDB twin of :func:`excise_duplicate_spans`. DuckDB's indexed
    lambda (``(t, i) ->``, 1-based) mirrors Spark's 0-based one; the
    nested ``list_filter`` over the span list closes over the outer
    position — both engines evaluate the identical predicate."""
    toks = tokens_sql(text_sql)
    return f"""
WITH {_spans_ctes(table, id_sql, text_sql, n, seed)},
spans AS (
  SELECT id,
         MIN(pos) AS s,
         MAX(pos) + {n - 1} AS e,
         MAX(pos) - MIN(pos) + {n} AS span_tokens
  FROM isl GROUP BY id, island
),
per_doc AS (
  SELECT id,
         list(struct_pack(s := s, e := e)) AS sp,
         SUM(span_tokens) AS dup
  FROM spans GROUP BY id
),
base AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, {toks} AS toks FROM {table} t
)
SELECT b.id,
       CAST(len(b.toks) AS BIGINT) AS total_tokens,
       CAST(COALESCE(p.dup, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN len(b.toks) > 0
            THEN CAST(COALESCE(p.dup, 0) AS DOUBLE) / CAST(len(b.toks) AS DOUBLE)
            ELSE 0.0 END AS dup_token_frac,
       COALESCE(array_to_string(
         list_filter(
           b.toks,
           (t, i) -> len(list_filter(COALESCE(p.sp, []),
                                     x -> i >= x.s AND i <= x.e)) = 0
         ), ' '), '') AS clean_text  -- duckdb: array_to_string([]) is NULL; spark array_join([]) is ''
FROM base b LEFT JOIN per_doc p ON b.id = p.id
"""
