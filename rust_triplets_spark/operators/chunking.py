"""Sliding-window chunking — the reference's "explode" operator (SURVEY §2.4).

Semantics mirror ``SlidingWindowChunker::materialize``
(reference ``src/chunking/sliding_window.rs:10-117``):

- tokens = whitespace split; empty section ⇒ no chunks;
- ``span = min(max_window_tokens, n)``;
- whole section fits (``span == n``) ⇒ ONE window chunk (index 0, overlap 0)
  whose text is the ORIGINAL text (not re-joined tokens);
- else, for each configured overlap: ``stride = max(1, span - overlap)``,
  windows start at ``0, stride, 2*stride, …``; the LAST window may be short
  (``end = min(start+span, n)``), loop stops when ``end == n``
  ⇒ ``n_windows = ceil((n - span) / stride) + 1``;
- plus one head ``SummaryFallback`` chunk (``cap = max(1, min(fallback,
  window))`` tokens, configured weight) when the section exceeds the window.

Spark shape: pure ``posexplode(sequence(...))`` + ``slice`` + ``array_join``
— fully native, whole-stage-codegen'd, no UDF, no shuffle. One input row
fans out to its windows inside the same task, so this scales linearly with
corpus bytes (the reference recomputes chunks on every access,
``src/sampler/mod.rs:1765-1773``; here the chunks DataFrame is materialized
once per config and can be cached/written — a strict improvement).

Chunk identity (``chunk_key``, src/sampler/mod.rs:3080-3089):
``{record}|{section}|w|{index}`` for windows, ``{record}|{section}|s|head``
for summary chunks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col


@dataclass(frozen=True)
class ChunkingStrategy:
    """Defaults mirror the reference (src/config.rs:60-71)."""

    max_window_tokens: int = 1024
    overlap_tokens: tuple[int, ...] = (64,)
    summary_fallback_tokens: int = 512
    summary_fallback_weight: float = 0.35
    chunk_weight_floor: float = 0.1


def window_index_proximity_col(index) -> Column:
    """``1 / (index + 1)`` head-proximity base weight (src/metrics.rs:125-133)."""
    idx = F.col(index) if isinstance(index, str) else index
    return F.lit(1.0) / (idx.cast("double") + F.lit(1.0))


def chunk_weight_col(view_kind, win_index, trust, summary_weight: float, floor: float) -> Column:
    """``max(floor, base * clamp(trust, 0, 1))`` (src/sampler/mod.rs:106-122);
    base = head proximity for windows, configured weight for summary chunks."""
    vk = F.col(view_kind) if isinstance(view_kind, str) else view_kind
    tr = F.col(trust) if isinstance(trust, str) else trust
    base = F.when(vk == "window", window_index_proximity_col(win_index)).otherwise(
        F.lit(float(summary_weight))
    )
    clamped = F.greatest(F.lit(0.0), F.least(tr.cast("double"), F.lit(1.0)))
    return F.greatest(base * clamped, F.lit(float(floor)))


def chunk_sections(
    sections: DataFrame,
    strategy: ChunkingStrategy = ChunkingStrategy(),
    text_col: str = "text",
    carry_cols: tuple[str, ...] = ("record_id", "section_idx"),
    key_cols: tuple[str, ...] = ("record_id", "section_idx"),
) -> DataFrame:
    """Explode a sections DataFrame into chunks.

    Output: ``carry_cols…, view_kind ('window'|'summary'), win_index,
    overlap, span, chunk_text, tokens_estimate, chunk_key`` (identity built
    from ``key_cols``, src/sampler/mod.rs:3080-3089).
    """
    toks = tokens_col(text_col)
    n = F.size(toks).cast("long")
    span = F.least(F.lit(strategy.max_window_tokens).cast("long"), n)
    carry = [F.col(c) for c in carry_cols]

    base = sections.select(
        *carry,
        F.col(text_col).alias("__text"),
        toks.alias("__toks"),
        n.alias("__n"),
        span.alias("__span"),
    ).where(F.col("__n") > 0)

    # Case 1: whole section fits — one window, original text preserved.
    single = base.where(F.col("__n") <= F.lit(strategy.max_window_tokens)).select(
        *carry,
        F.lit("window").alias("view_kind"),
        F.lit(0).cast("long").alias("win_index"),
        F.lit(0).cast("long").alias("overlap"),
        F.col("__span").alias("span"),
        F.col("__text").alias("chunk_text"),
        F.col("__n").alias("tokens_estimate"),
    )

    # Case 2: sliding windows per configured overlap.
    long_rows = base.where(F.col("__n") > F.lit(strategy.max_window_tokens))
    window_parts = []
    for ov in strategy.overlap_tokens:
        stride = max(1, strategy.max_window_tokens - ov)
        n_win = F.floor((F.col("__n") - F.col("__span") + F.lit(stride) - 1) / F.lit(stride)) + 1
        part = (
            long_rows.select(
                *carry,
                F.col("__toks"),
                F.col("__n"),
                F.col("__span"),
                F.explode(F.sequence(F.lit(0).cast("long"), n_win - 1)).alias("win_index"),
            )
            .select(
                *carry,
                F.lit("window").alias("view_kind"),
                F.col("win_index"),
                F.lit(ov).cast("long").alias("overlap"),
                F.col("__span").alias("span"),
                F.array_join(
                    F.slice(
                        F.col("__toks"),
                        (F.col("win_index") * F.lit(stride) + 1).cast("int"),
                        F.least(
                            F.col("__span"), F.col("__n") - F.col("win_index") * F.lit(stride)
                        ).cast("int"),
                    ),
                    " ",
                ).alias("chunk_text"),
                F.least(
                    F.col("__span"), F.col("__n") - F.col("win_index") * F.lit(stride)
                ).alias("tokens_estimate"),
            )
        )
        window_parts.append(part)

    parts = [single, *window_parts]

    # Summary fallback: head slice when section exceeds the window.
    if strategy.summary_fallback_tokens > 0:
        cap = max(1, min(strategy.summary_fallback_tokens, strategy.max_window_tokens))
        summary = long_rows.select(
            *carry,
            F.lit("summary").alias("view_kind"),
            F.lit(None).cast("long").alias("win_index"),
            F.lit(None).cast("long").alias("overlap"),
            F.col("__span").alias("span"),
            F.array_join(F.slice(F.col("__toks"), 1, cap), " ").alias("chunk_text"),
            F.least(F.lit(cap).cast("long"), F.col("__n")).alias("tokens_estimate"),
        )
        parts.append(summary)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    key = F.concat_ws(
        "|",
        *[F.col(c).cast("string") for c in key_cols],
        F.when(F.col("view_kind") == "window", F.concat(F.lit("w|"), F.col("win_index")))
        .otherwise(F.lit("s|head")),
    )
    return out.withColumn("chunk_key", key)


def chunk_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    strategy: ChunkingStrategy,
    extra_cols: dict[str, str] | None = None,
    where: str = "TRUE",
    section_key_sql: str = "'0'",
) -> str:
    """DuckDB twin of :func:`chunk_sections` for a single-section-per-row
    table (record_id from ``id_sql``; the chunk key's section part defaults
    to the literal 0 — pass ``section_key_sql`` (evaluated against the
    chunk rows, so name a passthrough ``extra_cols`` alias) for
    multi-section inputs). Emits columns: ``record_id, view_kind,
    win_index, overlap, span, chunk_text, tokens_estimate, chunk_key``
    (+ ``extra_cols`` {alias: expr} passthrough columns, evaluated once
    against ``table``)."""
    from rust_triplets_spark.functions.text import tokens_sql

    w = strategy.max_window_tokens
    extra_cols = extra_cols or {}
    base_extra = "".join(f", {expr} AS {alias}" for alias, expr in extra_cols.items())
    extra = "".join(f", {alias}" for alias in extra_cols)
    parts = []
    base = (
        f"SELECT {id_sql} AS record_id, {text_sql} AS __text, {tokens_sql(text_sql)} AS __toks{base_extra} "
        f"FROM {table} WHERE ({where}) AND len({tokens_sql(text_sql)}) > 0"
    )
    single = (
        f"SELECT record_id, 'window' AS view_kind, CAST(0 AS BIGINT) AS win_index, "
        f"CAST(0 AS BIGINT) AS overlap, CAST(len(__toks) AS BIGINT) AS span, "
        f"__text AS chunk_text, CAST(len(__toks) AS BIGINT) AS tokens_estimate{extra} "
        f"FROM __base WHERE len(__toks) <= {w}"
    )
    parts.append(single)
    for ov in strategy.overlap_tokens:
        stride = max(1, w - ov)
        parts.append(
            f"SELECT record_id, 'window' AS view_kind, CAST(i AS BIGINT) AS win_index, "
            f"CAST({ov} AS BIGINT) AS overlap, CAST({w} AS BIGINT) AS span, "
            f"array_to_string(list_slice(__toks, i * {stride} + 1, "
            f"i * {stride} + least({w}, len(__toks) - i * {stride})), ' ') AS chunk_text, "
            f"CAST(least({w}, len(__toks) - i * {stride}) AS BIGINT) AS tokens_estimate{extra} "
            f"FROM __base, UNNEST(range(0, CAST(ceil((len(__toks) - {w}) / {stride}.0) AS BIGINT) + 1)) AS t(i) "
            f"WHERE len(__toks) > {w}"
        )
    if strategy.summary_fallback_tokens > 0:
        cap = max(1, min(strategy.summary_fallback_tokens, w))
        parts.append(
            f"SELECT record_id, 'summary' AS view_kind, CAST(NULL AS BIGINT) AS win_index, "
            f"CAST(NULL AS BIGINT) AS overlap, CAST({w} AS BIGINT) AS span, "
            f"array_to_string(list_slice(__toks, 1, {cap}), ' ') AS chunk_text, "
            f"CAST(least({cap}, len(__toks)) AS BIGINT) AS tokens_estimate{extra} "
            f"FROM __base WHERE len(__toks) > {w}"
        )
    union = " UNION ALL ".join(f"({p})" for p in parts)
    return (
        f"WITH __base AS MATERIALIZED ({base}), __chunks AS MATERIALIZED ({union}) "
        f"SELECT *, concat_ws('|', CAST(record_id AS VARCHAR), {section_key_sql}, "
        f"CASE WHEN view_kind = 'window' THEN 'w|' || CAST(win_index AS VARCHAR) ELSE 's|head' END) AS chunk_key "
        f"FROM __chunks"
    )
