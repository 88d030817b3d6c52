"""T5-style span corruption — the pretraining-sample generator (Raffel
et al. 2020 §3.1.4; the UL2 R-denoiser): mask ~15% of tokens in short
contiguous spans, replace each span with a numbered sentinel in the
INPUT, and emit the spans behind their sentinels as the TARGET. This is
the op that turns a cleaned corpus into actual seq2seq training rows —
the step downstream of everything else in this repo's funnel.

Deterministic span placement: token positions partition into fixed
blocks of ``block_len``; block b of document d masks iff
``mix31(d, b) % rate == 0`` (expected mask fraction 1/rate; adjacent
masked blocks merge into longer spans naturally, giving the span-length
mixture T5's mean-3 noise profile approximates). Every decision is the
shared 31-bit hash — no RNG state, resumable, and identical in both
engines.

Assembly is ONE row-local fold over token positions (no shuffle, no
explode — the document never leaves its row): the accumulator carries
(input, target, in-span flag, span count); sentinels are ``<extra_id_K>``
in first-appearance order and the target closes with the final
sentinel, per the T5 convention. Spark folds with a native struct
accumulator; the DuckDB twin folds the SAME logic with the state
encoded as a chr(30)-delimited string (list_reduce's accumulator must
match the element type — the bpe.py delimited-state precedent, with the
same caveat: a token containing chr(30) would mis-split identically in
both engines).

Scale shape at 100 TB: embarrassingly parallel — one projection, zero
shuffles; the only aggregate anywhere is the caller's own sink."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import mix31_col, mix31_sql
from rust_triplets_spark.functions.text import tokens_col, tokens_sql

CORRUPT_SEED = 13_000_027
CORRUPT_BLOCK = 3   # block length: masked runs come in multiples of 3
CORRUPT_RATE = 6    # block mask probability 1/6 -> ~17% of tokens


_D = "\x1e"  # state delimiter (DuckDB twin); not in the pinned WS class
_D_SQL = "chr(30)"


def _mask_col(doc_id: Column, i: Column, seed: int, block: int, rate: int) -> Column:
    return (
        mix31_col([doc_id, ((i - 1) / block).cast("long")], seed) % rate == 0
    )


def span_corruption_samples(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = CORRUPT_SEED,
    block_len: int = CORRUPT_BLOCK,
    rate: int = CORRUPT_RATE,
) -> DataFrame:
    """``(doc_id, n_tokens, n_masked, n_spans, input_text, target_text)``
    — one seq2seq training row per document, deterministic under
    (seed, block_len, rate)."""
    if block_len < 1 or rate < 2:
        raise ValueError(f"corruption: bad block_len={block_len}/rate={rate}")
    doc_id = F.col(id_col).cast("long")
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    mask = F.transform(
        idx, lambda i: _mask_col(doc_id, i.cast("long"), seed, block_len, rate)
    )
    base = df.select(
        doc_id.alias("doc_id"),
        toks.alias("tk"),
        mask.alias("mk"),
        idx.alias("ix"),
    )
    init = F.struct(
        F.lit("").alias("inp"),
        F.lit("").alias("tgt"),
        F.lit(False).alias("prev"),
        F.lit(0).alias("k"),
    )

    def step(acc: Column, i: Column) -> Column:
        tok = F.element_at(F.col("tk"), i)
        m = F.element_at(F.col("mk"), i)
        sentinel = F.concat(
            F.lit(" <extra_id_"), acc["k"].cast("string"), F.lit(">")
        )
        inp = (
            F.when(~m, F.concat(acc["inp"], F.lit(" "), tok))
            .when(acc["prev"], acc["inp"])
            .otherwise(F.concat(acc["inp"], sentinel))
        )
        tgt = (
            F.when(~m, acc["tgt"])
            .when(acc["prev"], F.concat(acc["tgt"], F.lit(" "), tok))
            .otherwise(F.concat(acc["tgt"], sentinel, F.lit(" "), tok))
        )
        k = F.when(m & ~acc["prev"], acc["k"] + 1).otherwise(acc["k"])
        return F.struct(
            inp.alias("inp"), tgt.alias("tgt"), m.alias("prev"), k.alias("k")
        )

    folded = F.aggregate(F.col("ix"), init, step)
    closing = F.concat(
        F.lit(" <extra_id_"), folded["k"].cast("string"), F.lit(">")
    )
    return base.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("mk"), lambda m: m)).cast("long").alias("n_masked"),
        folded["k"].cast("long").alias("n_spans"),
        F.ltrim(folded["inp"]).alias("input_text"),
        F.ltrim(F.concat(folded["tgt"], closing)).alias("target_text"),
    ).orderBy("doc_id")


def span_corruption_samples_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    seed: int = CORRUPT_SEED,
    block_len: int = CORRUPT_BLOCK,
    rate: int = CORRUPT_RATE,
) -> str:
    """DuckDB twin of :func:`span_corruption_samples` — the same fold
    with the accumulator as a chr(30)-delimited state string
    (inp, tgt, prev, k)."""
    if block_len < 1 or rate < 2:
        raise ValueError(f"corruption: bad block_len={block_len}/rate={rate}")
    toks = tokens_sql(text_sql)
    mixed = mix31_sql(
        ["did", f"(CAST(x AS BIGINT) - 1) // {block_len}"], seed
    )
    # state parts: [1]=inp [2]=tgt [3]=prev [4]=k
    p = f"string_split(acc, {_D_SQL})"
    tok = "tk[CAST(x AS BIGINT)]"
    m = f"({mixed} % {rate} = 0)"
    sentinel = f"' <extra_id_' || {p}[4] || '>'"
    new_inp = (
        f"CASE WHEN NOT {m} THEN {p}[1] || ' ' || {tok} "
        f"WHEN {p}[3] = '1' THEN {p}[1] "
        f"ELSE {p}[1] || {sentinel} END"
    )
    new_tgt = (
        f"CASE WHEN NOT {m} THEN {p}[2] "
        f"WHEN {p}[3] = '1' THEN {p}[2] || ' ' || {tok} "
        f"ELSE {p}[2] || {sentinel} || ' ' || {tok} END"
    )
    new_prev = f"CASE WHEN {m} THEN '1' ELSE '0' END"
    new_k = (
        f"CASE WHEN {m} AND {p}[3] <> '1' "
        f"THEN CAST(CAST({p}[4] AS BIGINT) + 1 AS VARCHAR) ELSE {p}[4] END"
    )
    step = (
        f"({new_inp}) || {_D_SQL} || ({new_tgt}) || {_D_SQL} "
        f"|| ({new_prev}) || {_D_SQL} || ({new_k})"
    )
    init = f"{_D_SQL} || {_D_SQL} || '0' || {_D_SQL} || '0'"
    return f"""
WITH sc_base AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS did, {toks} AS tk
  FROM {table} t
), sc_folded AS (
  SELECT did, tk,
         list_reduce(
           list_prepend({init},
             list_transform(range(1, len(tk) + 1), i -> CAST(i AS VARCHAR))),
           (acc, x) -> {step}
         ) AS st,
         len(list_filter(range(1, len(tk) + 1), x -> {m})) AS n_masked
  FROM sc_base
)
SELECT did AS doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(n_masked AS BIGINT) AS n_masked,
       CAST(string_split(st, {_D_SQL})[4] AS BIGINT) AS n_spans,
       ltrim(string_split(st, {_D_SQL})[1]) AS input_text,
       ltrim(string_split(st, {_D_SQL})[2]
             || ' <extra_id_' || string_split(st, {_D_SQL})[4] || '>')
         AS target_text
FROM sc_folded
ORDER BY doc_id
"""
