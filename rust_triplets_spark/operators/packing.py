"""Deterministic sequence packing — concatenate-and-cut token binning for
training-batch construction.

A 100 TB pretraining pipeline doesn't feed documents to the trainer one at
a time: it packs them back-to-back into fixed token budgets (context
windows) so no step wastes padding. This operator implements the standard
*concatenation packing* scheme (GPT-style: order the corpus
deterministically, lay documents end-to-end, cut every ``budget`` tokens):

- documents are ordered per source by the same seeded-hash epoch order the
  sampler uses (``functions/hashing.py``; the reference derives every order
  from seeded hashes, ``src/epoch.rs:292-299``), so the packing is a pure
  function of ``(seed, corpus)`` and resumable from ``(seed, step)``;
- each document's start offset is the exclusive running sum of token
  counts in that order; its bin is ``start div budget``;
- a document whose span crosses a bin boundary is flagged — the trainer
  side splits it across contexts (attention-mask reset), exactly the
  cut-at-boundary contract.

Scale shape: the rank + running sum run through
:func:`~rust_triplets_spark.functions.ordering.bucketed_rank_prefix_sum`
(range-bucketed, (sources × 1024)-way parallel — never one sort task per
source), token counts are native column expressions, and nothing shuffles
more than ``(id, source, 3 longs)`` rows. The DuckDB oracle twin keeps the
plain two-window form, which is provably the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_col, hash31_sql
from rust_triplets_spark.functions.ordering import bucketed_rank_prefix_sum
from rust_triplets_spark.functions.text import token_count_col, token_count_sql

PACK_SEED = 1009


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    budget: int,
    seed: int = PACK_SEED,
) -> DataFrame:
    """Assign every non-empty document a deterministic pack position.

    Returns one row per document with ``(id, source, n_tok, seq_idx,
    start_tok, bin_id, crosses)``: ``seq_idx`` is the document's 0-based
    position in its source's packing order, ``start_tok`` its token offset
    in the concatenated stream, ``bin_id = start_tok div budget`` the
    context-window index where it begins, and ``crosses`` whether it spans
    a window boundary (trainer must split it).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    items = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(source_col).alias("source"),
        token_count_col(text_col).cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    keyed = items.withColumn("__key", hash31_col("id", seed))
    packed = bucketed_rank_prefix_sum(
        keyed,
        "__key",
        "n_tok",
        tiebreak=["id"],
        part_cols=["source"],
        pos_col="seq_idx",
        prefix_col="start_tok",
    ).drop("__key")
    bin_id = F.expr(f"start_tok div {int(budget)}")
    last_bin = F.expr(f"(start_tok + n_tok - 1) div {int(budget)}")
    return packed.select(
        "id",
        "source",
        "n_tok",
        "seq_idx",
        "start_tok",
        bin_id.cast("long").alias("bin_id"),
        (last_bin > bin_id).alias("crosses"),
    )


def pack_sequences_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    budget: int,
    seed: int = PACK_SEED,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (plain window form)."""
    n_tok = token_count_sql(text_sql)
    key = hash31_sql(f"CAST({id_sql} AS BIGINT)", seed)
    return f"""
WITH items AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, {source_sql} AS source,
         CAST({n_tok} AS BIGINT) AS n_tok, {key} AS k
  FROM {table}
  WHERE {n_tok} > 0
), ordered AS (
  SELECT id, source, n_tok,
         row_number() OVER (PARTITION BY source ORDER BY k, id) - 1 AS seq_idx,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY k, id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM items
)
SELECT id, source, n_tok, CAST(seq_idx AS BIGINT) AS seq_idx, start_tok,
       CAST(start_tok // {int(budget)} AS BIGINT) AS bin_id,
       ((start_tok + n_tok - 1) // {int(budget)}) > (start_tok // {int(budget)})
         AS crosses
FROM ordered
"""


def pack_bin_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-(source, bin) fill statistics over :func:`pack_sequences`
    output, covering EVERY context window: each document explodes into the
    1 + floor(n_tok / budget)-ish windows its span overlaps (linear — a
    document touches at most ``n_tok/budget + 1`` windows), contributing
    ``min(end, window_end) - max(start, window_start)`` tokens to each.
    ``fill_tokens`` is exactly ``budget`` for every window except each
    source's tail — the defining invariant of concatenation packing —
    and no window is missing even when a long document blankets windows
    nothing starts in.

    ``budget`` MUST be the same value the ``packed`` frame was built
    with — the frame doesn't carry it, so a mismatch can't be detected
    here and would yield internally inconsistent fills."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = F.lit(int(budget)).cast("long")
    end_excl = F.col("start_tok") + F.col("n_tok")
    last_bin = F.expr(f"(start_tok + n_tok - 1) div {int(budget)}")
    spans = packed.select(
        "source",
        "n_tok",
        "start_tok",
        "bin_id",
        "crosses",
        F.explode(F.sequence(F.col("bin_id"), last_bin)).alias("bin"),
    )
    bin_start = F.col("bin") * b
    bin_end = bin_start + b
    contrib = F.least(end_excl, bin_end) - F.greatest(F.col("start_tok"), bin_start)
    starts_here = F.col("bin_id") == F.col("bin")
    return (
        spans.groupBy("source", F.col("bin").alias("bin_id"))
        .agg(
            F.sum(starts_here.cast("long")).alias("n_docs_start"),
            F.count("*").alias("n_docs_overlap"),
            F.sum(F.when(starts_here, F.col("n_tok")).otherwise(0)).alias("tok_started"),
            F.sum((starts_here & F.col("crosses")).cast("long")).alias("n_crossing"),
            F.sum(contrib).alias("fill_tokens"),
        )
        .select(
            "source",
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("n_docs_start").cast("long").alias("n_docs_start"),
            F.col("n_docs_overlap").cast("long").alias("n_docs_overlap"),
            F.col("tok_started").cast("long").alias("tok_started"),
            F.col("n_crossing").cast("long").alias("n_crossing"),
            F.col("fill_tokens").cast("long").alias("fill_tokens"),
        )
    )


def pack_bin_stats_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    budget: int,
    seed: int = PACK_SEED,
) -> str:
    """DuckDB twin of :func:`pack_bin_stats` composed over the packing."""
    packed = pack_sequences_sql(table, id_sql, text_sql, source_sql, budget, seed)
    B = int(budget)
    return f"""
WITH packed AS ({packed}),
spans AS (
  SELECT p.source, p.n_tok, p.start_tok, p.bin_id, p.crosses, s.bin
  FROM packed p,
       UNNEST(generate_series(p.bin_id, (p.start_tok + p.n_tok - 1) // {B}))
         AS s(bin)
)
SELECT source, CAST(bin AS BIGINT) AS bin_id,
       CAST(sum(CASE WHEN bin_id = bin THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_start,
       CAST(count(*) AS BIGINT) AS n_docs_overlap,
       CAST(sum(CASE WHEN bin_id = bin THEN n_tok ELSE 0 END) AS BIGINT) AS tok_started,
       CAST(sum(CASE WHEN bin_id = bin AND crosses THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       CAST(sum(least(start_tok + n_tok, (bin + 1) * {B})
                - greatest(start_tok, bin * {B})) AS BIGINT) AS fill_tokens
FROM spans
GROUP BY source, bin
"""


# ---------------------------------------------------------------------------
# Length-grouped batching — the PAD-TO-MAX flavor of batch construction
# (HF `group_by_length` / fairseq bucketing): batches draw sequences of
# similar length so the pad-to-longest waste stays small. Complementary to
# pack_sequences above (concat-and-cut destroys example boundaries; this
# keeps them — the right choice for SFT / contrastive phases where
# examples must not bleed into each other).
# ---------------------------------------------------------------------------


def length_grouped_batches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_size: int,
    seed: int = 42,
) -> DataFrame:
    """``(id, n_tokens, batch_idx)`` — consecutive ``batch_size`` docs in
    the (n_tokens desc, hash31(id, seed), id) order share a batch, so
    same-batch lengths are as close as a global order can make them and
    equal-length runs are seeded-shuffled rather than ingestion-ordered.
    The rank is the range-bucketed parallel rank (never a global sort);
    the hash tiebreak doubles as the per-epoch shuffle knob (vary
    ``seed``)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    from rust_triplets_spark.functions.ordering import bucketed_position

    keyed = df.select(
        F.col(id_col).cast("long").alias("id"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    ).select(
        "id", "n_tokens",
        # rank needs ASC keys < key_space: invert the count (docs are
        # bounded well under 2^31 tokens) so longest sorts first
        (F.lit(M31_TOKENS) - F.col("n_tokens")).alias("__k"),
        hash31_col(F.col("id"), seed).alias("__h"),
    )
    ranked = bucketed_position(
        keyed, "__k", tiebreak=("__h", "id"), out_col="__rank"
    )
    return ranked.select(
        "id", "n_tokens",
        F.expr(f"__rank div {int(batch_size)}").cast("long").alias("batch_idx"),
    )


M31_TOKENS = 2_147_483_647


def length_grouped_batches_sql(
    table: str, id_sql: str, text_sql: str, batch_size: int, seed: int = 42
) -> str:
    """DuckDB twin of :func:`length_grouped_batches`."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    tc = token_count_sql(text_sql)
    return f"""
WITH lg_keyed AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST({tc} AS BIGINT) AS n_tokens,
         {hash31_sql('CAST(' + id_sql + ' AS BIGINT)', seed)} AS h
  FROM {table} t
)
SELECT id, n_tokens,
       CAST((row_number() OVER (ORDER BY n_tokens DESC, h, id) - 1)
            // {int(batch_size)} AS BIGINT) AS batch_idx
FROM lg_keyed
"""


def padding_efficiency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_size: int,
    seed: int = 42,
) -> DataFrame:
    """Per-batch pad-to-longest accounting over
    :func:`length_grouped_batches`: ``(batch_idx, n_seqs, max_len,
    sum_tokens, pad_tokens)`` with ``pad_tokens = n_seqs·max_len −
    sum_tokens`` — all exact integers, the number the batching exists to
    minimize."""
    b = length_grouped_batches(df, id_col, text_col, batch_size, seed)
    return b.groupBy("batch_idx").agg(
        F.count("*").cast("long").alias("n_seqs"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
        .cast("long").alias("pad_tokens"),
    )


def padding_efficiency_sql(
    table: str, id_sql: str, text_sql: str, batch_size: int, seed: int = 42
) -> str:
    """DuckDB twin of :func:`padding_efficiency`."""
    inner = length_grouped_batches_sql(table, id_sql, text_sql, batch_size, seed)
    return f"""
SELECT batch_idx,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(max(n_tokens) AS BIGINT) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_tokens
FROM ({inner})
GROUP BY batch_idx
"""
