"""Streaming Bloom membership — flag already-ingested documents AT INGEST.

Batch twin: :mod:`rust_triplets_spark.operators.bloom`. The batch probe
ends in a per-id aggregate (AND over the k exploded bit checks), which a
streaming query can't run without a state store; this module removes the
aggregate instead of adding state: the filter is collected into a DENSE
int64 word array — bounded by ``ceil(m_bits/63)`` rows BY CONSTRUCTION
(the one collect in this repo whose size is a declared parameter, not a
function of the data; 2²⁰ bits = 130 KB) — and membership becomes ONE
row-local Arrow-batched pandas UDF over the key column (the
:func:`...streaming.quality.score_with_model` pattern: model rides the
closure, Spark ships it once per query). The stream side is then
map-only: no join, no shuffle, no watermark, append mode.

The numpy hash31 is the same integer recurrence as
``functions.hashing.hash31_col`` (every intermediate < 2⁶³ — the largest
is ``(2³¹−2)·MULT_A ≈ 5.7e18``), pinned value-identical by pytest against
the batch probe.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import INC_B, M31, MULT_A, MULT_B
from rust_triplets_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    BLOOM_SEED,
    _check_params,
    bloom_build,
)


@dataclass(frozen=True)
class BloomFilterModel:
    """Dense broadcastable form of the sparse ``(word_idx, bits)`` frame."""

    words: np.ndarray  # int64[ceil(m_bits/63)]
    m_bits: int
    k_hashes: int
    seed: int


def bloom_filter_model(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> BloomFilterModel:
    """Build the filter over a BATCH key frame and densify it. The
    collect is bounded by ``ceil(m_bits/63)`` rows regardless of corpus
    size — the filter's defining property."""
    _check_params(m_bits, k_hashes)
    n_words = (m_bits + 62) // 63
    words = np.zeros(n_words, dtype=np.int64)
    for r in bloom_build(df, key_col, m_bits, k_hashes, seed).collect():
        words[r.word_idx] = r.bits
    return BloomFilterModel(words, m_bits, k_hashes, seed)


def _hash31_np(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized twin of ``functions.hashing.hash31_py`` (int64-safe)."""
    s = (seed * MULT_A) % M31
    h0 = ((x % M31) + M31 + s) % M31
    h1 = (h0 * MULT_B + INC_B) % M31
    h2 = h1 ^ (h1 >> 15)
    return (h2 * MULT_A) % M31


def bloom_member_col(model: BloomFilterModel, key) -> F.Column:
    """Row-local membership-test column over an int64 key column — the
    probe kernel, exposed as a Column so the ingest funnel can test
    membership INLINE on a streaming frame. Null keys probe false."""
    from pyspark.sql.types import BooleanType

    words, m_bits, k, seed = model.words, model.m_bits, model.k_hashes, model.seed

    @F.pandas_udf(BooleanType())
    def _member(keys):
        import pandas as pd

        # nulls never reach this UDF (coalesced below): an Arrow batch
        # containing ANY null converts to float64 pandas, and a >2^53 key
        # round-tripped through float changes its bit positions — a Bloom
        # FALSE NEGATIVE. Null-free int64 batches stay int64 end-to-end.
        xs = keys.to_numpy(dtype=np.int64)
        hit = np.ones(len(xs), dtype=bool)
        for j in range(k):
            pos = _hash31_np(xs, seed + j) % m_bits
            w = words[pos // 63]
            mask = np.int64(1) << (pos % 63).astype(np.int64)
            hit &= (w & mask) == mask
        return pd.Series(hit)

    key = key.cast("long")
    return F.when(key.isNull(), F.lit(False)).otherwise(
        _member(F.coalesce(key, F.lit(0)))
    )


def probe_with_model(
    df: DataFrame, model: BloomFilterModel, id_col: str, key_col: str
) -> DataFrame:
    """``(id, maybe_present)`` for a batch OR streaming frame — same
    contract as the batch :func:`...operators.bloom.bloom_probe` (parity
    pinned by pytest). Map-only; Arrow-batched; null keys probe false."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        bloom_member_col(model, F.col(key_col)).alias("maybe_present"),
    )


def stream_bloom_probe(
    spark,
    source_dir: str,
    schema,
    histdf: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "fp",
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """File-stream convenience wrapper: filter built once from the batch
    ``histdf`` key frame, readStream over ``source_dir`` → map-only probe."""
    model = bloom_filter_model(histdf, key_col, m_bits, k_hashes, seed)
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return probe_with_model(raw, model, id_col, key_col)
