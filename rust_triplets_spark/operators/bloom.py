"""Bloom-filter fingerprint index — membership against an already-
ingested corpus WITHOUT re-joining it.

The incremental-ingest problem at 100 TB: every new shard must be checked
against everything already accepted ("have we seen this document?"), but
joining each delivery against the full historical fingerprint set re-reads
corpus-scale state forever. The standard answer is a Bloom filter over the
historical fingerprints: fixed size (``m`` bits regardless of corpus
rows), NO false negatives (a true duplicate is always flagged), a tunable
false-positive rate (flagged candidates get the exact check; clean
documents — the overwhelming majority — skip it). The reference engine
keeps per-source id sets in memory (src/sampler/mod.rs dedup maps); a
fixed-size mergeable filter is the scale-out restatement, sibling to the
KMV sketch (:mod:`...operators.sketches` — cardinality there, membership
here).

Representation: a SPARSE DataFrame of ``(word_idx, bits)`` int64 rows —
only words with at least one set bit are materialized, so a lightly
loaded filter is small on the wire, and a full filter is ``ceil(m/63)``
rows (~8 MB of longs for m = 2²⁶ ≈ 1% fp at 5M keys with k = 5). Words
hold 63 bits, not 64: DuckDB range-checks ``1::BIGINT << 63`` as an
overflow, and the sign bit buys nothing.
Build is one explode (k rows per key) + one ``bit_or`` partial-aggregable
groupBy; merge of independently built filters is the same ``bit_or``
(Bloom union is exact). Probe broadcasts the filter frame (bounded by
``ceil(m_bits/63)`` rows BY CONSTRUCTION — the one frame in the pipeline
that is always broadcastable) and needs no shuffle of the probe side at
all.

Everything is int64 bit math on hash31 grids — no floats anywhere — so
the DuckDB twins match bit-for-bit INCLUDING each false positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    hash31_col,
    hash31_sql,
    hash31_str_col,
    hash31_str_sql,
    mix31_col,
    mix31_sql,
)
from rust_triplets_spark.functions.text import (
    normalize_inline_whitespace_col,
    normalize_inline_whitespace_sql,
)

BLOOM_SEED = 4099
BLOOM_M_BITS = 1 << 20  # default filter size (128 KB) — fixture-scaled;
# production sizes to -n·ln(p)/ln(2)² bits for n keys at fp-rate p
BLOOM_K = 5  # hash count; optimal k = (m/n)·ln 2


def _check_params(m_bits: int, k_hashes: int) -> None:
    if m_bits < 63:
        raise ValueError(f"m_bits must be >= 63, got {m_bits}")
    if not 1 <= k_hashes <= 16:
        raise ValueError(f"k_hashes must be in [1, 16], got {k_hashes}")


def text_fingerprint_col(text_col) -> F.Column:
    """The exact-dedup (hash31, length) fingerprint folded to ONE int64 —
    the membership key this module indexes. Same collision class as
    :func:`...dedup.exact_dedup` (both engines collide identically)."""
    norm = normalize_inline_whitespace_col(text_col)
    return mix31_col([hash31_str_col(norm), F.length(norm).cast("long")])


def text_fingerprint_sql(text_sql: str) -> str:
    norm = normalize_inline_whitespace_sql(text_sql)
    return mix31_sql([hash31_str_sql(norm), f"CAST(length({norm}) AS BIGINT)"])


def _positions_col(key, m_bits: int, k_hashes: int, seed: int) -> F.Column:
    """Array of ``k`` bit positions in [0, m_bits) for one int64 key."""
    return F.array(
        *[
            F.pmod(hash31_col(key, seed + j), F.lit(m_bits)).cast("long")
            for j in range(k_hashes)
        ]
    )


def _positions_sql(key_sql: str, m_bits: int, k_hashes: int, seed: int) -> str:
    parts = ", ".join(
        f"CAST({hash31_sql(key_sql, seed + j)} % {m_bits} AS BIGINT)"
        for j in range(k_hashes)
    )
    return f"[{parts}]"


def bloom_build(
    df: DataFrame,
    key_col,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Build the sparse filter frame ``(word_idx, bits)`` from an int64
    key column (pass :func:`text_fingerprint_col` output for document
    membership). One explode to k rows per key, one partial-aggregable
    ``bit_or`` groupBy — the filter never exceeds ``ceil(m_bits/63)``
    rows (words pack 63 bits: DuckDB range-checks ``1::BIGINT << 63``)."""
    _check_params(m_bits, k_hashes)
    pos = F.explode(
        _positions_col(F.col(key_col) if isinstance(key_col, str) else key_col,
                       m_bits, k_hashes, seed)
    ).alias("__pos")
    return (
        df.select(pos)
        .select(
            F.expr("__pos div 63").alias("word_idx"),
            # F.shiftleft only takes a literal shift — expr for the column one
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))").alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__m)").cast("long").alias("bits"))
    )


def bloom_build_sql(
    table_sql: str,
    key_sql: str,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB twin of :func:`bloom_build`. ``table_sql`` is a full SELECT
    producing the key rows; ``key_sql`` the int64 key expression over it."""
    _check_params(m_bits, k_hashes)
    pos = _positions_sql(key_sql, m_bits, k_hashes, seed)
    return f"""
SELECT CAST(p.pos // 63 AS BIGINT) AS word_idx,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INT)) AS BIGINT) AS bits
FROM ({table_sql}) t, UNNEST({pos}) AS p(pos)
GROUP BY p.pos // 63
"""


def bloom_merge(filters: list[DataFrame]) -> DataFrame:
    """Union of independently built filters (same m/k/seed): Bloom union
    is exact — the merged filter answers exactly as one built over the
    concatenated key sets."""
    if not filters:
        raise ValueError("bloom_merge: need at least one filter frame")
    merged = filters[0]
    for f in filters[1:]:
        merged = merged.unionByName(f)
    return merged.groupBy("word_idx").agg(
        F.expr("bit_or(bits)").cast("long").alias("bits")
    )


def bloom_probe(
    filter_df: DataFrame,
    probe: DataFrame,
    id_col: str,
    key_col,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """``(id, maybe_present)`` for every probe row: true iff ALL k bits
    are set — no false negatives, false positives at the filter's load
    rate. The k probe rows per document join the BROADCAST filter on
    ``word_idx``; the probe side never shuffles (the per-id AND is a
    partial-aggregable ``min`` over k rows that re-groups on the id the
    rows were exploded from)."""
    _check_params(m_bits, k_hashes)
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    exploded = probe.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(_positions_col(key, m_bits, k_hashes, seed)).alias("__pos"),
    ).select(
        "id",
        F.expr("__pos div 63").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))").alias("__m"),
    )
    hits = exploded.join(F.broadcast(filter_df), "word_idx", "left").select(
        "id",
        (
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("__m")) == F.col("__m"))
        ).alias("__hit"),
    )
    return hits.groupBy("id").agg(F.min("__hit").alias("maybe_present"))


def bloom_probe_sql(
    filter_sql: str,
    probe_sql: str,
    id_sql: str,
    key_sql: str,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB twin of :func:`bloom_probe`."""
    _check_params(m_bits, k_hashes)
    pos = _positions_sql(key_sql, m_bits, k_hashes, seed)
    return f"""
WITH bl_filter AS MATERIALIZED ({filter_sql}),
bl_probe AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST(p.pos // 63 AS BIGINT) AS word_idx,
         CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INT) AS m
  FROM ({probe_sql}) t, UNNEST({pos}) AS p(pos)
)
SELECT b.id,
       CAST(min(CAST(f.bits IS NOT NULL AND (f.bits & b.m) = b.m AS INT)) AS BOOLEAN)
         AS maybe_present
FROM bl_probe b LEFT JOIN bl_filter f ON b.word_idx = f.word_idx
GROUP BY b.id
"""
