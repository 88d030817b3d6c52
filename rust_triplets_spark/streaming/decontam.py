"""Streaming fuzzy decontamination — flag benchmark near-dups AT INGEST.

Batch twin: :func:`rust_triplets_spark.operators.decontam
.fuzzy_decontaminate`. A continuously-arriving corpus can't wait for a
nightly decontamination sweep; this flags each incoming document against a
(small, static) benchmark index inside the ingest stream itself.

Shape: the benchmark side is indexed ONCE as (eval_id, band, sig) LSH
buckets — benchmark sets are MBs against a 100 TB/day feed, so the index
is a broadcast stream-static join side. The stream side computes its
MinHash signature ROW-LOCALLY (:func:`~rust_triplets_spark.operators
.dedup.minhash_signature_array_col` — value-identical to the batch
aggregate, pinned by pytest) so the whole query is map-only: band explode
→ stream-static inner join → append sink. No watermark, no state store,
no shuffle on the stream side; each micro-batch flags independently. A
doc colliding with the same eval doc in several bands emits one row per
band (stateless by design — DISTINCT would need state); consumers dedup
on (id, eval_id) or act on first sight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.dedup import (
    MINHASH_SEED,
    minhash_band_structs_col,
    minhash_signature_array_col,
)


def fuzzy_eval_index(
    evaldf: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = MINHASH_SEED,
) -> DataFrame:
    """Static benchmark index: one (eval_id, band, sig) row per band.
    Built with the same row-local expressions as the stream side, so both
    sides' band signatures agree bit-for-bit.

    The band-struct array is staged as its OWN projection attribute and
    the explode consumes that attribute — never the expression. The mix31
    band chain duplicates its accumulated sub-expression at every fold
    step (textually ~3x per slot), and a Generate's generator is compiled
    into ``generate_doConsume`` where codegen can neither split methods
    nor reuse subexpressions: inlining the chain there overflows janino's
    64 KB method limit and the whole stage silently falls back to
    interpreted mode (or fails outright under
    ``spark.sql.codegen.fallback=false`` — the tripwire test). Hosting
    the same expression in a Project keeps it splittable."""
    sig = minhash_signature_array_col(F.col(text_col), num_hashes, shingle_n, seed)
    return (
        evaldf.select(
            F.col(id_col).cast("long").alias("eval_id"), sig.alias("__sig")
        )
        .where(F.col("__sig").isNotNull())
        .select(
            "eval_id",
            minhash_band_structs_col(F.col("__sig"), num_hashes, bands).alias(
                "__bands"
            ),
        )
        .select("eval_id", F.explode("__bands").alias("__b"))
        .select("eval_id", F.col("__b.band").alias("band"), F.col("__b.sig").alias("sig"))
    )


def eval_key_set(eval_index: DataFrame) -> frozenset:
    """Collect a :func:`fuzzy_eval_index` into a driver-side
    ``frozenset[(band, sig)]`` for row-local membership tests. The
    collect is bounded by the index's own contract — benchmark sets are
    MBs against a 100 TB feed (module doc); the at-rest path keeps the
    join form, this set form exists for the map-only ingest funnel where
    a per-doc boolean (not per-collision rows) is needed."""
    return frozenset(
        (r["band"], r["sig"]) for r in eval_index.select("band", "sig").collect()
    )


def band_collision_udf(keys: frozenset):
    """Arrow-batched UDF over a MinHash band-struct array column: does
    ANY of the doc's ``(band, sig)`` pairs collide with the benchmark key
    set? Same band signatures as the join path (identical expressions),
    so ``hit == (doc has >= 1 row in fuzzy_decontam_flags)`` exactly;
    null arrays (docs too short to carry a signature — they never appear
    in the flags either) probe false.

    Takes the band column, not the text: the signature must be STAGED as
    a real column first (one ``withColumn`` per step, as the join path
    does) — substituting the 32-min signature expression into every band
    slot builds a column tree deep enough to overflow the Python→JVM
    column conversion."""
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def _hit(band_arrs):
        import pandas as pd

        out = []
        for arr in band_arrs:
            if arr is None:
                out.append(False)
                continue
            out.append(any((b["band"], b["sig"]) in keys for b in arr))
        return pd.Series(out)

    return _hit


def fuzzy_decontam_flags(
    df: DataFrame,
    eval_index: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = MINHASH_SEED,
) -> DataFrame:
    """(id, eval_id, band) candidate flags for ``df`` against a
    :func:`fuzzy_eval_index`. ``df`` may be a STREAMING frame (the whole
    transformation is map-only + a stream-static broadcast join → append
    mode) or a batch frame — same expressions, same results (the parity
    the tests pin). Parameters must match the ones the index was built
    with; a mismatch silently yields no collisions, so callers should
    thread one config object through both."""
    sig = minhash_signature_array_col(F.col(text_col), num_hashes, shingle_n, seed)
    banded = (
        df.select(F.col(id_col).cast("long").alias("id"), sig.alias("__sig"))
        .where(F.col("__sig").isNotNull())
        .select(
            "id",
            # staged attribute, not an inline generator expression — see
            # the fuzzy_eval_index docstring (64 KB generate_doConsume)
            minhash_band_structs_col(F.col("__sig"), num_hashes, bands).alias(
                "__bands"
            ),
        )
        .select("id", F.explode("__bands").alias("__b"))
        .select("id", F.col("__b.band").alias("band"), F.col("__b.sig").alias("sig"))
    )
    return banded.join(F.broadcast(eval_index), ["band", "sig"]).select(
        "id", "eval_id", "band"
    )


def stream_fuzzy_decontam(
    spark,
    source_dir: str,
    schema,
    evaldf: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = MINHASH_SEED,
) -> DataFrame:
    """File-stream convenience wrapper: readStream over ``source_dir`` →
    :func:`fuzzy_decontam_flags` against an index built from ``evaldf``."""
    idx = fuzzy_eval_index(
        evaldf, id_col, text_col, num_hashes, bands, shingle_n, seed
    )
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return fuzzy_decontam_flags(
        raw, idx, id_col, text_col, num_hashes, bands, shingle_n, seed
    )
