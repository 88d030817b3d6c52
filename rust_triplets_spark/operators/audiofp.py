"""Audio fingerprinting + near-duplicate pairing — AUDIO dedup for the
multimodal family, completing the modality triple (text: MinHash/SimHash/
SemDedup; images: pHash; audio: this).

The shape is Haitsma & Kalker 2002 ("A Highly Robust Audio Fingerprinting
System", the public algorithm every audio-dedup system descends from),
sized to clip-level dedup:

1. decode (vendored WAV codec — PCM/float/G.711/ADPCM/RF64,
   operators/audio.py),
2. 32 analysis frames (N=512, Hann window, hop spread over the clip),
3. 17 log-spaced band energies per frame (|rfft|² sums, integer-rounded
   so equal-energy ties cannot be decided by float dust),
4. per-frame 16-bit subfingerprint: bit b = [E(b) > E(b+1)] — the
   within-frame spectral slope. Sign-of-difference bits are amplitude-
   invariant (volume changes hash identically) and survive companding
   far better than frame-to-frame deltas (measured here: G.711/8-bit
   re-encodes flip ≤ ~35 of 512 bits, IMA ADPCM ~90-150 depending on
   the clip's high-band content, while distinct clips differ by ≥ ~167
   — so ``max_ber`` is a recall/precision knob and the noisiest ADPCM
   clips sit near the boundary, exactly as in the published system).

Pairing is candidate-generate + verify, exactly like the text LSH
operators:

- candidates: each subfingerprint splits into two 8-bit halves; clips
  sharing an EXACT (frame, half_idx, value) key become a candidate pair.
  Half-keys are the recall lever — a noisy codec (ADPCM at ~19% bit
  error) rarely leaves a whole 16-bit frame clean but almost surely
  leaves one of the 64 half-keys clean.
- verify: total Hamming distance over all 512 bits (zip_with +
  bit_count(xor), engine-native) ≤ ``max_ber`` (default 128 = 25%,
  sitting between the fixture's worst planted near-dup, BER 96, and its
  best impostor, BER 167, with ≥30 bits of margin each way; H-K's
  published operating point is 35% on much longer fingerprints).

The emitted pairs carry each side's positional digest
``Σ (ord+1)²·subfp`` so the oracle pins the fingerprint VALUES and
their order, not merely pair distances. Scale shape: blobs never leave
the Arrow stage (only 32 small ints per clip come out); the candidate
join is Σ bucket² over (frame, half, value) buckets — the simhash
geometry; verification touches candidate pairs only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_FRAMES = 32
FP_BANDS = 17  # 16 slope bits per frame
FP_FFT = 512
FP_BITS = FP_FRAMES * (FP_BANDS - 1)  # 512
FP_MAX_BER = 128
FP_F_LO = 100.0
FP_F_HI = 3500.0


def audio_subfps(samples: np.ndarray, rate: int) -> list:
    """Decoded audio → the 32-element list of 16-bit subfingerprints."""
    ch0 = samples[:, 0].astype(np.float64)
    n = FP_FFT
    if len(ch0) < n + FP_FRAMES - 1:
        ch0 = np.pad(ch0, (0, n + FP_FRAMES - 1 - len(ch0)))
    hop = (len(ch0) - n) // (FP_FRAMES - 1) or 1
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    edges = np.geomspace(FP_F_LO, min(FP_F_HI, rate / 2.0), FP_BANDS + 1)
    sel = [
        (freqs >= edges[b]) & (freqs < edges[b + 1])
        for b in range(FP_BANDS)
    ]
    win = np.hanning(n)
    out = []
    for f in range(FP_FRAMES):
        seg = ch0[f * hop:f * hop + n]
        if len(seg) < n:
            seg = np.pad(seg, (0, n - len(seg)))
        spec = np.abs(np.fft.rfft(seg * win)) ** 2
        e = [int(round(float(spec[s].sum()))) for s in sel]
        v = 0
        for b in range(FP_BANDS - 1):
            if e[b] > e[b + 1]:
                v |= 1 << b
        out.append(v)
    return out


def audio_fingerprint(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Distributed decode + fingerprint: ``(media_id, fmt,
    subfps array<long>)``. Arrow-batched; blobs never leave the stage."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.audio import decode_wav

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("subfps", T.ArrayType(T.LongType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                fps = [
                    audio_subfps(*decode_wav(bytes(p)))
                    for p in sub["payload"]
                ]
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    "subfps": fps,
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=schema
    )


_DIGEST = (
    "aggregate(zip_with(subfps, sequence(1, {n}), (v, i) -> v * i * i), "
    "0L, (acc, x) -> acc + x)"
).format(n=FP_FRAMES)


def audio_fp_pairs(
    media: DataFrame, *, max_ber: int = FP_MAX_BER, batch_rows: int = 64
) -> DataFrame:
    """Near-duplicate audio pairs: fingerprint → half-key candidate join
    → full 512-bit BER verify. Emits ``(a, b, ber, fp_sum_a, fp_sum_b)``
    with ``a < b``; the positional digests pin fingerprint values."""
    from rust_triplets_spark.functions.caching import cache_scoped

    fps = cache_scoped(
        audio_fingerprint(media, batch_rows).withColumn(
            "fp_sum", F.expr(_DIGEST).cast("long")
        ),
        "audiofp.fps",
    )
    keys = fps.select(
        "media_id",
        F.posexplode("subfps").alias("ord", "val"),
    ).select(
        "media_id", "ord",
        F.explode(F.array(
            F.struct(F.lit(0).alias("hi"),
                     F.col("val").bitwiseAND(F.lit(255)).alias("hv")),
            F.struct(F.lit(1).alias("hi"),
                     F.shiftright(F.col("val"), 8).alias("hv")),
        )).alias("__h"),
    ).select("media_id", "ord", F.col("__h.hi").alias("hi"),
             F.col("__h.hv").alias("hv"))
    cand = (
        keys.alias("l").join(
            keys.alias("r"),
            [F.col("l.ord") == F.col("r.ord"),
             F.col("l.hi") == F.col("r.hi"),
             F.col("l.hv") == F.col("r.hv"),
             F.col("l.media_id") < F.col("r.media_id")],
        )
        .select(F.col("l.media_id").alias("a"),
                F.col("r.media_id").alias("b"))
        .distinct()
    )
    fa = fps.select(F.col("media_id").alias("a"),
                    F.col("subfps").alias("__fa"),
                    F.col("fp_sum").alias("fp_sum_a"))
    fb = fps.select(F.col("media_id").alias("b"),
                    F.col("subfps").alias("__fb"),
                    F.col("fp_sum").alias("fp_sum_b"))
    return (
        cand.join(fa, "a").join(fb, "b")
        .withColumn(
            "ber",
            F.expr(
                "aggregate(zip_with(__fa, __fb, "
                "(x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), "
                "0L, (acc, v) -> acc + v)"
            ),
        )
        .where(F.col("ber") <= max_ber)
        .select("a", "b", "ber", "fp_sum_a", "fp_sum_b")
    )


def audio_fp_pairs_sql(fps_sql: str, *, max_ber: int = FP_MAX_BER) -> str:
    """DuckDB twin over a pinned ``(media_id, subfps LIST<BIGINT>)``
    relation — identical half-key candidates, BER verify, digests."""
    return f"""
WITH fp AS MATERIALIZED ({fps_sql}),
u AS MATERIALIZED (
  SELECT media_id, generate_subscripts(subfps, 1) AS ord,
         unnest(subfps) AS val
  FROM fp),
halves AS MATERIALIZED (
  SELECT media_id, ord, 0 AS hi, val & 255 AS hv FROM u
  UNION ALL
  SELECT media_id, ord, 1 AS hi, val >> 8 AS hv FROM u),
cand AS (
  SELECT DISTINCT l.media_id AS a, r.media_id AS b
  FROM halves l JOIN halves r
    ON l.ord = r.ord AND l.hi = r.hi AND l.hv = r.hv
   AND l.media_id < r.media_id),
ber AS (
  SELECT c.a, c.b, sum(bit_count(xor(ua.val, ub.val))) AS ber
  FROM cand c
  JOIN u ua ON ua.media_id = c.a
  JOIN u ub ON ub.media_id = c.b AND ub.ord = ua.ord
  GROUP BY c.a, c.b),
digest AS (
  SELECT media_id, sum(val * ord * ord) AS fp_sum FROM u GROUP BY media_id)
SELECT b2.a, b2.b, CAST(b2.ber AS BIGINT) AS ber,
       CAST(da.fp_sum AS BIGINT) AS fp_sum_a,
       CAST(db.fp_sum AS BIGINT) AS fp_sum_b
FROM ber b2
JOIN digest da ON da.media_id = b2.a
JOIN digest db ON db.media_id = b2.b
WHERE b2.ber <= {max_ber}
"""
