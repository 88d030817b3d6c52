"""Perceptual image hashing (pHash) + banded near-duplicate pairing —
IMAGE dedup for the multimodal family.

The text side of the engine has the full near-dup toolbox (MinHash/LSH,
SimHash, containment, SemDedup); images previously had decode audits but
no dedup. This module adds the classic perceptual-hash pipeline every
image-corpus curation pass runs (Zauner 2010, "Implementation and
Benchmarking of Perceptual Image Hash Functions"; the pHash.org DCT
variant — public algorithm):

1. decode (vendored codecs — PPM/BMP/PNG/GIF/JPEG, operators/codecs),
2. integer luminance (the audit's T.871 ``299R+587G+114B`` sum — no
   float, no /1000 loss),
3. 32×32 area-average downsample (integer bin sums on exact ``i·h//32``
   bin edges, quantized ``(sum << 20) // area`` — deterministic for any
   geometry),
4. 2-D DCT-II (float64 matrix product — the same in-container float
   determinism the JPEG decoder's IDCT already relies on),
5. the 63 lowest-frequency AC coefficients (8×8 block minus DC),
   thresholded at their exact median (63 values → the 32nd order
   statistic; strict ``>``) → a 63-bit hash. 63 bits, not 64, keeps the
   value strictly non-negative in BIGINT so ``>>``/``&``/``xor`` band
   math never touches the sign bit in either engine.

Near-dup pairing mirrors the driver-proven SimHash shape
(operators/dedup.simhash_band_pairs): band the 63 bits into 4 bands
(16/16/16/15) and self-join per band bucket. Pigeonhole guarantee:
any pair within Hamming distance 3 shares a clean band; beyond that,
banding is the standard recall/cost trade (a distance-12 pair spread
3/3/3/3 across bands would be missed) — pHash bit flips from
re-encode/brightness perturbations CLUSTER in the few affected
low-frequency coefficients rather than spreading uniformly, which is
why 4-band pHash candidate generation is the fielded practice; the
committed fixture's planted families are verified caught end-to-end.
Buckets self-join per band with
``a < b``; ``bit_count(xor())`` is engine-native in both Spark and
DuckDB. Scale shape: blobs never leave the Arrow hashing stage — only
(id, 63-bit BIGINT) rows shuffle; the band self-join is Σ bucket², the
same guarded geometry as simhash (a ``max_bucket`` guard is available
for corpus-scale runs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BITS = 63
PHASH_GRID = 32  # downsample grid (NxN) the DCT runs on
PHASH_BLOCK = 8  # low-frequency block kept (BLOCK² − 1 bits)
# band layout over the 63 bits: (shift, width)
PHASH_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n×n), float64."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT32 = _dct_matrix(PHASH_GRID)


def _luma_grid(px: np.ndarray, n: int = PHASH_GRID) -> np.ndarray:
    """(h, w, 3) uint8 → (n, n) int64 area-averaged luminance on the
    ``(sum << 20) // area`` fixed-point grid; exact bin edges i·h//n."""
    p = px.astype(np.int64)
    luma = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
    h, w = luma.shape
    if h < 1 or w < 1:
        raise ValueError("phash: empty image")
    ye = [y * h // n for y in range(n + 1)]
    xe = [x * w // n for x in range(n + 1)]
    # degenerate axes (h or w < n): clamp to ≥1-pixel bins by reusing
    # the nearest row/col — keeps the grid total and deterministic
    out = np.empty((n, n), dtype=np.int64)
    for yi in range(n):
        y0, y1 = ye[yi], max(ye[yi + 1], ye[yi] + 1)
        y0 = min(y0, h - 1)
        y1 = min(max(y1, y0 + 1), h) if y0 < h else h
        for xi in range(n):
            x0, x1 = xe[xi], max(xe[xi + 1], xe[xi] + 1)
            x0 = min(x0, w - 1)
            x1 = min(max(x1, x0 + 1), w) if x0 < w else w
            blk = luma[y0:y1, x0:x1]
            out[yi, xi] = (int(blk.sum()) << 20) // blk.size
    return out


def phash63(px: np.ndarray) -> int:
    """(h, w, 3) uint8 RGB → 63-bit perceptual hash (non-negative int).

    Bit ``b`` (LSB-first, row-major over the 8×8 low-frequency block
    skipping DC) is 1 iff that DCT coefficient is strictly above the
    median of the 63."""
    grid = _luma_grid(px).astype(np.float64)
    coefs = _DCT32 @ grid @ _DCT32.T
    # quantize to the integer grid before thresholding: the luma grid is
    # ~2^20-scaled so real structure lands in the thousands-to-billions,
    # while float cancellation dust is ~1e-3 — rounding pins flat/
    # letterboxed regions to EXACT zero instead of letting float noise
    # mint arbitrary bits (a constant image must hash to 0)
    block = np.round(
        coefs[:PHASH_BLOCK, :PHASH_BLOCK].ravel()[1:]  # drop DC
    ).astype(np.int64)
    med = np.sort(block)[PHASH_BITS // 2]  # 32nd order statistic of 63
    bits = block > med
    h = 0
    for b in range(PHASH_BITS):
        if bits[b]:
            h |= 1 << b
    return h


def image_phash(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Distributed decode + pHash: binary payloads → ``(media_id, fmt,
    phash)``. Arrow-batched; blobs never leave the stage."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.codecs import decode_image_builtin

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                hs = [
                    phash63(decode_image_builtin(bytes(p)))
                    for p in sub["payload"]
                ]
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    "phash": np.array(hs, dtype=np.int64),
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=schema
    )


def _banded(hashes: DataFrame) -> DataFrame:
    return hashes.select(
        "media_id", "phash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("phash"), s)
                .bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
            )
            for i, (s, w) in enumerate(PHASH_BANDS)
        ])).alias("__b"),
    ).select(
        "media_id", "phash",
        F.col("__b.band").alias("band"), F.col("__b.val").alias("val"),
    )


def image_phash_pairs(
    media: DataFrame, *, max_dist: int = 12, batch_rows: int = 64
) -> DataFrame:
    """Near-duplicate image pairs: decode → pHash → band-bucket self-join
    → Hamming filter. Emits ``(a, b, phash_a, phash_b, hamming)`` with
    ``a < b`` — both hashes ride along so the oracle pin covers the hash
    VALUES, not only their distances (a bit-permutation bug preserves
    distances but not values)."""
    from rust_triplets_spark.functions.caching import cache_scoped

    hashes = cache_scoped(image_phash(media, batch_rows), "phash.hashes")
    banded = _banded(hashes)
    left = banded.select(
        "band", "val",
        F.col("media_id").alias("a"), F.col("phash").alias("phash_a"),
    )
    right = banded.select(
        "band", "val",
        F.col("media_id").alias("b"), F.col("phash").alias("phash_b"),
    )
    return (
        left.join(right, ["band", "val"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", "phash_a", "phash_b",
            F.bit_count(
                F.col("phash_a").bitwiseXOR(F.col("phash_b"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_dist)
        .distinct()
    )


def image_phash_pairs_sql(
    hashes_sql: str, *, max_dist: int = 12
) -> str:
    """DuckDB twin over a pinned ``(media_id, phash)`` relation —
    identical banding, bucket self-join, Hamming filter."""
    band_selects = " UNION ALL ".join(
        f"SELECT media_id, phash, {i} AS band, "
        f"(phash >> {s}) & {(1 << w) - 1} AS val FROM ph"
        for i, (s, w) in enumerate(PHASH_BANDS)
    )
    return f"""
WITH ph AS MATERIALIZED ({hashes_sql}),
banded AS MATERIALIZED ({band_selects})
SELECT DISTINCT l.media_id AS a, r.media_id AS b,
       l.phash AS phash_a, r.phash AS phash_b,
       CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
FROM banded l JOIN banded r ON l.band = r.band AND l.val = r.val
WHERE l.media_id < r.media_id
  AND bit_count(xor(l.phash, r.phash)) <= {max_dist}
"""


# ---------------------------------------------------------------------------
# video near-dedup: perceptual hashes of the PLANNED frame picks. Composes
# three operators this module sits next to — the MP4 container walk +
# time-uniform frame planner (operators/video), the vendored JPEG decode
# (operators/jpeg), and phash63 above — into the clip-level dedup a video
# corpus curation pass runs: two clips are near-duplicates when their
# time-aligned sampled frames hash within a small Hamming ball. Alignment
# by pick_ord (the planner is uniform in TIME, so re-encodes of the same
# footage sample the same instants); requiring >= min_frames close pairs
# keeps a single coincidental frame from pairing unrelated clips.
# ---------------------------------------------------------------------------


_DIGEST_P = 1_000_000_007  # digest modulus (see video_phash_pairs)


def video_frame_phash(
    media: DataFrame, n_picks: int = 4, batch_rows: int = 64
) -> DataFrame:
    """Per planned pick: ``(media_id, pick_ord, phash)`` — the MJPEG
    seek-slice-decode loop (video.video_frame_decode_audit) with pHash as
    the per-frame summary instead of luminance. Blobs stay in the Arrow
    stage; ≤ ``n_picks`` (id, ord, int64) rows per clip come out."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.jpeg import decode_jpeg
    from rust_triplets_spark.operators.video import (
        MJPEG_FOURCCS,
        parse_mp4,
        plan_frame_picks,
        sample_byte_range,
        video_track,
    )

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("pick_ord", T.LongType()),
        T.StructField("phash", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                out = {k: [] for k in ("media_id", "pick_ord", "phash")}
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    blob = bytes(payload)
                    vt = video_track(parse_mp4(blob))
                    if vt is None:
                        continue
                    if vt.fourcc not in MJPEG_FOURCCS:
                        raise ValueError(
                            f"video: frame decode requested for codec "
                            f"{vt.fourcc!r} — only MJPEG samples are "
                            f"self-contained JPEGs; bitstream decode for "
                            f"other codecs is out of scope"
                        )
                    for ord_, _t, n, _d, _k in plan_frame_picks(
                        vt.stts, vt.sync_samples, n_picks
                    ):
                        off, ln = sample_byte_range(vt, n)
                        out["media_id"].append(int(mid))
                        out["pick_ord"].append(ord_)
                        out["phash"].append(
                            phash63(decode_jpeg(blob[off:off + ln]))
                        )
                yield pd.DataFrame(
                    {k: pd.Series(v, dtype="int64") for k, v in out.items()}
                )

    return media.select("media_id", "payload").mapInPandas(run, schema=schema)


def video_phash_pairs(
    media: DataFrame,
    *,
    n_picks: int = 4,
    max_dist: int = 12,
    min_frames: int = 3,
    batch_rows: int = 64,
) -> DataFrame:
    """Clip-level near-duplicate pairs: per-pick pHashes join on
    ``pick_ord``, a frame pair counts as close at Hamming ≤ ``max_dist``,
    and a clip pair survives with ≥ ``min_frames`` close frames. Emits
    ``(a, b, n_close, hamming_sum, fp_sum_a, fp_sum_b)`` with the
    positional digests ``Σ (ord+1)²·(phash mod 1e9+7)`` pinning hash
    values + order without overflowing BIGINT.
    Scale shape: the join key is (pick_ord) per candidate band — here the
    time-aligned equi-join is on pick_ord alone, which is clip-count ×
    n_picks rows; for corpus-scale runs band the per-frame hashes first
    (image_phash_pairs' 4-band split applies verbatim). Deliberately NOT
    banded at fixture scale so every aligned frame pair is scored."""
    from rust_triplets_spark.functions.caching import cache_scoped

    fp = cache_scoped(
        video_frame_phash(media, n_picks, batch_rows), "phash.video"
    )
    # digest on the mod-prime grid: raw phash (~2^62) times (ord+1)²
    # overflows BIGINT in both engines; Σ (phash mod p)·(ord+1)² stays
    # ≤ ~6e10 and still pins values + order for the oracle compare
    digests = fp.groupBy("media_id").agg(
        F.sum(
            (F.col("phash") % F.lit(_DIGEST_P))
            * (F.col("pick_ord") + 1) * (F.col("pick_ord") + 1)
        ).cast("long").alias("fp_sum")
    )
    left = fp.select(
        F.col("media_id").alias("a"), "pick_ord",
        F.col("phash").alias("__ha"),
    )
    right = fp.select(
        F.col("media_id").alias("b"), "pick_ord",
        F.col("phash").alias("__hb"),
    )
    frame_pairs = (
        left.join(right, "pick_ord")
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "__d",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
            .cast("long"),
        )
    )
    return (
        frame_pairs.groupBy("a", "b")
        .agg(
            F.sum(F.when(F.col("__d") <= max_dist, 1).otherwise(0))
            .cast("long").alias("n_close"),
            F.sum("__d").cast("long").alias("hamming_sum"),
        )
        .where(F.col("n_close") >= min_frames)
        .join(digests.select(F.col("media_id").alias("a"),
                             F.col("fp_sum").alias("fp_sum_a")), "a")
        .join(digests.select(F.col("media_id").alias("b"),
                             F.col("fp_sum").alias("fp_sum_b")), "b")
        .select("a", "b", "n_close", "hamming_sum", "fp_sum_a", "fp_sum_b")
    )


def video_phash_pairs_sql(
    frame_hashes_sql: str, *, max_dist: int = 12, min_frames: int = 3
) -> str:
    """DuckDB twin over a pinned ``(media_id, pick_ord, phash)``
    relation — identical alignment join, close-frame count, digests."""
    return f"""
WITH fh AS MATERIALIZED ({frame_hashes_sql}),
digest AS MATERIALIZED (
  SELECT media_id,
         sum((phash % 1000000007) * (pick_ord + 1) * (pick_ord + 1))
           AS fp_sum
  FROM fh GROUP BY media_id),
fp2 AS (
  SELECT l.media_id AS a, r.media_id AS b,
         bit_count(xor(l.phash, r.phash)) AS d
  FROM fh l JOIN fh r
    ON l.pick_ord = r.pick_ord AND l.media_id < r.media_id),
agg AS (
  SELECT a, b,
         CAST(sum(CASE WHEN d <= {max_dist} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_close,
         CAST(sum(d) AS BIGINT) AS hamming_sum
  FROM fp2 GROUP BY a, b)
SELECT agg.a, agg.b, agg.n_close, agg.hamming_sum,
       CAST(da.fp_sum AS BIGINT) AS fp_sum_a,
       CAST(db.fp_sum AS BIGINT) AS fp_sum_b
FROM agg
JOIN digest da ON da.media_id = agg.a
JOIN digest db ON db.media_id = agg.b
WHERE agg.n_close >= {min_frames}
"""
