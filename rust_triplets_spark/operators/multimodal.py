"""Multimodal columns (driver north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The image kernels run REAL decode/resize in any environment: PIL when
present (compressed formats), else the vendored pure-Python
PPM/BMP/PNG/JPEG codecs (:mod:`rust_triplets_spark.operators.codecs`,
:mod:`...operators.jpeg`) — an unsupported format without PIL raises
per-payload. Audio decodes for real too (vendored WAV/PCM RIFF parser,
:mod:`...operators.audio`). Deterministic stand-in kernels
(``use_stub=True``) remain for plumbing tests and for media kinds with
no vendored codec (video, compressed audio). The Spark-side contract is the same on
every branch: schema, binary-safe Arrow batching, partition-size control
for large blobs, and codec-free metadata (sizes, magic-byte sniffing,
content hashes).

At 100 TB the rules encoded here: blobs never enter a shuffle key, wide
blob frames use ``maxRecordsPerBatch`` to bound Arrow memory, and
derived-feature frames (small) are what joins/aggregations run on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

_MAGIC = [  # (prefix bytes, mime)
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"P6", "image/x-portable-pixmap"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def sniff_mime(payload: bytes | None) -> str | None:
    if payload is None:
        return None
    for prefix, mime in _MAGIC:
        if payload.startswith(prefix):
            return mime
    return "application/octet-stream"


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Codec-free metadata: byte size, sniffed mime, content hash — native
    column expressions, no Python in the loop."""
    p = F.col(payload_col)
    mime = F.lit("application/octet-stream")
    for prefix, m in reversed(_MAGIC):
        hexpfx = prefix.hex()
        mime = F.when(
            F.hex(F.substring(p, 1, len(prefix))) == F.lit(hexpfx.upper()), F.lit(m)
        ).otherwise(mime)
    return (
        df.withColumn("byte_size", F.octet_length(p).cast("long"))
        .withColumn("sniffed_mime", F.when(p.isNotNull(), mime))
        .withColumn("content_hash", F.sha2(p, 256))
    )


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("feat_dim", T.IntegerType()),
])


def _decode_image(payload: bytes) -> "object":
    """Real decode → (h, w, 3) uint8 pixel array. PIL when available
    (compressed formats); otherwise the vendored pure-Python PPM/BMP
    codecs (:mod:`rust_triplets_spark.operators.codecs`) — so the
    non-stub branch runs end-to-end even in codec-less containers.
    Unsupported format without PIL → ``ValueError`` (loud, per-payload)."""
    try:
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        from rust_triplets_spark.operators.codecs import decode_image_builtin

        return decode_image_builtin(payload)


def _real_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Decoded-pixel feature: luminance histogram folded to ``dim``
    buckets, normalized — the real-branch counterpart of
    :func:`_fake_feature` (which histograms raw file bytes). Runs on the
    actual pixels, so it exercises the full decode path."""
    import numpy as np

    px = np.asarray(_decode_image(payload), dtype=np.float64)
    lum = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).astype(
        np.int64
    )
    if lum.size == 0:
        # a validly-formatted zero-pixel image (e.g. 'P6 0 0 255') must
        # yield a well-defined feature, not kill the stage
        return [0.0] * dim
    buckets = np.bincount((lum % dim).ravel(), minlength=dim)
    total = float(lum.size)
    return [round(float(c) / total, 6) for c in buckets[:dim]]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte histogram folded to ``dim``
    buckets, normalized. Keeps the whole pipeline exercisable end-to-end
    (schema, batching, downstream joins) without codecs."""
    if not payload:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = float(len(payload))
    return [round(c / total, 6) for c in buckets]


def extract_features(
    media: DataFrame, dim: int = 8, use_stub: bool = True,
    batch_rows: int = 64, emit_chunk_rows: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``batch_rows`` bounds the decode working set (blobs × rows is the
    memory knob at scale): the UDF slices each incoming Arrow batch into
    ``batch_rows``-row chunks and yields one output frame per chunk, so the
    bound holds at execution time regardless of the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (a session conf set
    here would be restored before the lazy plan ever ran). To also bound
    the *input* Arrow transfer, set that conf around the action. With
    ``use_stub=False`` the real decoder is called (raises here —
    documented stub). ``emit_chunk_rows`` appends a ``chunk_rows`` column
    recording the execution-time chunk each row was decoded in — the
    observable proof of the memory bound (used by tests/monitoring)."""
    schema = FEATURE_SCHEMA
    if emit_chunk_rows:
        schema = T.StructType(
            FEATURE_SCHEMA.fields + [T.StructField("chunk_rows", T.IntegerType())]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                feats = []
                for payload in sub["payload"]:
                    if use_stub:
                        feats.append(_fake_feature(payload, dim))
                    else:
                        feats.append(_real_feature(payload, dim))
                out = {
                    "media_id": sub["media_id"].to_numpy(),
                    "kind": sub["kind"].to_numpy(),
                    "feature": feats,
                    "feat_dim": [dim] * len(sub),
                }
                if emit_chunk_rows:
                    out["chunk_rows"] = [len(sub)] * len(sub)
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=schema)


AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("height", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("lum_bucket", T.LongType()),
])


def media_decode_audit(
    media: DataFrame, batch_rows: int = 64
) -> DataFrame:
    """Decode every binary payload with the VENDORED codecs (explicitly —
    not PIL, so the numbers are pinned to this repo's decode path) and
    emit integer facts: geometry plus a mean-luminance bucket.

    All math is integer: ``lum_sum = Σ (299·R + 587·G + 114·B)`` over
    int64, ``lum_bucket = (lum_sum // (1000 · n_pixels)) // 16`` — no
    float anywhere, so the output is bit-stable across runs and engines
    and can be oracle-checked against a committed expected frame. Same
    mapInPandas shape as :func:`extract_features`: ``batch_rows`` bounds
    the decode working set at execution time; blobs never leave the
    Arrow stage — only 5 small columns come out."""
    import numpy as np

    from rust_triplets_spark.operators.codecs import decode_image_builtin

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                hs, ws, lbs = [], [], []
                for payload in sub["payload"]:
                    px = decode_image_builtin(bytes(payload)).astype(np.int64)
                    h, w = int(px.shape[0]), int(px.shape[1])
                    n = h * w
                    if n == 0:
                        hs.append(h); ws.append(w); lbs.append(0)
                        continue
                    lum_sum = int(
                        (299 * px[..., 0] + 587 * px[..., 1]
                         + 114 * px[..., 2]).sum()
                    )
                    hs.append(h)
                    ws.append(w)
                    lbs.append(int((lum_sum // (1000 * n)) // 16))
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    "height": np.array(hs, dtype=np.int64),
                    "width": np.array(ws, dtype=np.int64),
                    "lum_bucket": np.array(lbs, dtype=np.int64),
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=AUDIT_SCHEMA
    )


AUDIO_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_channels", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("rms_bucket", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
])


def audio_decode_audit(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """The audio counterpart of :func:`media_decode_audit`: decode every
    WAV payload with the vendored PCM codec (``operators/audio.py``) and
    emit integer facts — geometry (frames/channels/rate), an RMS-loudness
    bucket, and the channel-0 zero-crossing count (the classic cheap
    voiced/unvoiced + silence signals an audio curation pass gates on).

    All math is integer on the decoder's 16-bit grid:
    ``rms_bucket = isqrt(Σ s₀² // n) // 2048`` (0..16) and
    ``zero_crossings = Σ [(sᵢ ≥ 0) ≠ (sᵢ₊₁ ≥ 0)]`` — bit-stable across
    engines, oracle-checkable against committed expectations. Same blob
    rules as the image audit: payloads never leave the Arrow stage."""
    import math

    import numpy as np

    from rust_triplets_spark.operators.audio import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = {k: [] for k in
                        ("n_frames", "n_channels", "sample_rate",
                         "rms_bucket", "zero_crossings")}
                for payload in sub["payload"]:
                    s, rate = decode_wav(bytes(payload))
                    n = int(s.shape[0])
                    rows["n_frames"].append(n)
                    rows["n_channels"].append(int(s.shape[1]))
                    rows["sample_rate"].append(int(rate))
                    if n == 0:
                        rows["rms_bucket"].append(0)
                        rows["zero_crossings"].append(0)
                        continue
                    ch0 = s[:, 0].astype(np.int64)
                    ssum = int((ch0 * ch0).sum())
                    rows["rms_bucket"].append(math.isqrt(ssum // n) // 2048)
                    nn = ch0 >= 0
                    rows["zero_crossings"].append(int((nn[1:] != nn[:-1]).sum()))
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    **{k: np.array(v, dtype=np.int64) for k, v in rows.items()},
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=AUDIO_AUDIT_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame, every_n_frames: int = 30, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling *plan*: which frame indices to decode per clip
    (decode itself is the stubbed kernel). Pure column math: frame count
    from metadata, indices = sequence stepped by ``every_n_frames`` capped
    at ``max_frames`` — the fan-out stays bounded and deterministic."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("long"), F.lit(0)
    )
    idxs = F.slice(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n_frames)),
        1,
        max_frames,
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.posexplode(idxs).alias("sample_ord", "frame_idx"))
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def _resize_image_real(payload: bytes, w: int, h: int) -> bytes:
    """Real resize path: PIL when available (any format it reads → PNG
    out); otherwise the vendored PPM/BMP codecs — decode, nearest-neighbor
    resample, re-encode as PPM (the builtin encoder's format). Both
    branches produce a real raster of exactly (w, h) decodable pixels."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        from rust_triplets_spark.operators.codecs import (
            decode_image_builtin,
            encode_ppm,
            resize_nearest,
        )

        return encode_ppm(resize_nearest(decode_image_builtin(payload), w, h))


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in 'pixel buffer': the payload byte-stream
    decimated/cycled to exactly w*h bytes — NOT an image, but a
    deterministic function of (payload, w, h) with the right SIZE, so the
    plumbing (schema, batch bounds, byte budgets, downstream joins) is
    exercisable end-to-end without codecs."""
    n = w * h
    if not payload:
        return bytes(n)
    step = max(1, len(payload) // n)
    out = payload[::step][:n]
    if len(out) < n:
        out = (out * (n // len(out) + 1))[:n]
    return bytes(out)


def resize_media(
    media: DataFrame, target_w: int, target_h: int,
    use_stub: bool = True, batch_rows: int = 64,
) -> DataFrame:
    """mapInPandas resize stage — the third stub-gated kernel of the
    multimodal family (decode → features → RESIZE → frame plan). Same
    memory contract as :func:`extract_features`: each incoming Arrow
    batch is sliced into ``batch_rows``-row chunks so the blob working
    set stays bounded regardless of session Arrow conf; blobs never enter
    a shuffle key (the output is keyed by ``media_id`` like the input).
    Only ``kind == 'image'`` rows are resized; others pass through with
    null dimensions (callers filter or route on ``kind``)."""
    if target_w < 1 or target_h < 1:
        raise ValueError(f"resize: target {target_w}x{target_h} must be >= 1x1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                widths, heights, payloads = [], [], []
                for kind, payload in zip(sub["kind"], sub["payload"]):
                    if kind != "image" or payload is None:
                        widths.append(None); heights.append(None)
                        payloads.append(payload)
                        continue
                    if use_stub:
                        payloads.append(_fake_resize(payload, target_w, target_h))
                    else:
                        payloads.append(
                            _resize_image_real(payload, target_w, target_h)
                        )
                    widths.append(target_w); heights.append(target_h)
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "kind": sub["kind"].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "payload": payloads,
                })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


GIF_FRAME_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("pick_ord", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("target_cs", T.LongType()),
    T.StructField("lum_bucket", T.LongType()),
])


def gif_frame_audit(
    media: DataFrame, n_picks: int = 4, batch_rows: int = 64
) -> DataFrame:
    """Animated-GIF frame sampling WITH real decoded pixels — the bridge
    between the image audits and the MP4 frame-plan: the planner is the
    SAME uniform-in-time integer pick math as the video branch
    (:func:`operators.video.plan_frame_picks` over the GIF's per-frame
    centisecond delays, each frame an stts run of one sample; a zero
    delay counts 1 tick so static GIFs degrade to index-uniform picks),
    but here the picked frames actually decode in-sandbox (vendored LZW,
    :mod:`operators.gif`), compositing disposal/transparency state
    forward exactly as a player would.

    Emits per pick: ``(media_id, pick_ord, frame_idx [0-based],
    target_cs, lum_bucket)`` with the image audit's integer luminance
    math — engine-stable, oracle-checkable against committed
    expectations. Frames never leave the Arrow stage; only ≤ ``n_picks``
    integer rows per clip come out."""
    import numpy as np

    from rust_triplets_spark.operators.gif import decode_gif_frames
    from rust_triplets_spark.operators.video import plan_frame_picks

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                out = {k: [] for k in ("media_id", "pick_ord", "frame_idx",
                                       "target_cs", "lum_bucket")}
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    frames, delays = decode_gif_frames(bytes(payload))
                    stts = [(1, max(int(d), 1)) for d in delays]
                    for ord_, target, sample_n, _dts, _key in \
                            plan_frame_picks(stts, None, n_picks):
                        px = frames[sample_n - 1].astype(np.int64)
                        n = px.shape[0] * px.shape[1]
                        lum_sum = int((299 * px[..., 0] + 587 * px[..., 1]
                                       + 114 * px[..., 2]).sum())
                        out["media_id"].append(int(mid))
                        out["pick_ord"].append(ord_)
                        out["frame_idx"].append(sample_n - 1)
                        out["target_cs"].append(target)
                        out["lum_bucket"].append(
                            (lum_sum // (1000 * n)) // 16 if n else 0
                        )
                yield pd.DataFrame(
                    {k: pd.Series(v, dtype="int64") for k, v in out.items()}
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=GIF_FRAME_AUDIT_SCHEMA
    )


AUDIO_PITCH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("pitch_lag", T.LongType()),
    T.StructField("f0_hz", T.LongType()),
])


def audio_pitch_audit(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Pitch the audio branch past loudness: per payload, the integer
    autocorrelation fundamental estimate (operators/audio.autocorr_pitch
    — int64 ``Σ s[i]·s[i+k]`` maximized over the 50–500 Hz lag band,
    smallest-lag tie-break) → ``(pitch_lag, f0_hz)``. The voiced/tone
    detector an audio curation pass uses to separate speech/music from
    noise and silence; silence and unvoiced payloads report (0, 0).
    Engine-stable integers, oracle-checked against committed
    expectations; blobs never leave the Arrow stage."""
    from rust_triplets_spark.operators.audio import autocorr_pitch, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                lags, f0s = [], []
                for payload in sub["payload"]:
                    s, rate = decode_wav(bytes(payload))
                    lag, f0 = autocorr_pitch(s, rate)
                    lags.append(lag)
                    f0s.append(f0)
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    "pitch_lag": np.array(lags, dtype=np.int64),
                    "f0_hz": np.array(f0s, dtype=np.int64),
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=AUDIO_PITCH_SCHEMA
    )


AUDIO_FULL_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_channels", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("rms_bucket", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("pitch_lag", T.LongType()),
    T.StructField("f0_hz", T.LongType()),
])


def audio_full_audit(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """:func:`audio_decode_audit` + :func:`audio_pitch_audit` in ONE
    kernel — each payload decodes once and emits both the loudness /
    zero-crossing facts and the autocorrelation pitch. This is the shape
    a real curation pass runs (decode is the expensive part; every
    per-clip signal should ride the same decode), and it keeps the
    registry's per-query window cost down: the G.711 fixture query pins
    companding AND pitch-on-companded-audio under one oracle row set.
    Same integer math and blob rules as the two single-purpose audits."""
    import math

    import numpy as np

    from rust_triplets_spark.operators.audio import autocorr_pitch, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo:lo + batch_rows]
                rows = {k: [] for k in
                        ("n_frames", "n_channels", "sample_rate",
                         "rms_bucket", "zero_crossings", "pitch_lag",
                         "f0_hz")}
                for payload in sub["payload"]:
                    s, rate = decode_wav(bytes(payload))
                    n = int(s.shape[0])
                    rows["n_frames"].append(n)
                    rows["n_channels"].append(int(s.shape[1]))
                    rows["sample_rate"].append(int(rate))
                    if n == 0:
                        rows["rms_bucket"].append(0)
                        rows["zero_crossings"].append(0)
                    else:
                        ch0 = s[:, 0].astype(np.int64)
                        ssum = int((ch0 * ch0).sum())
                        rows["rms_bucket"].append(
                            math.isqrt(ssum // n) // 2048
                        )
                        nn = ch0 >= 0
                        rows["zero_crossings"].append(
                            int((nn[1:] != nn[:-1]).sum())
                        )
                    lag, f0 = autocorr_pitch(s, rate)
                    rows["pitch_lag"].append(lag)
                    rows["f0_hz"].append(f0)
                yield pd.DataFrame({
                    "media_id": sub["media_id"].to_numpy(),
                    "fmt": sub["fmt"].to_numpy(),
                    **{k: np.array(v, dtype=np.int64)
                       for k, v in rows.items()},
                })

    return media.select("media_id", "fmt", "payload").mapInPandas(
        run, schema=AUDIO_FULL_AUDIT_SCHEMA
    )
