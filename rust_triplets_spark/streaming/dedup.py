"""Streaming exact dedup at ingest (training-pipeline extension scope;
batch twin: operators/dedup.exact_dedup).

``dropDuplicates`` on the normalized-text fingerprint with a watermark
bounds the dedup state: a duplicate arriving within the watermark horizon
is dropped, one representative per distinct text survives. This is the
dedup-at-ingest shape for a continuously-arriving corpus — state size is
O(distinct texts within the horizon), not O(stream length), which is the
property that keeps it running forever on a 100 TB/day feed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import normalize_inline_whitespace_col
from rust_triplets_spark.functions.timeutils import US_PER_SEC, ensure_epoch_us


def stream_exact_dedup(
    spark,
    source_dir: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    int_unit: str = "ns",
):
    """File stream → normalized-text fingerprint → watermarked
    ``dropDuplicates``. Without ``ts_col`` the dedup is keyed on the
    fingerprint alone (unbounded state — only for finite backfills);
    with it, state expires past the watermark horizon."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    norm = normalize_inline_whitespace_col(text_col)
    keyed = raw.withColumn("__fp", F.sha2(norm, 256))
    if ts_col is None:
        return keyed.dropDuplicates(["__fp"]).drop("__fp")
    keyed = ensure_epoch_us(keyed, ts_col, int_unit)
    with_time = keyed.withColumn(
        "__event_time", F.timestamp_seconds(F.expr(f"{ts_col} div {US_PER_SEC}"))
    )
    return (
        with_time.withWatermark("__event_time", watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
