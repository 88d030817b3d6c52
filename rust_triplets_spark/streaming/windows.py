"""Event-time windowing + sessionization over the ``events`` table
(Spark extension scope — the reference has no event-time operators, only
cursored incremental ingestion; SURVEY §2.9).

Batch and streaming share the same logic: ``tumbling_agg`` /
``sessionize`` are pure column transforms, and ``stream_tumbling_agg``
applies the same aggregation to a ``readStream`` source with a watermark
(late-data bound) — the batch version doubles as the DuckDB oracle twin.

Every entry point normalizes the timestamp column through
``timeutils.ensure_epoch_us`` — branching on the RESOLVED dtype, so both
int64-nanos and TIMESTAMP(MICROS)/NTZ physical parquet layouts work — and
all window math is integer division on epoch microseconds: timezone-free
and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.timeutils import US_PER_SEC, ensure_epoch_us


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_seconds: int = 3600,
    value_col: str = "value",
    int_unit: str = "ns",
) -> DataFrame:
    """Tumbling-window counts + exact sums per (window, key).

    Returns (window_id, window_start_s, key, n, sum_value) — sum through
    DECIMAL(18,2) so it is order-free exact (see driver_queries notes)."""
    ev = ensure_epoch_us(events, ts_col, int_unit)
    win_us = window_seconds * US_PER_SEC
    wid = F.expr(f"{ts_col} div {win_us}").cast("long")
    return (
        ev.groupBy(wid.alias("window_id"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("sum_value"),
        )
        .withColumn("window_start_s", (F.col("window_id") * window_seconds).cast("long"))
        .select("window_id", "window_start_s", "key", "n", "sum_value")
    )


def tumbling_agg_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_seconds: int = 3600,
    value_col: str = "value",
) -> str:
    win_us = window_seconds * US_PER_SEC
    return f"""
SELECT CAST(epoch_us({ts_col}) // {win_us} AS BIGINT) AS window_id,
       CAST((epoch_us({ts_col}) // {win_us}) * {window_seconds} AS BIGINT) AS window_start_s,
       {key_col} AS key,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
FROM {table}
GROUP BY 1, 2, 3
"""


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    int_unit: str = "ns",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same user exceeds ``gap_seconds``.

    Returns one row per session: (user_id, session_idx, n_events,
    start_us, end_us). The batch twin of ``session_window`` streaming —
    and the DuckDB-checkable definition of its semantics."""
    from pyspark.sql import Window

    ev = ensure_epoch_us(events, ts_col, int_unit)
    gap_us = gap_seconds * US_PER_SEC
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    with_prev = ev.withColumn("__prev", F.lag(ts_col).over(w))
    is_new = (
        F.col("__prev").isNull() | ((F.col(ts_col) - F.col("__prev")) > gap_us)
    ).cast("long")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = with_prev.withColumn("session_idx", F.sum(is_new).over(w_run))
    return (
        sessions.groupBy(F.col(user_col).alias("user_id"), "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(ts_col).cast("long").alias("start_us"),
            F.max(ts_col).cast("long").alias("end_us"),
        )
        .select(
            "user_id", F.col("session_idx").cast("long").alias("session_idx"),
            "n_events", "start_us", "end_us",
        )
    )


def sessionize_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> str:
    gap_us = gap_seconds * US_PER_SEC
    return f"""
WITH e AS (
  SELECT {user_col} AS user_id, epoch_us({ts_col}) AS tus,
         lag(epoch_us({ts_col})) OVER (PARTITION BY {user_col} ORDER BY epoch_us({ts_col})) AS prev
  FROM {table}
), marked AS (
  SELECT user_id, tus,
         sum(CASE WHEN prev IS NULL OR tus - prev > {gap_us} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(tus) AS BIGINT) AS start_us, CAST(max(tus) AS BIGINT) AS end_us
FROM marked GROUP BY user_id, session_idx
"""


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_seconds: int = 7200,
    slide_seconds: int = 3600,
    int_unit: str = "ns",
) -> DataFrame:
    """Sliding (hopping) window counts: window ``window_seconds`` wide,
    advancing every ``slide_seconds`` — each event belongs to
    ``window/slide`` overlapping windows, generated by exploding the slide
    ids (exactly how Spark's ``window(ts, w, s)`` plans it; expressed in
    integer micros math so the DuckDB twin is exact).

    Returns (window_id, window_start_s, key, n); window ``w`` covers
    ``[w*slide, w*slide + window)``."""
    if window_seconds % slide_seconds:
        raise ValueError("window must be a multiple of slide")
    n_win = window_seconds // slide_seconds
    slide_us = slide_seconds * US_PER_SEC
    ev = ensure_epoch_us(events, ts_col, int_unit)
    s0 = F.expr(f"{ts_col} div {slide_us}").cast("long")
    exploded = ev.select(
        F.col(key_col).alias("key"),
        F.explode(F.sequence(s0 - (n_win - 1), s0)).alias("window_id"),
    )
    return (
        exploded.groupBy("window_id", "key")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.col("window_id").cast("long").alias("window_id"),
            (F.col("window_id") * slide_seconds).cast("long").alias("window_start_s"),
            "key",
            "n",
        )
    )


def sliding_agg_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_seconds: int = 7200,
    slide_seconds: int = 3600,
) -> str:
    n_win = window_seconds // slide_seconds
    slide_us = slide_seconds * US_PER_SEC
    return f"""
WITH e AS (
  SELECT {key_col} AS key, epoch_us({ts_col}) // {slide_us} AS s0 FROM {table}
), exploded AS (
  SELECT key, u.w AS window_id FROM e, UNNEST(range(s0 - {n_win - 1}, s0 + 1)) AS u(w)
)
SELECT CAST(window_id AS BIGINT) AS window_id,
       CAST(window_id * {slide_seconds} AS BIGINT) AS window_start_s,
       key, CAST(count(*) AS BIGINT) AS n
FROM exploded GROUP BY 1, 2, 3
"""


def session_agg_native(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    int_unit: str = "ns",
) -> DataFrame:
    """Sessionization via Spark's native ``session_window`` — works on both
    batch and streaming frames (same expression, so the batch run IS the
    streaming run's oracle). Returns (user_id, n_events, start_us, end_us)
    per session.

    Boundary semantics: ``session_window`` starts a NEW session when the
    gap is ``>= gap_seconds`` (windows merge only while they strictly
    overlap), whereas :func:`sessionize`'s gaps-and-islands form uses
    ``> gap``. Identical everywhere except events exactly ``gap`` apart.
    Scale: native streaming state (state-store backed, RocksDB-able) —
    preferred over the ``applyInPandasWithState`` tracker for plain
    gap sessionization; the tracker remains for genuinely custom state."""
    ev = ensure_epoch_us(events, ts_col, int_unit)
    with_ts = ev.withColumn(
        "__event_time", F.timestamp_seconds(F.expr(f"{ts_col} div {US_PER_SEC}"))
    )
    return (
        with_ts.groupBy(
            F.session_window("__event_time", f"{gap_seconds} seconds").alias("__w"),
            F.col(user_col).cast("long").alias("user_id"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(ts_col).cast("long").alias("start_us"),
            F.max(ts_col).cast("long").alias("end_us"),
        )
        .select("user_id", "n_events", "start_us", "end_us")
    )


def stream_session_agg_native(
    spark,
    source_dir: str,
    schema,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    int_unit: str = "ns",
):
    """Streaming twin of :func:`session_agg_native`: file source →
    watermark → native session window. Append output mode — a session row
    emits once, when the watermark passes its close (finite sources
    therefore hold their LAST sessions open until a later event advances
    the watermark; tests flush with a far-future sentinel row, production
    streams advance naturally)."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    ev = ensure_epoch_us(raw, ts_col, int_unit)
    with_ts = ev.withColumn(
        "__event_time", F.timestamp_seconds(F.expr(f"{ts_col} div {US_PER_SEC}"))
    )
    return (
        with_ts.withWatermark("__event_time", watermark)
        .groupBy(
            F.session_window("__event_time", f"{gap_seconds} seconds").alias("__w"),
            F.col(user_col).cast("long").alias("user_id"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(ts_col).cast("long").alias("start_us"),
            F.max(ts_col).cast("long").alias("end_us"),
        )
        .select("user_id", "n_events", "start_us", "end_us")
    )


def stream_tumbling_agg(
    spark,
    source_dir: str,
    schema,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    int_unit: str = "ns",
):
    """Structured Streaming variant: file source → event-time tumbling
    window with watermark (late-data bound) → streaming aggregation.
    Returns the streaming DataFrame; attach ``writeStream`` + checkpoint
    downstream. The timestamp column is normalized to epoch micros from
    its resolved dtype, then lifted to a real TIMESTAMP for the
    watermark/window machinery."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    norm = ensure_epoch_us(raw, ts_col, int_unit)
    with_ts = norm.withColumn(
        "__event_time", F.timestamp_seconds(F.expr(f"{ts_col} div {US_PER_SEC}"))
    )
    return (
        with_ts.withWatermark("__event_time", watermark)
        .groupBy(
            F.window("__event_time", f"{window_seconds} seconds").alias("win"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )
