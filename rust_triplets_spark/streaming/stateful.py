"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState`` (SURVEY §2.9 — the Spark surface for custom
stateful semantics the built-in windowed aggs can't express; the reference
has only cursored ingestion, so this is extension scope matching its
"resumable state" spirit).

Emits one row per CLOSED session (a user gap exceeding ``gap_seconds``
closes the open session; a processing-time timeout flushes idle users).
The batch twin is ``streaming.windows.sessionize``, which is what the
driver's DuckDB oracle checks; this operator is validated in tests by
feeding a file stream and comparing closed sessions against the batch
result."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

US_PER_SEC = 1_000_000

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
])


def make_session_tracker(gap_seconds: int = 1800):
    """Returns the (key, batches, state) -> rows function for
    ``applyInPandasWithState``. State = the currently-open session.
    ``ts`` is BIGINT epoch microseconds (callers normalize through
    ``timeutils.ensure_epoch_us`` — see ``stream_sessionize``)."""
    gap_us = gap_seconds * US_PER_SEC

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                n, s, e = state.get
                closed.append((user_id, n, s, e))
                state.remove()
        else:
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend(int(t) for t in pdf["ts"])
            ts_all.sort()
            if state.exists:
                n, s, e = state.get
            else:
                n, s, e = 0, None, None
            for t in ts_all:
                if n and t - e > gap_us:
                    closed.append((user_id, n, s, e))
                    n, s, e = 0, None, None
                if n == 0:
                    s = t
                n += 1
                e = t
            if n:
                state.update((n, s, e))
                state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "n_events", "start_us", "end_us"])

    return track


def stream_sessionize(
    spark,
    source_dir: str,
    schema,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    int_unit: str = "ns",
):
    """File stream → per-user stateful session tracker. Update output mode;
    closed sessions only. ``ts`` is normalized to epoch micros from its
    resolved dtype (int64 nanos or TIMESTAMP both work)."""
    from rust_triplets_spark.functions.timeutils import ensure_epoch_us

    raw = ensure_epoch_us(spark.readStream.schema(schema).parquet(source_dir), "ts", int_unit)
    return (
        raw.select(F.col(user_col).cast("long").alias("user_id"), F.col("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_tracker(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
