"""Bounded rolling record window — the streaming analog of the
reference's per-source LRU ``RecordCache`` (``src/ingestion.rs:137-186``:
at most ``ingestion_max_records`` records per source, 0 ⇒ discard all,
re-ingest refreshes recency).

For finite batch corpora this tier is deliberately absent (SURVEY §2.9 —
Spark holds the corpus as a DataFrame). For UNBOUNDED streaming ingestion
the bounded-memory contract matters again, and the idiomatic Spark shape
is keyed state: ``applyInPandasWithState`` per source, state = the
recency-ordered id window, emitting an admission/refresh/eviction event
per affected record so downstream consumers (telemetry, cache-aware
samplers) see membership changes as a stream.

Scale: state per key is O(max_records) ids (fixed strings), keyed by
source — the same partitioning the ingest stream already has; no shuffle
beyond the groupBy(source) the semantics require.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("action", T.StringType()),  # admitted|refreshed|evicted|discarded
])

STATE_SCHEMA = T.StructType([
    T.StructField("ids", T.ArrayType(T.StringType())),  # recency order, MRU last
])


def make_rolling_window(max_records: int):
    """Returns the ``(key, batches, state) -> rows`` function for
    ``applyInPandasWithState``. LRU semantics exactly per
    ``src/ingestion.rs:137-186``: admission appends, re-ingest moves to
    the most-recent end (``refreshed``), overflow evicts from the
    least-recent end, and ``max_records == 0`` discards every record
    immediately (the reference's "0 ⇒ cache nothing")."""
    if max_records < 0:
        raise ValueError(f"max_records must be >= 0, got {max_records}")

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:  # no timeout configured; defensive only
            return
        # dict = insertion-ordered set: O(1) membership / move-to-MRU
        # (delete + reinsert) / LRU eviction (next(iter)) — a list would be
        # O(cap) per record, O(batch x cap) per micro-batch at the
        # reference's 100k-record cap
        window: dict[str, None] = (
            dict.fromkeys(state.get[0]) if state.exists else {}
        )
        events: list[tuple] = []
        # a group's rows arrive as MULTIPLE pandas chunks (Arrow batch
        # size); ordering must be established over the WHOLE group, not
        # per chunk — concat first, then one stable sort (rows sharing a
        # seq keep arrival order; the default introsort permutes equal
        # keys). Same shape as make_session_tracker's collect-then-sort.
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            batch = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            if "seq" in batch.columns:
                batch = batch.sort_values("seq", kind="stable")
            for rid in batch["record_id"]:
                rid = str(rid)
                if max_records == 0:
                    events.append((source, rid, "discarded"))
                    continue
                if rid in window:
                    del window[rid]
                    window[rid] = None
                    events.append((source, rid, "refreshed"))
                    continue
                window[rid] = None
                events.append((source, rid, "admitted"))
                if len(window) > max_records:
                    evicted = next(iter(window))
                    del window[evicted]
                    events.append((source, evicted, "evicted"))
        if max_records > 0:
            state.update((list(window),))
        if events:
            yield pd.DataFrame(events, columns=["source", "record_id", "action"])

    return track


def stream_rolling_window(
    spark,
    source_dir: str,
    schema,
    max_records: int,
    source_col: str = "source",
    id_col: str = "id",
    seq_col: str | None = None,
):
    """File stream → per-source bounded LRU window event stream. ``seq_col``
    (when present) fixes the in-batch admission order; otherwise batch
    arrival order is used."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    cols = [
        F.col(source_col).cast("string").alias("source"),
        F.col(id_col).cast("string").alias("record_id"),
    ]
    if seq_col is not None:
        cols.append(F.col(seq_col).cast("long").alias("seq"))
    return (
        raw.select(*cols)
        .groupBy("source")
        .applyInPandasWithState(
            make_rolling_window(max_records),
            outputStructType=EVENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
