"""Portable event-time normalization.

The driver's ``events.ts`` physical parquet type has varied across testdata
generations — int64 nanoseconds in one build, TIMESTAMP(MICROS)
``isAdjustedToUTC=0`` (Spark ``TIMESTAMP_NTZ``) in another. Nothing in the
engine may assume a physical type: every consumer goes through
:func:`ensure_epoch_us`, which branches on the *resolved* Spark dtype and
yields BIGINT epoch **microseconds** — exact integer math from there on.

The NTZ branch is built from date/time parts, so it is independent of
``spark.sql.session.timeZone`` and bit-identical to DuckDB's ``epoch_us()``
on the same NTZ values (the property the correctness oracle relies on).
``unix_micros(cast(ts as timestamp))`` would NOT be: the NTZ→TZ cast
reinterprets the wall-clock in session time. Tz-aware ``timestamp``
columns are already instants, so for THEM ``unix_micros`` is the exact
(and session-tz-independent) extraction and the parts path is the trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_SEC = 1_000_000


def epoch_seconds_col(ts_col) -> F.Column:
    """timestamp / TIMESTAMP_NTZ → epoch seconds, session-timezone
    independent (built from date/time parts, so it matches DuckDB's
    ``epoch()`` on NTZ data)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (
        F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )


def epoch_micros_col(ts_col) -> F.Column:
    """timestamp / TIMESTAMP_NTZ → epoch microseconds, session-timezone
    independent. ``date_format(.., 'SSSSSS')`` supplies the sub-second
    digits the parts sum can't see; matches DuckDB ``epoch_us()``."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return epoch_seconds_col(c) * F.lit(US_PER_SEC).cast("long") + F.date_format(
        c, "SSSSSS"
    ).cast("long")


_INT_UNIT_TO_US = {"ns": ("div", 1_000), "us": (None, 1), "ms": ("mul", 1_000), "s": ("mul", 1_000_000)}


def ensure_epoch_us(df: DataFrame, col: str = "ts", int_unit: str = "ns") -> DataFrame:
    """Normalize ``df[col]`` to BIGINT epoch microseconds, branching on the
    RESOLVED dtype (never the assumed physical parquet type):

    - ``timestamp_ntz`` → parts-based extraction (wall-clock, tz-free);
    - ``timestamp`` (tz-aware instant) → ``unix_micros`` — exact for
      instants regardless of ``spark.sql.session.timeZone``. The
      parts-based path would be WRONG here: the parts are rendered in
      session time, so a non-UTC session would shift every epoch by the
      session offset (and disagree with DuckDB's ``epoch_us``);
    - integer → interpreted per ``int_unit`` (``"ns"`` by default, the
      contract of ``spark.sql.legacy.parquet.nanosAsLong`` reads).

    Works on batch and streaming DataFrames (schema-only inspection).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"column {col!r} not found; have {df.columns}")
    if dtype == "timestamp":
        return df.withColumn(col, F.unix_micros(F.col(col)))
    if dtype.startswith("timestamp"):
        return df.withColumn(col, epoch_micros_col(col))
    if dtype in ("bigint", "int", "long"):
        op, k = _INT_UNIT_TO_US[int_unit]
        c = F.col(col).cast("long")
        if op == "div":
            c = F.expr(f"CAST({col} AS BIGINT) div {k}")
        elif op == "mul":
            c = c * F.lit(k).cast("long")
        return df.withColumn(col, c)
    raise TypeError(f"cannot normalize {col!r} of type {dtype} to epoch micros")
