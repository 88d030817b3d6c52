"""Canonical record schema (SURVEY §1.1, reference ``src/data.rs:27-153``).

One `records` DataFrame shape for every source; per-source column mapping
happens at read time (``select``/``coalesce``), mirroring the reference's
fixed-struct / dynamic-source-boundary split (SURVEY §1 "Orientation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TRUST = 0.5  # QualityScore default (src/data.rs:11-23)
CSV_DEFAULT_TRUST = 0.85  # csv_source.rs:275-334

SECTION_SCHEMA = T.StructType([
    T.StructField("role", T.StringType(), False),  # 'anchor' | 'context'
    T.StructField("heading", T.StringType(), True),
    T.StructField("text", T.StringType(), False),
    T.StructField("sentences", T.ArrayType(T.StringType()), True),
])

RECORD_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
    T.StructField("trust", T.FloatType(), False),
    T.StructField("taxonomy", T.ArrayType(T.StringType()), False),
    T.StructField("sections", T.ArrayType(SECTION_SCHEMA), False),
])


def explode_sections(records: DataFrame) -> DataFrame:
    """records → one row per section: (record_id, source, trust, taxonomy,
    created_at, section_idx, role, heading, text, sentences)."""
    return records.select(
        F.col("id").alias("record_id"),
        "source",
        "trust",
        "taxonomy",
        "created_at",
        F.posexplode("sections").alias("section_idx", "__sec"),
    ).select(
        "record_id", "source", "trust", "taxonomy", "created_at", "section_idx",
        F.col("__sec.role").alias("role"),
        F.col("__sec.heading").alias("heading"),
        F.col("__sec.text").alias("text"),
        F.col("__sec.sentences").alias("sentences"),
    )


def make_section(role: str, text, heading=None) -> F.Column:
    """Column constructor mirroring ``make_section`` (src/utils.rs:57-64);
    sentence precompute is attached by the ingest pipeline (UDF) when
    needed, not here."""
    t = F.col(text) if isinstance(text, str) else text
    return F.struct(
        F.lit(role).alias("role"),
        (F.col(heading) if isinstance(heading, str) else (heading if heading is not None else F.lit(None))).cast("string").alias("heading"),
        t.cast("string").alias("text"),
        F.lit(None).cast("array<string>").alias("sentences"),
    )
