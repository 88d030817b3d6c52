"""In-memory source (SURVEY §2.1 ``InMemorySource``, reference
``src/source/backends/in_memory_source.rs:45-130``): list-of-dicts →
canonical records DataFrame, for tests and small corpora."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_triplets_spark.schema import DEFAULT_TRUST, RECORD_SCHEMA


def in_memory_records(
    spark: SparkSession, source_id: str, records: list[dict]
) -> DataFrame:
    """Each record dict: ``{id, sections: [{role, text, heading?}], trust?,
    taxonomy?, created_at?, updated_at?}``; ids are namespaced with the
    source (``record.source`` normalization, src/ingestion.rs:643-655)."""
    rows = []
    for rec in records:
        rows.append(
            (
                str(rec["id"]),
                source_id,
                rec.get("created_at"),
                rec.get("updated_at"),
                float(rec.get("trust", DEFAULT_TRUST)),
                [str(t) for t in rec.get("taxonomy", [source_id])],
                [
                    (
                        s["role"],
                        s.get("heading"),
                        s["text"],
                        s.get("sentences"),
                    )
                    for s in rec["sections"]
                ],
            )
        )
    return spark.createDataFrame(rows, RECORD_SCHEMA)
