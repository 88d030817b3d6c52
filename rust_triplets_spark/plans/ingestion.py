"""IngestionManager — registry of sources unified into one canonical
records frame (SURVEY §2.1; reference ``src/ingestion.rs:189-681``).

The reference manages per-source buffers, a bounded LRU record cache, and
thread-per-source refresh. On Spark the cache tier disappears — a source
IS a lazy DataFrame and the cluster is the buffer — so the manager keeps
exactly the responsibilities that still exist at 100 TB:

- a **registry** of heterogeneous sources (csv / file-tree / in-memory /
  HF parquet / raw parquet) resolved to canonical ``RECORD_SCHEMA``
  frames, with ``record.source`` normalized to the registered id
  (``src/ingestion.rs:643-655``);
- **refresh** (all / subset / force) that materializes each source under
  per-source telemetry (``SourceRefreshStats``, ``src/ingestion.rs:
  204-217``) and bumps the refresh generation — Spark schedules the
  per-source jobs in parallel natively (the ``thread::scope`` analog,
  ``:462-506``);
- **weight validation** with the reference's exact error semantics
  (``src/ingestion.rs:407-425``): unknown source or negative weight →
  ``InvalidWeightError``; unlisted sources default to 1.0; all-zero →
  uniform fallback;
- a **grouped refresh page** (``src/source/indexing/grouping.rs:27-140``):
  a bounded page of records capped at ``ceil(limit / n_sources)`` per
  source so no dominant source floods the page.

Downstream stages (split/chunk/sample) consume ``records()`` /
``sections()`` like any other frame; the BM25 incremental index consumes
``last_refreshed_sources`` to rebuild only refreshed postings
(operators/bm25.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_col
from rust_triplets_spark.plans.telemetry import RefreshTelemetry
from rust_triplets_spark.schema import explode_sections


class InvalidWeightError(ValueError):
    """Mirror of the reference's ``SamplerError::InvalidWeight``
    (``src/ingestion.rs:407-425``)."""


@dataclass
class SourceSpec:
    """One registered source: ``kind`` picks the reader, ``config`` is its
    reader-specific config object (CsvSourceConfig / FileSourceConfig /
    HfSourceConfig / a records list / a parquet path)."""

    source_id: str
    kind: str  # 'csv' | 'file' | 'memory' | 'hf' | 'parquet'
    config: Any
    weight: float = 1.0


def _read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    if spec.kind == "csv":
        from rust_triplets_spark.sources.csv_source import read_csv_records

        return read_csv_records(spark, spec.config)
    if spec.kind == "file":
        from rust_triplets_spark.sources.file_source import read_file_records

        return read_file_records(spark, spec.config)
    if spec.kind == "memory":
        from rust_triplets_spark.sources.in_memory import in_memory_records

        return in_memory_records(spark, spec.source_id, spec.config)
    if spec.kind == "hf":
        from rust_triplets_spark.sources.hf_source import read_hf_records

        return read_hf_records(spark, spec.config)
    if spec.kind == "parquet":
        return spark.read.parquet(spec.config)
    raise ValueError(f"unknown source kind {spec.kind!r}")


@dataclass
class IngestionManager:
    """Registry + refresh + unified view over heterogeneous sources."""

    spark: SparkSession
    telemetry: RefreshTelemetry = field(default_factory=RefreshTelemetry)
    _specs: dict[str, SourceSpec] = field(default_factory=dict)
    _frames: dict[str, DataFrame] = field(default_factory=dict)

    # -- registry ----------------------------------------------------------

    def register(self, spec: SourceSpec) -> "IngestionManager":
        if spec.source_id in self._specs:
            raise ValueError(f"source {spec.source_id!r} already registered")
        if spec.weight < 0:
            # a negative registered default must not slip past the
            # per-call validation (it would also sum with positives
            # toward the all-zero uniform fallback, masking the error)
            raise InvalidWeightError(
                f"negative registered weight for {spec.source_id!r}: {spec.weight}"
            )
        self._specs[spec.source_id] = spec
        return self

    @property
    def source_ids(self) -> list[str]:
        return list(self._specs)

    # -- resolution --------------------------------------------------------

    def _frame(self, source_id: str) -> DataFrame:
        if source_id not in self._frames:
            spec = self._specs[source_id]
            df = _read_source(self.spark, spec)
            # record.source normalization (src/ingestion.rs:643-655): the
            # registered id wins over whatever the reader emitted
            self._frames[source_id] = df.withColumn("source", F.lit(source_id))
        return self._frames[source_id]

    def records(self, source_ids: list[str] | None = None) -> DataFrame:
        """Union of the canonical records frames of ``source_ids`` (all
        registered sources when None), ``source``-normalized."""
        ids = self.source_ids if source_ids is None else list(source_ids)
        unknown = [s for s in ids if s not in self._specs]
        if unknown:
            raise KeyError(f"unregistered sources: {unknown}")
        if not ids:
            raise ValueError(
                "empty source selection"
                if self._specs
                else "no sources registered"
            )
        out = self._frame(ids[0])
        for s in ids[1:]:
            out = out.unionByName(self._frame(s))
        return out

    def sections(self, source_ids: list[str] | None = None) -> DataFrame:
        return explode_sections(self.records(source_ids))

    # -- refresh -----------------------------------------------------------

    def refresh(
        self,
        source_ids: list[str] | None = None,
        force: bool = False,
        action: Callable[[DataFrame], int] | None = None,
    ) -> dict[str, int]:
        """Materialize each source under telemetry; returns per-source row
        counts. ``force`` drops the resolved frame first (re-reads the
        underlying storage — the reference's force_refresh); ``action``
        overrides the materializing action (default ``df.count()``).
        Bumps ``source_refresh_generation`` once if anything refreshed and
        records ``last_refreshed_sources`` — the signal the incremental
        BM25 index consumes."""
        ids = self.source_ids if source_ids is None else list(source_ids)
        unknown = [s for s in ids if s not in self._specs]
        if unknown:
            raise KeyError(f"unregistered sources: {unknown}")
        act = action or (lambda df: df.count())
        self.telemetry.begin_cycle()
        # one thread per source (the reference's thread::scope refresh,
        # src/ingestion.rs:462-506): Spark schedules concurrently-submitted
        # jobs in parallel, so wall-clock is the slowest source, not the
        # sum. Frame resolution stays on the calling thread (it mutates
        # _frames); only the blocking action fans out.
        frames: dict[str, DataFrame] = {}
        for s in ids:
            if force:
                self._frames.pop(s, None)
            frames[s] = self._frame(s)
        counts: dict[str, int] = {}
        if len(ids) == 1:
            s = ids[0]
            counts[s] = int(self.telemetry.record_refresh(s, lambda: act(frames[s])))
        elif ids:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(ids))) as pool:
                futs = {
                    s: pool.submit(
                        self.telemetry.record_refresh,
                        s,
                        (lambda df: (lambda: act(df)))(frames[s]),
                    )
                    for s in ids
                }
                counts = {s: int(f.result()) for s, f in futs.items()}
        self.telemetry.end_cycle(ids)
        return counts

    def refresh_all(self, force: bool = False) -> dict[str, int]:
        return self.refresh(None, force=force)

    # -- weights (src/ingestion.rs:407-425) --------------------------------

    def resolve_weights(
        self, weights: dict[str, float] | None
    ) -> dict[str, float]:
        """Validated effective per-source weights: unknown source or
        negative weight → :class:`InvalidWeightError`; unlisted sources
        default 1.0; all-zero → uniform fallback."""
        ids = self.source_ids
        weights = dict(weights or {})
        unknown = [s for s in weights if s not in self._specs]
        if unknown:
            raise InvalidWeightError(f"unknown sources in weights: {unknown}")
        negative = {s: w for s, w in weights.items() if w < 0}
        if negative:
            raise InvalidWeightError(f"negative weights: {negative}")
        eff = {s: float(weights.get(s, self._specs[s].weight)) for s in ids}
        if sum(eff.values()) == 0.0:
            eff = {s: 1.0 for s in ids}  # all-zero → uniform
        return eff

    # -- grouped refresh page (grouping.rs:27-140) -------------------------

    def refresh_page(self, limit: int = 100, seed: int = 42) -> DataFrame:
        """A bounded page of records for one refresh cycle, capped at
        ``ceil(limit / n_sources)`` per source (deterministic seeded-hash
        order within each source) so no dominant source floods the page."""
        n = len(self._specs)
        if n == 0:
            raise ValueError("no sources registered")
        cap = -(-limit // n)  # ceil
        recs = self.records().withColumn("__k", hash31_str_col("id", seed))
        # per-source rank via range-bucketed ranking, not
        # row_number() OVER (PARTITION BY source) — a low-cardinality
        # partition window funnels each source's whole record set through
        # one task (functions/ordering.py module doc)
        from rust_triplets_spark.functions.ordering import bucketed_position

        ranked = bucketed_position(
            recs, "__k", ["id"], part_cols=["source"], out_col="__rn"
        )
        return ranked.where(F.col("__rn") < cap).drop("__rn", "__k")
