"""Refresh telemetry + prefetcher stats (SURVEY §2.10; reference
``SourceRefreshStats``, src/ingestion.rs:204-217, and ``PrefetcherStats``,
src/sampler/mod.rs:165-171).

The reference's numbers are thread-local counters around blocking I/O. The
Spark analogue instruments the *action* that materializes a source refresh
(the count/write that forces the lazy plan) with wall-clock + row-count
telemetry, and exposes the registry as a DataFrame so stats are queryable
like every other table. Executor-side detail (bytes read, tasks, spill)
already lives in the Spark UI / event log — this layer carries only the
reference-parity fields.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class SourceRefreshStats:
    """Last-refresh telemetry captured per source (ingestion.rs:204-217)."""

    last_refresh_ms: int = 0
    last_record_count: int = 0
    last_records_per_sec: float = 0.0
    last_error: str | None = None
    error_count: int = 0


@dataclass
class RefreshTelemetry:
    """Per-source refresh registry (ingestion.rs:189-202): a monotonic
    generation bumped whenever at least one source refreshes, plus the ids
    refreshed in the most recent cycle."""

    stats: dict[str, SourceRefreshStats] = field(default_factory=dict)
    source_refresh_generation: int = 0
    last_refreshed_sources: list[str] = field(default_factory=list)

    def record_refresh(self, source_id: str, refresh_fn):
        """Run ``refresh_fn`` (an action materializing the source — e.g.
        ``lambda: df.count()``) under telemetry. Returns its result; errors
        are recorded (error_count, last_error) and re-raised."""
        st = self.stats.setdefault(source_id, SourceRefreshStats())
        t0 = time.monotonic()
        try:
            n = refresh_fn()
        except Exception as exc:  # noqa: BLE001 — telemetry must see any failure
            st.last_error = f"{type(exc).__name__}: {exc}"[:500]
            st.error_count += 1
            raise
        ms = int((time.monotonic() - t0) * 1000)
        st.last_refresh_ms = ms
        st.last_record_count = int(n) if isinstance(n, int) else 0
        st.last_records_per_sec = (
            st.last_record_count / (ms / 1000.0) if ms > 0 else float(st.last_record_count)
        )
        st.last_error = None
        return n

    def begin_cycle(self) -> None:
        self.last_refreshed_sources = []

    def end_cycle(self, refreshed: list[str]) -> None:
        """Close a refresh_all cycle (ingestion.rs:195-201): generation
        bumps only when at least one source refreshed; the refreshed list
        is replaced either way (cleared when nothing refreshed)."""
        self.last_refreshed_sources = list(refreshed)
        if refreshed:
            self.source_refresh_generation += 1

    def to_frame(self, spark):
        """Stats as a queryable DataFrame (one row per source)."""
        rows = [
            (
                sid, st.last_refresh_ms, st.last_record_count,
                float(st.last_records_per_sec), st.last_error, st.error_count,
            )
            for sid, st in sorted(self.stats.items())
        ]
        return spark.createDataFrame(
            rows,
            "source string, last_refresh_ms long, last_record_count long, "
            "last_records_per_sec double, last_error string, error_count long",
        )


@dataclass
class PrefetcherStats:
    """Prefetcher runtime counters (src/sampler/mod.rs:165-171)."""

    queued: int = 0
    produced: int = 0
    errors: int = 0
