"""IngestionManager semantics (reference src/ingestion.rs:189-681):
registry, source normalization, refresh telemetry + generation, weight
validation error surface, grouped refresh page cap."""

import pytest

from rust_triplets_spark.plans.ingestion import (
    IngestionManager,
    InvalidWeightError,
    SourceSpec,
)


def _mgr(spark) -> IngestionManager:
    def recs(prefix, n, claimed_source=None):
        return [
            {
                "id": f"{prefix}{i}",
                "sections": [{"role": "anchor", "text": f"{prefix} body {i}"}],
                **({"source": claimed_source} if claimed_source else {}),
            }
            for i in range(n)
        ]

    m = IngestionManager(spark)
    m.register(SourceSpec("alpha", "memory", recs("a", 7)))
    m.register(SourceSpec("beta", "memory", recs("b", 3), weight=2.0))
    return m


def test_union_and_source_normalization(spark):
    m = _mgr(spark)
    rows = m.records().collect()
    assert len(rows) == 10
    assert {r.source for r in rows} == {"alpha", "beta"}
    by_src = {s: sum(1 for r in rows if r.source == s) for s in ("alpha", "beta")}
    assert by_src == {"alpha": 7, "beta": 3}
    # sections view flows through
    assert m.sections().count() == 10


def test_duplicate_and_unknown_sources_error(spark):
    m = _mgr(spark)
    with pytest.raises(ValueError, match="already registered"):
        m.register(SourceSpec("alpha", "memory", []))
    with pytest.raises(KeyError, match="unregistered"):
        m.records(["alpha", "nope"])
    with pytest.raises(KeyError, match="unregistered"):
        m.refresh(["nope"])


def test_refresh_telemetry_and_generation(spark):
    m = _mgr(spark)
    assert m.telemetry.source_refresh_generation == 0
    counts = m.refresh_all()
    assert counts == {"alpha": 7, "beta": 3}
    assert m.telemetry.source_refresh_generation == 1
    assert sorted(m.telemetry.last_refreshed_sources) == ["alpha", "beta"]
    st = m.telemetry.stats["alpha"]
    assert st.last_record_count == 7 and st.last_error is None
    # subset refresh bumps the generation again, only listing the subset
    m.refresh(["beta"], force=True)
    assert m.telemetry.source_refresh_generation == 2
    assert m.telemetry.last_refreshed_sources == ["beta"]
    # empty refresh: no generation bump, refreshed list CLEARED (end_cycle
    # contract — a no-op cycle must not leave stale 'freshly refreshed'
    # signals for the incremental BM25 consumer)
    assert m.refresh([]) == {}
    assert m.telemetry.source_refresh_generation == 2
    assert m.telemetry.last_refreshed_sources == []


def test_weight_validation_matches_reference(spark):
    m = _mgr(spark)
    # unlisted default to the registered weight
    eff = m.resolve_weights({"alpha": 3.0})
    assert eff == {"alpha": 3.0, "beta": 2.0}
    with pytest.raises(InvalidWeightError, match="unknown"):
        m.resolve_weights({"ghost": 1.0})
    with pytest.raises(InvalidWeightError, match="negative"):
        m.resolve_weights({"alpha": -1.0})
    # all-zero -> uniform fallback
    assert m.resolve_weights({"alpha": 0.0, "beta": 0.0}) == {
        "alpha": 1.0,
        "beta": 1.0,
    }


def test_refresh_page_caps_per_source(spark):
    m = _mgr(spark)
    page = m.refresh_page(limit=4).collect()
    # ceil(4/2)=2 per source -> 4 rows, no source flooding
    per = {}
    for r in page:
        per[r.source] = per.get(r.source, 0) + 1
    assert per == {"alpha": 2, "beta": 2}
    # deterministic: same page every call
    again = m.refresh_page(limit=4).collect()
    assert {r.id for r in page} == {r.id for r in again}


def test_negative_registered_weight_rejected(spark):
    m = IngestionManager(spark)
    with pytest.raises(InvalidWeightError, match="negative registered"):
        m.register(SourceSpec("bad", "memory", [], weight=-5.0))
