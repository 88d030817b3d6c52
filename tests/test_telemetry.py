"""Refresh telemetry + prefetcher stats (SURVEY §2.10; reference
src/ingestion.rs:189-217, src/sampler/mod.rs:165-171)."""

import pytest

from rust_triplets_spark.plans.telemetry import PrefetcherStats, RefreshTelemetry


def test_refresh_telemetry_records_success_and_failure(spark):
    tel = RefreshTelemetry()
    df = spark.range(100)

    tel.begin_cycle()
    n = tel.record_refresh("good", lambda: df.count())
    assert n == 100
    with pytest.raises(RuntimeError):
        tel.record_refresh("bad", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    tel.end_cycle(["good"])

    good = tel.stats["good"]
    assert good.last_record_count == 100 and good.last_error is None
    assert good.last_records_per_sec > 0
    bad = tel.stats["bad"]
    assert bad.error_count == 1 and "boom" in bad.last_error
    assert tel.source_refresh_generation == 1
    assert tel.last_refreshed_sources == ["good"]

    # a cycle with no refreshes clears the list and keeps the generation
    tel.begin_cycle()
    tel.end_cycle([])
    assert tel.source_refresh_generation == 1
    assert tel.last_refreshed_sources == []

    frame = tel.to_frame(spark)
    rows = {r["source"]: r for r in frame.collect()}
    assert set(rows) == {"good", "bad"}
    assert rows["good"]["last_record_count"] == 100
    assert rows["bad"]["error_count"] == 1


def test_batch_iterator_counts_prefetcher_stats(spark):
    from rust_triplets_spark.plans.batches import Checkpoint, batch_iterator

    df = spark.createDataFrame(
        [(i, "s") for i in range(40)], "id long, source string"
    )
    stats = PrefetcherStats()
    ck = Checkpoint(seed=42, epoch=0, step=0)
    batches = list(
        batch_iterator(df, "id", "source", ck, batch_size=16,
                       id_is_string=False, stats=stats)
    )
    assert stats.queued == 40
    assert stats.produced == len(batches) == 3  # 16+16+8
    assert stats.errors == 0
