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


def test_prefetcher_overlaps_producer_ahead_of_consumer():
    """src/sampler/mod.rs:159-248: the producer thread runs ahead of the
    consumer up to the queue capacity, and the stats see it."""
    import time

    from rust_triplets_spark.plans.batches import BatchPrefetcher

    def slow_batches():
        for i in range(6):
            yield i, f"batch{i}"

    with BatchPrefetcher(slow_batches(), capacity=3) as pf:
        # let the producer fill the bounded queue before we consume
        deadline = time.monotonic() + 5
        while pf.produced_count() < 3 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert pf.produced_count() >= 3  # ran ahead without any consumption
        assert pf.queue_len() >= 3
        got = list(pf)
    assert got == [(i, f"batch{i}") for i in range(6)]
    assert pf.produced_count() == 6
    assert pf.error_count() == 0


def test_prefetcher_forwards_producer_errors():
    import pytest

    from rust_triplets_spark.plans.batches import BatchPrefetcher

    def failing():
        yield 0, "ok"
        raise RuntimeError("boom")

    with BatchPrefetcher(failing(), capacity=2) as pf:
        assert next(pf) == (0, "ok")
        with pytest.raises(RuntimeError, match="boom"):
            next(pf)
        assert pf.error_count() == 1


def test_prefetcher_close_unblocks_stuck_producer():
    """close() must terminate a producer blocked on a full queue — the
    Drop-parity clean shutdown."""
    from rust_triplets_spark.plans.batches import BatchPrefetcher

    def endless():
        i = 0
        while True:
            yield i, "x"
            i += 1

    pf = BatchPrefetcher(endless(), capacity=1)
    next(pf)  # producer now certainly blocked refilling the queue
    pf.close()
    assert not pf._thread.is_alive()
    pf.close()  # idempotent


def test_prefetched_batch_iterator_end_to_end(spark):
    from rust_triplets_spark.plans.batches import Checkpoint, prefetched_batch_iterator
    from rust_triplets_spark.plans.telemetry import PrefetcherStats

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(64)], "id long, source string"
    )
    stats = PrefetcherStats()
    ck = Checkpoint(seed=42, epoch=0, step=0)
    from rust_triplets_spark.operators.epoch import epoch_order

    n_positions = epoch_order(df, "id", "source", 0, 42, id_is_string=False).count()
    with prefetched_batch_iterator(
        df, "id", "source", ck, batch_size=16, capacity=2,
        id_is_string=False, stats=stats,
    ) as pf:
        batches = list(pf)
    # epoch order oversamples small sources, so positions >= raw rows
    n_batches = -(-n_positions // 16)
    assert [b[0] for b in batches] == list(range(n_batches))
    assert sum(len(b[1]) for b in batches) == n_positions >= 64
    assert stats.produced == n_batches and stats.errors == 0


def test_prefetcher_stopiteration_latches(spark):
    """Post-termination pulls must raise StopIteration repeatedly (the
    iterator protocol), not park forever on the drained queue."""
    from rust_triplets_spark.plans.batches import BatchPrefetcher

    pf = BatchPrefetcher(iter([1, 2]), capacity=2)
    assert list(pf) == [1, 2]
    import pytest as _pytest

    for _ in range(3):
        with _pytest.raises(StopIteration):
            next(pf)


def test_prefetcher_exception_latches(spark):
    from rust_triplets_spark.plans.batches import BatchPrefetcher

    def boom():
        yield 1
        raise RuntimeError("producer died")

    pf = BatchPrefetcher(boom(), capacity=2)
    assert next(pf) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        next(pf)
    # after the forwarded exception the iterator is terminal, not hung
    with _pytest.raises(StopIteration):
        next(pf)
