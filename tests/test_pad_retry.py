"""The reference's fixed-size batch contract: pad_with_reuse cyclic
padding (src/sampler/mod.rs:3091-3100) and the exhaustion-retry loop
(src/sampler/mod.rs:2853-2864, EXHAUSTION_RETRY_LIMIT src/constants.rs:81)
— both previously SURVEY-documented drops, now implemented in
plans/batches.py."""

import pytest
from pyspark.sql import Row


def _ordered(spark, n):
    return spark.createDataFrame(
        [Row(position=i, id=100 + i, source=f"s{i % 2}") for i in range(n)],
        schema="position long, id long, source string",
    )


def _reference_pad(items, target):
    """Literal transcription of the reference loop, as the test oracle."""
    items = list(items)
    if not items or len(items) >= target:
        return items
    seed = list(items)
    for idx in range(target - len(items)):
        items.append(seed[idx % len(seed)])
    return items


@pytest.mark.parametrize("n,target", [(3, 10), (7, 8), (1, 5), (10, 10), (12, 8)])
def test_pad_matches_reference_loop(spark, n, target):
    from rust_triplets_spark.plans.batches import pad_with_reuse

    rows = pad_with_reuse(_ordered(spark, n), target).collect()
    got = [r.id for r in sorted(rows, key=lambda r: r.slot)]
    expect = [r.id for r in _reference_pad(
        [Row(position=i, id=100 + i) for i in range(n)], target
    )]
    assert got == expect
    assert [r.slot for r in sorted(rows, key=lambda r: r.slot)] == list(range(len(expect)))
    assert all(r.reused == (r.slot >= n) for r in rows)


def test_pad_empty_stays_empty(spark):
    from rust_triplets_spark.plans.batches import pad_with_reuse

    assert pad_with_reuse(_ordered(spark, 0), 16).count() == 0


def test_pad_oversized_passes_through_untruncated(spark):
    from rust_triplets_spark.plans.batches import pad_with_reuse

    rows = pad_with_reuse(_ordered(spark, 20), 8).collect()
    assert len(rows) == 20  # the reference never truncates
    assert not any(r.reused for r in rows)


def test_pad_validates_batch_size(spark):
    from rust_triplets_spark.plans.batches import pad_with_reuse, pad_with_reuse_sql

    with pytest.raises(ValueError):
        pad_with_reuse(_ordered(spark, 3), 0)
    with pytest.raises(ValueError):
        pad_with_reuse_sql("SELECT 1 AS position", 0)


def test_exhaustion_retry_refreshes_then_succeeds():
    from rust_triplets_spark.plans.batches import Exhausted, fetch_with_exhaustion_retry

    calls = {"fetch": 0, "refresh": 0}

    def fetch():
        calls["fetch"] += 1
        if calls["fetch"] < 3:
            raise Exhausted("empty")
        return "batch"

    assert fetch_with_exhaustion_retry(fetch, lambda: calls.__setitem__(
        "refresh", calls["refresh"] + 1)) == "batch"
    assert calls == {"fetch": 3, "refresh": 2}


def test_exhaustion_retry_gives_up_after_limit():
    from rust_triplets_spark.plans.batches import Exhausted, fetch_with_exhaustion_retry

    calls = {"fetch": 0, "refresh": 0}

    def fetch():
        calls["fetch"] += 1
        raise Exhausted("still empty")

    def refresh():
        calls["refresh"] += 1

    with pytest.raises(Exhausted):
        fetch_with_exhaustion_retry(fetch, refresh)
    # limit=2 → 3 attempts, refresh BETWEEN attempts only (never after the
    # final failure) — the reference's exact loop shape
    assert calls == {"fetch": 3, "refresh": 2}


def test_exhaustion_retry_other_errors_propagate_immediately():
    from rust_triplets_spark.plans.batches import fetch_with_exhaustion_retry

    calls = {"refresh": 0}

    def fetch():
        raise RuntimeError("real failure")

    def refresh():
        calls["refresh"] += 1

    with pytest.raises(RuntimeError, match="real failure"):
        fetch_with_exhaustion_retry(fetch, refresh)
    assert calls["refresh"] == 0
