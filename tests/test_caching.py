"""Unpersist discipline: scoped caches hold at most ONE generation per
scope across repeated operator calls, and ``release_all`` leaves the
session's cache manager empty — the library caller contract (see
functions/caching.py docstring): call ``caching.release_all()`` (or
``release_scope``) when done consuming the returned frames."""

from rust_triplets_spark.functions import caching


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_repeated_calls_keep_one_generation_and_release_all_empties(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    caching.release_all()
    spark.catalog.clearCache()  # isolate from other tests' persisted frames
    sf = "/root/testdata/sf0.001"

    QUERIES["triplet_assembly"](spark, sf).write.format("noop").mode("overwrite").save()
    scopes_after_first = {k: len(v) for k, v in caching._LIVE.items()}
    assert scopes_after_first, "triplet assembly should register scoped caches"

    # a second invocation must not accumulate a second generation
    QUERIES["triplet_assembly"](spark, sf).write.format("noop").mode("overwrite").save()
    scopes_after_second = {k: len(v) for k, v in caching._LIVE.items()}
    assert scopes_after_second == scopes_after_first

    caching.release_all()
    assert not caching._LIVE
    assert _cache_empty(spark)


def test_bm25_round_trip_releases_clean(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    caching.release_all()
    spark.catalog.clearCache()
    QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    caching.release_all()
    assert _cache_empty(spark)
