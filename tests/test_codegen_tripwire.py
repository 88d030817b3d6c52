"""Codegen-fallback tripwire.

Janino's 64 KB method limit makes whole-stage codegen compilation fail for
oversized generated methods (chained mix31 subtrees duplicated inside one
explode did exactly this to minhash_lsh_pairs before commit 6907776); by
default Spark logs a WARN and silently drops the stage to interpreted
execution — ~10x slower and invisible to every correctness check. With
``spark.sql.codegen.fallback=false`` the compile failure RAISES instead,
so executing every registered query under that flag turns any future
regression into a red test instead of a silent slowdown.

The first test self-validates the mechanism by rebuilding the pre-fix
shape (several duplicated hash chains inlined in one explode) and
asserting it raises under the flag while running fine without it.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_fallback(spark):
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", "true")


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def test_tripwire_mechanism_catches_janino_overflow(no_fallback):
    """The pre-6907776 minhash shape (hash chains duplicated inside one
    Generate) must RAISE under the flag — proving the flag actually
    converts the silent interpreted-mode fallback into an error — and
    run fine (interpreted) without it."""
    from rust_triplets_spark.functions.hashing import hash31_col

    spark = no_fallback
    df = spark.range(10).select(F.col("id").alias("x"))

    def chained(j: int):
        h = F.col("x") + F.lit(j)
        for i in range(7):  # each step references h twice -> 2^7 subtree
            h = hash31_col(h, i)
        return h

    big = df.select(
        F.explode(
            F.array(*[F.struct(chained(j).alias("h")) for j in range(6)])
        ).alias("s")
    )
    with pytest.raises(Exception, match="(?i)compil"):
        _run(big)
    spark.conf.set("spark.sql.codegen.fallback", "true")
    _run(big)  # silent-fallback mode still executes it


def test_all_registered_queries_compile_within_codegen_limits(no_fallback):
    """Every registry query executes end-to-end with codegen fallback
    DISABLED: no plan may rely on silent interpreted-mode execution."""
    from rust_triplets_spark.plans import driver_queries as DQ

    failures = {}
    for name, fn in DQ.QUERIES.items():
        try:
            _run(fn(no_fallback, SF))
        except Exception as exc:  # noqa: BLE001 — collected for the report
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
    assert not failures, f"codegen overflow (silent-slowdown) queries: {failures}"
