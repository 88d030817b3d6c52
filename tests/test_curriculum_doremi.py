"""Curriculum ordering + DoReMi domain reweighting — behavioral pins
(cross-engine exactness is pinned by the registered oracle twins)."""

from pyspark.sql import Row
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("source", T.StringType()),
])

# "easy" = one repeated transition the LM memorizes; "hard" = every
# transition unique (singleton counts → maximal smoothed NLL)
EASY = "aa bb " * 30
HARD_WORDS = " ".join(f"w{i}" for i in range(60))


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=int(i), text=t, source=s) for i, t, s in rows], SCHEMA
    )


def test_curriculum_is_a_total_order_with_exact_phases(spark):
    from rust_triplets_spark.operators.curriculum import curriculum_order

    rows = [(i, EASY if i % 2 else HARD_WORDS, "s") for i in range(7)]
    rows.append((99, "solo", "s"))  # 1 token → unscored
    out = curriculum_order(_df(spark, rows), "doc_id", "text").collect()
    assert len(out) == 8
    ranks = sorted(r.curriculum_rank for r in out)
    assert ranks == list(range(8))
    by_id = {r.id: r for r in out}
    assert by_id[99].difficulty_q == -1 and by_id[99].curriculum_rank == 0
    # every easy doc ranks before every hard doc
    easy_ranks = [r.curriculum_rank for r in out if r.id % 2 == 1 and r.id != 99]
    hard_ranks = [r.curriculum_rank for r in out if r.id % 2 == 0]
    assert max(easy_ranks) < min(hard_ranks)
    # 8 docs / 3 phases → exact integer bands ((rn·3−1) div 8): 2/3/3
    phases = [r.phase for r in sorted(out, key=lambda r: r.curriculum_rank)]
    assert phases == ["warmup"] * 2 + ["main"] * 3 + ["anneal"] * 3


def test_curriculum_tiebreak_is_seeded_not_id_ordered(spark):
    from rust_triplets_spark.operators.curriculum import curriculum_order

    rows = [(i, EASY, "s") for i in range(20)]  # all equal difficulty
    ranked = sorted(
        curriculum_order(_df(spark, rows), "doc_id", "text").collect(),
        key=lambda r: r.curriculum_rank,
    )
    order = [r.id for r in ranked]
    assert order != sorted(order)  # hash shuffles equal-difficulty runs
    # deterministic across invocations
    again = sorted(
        curriculum_order(_df(spark, rows), "doc_id", "text").collect(),
        key=lambda r: r.curriculum_rank,
    )
    assert [r.id for r in again] == order


def test_doremi_upweights_high_loss_domain(spark):
    from rust_triplets_spark.operators.doremi import doremi_domain_weights

    rows = [(i, EASY, "easy") for i in range(10)]
    rows += [(100 + i, HARD_WORDS, "hard") for i in range(10)]
    out = {r.source: r for r in doremi_domain_weights(
        _df(spark, rows), "doc_id", "text", "source"
    ).collect()}
    assert set(out) == {"easy", "hard"}
    for col in ("weight", "smoothed_weight"):
        assert abs(sum(getattr(r, col) for r in out.values()) - 1.0) < 1e-9
    assert out["hard"].excess_nll > 0 > out["easy"].excess_nll
    # MW step moves weight from the easy domain toward the hard one
    assert out["hard"].weight > out["hard"].token_share
    assert out["easy"].weight < out["easy"].token_share
    # smoothing pulls both toward uniform 1/2
    assert out["hard"].smoothed_weight < out["hard"].weight
    assert out["easy"].smoothed_weight > out["easy"].weight


def test_doremi_uniform_fallback_when_nothing_scorable(spark):
    from rust_triplets_spark.operators.doremi import doremi_domain_weights

    rows = [(0, "x", "a"), (1, "y", "b")]  # all docs < 2 tokens
    out = {r.source: r for r in doremi_domain_weights(
        _df(spark, rows), "doc_id", "text", "source"
    ).collect()}
    assert out["a"].weight == 0.5 and out["b"].weight == 0.5
    assert out["a"].smoothed_weight == 0.5
