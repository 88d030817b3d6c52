"""Curriculum ordering — a deterministic easy→hard training order from
the corpus-trained bigram-LM difficulty signal.

Curriculum learning schedules cleaner/easier documents first and lets
harder material arrive once the model has a footing; data-ordering papers
(Bengio et al. 2009 curricula; the C4/CCNet perplexity-ordered variants)
all reduce to the same mechanical need: a TOTAL, reproducible order over
the corpus keyed by a difficulty score, with deterministic tie-breaking,
plus coarse phase labels the loader can cut over. The reference engine
orders batches by seeded shuffle only (src/sampler/mod.rs epoch machinery)
— difficulty-keyed ordering is north-star scope for the 100 TB pipeline.

Difficulty = the per-transition quantized bigram NLL
(:func:`...lm_quality.bigram_lm_scores`): integer ``nll_q DIV
n_transitions`` — pure int64 arithmetic on already-exact quantities, so
both engines order identically with no float comparisons anywhere in the
sort key. Unscored documents (< 2 tokens) get difficulty −1: they sort
first, harmlessly, and keep a total order over EVERY document.

Scale shape: one LM scoring pass (linear, see lm_quality's module doc),
then a range-bucketed parallel rank (:func:`...functions.ordering.
bucketed_position_numeric`) — NEVER a single-partition global sort; the
rank runs (n_buckets)-way parallel with a tiny bounds/offset prepass.
Phase labels are integer band arithmetic on (rank, total), the same
exact-band formula as the CCNet tertiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_col, hash31_sql
from rust_triplets_spark.operators.lm_quality import (
    LM_SEED,
    bigram_lm_scores,
    bigram_lm_scores_sql,
)

PHASE_NAMES = ("warmup", "main", "anneal")
CURRICULUM_SEED = 2307


def curriculum_order(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = CURRICULUM_SEED,
    lm_seed: int = LM_SEED,
    n_phases: int = 3,
) -> DataFrame:
    """``(id, difficulty_q, curriculum_rank, phase)`` — a total easy→hard
    order over every input document.

    ``curriculum_rank`` is the 0-based rank by ``(difficulty_q,
    hash31(id, seed), id)`` — the seeded hash shuffles equal-difficulty
    runs (synthetic corpora produce many ties) so a difficulty band is
    not secretly ordered by ingestion id; the trailing ``id`` makes the
    order total even across hash collisions. ``phase`` cuts the rank
    range into ``n_phases`` exact integer bands (sizes differ by ≤ 1),
    named warmup/main/anneal for the canonical 3."""
    if n_phases < 1:
        raise ValueError(f"n_phases must be >= 1, got {n_phases}")
    names = PHASE_NAMES if n_phases == 3 else tuple(
        f"p{i}" for i in range(n_phases)
    )
    from rust_triplets_spark.functions.ordering import bucketed_position_numeric

    scores = bigram_lm_scores(df, id_col, text_col, lm_seed)
    keyed = scores.select(
        "id",
        F.when(
            F.col("n_transitions") > 0,
            # `div`, never `/`: float division then cast would lose
            # exactness once nll_q outgrows 2^53 on a web-scale document
            F.expr("nll_q div n_transitions").cast("long"),
        ).otherwise(F.lit(-1)).alias("difficulty_q"),
        hash31_col(F.col("id"), seed).alias("__h"),
    )
    ranked = bucketed_position_numeric(
        keyed,
        "difficulty_q",
        tiebreak=("__h", "id"),
        out_col="curriculum_rank",
        count_col="__n",
    )
    # band of 1-indexed rank rn in n rows: (rn·P − 1) div n — the exact
    # integer band split shared with lm_quality.quality_buckets, and
    # `div` (not `/`+cast) per the same 2^53 rule as difficulty_q
    band = F.expr(
        f"((curriculum_rank + 1) * {int(n_phases)} - 1) div __n"
    ).cast("long")
    phase = F.element_at(
        F.array(*[F.lit(nm) for nm in names]), (band + 1).cast("int")
    )
    return ranked.select(
        "id",
        "difficulty_q",
        F.col("curriculum_rank").cast("long").alias("curriculum_rank"),
        phase.alias("phase"),
    )


def curriculum_order_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    seed: int = CURRICULUM_SEED,
    lm_seed: int = LM_SEED,
    n_phases: int = 3,
) -> str:
    """DuckDB twin of :func:`curriculum_order` (a plain global
    ``row_number`` — the oracle does not need the bucketed-rank
    decomposition)."""
    if n_phases < 1:
        raise ValueError(f"n_phases must be >= 1, got {n_phases}")
    names = PHASE_NAMES if n_phases == 3 else tuple(
        f"p{i}" for i in range(n_phases)
    )
    names_sql = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    lm = bigram_lm_scores_sql(table, id_sql, text_sql, lm_seed)
    return f"""
WITH cu_scores AS MATERIALIZED ({lm}),
cu_keyed AS (
  SELECT id,
         CASE WHEN n_transitions > 0
              THEN CAST(nll_q // n_transitions AS BIGINT)
              ELSE -1 END AS difficulty_q,
         {hash31_sql('id', seed)} AS h
  FROM cu_scores
),
cu_ranked AS (
  SELECT id, difficulty_q,
         row_number() OVER (ORDER BY difficulty_q, h, id) - 1
           AS curriculum_rank,
         count(*) OVER () AS n
  FROM cu_keyed
)
SELECT id, difficulty_q,
       CAST(curriculum_rank AS BIGINT) AS curriculum_rank,
       ({names_sql})[CAST(((curriculum_rank + 1) * {n_phases} - 1) // n
                          AS BIGINT) + 1] AS phase
FROM cu_ranked
"""
