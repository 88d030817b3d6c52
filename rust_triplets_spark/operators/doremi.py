"""DoReMi-style domain reweighting — a multiplicative-weights update of
the per-source training mixture from per-source excess loss.

DoReMi (Xie et al. 2023, "Doremi: Optimizing Data Mixtures Speeds Up
Language Model Pretraining") reweights pretraining domains toward the
ones where the proxy model's loss exceeds a reference — one
multiplicative-weights step per proxy-training round. The full algorithm
needs two trained models; the ENGINE's job is the data-side step, and
this module implements exactly that step with a deterministic excess-loss
signal the repo already trusts: the corpus-trained bigram LM
(:mod:`...operators.lm_quality`). Each source's mean per-transition NLL
minus the corpus-wide mean stands in for the proxy-vs-reference excess;
production callers feed real per-domain loss deltas through the same
arithmetic. The reference engine's mixture is static per-call weights
(src/sampler/mod.rs weighted interleave; SURVEY §2.7) — a loss-adaptive
update is north-star scope. Complements the static allocators in
:mod:`...operators.mixing` (temperature mix = count-based prior; this =
loss-adaptive posterior).

Engine-exact arithmetic (the temperature-mix pattern): all sums are
int64 (``nll_q`` and transition counts are already exact integers); the
two floating-point steps — one ``exp`` per SOURCE and the share division
— are immediately quantized to integer grids (``round(x·1e12)``), so a
sub-ulp libm difference flips a weight only on a ~1e-12 knife-edge.
Normalization divides by an exact integer sum, never a float sum (float
summation order differs across engines; integer summation is order-free).

Range contract: the MW exponent is clamped to ±10 (exp ≤ 2.3e4, so a
quantized score ≤ 2.3e16 and the normalizer stays within int64 for up to
~400 sources — domain mixtures are tens of entries). The clamp is also
statistically right: one MW step should not move a domain by more than
e^10 regardless of how pathological its excess estimate is.

Scale shape: one linear LM scoring pass, one partial-agg groupBy to
per-source rows (tens), one broadcast of the 1-row totals. Nothing
collects; the output is the tiny mixture table the loader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.lm_quality import (
    LM_QSCALE,
    LM_SEED,
    bigram_lm_scores,
    bigram_lm_scores_sql,
)

DOREMI_ETA = 1.0  # MW step size (paper's η)
DOREMI_SMOOTHING = 0.1  # uniform smoothing c: final = (1-c)·w + c/K
DOREMI_CLAMP = 10.0  # |η·excess| cap (module doc: range + statistics)
DOREMI_QSCALE = 1_000_000_000_000  # 1e-12 score grid


def doremi_domain_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    eta: float = DOREMI_ETA,
    smoothing: float = DOREMI_SMOOTHING,
    lm_seed: int = LM_SEED,
) -> DataFrame:
    """One DoReMi multiplicative-weights step over the source mixture.

    Returns one row per source: ``(source, n_docs, n_transitions,
    token_share, excess_nll, weight, smoothed_weight)`` — the prior token
    share, the per-transition excess NLL vs the corpus mean, the updated
    mixture weight ``∝ share · exp(clamp(η·excess))``, and the
    uniform-smoothed weight the loader should consume. Sources whose
    documents are all unscorable (< 2 tokens) carry ``excess_nll`` 0 and
    weight 0 (their token share is 0); if NO source has transitions the
    weights fall back to uniform ``1/K``."""
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    scores = bigram_lm_scores(df, id_col, text_col, lm_seed)
    srcs = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(source_col).alias("source")
    )
    per_src = (
        srcs.join(scores, "id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_transitions").cast("long").alias("n_transitions"),
            F.coalesce(F.sum("nll_q"), F.lit(0)).cast("long").alias("__nllq"),
        )
    )
    totals = per_src.agg(
        F.sum("n_transitions").cast("long").alias("__tot_trans"),
        F.sum("__nllq").cast("long").alias("__tot_nllq"),
        F.count("*").cast("long").alias("__k"),
    )
    j = per_src.crossJoin(F.broadcast(totals))
    qs = float(LM_QSCALE)
    mean_s = F.col("__nllq").cast("double") / (F.col("n_transitions").cast("double") * qs)
    mean_g = F.col("__tot_nllq").cast("double") / (F.col("__tot_trans").cast("double") * qs)
    excess = F.when(
        (F.col("n_transitions") > 0) & (F.col("__tot_trans") > 0), mean_s - mean_g
    ).otherwise(F.lit(0.0))
    share = F.when(
        F.col("__tot_trans") > 0,
        F.col("n_transitions").cast("double") / F.col("__tot_trans").cast("double"),
    ).otherwise(F.lit(0.0))
    bump = F.exp(
        F.least(F.greatest(excess * F.lit(float(eta)), F.lit(-DOREMI_CLAMP)), F.lit(DOREMI_CLAMP))
    )
    scored = j.select(
        "source", "n_docs", "n_transitions",
        share.alias("token_share"),
        excess.alias("excess_nll"),
        F.round(share * bump * F.lit(float(DOREMI_QSCALE))).cast("long").alias("__sq"),
        F.col("__k"),
    )
    norm = scored.agg(F.sum("__sq").cast("long").alias("__w"))
    c = float(smoothing)
    out = scored.crossJoin(F.broadcast(norm)).select(
        "source", "n_docs", "n_transitions", "token_share", "excess_nll",
        F.when(
            F.col("__w") > 0, F.col("__sq").cast("double") / F.col("__w").cast("double")
        ).otherwise(F.lit(1.0) / F.col("__k").cast("double")).alias("weight"),
        "__k",
    )
    return out.select(
        "source", "n_docs", "n_transitions", "token_share", "excess_nll", "weight",
        (
            F.col("weight") * F.lit(1.0 - c) + F.lit(c) / F.col("__k").cast("double")
        ).alias("smoothed_weight"),
    )


def doremi_domain_weights_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    eta: float = DOREMI_ETA,
    smoothing: float = DOREMI_SMOOTHING,
    lm_seed: int = LM_SEED,
) -> str:
    """DuckDB twin of :func:`doremi_domain_weights`."""
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    lm = bigram_lm_scores_sql(table, id_sql, text_sql, lm_seed)
    qs = float(LM_QSCALE)
    c = float(smoothing)
    return f"""
WITH dm_scores AS MATERIALIZED ({lm}),
dm_src AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, {source_sql} AS source FROM {table}
),
dm_per AS (
  SELECT s.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(q.n_transitions) AS BIGINT) AS n_transitions,
         CAST(COALESCE(sum(q.nll_q), 0) AS BIGINT) AS nllq
  FROM dm_src s JOIN dm_scores q ON s.id = q.id
  GROUP BY s.source
),
dm_tot AS (
  SELECT CAST(sum(n_transitions) AS BIGINT) AS tot_trans,
         CAST(sum(nllq) AS BIGINT) AS tot_nllq,
         CAST(count(*) AS BIGINT) AS k
  FROM dm_per
),
dm_scored AS (
  SELECT p.source, p.n_docs, p.n_transitions,
         CASE WHEN t.tot_trans > 0
              THEN CAST(p.n_transitions AS DOUBLE) / CAST(t.tot_trans AS DOUBLE)
              ELSE 0.0 END AS token_share,
         CASE WHEN p.n_transitions > 0 AND t.tot_trans > 0
              THEN CAST(p.nllq AS DOUBLE) / (CAST(p.n_transitions AS DOUBLE) * {qs!r})
                 - CAST(t.tot_nllq AS DOUBLE) / (CAST(t.tot_trans AS DOUBLE) * {qs!r})
              ELSE 0.0 END AS excess_nll,
         t.k
  FROM dm_per p CROSS JOIN dm_tot t
),
dm_q AS (
  SELECT *,
         CAST(round(token_share
               * exp(least(greatest(excess_nll * {float(eta)!r}, -{DOREMI_CLAMP!r}),
                           {DOREMI_CLAMP!r}))
               * {float(DOREMI_QSCALE)!r}) AS BIGINT) AS sq
  FROM dm_scored
),
dm_norm AS (SELECT CAST(sum(sq) AS BIGINT) AS w FROM dm_q)
SELECT source, n_docs, n_transitions, token_share, excess_nll,
       CASE WHEN n.w > 0 THEN CAST(q.sq AS DOUBLE) / CAST(n.w AS DOUBLE)
            ELSE 1.0 / CAST(q.k AS DOUBLE) END AS weight,
       (CASE WHEN n.w > 0 THEN CAST(q.sq AS DOUBLE) / CAST(n.w AS DOUBLE)
             ELSE 1.0 / CAST(q.k AS DOUBLE) END) * {1.0 - c!r}
         + {c!r} / CAST(q.k AS DOUBLE) AS smoothed_weight
FROM dm_q q CROSS JOIN dm_norm n
"""
