"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public: arXiv:2302.03169).

The standard way to pick pretraining data that *resembles a target
distribution* (e.g. "select web documents that look like Wikipedia"):

1. featurize every document as a bag of HASHED n-grams (unigrams +
   bigrams folded into ``n_buckets`` buckets — the paper's 10k-bucket
   hashed feature space);
2. fit two bag-of-words multinomials over the buckets: ``p`` on the
   target corpus, ``q`` on the raw corpus;
3. per raw document, the log importance weight is
   ``Σ_f  log p(f) − log q(f)`` over its feature occurrences;
4. resample the raw corpus by weight (the deterministic variant ranks by
   length-normalized weight — top slice ≈ most target-like).

Cross-engine exactness (the bigram-LM trick, lm_quality module doc):
α = 1/2 Laplace smoothing kept rational, so both ``ln`` arguments are
exact integers (``2·c_b + 1`` over ``2·T + n_buckets``); the per-bucket
log-ratio is quantized to the 1e-9 grid as int64 once per bucket, and a
document's weight is the exact integer SUM of its occurrences' quantized
ratios — order-free, shuffle-safe, bit-identical in DuckDB.

Scale shape (100 TB): two token-scale exchanges (the per-bucket count
groupBys, map-side combined, output ≤ ``n_buckets`` rows each) plus the
per-doc score groupBy. The bucket table is ``n_buckets`` rows —
broadcast — and totals ride as broadcast single-row frames, never a
driver round-trip. The target corpus is typically tiny next to raw;
nothing here assumes otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_col, hash31_str_sql
from rust_triplets_spark.functions.text import tokens_col, tokens_sql
from rust_triplets_spark.operators.lm_quality import LM_QSCALE

DSIR_SEED = 3_000_017
DSIR_BUCKETS = 10_000  # the paper's hashed feature-space size


def _feature_buckets_col(text_col, n_buckets: int, seed: int) -> F.Column:
    """Row-local ``array<bigint>`` of hashed unigram+bigram feature
    buckets (non-distinct — the multinomial counts occurrences). The
    1-element-array lambda-let binds per-token hashes once; bigram
    fingerprint = hash of the two token hashes' concatenation, folded to
    ``n_buckets`` like the unigrams."""
    th_expr = F.transform(tokens_col(text_col), lambda t: hash31_str_col(t, seed))

    # NB: the bigram fold (th[i]·1_000_003 + th[i+1]) is a SECOND pair-hash
    # scheme next to quality_clf's mix31_step features — kept distinct
    # deliberately (unifying would change every persisted DSIR weight and
    # its oracle); the constant appears exactly twice, here and in the SQL
    # twin below, and the registered oracle pins them against drift.
    def feats(th):
        uni = F.transform(th, lambda h: F.pmod(h, F.lit(n_buckets)).cast("long"))
        k = F.size(th) - 1
        bi = F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.pmod(
                    F.element_at(th, i) * F.lit(1_000_003) + F.element_at(th, i + 1),
                    F.lit(n_buckets),
                ).cast("long"),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(uni, bi)

    return F.flatten(F.transform(F.array(th_expr), feats))


def _feature_buckets_sql(text_sql: str, n_buckets: int, seed: int) -> str:
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, t -> {hash31_str_sql('t', seed)})"
    uni = f"list_transform(__th, h -> CAST(h % {n_buckets} AS BIGINT))"
    bi = (
        f"CASE WHEN len(__th) > 1 THEN list_transform(range(1, len(__th)), "
        f"i -> CAST((__th[i] * 1000003 + __th[i + 1]) % {n_buckets} AS BIGINT)) "
        f"ELSE [] END"
    )
    return (
        f"flatten(list_transform([{th}], __th -> list_concat({uni}, {bi})))"
    )


def dsir_importance_weights(
    raw: DataFrame, target: DataFrame, id_col: str, text_col: str,
    n_buckets: int = DSIR_BUCKETS, seed: int = DSIR_SEED,
) -> DataFrame:
    """Per-raw-document DSIR log importance weights against ``target``:
    ``(id, n_feats, weight_q, avg_logratio)`` where ``weight_q`` is the
    exact int64 sum of quantized per-feature ``ln p − ln q`` (grid
    1/LM_QSCALE) and ``avg_logratio = weight_q / (n_feats · LM_QSCALE)``
    — the length-normalized score the deterministic top-slice selection
    ranks on. Raw documents with no tokens keep a row with
    ``n_feats = 0`` and null weight (selection gates must see them)."""
    from rust_triplets_spark.functions.caching import cache_scoped

    raw_ids = raw.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t")
    )
    raw_occ = cache_scoped(
        raw_ids.select(
            "id",
            F.explode(_feature_buckets_col(F.col("__t"), n_buckets, seed)).alias("b"),
        ),
        "dsir.raw_occ",
        eager=True,  # feeds the q counts AND the per-doc score join
    )
    tgt_occ = target.select(
        F.explode(_feature_buckets_col(F.col(text_col), n_buckets, seed)).alias("b")
    )
    p_counts = tgt_occ.groupBy("b").agg(F.count("*").cast("long").alias("c_p"))
    q_counts = raw_occ.groupBy("b").agg(F.count("*").cast("long").alias("c_q"))
    p_total = tgt_occ.agg(F.count("*").cast("long").alias("__Tp"))
    q_total = raw_occ.agg(F.count("*").cast("long").alias("__Tq"))
    # ln p − ln q with α = 1/2: ln((2c_p+1)/(2Tp+B)) − ln((2c_q+1)/(2Tq+B)),
    # every ln argument an exact integer; buckets absent from BOTH corpora
    # contribute nothing to any document, so the outer join over observed
    # buckets is complete
    buckets = (
        p_counts.join(q_counts, "b", "full")
        .select(
            "b",
            F.coalesce("c_p", F.lit(0)).alias("c_p"),
            F.coalesce("c_q", F.lit(0)).alias("c_q"),
        )
        .crossJoin(F.broadcast(p_total))
        .crossJoin(F.broadcast(q_total))
    )
    logratio = (
        F.log(F.col("c_p").cast("double") * 2 + 1)
        - F.log(F.col("__Tp").cast("double") * 2 + F.lit(float(n_buckets)))
        - F.log(F.col("c_q").cast("double") * 2 + 1)
        + F.log(F.col("__Tq").cast("double") * 2 + F.lit(float(n_buckets)))
    )
    scored_buckets = buckets.select(
        "b", F.round(logratio * F.lit(float(LM_QSCALE))).cast("long").alias("__lrq")
    )
    per_doc = (
        raw_occ.join(scored_buckets, "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("__lrq").alias("weight_q"),
        )
    )
    return raw_ids.select("id").join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.col("weight_q").cast("long").alias("weight_q"),
        (
            F.col("weight_q").cast("double")
            / (F.col("n_feats").cast("double") * F.lit(float(LM_QSCALE)))
        ).alias("avg_logratio"),
    )


def dsir_importance_weights_sql(
    raw_sql: str, target_sql: str, id_sql: str, text_sql: str,
    n_buckets: int = DSIR_BUCKETS, seed: int = DSIR_SEED,
) -> str:
    """DuckDB twin of :func:`dsir_importance_weights`; ``raw_sql`` /
    ``target_sql`` are full SELECTs producing the two corpora."""
    feats = _feature_buckets_sql(text_sql, n_buckets, seed)
    return f"""
WITH ds_raw AS MATERIALIZED (SELECT * FROM ({raw_sql})),
ds_tgt AS MATERIALIZED (SELECT * FROM ({target_sql})),
ds_raw_occ AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, u.b AS b
  FROM ds_raw, UNNEST({feats}) AS u(b)
), ds_tgt_occ AS MATERIALIZED (
  SELECT u.b AS b FROM ds_tgt, UNNEST({feats}) AS u(b)
), ds_p AS (SELECT b, CAST(count(*) AS BIGINT) AS c_p FROM ds_tgt_occ GROUP BY b),
ds_q AS (SELECT b, CAST(count(*) AS BIGINT) AS c_q FROM ds_raw_occ GROUP BY b),
ds_tot AS (
  SELECT (SELECT count(*) FROM ds_tgt_occ) AS tp,
         (SELECT count(*) FROM ds_raw_occ) AS tq
), ds_buckets AS MATERIALIZED (
  SELECT COALESCE(p.b, q.b) AS b,
         CAST(round((ln(CAST(COALESCE(p.c_p, 0) AS DOUBLE) * 2 + 1)
                   - ln(CAST(t.tp AS DOUBLE) * 2 + {float(n_buckets)!r})
                   - ln(CAST(COALESCE(q.c_q, 0) AS DOUBLE) * 2 + 1)
                   + ln(CAST(t.tq AS DOUBLE) * 2 + {float(n_buckets)!r}))
                   * {float(LM_QSCALE)!r}) AS BIGINT) AS lrq
  FROM ds_p p FULL JOIN ds_q q ON p.b = q.b CROSS JOIN ds_tot t
), ds_doc AS (
  SELECT o.id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(s.lrq) AS BIGINT) AS weight_q
  FROM ds_raw_occ o JOIN ds_buckets s ON o.b = s.b
  GROUP BY o.id
)
SELECT i.id,
       CAST(COALESCE(d.n_feats, 0) AS BIGINT) AS n_feats,
       d.weight_q,
       CAST(d.weight_q AS DOUBLE)
         / (CAST(d.n_feats AS DOUBLE) * {float(LM_QSCALE)!r}) AS avg_logratio
FROM (SELECT CAST({id_sql} AS BIGINT) AS id FROM ds_raw) i
LEFT JOIN ds_doc d ON i.id = d.id
"""
