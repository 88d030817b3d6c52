"""Corpus-trained bigram language-model quality scoring (CCNet-style).

The standard LLM-data quality gate beyond rule-based signals
(`functions/text.quality_score_col`) is a cheap n-gram LM: score each
document by its average negative log-likelihood under a bigram model
trained on the corpus itself (CCNet trains on a reference corpus; the
self-trained form flags the same outliers — boilerplate scores LOW nll,
gibberish scores HIGH — and needs no external artifact). Documents are
then filtered or bucketed (head/middle/tail) on the score.

Model: add-α smoothed bigram MLE over token FINGERPRINTS,

    P(cur | prev) = (c(prev,cur) + α) / (c(prev) + α·V)

where ``c(prev)`` counts prev as a bigram CONTEXT (occurrences minus
doc-final positions — exactly ``Σ_cur c(prev,cur)``, so the conditional
sums to 1) and ``V`` is the corpus-wide distinct-fingerprint vocabulary.
No BOS/EOS padding: a document scores over its ``token_count − 1`` real
transitions; documents with < 2 tokens get ``n_transitions = 0`` and null
scores.

Cross-engine exactness: per-TYPE ``-ln P`` is computed once per distinct
(prev, cur) from exact integer counts, quantized to the 1e-9 grid as
int64 (``round(nll × 1e9)``), and each document's score is the exact
integer SUM of its occurrences' quantized types — order-free, so
bit-identical at any parallelism and across engines (the bm25/similarity
trick). ``avg_nll`` is one final IEEE division of exact integers. The
residual risk is one ln() ulp landing within half a grid step of a
rounding boundary, per distinct count combination — vocabulary-shaped,
not token-shaped.

Scale shape (100 TB): two token-scale exchanges — the type-count groupBy
(map-side combine collapses each partition to its distinct types before
the shuffle; output is VOCABULARY-shaped) and the per-doc score groupBy.
The occurrence→type join keys are fixed-width int64 pairs; the type
frame is vocabulary-shaped (typically ≪ corpus — AQE broadcasts it when
it fits, hash-joins otherwise). V rides along as a broadcast single-row
frame, never a driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_col, hash31_str_sql
from rust_triplets_spark.functions.text import tokens_col, tokens_sql

LM_SEED = 2_000_033  # token-fingerprint seed for the LM family
LM_QSCALE = 1_000_000_000  # 1e-9 nll quantization grid (module doc)
LM_ALPHA_NUM, LM_ALPHA_DEN = 1, 2  # α = 0.5, kept rational so α·V is exact


def _bigram_pairs_col(text_col, seed: int) -> F.Column:
    """Row-local ``array<struct<prev bigint, cur bigint>>`` of adjacent
    token-fingerprint pairs — the 1-element-array lambda-let binds the
    per-token hash ONCE (see ``dedup.ngram_fingerprint_array_col`` for
    the measured trap this avoids); empty array when < 2 tokens."""
    th_expr = F.transform(tokens_col(text_col), lambda t: hash31_str_col(t, seed))

    def pairs(th):
        k = F.size(th) - 1
        gen = F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.struct(
                F.element_at(th, i).alias("prev"),
                F.element_at(th, i + 1).alias("cur"),
            ),
        )
        return F.when(k > 0, gen).otherwise(
            F.array().cast("array<struct<prev:bigint,cur:bigint>>")
        )

    return F.flatten(F.transform(F.array(th_expr), pairs))


def _bigram_pairs_sql(text_sql: str, seed: int) -> str:
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, t -> {hash31_str_sql('t', seed)})"
    gen = (
        "list_transform(range(1, len(__th)), "
        "i -> {'prev': __th[i], 'cur': __th[i + 1]})"
    )
    return (
        f"flatten(list_transform([{th}], __th -> "
        f"CASE WHEN len(__th) > 1 THEN {gen} ELSE [] END))"
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, seed: int = LM_SEED,
) -> DataFrame:
    """Per-document bigram-LM quality scores: ``(id, n_transitions,
    nll_q, avg_nll)``.

    ``nll_q`` is the exact int64 sum of per-transition quantized negative
    log-likelihoods (grid 1/LM_QSCALE; module doc), ``avg_nll`` =
    ``nll_q / (LM_QSCALE · n_transitions)``. Documents with < 2 tokens
    keep a row with ``n_transitions = 0`` and null ``nll_q``/``avg_nll``
    — a filter gate must see every document, not silently drop the
    degenerate ones."""
    from rust_triplets_spark.functions.caching import cache_scoped

    ids = df.select(F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t"))
    occ = cache_scoped(
        ids.select(
            "id", F.explode(_bigram_pairs_col(F.col("__t"), seed)).alias("__p")
        ).select("id", F.col("__p.prev").alias("prev"), F.col("__p.cur").alias("cur")),
        "lm_quality.bigram_occ",
        eager=True,  # feeds types, vocab AND the per-doc score join — a lazy
        # cache lets concurrent scans re-run the token-scale explode
    )
    types = occ.groupBy("prev", "cur").agg(F.count("*").cast("long").alias("c_bc"))
    ctx = types.groupBy("prev").agg(F.sum("c_bc").alias("c_b"))
    vocab = (
        occ.select(F.col("prev").alias("fp"))
        .union(occ.select(F.col("cur").alias("fp")))
        .agg(F.countDistinct("fp").cast("long").alias("__V"))
    )
    a_num, a_den = float(LM_ALPHA_NUM), float(LM_ALPHA_DEN)
    # -ln P = ln(c_b + αV) - ln(c_bc + α), α = num/den: scale through by den
    # so both ln() arguments are exact integers (den·c_b + num·V etc.) —
    # the den factors cancel in the difference
    nll = F.log(F.col("c_b").cast("double") * a_den + F.col("__V").cast("double") * a_num) - F.log(
        F.col("c_bc").cast("double") * a_den + a_num
    )
    scored_types = (
        types.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev", "cur",
            F.round(nll * F.lit(float(LM_QSCALE))).cast("long").alias("__nllq"),
        )
    )
    per_doc = (
        occ.join(scored_types, ["prev", "cur"])
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.sum("__nllq").alias("nll_q"),
        )
    )
    return ids.select("id").join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_transitions", F.lit(0)).cast("long").alias("n_transitions"),
        F.col("nll_q").cast("long").alias("nll_q"),
        (
            F.col("nll_q").cast("double")
            / (F.col("n_transitions").cast("double") * F.lit(float(LM_QSCALE)))
        ).alias("avg_nll"),
    )


def bigram_lm_scores_sql(
    table: str, id_sql: str, text_sql: str, seed: int = LM_SEED,
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — same counts, same
    α-rational ln arguments, same 1e-9 quantize-then-integer-sum."""
    pairs = _bigram_pairs_sql(text_sql, seed)
    a_num, a_den = float(LM_ALPHA_NUM), float(LM_ALPHA_DEN)
    return f"""
WITH lm_occ AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, p.prev AS prev, p.cur AS cur
  FROM {table}, UNNEST({pairs}) AS t(p)
), lm_types AS MATERIALIZED (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_bc
  FROM lm_occ GROUP BY prev, cur
), lm_ctx AS (
  SELECT prev, CAST(sum(c_bc) AS BIGINT) AS c_b FROM lm_types GROUP BY prev
), lm_vocab AS (
  SELECT CAST(count(DISTINCT fp) AS BIGINT) AS V FROM (
    SELECT prev AS fp FROM lm_occ UNION SELECT cur AS fp FROM lm_occ
  )
), lm_scored AS MATERIALIZED (
  SELECT t.prev, t.cur,
         CAST(round((ln(CAST(c.c_b AS DOUBLE) * {a_den!r} + CAST(v.V AS DOUBLE) * {a_num!r})
                   - ln(CAST(t.c_bc AS DOUBLE) * {a_den!r} + {a_num!r}))
                   * {float(LM_QSCALE)!r}) AS BIGINT) AS nllq
  FROM lm_types t JOIN lm_ctx c ON t.prev = c.prev CROSS JOIN lm_vocab v
), lm_doc AS (
  SELECT o.id, CAST(count(*) AS BIGINT) AS n_transitions,
         CAST(sum(s.nllq) AS BIGINT) AS nll_q
  FROM lm_occ o JOIN lm_scored s ON o.prev = s.prev AND o.cur = s.cur
  GROUP BY o.id
)
SELECT i.id,
       CAST(COALESCE(d.n_transitions, 0) AS BIGINT) AS n_transitions,
       d.nll_q,
       CAST(d.nll_q AS DOUBLE)
         / (CAST(d.n_transitions AS DOUBLE) * {float(LM_QSCALE)!r}) AS avg_nll
FROM (SELECT CAST({id_sql} AS BIGINT) AS id FROM {table}) i
LEFT JOIN lm_doc d ON i.id = d.id
"""


# ---------------------------------------------------------------------------
# CCNet-style quality bucketing — the LM score turned into the artifact the
# pipeline actually ships: per-source head/middle/tail tertiles (CCNet
# buckets by perplexity against the reference LM; head ≈ cleanest third).
# ---------------------------------------------------------------------------

BUCKET_NAMES = ("head", "middle", "tail")


def quality_buckets(
    df: DataFrame, id_col: str, text_col: str, source_col: str,
    n_buckets: int = 3, seed: int = LM_SEED,
) -> DataFrame:
    """Per-source quality buckets over :func:`bigram_lm_scores`:
    ``(id, source, avg_nll, bucket)`` where ``bucket`` splits each
    source's SCORED documents into ``n_buckets`` contiguous rank bands by
    ascending ``avg_nll`` (ties → id) — band b covers 1-indexed ranks
    ``(b·n div B, (b+1)·n div B]``, pure integer arithmetic, so bands are
    exact and the band sizes differ by at most one. 3 buckets get CCNet's
    head/middle/tail names; other counts get ``b0..b{B-1}``. Documents
    with no transitions (< 2 tokens) land in ``unscored`` and do not
    consume band capacity.

    Scale shape: the LM pass (module doc) plus ONE per-source rank window
    over the scored frame — the same audit-grade exact-rank trade as
    ``quality.group_quantiles`` (its docstring covers the
    approx_percentile alternative for few-giant-group layouts)."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    names = BUCKET_NAMES if n_buckets == 3 else tuple(
        f"b{i}" for i in range(n_buckets)
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(source_col).alias("source")
    )
    scores = bigram_lm_scores(df, id_col, text_col, seed).select("id", "avg_nll")
    scored = src.join(scores, "id")
    w = Window.partitionBy("source").orderBy(F.col("avg_nll").asc(), F.col("id").asc())
    ranked = scored.where(F.col("avg_nll").isNotNull()).select(
        "id", "source", "avg_nll",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy("source")).alias("__n"),
    )
    # band of 1-indexed rank rn in n rows: smallest b with rn <= (b+1)·n/B
    # ⇔ b = (rn·B − 1) div n — integer-exact, sizes differ by ≤ 1
    band = ((F.col("__rn") * n_buckets - 1) / F.col("__n")).cast("long")
    bucket = F.element_at(
        F.array(*[F.lit(nm) for nm in names]), (band + 1).cast("int")
    )
    out = ranked.select("id", "source", "avg_nll", bucket.alias("bucket"))
    unscored = scored.where(F.col("avg_nll").isNull()).select(
        "id", "source", "avg_nll", F.lit("unscored").alias("bucket")
    )
    return out.unionByName(unscored)


def quality_buckets_sql(
    table: str, id_sql: str, text_sql: str, source_sql: str,
    n_buckets: int = 3, seed: int = LM_SEED,
) -> str:
    """DuckDB twin of :func:`quality_buckets`."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    names = BUCKET_NAMES if n_buckets == 3 else tuple(
        f"b{i}" for i in range(n_buckets)
    )
    names_sql = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    lm = bigram_lm_scores_sql(table, id_sql, text_sql, seed)
    return f"""
WITH qb_scores AS MATERIALIZED ({lm}),
qb_src AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, {source_sql} AS source FROM {table}
),
qb_scored AS (
  SELECT s.id, s.source, q.avg_nll FROM qb_src s JOIN qb_scores q ON s.id = q.id
),
qb_ranked AS (
  SELECT id, source, avg_nll,
         row_number() OVER (PARTITION BY source ORDER BY avg_nll, id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM qb_scored WHERE avg_nll IS NOT NULL
)
SELECT id, source, avg_nll,
       ({names_sql})[CAST((rn * {n_buckets} - 1) // n AS BIGINT) + 1] AS bucket
FROM qb_ranked
UNION ALL
SELECT id, source, avg_nll, 'unscored' AS bucket
FROM qb_scored WHERE avg_nll IS NULL
"""
