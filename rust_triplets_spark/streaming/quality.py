"""Streaming bigram-LM quality scoring — score documents AT INGEST.

Batch twin: :func:`rust_triplets_spark.operators.lm_quality
.bigram_lm_scores`. The batch form trains and scores in one plan; a
stream can't re-train per micro-batch, so this module splits the
operator at its natural joint — TRAIN batch-side (the corpus-wide
count aggregation), SCORE stream-side (a pure per-document function of
the trained model):

- :func:`bigram_lm_model` runs the batch counting pass once and returns
  the model as a driver-side object: quantized per-type nll (the same
  1e-9 integer grid as the batch operator), per-context totals, and the
  vocabulary size.
- :func:`score_with_model` applies it to ANY frame — streaming or batch
  — as one Arrow-batched pandas UDF (model broadcast in the closure),
  so the streaming query is map-only: no shuffle, no state store, no
  watermark, append mode. Batch-vs-stream parity and unpruned
  model==batch-operator equality are pytest-pinned.

Scoring semantics with a PRUNED model (``max_types``): kept (prev, cur)
types use their exact trained nll; an unseen cur under a seen prev backs
off to the smoothing floor ``-ln(α / (c_b + α·V))``; an unseen prev
(never a context in training) scores the uniform ``-ln(1/V)``. With no
pruning these branches reproduce the full model exactly.

Scale shape: the model is VOCABULARY-shaped, not corpus-shaped — but raw
web-scale vocabularies can still be hundreds of millions of bigram
types, so BOTH collects are capped: ``max_types`` (top types by count;
dropped types take the backoff branch) bounds the (prev, cur) map and
``max_ctx`` (top contexts by total count; dropped contexts take the
unseen-prev uniform branch) bounds the context map. With both set, the
driver holds at most ``max_types + max_ctx`` rows and that is also all
that ships to executors; kept types keep their exact trained nll even
when their context fell under the ``max_ctx`` cut (the nll computation
joins the full context frame in-plan). Everything per-row runs inside
the Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.lm_quality import (
    LM_ALPHA_DEN,
    LM_ALPHA_NUM,
    LM_QSCALE,
    LM_SEED,
    _bigram_pairs_col,
)


@dataclass(frozen=True)
class BigramLmModel:
    """Driver-side trained model: ``types[(prev, cur)] -> nll_q`` (the
    1e-9-grid int of the batch operator), ``ctx[prev] -> c_b``, vocabulary
    size ``v``, and the training ``seed`` (scoring must hash tokens with
    the same seed — mismatch scores everything as unseen)."""

    types: dict
    ctx: dict
    v: int
    seed: int

    def nll_q_for(self, prev: int, cur: int) -> int:
        """Quantized -ln P(cur|prev) with pruning backoff (module doc)."""
        import math

        got = self.types.get((prev, cur))
        if got is not None:
            return got
        a_num, a_den = float(LM_ALPHA_NUM), float(LM_ALPHA_DEN)
        c_b = self.ctx.get(prev)
        if c_b is None:
            return int(math.floor(math.log(float(self.v)) * LM_QSCALE + 0.5))
        nll = math.log(c_b * a_den + self.v * a_num) - math.log(a_num)
        return int(math.floor(nll * LM_QSCALE + 0.5))


def bigram_lm_model(
    df: DataFrame, id_col: str, text_col: str,
    seed: int = LM_SEED, max_types: int | None = 1_000_000,
    max_ctx: int | None = 100_000,
) -> BigramLmModel:
    """Train the bigram model batch-side and collect it to the driver.

    Runs the SAME counting plan as the batch operator (one token-scale
    explode → vocabulary-shaped aggregates). ``max_types`` keeps only the
    top types by count (ties → (prev, cur) for determinism); ``max_ctx``
    keeps only the top contexts by total count (ties → prev) — together
    they bound BOTH collects, so driver/executor memory is capped even at
    web-scale vocabularies. The caps default ON (1M types / 100k contexts
    ≈ tens of MB of driver state — the 100 TB-safe behavior); pass ``None``
    explicitly to opt out and collect the unpruned model. V is always exact. Kept types keep their EXACT
    trained nll regardless of ``max_ctx`` (the nll is computed via a join
    against the full context frame, never the pruned dict); a dropped type
    under a kept context takes the smoothing-floor backoff, and a dropped
    context takes the unseen-prev uniform branch — the semantics
    :meth:`BigramLmModel.nll_q_for` already defines."""
    occ = df.select(
        F.explode(_bigram_pairs_col(F.col(text_col), seed)).alias("__p")
    ).select(F.col("__p.prev").alias("prev"), F.col("__p.cur").alias("cur"))
    types = occ.groupBy("prev", "cur").agg(F.count("*").cast("long").alias("c_bc"))
    ctx_df = types.groupBy("prev").agg(F.sum("c_bc").cast("long").alias("c_b"))
    ctx_kept = ctx_df
    if max_ctx is not None:
        # top contexts by mass: orderBy().limit() plans as a distributed
        # TakeOrdered — the cap applies BEFORE the collect, so the driver
        # never holds more than max_ctx rows
        ctx_kept = ctx_df.orderBy(
            F.col("c_b").desc(), F.col("prev").asc()
        ).limit(max_ctx)
    if max_types is not None:
        types = types.orderBy(
            F.col("c_bc").desc(), F.col("prev").asc(), F.col("cur").asc()
        ).limit(max_types)
    v = (
        occ.select(F.col("prev").alias("fp"))
        .union(occ.select(F.col("cur").alias("fp")))
        .agg(F.countDistinct("fp").cast("long").alias("v"))
        .collect()[0]["v"]
    )
    # type nll needs each kept type's FULL context total — joined in-plan
    # against the unpruned ctx frame (exact even when max_ctx dropped that
    # context from the collected dict), never looked up driver-side
    typed_rows = types.join(ctx_df, "prev").select(
        "prev", "cur", "c_bc", "c_b"
    ).collect()
    ctx = {r["prev"]: r["c_b"] for r in ctx_kept.collect()}
    import math

    a_num, a_den = float(LM_ALPHA_NUM), float(LM_ALPHA_DEN)
    tmap = {}
    for r in typed_rows:
        nll = math.log(r["c_b"] * a_den + v * a_num) - math.log(
            r["c_bc"] * a_den + a_num
        )
        tmap[(r["prev"], r["cur"])] = int(math.floor(nll * LM_QSCALE + 0.5))
    return BigramLmModel(types=tmap, ctx=ctx, v=int(v), seed=seed)


def score_with_model(
    df: DataFrame, model: BigramLmModel, id_col: str, text_col: str,
) -> DataFrame:
    """``(id, n_transitions, nll_q, avg_nll)`` for a batch OR streaming
    frame — same output contract as the batch operator. Map-only: the
    bigram fingerprints come from the same row-local column expression as
    the batch plan, and the model lookup is one Arrow-batched pandas UDF
    over the pair array (model rides the closure → Spark broadcasts the
    serialized function to executors once per query)."""
    from pyspark.sql.types import LongType

    types, ctx, v, _ = model.types, model.ctx, model.v, model.seed
    import math

    a_num, a_den = float(LM_ALPHA_NUM), float(LM_ALPHA_DEN)
    unseen_prev_q = int(math.floor(math.log(float(v)) * LM_QSCALE + 0.5))

    @F.pandas_udf(LongType())
    def _nll_q(pairs):
        import pandas as pd

        out = []
        for arr in pairs:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            total = 0
            for p in arr:
                prev, cur = p["prev"], p["cur"]
                got = types.get((prev, cur))
                if got is None:
                    c_b = ctx.get(prev)
                    if c_b is None:
                        got = unseen_prev_q
                    else:
                        got = int(math.floor(
                            (math.log(c_b * a_den + v * a_num) - math.log(a_num))
                            * LM_QSCALE + 0.5
                        ))
                total += got
            out.append(total)
        return pd.Series(out, dtype="object")

    # two projections: the UDF must consume a materialized column — inlining
    # the (large) pairs expression as the UDF argument lands the UDF inside
    # an interpreted subexpression context that Spark refuses to evaluate
    # (INTERNAL_ERROR Cannot evaluate expression: _nll_q(expressionproxy(...)))
    paired = df.select(
        F.col(id_col).cast("long").alias("id"),
        _bigram_pairs_col(F.col(text_col), model.seed).alias("__pairs"),
    )
    base = paired.select(
        "id",
        F.size("__pairs").cast("long").alias("n_transitions"),
        _nll_q(F.col("__pairs")).alias("nll_q"),
    )
    return base.select(
        "id", "n_transitions", "nll_q",
        (
            F.col("nll_q").cast("double")
            / (F.col("n_transitions").cast("double") * F.lit(float(LM_QSCALE)))
        ).alias("avg_nll"),
    )


def stream_quality_scores(
    spark,
    source_dir: str,
    schema,
    model: BigramLmModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """File-stream convenience wrapper: readStream over ``source_dir`` →
    :func:`score_with_model` — append-mode, stateless."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return score_with_model(raw, model, id_col, text_col)
