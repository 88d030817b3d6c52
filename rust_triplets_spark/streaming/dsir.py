"""Streaming DSIR scoring — importance-weight documents AT INGEST.

Batch twin: :func:`rust_triplets_spark.operators.dsir
.dsir_importance_weights`. Same split as the streaming bigram scorer
(:mod:`rust_triplets_spark.streaming.quality`): FIT batch-side (the two
corpus-wide bucket-count aggregations), SCORE stream-side (a pure
per-document function of the fitted bucket table):

- :func:`dsir_model` runs the batch counting pass once and returns the
  model as a driver-side object: the per-bucket quantized log-ratio
  table plus the default ratio for buckets observed in NEITHER corpus.
- :func:`score_with_dsir_model` applies it to ANY frame — streaming or
  batch — as one Arrow-batched pandas UDF (model in the closure), so the
  streaming query is map-only: no shuffle, no state store, no watermark,
  append mode.

Unlike the bigram model (whose vocabulary is corpus-shaped and needs
``max_types``/``max_ctx`` caps), the DSIR model is bounded BY
CONSTRUCTION: the hashed feature space folds every n-gram into
``n_buckets`` buckets (10k in the paper), so the table ships whole and
the memory story needs no pruning knobs.

Scoring semantics: a bucket never observed in training (possible only
for documents outside the fitted corpora) takes ``default_lrq`` — the
c_p = c_q = 0 smoothing value ``ln((2Tq+B)/(2Tp+B))`` — which is exactly
what the batch operator would have produced had the bucket been in its
outer join. Batch-vs-stream parity on the fitted corpus is
pytest-pinned.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_SEED,
    _feature_buckets_col,
)
from rust_triplets_spark.operators.lm_quality import LM_QSCALE


@dataclass(frozen=True)
class DsirModel:
    """Driver-side fitted model: ``buckets[b] -> lrq`` (quantized
    ln p − ln q on the 1e-9 grid), the default for unobserved buckets,
    the feature-space size, and the hashing ``seed`` (scoring must
    featurize with the same seed)."""

    buckets: dict
    default_lrq: int
    n_buckets: int
    seed: int


def dsir_model(
    raw: DataFrame, target: DataFrame, text_col: str,
    n_buckets: int = DSIR_BUCKETS, seed: int = DSIR_SEED,
) -> DsirModel:
    """Fit the DSIR bucket table batch-side and collect it to the driver
    — at most ``n_buckets`` rows by construction (the hashed feature
    space is fixed-size; no corpus-shaped collect exists here)."""
    import math

    raw_occ = raw.select(
        F.explode(_feature_buckets_col(F.col(text_col), n_buckets, seed)).alias("b")
    )
    tgt_occ = target.select(
        F.explode(_feature_buckets_col(F.col(text_col), n_buckets, seed)).alias("b")
    )
    p = {r["b"]: r["n"] for r in tgt_occ.groupBy("b").agg(
        F.count("*").cast("long").alias("n")).collect()}
    q = {r["b"]: r["n"] for r in raw_occ.groupBy("b").agg(
        F.count("*").cast("long").alias("n")).collect()}
    tp, tq = sum(p.values()), sum(q.values())

    def lrq(c_p: int, c_q: int) -> int:
        lr = (
            math.log(c_p * 2 + 1) - math.log(tp * 2 + float(n_buckets))
            - math.log(c_q * 2 + 1) + math.log(tq * 2 + float(n_buckets))
        ) * LM_QSCALE
        # HALF_UP away from zero — Spark/DuckDB round() semantics, NOT
        # Python's banker's rounding (parity with the batch operator)
        return (
            int(math.floor(lr + 0.5)) if lr >= 0 else -int(math.floor(-lr + 0.5))
        )

    table = {b: lrq(p.get(b, 0), q.get(b, 0)) for b in set(p) | set(q)}
    return DsirModel(
        buckets=table, default_lrq=lrq(0, 0), n_buckets=n_buckets, seed=seed
    )


def with_dsir_score(
    df: DataFrame, model: DsirModel, text_col: str,
) -> DataFrame:
    """Append ``(n_feats, weight_q, avg_logratio)`` to ``df`` (all
    existing columns kept) — map-only, so it composes into a streaming
    select chain (the ingest funnel's building block). Features come from
    the same row-local column expression as the batch plan; the bucket
    lookup is one Arrow-batched pandas UDF over the feature array (the
    ≤ n_buckets table rides the closure)."""
    from pyspark.sql.types import LongType

    table, default = model.buckets, model.default_lrq

    @F.pandas_udf(LongType())
    def _weight_q(feats):
        import pandas as pd

        out = []
        for arr in feats:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            out.append(sum(table.get(b, default) for b in arr))
        return pd.Series(out, dtype="object")

    return (
        df.withColumn(
            "__feats",
            _feature_buckets_col(F.col(text_col), model.n_buckets, model.seed),
        )
        .withColumn("n_feats", F.size("__feats").cast("long"))
        .withColumn("weight_q", _weight_q(F.col("__feats")))
        .withColumn(
            "avg_logratio",
            F.col("weight_q").cast("double")
            / (F.col("n_feats").cast("double") * F.lit(float(LM_QSCALE))),
        )
        .drop("__feats")
    )


def score_with_dsir_model(
    df: DataFrame, model: DsirModel, id_col: str, text_col: str,
) -> DataFrame:
    """``(id, n_feats, weight_q, avg_logratio)`` for a batch OR streaming
    frame — the batch operator's output contract (kernel:
    :func:`with_dsir_score`)."""
    return with_dsir_score(
        df.select(F.col(id_col).cast("long").alias("id"), text_col),
        model,
        text_col,
    ).select("id", "n_feats", "weight_q", "avg_logratio")


def stream_dsir_scores(
    spark,
    source_dir: str,
    schema,
    model: DsirModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """File-stream convenience wrapper: readStream over ``source_dir`` →
    :func:`score_with_dsir_model` — append-mode, stateless."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return score_with_dsir_model(raw, model, id_col, text_col)
