"""Model-based quality classification — the GPT-3 / CCNet "quality
classifier" stage: a linear model over hashed bag-of-n-gram features that
scores every document's resemblance to a curated positive corpus.

GPT-3 filtered Common Crawl with a logistic-regression classifier trained
on WebText-vs-crawl; CCNet and LLaMA used fastText equivalents. The
mechanical shape is: featurize (hashed unigram+bigram counts), train a
linear model on weak labels (a curated slice vs the rest — here the
already-oracle-checked Gopher rule gate provides deterministic labels),
score the full corpus, gate on the probability. The reference engine has
no model-based filter (its trust weights are per-source constants,
src/source/mod.rs) — north-star scope.

Two kernels, the ANN-family pattern (README "oracle-checkable vs deploy"):

- **Oracle kernel** (:func:`hashed_ngram_features`): the feature map as
  exact integer arithmetic — hash31 token/bigram fingerprints modulo
  ``n_features``, per-document counts. Registered as a driver query with
  a DuckDB twin that hash-matches exactly; this pins the feature
  CONTRACT cross-engine.
- **Deploy kernel** (:func:`train_quality_classifier` /
  :func:`score_quality`): MLlib Tokenizer→HashingTF→IDF→LogisticRegression
  — JVM-side, zero Python UDFs, the thing you actually run at 100 TB.
  Not SQL-expressible (murmur3 hashing + LBFGS fit), so it is
  pytest-pinned instead: deterministic under a fixed seed, holdout
  accuracy floor against the Gopher labels, score range sanity.

Scale shape: featurization is row-local + one partial-agg groupBy; LR
training is MLlib's distributed LBFGS over the (bounded, ``n_features``-
dim) feature space; scoring is map-only. The label frame is derived, not
shuffled in. Nothing collects beyond MLlib's own coefficient vector
(``n_features`` doubles — a model, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    hash31_str_col,
    hash31_str_sql,
    mix31_step_col,
    mix31_step_sql,
)
from rust_triplets_spark.functions.text import tokens_col, tokens_sql

CLF_SEED = 5003
CLF_N_FEATURES = 1 << 15


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = CLF_N_FEATURES,
    seed: int = CLF_SEED,
) -> DataFrame:
    """Exact hashed bag-of-{1,2}-gram counts: ``(id, feature_idx, tf)``.

    Unigram features hash the token; bigram features fold the two token
    hashes with one ``mix31`` step — all int64, all row-local before the
    one (id, idx) partial-agg groupBy. The frame is the exact sparse
    matrix a linear scorer consumes; cross-engine identical including
    hash-bucket collisions."""
    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    th = F.transform(tokens_col(F.col(text_col)), lambda t: hash31_str_col(t, seed))

    def feats(h):
        uni = h
        bi = F.when(
            F.size(h) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(h) - 1, F.lit(1))),
                lambda i: mix31_step_col(F.element_at(h, i), F.element_at(h, i + 1), seed),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(uni, bi)

    hashed = F.flatten(F.transform(F.array(th), feats))
    return (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(hashed).alias("__f"),
        )
        .select("id", F.pmod(F.col("__f"), F.lit(n_features)).cast("long").alias("feature_idx"))
        .groupBy("id", "feature_idx")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def hashed_ngram_features_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    n_features: int = CLF_N_FEATURES,
    seed: int = CLF_SEED,
) -> str:
    """DuckDB twin of :func:`hashed_ngram_features`."""
    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, t -> {hash31_str_sql('t', seed)})"
    bi_body = mix31_step_sql("(__th)[i]", "(__th)[i + 1]", seed)
    feats = (
        f"list_concat(__th, "
        f"list_transform(range(1, len(__th) - 1 + 1), i -> {bi_body}))"
    )
    hashed = f"flatten(list_transform([{th}], __th -> {feats}))"
    return f"""
SELECT CAST({id_sql} AS BIGINT) AS id,
       CAST(f.h % {n_features} AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS tf
FROM {table} t, UNNEST({hashed}) AS f(h)
GROUP BY 1, 2
"""


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = CLF_N_FEATURES,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the deploy kernel: Tokenizer→HashingTF→IDF→LogisticRegression
    (all JVM-side). ``label_col`` must be a 0/1 column — e.g. the Gopher
    gate verdict, or membership in a curated positive corpus. Returns the
    fitted ``PipelineModel``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=False
    )
    tf = HashingTF(inputCol="__toks", outputCol="__tf", numFeatures=n_features)
    idf = IDF(inputCol="__tf", outputCol="__feat")
    lr = LogisticRegression(
        featuresCol="__feat",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return Pipeline(stages=[tok, tf, idf, lr]).fit(labeled)


def score_quality(
    model, df: DataFrame, id_col: str
) -> DataFrame:
    """``(id, quality_prob)`` for every document — P(label=1) under the
    fitted model. Map-only (the model broadcasts with the plan)."""
    from pyspark.ml.functions import vector_to_array

    return model.transform(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.element_at(vector_to_array(F.col("probability")), 2).alias("quality_prob"),
    )
