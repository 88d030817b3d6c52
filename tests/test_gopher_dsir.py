"""Gopher quality rules + DSIR importance weights — behavioral pins
(the cross-engine exactness is pinned by the registered oracle twins)."""

from pyspark.sql import Row
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it ran to be "
    "with all of that pack which seemed to have quite a number of rather "
    "pleasant animals living among the trees near that old river bend "
    "where everyone used to gather for the seasonal feast every year"
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)], SCHEMA
    )


def test_gopher_rules_behavior(spark):
    from rust_triplets_spark.operators.gopher import gopher_quality_signals

    bullets = "\n".join(f"• item {i}" for i in range(30))
    ellipsis = "\n".join(f"line number {i} trails off..." for i in range(20))
    symbols = " ".join("#tag" for _ in range(60))
    short = "too few words"
    rows = [GOOD, bullets, ellipsis, symbols, short, ""]
    out = {
        r["id"]: r
        for r in gopher_quality_signals(_df(spark, rows), "doc_id", "text").collect()
    }
    assert len(out) == 6
    assert out[0]["passes"] is True
    # every-line-bulleted doc violates the 0.9 bullet cap
    assert out[1]["bullet_line_frac"] == 1.0 and out[1]["passes"] is False
    # every-line-ellipsis doc violates the 0.3 ellipsis cap
    assert out[2]["ellipsis_line_frac"] == 1.0 and out[2]["passes"] is False
    # symbol-heavy doc: one '#' per word -> ratio 1.0 > 0.1
    assert out[3]["symbol_word_ratio"] == 1.0 and out[3]["passes"] is False
    # short doc fails the word-count floor; empty doc gets null signals
    assert out[4]["passes"] is False
    assert out[5]["n_words"] == 0 and out[5]["mean_word_len"] is None
    assert out[5]["passes"] is False


def test_dsir_weights_behavior(spark):
    from rust_triplets_spark.operators.dsir import dsir_importance_weights

    target_like = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    off_target = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    raw = _df(spark, [target_like, off_target, ""])
    target = _df(spark, [target_like, "alpha beta gamma delta epsilon"])

    out = {
        r["id"]: r
        for r in dsir_importance_weights(raw, target, "doc_id", "text").collect()
    }
    # the target-like doc outranks the off-target one on the normalized score
    assert out[0]["avg_logratio"] > out[1]["avg_logratio"]
    # empty doc keeps a row with no features and null weight
    assert out[2]["n_feats"] == 0 and out[2]["weight_q"] is None

    # identity: scoring a corpus against itself gives exactly zero weights
    # (c_p == c_q and Tp == Tq for every bucket -> quantized log-ratio 0)
    same = _df(spark, [target_like, off_target])
    zeros = dsir_importance_weights(same, same, "doc_id", "text").collect()
    assert all(r["weight_q"] == 0 for r in zeros)
