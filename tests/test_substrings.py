"""Cross-document substring dedup — behavioral pins for the span finder
and the excision cleaner (cross-engine exactness is pinned by the
registered oracle twins; the driver harness exact-matches both)."""

from pyspark.sql import Row
from pyspark.sql import types as T

from rust_triplets_spark.operators.substrings import (
    duplicate_ngram_spans,
    excise_duplicate_spans,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

N = 4  # small window so fixtures stay readable

# a 6-token verbatim passage shared by docs 0 and 2 (doc 0 = keeper)
PASSAGE = "alpha beta gamma delta epsilon zeta"


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=int(i), text=t) for i, t in rows], SCHEMA
    )


def _spans(spark, rows):
    df = duplicate_ngram_spans(_df(spark, rows), "doc_id", "text", n=N, seed=7)
    return {
        (r.id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in df.collect()
    }


def test_shared_passage_flags_only_non_keeper(spark):
    rows = [
        (0, f"one two three {PASSAGE} four five"),
        (1, "totally unrelated words nothing shared here at all today"),
        (2, f"prefix tokens here then {PASSAGE} and a tail"),
    ]
    spans = _spans(spark, rows)
    # doc 2: passage occupies 1-based token positions 5..10 → windows at
    # pos 5,6,7 (width 4) merge into one span [5, 10] of 6 tokens
    assert spans == {(2, 5, 10, 6, 3)}


def test_disjoint_repeats_yield_separate_spans(spark):
    gap = "u1 u2 u3 u4 u5 u6 u7"
    rows = [
        (0, f"{PASSAGE} filler filler {PASSAGE}"),
        (5, f"{PASSAGE} {gap} {PASSAGE}"),
    ]
    spans = _spans(spark, rows)
    # doc 5's two copies sit at 1..6 and 14..19: window starts 1..3 and
    # 14..16; the pos gap (14-3=11 > N) keeps them separate islands
    assert spans == {(5, 1, 6, 6, 3), (5, 14, 19, 6, 3)}


def test_touching_windows_merge(spark):
    # doc 9 = passage twice back-to-back. Its window starts whose 4-gram
    # also occurs in doc 0 are 1,2,3 (first copy) and 7,8,9 (second copy;
    # seam-crossing grams are unique to doc 9). Gap 7-3 = 4 <= N, so the
    # two islands merge into ONE maximal span covering tokens 1..12.
    rows = [
        (0, f"x {PASSAGE} y"),
        (9, f"{PASSAGE} {PASSAGE}"),
    ]
    assert _spans(spark, rows) == {(9, 1, 12, 12, 6)}


def test_short_docs_have_no_grams(spark):
    rows = [(0, "a b c"), (1, "a b c")]  # 3 tokens < N=4 → no windows
    assert _spans(spark, rows) == set()


def test_excision_removes_exactly_the_span(spark):
    rows = [
        (0, f"one two three {PASSAGE} four five"),
        (2, f"prefix tokens here then {PASSAGE} and a tail"),
    ]
    out = {
        r.id: r
        for r in excise_duplicate_spans(
            _df(spark, rows), "doc_id", "text", n=N, seed=7
        ).collect()
    }
    assert out[0].dup_tokens == 0
    assert out[0].clean_text == rows[0][1]  # keeper passes through
    assert out[0].dup_token_frac == 0.0
    r2 = out[2]
    assert r2.total_tokens == 13 and r2.dup_tokens == 6
    assert r2.clean_text == "prefix tokens here then and a tail"
    assert abs(r2.dup_token_frac - 6 / 13) < 1e-15


def test_fully_duplicated_doc_cleans_to_empty(spark):
    rows = [(0, PASSAGE), (3, PASSAGE)]
    out = {
        r.id: r
        for r in excise_duplicate_spans(
            _df(spark, rows), "doc_id", "text", n=N, seed=7
        ).collect()
    }
    assert out[3].clean_text == "" and out[3].dup_token_frac == 1.0
    assert out[0].clean_text == PASSAGE
