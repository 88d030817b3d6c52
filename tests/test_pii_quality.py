"""PII scrubbing and repetition-signal invariants."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_pii_scrub_py_patterns():
    from rust_triplets_spark.functions.pii import pii_scrub_py

    s = ("mail a.b+c@ex-ample.co.uk phone +1 555 010 1234 ip 10.0.0.7 "
         "ssn 123-45-6789 clean 3.14 end")
    out = pii_scrub_py(s)
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out and "<SSN>" in out
    assert "@" not in out and "10.0.0.7" not in out and "123-45-6789" not in out
    assert "3.14" in out  # decimals survive
    assert pii_scrub_py("no pii here at all") == "no pii here at all"
    # boundary-free contract: embedded spans scrub too (over-redaction is
    # the safe direction, and \b semantics genuinely diverge across engines)
    assert pii_scrub_py("a123-45-6789b") == "a<SSN>b"


def test_pii_scrub_spark_matches_python(spark):
    from rust_triplets_spark.functions.pii import pii_scrub_col, pii_scrub_py

    rows = [
        "contact me: jane.doe@corp.example and +44 207 946 0958.",
        "server 192.168.1.1 fallback 8.8.8.8",
        "ssn 000-12-3456 inline",
        "nothing sensitive, just text with 1.5 numbers",
        "",
        # \b must be ASCII on every engine: non-ASCII word chars adjacent
        # to PII still form a boundary (Java + RE2 + re.ASCII agree)
        "é123-45-6789",
        "ф10.0.0.7 and é1 555 010 1234",
    ]
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    got = [r[0] for r in df.select(pii_scrub_col("s")).collect()]
    assert got == [pii_scrub_py(s) for s in rows]


def test_pii_counts(spark):
    from rust_triplets_spark.functions.pii import pii_count_col

    df = spark.createDataFrame(
        [("a@b.co and c@d.org but not at-sign alone @",)], "s string"
    )
    assert df.select(pii_count_col("s", "email")).collect()[0][0] == 2


def test_repetition_signals_extremes(spark):
    from rust_triplets_spark.operators.quality import repetition_signals

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam"),
            Row(doc_id=2, text="one two three four five six"),
            Row(doc_id=3, text="dup line\ndup line\nfresh line"),
            Row(doc_id=4, text="   "),
        ]
    )
    out = {r.id: r for r in repetition_signals(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}  # empty doc dropped
    # all-same-token doc: min uniqueness, max top-gram fractions
    assert out[1].uniq_token_frac == pytest.approx(1 / 6)
    assert out[1].top2gram_frac == pytest.approx(1.0)  # 5*2/6 capped at 1
    assert out[1].top3gram_frac == pytest.approx(1.0)
    # all-distinct doc: max uniqueness, minimal top-gram fractions
    assert out[2].uniq_token_frac == pytest.approx(1.0)
    assert out[2].top2gram_frac == pytest.approx(2 / 6)
    assert out[2].dup_line_frac == pytest.approx(0.0)
    # duplicate lines: 1 - 2/3
    assert out[3].dup_line_frac == pytest.approx(1 / 3)


def test_repetition_signals_short_docs_have_no_gram_signal(spark):
    from rust_triplets_spark.operators.quality import repetition_signals

    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    r = repetition_signals(df, "doc_id", "text").collect()[0]
    assert r.n_tok == 1
    assert r.top2gram_frac == 0.0 and r.top3gram_frac == 0.0
