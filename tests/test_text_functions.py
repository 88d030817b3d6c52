"""Sentence splitter + text analysis edge cases (reference
src/utils.rs:161-255 test suite)."""

from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import (
    lang_id_col,
    split_sentences_py,
    split_sentences_udf,
)


def test_basic_sentences():
    assert split_sentences_py("First one. Second one! Third one?") == [
        "First one.", "Second one!", "Third one?",
    ]


def test_decimals_not_boundaries():
    out = split_sentences_py("Pi is 3.14 exactly. Next sentence.")
    assert out == ["Pi is 3.14 exactly.", "Next sentence."]


def test_dot_tickers_not_boundaries():
    out = split_sentences_py("Buy BRK.B shares now. They did.")
    assert out == ["Buy BRK.B shares now.", "They did."]


def test_ellipsis_not_boundary():
    out = split_sentences_py("Well... maybe later. Done.")
    assert out == ["Well... maybe later.", "Done."]


def test_paragraph_blocks_on_blank_lines():
    out = split_sentences_py("Para one sentence.\n\nPara two sentence.")
    assert out == ["Para one sentence.", "Para two sentence."]


def test_trailing_text_without_terminator():
    assert split_sentences_py("No terminator here") == ["No terminator here"]


def test_udf_matches_python(spark):
    texts = [
        "First. Second! Third?",
        "Pi is 3.14 ok. Next.",
        "One\n\nTwo sentences. Here.",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [list(r[0]) for r in df.select(split_sentences_udf()(F.col("t"))).collect()]
    assert got == [split_sentences_py(t) for t in texts]


def test_lang_id_on_clear_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a good day for the cat"),
            (2, "der hund ist ein guter hund und das ist gut mit der katze"),
            (3, "le chat est un bon chat et la vie est pour le chat"),
            (4, "xqz vvv kkk www"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r[1] for r in df.select("id", lang_id_col("text")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_agg_sql_matches_scalar_twin():
    """The row-wise aggregating fingerprint twin (fingerprint_agg_sql,
    added because the scalar twin's nested list lambdas re-tokenize per
    character — 26 min at sf1) must be value-identical to the scalar
    fingerprint_sql, including the zero-token → 0 path."""
    import duckdb

    from rust_triplets_spark.functions.text import (
        fingerprint_agg_sql,
        fingerprint_sql,
    )

    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE documents AS SELECT * FROM (VALUES
          (1, 'the quick brown fox jumps over the lazy dog'),
          (2, 'the quick  brown   fox'),
          (3, ''),
          (4, '   '),
          (5, 'one'),
          (6, 'fox quick the brown'),
          (7, 'répété tokens répété with unicode ¶ marks')
        ) AS t(doc_id, text)
        """
    )
    scalar = dict(
        con.execute(
            "SELECT CAST(doc_id AS BIGINT), "
            f"{fingerprint_sql('text')} FROM documents"
        ).fetchall()
    )
    agg = dict(
        con.execute(fingerprint_agg_sql("documents", "doc_id", "text")).fetchall()
    )
    assert agg == scalar
    assert scalar[3] == 0 and scalar[4] == 0
    # order-awareness sanity: same bag of tokens, different order → different fp
    assert scalar[2] != scalar[6]
