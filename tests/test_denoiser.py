"""Denoiser semantics vs the reference's own tests and README examples
(denoiser_preprocessor.rs tests, README.md:1075-1193, FIXTURES F5)."""

from pyspark.sql import functions as F

from rust_triplets_spark.operators.denoiser import (
    DenoiserConfig,
    denoise_gates12_col,
    denoise_text_py,
    denoise_udf,
)

CFG = DenoiserConfig(enabled=True, max_digit_ratio=0.35, strip_markdown=True)


def test_pure_numeric_section_dropped():
    assert denoise_text_py("42 524 10788 143 1995 190 394 13611 358 6444 266", CFG) is None


def test_clean_line_survives_next_to_noise():
    out = denoise_text_py(
        "NOVEX INDUSTRIES Springfield\n42 524 10788 143 1995 190 394 13611 358", CFG
    )
    assert out is not None and "NOVEX" in out


def test_wave_expansion_rescues_neighbors():
    """Digit-heavy line keeps the alpha tokens plus the ±1 numeric
    neighbors that fit the 0.35 cumulative budget
    (denoiser_preprocessor.rs:70-140; README.md:1185-1193)."""
    line = "42 524 NOVEX INDUSTRIES Springfield 10788 143 1995 190 394 13611 358"
    out = denoise_text_py(line, CFG)
    assert out is not None
    assert "NOVEX" in out and "INDUSTRIES" in out and "Springfield" in out
    # rescued neighbors exist but the far-away numerics are stripped
    assert "13611" not in out
    kept = out.split()
    assert len(kept) < len(line.split())


def test_markdown_table_handling():
    text = "| Name | Age |\n|------|-----|\n| Alice | 30 |\nprose line"
    out = denoise_text_py(text, CFG)
    assert out == "Name Age\nAlice 30\nprose line"


def test_disabled_passthrough():
    cfg = DenoiserConfig(enabled=False)
    assert denoise_text_py("123 456", cfg) == "123 456"


def test_symbol_only_lines_dropped():
    assert denoise_text_py("-----\n*****\nreal text here", CFG) == "real text here"


def test_udf_matches_python(spark):
    texts = [
        "plain prose line",
        "| a | b |\n|---|---|\n| x | 1 |",
        "42 524 NOVEX INDUSTRIES Springfield 10788 143 1995 190 394",
        "999 888 777",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(denoise_udf(CFG)(F.col("text"))).collect()]
    assert got == [denoise_text_py(t, CFG) for t in texts]


def test_gates12_col_agrees_on_non_wave_inputs(spark):
    """Where gate 3's wave expansion isn't triggered, the native column and
    the full Python pipeline agree; digit-heavy lines are dropped outright
    by the native predicate (documented conservative approximation)."""
    texts = [
        "plain prose line",
        "| name | age |\n|---|---|\n| alpha | beta |",
        "symbols ---\n123 456",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(denoise_gates12_col("text", CFG)).collect()]
    assert got[0] == "plain prose line"
    assert got[1] == "name age\nalpha beta"
    assert got[2] == "symbols ---"


DENOISE_WAVE_CASES = [
    # digit-heavy line: 'totals' seeds, numbers rescued while ratio allows
    "totals 12 34",
    "totals 123456 789012 345678",
    "a 1 2 3 4 5 6 7 8 9 10 11 12",
    "| h1 | h2 |\n|---|---|\n| a1 | 99999 |\n12345\nplain words here",
    "9999 x 9999",
    "x1x 2 y3y",
    "",
    "   \n\t\n",
    "word\n| 1 | 2 |\n|:-:|---|\nmixed 5 tail 666666",
]


def test_native_denoise_full_matches_python_reference(spark):
    """The closed-form layer arithmetic must reproduce the iterative wave
    expansion (denoiser_preprocessor.rs:70-140) exactly, case by case."""
    from rust_triplets_spark.operators.denoiser import denoise_full, denoise_text_py

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DENOISE_WAVE_CASES)], "id long, t string"
    )
    got = {r["id"]: r["text_clean"] for r in denoise_full(df, "id", "t").collect()}
    for i, t in enumerate(DENOISE_WAVE_CASES):
        assert got[i] == denoise_text_py(t), f"case {i}: {t!r}"


def test_native_denoise_full_matches_pandas_udf_path(spark):
    from rust_triplets_spark.operators.denoiser import denoise_full, denoise_udf

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DENOISE_WAVE_CASES)], "id long, t string"
    )
    udf_out = {
        r["id"]: r["c"] for r in df.select("id", denoise_udf()("t").alias("c")).collect()
    }
    nat_out = {r["id"]: r["text_clean"] for r in denoise_full(df, "id", "t").collect()}
    assert nat_out == udf_out


NON_ASCII_CASES = [
    # gate 2 must keep lines whose only letters are non-Latin (the
    # reference counts Unicode is_alphabetic, not [A-Za-z])
    "Привет мир 123",
    "München straße 42 99999 00000 11111",
    "日本語テキスト 12345",
    "café résumé 1 2 3 4 5 6 7 8 9 10 11 12 13 14",
    "42 524 ここ 10788 143",
    "№ 123 456",  # № is not a letter: line should drop
    "一 1 2 3",  # NBSP / EM-space token separators
]


def test_native_denoiser_matches_python_twin_on_non_ascii(spark):
    """ADVICE r3: the native path must count alpha via Unicode letter
    classes (\\p{L}) like the Rust reference's is_alphabetic() and the
    Python twin's str.isalpha() — not ASCII [A-Za-z]."""
    from rust_triplets_spark.operators.denoiser import denoise_full, denoise_text_py

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NON_ASCII_CASES)], "id long, t string"
    )
    got = {r["id"]: r["text_clean"] for r in denoise_full(df, "id", "t").collect()}
    for i, t in enumerate(NON_ASCII_CASES):
        assert got[i] == denoise_text_py(t), f"case {i}: {t!r}"


def test_native_denoiser_matches_duckdb_twin_on_non_ascii(spark):
    import duckdb

    from rust_triplets_spark.operators.denoiser import denoise_full, denoise_full_sql

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NON_ASCII_CASES)], "id long, t string"
    )
    got = {r["id"]: r["text_clean"] for r in denoise_full(df, "id", "t").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE cases (id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO cases VALUES (?, ?)", list(enumerate(NON_ASCII_CASES)))
    want = dict(con.execute(denoise_full_sql("cases", "id", "t")).fetchall())
    assert got == want
