"""Non-Latin cross-engine parity for the r4 text-pipeline operators.

The denoiser's gates got Unicode ``\\p{L}`` classes in r4; the C4 filter,
boilerplate line dedup, and Gopher repetition signals use the same regex
families (word/punctuation/token classes), so this suite runs the exact
driver queries against their DuckDB oracle twins over a documents fixture
of Cyrillic / CJK / accented / RTL / emoji / combining-mark texts —
the adversarial rows the synthetic vocab (pure ASCII) never exercises.
Exact value comparison, same normalizer as scripts/check_correctness.py.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)
from check_correctness import compare  # noqa: E402

DOCS = [
    # Cyrillic: repeated boilerplate line + a real sentence with terminal punct
    (0, "Подпишитесь на нашу рассылку\nЭто статья о распределённых системах. "
        "Они обрабатывают данные быстро.", "ru", "src0"),
    (1, "Подпишитесь на нашу рассылку\nВторая статья про оптимизатор запросов. "
        "Он переупорядочивает соединения!", "ru", "src0"),
    # CJK: no spaces, ideographic full stop
    (2, "这是一个关于分布式计算的文档。它解释了洗牌和分区。数据处理速度很快。", "zh", "src1"),
    (3, "分散処理について説明します。データは並列に処理されます。", "ja", "src1"),
    # accented Latin + combining marks (é composed vs e+́ decomposed)
    (4, "L'exécution répartie est rapide. Les jointures sont réordonnées. "
        "Ça marche très bien!", "fr", "src2"),
    # RTL Arabic
    (5, "هذه وثيقة عن المعالجة الموزعة. البيانات تعالج بسرعة.", "ar", "src2"),
    # emoji + mixed scripts + repeated n-grams (repetition signal fodder)
    (6, "spark 🚀 очень fast. spark 🚀 очень fast. spark 🚀 очень fast. "
        "данные данные данные поток поток поток.", "mix", "src3"),
    # short lorem with javascript/curly braces (C4 rule triggers) in Cyrillic context
    (7, "включите javascript чтобы продолжить\nНормальное предложение в конце.", "ru", "src3"),
    # exact duplicate of doc 2 (exact-dedup path within these ops' groupings)
    (8, "这是一个关于分布式计算的文档。它解释了洗牌和分区。数据处理速度很快。", "zh", "src1"),
]

QUERIES = ["c4_doc_filter", "line_boilerplate_dedup", "repetition_signals"]


@pytest.fixture(scope="module")
def nonlatin_sf_dir(tmp_path_factory):
    """A minimal sf_dir holding only the non-Latin documents table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nonlatin_sf")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": [r[1] for r in DOCS],
            "lang": [r[2] for r in DOCS],
            "source": [r[3] for r in DOCS],
            "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
        }),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_nonlatin_exact_parity(spark, nonlatin_sf_dir, name):
    from rust_triplets_spark.plans import driver_queries as DQ

    sdf = DQ.QUERIES[name](spark, nonlatin_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nonlatin_sf_dir}/documents.parquet')"
    )
    ddf = con.execute(DQ.ORACLES[name]).df()
    assert len(sdf) > 0, "fixture produced an empty frame — nothing exercised"
    problems = compare(name, sdf, ddf)
    assert not problems, problems
