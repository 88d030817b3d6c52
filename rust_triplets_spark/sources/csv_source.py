"""CSV source → canonical records (SURVEY §2.1 ``CsvSource``, reference
``src/source/backends/csv_source.rs:149-348``).

Two modes (csv_source.rs:92-114):

- **role mode**: ``anchor_column`` (+ optional ``positive_column``) → the
  anchor text becomes an Anchor section, the positive a Context section;
- **text mode**: ``text_column`` → the same text becomes BOTH Anchor and
  Context sections (SimCSE pairing, csv_source.rs:307-320).

Shared semantics: headered CSV, case-insensitive column lookup
(csv_source.rs:253-255), inline whitespace normalized, rows with empty
required fields skipped (csv_source.rs:279-295), ``trust`` defaults 0.85,
``id = '{source_id}::row_{idx}'``, ``taxonomy = [source_id]``.

Row-index determinism: the reference reads the file eagerly in order. Spark
assigns ``row_{idx}`` per input file via a window over the file's internal
order — stable for a fixed file set (ids are only promised stable for an
immutable corpus snapshot, same as the reference's file-order contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import normalize_inline_whitespace_col
from rust_triplets_spark.operators.triplets import TripletRecipe
from rust_triplets_spark.schema import CSV_DEFAULT_TRUST, make_section


@dataclass(frozen=True)
class CsvSourceConfig:
    """Mirrors ``CsvSourceConfig`` (csv_source.rs:33-53)."""

    source_id: str
    path: str
    anchor_column: str | None = None
    positive_column: str | None = None
    text_column: str | None = None
    trust: float = CSV_DEFAULT_TRUST

    def mode(self) -> str:
        if self.text_column:
            return "text"
        if self.anchor_column:
            return "role"
        raise ValueError("need anchor_column (role mode) or text_column (text mode)")


def _ci_lookup(df: DataFrame, name: str) -> str:
    """Case-insensitive column resolution (csv_source.rs:253-255)."""
    for c in df.columns:
        if c.lower() == name.lower():
            return c
    raise ValueError(f"column {name!r} not in CSV header {df.columns}")


def read_csv_records(spark: SparkSession, cfg: CsvSourceConfig) -> DataFrame:
    """CSV → record frame with positional ``{source}::row_{i}`` ids.

    Id-stability contract (SURVEY §1; r10 advice "what's wrong" #3): the
    reference's row ids are POSITIONAL — row ``i`` of the file — and this
    reader reproduces that via ``row_number() over (partition by
    input_file_name() order by monotonically_increasing_id())``. Within
    one Spark version and scan config that is deterministic: Spark
    enumerates a file's splits in offset order and
    ``monotonically_increasing_id`` is monotone in (partition id, row
    position), so the window order IS file order. The caveat at 100 TB:
    the ordering contract is *split-enumeration order*, not data — a CSV
    large enough to split relies on ``spark.sql.files.maxPartitionBytes``
    (and the non-splittable-codec rules) staying fixed between reads.
    Deployments that re-read the same corpus across config changes should
    pin ``maxPartitionBytes`` next to the data, or persist the id mapping
    once and join — the same discipline the reference needs when a file
    is edited in place (positional ids shift either way).
    ``test_sources_pipeline.py::test_csv_multisplit_ids_stable`` pins the
    multi-split re-read equality this rests on."""
    raw = spark.read.option("header", True).csv(cfg.path)
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    idx = F.row_number().over(w) - 1
    raw = raw.withColumn("__idx", idx)

    if cfg.mode() == "role":
        a_col = _ci_lookup(raw, cfg.anchor_column)
        anchor = normalize_inline_whitespace_col(a_col)
        sections = [make_section("anchor", anchor)]
        required = anchor
        if cfg.positive_column:
            p_col = _ci_lookup(raw, cfg.positive_column)
            positive = normalize_inline_whitespace_col(p_col)
            sections.append(make_section("context", positive))
            required = F.when(
                (F.length(anchor) > 0) & (F.length(positive) > 0), F.lit(True)
            )
        else:
            required = F.when(F.length(anchor) > 0, F.lit(True))
    else:
        t_col = _ci_lookup(raw, cfg.text_column)
        text = normalize_inline_whitespace_col(t_col)
        # SimCSE: same text → Anchor + Context (csv_source.rs:307-320)
        sections = [make_section("anchor", text), make_section("context", text)]
        required = F.when(F.length(text) > 0, F.lit(True))

    return (
        raw.where(required.isNotNull())
        .select(
            F.concat(F.lit(f"{cfg.source_id}::row_"), F.col("__idx")).alias("id"),
            F.lit(cfg.source_id).alias("source"),
            F.lit(None).cast("timestamp").alias("created_at"),
            F.lit(None).cast("timestamp").alias("updated_at"),
            F.lit(float(cfg.trust)).cast("float").alias("trust"),
            F.array(F.lit(cfg.source_id)).alias("taxonomy"),
            F.array(*sections).alias("sections"),
        )
    )


def default_triplet_recipes(cfg: CsvSourceConfig) -> list[TripletRecipe]:
    """Source-declared default recipe lanes (csv_source.rs:368-409)."""
    if cfg.mode() == "role":
        return [
            TripletRecipe(
                name="csv_anchor_positive_wrong_article",
                negative_strategy="wrong_article",
                weight=1.0,
            ),
            TripletRecipe(
                name="csv_question_answer_mismatch",
                negative_strategy="qa_mismatch",
                weight=0.5,
            ),
        ]
    return [
        TripletRecipe(
            name="csv_simcse_dropout_pair",
            negative_strategy="wrong_article",
            weight=1.0,
            allow_same_anchor_positive=True,  # csv_source.rs:368-383
        )
    ]
