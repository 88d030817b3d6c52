"""MLlib pipeline surface (BASELINE.json approach: "MLlib pipeline + custom
transformers for sampling"; SURVEY §7.0).

Each preprocessing step is a ``pyspark.ml`` ``Transformer`` so the whole
ingest → denoise → split → chunk path composes as a ``Pipeline`` (the
reference's ``TextPreprocessor`` registration, src/preprocessor/mod.rs:51-58
+ src/config.rs:102-119, as first-class MLlib stages)."""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Pipeline, Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.chunking import ChunkingStrategy, chunk_sections
from rust_triplets_spark.operators.denoiser import DenoiserConfig, denoise_doc_col
from rust_triplets_spark.operators.splits import split_label_col


class DenoiserTransformer(Transformer):
    """Full three-gate denoiser (wave expansion included) on a text column;
    rows whose text denoises to nothing are DROPPED (section-drop
    semantics, preprocessor/mod.rs:51-58). Runs as the native closed-form
    column expression — no Python UDF in the pipeline's hot path."""

    @keyword_only
    def __init__(self, inputCol: str = "text", outputCol: str = "text",
                 maxDigitRatio: float = 0.35, stripMarkdown: bool = True):
        super().__init__()
        self._in, self._out = inputCol, outputCol
        self._cfg = DenoiserConfig(True, maxDigitRatio, stripMarkdown)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(self._out, denoise_doc_col(self._in, self._cfg))
        return out.where(F.col(self._out).isNotNull())


class SplitAssigner(Transformer):
    """Deterministic split column (src/splits.rs:623-637)."""

    @keyword_only
    def __init__(self, idCol: str = "id", outputCol: str = "split",
                 seed: int = 42, ratios=(0.8, 0.1, 0.1), idIsString: bool = True):
        super().__init__()
        self._id, self._out = idCol, outputCol
        self._seed, self._ratios, self._is_str = seed, tuple(ratios), idIsString

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self._out, split_label_col(self._id, self._seed, self._ratios, self._is_str)
        )


class ChunkerTransformer(Transformer):
    """Sliding-window chunker (src/chunking/sliding_window.rs) as a stage:
    sections in, chunks out (row-fanout transform)."""

    @keyword_only
    def __init__(self, textCol: str = "text",
                 carryCols=("record_id", "section_idx"),
                 keyCols=("record_id", "section_idx"),
                 strategy: ChunkingStrategy = ChunkingStrategy()):
        super().__init__()
        self._text, self._carry, self._keys = textCol, tuple(carryCols), tuple(keyCols)
        self._strategy = strategy

    def _transform(self, df: DataFrame) -> DataFrame:
        return chunk_sections(df, self._strategy, self._text, self._carry, self._keys)


def ingest_pipeline(
    seed: int = 42,
    ratios=(0.8, 0.1, 0.1),
    strategy: ChunkingStrategy = ChunkingStrategy(),
    denoise: bool = True,
) -> Pipeline:
    """records-sections → denoise → split → chunks, as one MLlib Pipeline.

    Input: a sections frame (record_id, section_idx, text, …). Output: the
    chunks frame with a ``split`` column carried through."""
    stages = []
    if denoise:
        stages.append(DenoiserTransformer(inputCol="text", outputCol="text"))
    stages.append(SplitAssigner(idCol="record_id", seed=seed, ratios=ratios))
    stages.append(
        ChunkerTransformer(
            textCol="text",
            carryCols=("record_id", "section_idx", "split"),
            strategy=strategy,
        )
    )
    return Pipeline(stages=stages)
