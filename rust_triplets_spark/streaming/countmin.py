"""Streaming Count-Min frequency gate — estimate token corpus-frequency
AT INGEST against a frozen sketch, without shipping the vocabulary.

Batch twin: :func:`rust_triplets_spark.operators.sketches
.countmin_heavy_hitters`. The split is the streaming/bloom.py joint:
the sketch TRAINS batch-side (:func:`countmin_model` — the collect is
``depth × width`` int64 cells BY CONSTRUCTION, 4×64 = 2 KB here, even
8×65536 is 4 MB), and the stream side is ONE row-local Arrow-batched
pandas UDF over the text column (sketch rides the closure) — map-only:
no join, no shuffle, no state store, append mode.

Per document it emits the boilerplate-ish signals a frequency sketch
answers at ingest: ``n_tokens``, ``n_common`` (tokens whose ESTIMATED
corpus count crosses the phi threshold — CM overcounts one-sidedly, so
this gate never under-flags), and ``common_ratio_micro`` (exact integer
micro-units, floor). Estimate parity with the batch operator is
pytest-pinned token-for-token: the numpy hash is the same 31-bit
recurrence (every intermediate < 2^63)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import INC_B, M31, MULT_A, MULT_B
from rust_triplets_spark.operators.sketches import (
    CM_DEPTH,
    CM_SEED,
    CM_WIDTH,
)


@dataclass(frozen=True)
class CountMinModel:
    """Frozen sketch: cells[depth, width] + the corpus token total."""

    cells: np.ndarray  # int64[depth, width]
    n_total: int
    depth: int
    width: int
    seed: int


def countmin_model(
    df: DataFrame,
    text_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = CM_SEED,
) -> CountMinModel:
    """Build the sketch over a batch corpus; the collect is
    ``depth * width`` rows regardless of corpus size."""
    from rust_triplets_spark.functions.hashing import hash31_str_col
    from rust_triplets_spark.functions.text import tokens_col

    if depth < 1 or width < 2:
        raise ValueError(f"countmin: bad depth={depth}/width={width}")
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    buckets = F.array(*[
        (hash31_str_col(F.col("token"), seed + r) % width).cast("long")
        for r in range(depth)
    ])
    rows = (
        counts.select("cnt", F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cell"))
        .collect()
    )
    cells = np.zeros((depth, width), dtype=np.int64)
    total = 0
    for r in rows:
        cells[int(r["row"]), int(r["bucket"])] = int(r["cell"])
    total = int(cells[0].sum())  # row 0 holds every token once
    return CountMinModel(cells, total, depth, width, seed)


def _hash31_str_np(tokens: list, seed: int) -> np.ndarray:
    """Vectorized string hash: strfold (h*31+ord mod M31) then hash31 —
    the same recurrence as ``functions.hashing.hash31_str_py``."""
    folded = np.zeros(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % M31
        folded[i] = h
    s = (seed * MULT_A) % M31
    h0 = ((folded % M31) + M31 + s) % M31
    h1 = (h0 * MULT_B + INC_B) % M31
    h2 = h1 ^ (h1 >> 15)
    return (h2 * MULT_A) % M31


def cm_estimate_tokens(model: CountMinModel, tokens: list) -> np.ndarray:
    """Estimated corpus counts for a token list (min over depth rows)."""
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(model.depth):
        pos = _hash31_str_np(tokens, model.seed + r) % model.width
        est = np.minimum(est, model.cells[r][pos])
    return est


def frequency_gate_col(
    model: CountMinModel, text, phi_num: int = 1, phi_den: int = 150
):
    """Row-local struct column ``(n_tokens, n_common,
    common_ratio_micro)`` over a text column — the ingest-side
    frequency gate (model in the closure, Arrow-batched)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from rust_triplets_spark.functions.text import WS
    import re

    ws = re.compile(WS)
    out_type = StructType([
        StructField("n_tokens", LongType()),
        StructField("n_common", LongType()),
        StructField("common_ratio_micro", LongType()),
    ])

    @F.pandas_udf(out_type)
    def _gate(texts):
        import pandas as pd

        nt, nc, ratio = [], [], []
        for t in texts:
            toks = [w for w in ws.split(t or "") if w]
            if not toks:
                nt.append(0)
                nc.append(0)
                ratio.append(0)
                continue
            est = cm_estimate_tokens(model, toks)
            common = int((est * phi_den >= phi_num * model.n_total).sum())
            nt.append(len(toks))
            nc.append(common)
            ratio.append(common * 1_000_000 // len(toks))
        return pd.DataFrame(
            {"n_tokens": nt, "n_common": nc, "common_ratio_micro": ratio}
        )

    return _gate(text)


def stream_frequency_gate(
    spark,
    src_dir: str,
    schema,
    model: CountMinModel,
    id_col: str,
    text_col: str,
    phi_num: int = 1,
    phi_den: int = 150,
) -> DataFrame:
    """The streaming gate: a parquet-directory stream scored against the
    frozen sketch — map-only, append mode."""
    sdf = spark.readStream.schema(schema).parquet(src_dir)
    g = frequency_gate_col(model, F.col(text_col), phi_num, phi_den)
    return sdf.select(
        F.col(id_col).cast("long").alias("id"),
        g["n_tokens"].alias("n_tokens"),
        g["n_common"].alias("n_common"),
        g["common_ratio_micro"].alias("common_ratio_micro"),
    )
