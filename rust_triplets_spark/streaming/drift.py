"""Streaming PSI drift monitoring — watch per-slice distribution drift
AT INGEST, against a frozen baseline.

Batch twin: :func:`rust_triplets_spark.operators.drift.source_drift_psi`.
The split follows this package's train-batch / apply-stream joint
(streaming/quality.py): the BASELINE bin distribution is aggregated
once batch-side into a driver object of ``n_bins`` integers
(:func:`psi_baseline_model` — bounded by construction), and the stream
side is ONE streaming groupBy(slice) whose aggregate list carries a
conditional count per bin — so the whole monitor is a single streaming
aggregation (Spark allows exactly one) with state bounded by
``slices × n_bins`` counters, update/complete mode, no watermark
needed. The PSI itself is a row-local POST-aggregation expression over
the per-bin columns: identical integer/quantized-ln math to the batch
operator, so when the model is built over the same corpus the stream's
final answer EQUALS ``source_drift_psi`` bit-for-bit (pytest-pinned),
not merely approximates it.

Scale shape: the model ships as ``n_bins`` literals inside the plan;
per micro-batch the update is a partial-aggregable count; nothing about
the stream grows with corpus size except the per-slice counters."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.drift import PSI_BIN_WIDTH, PSI_BINS, PSI_Q


@dataclass(frozen=True)
class PsiBaselineModel:
    """Frozen baseline: raw per-bin counts + total (exact integers)."""

    bin_counts: tuple[int, ...]
    n_total: int
    n_bins: int
    bin_width: int


def psi_baseline_model(
    df: DataFrame,
    value_col: str,
    n_bins: int = PSI_BINS,
    bin_width: int = PSI_BIN_WIDTH,
) -> PsiBaselineModel:
    """Aggregate the baseline corpus once; the collect is ``n_bins``
    rows by construction."""
    if n_bins < 2 or bin_width < 1:
        raise ValueError(f"psi: bad n_bins={n_bins}/bin_width={bin_width}")
    rows = (
        df.select(
            F.least(
                F.expr(f"{value_col} div {bin_width}"), F.lit(n_bins - 1)
            ).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    )
    counts = [0] * n_bins
    for r in rows:
        counts[int(r["bin"])] = int(r["c"])
    return PsiBaselineModel(
        bin_counts=tuple(counts),
        n_total=sum(counts),
        n_bins=n_bins,
        bin_width=bin_width,
    )


def psi_against_model(
    df: DataFrame, model: PsiBaselineModel, slice_col: str, value_col: str
) -> DataFrame:
    """``(slice, n_rows, psi_pico)`` of ANY frame — batch or streaming —
    against the frozen baseline. One groupBy(slice) whose aggregates are
    a conditional count per bin; the PSI is a post-agg expression with
    the batch operator's exact math (same floor grids, same quantized
    ln), so model-over-the-same-corpus equals ``source_drift_psi``."""
    b_tot = model.n_total
    nb = model.n_bins
    binned = df.select(
        F.col(slice_col).alias("slice"),
        F.least(
            F.expr(f"{value_col} div {model.bin_width}"), F.lit(nb - 1)
        ).cast("long").alias("bin"),
    )
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for b in range(nb):
        aggs.append(
            F.sum(F.when(F.col("bin") == b, 1).otherwise(0))
            .cast("long").alias(f"c_{b}")
        )
    g = binned.groupBy("slice").agg(*aggs)
    terms = []
    for b in range(nb):
        bc = model.bin_counts[b]
        q_q = (bc + 1) * PSI_Q // (b_tot + nb)
        p_q = F.expr(f"(c_{b} + 1) * {PSI_Q}L div (n_rows + {nb})")
        ln_q = F.expr(
            f"cast(round(ln(cast(c_{b} + 1 as double)"
            f" * cast({b_tot} + {nb} as double)"
            f" / (cast({bc + 1} as double) * cast(n_rows + {nb} as double)))"
            f" * {PSI_Q}) as bigint)"
        )
        terms.append((p_q - F.lit(q_q)) * ln_q)
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    return g.select(
        "slice", "n_rows", psi.cast("long").alias("psi_pico")
    )


def stream_drift_psi(
    spark,
    src_dir: str,
    schema,
    model: PsiBaselineModel,
    slice_col: str,
    value_col: str,
) -> DataFrame:
    """The streaming monitor: a parquet-directory stream scored against
    the frozen baseline. Returns the streaming frame; write with
    ``outputMode("complete")`` (one streaming aggregation, tiny
    slices×bins state)."""
    sdf = spark.readStream.schema(schema).parquet(src_dir)
    return psi_against_model(sdf, model, slice_col, value_col)
