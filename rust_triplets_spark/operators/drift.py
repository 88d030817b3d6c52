"""Distribution-drift monitoring — the Population Stability Index (PSI),
the standard production-ML drift metric (bank-scorecard lineage; the
same quantity is the symmetrized discrete KL term), computed per corpus
slice against the corpus-wide baseline. A continuously-ingesting
training pipeline needs exactly this watchdog: "did source X's length /
quality / value distribution move away from what the mixture was tuned
for?" — PSI > 0.1 is the conventional "investigate", > 0.25 "act".

Cross-engine exactness (the repo contract): bin counts are exact
integers; probabilities live on the 1e-6 integer grid via floor
division with +1 Laplace smoothing (no empty-bin ln singularities); the
per-bin log-ratio is ONE ``round(ln(exact-integer-ratio) * 1e6)`` — the
tfidf ``score_q`` precedent: both engines feed the same exact rational
into libm and round to the same 1e-6 grid. The PSI is then a SUM of at
most ``n_bins`` exact integers (order-independent), reported in 1e-12
units (micro-prob × micro-ln = pico).

Known bias, deterministic and documented: the +1 Laplace floor compares
differently-sized samples (slice vs corpus), adding O(n_bins / n_rows)
to an identical-distribution slice's PSI (~0.04 for a 20-row slice on
a 16-bin grid, vanishing as slices grow). That sits well under the 0.1
"investigate" threshold and affects every slice monotonically in size —
the standard epsilon-floor PSI has the same property.

Scale shape at 100 TB: one partial-aggregable groupBy (slice, bin) over
a row-local bin expression, one tiny baseline aggregate (n_bins rows,
broadcast), one broadcast join — no shuffle wider than the slice×bin
frame, nothing collects. Works unchanged on streaming micro-batches
(the bin counts are additive)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_BINS = 16
PSI_BIN_WIDTH = 64  # n_chars grid: covers the generator's [48, 553] span
PSI_Q = 1_000_000   # probability + ln grid: 1e-6


def source_drift_psi(
    df: DataFrame,
    slice_col: str,
    value_col: str,
    n_bins: int = PSI_BINS,
    bin_width: int = PSI_BIN_WIDTH,
) -> DataFrame:
    """Per-slice PSI of an integer value column against the corpus-wide
    baseline: ``(slice, n_rows, psi_pico)`` ordered by psi desc then
    slice asc. Bin = ``least(value div bin_width, n_bins - 1)`` (fixed
    grid — deterministic, no quantile collect); +1 smoothing on EVERY
    bin of both sides, so slices missing a bin drift, not crash."""
    if n_bins < 2 or bin_width < 1:
        raise ValueError(f"psi: bad n_bins={n_bins}/bin_width={bin_width}")
    binned = df.select(
        F.col(slice_col).alias("slice"),
        F.least(
            F.expr(f"{value_col} div {bin_width}"), F.lit(n_bins - 1)
        ).cast("long").alias("bin"),
    )
    slices = binned.groupBy("slice").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    # dense slice×bin grid (every bin participates via smoothing)
    grid = slices.select("slice", "n_rows").crossJoin(
        F.broadcast(
            df.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
        )
    )
    sc = binned.groupBy("slice", "bin").agg(
        F.count("*").cast("long").alias("c")
    )
    bc = binned.groupBy("bin").agg(F.count("*").cast("long").alias("bc"))
    n_total = binned.count()  # scalar baseline size
    cells = (
        grid.join(sc, ["slice", "bin"], "left")
        .join(F.broadcast(bc), ["bin"], "left")
        .select(
            "slice",
            "n_rows",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.coalesce("bc", F.lit(0)).cast("long").alias("bc"),
        )
    )
    # smoothed micro-probabilities (exact floor) + quantized log-ratio of
    # the EXACT rational ((c+1)*(N_base+B)) / ((bc+1)*(n_rows+B))
    p_q = F.expr(f"(c + 1) * {PSI_Q}L div (n_rows + {n_bins})")
    q_q = F.expr(f"(bc + 1) * {PSI_Q}L div ({n_total} + {n_bins})")
    # factors cast to double BEFORE multiplying: no int64 overflow at any
    # scale, and double mult/div are IEEE exact-rounded — deterministic
    # across engines
    ln_q = F.expr(
        f"cast(round(ln(cast(c + 1 as double) * cast({n_total} + {n_bins} as double)"
        f" / (cast(bc + 1 as double) * cast(n_rows + {n_bins} as double)))"
        f" * {PSI_Q}) as bigint)"
    )
    return (
        cells.select(
            "slice",
            "n_rows",
            ((p_q - q_q) * ln_q).cast("long").alias("term"),
        )
        .groupBy("slice")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.sum("term").cast("long").alias("psi_pico"),
        )
        .orderBy(F.col("psi_pico").desc(), F.col("slice").asc())
    )


def source_drift_psi_sql(
    table: str,
    slice_sql: str,
    value_sql: str,
    n_bins: int = PSI_BINS,
    bin_width: int = PSI_BIN_WIDTH,
) -> str:
    """DuckDB twin of :func:`source_drift_psi` — same grid, same floor
    probabilities, same single quantized ln per cell."""
    if n_bins < 2 or bin_width < 1:
        raise ValueError(f"psi: bad n_bins={n_bins}/bin_width={bin_width}")
    return f"""
WITH psi_binned AS MATERIALIZED (
  SELECT {slice_sql} AS slc,
         least({value_sql} // {bin_width}, {n_bins - 1}) AS bin
  FROM {table} t
), psi_slices AS (
  SELECT slc, CAST(count(*) AS BIGINT) AS n_rows FROM psi_binned GROUP BY slc
), psi_total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM psi_binned
), psi_sc AS (
  SELECT slc, bin, CAST(count(*) AS BIGINT) AS c
  FROM psi_binned GROUP BY 1, 2
), psi_bc AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS bc FROM psi_binned GROUP BY 1
), psi_cells AS (
  SELECT s.slc, s.n_rows, g.bin,
         coalesce(c.c, 0) AS c, coalesce(b.bc, 0) AS bc, t.n_total
  FROM psi_slices s
  CROSS JOIN (SELECT unnest(range({n_bins})) AS bin) g
  LEFT JOIN psi_sc c ON s.slc = c.slc AND g.bin = c.bin
  LEFT JOIN psi_bc b ON g.bin = b.bin
  CROSS JOIN psi_total t
)
SELECT slc AS slice, any_value(n_rows) AS n_rows,
       CAST(sum(
         ((c + 1) * {PSI_Q} // (n_rows + {n_bins})
          - (bc + 1) * {PSI_Q} // (n_total + {n_bins}))
         * CAST(round(ln(CAST(c + 1 AS DOUBLE) * CAST(n_total + {n_bins} AS DOUBLE)
                         / (CAST(bc + 1 AS DOUBLE) * CAST(n_rows + {n_bins} AS DOUBLE)))
                      * {PSI_Q}) AS BIGINT)
       ) AS BIGINT) AS psi_pico
FROM psi_cells
GROUP BY slc
ORDER BY psi_pico DESC, slice ASC
"""
