"""Temporal-offset nearest-neighbor selection — the reference's as-of join
(``select_temporal_neighbor``, src/sampler/mod.rs:950-976): target time =
``created_at + offset_days``; candidates are *different* records in the
*same split* sharing the group (source / leading taxonomy value); pick the
candidate minimizing ``|created_at - target|`` (tie-break on id).

Scale design — NOT a theta self-join (per-group all-pairs is O(n²/g): 150k
orders in 15 groups ≈ 1.5e9 pairs). Instead the classic distributed as-of:

1. rank candidates per group by (ts, id) → ``rc`` (one sort);
2. union candidates and targets into one stream, sorted per group by
   (t, candidates-first, id); a running ``sum(is_cand)`` gives every target
   its *insertion point* k = #candidates at-or-before the target instant;
3. the nearest candidate ≠ self must sit at rank k-1, k, k+1, or k+2
   (self occupies at most one of the adjacent slots), so explode those four
   offsets and resolve each with a 1:1 equi-join on (group, rank);
4. keep min(|ts - target|, id) per target.

Cost: two sorts + a 4× fan-out equi-join — O(n log n), skew-free, and the
identical algorithm runs in DuckDB SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.timeutils import epoch_seconds_col  # noqa: F401 (re-export)


def asof_nearest(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    group_col: str,
    split_col: str | None = None,
    offset_days: int = 30,
    ts_is_epoch: bool = False,
) -> DataFrame:
    """For each row: the nearest *other* row of the same (group, split) to
    ``ts + offset_days``. Returns (id, neighbor_id, distance_seconds)."""
    gcols = [group_col] + ([split_col] if split_col else [])
    ts = (
        F.col(ts_col).cast("long") if ts_is_epoch else epoch_seconds_col(ts_col)
    )
    base = df.select(
        F.col(id_col).alias("id"), *[F.col(c) for c in gcols], ts.alias("__ts")
    )

    w_rc = Window.partitionBy(*gcols).orderBy(F.col("__ts").asc(), F.col("id").asc())
    cands = base.withColumn("__rc", F.row_number().over(w_rc))

    stream = cands.select(
        *gcols, F.col("__ts").alias("__t"), F.lit(1).alias("__is_cand"),
        F.col("id"), F.col("__rc"),
    ).unionByName(
        base.select(
            *gcols,
            (F.col("__ts") + F.lit(offset_days * 86400)).alias("__t"),
            F.lit(0).alias("__is_cand"),
            F.col("id"),
            F.lit(None).cast("int").alias("__rc"),
        )
    )
    w_run = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("__t").asc(), F.col("__is_cand").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    targets = (
        stream.withColumn("__k", F.sum("__is_cand").over(w_run))
        .where(F.col("__is_cand") == 0)
        .select(*gcols, F.col("id"), F.col("__t").alias("__target"), F.col("__k"))
    )
    probes = targets.withColumn("__off", F.explode(F.array(*[F.lit(o) for o in (-1, 0, 1, 2)]))).withColumn(
        "__probe_rc", (F.col("__k") + F.col("__off")).cast("int")
    )
    slots = cands.select(
        *gcols, F.col("id").alias("__cid"), F.col("__ts").alias("__cts"), F.col("__rc").alias("__probe_rc")
    )
    hits = (
        probes.join(slots, [*gcols, "__probe_rc"], "inner")
        .where(F.col("__cid") != F.col("id"))
        .withColumn("__dist", F.abs(F.col("__cts") - F.col("__target")))
    )
    w_best = Window.partitionBy("id").orderBy(F.col("__dist").asc(), F.col("__cid").asc())
    return (
        hits.withColumn("__rn", F.row_number().over(w_best))
        .where(F.col("__rn") == 1)
        .select(
            "id",
            F.col("__cid").alias("neighbor_id"),
            F.col("__dist").cast("long").alias("distance_seconds"),
        )
    )


def asof_nearest_sql(
    table_sql: str,
    id_sql: str,
    ts_sql: str,
    group_sql: str,
    split_sql: str | None = None,
    offset_days: int = 30,
    where: str = "TRUE",
    ts_is_epoch: bool = False,
) -> str:
    """DuckDB twin of :func:`asof_nearest` — the same insertion-point
    algorithm, window-for-window."""
    split_sel = f", {split_sql} AS split" if split_sql else ""
    gcols = "grp" + (", split" if split_sql else "")
    off = offset_days * 86400
    ts_expr = f"CAST({ts_sql} AS BIGINT)" if ts_is_epoch else f"CAST(epoch({ts_sql}) AS BIGINT)"
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_sql} AS id, {ts_expr} AS ts, {group_sql} AS grp{split_sel}
  FROM {table_sql} WHERE {where}
), cands AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY {gcols} ORDER BY ts, id) AS rc
  FROM base
), stream AS (
  SELECT {gcols}, ts AS t, 1 AS is_cand, id, rc FROM cands
  UNION ALL
  SELECT {gcols}, ts + {off} AS t, 0 AS is_cand, id, NULL AS rc FROM base
), targets AS MATERIALIZED (
  SELECT {gcols}, id, t AS target, k FROM (
    SELECT *, sum(is_cand) OVER (
      PARTITION BY {gcols} ORDER BY t, is_cand DESC, id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
    FROM stream
  ) WHERE is_cand = 0
), hits AS (
  SELECT tg.id, c.id AS cid, abs(c.ts - tg.target) AS dist
  FROM targets tg, UNNEST([-1, 0, 1, 2]) AS o(off)
  JOIN cands c ON {' AND '.join(f'c.{g} = tg.{g}' for g in gcols.split(', '))}
              AND c.rc = tg.k + o.off
  WHERE c.id <> tg.id
)
SELECT id, cid AS neighbor_id, CAST(dist AS BIGINT) AS distance_seconds
FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn FROM hits)
WHERE rn = 1
"""
