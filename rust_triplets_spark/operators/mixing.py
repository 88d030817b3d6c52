"""Weighted multi-source mixing + recipe ordering + corpus metrics
(SURVEY §2.6 weighted_recipe_order, §2.7, §2.10).

- ``weighted_recipe_order`` mirrors src/sampler/mod.rs:2761-2784: tickets
  per recipe = ``clamp(round(w / w_min), 1, 16)``, expanded into slots,
  deterministically shuffled; weight <= 0 excluded.
- ``weighted_interleave`` replaces the reference's smooth weighted
  round-robin drain (src/ingestion.rs:607-675) with *stride scheduling*:
  record r of source i (per-source rank ``rn``, weight ``w_i``) gets virtual
  time ``(rn + 1) / w_i``; the global order sorts by (vtime, source). Over
  any prefix of length n, source i receives ≈ ``n * w_i / W`` slots — the
  same exact-ratio guarantee smooth-WRR provides, but stateless, shardable,
  and SQL-expressible.
- ``source_skew`` / ``capacity_estimate`` mirror src/metrics.rs:42-90 and
  src/heuristics.rs:21-61.

Scale: per-source ``row_number`` is the only shuffle; stats aggregate to a
tiny frame that broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    hash31_col,
    hash31_sql,
    mix31_col,
    mix31_sql,
    strfold_col,
    strfold_sql,
)

RECIPE_ORDER_MAX_WEIGHT_MULTIPLIER = 16  # src/constants.rs:118

# Capacity-estimation constants (src/constants.rs:62-65)
EFFECTIVE_POSITIVES_PER_ANCHOR = 1
EFFECTIVE_NEGATIVES_PER_ANCHOR = 4


def weighted_recipe_order(spark, recipes: list[tuple[str, float]], seed: int = 42) -> DataFrame:
    """Expand (recipe, weight) into a deterministically shuffled slot list.

    Returns (slot BIGINT, recipe STRING). Driver-side config expansion —
    recipes are config, not data (SURVEY §7.0)."""
    kept = [(r, w) for r, w in recipes if w > 0]
    if not kept:
        return spark.createDataFrame([], "slot long, recipe string")
    w_min = min(w for _, w in kept)
    df = spark.createDataFrame(
        [(r, float(w)) for r, w in kept], "recipe string, weight double"
    )
    tickets = F.least(
        F.greatest(F.round(F.col("weight") / F.lit(w_min)).cast("long"), F.lit(1)),
        F.lit(RECIPE_ORDER_MAX_WEIGHT_MULTIPLIER),
    )
    expanded = df.select(
        "recipe", F.explode(F.sequence(F.lit(1), tickets)).alias("ticket")
    )
    key = mix31_col([strfold_col("recipe"), F.col("ticket")], seed)
    w = Window.orderBy(key.asc(), F.col("recipe").asc(), F.col("ticket").asc())
    return expanded.select(
        (F.row_number().over(w) - 1).cast("long").alias("slot"), "recipe"
    )


def weighted_recipe_order_sql(recipes: list[tuple[str, float]], seed: int = 42) -> str:
    kept = [(r, w) for r, w in recipes if w > 0]
    w_min = min(w for _, w in kept)
    values = ", ".join(f"('{r}', {float(w)!r})" for r, w in kept)
    key = mix31_sql([strfold_sql("recipe"), "ticket"], seed)
    return f"""
WITH recipes(recipe, weight) AS (VALUES {values}),
expanded AS (
  SELECT recipe, t.ticket
  FROM recipes, UNNEST(range(1, least(greatest(CAST(round(weight / {float(w_min)!r}) AS BIGINT), 1), {RECIPE_ORDER_MAX_WEIGHT_MULTIPLIER}) + 1)) AS t(ticket)
)
SELECT CAST(row_number() OVER (ORDER BY {key}, recipe, ticket) - 1 AS BIGINT) AS slot, recipe
FROM expanded
"""


def weighted_interleave(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 42,
    id_is_string: bool = True,
) -> DataFrame:
    """Stride-scheduled exact-ratio interleave. Unknown sources default to
    weight 1.0; negative weights are invalid; all-zero falls back to uniform
    (src/sampler/mod.rs:139-156, src/ingestion.rs:407-425)."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("negative source weight")
    if weights and all(w == 0 for w in weights.values()):
        weights = {k: 1.0 for k in weights}
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in weights.items()], "__wsrc string, __weight double"
    )
    from rust_triplets_spark.functions.ordering import (
        bucketed_position,
        bucketed_position_numeric,
    )

    idf = strfold_col(id_col) if id_is_string else F.col(id_col).cast("long")
    order_h = hash31_col(idf, seed)
    # per-source rank and the global stride order are both realized via
    # range-bucketed ranking — neither a giant source nor the global
    # interleave ever funnels through a single sort task
    ranked = bucketed_position(
        df.withColumn("__oh", order_h), "__oh", [id_col],
        part_cols=[source_col], out_col="__rn",
    ).drop("__oh")
    joined = ranked.join(
        F.broadcast(wdf), ranked[source_col] == wdf["__wsrc"], "left"
    ).withColumn("__w", F.coalesce(F.col("__weight"), F.lit(1.0)))
    vtime = (F.col("__rn").cast("double") + F.lit(1.0)) / F.col("__w")
    out = bucketed_position_numeric(
        joined.where(F.col("__w") > 0).withColumn("__vt", vtime),
        "__vt", [source_col, id_col], out_col="position",
    )
    return out.drop("__vt", "__rn", "__w", "__wsrc", "__weight")


def weighted_interleave_sql(
    table_sql: str,
    id_sql: str,
    source_sql: str,
    weights: dict[str, float],
    seed: int = 42,
    id_is_string: bool = True,
) -> str:
    values = ", ".join(f"('{s}', {float(w)!r})" for s, w in weights.items())
    idf = strfold_sql(id_sql) if id_is_string else f"CAST({id_sql} AS BIGINT)"
    order_h = hash31_sql(idf, seed)
    return f"""
WITH w(source, weight) AS (VALUES {values}),
ranked AS (
  SELECT t.*, {id_sql} AS __id, {source_sql} AS __src,
         row_number() OVER (PARTITION BY {source_sql} ORDER BY {order_h}, {id_sql}) - 1 AS __rn
  FROM {table_sql} t
),
joined AS (
  SELECT r.*, coalesce(w.weight, 1.0) AS __w
  FROM ranked r LEFT JOIN w ON r.__src = w.source
)
SELECT *, CAST(row_number() OVER (
  ORDER BY (CAST(__rn AS DOUBLE) + 1.0) / __w, __src, __id) - 1 AS BIGINT) AS position
FROM joined WHERE __w > 0
"""


def source_skew(df: DataFrame, source_col: str) -> DataFrame:
    """Per-source counts + global share/imbalance stats
    (src/metrics.rs:42-90). Returns one row per source."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        F.col(source_col).alias("source"),
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(w).cast("long").alias("total"),
        F.min("n").over(w).cast("long").alias("min_n"),
        F.max("n").over(w).cast("long").alias("max_n"),
        (F.sum("n").over(w).cast("double") / F.count("*").over(w).cast("double")).alias("mean_n"),
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("share"),
        (F.max("n").over(w).cast("double") / F.min("n").over(w).cast("double")).alias("imbalance"),
    )


def source_skew_sql(table_sql: str, source_sql: str) -> str:
    return f"""
WITH counts AS (
  SELECT {source_sql} AS source, count(*) AS n FROM {table_sql} GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(sum(n) OVER () AS BIGINT) AS total,
       CAST(min(n) OVER () AS BIGINT) AS min_n,
       CAST(max(n) OVER () AS BIGINT) AS max_n,
       CAST(sum(n) OVER () AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE) AS mean_n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
       CAST(max(n) OVER () AS DOUBLE) / CAST(min(n) OVER () AS DOUBLE) AS imbalance
FROM counts
"""


def capacity_estimate(df: DataFrame, source_col: str, split_col: str) -> DataFrame:
    """Triplet/pair/text capacity per (source, split)
    (src/heuristics.rs:21-61): raw = n*(n-1), effective = n*1*4,
    pairs = n*(1+(n-1)) = n*n, text = n."""
    eff = EFFECTIVE_POSITIVES_PER_ANCHOR * EFFECTIVE_NEGATIVES_PER_ANCHOR
    return (
        df.groupBy(source_col, split_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col(source_col).alias("source"),
            F.col(split_col).alias("split"),
            F.col("n").cast("long").alias("n"),
            (F.col("n") * (F.col("n") - 1)).cast("long").alias("raw_triplets"),
            (F.col("n") * eff).cast("long").alias("effective_triplets"),
            (F.col("n") * F.col("n")).cast("long").alias("pairs"),
            F.col("n").cast("long").alias("text_samples"),
        )
    )


def capacity_estimate_sql(table_sql: str, source_sql: str, split_sql: str) -> str:
    eff = EFFECTIVE_POSITIVES_PER_ANCHOR * EFFECTIVE_NEGATIVES_PER_ANCHOR
    return f"""
SELECT {source_sql} AS source, {split_sql} AS split,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * (count(*) - 1) AS BIGINT) AS raw_triplets,
       CAST(count(*) * {eff} AS BIGINT) AS effective_triplets,
       CAST(count(*) * count(*) AS BIGINT) AS pairs,
       CAST(count(*) AS BIGINT) AS text_samples
FROM {table_sql} GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# token-budget allocation across sources (water-filling) + budgeted sampling
# ---------------------------------------------------------------------------

def waterfill_allocation(
    counts: DataFrame, group_col: str, count_col: str, budget: int
) -> DataFrame:
    """Allocate an integer ``budget`` across groups by water-filling — the
    standard max-min-fair split a training-data pipeline uses to turn
    "sample B tokens total" into per-source quotas: small sources keep
    everything they have, large sources are capped at a common level so
    no source dominates the mix.

    Exact integer semantics (both engines agree bit-for-bit): order groups
    by (count, group) ascending; group k is *funded* (keeps its full
    count) iff every group up to k satisfies ``c_j <= (B - prefix_{j-1})
    div (n - j + 1)`` — the running-AND makes the funded prefix
    well-defined under integer division. Capped groups receive the common
    level ``L = (B - prefix_K) div (n - K)``; the remainder ``(B -
    prefix_K) % (n - K)`` is handed out as +1 to the first capped groups
    in order. ``sum(alloc) == min(budget, sum(c))`` always.

    Returns ``(group, c, funded, alloc)``.

    Scale note: the ordering windows run over the GROUP frame (one row
    per source), which is tiny by construction — a single-partition
    window over thousands of rows, never over records.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    B = int(budget)
    # asc_nulls_last on the group tiebreak: Spark windows default to NULLS
    # FIRST, DuckDB to NULLS LAST — a NULL group key (corrupt source
    # column) would otherwise shift row_number and hand the +1 remainder
    # units to different groups on each engine
    w_ord = Window.orderBy(F.col("c"), F.col("grp").asc_nulls_last())
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = (
        counts.select(
            F.col(group_col).alias("grp"), F.col(count_col).cast("long").alias("c")
        )
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count("*").over(w_all))
        .withColumn("prefix", F.sum("c").over(w_run))
        .withColumn("s", F.expr(f"({B} - (prefix - c)) div (n - rn + 1)"))
        .withColumn("funded", F.min((F.col("c") <= F.col("s")).cast("int")).over(w_run) == 1)
        .withColumn("K", F.sum(F.col("funded").cast("long")).over(w_all))
        .withColumn(
            "prefixK",
            F.coalesce(F.max(F.when(F.col("funded"), F.col("prefix"))).over(w_all), F.lit(0)),
        )
        .withColumn("L", F.expr(f"({B} - prefixK) div nullif(n - K, 0)"))
        .withColumn("rem", F.expr(f"({B} - prefixK) % nullif(n - K, 0)"))
    )
    alloc = F.when(F.col("funded"), F.col("c")).otherwise(
        F.col("L") + (F.col("rn") - F.col("K") <= F.col("rem")).cast("long")
    )
    return t.select(
        F.col("grp").alias(group_col),
        "c",
        "funded",
        alloc.cast("long").alias("alloc"),
    )


def waterfill_allocation_sql(
    counts_sql: str, group_sql: str, count_sql: str, budget: int,
    group_alias: str = "grp",
) -> str:
    """DuckDB twin of :func:`waterfill_allocation`. ``counts_sql`` is a
    subquery (with alias) yielding one row per group."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    B = int(budget)
    return f"""
WITH base AS (
  SELECT {group_sql} AS grp, CAST({count_sql} AS BIGINT) AS c FROM {counts_sql}
), t AS (
  SELECT grp, c,
         row_number() OVER w_ord AS rn,
         count(*) OVER () AS n,
         sum(c) OVER (ORDER BY c, grp ROWS UNBOUNDED PRECEDING) AS prefix
  FROM base
  WINDOW w_ord AS (ORDER BY c, grp)
), flags AS (
  SELECT *, ({B} - (prefix - c)) // (n - rn + 1) AS s,
         min(CASE WHEN c <= ({B} - (prefix - c)) // (n - rn + 1) THEN 1 ELSE 0 END)
           OVER (ORDER BY c, grp ROWS UNBOUNDED PRECEDING) = 1 AS funded
  FROM t
), lvl AS (
  SELECT *, sum(CASE WHEN funded THEN 1 ELSE 0 END) OVER () AS K,
         COALESCE(max(CASE WHEN funded THEN prefix END) OVER (), 0) AS prefixK
  FROM flags
)
SELECT grp AS {group_alias}, c, funded,
       CAST(CASE WHEN funded THEN c
            ELSE ({B} - prefixK) // nullif(n - K, 0)
                 + CASE WHEN rn - K <= ({B} - prefixK) % nullif(n - K, 0)
                        THEN 1 ELSE 0 END
       END AS BIGINT) AS alloc
FROM lvl
"""


def budgeted_source_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    budget: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic stratified sample honoring a water-filled row budget:
    per source, keep the first ``alloc`` records in seeded-hash order.

    Composition of :func:`waterfill_allocation` (quotas) with the same
    hash-rank pick every sampler in this repo uses — the "subsample the
    corpus to B rows without letting one source dominate" primitive.
    Returns ``(id, source, rank, alloc)`` for kept rows.

    Scale shape: one per-source row_number window over records (the same
    shuffle any per-source op pays), one broadcast join against the tiny
    allocation frame.
    """
    counts = df.groupBy(F.col(source_col).alias("grp")).agg(F.count("*").alias("c"))
    alloc = waterfill_allocation(counts, "grp", "c", budget).select(
        F.col("grp").alias("__src"), "alloc"
    )
    # nulls-last on both keys to match DuckDB's ASC default (a NULL id
    # hashes to NULL; Spark would otherwise rank it first, DuckDB last)
    w = Window.partitionBy(source_col).orderBy(
        hash31_col(F.col(id_col), seed).asc_nulls_last(),
        F.col(id_col).asc_nulls_last(),
    )
    ranked = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(source_col).alias("source"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
    # null-safe join: waterfill allocates quota to a NULL-source group
    # (corrupt rows form a real group), and a plain equi-join would
    # silently burn that quota — the sample would under-deliver the
    # budget with no diagnostic
    return (
        ranked.join(F.broadcast(alloc), ranked["source"].eqNullSafe(alloc["__src"]))
        .where(F.col("rank") <= F.col("alloc"))
        .select("id", "source", "rank", "alloc")
    )


def budgeted_source_sample_sql(
    table: str, id_sql: str, source_sql: str, budget: int, seed: int = 42
) -> str:
    """DuckDB twin of :func:`budgeted_source_sample`."""
    alloc = waterfill_allocation_sql(
        f"(SELECT {source_sql} AS grp, count(*) AS c FROM {table} GROUP BY 1) AS counts",
        "grp", "c", budget,
    )
    key = hash31_sql(f"CAST({id_sql} AS BIGINT)", seed)
    return f"""
WITH alloc AS MATERIALIZED ({alloc}),
ranked AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, {source_sql} AS source,
         CAST(row_number() OVER (PARTITION BY {source_sql}
              ORDER BY {key}, {id_sql}) AS BIGINT) AS rank
  FROM {table}
)
SELECT r.id, r.source, r.rank, a.alloc
FROM ranked r JOIN alloc a ON r.source IS NOT DISTINCT FROM a.grp
WHERE r.rank <= a.alloc
"""


def temperature_source_mix(
    counts: DataFrame, group_col: str, count_col: str, budget: int,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture allocation: target slots per source
    proportional to ``count^alpha`` — the standard multilingual/multi-
    source rebalancing (mT5 / XLM-R style: alpha < 1 upsamples small
    sources relative to their share; alpha=1 is proportional, alpha=0
    uniform). Unlike :func:`waterfill_allocation` the result is a TARGET
    mixture for sampling-with-repetition: ``alloc`` may exceed ``c``
    (small sources oversample, exactly the reference's epoch-interleave
    oversampling semantics at the corpus level).

    Engine-exact arithmetic: the only floating-point step is
    ``round(pow(c, alpha) * 1e6)`` into an integer weight (same
    quantize-then-integer pattern BM25 uses for ln-based scores — a
    sub-ulp libm difference flips the integer only on a ~1e-7 relative
    knife-edge). From there everything is integer: base share
    ``(B * w) div W``, remainder via largest-remainder ranking
    ``((B * w) mod W) desc, group asc``. ``sum(alloc) == budget``
    whenever any weight is positive; if every weight is zero (every
    count 0) the allocation is all-zero rather than a division error.

    Range contract: the integer path computes ``budget × weight_ppm``
    with ``weight_ppm ≈ c^alpha × 1e6``, so callers must keep
    ``budget × max(c)^alpha < 2^63 / 1e6 ≈ 9.2e12`` (e.g. budget 1e9
    against 1e10-doc sources at alpha 0.3 ⇒ ~1e12, fine; a 1e10 budget
    against the same needs pre-dividing budget and allocations by a
    constant). Spark ANSI / DuckDB both fail loudly — not silently —
    beyond it.

    Returns ``(group, c, weight_ppm, alloc)``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    B = int(budget)
    w_int = F.round(F.pow(F.col("c").cast("double"), F.lit(float(alpha))) * 1e6).cast(
        "long"
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # NB: Spark column resolution is case-insensitive by default, so the
    # weight and its total must NOT be named `w`/`W` — withColumn("W")
    # would silently REPLACE "w" (a measured bug: every weight became
    # the grand total)
    t = (
        counts.select(
            F.col(group_col).alias("grp"), F.col(count_col).cast("long").alias("c")
        )
        .withColumn("wt", w_int)
        .withColumn("wtot", F.sum("wt").over(w_all))
        .withColumn("base", F.expr(f"coalesce(CAST({B} AS BIGINT) * wt div nullif(wtot, 0), 0)"))
        .withColumn("rem", F.expr(f"coalesce(CAST({B} AS BIGINT) * wt % nullif(wtot, 0), 0)"))
        .withColumn(
            "spare",
            F.when(F.col("wtot") > 0, F.lit(B) - F.sum("base").over(w_all)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), F.col("grp").asc_nulls_last())
            ),
        )
    )
    return t.select(
        F.col("grp").alias(group_col),
        "c",
        F.col("wt").alias("weight_ppm"),
        (F.col("base") + (F.col("rk") <= F.col("spare")).cast("long")).alias("alloc"),
    )


def temperature_source_mix_sql(
    counts_sql: str, group_sql: str, count_sql: str, budget: int,
    alpha: float = 0.3, group_alias: str = "grp",
) -> str:
    """DuckDB twin of :func:`temperature_source_mix`."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    B = int(budget)
    return f"""
WITH base AS (
  SELECT {group_sql} AS grp, CAST({count_sql} AS BIGINT) AS c FROM {counts_sql}
), t AS (
  SELECT grp, c,
         CAST(round(pow(CAST(c AS DOUBLE), {float(alpha)!r}) * 1e6) AS BIGINT) AS wt
  FROM base
), s AS (
  SELECT *, sum(wt) OVER () AS wtot FROM t
), a AS (
  SELECT *, COALESCE(CAST({B} AS BIGINT) * wt // nullif(wtot, 0), 0) AS base_alloc,
         COALESCE(CAST({B} AS BIGINT) * wt % nullif(wtot, 0), 0) AS rem
  FROM s
), r AS (
  SELECT *, CASE WHEN wtot > 0 THEN {B} - sum(base_alloc) OVER () ELSE 0 END AS spare,
         row_number() OVER (ORDER BY rem DESC, grp ASC) AS rk
  FROM a
)
SELECT grp AS {group_alias}, c, wt AS weight_ppm,
       CAST(base_alloc + CASE WHEN rk <= spare THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
