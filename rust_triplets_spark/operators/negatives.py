"""Negative-sampling strategies (SURVEY §2.6) — the reference's "query"
layer: ``WrongArticle``, ``WrongPublicationDate``, ``QuestionAnswerMismatch``
(``src/sampler/mod.rs:995-1151``), each with the same-split fallback tier.

Design: **indexed-pool pick**, not candidate explosion. The reference picks
one uniform-random candidate from a strategy-filtered pool; a naive Spark
translation joins every anchor to its whole pool and ranks (O(n·pool)
shuffle). Instead each pool member gets a deterministic index
(``row_number`` over a seeded hash order), and an anchor picks index
``k = mix(anchor, variant) % (pool_size - 1)`` with its own slot skipped via
``k >= own_rank ? k+1 : k`` — one window function plus ONE 1:1 equi-join on
``(pool_key, index)``, both co-partitioned by the pool key. O(n) at any
corpus size, no skew amplification, and exactly expressible in DuckDB SQL
for the oracle.

Split isolation (``src/config.rs:123-136``): every pool is partitioned by
``split``, so anchor and negative always share the requested split.

Tiers mirror the reference:

- ``wrong_article``: same (source, split, date) excluding self — only rows
  with a REAL date participate, matching the reference's "both dates
  present and equal" gate (src/sampler/mod.rs:1005-1014; undated records
  fall through) → same (source, split) → fallback same split (tier named
  ``fallback_same_split``, src/sampler/mod.rs:1392-1395);
- ``wrong_publication_date``: pick uniformly over ALL records of the same
  (source, split) whose date bucket differs from the anchor's — NULL dates
  form their own bucket, so "exactly one side missing" counts as differing
  (src/sampler/mod.rs:1054-1108); members are ranked in one flattened
  bucket-contiguous order and the anchor's own bucket is skipped
  arithmetically, so small date buckets are NOT overweighted (the
  reference draws uniformly over records, not buckets); fallback same
  split;
- ``qa_mismatch``: same (source, split) excluding self; fallback same split
  (src/sampler/mod.rs:1109-1151).

``variant`` parameterizes re-picks (epoch/step): changing it rotates every
anchor's choice deterministically, replacing the reference's per-anchor
rotation cursors (src/sampler/mod.rs:443-470) with stateless arithmetic.
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

# seed offsets — fixed parts of this engine's determinism spec
POOL_SEED_OFF = 101  # pool ordering
PICK_SEED_OFF = 202  # which pool index an anchor picks
BUCKET_SEED_OFF = 303  # date-bucket ordering / pick

NULL_DATE = "§null§"

STRATEGIES = ("wrong_article", "wrong_publication_date", "qa_mismatch")


def _fold(col, is_string: bool):
    return strfold_col(col) if is_string else F.col(col).cast("long")


def _fold_sql(sql: str, is_string: bool) -> str:
    return strfold_sql(sql) if is_string else f"CAST({sql} AS BIGINT)"


def negative_pick(
    df: DataFrame,
    id_col: str,
    source_col: str,
    split_col: str,
    strategy: str,
    date_col: str | None = None,
    seed: int = 42,
    variant: int = 0,
    id_is_string: bool = True,
) -> DataFrame:
    """One negative per anchor row. Returns ``(id, negative_id, tier)``."""
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "wrong_publication_date" and not date_col:
        raise ValueError("wrong_publication_date requires date_col")

    date_sel = (
        [F.coalesce(F.col(date_col).cast("string"), F.lit(NULL_DATE)).alias("datek")]
        if date_col
        else []
    )
    from rust_triplets_spark.functions.caching import cache_scoped

    # every tier (and both sides within a tier) starts from this slim
    # projection; cache it so upstream lineage (scan, chunking, split
    # derivation, …) runs once per negative_pick call
    base = cache_scoped(
        df.select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            F.col(split_col).alias("split"),
            *date_sel,
            _fold(id_col, id_is_string).alias("__idf"),
        ),
        f"negatives.{strategy}.base",
    )
    order_h = hash31_col(F.col("__idf"), seed + POOL_SEED_OFF)
    pick_mix = mix31_col([F.col("__idf"), F.lit(variant)], seed + PICK_SEED_OFF)

    def tier_pick(keys: list[str], tier: str, src: DataFrame | None = None) -> DataFrame:
        """Indexed-pool pick with self-exclusion within ``keys`` pools.

        Pool indexes come from :func:`bucketed_position`, NOT a bare
        ``row_number`` window — a pool keyed only by ``split`` would
        otherwise sort the whole corpus in 3 tasks. The pick join's key is
        (keys…, index), so the join itself distributes over pool indexes,
        not over the low-cardinality pool key.

        The ranked frame feeds BOTH join sides (anchors and pool) plus the
        broadcast-offsets subtree inside bucketed_position — cached per
        tier so the rank pipeline runs once, not once per consumer."""
        from rust_triplets_spark.functions.caching import cache_scoped
        from rust_triplets_spark.functions.ordering import bucketed_position

        frame = (base if src is None else src).withColumn("__oh", order_h)
        ranked = cache_scoped(
            bucketed_position(
                frame, "__oh", ["id"], part_cols=keys,
                out_col="__rn", count_col="__cnt",
            ),
            f"negatives.{strategy}.{tier}",
        )
        # divisor made total with greatest(.,1): singleton pools are filtered
        # out below, but ANSI mode evaluates the expression wherever Catalyst
        # places it (e.g. as a join key), so it must never divide by zero
        k = F.pmod(pick_mix, F.greatest(F.col("__cnt") - 1, F.lit(1)))
        anchors = ranked.where(F.col("__cnt") >= 2).withColumn(
            "__pick", F.when(k >= F.col("__rn"), k + 1).otherwise(k)
        ).select("id", *keys, "__pick")
        pool = ranked.select(*keys, F.col("id").alias("pid"), F.col("__rn").alias("__prn"))
        cond = [anchors[c] == pool[c] for c in keys] + [
            anchors["__pick"] == pool["__prn"]
        ]
        return anchors.join(pool, cond, "inner").select(
            anchors["id"], pool["pid"].alias("negative_id"), F.lit(tier).alias("tier")
        )

    results: list[DataFrame] = []
    if strategy == "wrong_article" and date_col:
        # same-date tier only buckets REAL dates: the reference requires
        # both dates present and equal (src/sampler/mod.rs:1005-1014), so
        # two undated records must NOT count as "same date" — they fall
        # through to the same-source tier.
        results.append(
            tier_pick(
                ["source", "split", "datek"],
                "same_source_same_date",
                base.where(F.col("datek") != NULL_DATE),
            )
        )
    if strategy in ("wrong_article", "qa_mismatch"):
        results.append(tier_pick(["source", "split"], "same_source"))
    if strategy == "wrong_publication_date":
        results.append(_wrong_date_pick(base, order_h, seed, variant))
    results.append(tier_pick(["split"], "fallback_same_split"))

    # earlier tier wins — resolved with ONE row_number over the tier union
    # (an anti-join chain would shuffle once per tier)
    tagged = results[0].withColumn("__prio", F.lit(0))
    for i, r in enumerate(results[1:], start=1):
        tagged = tagged.unionByName(r.withColumn("__prio", F.lit(i)))
    w = Window.partitionBy("id").orderBy(F.col("__prio").asc())
    return (
        tagged.withColumn("__trn", F.row_number().over(w))
        .where(F.col("__trn") == 1)
        .select("id", "negative_id", "tier")
    )


def _wrong_date_pick(base: DataFrame, order_h, seed: int, variant: int) -> DataFrame:
    """Uniform pick over ALL different-date records within (source, split).

    Members are ranked in one flattened order where each date bucket is
    contiguous (ordered by bucket hash, then member hash); an anchor draws
    ``k ∈ [0, n - own_bucket_size)`` and shifts past its own bucket's
    contiguous range — uniform over the whole different-date pool, so small
    date buckets are not overweighted (the reference draws uniformly over
    records in (source, split) with a differing date,
    src/sampler/mod.rs:1054-1108)."""
    from rust_triplets_spark.functions.ordering import bucketed_position

    from rust_triplets_spark.functions.caching import cache_scoped

    bucket_h = hash31_col(strfold_col("datek"), seed + BUCKET_SEED_OFF)
    # bucket-contiguous member index without a (source, split)-partition
    # sort: range-bucket on the leading hash key (see ordering module).
    # Cached: consumed by bstats, the anchor join, and the pool side.
    members = cache_scoped(
        bucketed_position(
            base.withColumn("__bh", bucket_h).withColumn("__oh", order_h),
            "__bh",
            ["datek", "__oh", "id"],
            part_cols=["source", "split"],
            out_col="__mrn",
            count_col="__n",
        ),
        "negatives.wrong_date.members",
    )
    bstats = members.groupBy("source", "split", "datek").agg(
        F.min("__mrn").alias("__bstart"), F.count("*").alias("__bcnt")
    )
    anchors = members.join(bstats, ["source", "split", "datek"], "inner").where(
        F.col("__n") > F.col("__bcnt")  # at least one different-date member
    )
    # total divisor (see tier_pick): all-one-bucket groups are filtered out,
    # but the expression must be safe wherever ANSI-mode codegen evaluates it
    k = F.pmod(
        mix31_col([F.col("__idf"), F.lit(variant)], seed + PICK_SEED_OFF),
        F.greatest(F.col("__n") - F.col("__bcnt"), F.lit(1)),
    )
    anchors = anchors.withColumn(
        "__pick", F.when(k >= F.col("__bstart"), k + F.col("__bcnt")).otherwise(k)
    ).select("id", "source", "split", "__pick")
    pool = members.select(
        "source", "split", F.col("id").alias("pid"), F.col("__mrn").alias("__prn")
    )
    cond = [
        anchors["source"] == pool["source"],
        anchors["split"] == pool["split"],
        anchors["__pick"] == pool["__prn"],
    ]
    return anchors.join(pool, cond, "inner").select(
        anchors["id"], pool["pid"].alias("negative_id"),
        F.lit("wrong_date").alias("tier"),
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins
# ---------------------------------------------------------------------------

def negative_pick_sql(
    table_sql: str,
    id_sql: str,
    source_sql: str,
    split_sql: str,
    strategy: str,
    date_sql: str | None = None,
    seed: int = 42,
    variant: int = 0,
    id_is_string: bool = True,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`negative_pick`. ``table_sql`` may be a table
    name or a parenthesized subquery. Returns (id, negative_id, tier)."""
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")

    def idf(q: str) -> str:
        return _fold_sql(f"{q}.id", id_is_string)

    def order_h(q: str) -> str:
        return hash31_sql(idf(q), seed + POOL_SEED_OFF)

    def pick_mix(q: str, off: int = PICK_SEED_OFF) -> str:
        return mix31_sql([idf(q), str(variant)], seed + off)

    datek = f"coalesce(CAST({date_sql} AS VARCHAR), '{NULL_DATE}')" if date_sql else "NULL"
    base = (
        f"base AS MATERIALIZED (SELECT {id_sql} AS id, {source_sql} AS source, {split_sql} AS split, "
        f"{datek} AS datek FROM {table_sql} WHERE {where})"
    )
    order_h_base = hash31_sql(_fold_sql("id", id_is_string), seed + POOL_SEED_OFF)

    def pool_cte(keys: str, name: str, pool_where: str = "TRUE") -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY {keys} "
            f"ORDER BY {order_h_base}, id) - 1 AS rn, "
            f"count(*) OVER (PARTITION BY {keys}) AS cnt FROM base WHERE {pool_where})"
        )

    def tier_select(keys: str, name: str, tier: str, not_served: str) -> str:
        k = f"({pick_mix('a')} % (a.cnt - 1))"
        idx = f"CASE WHEN {k} >= a.rn THEN {k} + 1 ELSE {k} END"
        join_keys = " AND ".join(
            f"a.{c.strip()} = p.{c.strip()}" for c in keys.split(",")
        )
        return (
            f"SELECT a.id, p.id AS negative_id, '{tier}' AS tier "
            f"FROM {name} a JOIN {name} p ON {join_keys} AND p.rn = ({idx}) "
            f"WHERE a.cnt >= 2{not_served}"
        )

    if strategy == "qa_mismatch" or (strategy == "wrong_article" and not date_sql):
        return (
            f"WITH {base}, {pool_cte('source, split', 'p_ss')}, {pool_cte('split', 'p_s')}, "
            f"t1 AS ({tier_select('source, split', 'p_ss', 'same_source', '')}) "
            f"SELECT * FROM t1 UNION ALL "
            f"{tier_select('split', 'p_s', 'fallback_same_split', ' AND a.id NOT IN (SELECT id FROM t1)')}"
        )

    if strategy == "wrong_article":
        # same-date tier only over real dates (src/sampler/mod.rs:1005-1014)
        real_date = f"datek <> '{NULL_DATE}'"
        return (
            f"WITH {base}, {pool_cte('source, split, datek', 'p_ssd', real_date)}, "
            f"{pool_cte('source, split', 'p_ss')}, {pool_cte('split', 'p_s')}, "
            f"t0 AS ({tier_select('source, split, datek', 'p_ssd', 'same_source_same_date', '')}), "
            f"t1 AS ({tier_select('source, split', 'p_ss', 'same_source', ' AND a.id NOT IN (SELECT id FROM t0)')}) "
            f"SELECT * FROM t0 UNION ALL SELECT * FROM t1 UNION ALL "
            f"{tier_select('split', 'p_s', 'fallback_same_split', ' AND a.id NOT IN (SELECT id FROM t0 UNION ALL SELECT id FROM t1)')}"
        )

    # wrong_publication_date — uniform over the flattened different-date
    # member pool (bucket-contiguous rank + arithmetic skip of the
    # anchor's own bucket); see _wrong_date_pick
    if not date_sql:
        raise ValueError("wrong_publication_date requires date_sql")
    bkey = hash31_sql(strfold_sql("datek"), seed + BUCKET_SEED_OFF)
    k = f"({pick_mix('a')} % (a.n - a.bcnt))"
    return f"""
WITH {base}, members AS MATERIALIZED (
  SELECT *,
         row_number() OVER (PARTITION BY source, split ORDER BY {bkey}, datek, {order_h_base}, id) - 1 AS mrn,
         count(*) OVER (PARTITION BY source, split) AS n
  FROM base
), bstats AS (
  SELECT source, split, datek, min(mrn) AS bstart, count(*) AS bcnt
  FROM members GROUP BY source, split, datek
), anchors AS (
  SELECT m.id, m.source, m.split, b.bstart, b.bcnt, m.n
  FROM members m JOIN bstats b USING (source, split, datek)
  WHERE m.n > b.bcnt
), picked AS (
  SELECT a.id, a.source, a.split,
         CASE WHEN {k} >= a.bstart THEN {k} + a.bcnt ELSE {k} END AS pick
  FROM anchors a
), {pool_cte('split', 'p_s')}, t1 AS (
  SELECT p.id, m.id AS negative_id, 'wrong_date' AS tier
  FROM picked p JOIN members m
    ON m.source = p.source AND m.split = p.split AND m.mrn = p.pick
)
SELECT * FROM t1
UNION ALL
{tier_select('split', 'p_s', 'fallback_same_split', ' AND a.id NOT IN (SELECT id FROM t1)')}
"""
