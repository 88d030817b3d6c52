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

- ``wrong_article``: same (source, split, date) excluding self → same
  (source, split) → fallback same split (tier named
  ``fallback_same_split``, src/sampler/mod.rs:1392-1395);
- ``wrong_publication_date``: pick a *different date bucket* within the same
  (source, split) — NULL dates form their own bucket, so "exactly one side
  missing" counts as differing (src/sampler/mod.rs:1054-1108) — then a
  uniform member of that bucket; fallback same split;
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
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.col(split_col).alias("split"),
        *date_sel,
        _fold(id_col, id_is_string).alias("__idf"),
    )
    order_h = hash31_col(F.col("__idf"), seed + POOL_SEED_OFF)
    pick_mix = mix31_col([F.col("__idf"), F.lit(variant)], seed + PICK_SEED_OFF)

    def tier_pick(keys: list[str], tier: str) -> DataFrame:
        """Indexed-pool pick with self-exclusion within ``keys`` pools."""
        w = Window.partitionBy(*keys).orderBy(order_h.asc(), F.col("id").asc())
        ranked = (
            base.withColumn("__rn", F.row_number().over(w) - 1)
            .withColumn("__cnt", F.count("*").over(Window.partitionBy(*keys)))
        )
        k = F.pmod(pick_mix, F.col("__cnt") - 1)
        anchors = ranked.where(F.col("__cnt") >= 2).withColumn(
            "__pick", F.when(k >= F.col("__rn"), k + 1).otherwise(k)
        ).select("id", *keys, "__pick")
        pool = ranked.select(*keys, F.col("id").alias("pid"), F.col("__rn").alias("__prn"))
        return (
            anchors.join(pool, keys, "inner")
            .where(F.col("__pick") == F.col("__prn"))
            .select("id", F.col("pid").alias("negative_id"), F.lit(tier).alias("tier"))
        )

    results: list[DataFrame] = []
    if strategy == "wrong_article" and date_col:
        results.append(tier_pick(["source", "split", "datek"], "same_source_same_date"))
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
    """Different-date-bucket pick within (source, split)."""
    bucket_h = hash31_col(strfold_col("datek"), seed + BUCKET_SEED_OFF)
    wb = Window.partitionBy("source", "split").orderBy(bucket_h.asc(), F.col("datek").asc())
    buckets = (
        base.groupBy("source", "split", "datek")
        .agg(F.count("*").alias("__bcnt"))
        .withColumn("__brn", F.row_number().over(wb) - 1)
        .withColumn("__nb", F.count("*").over(Window.partitionBy("source", "split")))
    )
    anchors = base.join(
        buckets.select("source", "split", "datek", F.col("__brn").alias("__own_brn"), "__nb"),
        ["source", "split", "datek"],
        "inner",
    ).where(F.col("__nb") >= 2)
    kb = F.pmod(
        mix31_col([F.col("__idf"), F.lit(variant)], seed + BUCKET_SEED_OFF),
        F.col("__nb") - 1,
    )
    anchors = anchors.withColumn(
        "__pick_brn", F.when(kb >= F.col("__own_brn"), kb + 1).otherwise(kb)
    ).select("id", "source", "split", "__idf", "__pick_brn")
    anchors = anchors.join(
        buckets.select(
            "source", "split", F.col("datek").alias("__pick_datek"),
            F.col("__brn").alias("__pick_brn"), "__bcnt",
        ),
        ["source", "split", "__pick_brn"],
        "inner",
    )
    wm = Window.partitionBy("source", "split", "datek").orderBy(order_h.asc(), F.col("id").asc())
    members = base.withColumn("__mrn", F.row_number().over(wm) - 1).select(
        "source", "split", F.col("datek").alias("__pick_datek"),
        F.col("id").alias("pid"), "__mrn",
    )
    km = F.pmod(
        mix31_col([F.col("__idf"), F.lit(variant)], seed + PICK_SEED_OFF), F.col("__bcnt")
    )
    return (
        anchors.withColumn("__mpick", km)
        .join(members, ["source", "split", "__pick_datek"], "inner")
        .where(F.col("__mpick") == F.col("__mrn"))
        .select("id", F.col("pid").alias("negative_id"), F.lit("wrong_date").alias("tier"))
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

    def pool_cte(keys: str, name: str) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY {keys} "
            f"ORDER BY {order_h_base}, id) - 1 AS rn, "
            f"count(*) OVER (PARTITION BY {keys}) AS cnt FROM base)"
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
        return (
            f"WITH {base}, {pool_cte('source, split, datek', 'p_ssd')}, "
            f"{pool_cte('source, split', 'p_ss')}, {pool_cte('split', 'p_s')}, "
            f"t0 AS ({tier_select('source, split, datek', 'p_ssd', 'same_source_same_date', '')}), "
            f"t1 AS ({tier_select('source, split', 'p_ss', 'same_source', ' AND a.id NOT IN (SELECT id FROM t0)')}) "
            f"SELECT * FROM t0 UNION ALL SELECT * FROM t1 UNION ALL "
            f"{tier_select('split', 'p_s', 'fallback_same_split', ' AND a.id NOT IN (SELECT id FROM t0 UNION ALL SELECT id FROM t1)')}"
        )

    # wrong_publication_date
    if not date_sql:
        raise ValueError("wrong_publication_date requires date_sql")
    bkey = hash31_sql(strfold_sql("datek"), seed + BUCKET_SEED_OFF)
    kb = f"({pick_mix('a', BUCKET_SEED_OFF)} % (a.nb - 1))"
    km = f"({pick_mix('r')} % r.bcnt)"
    return f"""
WITH {base}, buckets AS (
  SELECT source, split, datek, count(*) AS bcnt,
         row_number() OVER (PARTITION BY source, split ORDER BY {bkey}, datek) - 1 AS brn,
         count(*) OVER (PARTITION BY source, split) AS nb
  FROM base GROUP BY source, split, datek
), anchors AS (
  SELECT b.id, b.source, b.split, b.datek, bu.brn AS own_brn, bu.nb
  FROM base b JOIN buckets bu USING (source, split, datek) WHERE bu.nb >= 2
), picked AS (
  SELECT a.*, CASE WHEN {kb} >= a.own_brn THEN {kb} + 1 ELSE {kb} END AS pick_brn
  FROM anchors a
), resolved AS (
  SELECT p.id, p.source, p.split, bu.datek AS pick_datek, bu.bcnt
  FROM picked p JOIN buckets bu
    ON bu.source = p.source AND bu.split = p.split AND bu.brn = p.pick_brn
), members AS (
  SELECT source, split, datek, id AS pid,
         row_number() OVER (PARTITION BY source, split, datek ORDER BY {order_h_base}, id) - 1 AS mrn
  FROM base
), {pool_cte('split', 'p_s')}, t1 AS (
  SELECT r.id, m.pid AS negative_id, 'wrong_date' AS tier
  FROM resolved r JOIN members m
    ON m.source = r.source AND m.split = r.split AND m.datek = r.pick_datek
   AND m.mrn = ({km})
)
SELECT * FROM t1
UNION ALL
{tier_select('split', 'p_s', 'fallback_same_split', ' AND a.id NOT IN (SELECT id FROM t1)')}
"""
