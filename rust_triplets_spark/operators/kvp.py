"""KVP metadata-prefix sampling (SURVEY §2.6 "KVP chunk decoration",
reference ``src/kvp.rs:73-149`` + ``src/sampler/mod.rs:1470-1508``).

Reference flow per sampled chunk: dropout roll → uniform variant pick →
per-field presence roll → random value per multi-value field → field-order
shuffle → render ``meta: k=v | k2=v2`` → prepend with newline → truncate
prefix+body to ``max_window_tokens``.

Every "roll" becomes a stateless seeded hash of ``(record, roll-kind,
variant)`` — the same decoration is reproducible at any parallelism and
checkable in DuckDB. ``kvp_meta`` (all keys/values, unconditional,
src/sampler/mod.rs:1470-1483) is exposed as a MapType column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_col,
    hash31_sql,
    mix31_col,
    mix31_sql,
)

# roll-kind discriminants (engine spec)
ROLL_DROP = 11
ROLL_VARIANT = 12
ROLL_PRESENCE = 13
ROLL_VALUE = 14
ROLL_ORDER = 15


@dataclass(frozen=True)
class KvpField:
    """Mirrors ``KvpField`` (src/kvp.rs:11-46). ``value_cols`` are column
    names (or SQL fragments for the twin); one is picked per decoration."""

    key: str
    value_cols: tuple[str, ...]
    presence: float = 1.0


def _u01(idf, kind: int, extra: int, seed: int) -> Column:
    return (
        mix31_col([idf, F.lit(kind), F.lit(extra)], seed).cast("double") / F.lit(float(M31))
    )


def _u01_sql(idf_sql: str, kind: int, extra: int, seed: int) -> str:
    return f"(CAST({mix31_sql([idf_sql, str(kind), str(extra)], seed)} AS DOUBLE) / {float(M31)!r})"


def kvp_decorate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    variants: list[list[KvpField]],
    dropout: float = 0.0,
    max_window_tokens: int = 1024,
    seed: int = 42,
    step: int = 0,
) -> DataFrame:
    """Adds ``kvp_prefix`` (nullable), ``decorated_text`` (token-budget
    truncated), and ``kvp_meta`` map columns. ``step`` rotates rolls."""
    idf = F.col(id_col).cast("long")
    u_drop = _u01(idf, ROLL_DROP, step, seed)
    v_pick = F.pmod(mix31_col([idf, F.lit(ROLL_VARIANT), F.lit(step)], seed), F.lit(len(variants)))

    variant_prefixes = []
    for vi, fields in enumerate(variants):
        rendered = []
        for fi, fld in enumerate(fields):
            gid = vi * 100 + fi
            present = _u01(idf, ROLL_PRESENCE, gid * 1000 + step, seed) < F.lit(float(fld.presence))
            vpick = F.pmod(
                mix31_col([idf, F.lit(ROLL_VALUE), F.lit(gid * 1000 + step)], seed),
                F.lit(len(fld.value_cols)),
            )
            value = F.coalesce(
                *[
                    F.when(vpick == j, F.col(c).cast("string"))
                    for j, c in enumerate(fld.value_cols)
                ]
            ) if len(fld.value_cols) > 1 else F.col(fld.value_cols[0]).cast("string")
            order_key = hash31_col(
                mix31_col([idf, F.lit(ROLL_ORDER), F.lit(gid * 1000 + step)], seed), seed
            )
            rendered.append(
                F.when(
                    present & value.isNotNull(),
                    F.struct(order_key.alias("ord"), F.concat(F.lit(fld.key), F.lit("="), value).alias("kv")),
                )
            )
        parts = F.filter(F.array(*rendered), lambda s: s.isNotNull())
        ordered = F.transform(F.array_sort(parts), lambda s: s["kv"])
        prefix = F.when(
            F.size(ordered) > 0, F.concat(F.lit("meta: "), F.array_join(ordered, " | "))
        ).otherwise(F.lit(None).cast("string"))
        variant_prefixes.append(prefix)

    chosen = variant_prefixes[0]
    for vi in range(1, len(variants)):
        chosen = F.when(v_pick == vi, variant_prefixes[vi]).otherwise(chosen)
    kvp_prefix = F.when(u_drop >= F.lit(float(dropout)), chosen).otherwise(
        F.lit(None).cast("string")
    )

    # bind intermediates as columns so the (large) prefix/token expressions
    # evaluate once per row instead of once per reference
    from rust_triplets_spark.functions.text import tokens_col

    df = df.withColumn("kvp_prefix", kvp_prefix)
    decorated_raw = F.when(
        F.col("kvp_prefix").isNotNull(),
        F.concat(F.col("kvp_prefix"), F.lit("\n"), F.col(text_col)),
    ).otherwise(F.col(text_col))
    df = df.withColumn("__deco_raw", decorated_raw).withColumn(
        "__deco_toks", tokens_col("__deco_raw")
    )
    # token-budget truncation (src/sampler/mod.rs:1484-1507)
    decorated = F.when(
        F.size("__deco_toks") > max_window_tokens,
        F.array_join(F.slice("__deco_toks", 1, max_window_tokens), " "),
    ).otherwise(F.col("__deco_raw"))

    meta_entries: dict[str, Column] = {}
    for fields in variants:
        for fld in fields:
            if fld.key not in meta_entries:
                meta_entries[fld.key] = F.array_compact(
                    F.array(*[F.col(c).cast("string") for c in fld.value_cols])
                )
    kvp_meta = F.map_from_arrays(
        F.array(*[F.lit(k) for k in meta_entries]),
        F.array(*meta_entries.values()),
    )
    return (
        df.withColumn("decorated_text", decorated)
        .withColumn("kvp_meta", kvp_meta)
        .drop("__deco_raw", "__deco_toks")
    )


def kvp_decorate_sql(
    table: str,
    id_col: str,
    text_col: str,
    variants: list[list[KvpField]],
    dropout: float = 0.0,
    max_window_tokens: int = 1024,
    seed: int = 42,
    step: int = 0,
    extra_select: str = "",
) -> str:
    """DuckDB twin (kvp_prefix + decorated_text; the map column is
    engine-side only — maps don't hash portably)."""
    from rust_triplets_spark.functions.text import tokens_sql

    idf = f"CAST({id_col} AS BIGINT)"
    u_drop = _u01_sql(idf, ROLL_DROP, step, seed)
    v_pick = f"({mix31_sql([idf, str(ROLL_VARIANT), str(step)], seed)} % {len(variants)})"

    variant_exprs = []
    for vi, fields in enumerate(variants):
        structs = []
        for fi, fld in enumerate(fields):
            gid = vi * 100 + fi
            present = f"{_u01_sql(idf, ROLL_PRESENCE, gid * 1000 + step, seed)} < {float(fld.presence)!r}"
            if len(fld.value_cols) > 1:
                vpick = f"({mix31_sql([idf, str(ROLL_VALUE), str(gid * 1000 + step)], seed)} % {len(fld.value_cols)})"
                value = "CASE " + " ".join(
                    f"WHEN {vpick} = {j} THEN CAST({c} AS VARCHAR)"
                    for j, c in enumerate(fld.value_cols)
                ) + " END"
            else:
                value = f"CAST({fld.value_cols[0]} AS VARCHAR)"
            order_key = hash31_sql(
                mix31_sql([idf, str(ROLL_ORDER), str(gid * 1000 + step)], seed), seed
            )
            structs.append(
                f"CASE WHEN ({present}) AND ({value}) IS NOT NULL THEN "
                f"{{'ord': {order_key}, 'kv': '{fld.key}=' || ({value})}} END"
            )
        arr = f"list_filter([{', '.join(structs)}], s -> s IS NOT NULL)"
        ordered = f"list_transform(list_sort({arr}), s -> s.kv)"
        variant_exprs.append(
            f"CASE WHEN len({ordered}) > 0 THEN 'meta: ' || array_to_string({ordered}, ' | ') END"
        )

    chosen = variant_exprs[0]
    for vi in range(1, len(variants)):
        chosen = f"CASE WHEN {v_pick} = {vi} THEN {variant_exprs[vi]} ELSE {chosen} END"
    kvp_prefix = f"CASE WHEN {u_drop} >= {float(dropout)!r} THEN {chosen} END"

    decorated_raw = (
        f"CASE WHEN ({kvp_prefix}) IS NOT NULL "
        f"THEN ({kvp_prefix}) || chr(10) || {text_col} ELSE {text_col} END"
    )
    toks = tokens_sql(f"({decorated_raw})")
    decorated = (
        f"CASE WHEN len({toks}) > {max_window_tokens} "
        f"THEN array_to_string(list_slice({toks}, 1, {max_window_tokens}), ' ') "
        f"ELSE ({decorated_raw}) END"
    )
    extra = f", {extra_select}" if extra_select else ""
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS id, {kvp_prefix} AS kvp_prefix, "
        f"{decorated} AS decorated_text{extra} FROM {table}"
    )
