"""Text-directory source → canonical records (SURVEY §2.1 ``FileSource`` +
``FileCorpusIndex``, reference ``src/source/backends/file_source.rs:213-335``,
``src/source/indexing/file_corpus.rs:56-282``).

Layout (example_dataset/README.md): ``root/<category-dirs>/<Title>.txt``.
Semantics: filename stem (underscores → spaces) = Anchor section, file body
= Context section; taxonomy = [source_id, parent directory segments];
per-category trust overrides (file_source.rs:87-91); record id =
``'{source_id}::{rel_path}'`` (file_corpus.rs:276-282) — path-stable, so
split labels survive corpus growth. Publication dates parsed from
directory names (date_helpers.rs:6-95) land in taxonomy as ``date=…``
(src/metadata.rs:8-34).

Spark shape: ``wholetext`` read → path arithmetic columns. The reference's
persisted ``(idx → path)`` KV index is unnecessary — Spark's file catalog
lists once per job, and deterministic order is ``orderBy(path)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_triplets_spark.schema import DEFAULT_TRUST, make_section


@dataclass(frozen=True)
class FileSourceConfig:
    source_id: str
    root: str
    trust: float = DEFAULT_TRUST
    category_trust: tuple[tuple[str, float], ...] = ()  # (dir-segment, trust)


# date-from-directory patterns (date_helpers.rs:6-95)
_DATE_PATTERNS = ("yyyy-MM-dd", "MM-dd-yyyy")


def _dir_date(segment: F.Column) -> F.Column:
    return F.coalesce(
        *[F.try_to_date(segment, p) for p in _DATE_PATTERNS]
    )


def read_file_records(spark: SparkSession, cfg: FileSourceConfig) -> DataFrame:
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")  # is_text_file (src/utils.rs:128-133)
        .load(cfg.root)
        .withColumn("__path", F.input_file_name())
        .withColumn("__mtime", F.col("_metadata.file_modification_time"))
    )
    import re

    root = cfg.root.rstrip("/")
    # input_file_name yields 'file:///abs/path'; strip scheme + root prefix
    rel = F.regexp_replace(
        F.col("__path"), "^[a-z]+:/+" + re.escape(root.lstrip("/")) + "/", ""
    )
    fname = F.element_at(F.split(rel, "/"), -1)
    title = F.regexp_replace(F.regexp_replace(fname, "\\.txt$", ""), "_", " ")
    dirs = F.slice(F.split(rel, "/"), 1, F.greatest(F.size(F.split(rel, "/")) - 1, F.lit(0)))
    date = _dir_date(F.element_at(F.split(rel, "/"), -2))

    trust = F.lit(float(cfg.trust))
    for seg, t in cfg.category_trust:  # per-category overrides (file_source.rs:369-391)
        trust = F.when(F.array_contains(dirs, seg), F.lit(float(t))).otherwise(trust)

    taxonomy = F.concat(
        F.array(F.lit(cfg.source_id)),
        dirs,
        F.when(
            date.isNotNull(),
            F.array(F.concat(F.lit("date="), date.cast("string"))),
        ).otherwise(F.array().cast("array<string>")),
    )
    return raw.select(
        F.concat(F.lit(f"{cfg.source_id}::"), rel).alias("id"),
        F.lit(cfg.source_id).alias("source"),
        # file_times (src/utils.rs:136-151): Spark's file source exposes
        # modification time natively (`_metadata`); Linux has no portable
        # birth time, so created_at falls back publication-dir date →
        # modification time — same fallback order as the reference
        F.coalesce(date.cast("timestamp"), F.col("__mtime")).alias("created_at"),
        F.col("__mtime").alias("updated_at"),
        trust.cast("float").alias("trust"),
        taxonomy.alias("taxonomy"),
        F.array(
            make_section("anchor", title),
            make_section("context", F.col("value")),
        ).alias("sections"),
    ).where(F.length(F.trim(F.col("value"))) > 0)


def default_title_context_triplet_recipes(include_date_aware: bool = False):
    """Source-declared default recipe lanes for title/body file corpora
    (``default_title_context_triplet_recipes``, file_source.rs:156-210),
    now expressible side-for-side because :class:`TripletRecipe` carries
    per-side selectors: anchor = Role(Anchor) (the filename-stem title),
    positive = Role(Context) (the body), negatives drawn from Context or
    Anchor sections of a wrong-article / wrong-publication-date record.
    The weight rebalance between the date-aware and plain modes matches
    the reference (0.30/0.10/0.35/0.25 vs 0.75/0.25)."""
    from rust_triplets_spark.operators.triplets import Role, TripletRecipe

    recipes = []
    if include_date_aware:
        recipes.append(TripletRecipe(
            name="title_context_wrong_date",
            negative_strategy="wrong_publication_date", weight=0.30,
            anchor=Role("anchor"), positive_selector=Role("context"),
            negative_selector=Role("context"),
        ))
        recipes.append(TripletRecipe(
            name="title_anchor_wrong_date",
            negative_strategy="wrong_publication_date", weight=0.10,
            anchor=Role("anchor"), positive_selector=Role("context"),
            negative_selector=Role("anchor"),
        ))
    recipes.append(TripletRecipe(
        name="title_context_wrong_article",
        negative_strategy="wrong_article",
        weight=0.35 if include_date_aware else 0.75,
        anchor=Role("anchor"), positive_selector=Role("context"),
        negative_selector=Role("context"),
    ))
    recipes.append(TripletRecipe(
        name="title_anchor_wrong_article",
        negative_strategy="wrong_article", weight=0.25,
        anchor=Role("anchor"), positive_selector=Role("context"),
        negative_selector=Role("anchor"),
    ))
    return recipes
