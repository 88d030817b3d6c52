"""JSONL source → canonical records — the de-facto LLM-corpus interchange
format (one JSON object per line: The Pile, RedPajama, Dolma all ship it).

The reference has no JSONL backend (its HuggingFace source parses JSONL
rows internally, ``src/source/backends/huggingface_source.rs:547-551``);
this reader follows the same source conventions as
:mod:`rust_triplets_spark.sources.csv_source`: explicit column mapping
into the fixed record shape, dotted paths for nested fields
(``meta.trust``), rows with an empty required text field skipped, trust
defaulting per source, stable ``{source_id}::row_{idx}`` ids.

Scale notes: the reader takes an EXPLICIT schema derived from the mapping
(``spark.read.json`` with schema inference is a full extra pass over
100 TB — never in production paths). Under that explicit schema a
malformed line parses to an all-NULL row and is dropped by the
empty-text filter — the job never fails, but the row is gone silently;
corpora where that loss must be audited should add
``.option("columnNameOfCorruptRecord", ...)`` with the column appended
to the schema and count the non-null corrupt rows before mapping. The
text normalization reuses the shared native expressions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_triplets_spark.functions.text import normalize_inline_whitespace_col
from rust_triplets_spark.schema import CSV_DEFAULT_TRUST


@dataclass(frozen=True)
class JsonlSourceConfig:
    """Column mapping from JSONL fields into the canonical record shape.

    ``text_field``/``source_field``/``trust_field``/``lang_field`` are
    dotted paths into each JSON object (``meta.trust``); ``source_field``
    / ``trust_field`` / ``lang_field`` fall back to constants when absent.
    """

    source_id: str
    path: str
    text_field: str = "text"
    id_field: str | None = None
    source_field: str | None = None
    trust_field: str | None = None
    lang_field: str | None = None
    trust: float = CSV_DEFAULT_TRUST


def _nested(schema_fields: list[str]) -> T.StructType:
    """Explicit read schema covering every mapped dotted path as strings
    (safe supertype; values cast at mapping time)."""
    roots: dict[str, set[str]] = {}
    for f in schema_fields:
        if not f:
            continue
        head, _, rest = f.partition(".")
        roots.setdefault(head, set())
        if rest:
            if "." in rest:
                raise ValueError(f"at most one nesting level supported: {f!r}")
            roots[head].add(rest)
    fields = []
    for head, kids in sorted(roots.items()):
        if kids:
            fields.append(
                T.StructField(
                    head,
                    T.StructType(
                        [T.StructField(k, T.StringType()) for k in sorted(kids)]
                    ),
                )
            )
        else:
            fields.append(T.StructField(head, T.StringType()))
    return T.StructType(fields)


def read_jsonl_records(spark: SparkSession, cfg: JsonlSourceConfig) -> DataFrame:
    """Read a JSONL corpus into ``(id, source, trust, lang, text)``.

    Empty/missing text rows are skipped (the CSV source's required-field
    rule); ``id`` is ``{source_id}::row_{idx}`` over the file's line order
    when no ``id_field`` is mapped.

    The fallback row-index id is windowed **per input file** (not one
    global partition), so multi-file corpora stay partition-parallel;
    global uniqueness comes from a broadcast cumulative offset over files
    sorted by name, so multi-file numbering follows lexicographic file
    order deterministically.
    Stability contract: the per-file index is line-order-stable only while
    each file is read as a single split (small files, or compressed /
    ``maxPartitionBytes``-bounded reads) — once Spark splits one file
    across tasks, split packing order is not guaranteed to follow byte
    offsets. This is ENFORCED at runtime: the offsets aggregation (already
    part of the plan, zero extra scans) counts distinct scan partitions per
    file and the plan raises with a remediation message if any file was
    read in more than one split, instead of silently emitting ids that no
    longer follow line order. Indexes also shift when skipped empty-text
    rows precede a row. Production corpora should map a real ``id_field``;
    the fallback exists for ad-hoc corpora, matching the reference's
    line-number ids.
    """
    schema = _nested(
        [
            cfg.text_field,
            cfg.id_field or "",
            cfg.source_field or "",
            cfg.trust_field or "",
            cfg.lang_field or "",
        ]
    )
    raw = spark.read.schema(schema).json(cfg.path)
    text = normalize_inline_whitespace_col(F.col(cfg.text_field))
    out = raw.select(
        *(
            [F.col(cfg.id_field).cast("string").alias("__id")]
            if cfg.id_field
            else [F.lit(None).cast("string").alias("__id")]
        ),
        (
            F.coalesce(F.col(cfg.source_field), F.lit(cfg.source_id))
            if cfg.source_field
            else F.lit(cfg.source_id)
        ).alias("source"),
        (
            F.coalesce(
                F.col(cfg.trust_field).cast("double"), F.lit(float(cfg.trust))
            )
            if cfg.trust_field
            else F.lit(float(cfg.trust))
        ).alias("trust"),
        (
            F.col(cfg.lang_field).cast("string")
            if cfg.lang_field
            else F.lit(None).cast("string")
        ).alias("lang"),
        text.alias("text"),
    ).where(F.length("text") > 0)
    if cfg.id_field:
        return out.select(
            F.concat(F.lit(f"{cfg.source_id}::"), F.col("__id")).alias("id"),
            "source",
            "trust",
            "lang",
            "text",
        )
    # Per-file window (parallel across files) + a broadcast cumulative
    # offset over files sorted by name: globally unique row ids without a
    # single-partition pass over the data — the only single-partition
    # window runs over the file list (metadata-scale). See docstring for
    # the single-split-per-file stability contract.
    fname = F.input_file_name()
    w_file = Window.partitionBy("__file").orderBy(F.monotonically_increasing_id())
    # __pid is captured at SCAN time (narrow projection over the file read,
    # before the window shuffle): >1 distinct pid for one file means Spark
    # split that file across tasks and the line-order contract is void.
    indexed = (
        out.withColumn("__file", fname)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__i", F.row_number().over(w_file) - 1)
    )
    w_off = (
        Window.orderBy("__file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        indexed.groupBy("__file")
        .agg(
            F.count("*").alias("__n"),
            F.countDistinct("__pid").alias("__splits"),
        )
        .select(
            "__file",
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
            "__splits",
        )
        # fail LOUDLY instead of numbering out of line order: the guard is
        # folded into __off (not a pruned side column) so Catalyst cannot
        # optimize it away.
        .select(
            "__file",
            F.when(F.col("__splits") == 1, F.col("__off"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("jsonl fallback-id path: file "),
                        F.col("__file"),
                        F.lit(" was read in "),
                        F.col("__splits").cast("string"),
                        F.lit(
                            " splits, so row-index ids would not follow "
                            "line order. Map cfg.id_field, or raise "
                            "spark.sql.files.maxPartitionBytes above the "
                            "largest file size."
                        ),
                    )
                )
            )
            .alias("__off"),
        )
    )
    return indexed.join(F.broadcast(offsets), "__file").select(
        F.concat(
            F.lit(f"{cfg.source_id}::row_"), (F.col("__off") + F.col("__i"))
        ).alias("id"),
        "source",
        "trust",
        "lang",
        "text",
    )


def jsonl_records_sql(path: str, cfg: JsonlSourceConfig) -> str:
    """DuckDB twin over ``read_json_auto`` for oracle checking (dotted
    paths become struct field access).

    Requires ``id_field``: the fallback row-index id derives from file
    line order, which ``row_number() OVER ()`` does not reproduce once
    DuckDB parallelizes the read — an order-nondeterministic oracle is
    worse than none."""
    if not cfg.id_field:
        raise ValueError(
            "jsonl_records_sql needs cfg.id_field — the row-index id path "
            "has no order-stable DuckDB twin"
        )
    # SQL string literals: embedded quotes must double, or a source_id /
    # path containing an apostrophe generates an unparseable oracle
    sid = cfg.source_id.replace("'", "''")
    path = path.replace("'", "''")

    def ref(f: str) -> str:
        head, _, rest = f.partition(".")
        return f'"{head}"."{rest}"' if rest else f'"{head}"'

    src = (
        f"COALESCE(CAST({ref(cfg.source_field)} AS VARCHAR), '{sid}')"
        if cfg.source_field
        else f"'{sid}'"
    )
    trust = (
        f"COALESCE(CAST({ref(cfg.trust_field)} AS DOUBLE), {float(cfg.trust)!r})"
        if cfg.trust_field
        else repr(float(cfg.trust))
    )
    lang = (
        f"CAST({ref(cfg.lang_field)} AS VARCHAR)" if cfg.lang_field else "CAST(NULL AS VARCHAR)"
    )
    idsql = f"'{sid}::' || CAST({ref(cfg.id_field)} AS VARCHAR)"
    from rust_triplets_spark.functions.text import normalize_inline_whitespace_sql

    norm = normalize_inline_whitespace_sql(f"CAST({ref(cfg.text_field)} AS VARCHAR)")
    return f"""
SELECT {idsql} AS id, {src} AS source, {trust} AS trust, {lang} AS lang,
       {norm} AS text
FROM read_json_auto('{path}')
WHERE length({norm}) > 0
"""
