"""Line-level corpus cleaning — boilerplate line dedup and C4 heuristics.

Two standard web-corpus cleaning passes a 100 TB pretraining pipeline runs
before any document-level dedup (both from the public literature; the
reference's denoiser, ``src/preprocessor/backends/denoiser_preprocessor.rs``,
is the same *shape* — per-line gates over a split document — but these two
operate on corpus-global line frequencies / C4's published heuristics):

- **Boilerplate line dedup** (CCNet, Wenzek et al. 2019; RefinedWeb,
  Penedo et al. 2023): a line occurring in many *distinct documents* is
  navigation/footer boilerplate ("subscribe to our newsletter",
  copyright lines) and is removed from every document.
- **C4 line filter** (Raffel et al. 2020, §2.2): keep only lines that end
  in terminal punctuation and have at least ``min_words`` words; drop any
  document that ends up with fewer than ``min_kept`` lines, mentions
  "lorem ipsum", or contains a curly brace (code page).

Input contract: text is LF-normalized (``\\n`` separators). CRLF input
would leave a trailing ``\\r`` on every line, where Java's ``$`` anchor
(matches before a final line terminator) and RE2's (end of text only)
disagree — run ``regexp_replace(text, '\\r\\n', '\\n')`` upstream first.

Scale shape: line frequency is ONE partial-aggregable groupBy keyed by
``(hash31(line), length(line))`` — fixed-width shuffle keys, never line
text (the same rule the exact-dedup fix follows: blobs stay out of shuffle
keys); the re-join back to lines broadcasts nothing and is linear in total
line count. Document re-assembly is a single groupBy(id) with an ordered
fold. The C4 filter is entirely row-local (zero shuffles beyond the final
per-doc agg). Both are pure column expressions — no UDFs — with DuckDB
twins that evaluate hash-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_col, hash31_str_sql

LINE_SEED = 3301

# C4's terminal-punctuation rule: line must end in . ! ? or closing quote.
_TERMINAL_RE = '[.!?"]$'
# Spark's \s and DuckDB RE2's \s agree on ASCII whitespace here.
_WS = "\\s+"


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode documents into (id, pos, line) rows. Zero-shuffle."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select("id", F.col("pos").cast("long").alias("pos"), "line")


def boilerplate_line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int,
    seed: int = LINE_SEED,
) -> DataFrame:
    """Remove lines that occur in ``>= min_docs`` distinct documents.

    Returns one row per document: ``(id, n_lines, n_removed, clean_text)``
    where ``clean_text`` is the document with boilerplate lines dropped
    (remaining lines re-joined with ``\\n`` in original order). Empty
    lines are never counted as boilerplate (they are structure, not
    content) and are kept.

    Frequency counting groups by ``(hash31(trim(line)), length)`` — a
    collision would remove an extra line identically on both engines, so
    the oracle stays exact; at 31-bit hash × length granularity the
    collision rate is negligible for line-scale strings.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = _lines(df, id_col, text_col)
    norm = F.trim(F.col("line"))
    keyed = lines.select(
        "id",
        "pos",
        "line",
        F.when(F.length(norm) > 0, hash31_str_col(norm, seed))
        .otherwise(F.lit(None))
        .alias("lkey"),
        F.length(norm).alias("llen"),
    )
    freq = (
        keyed.where(F.col("lkey").isNotNull())
        .groupBy("lkey", "llen")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("lkey", "llen", F.lit(True).alias("boiler"))
    )
    marked = keyed.join(freq, ["lkey", "llen"], "left").select(
        "id",
        "pos",
        "line",
        F.coalesce(F.col("boiler"), F.lit(False)).alias("removed"),
    )
    kept_struct = F.when(~F.col("removed"), F.struct("pos", "line"))
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("removed").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["line"]
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(
            "id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_removed").cast("long").alias("n_removed"),
            "clean_text",
        )
    )


def boilerplate_line_dedup_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    min_docs: int,
    seed: int = LINE_SEED,
) -> str:
    """DuckDB twin of :func:`boilerplate_line_dedup`. ``table`` may be a
    parenthesized subquery."""
    key = hash31_str_sql("trim(l.line)", seed)
    return f"""
WITH docs AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, string_split({text_sql}, chr(10)) AS ls
  FROM {table}
), lines AS (
  SELECT d.id, CAST(u.i - 1 AS BIGINT) AS pos, d.ls[u.i] AS line
  FROM docs d, UNNEST(range(1, len(d.ls) + 1)) AS u(i)
), keyed AS (
  SELECT l.id, l.pos, l.line,
         CASE WHEN length(trim(l.line)) > 0 THEN {key} END AS lkey,
         length(trim(l.line)) AS llen
  FROM lines l
), freq AS (
  SELECT lkey, llen FROM keyed WHERE lkey IS NOT NULL
  GROUP BY lkey, llen HAVING count(DISTINCT id) >= {int(min_docs)}
), marked AS (
  SELECT k.id, k.pos, k.line, (f.lkey IS NOT NULL) AS removed
  FROM keyed k LEFT JOIN freq f ON k.lkey = f.lkey AND k.llen = f.llen
)
SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT removed THEN line END, chr(10)
                           ORDER BY pos), '') AS clean_text
FROM marked GROUP BY id
"""


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    min_kept: int = 3,
) -> DataFrame:
    """C4's line + document heuristics (Raffel et al. 2020 §2.2).

    Line kept iff the trimmed line ends in terminal punctuation
    (``.!?"``) and has ``>= min_words`` whitespace words. Document kept
    iff ``>= min_kept`` lines survive, the text does not contain
    ``lorem ipsum`` (case-insensitive), and contains no ``{``.

    Returns ``(id, n_lines, n_kept, doc_kept, clean_text)`` — one row per
    input document (dropped documents report ``doc_kept = false`` with
    their would-be cleaned text, so the caller can audit the filter).
    Entirely row-local until the final per-doc aggregation — the document
    gates fold into the same agg (neither pattern can span a line break,
    so "text contains X" == "any line contains X"); no second scan of the
    text column and no per-doc join.
    """
    if min_words < 1 or min_kept < 1:
        raise ValueError(f"min_words/min_kept must be >= 1, got {min_words}/{min_kept}")
    lines = _lines(df, id_col, text_col)
    norm = F.trim(F.col("line"))
    n_words = F.size(F.filter(F.split(norm, _WS), lambda t: t != F.lit("")))
    keep_line = norm.rlike(_TERMINAL_RE) & (n_words >= min_words)
    line_bad = F.lower(F.col("line")).contains("lorem ipsum") | F.col("line").contains(
        "{"
    )
    marked = lines.select(
        "id", "pos", "line", keep_line.alias("kept"), line_bad.alias("bad")
    )
    kept_struct = F.when(F.col("kept"), F.struct("pos", "line"))
    per_doc = marked.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        (F.max(F.col("bad").cast("int")) == 0).alias("__doc_ok"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda x: x["line"]),
            "\n",
        ).alias("clean_text"),
    )
    return per_doc.select(
        "id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept").cast("long").alias("n_kept"),
        ((F.col("n_kept") >= min_kept) & F.col("__doc_ok")).alias("doc_kept"),
        "clean_text",
    )


def c4_line_filter_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    min_words: int = 3,
    min_kept: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_filter`."""
    return f"""
WITH docs AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         string_split({text_sql}, chr(10)) AS ls
  FROM {table}
), lines AS (
  SELECT d.id, CAST(u.i - 1 AS BIGINT) AS pos, d.ls[u.i] AS line
  FROM docs d, UNNEST(range(1, len(d.ls) + 1)) AS u(i)
), marked AS (
  SELECT id, pos, line,
         (regexp_matches(trim(line), '{_TERMINAL_RE}')
          AND len(list_filter(regexp_split_to_array(trim(line), '{_WS}'),
                              x -> x <> '')) >= {int(min_words)}) AS kept,
         (contains(lower(line), 'lorem ipsum') OR contains(line, '{{')) AS bad
  FROM lines
), per_doc AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         max(CASE WHEN bad THEN 1 ELSE 0 END) = 0 AS doc_ok,
         COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10)
                             ORDER BY pos), '') AS clean_text
  FROM marked GROUP BY id
)
SELECT id, n_lines, n_kept,
       (n_kept >= {int(min_kept)} AND doc_ok) AS doc_kept, clean_text
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Paragraph-level keep-first dedup (RefinedWeb, Penedo et al. 2023 §3.3:
# exact substring/paragraph dedup keeps the FIRST occurrence). Line dedup
# above removes corpus-global boilerplate by frequency; this removes every
# LATER copy of any repeated paragraph — the coarse-grained complement of
# the character-level operators/substrings pass.
# ---------------------------------------------------------------------------

PARA_SEED = 3307


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = PARA_SEED,
) -> DataFrame:
    """Keep-first paragraph dedup: a paragraph (a ``\\n\\n``-separated,
    trimmed, non-empty block) survives only at its FIRST corpus
    occurrence — minimum ``(doc_id, position)`` over every copy. Returns
    one row per document: ``(id, n_paras, n_dropped, clean_text)`` with
    survivors re-joined by ``\\n\\n`` in original order; documents with no
    non-empty paragraphs report ``(0, 0, '')``.

    Scale shape: paragraphs shuffle as ``(hash31, length)`` fingerprints
    + ``(id, pos)`` — the first-occurrence agg is partial-aggregable with
    fixed-width keys; paragraph TEXT never enters a shuffle key (it rides
    the final per-doc re-assembly groupBy as a value, like the line
    pass). A fingerprint collision drops the same paragraph on both
    engines, so the oracle stays exact."""
    paras_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n\n"), lambda p: F.trim(p)),
        lambda p: F.length(p) > 0,
    )
    paras = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode_outer(paras_arr).alias("pos", "para"),
    ).select("id", F.col("pos").cast("long").alias("pos"), "para")
    keyed = paras.select(
        "id", "pos", "para",
        hash31_str_col(F.col("para"), seed).alias("pkey"),
        F.length("para").alias("plen"),
    )
    first = (
        keyed.where(F.col("pkey").isNotNull())
        .groupBy("pkey", "plen")
        .agg(F.min(F.struct("id", "pos")).alias("first"))
        .select(
            "pkey", "plen",
            F.col("first.id").alias("fid"), F.col("first.pos").alias("fpos"),
        )
    )
    marked = keyed.join(first, ["pkey", "plen"], "left").select(
        "id", "pos", "para",
        # null para (doc had no non-empty paragraphs) marks as kept=false
        # but also counts as no paragraph at all
        F.col("para").isNotNull().alias("is_para"),
        (
            F.col("para").isNotNull()
            & (F.col("id") == F.col("fid")) & (F.col("pos") == F.col("fpos"))
        ).alias("kept"),
    )
    kept_struct = F.when(F.col("kept"), F.struct("pos", "para"))
    return (
        marked.groupBy("id")
        .agg(
            F.sum(F.col("is_para").cast("long")).alias("n_paras"),
            F.sum((F.col("is_para") & ~F.col("kept")).cast("long")).alias(
                "n_dropped"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["para"],
                ),
                "\n\n",
            ).alias("clean_text"),
        )
        .select(
            "id",
            F.col("n_paras").cast("long").alias("n_paras"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
            "clean_text",
        )
    )


def paragraph_dedup_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    seed: int = PARA_SEED,
) -> str:
    """DuckDB twin of :func:`paragraph_dedup`. ``table`` may be a
    parenthesized subquery."""
    key = hash31_str_sql("p.para", seed)
    return f"""
WITH pd_docs AS (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         list_filter(list_transform(string_split({text_sql},
                                                 chr(10) || chr(10)),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS ps
  FROM {table}
), pd_paras AS (
  SELECT d.id, CAST(u.i - 1 AS BIGINT) AS pos, d.ps[u.i] AS para
  FROM pd_docs d, UNNEST(range(1, len(d.ps) + 1)) AS u(i)
), pd_keyed AS (
  SELECT p.id, p.pos, p.para, {key} AS pkey, length(p.para) AS plen
  FROM pd_paras p
), pd_first AS (
  SELECT pkey, plen,
         min(struct_pack(id := id, pos := pos)) AS first
  FROM pd_keyed GROUP BY pkey, plen
), pd_marked AS (
  SELECT k.id, k.pos, k.para,
         (k.id = f.first.id AND k.pos = f.first.pos) AS kept
  FROM pd_keyed k JOIN pd_first f ON k.pkey = f.pkey AND k.plen = f.plen
), pd_agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_paras,
         CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
         COALESCE(string_agg(CASE WHEN kept THEN para END,
                             chr(10) || chr(10) ORDER BY pos), '')
           AS clean_text
  FROM pd_marked GROUP BY id
)
SELECT d.id,
       COALESCE(a.n_paras, 0) AS n_paras,
       COALESCE(a.n_dropped, 0) AS n_dropped,
       COALESCE(a.clean_text, '') AS clean_text
FROM pd_docs d LEFT JOIN pd_agg a ON d.id = a.id
"""


# ---------------------------------------------------------------------------
# line-level language segmentation — multilingual document splitting.
# Web documents routinely interleave languages (boilerplate in one, body
# in another; quoted passages; code comments); corpus pipelines split
# them into contiguous single-language segments before per-language
# filtering (the CCNet/Dolma shape). Line granularity + run-length merge:
# classify every line with the SAME lang_id heuristic both engines
# already share (functions/text.py), then merge adjacent same-language
# runs into segments. All row-local work + two per-document windows
# (docs are the partition key — bounded per doc, never global).
# ---------------------------------------------------------------------------


def language_segments(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Contiguous same-language line runs per document:
    ``(id, seg_idx, lang, n_lines, n_chars)``. Blank lines classify as
    'und' and form their own runs (they separate language blocks exactly
    when the surrounding languages differ — a blank line BETWEEN equal
    languages still splits the run only into und/lang segments, never
    merges across languages)."""
    from pyspark.sql import Window

    from rust_triplets_spark.functions.text import lang_id_col

    lines = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    ).withColumn("lang", lang_id_col(F.col("line")))
    w = Window.partitionBy("id").orderBy("line_idx")
    runs = lines.withColumn(
        "__new",
        F.when(
            F.lag("lang").over(w).isNull()
            | (F.lag("lang").over(w) != F.col("lang")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    ).withColumn(
        "seg_idx",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1,
    )
    return runs.groupBy("id", "seg_idx", "lang").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.length("line")).cast("long").alias("n_chars"),
    )


def language_segments_sql(table: str, id_sql: str, text_sql: str) -> str:
    """DuckDB twin: same per-line lang_id expression, same run-length
    window arithmetic."""
    from rust_triplets_spark.functions.text import lang_id_sql

    return f"""
WITH ls_lines AS MATERIALIZED (
  -- no WITH ORDINALITY in DuckDB: index via the 2-arg lambda (param
  -- names must not collide with outer columns — DuckDB resolves the
  -- outer binding on collision)
  SELECT CAST({id_sql} AS BIGINT) AS id,
         u.s['i'] - 1 AS line_idx,
         u.s['line'] AS line
  FROM {table} t,
       UNNEST(list_transform(string_split({text_sql}, chr(10)),
              (el, ix) -> {{'line': el, 'i': ix}})) AS u(s)
),
ls_lang AS MATERIALIZED (
  SELECT id, line_idx, line, {lang_id_sql("line")} AS lang FROM ls_lines
),
ls_runs AS (
  SELECT id, line_idx, line, lang,
         CASE WHEN lag(lang) OVER w IS NULL
                OR lag(lang) OVER w <> lang THEN 1 ELSE 0 END AS __new
  FROM ls_lang
  WINDOW w AS (PARTITION BY id ORDER BY line_idx)
),
ls_seg AS (
  SELECT id, line, lang,
         sum(__new) OVER (PARTITION BY id ORDER BY line_idx
                          ROWS UNBOUNDED PRECEDING) - 1 AS seg_idx
  FROM ls_runs
)
SELECT id, CAST(seg_idx AS BIGINT) AS seg_idx, lang,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(length(line)) AS BIGINT) AS n_chars
FROM ls_seg
GROUP BY 1, 2, 3
"""
