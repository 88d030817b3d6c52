"""End-to-end training-set materialization: the WHOLE pipeline as one plan.

The reference's user story is "configure sources + recipes, pull training
batches" (``/root/reference/src/sampler/mod.rs`` — ingest, split, sample in
one engine). The Spark engine's equivalent at-rest contract is this module:
raw corpus → near-dup dedup (keep frame) → leakage-free split → token
packing → deterministic shard layout, composed as ONE DataFrame plan whose
every stage is an already-oracle-checked operator. The composition itself
is what this proves: survivors of the dedup gate feed the packer, the
packer's token offsets feed the context-window audit, and the shard/pos
layout is a pure function of the surviving ids — so the final manifest is
exactly reproducible from (corpus, seed) alone, which is the reference's
stable-ID determinism contract (``src/splits.rs:623-637``) extended to the
whole pipeline.

Scale shape (nothing new — inherited stage by stage):
- clustering: MinHash-LSH bucketed pairs + O(log n) pointer-jumping
  (``operators/dedup.neardup_clusters``), the only iterative stage;
- keep + split gates: row-local column arithmetic on the cluster frame
  (``id = rep`` and a hash cut on ``rep``) — no extra shuffle;
- packing: range-bucketed parallel rank + prefix sum per source
  (``operators/packing.pack_sequences``) — never a single-partition sort;
- shards: hash membership + bucketed in-shard rank (``sinks/shards``).
One corpus scan feeds the cluster stage; the survivor frame is scope-cached
because both the packer and the shard ranker consume it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.caching import cache_scoped
from rust_triplets_spark.operators.dedup import (
    MINHASH_SEED,
    minhash_lsh_pairs,
    neardup_clusters,
    neardup_clusters_sql,
)
from rust_triplets_spark.operators.packing import pack_sequences, pack_sequences_sql
from rust_triplets_spark.operators.splits import (
    DEFAULT_RATIOS,
    split_label_col,
    split_label_sql,
)
from rust_triplets_spark.sinks.shards import shard_assignment, shard_assignment_sql


def training_manifest(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    *,
    budget: int = 512,
    n_shards: int = 4,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
) -> DataFrame:
    """One row per TRAIN-split dedup survivor with its pack + shard slot.

    Columns: ``(id, source, n_tok, seq_idx, start_tok, bin_id, crosses,
    shard, pos)`` — everything a data loader needs to stream the corpus:
    which context window the document starts in (``bin_id``), whether the
    trainer must split it across windows (``crosses``), and its position
    in the globally shuffled shard layout (``shard``, ``pos``).

    Gate semantics: a document survives iff it is its near-dup cluster's
    min-id representative AND the cluster's split label (derived from the
    REP id, so near-copies can never straddle the cut —
    ``operators/splits.cluster_aware_splits``) is ``train``. Since the
    survivor IS the rep, the label check is a pure function of the
    survivor's own id; empty documents (0 tokens) drop at the packer, and
    shard positions are ranked over packed survivors only, so the manifest
    has no gaps."""
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=minhash_seed,
    )
    clusters = neardup_clusters(docs, id_col, text_col, pairs=pairs)
    gate = clusters.where(
        (F.col("id") == F.col("rep"))
        & (split_label_col(F.col("rep"), seed, ratios) == F.lit("train"))
    ).select("id")
    surv = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("__text"),
        F.col(source_col).alias("__source"),
    ).join(gate, "id")
    packed = cache_scoped(
        pack_sequences(surv, "id", "__text", "__source", budget),
        "funnel.training_packed",
    )
    sh = shard_assignment(packed.select("id"), "id", n_shards, seed)
    return packed.join(sh, "id").select(
        "id", "source", "n_tok", "seq_idx", "start_tok", "bin_id", "crosses",
        "shard", "pos",
    )


def training_manifest_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    *,
    budget: int = 512,
    n_shards: int = 4,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
) -> str:
    """DuckDB twin of :func:`training_manifest`: the same four stages as
    chained CTEs — recursive-closure clusters, rep+split gate, window-form
    packing, window-form shard ranks."""
    clusters = neardup_clusters_sql(
        table, id_sql, text_sql, num_hashes, bands, shingle_n, minhash_seed
    )
    label = split_label_sql("c.rep", seed, ratios)
    packed = pack_sequences_sql("tf_surv", "id", "text", "source", budget)
    sh = shard_assignment_sql("(SELECT id FROM tf_packed)", "id", n_shards, seed)
    return f"""
WITH tf_clusters AS MATERIALIZED ({clusters}),
tf_surv AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text,
         {source_sql} AS source
  FROM {table} JOIN tf_clusters c ON CAST({id_sql} AS BIGINT) = c.id
  WHERE c.id = c.rep AND ({label}) = 'train'
),
tf_packed AS MATERIALIZED ({packed}),
tf_sh AS ({sh})
SELECT p.id, p.source, p.n_tok, p.seq_idx, p.start_tok, p.bin_id, p.crosses,
       s.shard, s.pos
FROM tf_packed p JOIN tf_sh s ON p.id = s.id
"""


# ---------------------------------------------------------------------------
# Curation funnel — the modern LLM data-curation pipeline as one stage-count
# frame: quality gate → decontamination → near-dup dedup → DSIR selection
# ---------------------------------------------------------------------------


def curation_funnel(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    lang_col: str = "lang",
    *,
    target_lang: str = "en",
    min_words: int = 10,
    min_stop_hits: int = 1,
) -> DataFrame:
    """The 2023-era LLM curation pipeline (C4/Gopher → benchmark decontam
    → MinHash dedup → DSIR selection) composed as ONE plan, reported as
    the funnel stage counts: ``(stage_idx, stage, n_docs)`` for

    1. ``raw``       — the training side of the corpus (eval holdout out);
    2. ``quality``   — Gopher signal gate (tuned thresholds: the canonical
       50-word/2-stopword bars are corpus constants a real pipeline tunes;
       the ratio caps stay at Rae et al.'s values);
    3. ``decontam``  — survivors sharing no 13-gram with the eval holdout;
    4. ``dedup``     — MinHash-LSH cluster min-id representatives;
    5. ``selected``  — per-source top half by DSIR importance weight
       against the ``target_lang`` slice (rank ties → id; unscorable
       docs — zero features — are not selectable).

    Every stage is an already-oracle-checked operator; what this query
    proves is the COMPOSITION (each gate feeds the next) plus the exact
    stage counts. Scale shape inherited stage by stage: row-local gopher
    math, the broadcast 13-gram decontam join, bucketed LSH pairs +
    O(log n) pointer jumping, vocabulary-shaped DSIR aggregates, and a
    per-source rank window for selection — no stage is all-pairs or
    single-partition."""
    from rust_triplets_spark.operators.decontam import (
        decontaminate,
        eval_holdout_pred_col,
    )
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep
    from rust_triplets_spark.operators.dsir import dsir_importance_weights
    from rust_triplets_spark.operators.gopher import (
        MAX_BULLET_FRAC,
        MAX_ELLIPSIS_FRAC,
        MAX_MWL,
        MAX_SYMBOL_RATIO,
        MIN_ALPHA_FRAC,
        MIN_MWL,
        gopher_quality_signals,
    )

    pred = eval_holdout_pred_col(id_col)
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("__text"),
        F.col(source_col).alias("__source"),
        pred.alias("__holdout"),
    )
    raw = cache_scoped(base.where(~F.col("__holdout")), "funnel.curation_raw")
    evaldf = base.where(F.col("__holdout"))

    sig = gopher_quality_signals(raw, "id", "__text")
    gate = (
        (F.col("n_words") >= min_words)
        & (F.col("mean_word_len") >= MIN_MWL) & (F.col("mean_word_len") <= MAX_MWL)
        & (F.col("symbol_word_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") <= MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    quality = cache_scoped(
        raw.join(sig.where(gate).select("id"), "id"), "funnel.curation_quality"
    )

    clean_ids = decontaminate(quality, evaldf, "id", "__text").where(
        ~F.col("contaminated")
    ).select("id")
    dec_docs = cache_scoped(
        quality.join(clean_ids, "id"), "funnel.curation_decontam"
    )

    keep_ids = minhash_dedup_keep(dec_docs, "id", "__text").where(
        F.col("keep")
    ).select("id")
    ded_docs = cache_scoped(
        dec_docs.join(keep_ids, "id"), "funnel.curation_dedup"
    )

    target = docs.where(F.col(lang_col) == target_lang).select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__text")
    )
    weights = dsir_importance_weights(ded_docs, target, "id", "__text")
    scored = ded_docs.join(
        weights.where(F.col("avg_logratio").isNotNull()).select(
            "id", "avg_logratio"
        ),
        "id",
    )
    w = Window.partitionBy("__source").orderBy(
        F.col("avg_logratio").desc(), F.col("id").asc()
    )
    selected = (
        scored.select(
            "id",
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(Window.partitionBy("__source")).alias("__n"),
        )
        .where(F.col("__rn") * 2 <= F.col("__n") + 1)
    )

    def stage(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
        )

    return (
        stage(1, "raw", raw)
        .unionByName(stage(2, "quality", quality))
        .unionByName(stage(3, "decontam", dec_docs))
        .unionByName(stage(4, "dedup", ded_docs))
        .unionByName(stage(5, "selected", selected))
    )


def curation_funnel_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    lang_sql: str = "lang",
    *,
    target_lang: str = "en",
    min_words: int = 10,
    min_stop_hits: int = 1,
) -> str:
    """DuckDB twin of :func:`curation_funnel` — the same five gates as
    chained CTEs over the operators' own SQL twins."""
    from rust_triplets_spark.operators.decontam import (
        decontaminate_sql,
        eval_holdout_pred_sql,
    )
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep_sql
    from rust_triplets_spark.operators.dsir import dsir_importance_weights_sql
    from rust_triplets_spark.operators.gopher import (
        MAX_BULLET_FRAC,
        MAX_ELLIPSIS_FRAC,
        MAX_MWL,
        MAX_SYMBOL_RATIO,
        MIN_ALPHA_FRAC,
        MIN_MWL,
        gopher_quality_signals_sql,
    )

    # escape quotes before interpolating into a single-quoted SQL literal
    # (same convention as gopher._occurrences_sql)
    lang_lit = target_lang.replace("'", "''")
    pred = eval_holdout_pred_sql(id_sql)
    gopher = gopher_quality_signals_sql("cf_raw", "id", "text")
    dec = decontaminate_sql(
        "SELECT * FROM cf_quality",
        "SELECT * FROM cf_eval",
        "id",
        "text",
    )
    keep = minhash_dedup_keep_sql("cf_dec", "id", "text")
    dsir = dsir_importance_weights_sql(
        "SELECT * FROM cf_ded",
        f"SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text "
        f"FROM {table} WHERE {lang_sql} = '{lang_lit}'",
        "id",
        "text",
    )
    return f"""
WITH cf_base AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text,
         {source_sql} AS source, ({pred}) AS holdout
  FROM {table}
),
cf_raw AS MATERIALIZED (SELECT * FROM cf_base WHERE NOT holdout),
cf_eval AS MATERIALIZED (SELECT * FROM cf_base WHERE holdout),
cf_gate AS (
  SELECT id FROM ({gopher})
  WHERE n_words >= {min_words}
    AND mean_word_len >= {MIN_MWL!r} AND mean_word_len <= {MAX_MWL!r}
    AND symbol_word_ratio <= {MAX_SYMBOL_RATIO!r}
    AND bullet_line_frac <= {MAX_BULLET_FRAC!r}
    AND ellipsis_line_frac <= {MAX_ELLIPSIS_FRAC!r}
    AND alpha_word_frac >= {MIN_ALPHA_FRAC!r}
    AND stop_hits >= {min_stop_hits}
),
cf_quality AS MATERIALIZED (
  SELECT r.* FROM cf_raw r JOIN cf_gate g ON r.id = g.id
),
cf_dec AS MATERIALIZED (
  SELECT q.* FROM cf_quality q
  JOIN (SELECT id FROM ({dec}) WHERE NOT contaminated) c ON q.id = c.id
),
cf_ded AS MATERIALIZED (
  SELECT d.* FROM cf_dec d
  JOIN (SELECT id FROM ({keep}) WHERE keep) k ON d.id = k.id
),
cf_scored AS (
  SELECT d.id, d.source, s.avg_logratio
  FROM cf_ded d JOIN ({dsir}) s ON d.id = s.id
  WHERE s.avg_logratio IS NOT NULL
),
cf_sel AS (
  SELECT id FROM (
    SELECT id,
           row_number() OVER (PARTITION BY source
                              ORDER BY avg_logratio DESC, id) AS rn,
           count(*) OVER (PARTITION BY source) AS n
    FROM cf_scored
  ) WHERE rn * 2 <= n + 1
)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'raw' AS stage,
       CAST((SELECT count(*) FROM cf_raw) AS BIGINT) AS n_docs
UNION ALL SELECT 2, 'quality', (SELECT count(*) FROM cf_quality)
UNION ALL SELECT 3, 'decontam', (SELECT count(*) FROM cf_dec)
UNION ALL SELECT 4, 'dedup', (SELECT count(*) FROM cf_ded)
UNION ALL SELECT 5, 'selected', (SELECT count(*) FROM cf_sel)
"""


def text_granularity_funnel(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_line_docs: int = 3,
) -> DataFrame:
    """The three TEXT-GRANULARITY dedups composed as ordered EXCISION
    stages feeding document-level MinHash — the real pipeline shape
    (each stage rewrites the text the next stage sees, coarse → fine →
    whole-document):

    0. ``raw``        — the input corpus;
    1. ``paragraph``  — corpus-wide keep-first paragraph dedup
       (``operators/lines.paragraph_dedup``); docs excised to emptiness
       drop out;
    2. ``line``       — boilerplate lines in ≥ ``min_line_docs`` docs
       removed (``boilerplate_line_dedup``) from the paragraph-cleaned
       text;
    3. ``substring``  — cross-doc duplicate n-gram spans excised
       (``substrings.excise_duplicate_spans``) from the line-cleaned
       text. LAST of the excisions because it re-joins surviving tokens
       with single spaces (destroys line/paragraph structure the earlier
       stages key on) — the order-sensitivity pytest pins this;
    4. ``minhash``    — document-level MinHash-LSH cluster
       representatives of the fully-excised texts.

    Returns ``(stage, name, n_docs, n_tokens)`` — the audit row per
    stage. Each stage is an independently oracle-checked operator; this
    query pins the COMPOSITION (stage N's counts are over stage N-1's
    REWRITTEN text, not the raw corpus). Intermediate frames are
    scope-cached: the four stage aggregates are independent plan
    branches and each stage frame feeds both its own count branch and
    the next stage. Scale shape inherited per stage: fingerprint-keyed
    shuffles (text rides re-assembly as values), span frames tiny vs the
    corpus, bucketed LSH + O(log n) pointer jumping."""
    from rust_triplets_spark.functions.text import token_count_col
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep
    from rust_triplets_spark.operators.lines import (
        boilerplate_line_dedup,
        paragraph_dedup,
    )
    from rust_triplets_spark.operators.substrings import excise_duplicate_spans

    s0 = cache_scoped(
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(text_col).alias("text"),
        ),
        "funnel.tg_raw",
    )
    s1 = cache_scoped(
        paragraph_dedup(s0, "id", "text")
        .where(F.length("clean_text") > 0)
        .select("id", F.col("clean_text").alias("text")),
        "funnel.tg_para",
    )
    s2 = cache_scoped(
        boilerplate_line_dedup(s1, "id", "text", min_line_docs)
        .where(F.length("clean_text") > 0)
        .select("id", F.col("clean_text").alias("text")),
        "funnel.tg_line",
    )
    s3 = cache_scoped(
        excise_duplicate_spans(s2, "id", "text")
        .where(F.length("clean_text") > 0)
        .select("id", F.col("clean_text").alias("text")),
        "funnel.tg_span",
    )
    keep = minhash_dedup_keep(s3, "id", "text").where(F.col("keep")).select("id")
    s4 = s3.join(keep, "id")

    def stage(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).cast("long").alias("stage"),
            F.lit(name).alias("name"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(token_count_col(F.col("text"))), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )

    return (
        stage(0, "raw", s0)
        .unionByName(stage(1, "paragraph", s1))
        .unionByName(stage(2, "line", s2))
        .unionByName(stage(3, "substring", s3))
        .unionByName(stage(4, "minhash", s4))
    )


def text_granularity_funnel_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    *,
    min_line_docs: int = 3,
) -> str:
    """DuckDB twin of :func:`text_granularity_funnel` — the same four
    excision/dedup twins chained so each consumes the previous stage's
    REWRITTEN text."""
    from rust_triplets_spark.functions.text import token_count_sql
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep_sql
    from rust_triplets_spark.operators.lines import (
        boilerplate_line_dedup_sql,
        paragraph_dedup_sql,
    )
    from rust_triplets_spark.operators.substrings import excise_duplicate_spans_sql

    p_sql = paragraph_dedup_sql(
        "(SELECT id, text FROM tg0) AS src", "src.id", "src.text"
    )
    l_sql = boilerplate_line_dedup_sql(
        "(SELECT id, text FROM tg1) AS src", "src.id", "src.text", min_line_docs
    )
    # excise's CTEs append their own alias ``t``; minhash's chain reuses
    # the table reference several times — pass the bare CTE name
    x_sql = excise_duplicate_spans_sql(
        "(SELECT id, text FROM tg2)", "t.id", "t.text"
    )
    k_sql = minhash_dedup_keep_sql("tg3", "id", "text")

    def stage(idx: int, name: str, src: str) -> str:
        return (
            f"SELECT CAST({idx} AS BIGINT) AS stage, '{name}' AS name, "
            f"CAST(count(*) AS BIGINT) AS n_docs, "
            f"CAST(COALESCE(sum({token_count_sql('text')}), 0) AS BIGINT) "
            f"AS n_tokens FROM {src}"
        )

    return f"""
WITH tg0 AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text FROM {table}
),
tgp AS ({p_sql}),
tg1 AS MATERIALIZED (
  SELECT id, clean_text AS text FROM tgp WHERE length(clean_text) > 0
),
tgl AS ({l_sql}),
tg2 AS MATERIALIZED (
  SELECT id, clean_text AS text FROM tgl WHERE length(clean_text) > 0
),
tgx AS ({x_sql}),
tg3 AS MATERIALIZED (
  SELECT id, clean_text AS text FROM tgx WHERE length(clean_text) > 0
),
tgk AS ({k_sql}),
tg4 AS (SELECT t.id, t.text FROM tg3 t JOIN tgk k ON t.id = k.id AND k.keep)
{stage(0, 'raw', 'tg0')}
UNION ALL {stage(1, 'paragraph', 'tg1')}
UNION ALL {stage(2, 'line', 'tg2')}
UNION ALL {stage(3, 'substring', 'tg3')}
UNION ALL {stage(4, 'minhash', 'tg4')}
"""
