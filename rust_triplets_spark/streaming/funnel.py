"""Streaming ingest funnel — the delivery-time counterpart of the at-rest
``plans/funnel.curation_funnel``: every document arriving on a stream gets
the full admission decision INSIDE the ingest query, with no state store,
no watermark, and no stream-side shuffle.

The at-rest funnel asks "of the corpus I have, what survives curation?";
this one asks "should THIS arriving document enter the corpus at all?" —
the question a 100 TB/day feed has to answer before paying storage. Four
gates, every kernel an already-tested batch==stream operator:

1. **novelty** — Bloom membership over the exact-dedup text fingerprint
   (``streaming/bloom.bloom_member_col``): a document whose fingerprint
   is (maybe) already ingested is not new. The filter is a fixed-size
   broadcastable model fitted from the at-rest history; between
   deliveries the history filter merges with each delivery's own filter
   (``operators/bloom.bloom_merge`` — the lifecycle
   ``tests/test_bloom.py`` pins).
2. **quality** — the Gopher signal gate (``operators/gopher``), entirely
   row-local column math, with the same tuned thresholds as the at-rest
   funnel.
3. **decontam** — fuzzy (MinHash-band) collision against the benchmark
   key set (``streaming/decontam.band_collision_udf``): row-local ANY test
   against a driver-side frozenset, exact twin of the join-form flags.
4. **selection** — DSIR importance against the fitted bucket model
   (``streaming/dsir.with_dsir_score``): admitted documents must look at
   least ``min_avg_logratio`` more target-like than background. The
   at-rest funnel ranks per-source top-half (a window — not stream-
   expressible without state); the ingest-time contract is a fixed
   threshold, the standard admission form of the same model.

All four gates are computed for EVERY row (no short-circuit): the output
is a per-document decision TRACE ``(id, is_new, quality_ok, decontam_ok,
dsir_ok, avg_logratio, admitted)``, which is what an ingest audit needs
— a dropped doc's reason is in the row. Every kernel is map-only, so the
same function runs verbatim on a batch frame and a readStream frame;
``tests/test_streaming_funnel.py`` pins batch == stream across two
deliveries, stage counts included.

Scale shape: Bloom model ≤ ceil(m_bits/63) int64 words, DSIR table ≤
n_buckets entries, benchmark key set ≤ bands × |eval| tuples — all three
ride UDF closures (broadcast-sized BY CONSTRUCTION); everything else is
row-local column math. Nothing shuffles; nothing is stateful; each
micro-batch admits independently."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    BLOOM_SEED,
    text_fingerprint_col,
)
from rust_triplets_spark.operators.dedup import MINHASH_SEED
from rust_triplets_spark.operators.gopher import gopher_pass_col, gopher_signal_cols
from rust_triplets_spark.streaming.bloom import (
    BloomFilterModel,
    bloom_filter_model,
    bloom_member_col,
)
from rust_triplets_spark.operators.dedup import (
    minhash_band_structs_col,
    minhash_signature_array_col,
)
from rust_triplets_spark.streaming.decontam import (
    band_collision_udf,
    eval_key_set,
    fuzzy_eval_index,
)
from rust_triplets_spark.streaming.dsir import DsirModel, dsir_model, with_dsir_score


def _make_all_gates_udf():
    """``admitted`` is a pandas-UDF conjunction, NOT a plain ``&``
    expression — deliberately. A downstream ``.where("admitted")`` would
    otherwise push the predicate through the trace projection,
    substituting every gate's full expression tree (the 31-bit hash
    chains behind the fingerprint, MinHash and DSIR columns) into the
    filter; codegen's common-subexpression canonicalization then grinds
    for MINUTES on the duplicated multiply chains (measured: a 4-row
    filter planned > 90 s; plain scan 4 s). The UDF output is a real
    attribute filters cannot be pushed below, and pushdown buys nothing
    here anyway: every gate is computed per-row and none can reach a
    scan. Cost: one extra Arrow batch column."""
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def _all4(a, b, c, d):
        return a & b & c & d

    return _all4


_all_gates_udf = _make_all_gates_udf()


@dataclass(frozen=True)
class IngestModels:
    """Everything the ingest funnel needs, fitted batch-side once per
    delivery cycle. All fields are bounded-size driver values."""

    bloom: BloomFilterModel
    eval_keys: frozenset
    dsir: DsirModel
    num_hashes: int = 32
    bands: int = 8
    shingle_n: int = 3
    minhash_seed: int = MINHASH_SEED
    min_words: int = 10
    max_words: int = 100_000
    min_stop_hits: int = 1
    min_avg_logratio: float = 0.0


def fit_ingest_models(
    history: DataFrame,
    evaldf: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    *,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    bloom_seed: int = BLOOM_SEED,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
    min_words: int = 10,
    max_words: int = 100_000,
    min_stop_hits: int = 1,
    min_avg_logratio: float = 0.0,
) -> IngestModels:
    """Fit the three models from batch frames: the Bloom filter over the
    already-ingested ``history``, the benchmark key set from ``evaldf``,
    and the DSIR buckets from (``history`` as background, ``target`` as
    the domain to prefer)."""
    hist_keys = history.select(
        text_fingerprint_col(F.col(text_col)).alias("fp")
    )
    bloom = bloom_filter_model(hist_keys, "fp", m_bits, k_hashes, bloom_seed)
    # the key set keeps only (band, sig) — a constant id is fine
    keys = eval_key_set(
        fuzzy_eval_index(
            evaldf.select(F.lit(0).alias("__eid"), F.col(text_col)),
            "__eid", text_col, num_hashes, bands, shingle_n, minhash_seed,
        )
    )
    dsir = dsir_model(history, target, text_col)
    return IngestModels(
        bloom=bloom,
        eval_keys=keys,
        dsir=dsir,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        minhash_seed=minhash_seed,
        min_words=min_words,
        max_words=max_words,
        min_stop_hits=min_stop_hits,
        min_avg_logratio=min_avg_logratio,
    )


def ingest_funnel(
    df: DataFrame,
    models: IngestModels,
    id_col: str,
    text_col: str,
    admitted_only: bool = False,
) -> DataFrame:
    """The per-document admission trace for a batch OR streaming frame:
    ``(id, is_new, quality_ok, decontam_ok, dsir_ok, avg_logratio,
    admitted)``. Map-only end to end (module doc).

    ``admitted_only=True`` drops rejected rows INSIDE the final Arrow
    stage (``mapInPandas``) instead of a Catalyst ``Filter``. Use it —
    not ``.where("admitted")`` — to keep only survivors: a Filter over
    this plan triggers a physical rewrite that re-inlines the gate
    expression trees ~16x (measured 70 KB → 1.2 MB of physical plan; task
    deserialization then dominates wall time), while the pandas-side drop
    leaves the fast plan untouched. Appending more map-only transforms to
    the returned frame is fine either way."""
    text = F.col(text_col)
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        text.alias("__text"),
        bloom_member_col(
            models.bloom, text_fingerprint_col(text)
        ).alias("__seen"),
        *gopher_signal_cols(text),
    )
    # MinHash staging: one real column per step (the join path's shape) —
    # inlining the 32-min signature into every band slot overflows the
    # Python->JVM column conversion (band_collision_udf docstring)
    sig = minhash_signature_array_col(
        F.col("__text"), models.num_hashes, models.shingle_n,
        models.minhash_seed,
    )
    base = base.withColumn("__sig", sig).withColumn(
        "__bands",
        F.when(
            F.col("__sig").isNotNull(),
            minhash_band_structs_col(
                F.col("__sig"), models.num_hashes, models.bands
            ),
        ),
    ).withColumn(
        "__contaminated",
        F.coalesce(
            band_collision_udf(models.eval_keys)(F.col("__bands")),
            F.lit(False),
        ),
    ).drop("__sig", "__bands")
    scored = with_dsir_score(base, models.dsir, "__text")
    dsir_ok = F.coalesce(
        F.col("avg_logratio") >= models.min_avg_logratio, F.lit(False)
    )
    trace = scored.select(
        "id",
        (~F.col("__seen")).alias("is_new"),
        gopher_pass_col(
            models.min_words, models.max_words, models.min_stop_hits
        ).alias("quality_ok"),
        (~F.col("__contaminated")).alias("decontam_ok"),
        dsir_ok.alias("dsir_ok"),
        "avg_logratio",
    )
    trace = trace.withColumn(
        "admitted",
        _all_gates_udf(
            F.col("is_new"), F.col("quality_ok"), F.col("decontam_ok"),
            F.col("dsir_ok"),
        ),
    )
    if not admitted_only:
        return trace

    def _keep_admitted(batches):
        for pdf in batches:
            yield pdf[pdf["admitted"]]

    return trace.mapInPandas(_keep_admitted, trace.schema)


def stream_ingest_funnel(
    spark,
    source_dir: str,
    schema,
    models: IngestModels,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """File-stream convenience wrapper: readStream over ``source_dir`` →
    :func:`ingest_funnel` — append-mode, stateless."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return ingest_funnel(raw, models, id_col, text_col)


def ingest_funnel_trace_sql(
    arrivals_sql: str,
    history_sql: str,
    eval_sql: str,
    target_sql: str,
    id_sql: str,
    text_sql: str,
    *,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
    bloom_seed: int = BLOOM_SEED,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
    min_words: int = 10,
    max_words: int = 100_000,
    min_stop_hits: int = 1,
    min_avg_logratio: float = 0.0,
    n_buckets: int | None = None,
    dsir_seed: int | None = None,
) -> str:
    """DuckDB twin of ``fit_ingest_models`` + :func:`ingest_funnel` over
    BATCH frames — what makes the streaming capstone correctness-HARD
    rather than only batch==stream parity-tested: every gate's model fit
    AND its application are re-expressed from the gates' own registered
    twins (bloom build/probe, Gopher signals, MinHash band collision,
    DSIR bucket table), composed into the one per-document admission
    trace ``(id, is_new, quality_ok, decontam_ok, dsir_ok, avg_logratio,
    admitted)``.

    The four ``*_sql`` inputs are full SELECT statements producing the
    arrivals / history / eval / target corpora; ``id_sql`` / ``text_sql``
    are column expressions valid over each of them."""
    from rust_triplets_spark.functions.hashing import mix31_sql
    from rust_triplets_spark.operators.bloom import (
        bloom_build_sql,
        bloom_probe_sql,
        text_fingerprint_sql,
    )
    from rust_triplets_spark.operators.dedup import (
        BAND_SEED,
        minhash_signatures_sql,
    )
    from rust_triplets_spark.operators.dsir import (
        DSIR_BUCKETS,
        DSIR_SEED,
        _feature_buckets_sql,
    )
    from rust_triplets_spark.operators.gopher import (
        MAX_BULLET_FRAC,
        MAX_ELLIPSIS_FRAC,
        MAX_MWL,
        MAX_SYMBOL_RATIO,
        MIN_ALPHA_FRAC,
        MIN_MWL,
        gopher_quality_signals_sql,
    )
    from rust_triplets_spark.operators.lm_quality import LM_QSCALE

    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    r = num_hashes // bands
    nb = DSIR_BUCKETS if n_buckets is None else n_buckets
    ds = DSIR_SEED if dsir_seed is None else dsir_seed

    seen = bloom_probe_sql(
        bloom_build_sql(
            "SELECT text FROM if_hist",
            text_fingerprint_sql("t.text"),
            m_bits, k_hashes, bloom_seed,
        ),
        "SELECT id, text FROM if_arr",
        "t.id",
        text_fingerprint_sql("t.text"),
        m_bits, k_hashes, bloom_seed,
    )
    gopher = gopher_quality_signals_sql("if_arr", "id", "text")
    arr_sigs = minhash_signatures_sql(
        "if_arr", "id", "text", num_hashes, shingle_n, minhash_seed
    )
    ev_sigs = minhash_signatures_sql(
        "if_eval", "id", "text", num_hashes, shingle_n, minhash_seed
    )

    def _banded(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, "
            f"{mix31_sql([f'mh_{b * r + j}' for j in range(r)], BAND_SEED + b)}"
            f" AS sig FROM {src}"
            for b in range(bands)
        )

    feats = _feature_buckets_sql("text", nb, ds)
    avg = (
        f"(CAST(d.weight_q AS DOUBLE) / "
        f"(CAST(d.n_feats AS DOUBLE) * {float(LM_QSCALE)!r}))"
    )
    quality_pass = (
        f"COALESCE(n_words >= {min_words} AND n_words <= {max_words}"
        f" AND mean_word_len >= {MIN_MWL!r} AND mean_word_len <= {MAX_MWL!r}"
        f" AND symbol_word_ratio <= {MAX_SYMBOL_RATIO!r}"
        f" AND bullet_line_frac <= {MAX_BULLET_FRAC!r}"
        f" AND ellipsis_line_frac <= {MAX_ELLIPSIS_FRAC!r}"
        f" AND alpha_word_frac >= {MIN_ALPHA_FRAC!r}"
        f" AND stop_hits >= {min_stop_hits}, false)"
    )
    return f"""
WITH if_arr AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text FROM ({arrivals_sql}) t
),
if_hist AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text FROM ({history_sql}) t
),
if_eval AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text FROM ({eval_sql}) t
),
if_tgt AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text FROM ({target_sql}) t
),
if_seen AS MATERIALIZED ({seen}),
if_gopher AS MATERIALIZED (
  SELECT id, {quality_pass} AS quality_ok FROM ({gopher}) gq
),
if_arr_band AS MATERIALIZED ({_banded(f'({arr_sigs})')}),
if_ev_band AS MATERIALIZED ({_banded(f'({ev_sigs})')}),
if_collide AS MATERIALIZED (
  SELECT DISTINCT l.id FROM if_arr_band l
  JOIN if_ev_band e ON l.band = e.band AND l.sig = e.sig
),
if_hist_occ AS MATERIALIZED (
  SELECT u.b AS b FROM if_hist, UNNEST({feats}) AS u(b)
),
if_tgt_occ AS MATERIALIZED (
  SELECT u.b AS b FROM if_tgt, UNNEST({feats}) AS u(b)
),
if_p AS (SELECT b, CAST(count(*) AS BIGINT) AS c_p FROM if_tgt_occ GROUP BY b),
if_q AS (SELECT b, CAST(count(*) AS BIGINT) AS c_q FROM if_hist_occ GROUP BY b),
if_tot AS (
  SELECT (SELECT count(*) FROM if_tgt_occ) AS tp,
         (SELECT count(*) FROM if_hist_occ) AS tq
),
if_buckets AS MATERIALIZED (
  SELECT COALESCE(p.b, q.b) AS b,
         CAST(round((ln(CAST(COALESCE(p.c_p, 0) AS DOUBLE) * 2 + 1)
                   - ln(CAST(t.tp AS DOUBLE) * 2 + {float(nb)!r})
                   - ln(CAST(COALESCE(q.c_q, 0) AS DOUBLE) * 2 + 1)
                   + ln(CAST(t.tq AS DOUBLE) * 2 + {float(nb)!r}))
                   * {float(LM_QSCALE)!r}) AS BIGINT) AS lrq
  FROM if_p p FULL JOIN if_q q ON p.b = q.b CROSS JOIN if_tot t
),
if_default AS (
  SELECT CAST(round((ln(CAST(0 AS DOUBLE) * 2 + 1)
                   - ln(CAST(t.tp AS DOUBLE) * 2 + {float(nb)!r})
                   - ln(CAST(0 AS DOUBLE) * 2 + 1)
                   + ln(CAST(t.tq AS DOUBLE) * 2 + {float(nb)!r}))
                   * {float(LM_QSCALE)!r}) AS BIGINT) AS lrq
  FROM if_tot t
),
if_arr_occ AS MATERIALIZED (
  SELECT id, u.b AS b FROM if_arr, UNNEST({feats}) AS u(b)
),
if_dsir AS (
  SELECT o.id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(COALESCE(s.lrq, (SELECT lrq FROM if_default))) AS BIGINT)
           AS weight_q
  FROM if_arr_occ o LEFT JOIN if_buckets s ON o.b = s.b
  GROUP BY o.id
)
SELECT a.id,
       NOT s.maybe_present AS is_new,
       g.quality_ok,
       (c.id IS NULL) AS decontam_ok,
       COALESCE({avg} >= {min_avg_logratio!r}, false) AS dsir_ok,
       {avg} AS avg_logratio,
       ((NOT s.maybe_present) AND g.quality_ok AND (c.id IS NULL)
        AND COALESCE({avg} >= {min_avg_logratio!r}, false)) AS admitted
FROM if_arr a
JOIN if_seen s ON a.id = s.id
JOIN if_gopher g ON a.id = g.id
LEFT JOIN if_collide c ON a.id = c.id
LEFT JOIN if_dsir d ON a.id = d.id
"""
