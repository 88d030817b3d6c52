"""Benchmark decontamination — n-gram overlap between a training corpus
and a held-out evaluation set.

The standard pretraining hygiene step (GPT-3 / The Pile style): any
training document sharing at least one 13-gram with a benchmark document
is flagged as contaminated and dropped or audited. This engine expresses
it as a fingerprint equi-join, structurally mirroring the MinHash shingle
machinery (:mod:`rust_triplets_spark.operators.dedup`) but with a
linear-size ``polymix31`` combiner (13-wide ``mix31`` trees are
exponential — see :func:`ngram_fingerprints_col`): each side explodes to
DISTINCT int64 13-gram fingerprints (tokens hashed once, shingles mixed
row-locally — fixed-width join keys, never strings), the benchmark side is
broadcast (real benchmark sets are MBs against a 100 TB corpus), and the
per-document overlap aggregate only sees the sparse matched rows.

Scale shape: one broadcast hash join on an int64 key + one partial-agg
groupBy over matched rows only + one broadcast join back onto the corpus
ids. The corpus never shuffles its text; the only wide exchange carries
``(id, 2 longs)`` for documents that matched at all. A fingerprint
collision maps both engines to the same collision, so the DuckDB twin
hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_col, hash31_sql

NGRAM_N = 13  # the GPT-3/Pile convention
DECONTAM_SEED = 1301


def ngram_fingerprints_col(text_col, n: int, seed: int = DECONTAM_SEED) -> Column:
    """DISTINCT polymix31 n-gram fingerprints — the shared machinery of
    :func:`~rust_triplets_spark.operators.dedup.ngram_fingerprint_array_col`
    with the wide-``n`` combiner (mix31's tree doubles per part; at n=13 it
    never finishes planning)."""
    from rust_triplets_spark.operators.dedup import ngram_fingerprint_array_col

    return ngram_fingerprint_array_col(text_col, n, seed, "polymix31", distinct=True)


def _with_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, seed: int = DECONTAM_SEED
) -> DataFrame:
    """(id, shingle) exploded form of :func:`ngram_fingerprints_col`."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(ngram_fingerprints_col(text_col, n, seed)).alias("shingle"),
    )


def _ngrams_sql(text_sql: str, n: int, seed: int = DECONTAM_SEED) -> str:
    from rust_triplets_spark.operators.dedup import ngram_fingerprint_array_sql

    return ngram_fingerprint_array_sql(text_sql, n, seed, "polymix31", distinct=True)


def decontaminate(
    train: DataFrame,
    evaldf: DataFrame,
    id_col: str,
    text_col: str,
    n: int = NGRAM_N,
    seed: int = DECONTAM_SEED,
) -> DataFrame:
    """Per-training-document contamination report against ``evaldf``.

    Returns one row per training document: ``(id, n_matched_ngrams,
    n_eval_docs, contaminated)`` — how many distinct n-gram fingerprints
    it shares with the eval set, how many distinct eval documents those
    hits touch, and the ≥1-shared-n-gram flag. Documents shorter than
    ``n`` tokens have no shingles and are trivially clean.
    """
    ev = (
        _with_ngrams(evaldf, id_col, text_col, n, seed)
        .withColumnRenamed("id", "eval_id")
    )
    tr = _with_ngrams(train, id_col, text_col, n, seed)
    matched = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle").alias("n_matched_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    # no broadcast hint on `matched`: its size is one row per contaminated
    # training doc — unbounded (a boilerplate 13-gram inside one benchmark
    # doc can flag a large corpus slice). The join key is (id, 2 longs),
    # exactly the narrow exchange the design intends; let AQE broadcast it
    # when it actually is small.
    ids = train.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(matched, "id", "left").select(
        "id",
        F.coalesce("n_matched_ngrams", F.lit(0)).cast("long").alias("n_matched_ngrams"),
        F.coalesce("n_eval_docs", F.lit(0)).cast("long").alias("n_eval_docs"),
        (F.coalesce("n_matched_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate_sql(
    train_sql: str,
    eval_sql: str,
    id_sql: str,
    text_sql: str,
    n: int = NGRAM_N,
    seed: int = DECONTAM_SEED,
) -> str:
    """DuckDB twin of :func:`decontaminate`. ``train_sql`` / ``eval_sql``
    are full SELECT statements producing the two corpora."""
    sh = _ngrams_sql(text_sql, n, seed)
    # train bound ONCE as a MATERIALIZED CTE (referenced by the shingle
    # explode AND the final left join — DuckDB would otherwise inline and
    # evaluate the subquery twice); matched's key gets a private alias so
    # a corpus whose id column is literally named `id` still binds
    # the final join binds ids from a dedicated projection CTE rather
    # than re-evaluating `t.{id_sql}`: qualifying an EXPRESSION id with
    # the table alias (t.CAST(...)) is invalid SQL, so only a bare
    # column name would have worked in the previous form
    return f"""
WITH train_in AS MATERIALIZED ({train_sql}),
train_ids AS (
  SELECT CAST({id_sql} AS BIGINT) AS id FROM train_in t
),
tr AS (
  SELECT CAST({id_sql} AS BIGINT) AS id, s.shingle
  FROM train_in t, UNNEST({sh}) AS s(shingle)
), ev AS (
  SELECT CAST({id_sql} AS BIGINT) AS eval_id, s.shingle
  FROM ({eval_sql}) e, UNNEST({sh}) AS s(shingle)
), matched AS (
  SELECT tr.id AS __mid,
         count(DISTINCT tr.shingle) AS n_matched_ngrams,
         count(DISTINCT ev.eval_id) AS n_eval_docs
  FROM tr JOIN ev USING (shingle)
  GROUP BY tr.id
)
SELECT i.id,
       CAST(COALESCE(m.n_matched_ngrams, 0) AS BIGINT) AS n_matched_ngrams,
       CAST(COALESCE(m.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
       COALESCE(m.n_matched_ngrams, 0) > 0 AS contaminated
FROM train_ids i LEFT JOIN matched m ON i.id = m.__mid
"""


def eval_holdout_pred_col(id_col: str, mod: int = 50, pick: int = 0,
                          seed: int = NGRAM_N) -> Column:
    """Deterministic pseudo-benchmark membership: ``hash31(id) % mod ==
    pick``. Stands in for a real benchmark table in self-contained tests
    and the driver query; production callers pass an actual eval corpus."""
    return F.pmod(hash31_col(F.col(id_col).cast("long"), seed), F.lit(mod)) == F.lit(pick)


def eval_holdout_pred_sql(id_sql: str, mod: int = 50, pick: int = 0,
                          seed: int = NGRAM_N) -> str:
    """DuckDB twin of :func:`eval_holdout_pred_col`."""
    return f"({hash31_sql(f'CAST({id_sql} AS BIGINT)', seed)} % {mod}) = {pick}"


# ---------------------------------------------------------------------------
# Fuzzy (MinHash) decontamination — near-duplicate overlap, not just exact
# n-gram hits. An eval document paraphrased or lightly edited into the
# training set shares few exact 13-grams but keeps a high shingle-Jaccard;
# this is the standard second line of benchmark hygiene (the same LSH
# machinery the dedup family uses, pointed ACROSS corpora).
# ---------------------------------------------------------------------------


def fuzzy_decontaminate(
    train: DataFrame,
    evaldf: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int | None = None,
) -> DataFrame:
    """Per-training-document NEAR-DUP contamination report vs ``evaldf``.

    Returns one row per training document: ``(id, n_candidates,
    n_eval_matches, max_est_jaccard, contaminated)`` — LSH band-bucket
    candidates, how many eval documents estimate Jaccard ≥ ``threshold``,
    the best estimate (0.0 when no candidate), and the flag. The estimate
    is the classic MinHash one: the fraction of the ``num_hashes``
    signature slots that agree — with the default 32 hashes every
    estimate is an exact dyadic rational (n/32), so the DuckDB twin
    hash-matches bit-for-bit.

    Scale shape: signatures are linear per side and computed ONCE each
    (scope-cached); the cross-side join runs on (band, sig) int64 buckets
    — the eval side is benchmark-sized (MBs against a 100 TB corpus), so
    AQE broadcasts it; candidate verification joins fixed-width signature
    rows by id, never text. Unlike the self-join dedup family there is no
    a<b asymmetry: every (train, eval) bucket collision is a candidate.
    """
    from rust_triplets_spark.functions.caching import cache_scoped
    from rust_triplets_spark.functions.hashing import mix31_col
    from rust_triplets_spark.operators.dedup import (
        BAND_SEED,
        MINHASH_SEED,
        minhash_signatures,
    )

    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    r = num_hashes // bands
    mh_seed = MINHASH_SEED if seed is None else seed

    def _sigs(df: DataFrame, scope: str) -> DataFrame:
        return cache_scoped(
            minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, mh_seed),
            scope, eager=True,
        )

    def _banded(sigs: DataFrame) -> DataFrame:
        band_sig_cols = [
            mix31_col(
                [F.col(f"mh_{b * r + j}") for j in range(r)], BAND_SEED + b
            ).alias(f"__sig_{b}")
            for b in range(bands)
        ]
        band_structs = [
            F.struct(F.lit(b).alias("band"), F.col(f"__sig_{b}").alias("sig"))
            for b in range(bands)
        ]
        return (
            sigs.select("id", *band_sig_cols)
            .select("id", F.explode(F.array(*band_structs)).alias("__b"))
            .select("id", F.col("__b.band").alias("band"), F.col("__b.sig").alias("sig"))
        )

    tr_sigs = _sigs(train, "decontam.fuzzy_tr_sigs")
    ev_sigs = _sigs(evaldf, "decontam.fuzzy_ev_sigs")
    cands = (
        _banded(tr_sigs)
        .join(
            _banded(ev_sigs).select(
                F.col("id").alias("eval_id"), "band", "sig"
            ),
            ["band", "sig"],
        )
        .select("id", "eval_id")
        .distinct()
    )
    n_eq = sum(
        F.when(F.col(f"t.mh_{i}") == F.col(f"e.mh_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (
        cands.alias("c")
        .join(tr_sigs.alias("t"), F.col("c.id") == F.col("t.id"))
        .join(ev_sigs.alias("e"), F.col("c.eval_id") == F.col("e.id"))
        .select(
            F.col("c.id").alias("id"),
            F.col("c.eval_id").alias("eval_id"),
            (n_eq.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    report = est.groupBy("id").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.sum(
            F.when(F.col("est_jaccard") >= F.lit(threshold), 1).otherwise(0)
        ).cast("long").alias("n_eval_matches"),
        F.max("est_jaccard").alias("max_est_jaccard"),
    )
    ids = train.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(report, "id", "left").select(
        "id",
        F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce("n_eval_matches", F.lit(0)).cast("long").alias("n_eval_matches"),
        F.coalesce("max_est_jaccard", F.lit(0.0)).alias("max_est_jaccard"),
        (F.coalesce("n_eval_matches", F.lit(0)) > 0).alias("contaminated"),
    )


def fuzzy_decontaminate_sql(
    train_sql: str,
    eval_sql: str,
    id_sql: str,
    text_sql: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int | None = None,
) -> str:
    """DuckDB twin of :func:`fuzzy_decontaminate`. ``train_sql`` /
    ``eval_sql`` are full SELECT statements producing the two corpora."""
    from rust_triplets_spark.functions.hashing import mix31_sql
    from rust_triplets_spark.operators.dedup import (
        BAND_SEED,
        MINHASH_SEED,
        minhash_signatures_sql,
    )

    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    r = num_hashes // bands
    mh_seed = MINHASH_SEED if seed is None else seed
    tr_sigs = minhash_signatures_sql(
        f"({train_sql}) t", id_sql, text_sql, num_hashes, shingle_n, mh_seed
    )
    ev_sigs = minhash_signatures_sql(
        f"({eval_sql}) e", id_sql, text_sql, num_hashes, shingle_n, mh_seed
    )

    def _banded(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, "
            f"{mix31_sql([f'mh_{b * r + j}' for j in range(r)], BAND_SEED + b)}"
            f" AS sig FROM {src}"
            for b in range(bands)
        )

    n_eq = " + ".join(
        f"CAST(t.mh_{i} = e.mh_{i} AS INT)" for i in range(num_hashes)
    )
    return f"""
WITH fz_tr_sigs AS MATERIALIZED ({tr_sigs}),
fz_ev_sigs AS MATERIALIZED ({ev_sigs}),
fz_tr_band AS MATERIALIZED ({_banded('fz_tr_sigs')}),
fz_ev_band AS MATERIALIZED ({_banded('fz_ev_sigs')}),
fz_cands AS (
  SELECT DISTINCT l.id AS id, rr.id AS eval_id
  FROM fz_tr_band l JOIN fz_ev_band rr ON l.band = rr.band AND l.sig = rr.sig
),
fz_est AS (
  SELECT c.id, c.eval_id,
         CAST(({n_eq}) AS DOUBLE) / {float(num_hashes)} AS est_jaccard
  FROM fz_cands c
  JOIN fz_tr_sigs t ON c.id = t.id
  JOIN fz_ev_sigs e ON c.eval_id = e.id
),
fz_report AS (
  SELECT id,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CAST(est_jaccard >= {threshold} AS INT)) AS BIGINT)
           AS n_eval_matches,
         max(est_jaccard) AS max_est_jaccard
  FROM fz_est GROUP BY id
),
fz_ids AS (SELECT CAST({id_sql} AS BIGINT) AS id FROM ({train_sql}) t)
SELECT i.id,
       CAST(COALESCE(r.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(r.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       COALESCE(r.max_est_jaccard, 0.0) AS max_est_jaccard,
       COALESCE(r.n_eval_matches, 0) > 0 AS contaminated
FROM fz_ids i LEFT JOIN fz_report r ON i.id = r.id
"""


# ---------------------------------------------------------------------------
# Graded contamination — the FRACTION of a document's n-grams that hit the
# eval set, not just the ≥1-hit flag. The binary flag is the right drop
# gate for exact benchmark copies, but curation pipelines also want a
# graded score: audit tiers (drop > 0.8, review > 0.2, keep otherwise),
# contamination-weighted loss masking, and corpus-level contamination
# budgets all consume the fraction.
# ---------------------------------------------------------------------------


def contamination_fraction(
    train: DataFrame,
    evaldf: DataFrame,
    id_col: str,
    text_col: str,
    n: int = NGRAM_N,
    seed: int = DECONTAM_SEED,
) -> DataFrame:
    """Per-training-document graded contamination vs ``evaldf``.

    ``(id, n_matched_ngrams, n_total_ngrams, contamination_frac)`` for
    every training document: distinct n-gram fingerprints shared with the
    eval set, the document's own distinct fingerprint count, and their
    ratio (0.0 for documents shorter than ``n`` tokens). The fraction is
    ONE integer division — IEEE-identical cross-engine.

    Scale shape: the exploded train-shingle frame feeds both the per-doc
    total and the matched count, so it is scope-cached (one token-scale
    materialization, two partial-agg scans). The eval side collapses to
    DISTINCT fingerprints before broadcasting — benchmark sets are MBs
    against a 100 TB corpus, and deduping eval-side shingles keeps the
    matched count a plain ``count(*)`` instead of a countDistinct.
    """
    from rust_triplets_spark.functions.caching import cache_scoped

    tr = cache_scoped(
        _with_ngrams(train, id_col, text_col, n, seed),
        "decontam.frac_train_shingles",
        eager=True,  # feeds the totals agg AND the matched join
    )
    totals = tr.groupBy("id").agg(F.count("*").cast("long").alias("n_total_ngrams"))
    ev = (
        _with_ngrams(evaldf, id_col, text_col, n, seed)
        .select("shingle")
        .distinct()
    )
    matched = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_matched_ngrams"))
    )
    ids = train.select(F.col(id_col).cast("long").alias("id"))
    return (
        ids.join(totals, "id", "left")
        .join(matched, "id", "left")
        .select(
            "id",
            F.coalesce("n_matched_ngrams", F.lit(0)).cast("long").alias("n_matched_ngrams"),
            F.coalesce("n_total_ngrams", F.lit(0)).cast("long").alias("n_total_ngrams"),
            F.when(
                F.coalesce("n_total_ngrams", F.lit(0)) > 0,
                F.coalesce("n_matched_ngrams", F.lit(0)).cast("double")
                / F.col("n_total_ngrams").cast("double"),
            ).otherwise(F.lit(0.0)).alias("contamination_frac"),
        )
    )


def contamination_fraction_sql(
    train_sql: str,
    eval_sql: str,
    id_sql: str,
    text_sql: str,
    n: int = NGRAM_N,
    seed: int = DECONTAM_SEED,
) -> str:
    """DuckDB twin of :func:`contamination_fraction`."""
    sh = _ngrams_sql(text_sql, n, seed)
    return f"""
WITH cf_train AS MATERIALIZED ({train_sql}),
cf_ids AS (SELECT CAST({id_sql} AS BIGINT) AS id FROM cf_train t),
cf_tr AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, s.shingle
  FROM cf_train t, UNNEST({sh}) AS s(shingle)
),
cf_tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_total_ngrams FROM cf_tr GROUP BY id),
cf_ev AS (
  SELECT DISTINCT s.shingle
  FROM ({eval_sql}) e, UNNEST({sh}) AS s(shingle)
),
cf_matched AS (
  SELECT t.id, CAST(count(*) AS BIGINT) AS n_matched_ngrams
  FROM cf_tr t JOIN cf_ev USING (shingle)
  GROUP BY t.id
)
SELECT i.id,
       CAST(COALESCE(m.n_matched_ngrams, 0) AS BIGINT) AS n_matched_ngrams,
       CAST(COALESCE(tt.n_total_ngrams, 0) AS BIGINT) AS n_total_ngrams,
       CASE WHEN COALESCE(tt.n_total_ngrams, 0) > 0
            THEN CAST(COALESCE(m.n_matched_ngrams, 0) AS DOUBLE)
                 / CAST(tt.n_total_ngrams AS DOUBLE)
            ELSE 0.0 END AS contamination_frac
FROM cf_ids i
LEFT JOIN cf_tot tt ON i.id = tt.id
LEFT JOIN cf_matched m ON i.id = m.id
"""
