"""Deterministic cardinality sketches (KMV / k-minimum-values).

At 100 TB, "how many distinct tokens / urls / shingles per source" is a
sizing input for everything downstream (vocabulary joins, stop-term
thresholds, LSH band budgets) — but an exact per-group countDistinct
shuffles every distinct value. The classic bounded-state answer is a
sketch. Spark's built-in ``approx_count_distinct`` is HyperLogLog++ —
partial-aggregable but NOT reproducible across engines (binary-specific
hashing), so it can't be oracle-checked. KMV (Bar-Yossef et al. 2002) is
the sketch that CAN: keep the k smallest values of a uniform hash; with
``U_(k)`` the k-th smallest as a fraction of hash space, the unbiased
estimate is ``(k-1) / U_(k)``. Every input to that division is an exact
integer here (hash31 values on the [0, M31) grid), so the estimate is
bit-identical across engines — a deterministic, mergeable, exactly
auditable cardinality summary.

Scale shape: the (group, hash) DISTINCT is vocabulary-shaped after
map-side partial aggregation; the k-smallest pass is a per-group rank
window over that deduplicated frame. This is the audit-grade exact-rank
trade documented at ``quality.group_quantiles`` — for few-giant-group
layouts at full corpus scale, the same sketch folds into a custom
partial aggregate; this declarative form keeps the oracle property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_col,
    hash31_sql,
    hash31_str_col,
    hash31_str_sql,
)
from rust_triplets_spark.functions.text import tokens_col, tokens_sql

KMV_SEED = 3_000_017
KMV_K = 256  # default sketch size: relative error ~ 1/sqrt(k-1) ≈ 6%


def kmv_distinct_tokens(
    df: DataFrame, group_col: str, text_col: str,
    k: int = KMV_K, seed: int = KMV_SEED,
) -> DataFrame:
    """Per-group KMV estimate of the distinct-TOKEN count:
    ``(group, k_used, kth_hash, est_distinct)``.

    ``k_used`` is the number of sketch slots filled (< k means the group
    had fewer distinct hashes than slots — the estimate is then the EXACT
    distinct-hash count and ``kth_hash`` is the largest seen). The
    estimate inherits hash-collision granularity: two distinct tokens on
    the same 31-bit hash count once (identically in both engines)."""
    if k < 2:
        raise ValueError(f"kmv: k must be >= 2, got {k}")
    hashed = df.select(
        F.col(group_col).alias("group"),
        F.explode(
            F.array_distinct(
                F.transform(
                    tokens_col(F.col(text_col)),
                    lambda t: hash31_str_col(t, seed),
                )
            )
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("group").orderBy(F.col("h").asc())
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy("group")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.max("h").cast("long").alias("kth_hash"),
        )
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(M31)) / F.col("kth_hash").cast("double")
    )
    return sk.select("group", "k_used", "kth_hash", est.alias("est_distinct"))


def kmv_distinct_tokens_sql(
    table: str, group_sql: str, text_sql: str,
    k: int = KMV_K, seed: int = KMV_SEED,
) -> str:
    """DuckDB twin of :func:`kmv_distinct_tokens` — same hash grid, same
    rank cut, same exact-integer division."""
    if k < 2:
        raise ValueError(f"kmv: k must be >= 2, got {k}")
    toks = tokens_sql(text_sql)
    th = f"list_distinct(list_transform({toks}, t -> {hash31_str_sql('t', seed)}))"
    return f"""
WITH kmv_hashed AS MATERIALIZED (
  SELECT DISTINCT {group_sql} AS grp, t.h AS h
  FROM {table}, UNNEST({th}) AS t(h)
), kmv_sk AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS k_used,
         CAST(max(h) AS BIGINT) AS kth_hash
  FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM kmv_hashed
  ) WHERE rn <= {k}
  GROUP BY grp
)
SELECT grp AS "group", k_used, kth_hash,
       CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
            ELSE {float(k - 1)!r} * {float(M31)!r} / CAST(kth_hash AS DOUBLE)
       END AS est_distinct
FROM kmv_sk
"""


def kmv_merge(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge per-partition/per-day KMV sketches stored as exploded
    ``(group, h)`` rows back into one sketch per group — the property
    that makes KMV incremental: the union's k smallest hashes are the k
    smallest of the concatenated sketch rows, so daily sketches combine
    without touching the raw corpus. Input: ``(group, h)``; output
    matches :func:`kmv_distinct_tokens`."""
    if k < 2:
        raise ValueError(f"kmv: k must be >= 2, got {k}")
    w = Window.partitionBy("group").orderBy(F.col("h").asc())
    sk = (
        sketches.select("group", "h").distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy("group")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.max("h").cast("long").alias("kth_hash"),
        )
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(M31)) / F.col("kth_hash").cast("double")
    )
    return sk.select("group", "k_used", "kth_hash", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# BPE merge candidates — tokenizer-training step 1 (Sennrich et al. 2016):
# the highest-frequency adjacent symbol pair is the first merge rule. At
# corpus scale this is THE tokenizer-fitting primitive; each subsequent
# merge round re-runs the same count over re-segmented text. The engine's
# job is the distributed pair count + top-k, expressed so Catalyst plans a
# TakeOrderedAndProject (per-partition heaps + one k-row reduce), never a
# global sort.
# ---------------------------------------------------------------------------


def bpe_merge_candidates(
    df: DataFrame, text_col: str, top_k: int = 50
) -> DataFrame:
    """Top-``top_k`` adjacent character pairs within whitespace tokens:
    ``(left, right, pair_count)``, ordered by count desc then pair asc
    (total order → deterministic cross-engine top-k). Row-local pair
    extraction (no per-character explode — one array of pair structs per
    token), one partial-agg groupBy, then limit-k."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # SQL-expr form: F.substring takes only literal start positions, and
    # the per-token pair array must stay row-local (no per-char explode)
    from rust_triplets_spark.functions.text import WS

    # the PINNED whitespace class, not \s: Java's \s includes U+000B
    # etc. where DuckDB's RE2 class would not — the exact divergence the
    # cross-engine contract exists to prevent (functions/text.py module doc)
    ws_sql = WS.replace("\\", "\\\\")
    tok_pairs = F.expr(
        f"flatten(transform("
        f"  filter(split(trim({text_col}), '{ws_sql}'), t -> t <> ''),"
        "  t -> CASE WHEN length(t) >= 2 THEN transform(sequence(1, length(t) - 1),"
        "       i -> struct(substring(t, i, 1) AS l, substring(t, i + 1, 1) AS r))"
        "       ELSE cast(array() as array<struct<l:string,r:string>>) END))"
    )
    pairs = df.select(F.explode(tok_pairs).alias("__p")).select(
        F.col("__p.l").alias("left"), F.col("__p.r").alias("right")
    )
    counted = pairs.groupBy("left", "right").agg(
        F.count("*").cast("long").alias("pair_count")
    )
    return counted.orderBy(
        F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
    ).limit(top_k)


def bpe_merge_candidates_sql(table: str, text_sql: str, top_k: int = 50) -> str:
    """DuckDB twin of :func:`bpe_merge_candidates`."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = tokens_sql(text_sql)
    pairs = (
        f"flatten(list_transform({toks}, t -> "
        f"CASE WHEN length(t) >= 2 THEN list_transform(range(1, length(t) - 1 + 1), "
        f"i -> struct_pack(l := substring(t, i, 1), r := substring(t, i + 1, 1))) "
        f"ELSE [] END))"
    )
    return f"""
SELECT p.pr.l AS "left", p.pr.r AS "right",
       CAST(count(*) AS BIGINT) AS pair_count
FROM {table} t, UNNEST({pairs}) AS p(pr)
GROUP BY 1, 2
ORDER BY pair_count DESC, "left" ASC, "right" ASC
LIMIT {top_k}
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage — the tokenizer-fitting acceptance metric: what
# fraction of each source's token OCCURRENCES does a top-V vocabulary
# cover? (OOV rate = 1 − coverage.) Fitting (bpe_merge_candidates above)
# and auditing (this) are the two halves of the tokenizer loop.
# ---------------------------------------------------------------------------


def vocab_coverage(
    df: DataFrame, group_col: str, text_col: str,
    vocab_size: int = 1000, seed: int = KMV_SEED,
) -> DataFrame:
    """Per-group coverage of the corpus-global top-``vocab_size`` token
    vocabulary: ``(group, total_occurrences, covered_occurrences,
    coverage)``. Tokens are hash31 fingerprints (fixed-width keys;
    same-hash collisions count identically cross-engine); the vocabulary
    is picked by (count desc, fingerprint asc) — a total order, so the
    V-boundary is deterministic. One token-scale explode feeding two
    partial aggs; the vocab frame is ≤ V rows, broadcast. Coverage is
    one exact integer division."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    from rust_triplets_spark.functions.caching import cache_scoped

    occ = cache_scoped(
        df.select(
            F.col(group_col).alias("group"),
            F.explode(
                F.transform(
                    tokens_col(F.col(text_col)),
                    lambda t: hash31_str_col(t, seed),
                )
            ).alias("h"),
        ),
        "sketches.vocab_coverage_occ",
        eager=True,  # feeds the global vocab AND the per-group coverage
    )
    vocab = (
        occ.groupBy("h").agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("h").asc())
        .limit(vocab_size)
        .select("h")
    )
    per_group = occ.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), "h", "left")
    return per_group.groupBy("group").agg(
        F.count("*").cast("long").alias("total_occurrences"),
        F.sum(F.coalesce("__in", F.lit(0))).cast("long").alias("covered_occurrences"),
        (
            F.sum(F.coalesce("__in", F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("coverage"),
    )


def vocab_coverage_sql(
    table: str, group_sql: str, text_sql: str,
    vocab_size: int = 1000, seed: int = KMV_SEED,
) -> str:
    """DuckDB twin of :func:`vocab_coverage`."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, tk -> {hash31_str_sql('tk', seed)})"
    return f"""
WITH vc_occ AS MATERIALIZED (
  SELECT {group_sql} AS grp, u.h AS h
  FROM {table} t, UNNEST({th}) AS u(h)
),
vc_vocab AS (
  SELECT h FROM (
    SELECT h, count(*) AS c FROM vc_occ GROUP BY h
    ORDER BY c DESC, h ASC LIMIT {vocab_size}
  )
)
SELECT o.grp AS "group",
       CAST(count(*) AS BIGINT) AS total_occurrences,
       CAST(sum(CASE WHEN v.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS covered_occurrences,
       CAST(sum(CASE WHEN v.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS coverage
FROM vc_occ o LEFT JOIN vc_vocab v ON o.h = v.h
GROUP BY o.grp
"""


# ---------------------------------------------------------------------------
# TF-IDF domain signature: top-k terms per source weighted by inverse
# source frequency — the "what makes this source different" audit, where
# top_tokens_per_source (raw counts) surfaces the same stop tokens for
# every source. Classic Salton & Buckley 1988 weighting on a quantized
# integer grid so the DuckDB twin matches bit-for-bit.
# ---------------------------------------------------------------------------

TFIDF_QSCALE = 1_000_000_000


def tfidf_top_terms(
    df: DataFrame, group_col: str, text_col: str, k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per group: ``(group, token, tf, df,
    score_q, rk)`` with ``score_q = tf · round(ln((N+1)/(df+1))·QSCALE)``
    (smoothed idf over N groups, integer grid) and rank by (score_q desc,
    token asc) — a total order, deterministic cross-engine.

    Scale shape: one token-scale explode → one partial-aggregable
    (group, token) groupBy; df and N are vocabulary-/O(1)-shaped
    aggregates; the rank window runs over per-group vocabularies, never
    corpus rows (the top_tokens_per_source shape)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (
        df.select(
            F.col(group_col).alias("group"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .groupBy("group", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n_groups = df.select(
        F.countDistinct(group_col).cast("long").alias("__n")
    )
    df_counts = tf.groupBy("token").agg(
        F.countDistinct("group").cast("long").alias("df")
    )
    idf_q = F.round(
        F.log(
            (F.col("__n").cast("double") + 1.0)
            / (F.col("df").cast("double") + 1.0)
        )
        * F.lit(float(TFIDF_QSCALE))
    ).cast("long")
    scored = (
        tf.join(df_counts, "token")
        .crossJoin(F.broadcast(n_groups))
        .withColumn("score_q", (F.col("tf") * idf_q).cast("long"))
    )
    w = Window.partitionBy("group").orderBy(
        F.col("score_q").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("group", "token", "tf", "df", "score_q", "rk")
    )


def tfidf_top_terms_sql(
    table: str, group_sql: str, text_sql: str, k: int = 5,
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = tokens_sql(text_sql)
    q = float(TFIDF_QSCALE)
    return f"""
WITH ti_tf AS MATERIALIZED (
  SELECT {group_sql} AS grp, u.tok AS token, CAST(count(*) AS BIGINT) AS tf
  FROM {table} t, UNNEST({toks}) AS u(tok)
  GROUP BY 1, 2
), ti_n AS (SELECT CAST(count(DISTINCT {group_sql}) AS BIGINT) AS n FROM {table} t),
ti_df AS (
  SELECT token, CAST(count(DISTINCT grp) AS BIGINT) AS df
  FROM ti_tf GROUP BY token
), ti_scored AS (
  SELECT f.grp, f.token, f.tf, d.df,
         CAST(f.tf * CAST(round(ln((CAST(n.n AS DOUBLE) + 1.0)
                                   / (CAST(d.df AS DOUBLE) + 1.0)) * {q!r})
                          AS BIGINT) AS BIGINT) AS score_q
  FROM ti_tf f JOIN ti_df d ON f.token = d.token CROSS JOIN ti_n n
)
SELECT grp AS "group", token, tf, df, score_q,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY grp
                               ORDER BY score_q DESC, token ASC) AS rk
  FROM ti_scored
) WHERE rk <= {int(k)}
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data stream
# summary: the count-min sketch and its applications") — the
# fixed-memory frequency summary next to KMV (distinct counts) and Bloom
# (membership, operators/bloom.py). depth×width int64 cells answer
# "how often did token t occur?" with one-sided error: est >= true
# always, est <= true + 2N/width with probability 1 - 2^-depth.
#
# Scale shape at 100 TB: the sketch build is ONE partial-aggregable
# groupBy over (row, bucket) — depth*width cells TOTAL regardless of
# corpus size (4×64 here; even 8×65536 is <4 MB), always broadcastable;
# the estimate pass joins the vocabulary-scale candidate frame against
# the broadcast cells and takes a min over depth values per token. The
# heavy-hitter cut is an exact integer comparison (count*DEN >= NUM*N);
# no float anywhere, so both engines match bit-for-bit.
# ---------------------------------------------------------------------------

CM_SEED = 7_000_003
CM_DEPTH = 4
CM_WIDTH = 64


def countmin_heavy_hitters(
    df: DataFrame, text_col: str,
    depth: int = CM_DEPTH, width: int = CM_WIDTH,
    phi_num: int = 1, phi_den: int = 150, seed: int = CM_SEED,
) -> DataFrame:
    """Heavy hitters via a Count-Min sketch, with the exact counts kept
    alongside as the audit: ``(token, true_cnt, cm_est, overcount)``
    for every token whose ESTIMATE crosses the phi-fraction threshold
    ``cm_est * phi_den >= phi_num * N`` (N = total token count).
    ``overcount = cm_est - true_cnt >= 0`` is the sketch's one-sided
    error, measured — the fixture-scale width forces real collisions so
    the property is exercised, not vacuous. Row r's hash is the shared
    31-bit string hash under ``seed + r``; bucket = hash % width."""
    if depth < 1 or width < 2:
        raise ValueError(f"countmin: bad depth={depth}/width={width}")
    if phi_num < 1 or phi_den < 1:
        raise ValueError(f"countmin: bad phi {phi_num}/{phi_den}")
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("true_cnt"))
    )
    buckets = F.array(*[
        (hash31_str_col(F.col("token"), seed + r) % width).cast("long")
        for r in range(depth)
    ])
    tb = counts.select(
        "token", "true_cnt",
        F.posexplode(buckets).alias("row", "bucket"),
    )
    cells = tb.groupBy("row", "bucket").agg(
        F.sum("true_cnt").cast("long").alias("cell")
    )
    total = counts.agg(F.sum("true_cnt").cast("long").alias("n_total"))
    est = (
        tb.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("token")
        .agg(
            F.first("true_cnt").alias("true_cnt"),
            F.min("cell").cast("long").alias("cm_est"),
        )
    )
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("cm_est") * phi_den >= phi_num * F.col("n_total"))
        .select(
            "token",
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.col("cm_est").desc(), F.col("token").asc())
    )


def countmin_heavy_hitters_sql(
    table: str, text_sql: str,
    depth: int = CM_DEPTH, width: int = CM_WIDTH,
    phi_num: int = 1, phi_den: int = 150, seed: int = CM_SEED,
) -> str:
    """DuckDB twin of :func:`countmin_heavy_hitters` — same hash grid,
    same cells, same exact-integer threshold."""
    if depth < 1 or width < 2:
        raise ValueError(f"countmin: bad depth={depth}/width={width}")
    if phi_num < 1 or phi_den < 1:
        raise ValueError(f"countmin: bad phi {phi_num}/{phi_den}")
    toks = tokens_sql(text_sql)
    rows = ", ".join(
        f"({r}, {hash31_str_sql('token', seed + r)} % {width})"
        for r in range(depth)
    )
    return f"""
WITH cm_counts AS MATERIALIZED (
  SELECT u.tok AS token, CAST(count(*) AS BIGINT) AS true_cnt
  FROM {table} t, UNNEST({toks}) AS u(tok)
  GROUP BY 1
), cm_tb AS MATERIALIZED (
  SELECT token, true_cnt, b.rb[1] AS rw, CAST(b.rb[2] AS BIGINT) AS bucket
  FROM cm_counts, UNNEST([{rows}]) AS b(rb)
), cm_cells AS (
  SELECT rw, bucket, CAST(sum(true_cnt) AS BIGINT) AS cell
  FROM cm_tb GROUP BY 1, 2
), cm_total AS (
  SELECT CAST(sum(true_cnt) AS BIGINT) AS n_total FROM cm_counts
), cm_est AS (
  SELECT t.token, any_value(t.true_cnt) AS true_cnt,
         CAST(min(c.cell) AS BIGINT) AS cm_est
  FROM cm_tb t JOIN cm_cells c ON t.rw = c.rw AND t.bucket = c.bucket
  GROUP BY t.token
)
SELECT token, true_cnt, cm_est, cm_est - true_cnt AS overcount
FROM cm_est CROSS JOIN cm_total
WHERE cm_est * {phi_den} >= {phi_num} * n_total
ORDER BY cm_est DESC, token ASC
"""


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm") — completes the sketch
# quartet: Bloom (membership), KMV + HLL (distinct), Count-Min
# (frequency). m = 2^p registers each hold the max leading-zero rank
# seen in their hash-suffix stream; registers merge by element-wise max
# (partial aggregation IS the merge, like Count-Min's cells).
#
# Integer-exact estimator: the harmonic mean's Σ 2^-r is computed as the
# exact integer S = Σ 2^(K - r) (K = 24 = the max rank the 31-bit hash
# can produce at p = 8; empty registers contribute 2^K), and the
# estimate is one integer division (ALPHA_Q * m² * 2^K) div (10^6 * S) —
# numerator ≤ 7.2e5 * 6.6e4 * 1.7e7 ≈ 8e17 < 2^63, no float anywhere.
# The standard small-range correction applies (Flajolet §4: raw <= 5m/2
# with empty registers -> linear counting m*ln(m/V)); its single ln is
# integer-quantized on the 1e-6 grid (the tfidf score_q precedent — one
# round(ln*Q) per group, both engines compute the same double from the
# same exact integer ratio). The exact distinct count is kept alongside
# as the measured-error audit column.
#
# Scale shape at 100 TB: one explode + one partial-aggregable
# groupBy(group, bucket) max — the register table is ≤ m rows per group
# regardless of corpus size; the estimate is a per-group fold over ≤ m
# rows. Nothing collects.
# ---------------------------------------------------------------------------

HLL_SEED = 9_000_011
HLL_P = 8                      # 2^8 = 256 registers: ~6.5% rel. error
HLL_K = 31 - HLL_P             # suffix bit width; max rank = K + 1
HLL_ALPHA_Q = 718273           # alpha_256 = 0.7213/(1 + 1.079/256), 1e-6 grid


def hll_distinct_tokens(
    df: DataFrame, group_col: str, text_col: str,
    p: int = HLL_P, seed: int = HLL_SEED,
) -> DataFrame:
    """Per-group HLL distinct-token estimate with the exact count kept
    alongside: ``(group, n_filled, s_sum, est_distinct, true_distinct)``
    — ``est_distinct`` on the integer grid (raw HLL estimator),
    ``s_sum`` the exact harmonic-sum numerator (the mergeable summary
    statistic). p is fixed to 8 by the 31-bit hash budget (suffix must
    keep >= 20 bits of rank headroom); other p values are rejected
    loudly rather than silently degrading."""
    if p != 8:
        raise ValueError(f"hll: only p=8 is supported (31-bit hash), got {p}")
    m = 1 << p
    kmax = 31 - p + 1  # rank when the whole suffix is zero
    toks = df.select(
        F.col(group_col).alias("group"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    hashed = toks.select(
        "group",
        "token",
        hash31_str_col(F.col("token"), seed).alias("h"),
    )
    buck = hashed.select(
        "group",
        "token",
        (F.col("h") % m).cast("long").alias("bucket"),
        F.expr(f"h div {m}").cast("long").alias("suffix"),
    )
    rho = F.when(F.col("suffix") == 0, F.lit(kmax)).otherwise(
        F.lit(kmax) - F.length(F.conv(F.col("suffix"), 10, 2))
    ).cast("long")
    regs = (
        buck.select("group", "bucket", rho.alias("rho"))
        .groupBy("group", "bucket")
        .agg(F.max("rho").cast("long").alias("r"))
    )
    per_group = regs.groupBy("group").agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum(F.expr(f"shiftleft(1L, {kmax} - r)")).cast("long").alias("s_fill"),
    )
    truth = toks.groupBy("group").agg(
        F.countDistinct("token").cast("long").alias("true_distinct")
    )
    s_sum = (
        F.col("s_fill")
        + (F.lit(m) - F.col("n_filled")) * F.lit(1 << kmax)
    ).cast("long")
    raw = F.expr(
        f"{HLL_ALPHA_Q} * {m * m}L * {1 << kmax}L div (1000000L * s_sum)"
    ).cast("long")
    v = (F.lit(m) - F.col("n_filled")).cast("long")
    lin = F.expr(
        f"{m}L * cast(round(ln({m} / cast({m} - n_filled as double))"
        f" * 1000000) as bigint) div 1000000L"
    ).cast("long")
    est = F.when((v > 0) & (raw <= (5 * m) // 2), lin).otherwise(raw)
    return (
        per_group.withColumn("s_sum", s_sum)
        .join(truth, "group")
        .select(
            "group",
            "n_filled",
            "s_sum",
            est.alias("est_distinct"),
            "true_distinct",
        )
        .orderBy("group")
    )


def hll_distinct_tokens_sql(
    table: str, group_sql: str, text_sql: str,
    p: int = HLL_P, seed: int = HLL_SEED,
) -> str:
    """DuckDB twin of :func:`hll_distinct_tokens` — same hash grid, same
    integer harmonic sum, same single integer division."""
    if p != 8:
        raise ValueError(f"hll: only p=8 is supported (31-bit hash), got {p}")
    m = 1 << p
    kmax = 31 - p + 1
    toks = tokens_sql(text_sql)
    h = hash31_str_sql("token", seed)
    return f"""
WITH hll_toks AS MATERIALIZED (
  SELECT {group_sql} AS grp, u.tok AS token
  FROM {table} t, UNNEST({toks}) AS u(tok)
), hll_buck AS (
  SELECT grp, {h} % {m} AS bucket, {h} // {m} AS suffix
  FROM hll_toks
), hll_regs AS (
  SELECT grp, bucket,
         CAST(max(CASE WHEN suffix = 0 THEN {kmax}
                       ELSE {kmax} - length(printf('%b', suffix)) END)
              AS BIGINT) AS r
  FROM hll_buck GROUP BY 1, 2
), hll_pg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_filled,
         CAST(sum(CAST(1 AS BIGINT) << ({kmax} - r)) AS BIGINT) AS s_fill
  FROM hll_regs GROUP BY grp
), hll_truth AS (
  SELECT grp, CAST(count(DISTINCT token) AS BIGINT) AS true_distinct
  FROM hll_toks GROUP BY grp
)
SELECT grp AS "group", n_filled, s_sum,
       CASE WHEN {m} - n_filled > 0 AND raw <= {(5 * m) // 2}
            THEN {m} * CAST(round(ln({m} / CAST({m} - n_filled AS DOUBLE))
                                  * 1000000) AS BIGINT) // 1000000
            ELSE raw END AS est_distinct,
       true_distinct
FROM (
  SELECT p.grp, p.n_filled,
         CAST(p.s_fill + ({m} - p.n_filled) * {1 << kmax} AS BIGINT) AS s_sum,
         CAST({HLL_ALPHA_Q * m * m * (1 << kmax)}
              // (1000000 * (p.s_fill + ({m} - p.n_filled) * {1 << kmax}))
              AS BIGINT) AS raw,
         t.true_distinct
  FROM hll_pg p JOIN hll_truth t ON p.grp = t.grp
)
ORDER BY "group"
"""


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch — the quantile member of the sketch family
# (membership: Bloom; distinct: KMV/HLL; frequency: Count-Min). GK/KLL
# summaries are deterministic only in insertion order, so they can never
# hash-match across engines; the bottom-k-by-hash sample CAN: the k rows
# with the smallest (hash31(id), id) per group are an order-independent,
# MERGEABLE uniform sample (union's bottom-k = bottom-k of concatenated
# sketches — the KMV argument verbatim), and exact type-1 quantiles of
# the sample approximate the group quantiles with the standard
# order-statistic error O(1/sqrt(k)). The exact median is kept alongside
# as the measured-error audit (the Count-Min/HLL pattern).
#
# Scale shape: selection is a per-group rank window over (hash, id) —
# the same audit-grade exact-rank trade documented at
# quality.group_quantiles (at few-giant-group full scale the k smallest
# fold into a per-group TakeOrdered partial aggregate; this declarative
# form keeps the oracle property). The sketch itself is k rows per
# group, fixed memory by construction.
# ---------------------------------------------------------------------------

QSK_SEED = 11_000_081
QSK_K = 64
QSK_FRACTIONS = ((1, 4), (1, 2), (3, 4), (9, 10))


def quantile_sketch_bottomk(
    df: DataFrame, group_col: str, value_col: str, id_col: str,
    k: int = QSK_K, seed: int = QSK_SEED,
) -> DataFrame:
    """Per-group quantiles from the bottom-k-by-hash sample, with the
    exact median as the measured-error audit: ``(group, n_total,
    k_used, q_25, q_50, q_75, q_90, q_50_exact, err_50)``. The sample
    is uniform because hash31(id) is uniform on the id population and
    independent of the value column; ties in the value rank need no
    tiebreak beyond id (a tie-run carries one value)."""
    if k < 4:
        raise ValueError(f"qsketch: k must be >= 4, got {k}")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("id"),
        hash31_col(F.col(id_col), seed).alias("h"),
    )
    w_h = Window.partitionBy("grp").orderBy(F.col("h").asc(), F.col("id").asc())
    samp = rows.withColumn("__rn", F.row_number().over(w_h)).where(
        F.col("__rn") <= k
    )
    w_v = Window.partitionBy("grp").orderBy(F.col("v").asc(), F.col("id").asc())
    w_g = Window.partitionBy("grp")
    samp = samp.select(
        "grp", "v",
        F.row_number().over(w_v).alias("vr"),
        F.count("*").over(w_g).alias("k_used"),
    )
    aggs = [F.count("*").cast("long").alias("k_used")]
    for p, q in QSK_FRACTIONS:
        pct = round(100 * p / q)
        idx = F.expr(f"(k_used * {p} + {q - 1}) div {q}")
        aggs.append(
            F.max(F.when(F.col("vr") == idx, F.col("v")))
            .cast("long").alias(f"q_{pct}")
        )
    sk = samp.groupBy("grp").agg(*aggs)
    exact = rows.select(
        "grp", "v",
        F.row_number().over(w_v).alias("vr"),
        F.count("*").over(w_g).alias("n"),
    ).groupBy("grp").agg(
        F.count("*").cast("long").alias("n_total"),
        F.max(
            F.when(F.col("vr") == F.expr("(n + 1) div 2"), F.col("v"))
        ).cast("long").alias("q_50_exact"),
    )
    return (
        sk.join(exact, "grp")
        .select(
            F.col("grp").alias("group"),
            "n_total",
            "k_used",
            "q_25", "q_50", "q_75", "q_90",
            "q_50_exact",
            (F.col("q_50") - F.col("q_50_exact")).alias("err_50"),
        )
        .orderBy("group")
    )


def quantile_sketch_bottomk_sql(
    table: str, group_sql: str, value_sql: str, id_sql: str,
    k: int = QSK_K, seed: int = QSK_SEED,
) -> str:
    """DuckDB twin of :func:`quantile_sketch_bottomk` — same hash rank,
    same exact-integer quantile picks."""
    if k < 4:
        raise ValueError(f"qsketch: k must be >= 4, got {k}")
    h = hash31_sql(id_sql, seed)
    qcols = []
    for p, q in QSK_FRACTIONS:
        pct = round(100 * p / q)
        qcols.append(
            f"CAST(max(CASE WHEN vr = (k_used * {p} + {q - 1}) // {q} "
            f"THEN v END) AS BIGINT) AS q_{pct}"
        )
    return f"""
WITH qsk_rows AS MATERIALIZED (
  SELECT {group_sql} AS grp, CAST({value_sql} AS BIGINT) AS v,
         {id_sql} AS id, {h} AS h
  FROM {table} t WHERE {value_sql} IS NOT NULL
), qsk_samp AS (
  SELECT grp, v,
         row_number() OVER (PARTITION BY grp ORDER BY v, id) AS vr,
         count(*) OVER (PARTITION BY grp) AS k_used
  FROM (
    SELECT grp, v, id,
           row_number() OVER (PARTITION BY grp ORDER BY h, id) AS rn
    FROM qsk_rows
  ) WHERE rn <= {k}
), qsk_sk AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS k_used, {', '.join(qcols)}
  FROM qsk_samp GROUP BY grp
), qsk_exact AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_total,
         CAST(max(CASE WHEN vr = (n + 1) // 2 THEN v END) AS BIGINT)
           AS q_50_exact
  FROM (
    SELECT grp, v,
           row_number() OVER (PARTITION BY grp ORDER BY v, id) AS vr,
           count(*) OVER (PARTITION BY grp) AS n
    FROM qsk_rows
  ) GROUP BY grp
)
SELECT s.grp AS "group", e.n_total, s.k_used,
       s.q_25, s.q_50, s.q_75, s.q_90,
       e.q_50_exact, s.q_50 - e.q_50_exact AS err_50
FROM qsk_sk s JOIN qsk_exact e ON s.grp = e.grp
ORDER BY "group"
"""
