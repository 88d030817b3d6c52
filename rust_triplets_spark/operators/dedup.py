"""Deduplication operators for large-scale training-data pipelines (driver
north star; beyond the reference's own surface — the reference has no dedup
beyond per-batch triplet-id dedup, src/sampler/mod.rs:2604-2611).

All four flavors are built on the portable hash so every pipeline is
oracle-checkable:

- **exact**: hash-groupBy on normalized text — one shuffle, the canonical
  first pass at any scale;
- **MinHash + LSH**: shingle → k minhashes → band signatures → bucket join.
  Candidate generation never compares all pairs: cost is
  O(docs × shingles) + per-bucket joins;
- **SimHash**: 32-bit signature via per-bit weighted majority — one
  groupBy with 32 partial-aggregable sums;
- **n-gram Jaccard**: exact pair similarity over a shared-shingle join —
  quadratic per shingle bucket, so gated by ``max_df`` (drop
  stop-shingles), the standard skew guard at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_col,
    hash31_sql,
    hash31_str_col,
    hash31_str_sql,
    mix31_col,
    mix31_sql,
    mix31_step_col,
    mix31_step_sql,
)
from rust_triplets_spark.functions.text import (
    normalize_inline_whitespace_col,
    normalize_inline_whitespace_sql,
    tokens_col,
    tokens_sql,
)

MINHASH_SEED = 1000
BAND_SEED = 2000
SIMHASH_SEED = 3000


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group by the (hash31, length) FINGERPRINT of the normalized text;
    keep the minimum id as representative. Returns (rep_id, n_dups) per
    distinct fingerprint (n_dups = group size).

    Scale shape: the shuffle key is a fixed-width (int64, int64) pair, not
    the normalized document itself — at corpus scale, shuffling whole
    documents as grouping keys dominates the job. Collision caveat: two
    different texts collide only when BOTH the 31-bit content hash and the
    character length match (~n²/2³¹ expected collisions within one length
    class); a exactness-critical pipeline can re-verify within fingerprint
    groups, but as the first dedup pass the fingerprint is the standard
    trade (and both engines compute the SAME fingerprint, so cross-engine
    parity is unaffected)."""
    norm = normalize_inline_whitespace_col(text_col)
    return (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            hash31_str_col(norm).alias("__h"),
            F.length(norm).cast("long").alias("__len"),
        )
        .groupBy("__h", "__len")
        .agg(
            F.min(F.col("__id")).alias("rep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
        .select("rep_id", "n_dups")
    )


def exact_dedup_sql(table: str, id_sql: str, text_sql: str) -> str:
    norm = normalize_inline_whitespace_sql(text_sql)
    return f"""
SELECT CAST(min({id_sql}) AS BIGINT) AS rep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM {table}
GROUP BY {hash31_str_sql(norm)}, length({norm})
"""


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def ngram_fingerprint_array_col(
    text_col, n: int, seed: int, combiner: str = "mix31", distinct: bool = True
) -> Column:
    """int64 n-gram fingerprints of ``text_col`` as one row-local array
    expression — no explode, no window, no shuffle. An n-gram is the
    FINGERPRINT of n consecutive tokens: each token is hashed exactly once,
    a gram combines its n token hashes. Skipping the string materialization
    (concat + re-hash per gram) keeps downstream explode rows and shuffle
    keys fixed-width integers — the difference between shuffling ~30-byte
    strings and 8-byte longs at corpus scale. A fingerprint collision maps
    both engines to the SAME collision (same hash), so cross-engine parity
    is unaffected.

    This is the ONE implementation behind every n-gram consumer — MinHash
    shingles (``combiner='mix31'``, small n), 13-gram decontamination and
    repetition counting (``combiner='polymix31'`` — mix31's tree DOUBLES
    per part and never finishes planning at n=13; frequency counting also
    passes ``distinct=False`` since it needs every occurrence).

    The per-token hash array is bound ONCE as a lambda variable via the
    1-element-array trick (``transform(array(th_expr), th -> ...)``) —
    mirroring DuckDB's ``list_transform([th], __th -> ...)`` in the SQL
    twin. Writing ``element_at(transform(tokens, hash), i)`` directly is a
    trap: CollapseProject inlines the whole per-token hash transform into
    every element access, an O(n²) expression-tree blowup (measured: the
    optimized plan grew to 60 kB and a 500-doc input stopped finishing).
    The naive exploded formulation (posexplode → window ``lead`` →
    dropDuplicates → groupBy) was also measured and rejected: three wide
    shuffles of token-scale rows per consumer, 45 s at sf0.1 vs ~2 s for
    this shape."""
    from rust_triplets_spark.functions.hashing import polymix31_col

    if combiner not in ("mix31", "polymix31"):
        # the two are NOT value-compatible — a silent fallback would
        # corrupt every downstream fingerprint with no diagnostic
        raise ValueError(f"unknown combiner {combiner!r}")
    mix = mix31_col if combiner == "mix31" else polymix31_col
    th_expr = F.transform(tokens_col(_c(text_col)), lambda t: hash31_str_col(t, seed))

    def shingles(th):
        k = F.size(th) - (n - 1)
        gen = F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: mix([F.element_at(th, i + j) for j in range(n)], seed),
        )
        if distinct:
            gen = F.array_distinct(gen)
        return F.when(k > 0, gen).otherwise(F.array().cast("array<bigint>"))

    return F.flatten(F.transform(F.array(th_expr), shingles))


def ngram_fingerprint_array_sql(
    text_sql: str, n: int, seed: int, combiner: str = "mix31", distinct: bool = True
) -> str:
    """DuckDB twin of :func:`ngram_fingerprint_array_col` — the token-hash
    list is bound once via list_transform over a 1-element list (DuckDB
    has no scalar lambda-let; inlining __th per gram element would re-hash
    every token per gram)."""
    from rust_triplets_spark.functions.hashing import polymix31_sql

    if combiner not in ("mix31", "polymix31"):
        raise ValueError(f"unknown combiner {combiner!r}")
    mix_sql = mix31_sql if combiner == "mix31" else polymix31_sql
    toks = tokens_sql(text_sql)
    th = f"list_transform({toks}, t -> {hash31_str_sql('t', seed)})"
    mix = mix_sql([f"(__th)[i + {j}]" for j in range(n)], seed)
    gen = f"list_transform(range(1, len(__th) - {n - 1} + 1), i -> {mix})"
    if distinct:
        gen = f"list_distinct({gen})"
    return (
        f"flatten(list_transform([{th}], __th -> "
        f"CASE WHEN len(__th) - {n - 1} > 0 THEN {gen} ELSE [] END))"
    )


def shingle_fingerprints_col(text_col, n: int, seed: int = MINHASH_SEED) -> Column:
    """MinHash's distinct mix31 shingles (see
    :func:`ngram_fingerprint_array_col`)."""
    return ngram_fingerprint_array_col(text_col, n, seed, "mix31", distinct=True)


def _with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, seed: int = MINHASH_SEED
) -> DataFrame:
    """(id, shingle) exploded form of :func:`shingle_fingerprints_col`
    (already distinct per doc; docs with < n tokens produce no rows)."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(shingle_fingerprints_col(F.col(text_col), n, seed)).alias("shingle"),
    )


def _shingles_sql(text_sql: str, n: int, seed: int = MINHASH_SEED) -> str:
    return ngram_fingerprint_array_sql(text_sql, n, seed, "mix31", distinct=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 16, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> DataFrame:
    """(id, mh_0 … mh_{k-1}): per-doc minimum of the i-th shingle hash.

    Shape: ONE explode of the row-local shingle-fingerprint array (the
    generator evaluates the array expression once per doc) → ONE groupBy
    with k partial-aggregable mins (map-side combine shrinks the shuffle
    to ≤ one row per doc per partition; the min/mix arithmetic runs in
    whole-stage codegen). A pure array-expression formulation (k ×
    ``array_min(transform(...))`` columns) was measured and rejected:
    higher-order functions are CodegenFallback — interpreted, no common-
    subexpression elimination — so every signature column re-evaluated the
    whole shingle pipeline (33× recompute, 41 s at sf0.1 vs ~3 s here).
    Docs with < shingle_n tokens have no shingles and produce no row.

    The shared ``hash31(shingle)`` prefix is hoisted into one projected
    column so each of the k aggregates folds a single step from it
    (identical values via ``mix31_step``, k× smaller codegen unit)."""
    return _minhash_sig_agg(df, id_col, text_col, (), num_hashes, shingle_n, seed)


def _minhash_sig_agg(
    df: DataFrame, id_col: str, text_col: str, carry_cols: tuple[str, ...],
    num_hashes: int, shingle_n: int, seed: int,
) -> DataFrame:
    """The ONE implementation of the explode → hash-hoist → k-min
    aggregate (see :func:`minhash_signatures` for the measured rationale
    behind this exact shape), parameterized by extra grouping columns so
    the source-partitioned index variant cannot drift from it."""
    sh = df.select(
        *[F.col(c) for c in carry_cols],
        F.col(id_col).cast("long").alias("id"),
        F.explode(shingle_fingerprints_col(F.col(text_col), shingle_n, seed)).alias(
            "shingle"
        ),
    ).select(*carry_cols, "id", hash31_col("shingle", seed).alias("__h0"))
    aggs = [
        F.min(mix31_step_col(F.col("__h0"), F.lit(i), seed)).cast("long").alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(*carry_cols, "id").agg(*aggs)


def minhash_signatures_sql(
    table: str, id_sql: str, text_sql: str,
    num_hashes: int = 16, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> str:
    aggs = ", ".join(
        f"CAST(min({mix31_step_sql('h0', str(i), seed)}) AS BIGINT) AS mh_{i}"
        for i in range(num_hashes)
    )
    return f"""
WITH sh AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {hash31_sql('s.shingle', seed)} AS h0
  FROM {table}, UNNEST({_shingles_sql(text_sql, shingle_n, seed)}) AS s(shingle)
)
SELECT id, {aggs} FROM sh GROUP BY id
"""


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing ≥ 1 LSH band bucket.

    Default 32 hashes in 8 bands of 4: S-curve threshold (1/b)^(1/r) ≈ 0.59
    with ~0.5% miss probability at Jaccard 0.83 (vs ~7% for 4 bands of 4 —
    a near-dup pair should not hinge on one lucky band)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    from rust_triplets_spark.functions.caching import cache_scoped

    # two-level eager cache. Level 1: the signature aggregate — its build
    # keeps the shingle pipeline inside codegen (persisting a frame whose
    # lineage ENDS in the higher-order shingle expressions instead
    # re-evaluates them interpreted during the columnar cache build:
    # measured 24 s vs 4 s at sf0.1). Level 2: the banded explode FROM the
    # cached signatures — the frame both self-join sides consume, so the
    # CodegenFallback band-mix Generate runs once, not per side per action.
    sigs = cache_scoped(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed),
        "dedup.minhash_sigs", eager=True,
    )
    # ONE explode over per-band structs, not a union of per-band selects —
    # a union re-evaluates the signature lineage once per band (and the
    # self-join below doubles that again); this frame is a single pass.
    # The band sigs are computed in a PROJECT before the explode, one
    # column each: a chained mix31 duplicates its accumulator subtree at
    # every `h ^ (h >> 15)` step, so inlining all 8 band chains inside the
    # Generate's array(struct(...)) expression exceeded janino's 64 KB
    # method limit and dropped the whole banded stage to interpreted
    # execution (the one codegen fallback in the repo's hot paths). As
    # separate projection columns each chain compiles in its own codegen
    # unit and the Generate explodes plain column references.
    band_sig_cols = [
        mix31_col([F.col(f"mh_{b * r + j}") for j in range(r)], BAND_SEED + b).alias(
            f"__sig_{b}"
        )
        for b in range(bands)
    ]
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"__sig_{b}").alias("sig"))
        for b in range(bands)
    ]
    banded = cache_scoped(
        sigs.select("id", *band_sig_cols)
        .select("id", F.explode(F.array(*band_structs)).alias("__b"))
        .select("id", F.col("__b.band").alias("band"), F.col("__b.sig").alias("sig")),
        "dedup.minhash_banded", eager=True,
    )
    left = banded.select("band", "sig", F.col("id").alias("a"))
    right = banded.select("band", "sig", F.col("id").alias("b"))
    return (
        left.join(right, ["band", "sig"], "inner")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs_sql(
    table: str, id_sql: str, text_sql: str,
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> str:
    r = num_hashes // bands
    sig_sql = minhash_signatures_sql(table, id_sql, text_sql, num_hashes, shingle_n, seed)
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        f"{mix31_sql([f'mh_{b * r + j}' for j in range(r)], BAND_SEED + b)} AS sig FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH sigs AS MATERIALIZED ({sig_sql}),
banded AS MATERIALIZED ({band_selects})
SELECT DISTINCT l.id AS a, r.id AS b
FROM banded l JOIN banded r ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, seed: int = SIMHASH_SEED
) -> DataFrame:
    """(id, simhash): per-bit weighted majority over token hashes (token
    multiplicity counts, classic Charikar simhash)."""
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).withColumn("__h", hash31_str_col("tok", seed))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select("id", sig.alias("simhash"))


def simhash_sql(
    table: str, id_sql: str, text_sql: str, bits: int = 32, seed: int = SIMHASH_SEED
) -> str:
    h = hash31_str_sql("t.tok", seed)
    bit_sums = ", ".join(
        f"sum(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {h} AS hh
  FROM {table}, UNNEST({tokens_sql(text_sql)}) AS t(tok)
), agg AS (SELECT id, {bit_sums} FROM toks GROUP BY id)
SELECT id, {sig} AS simhash FROM agg
"""


def simhash_band_pairs(
    df: DataFrame, id_col: str, text_col: str,
    bits: int = 32, bands: int = 4, seed: int = SIMHASH_SEED,
    max_bucket: int = 1000,
) -> DataFrame:
    """SimHash near-duplicate candidates: split each signature into
    ``bands`` equal bit-bands; pairs (a < b) sharing ≥ 1 exact band are
    candidates (Hamming distance ≤ bits - bits/bands guaranteed to be
    caught when distance < bands). Returns (a, b, hamming) distinct.

    Scale shape: band explode + equi-join on (band, value). ``max_bucket``
    is the stop-band guard (the :func:`ngram_jaccard_pairs` ``max_df``
    analog): a (band, value) bucket holding more than ``max_bucket`` docs
    contributes bucket² pairs while carrying no discriminative signal —
    low-entropy corpora (boilerplate-heavy, tiny vocabularies) routinely
    produce such heavy-hitter band values, and one of them turns the
    linear index quadratic (the sf1 scale run produced 336M candidate
    pairs from exactly this, SCALE.md). Oversized buckets are pulled out
    of the self-join BEFORE it runs; instead of disappearing (which would
    let exactly the heaviest duplicate families escape detection — a doc
    family large enough to saturate EVERY band would yield zero pairs),
    each doc in an oversized bucket is paired with the bucket's min-id
    representative. That keeps the family connected (downstream
    connected-components recovers the full cluster through the hub) at
    ``bucket - 1`` pairs per bucket instead of ``bucket²``. Guard disabled
    with ``max_bucket=None``.

    Residual recall caveat (not lossless): hub pairs carry the SAME
    ``hamming`` column as clique pairs and are filtered by whatever
    threshold the caller applies downstream. Two members of an oversized
    bucket at hamming 0 from each other but > threshold from the min-id
    rep lose their connection (the full self-join would have paired them
    directly). Callers applying tight hamming cutoffs over low-entropy
    corpora should raise ``max_bucket`` rather than rely on the chain."""
    if bits % bands:
        raise ValueError("bits must divide into equal bands")
    r = bits // bands
    mask = (1 << r) - 1
    from rust_triplets_spark.functions.caching import cache_scoped

    # two-level eager cache (see minhash_lsh_pairs): the signature
    # aggregate builds inside codegen, then the banded explode — the frame
    # both self-join sides consume — materializes from the cached sigs
    sigs = cache_scoped(
        simhash(df, id_col, text_col, bits, seed), "dedup.simhash_sigs", eager=True
    )
    banded = cache_scoped(
        sigs.select(
            "id", "simhash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * r).bitwiseAND(F.lit(mask)).alias("val"),
                    )
                    for b in range(bands)
                ])
            ).alias("__b"),
        ).select("id", "simhash", F.col("__b.band").alias("band"), F.col("__b.val").alias("val")),
        "dedup.simhash_banded", eager=True,
    )
    chain = None
    if max_bucket is not None:
        # stop-band guard: aggregate + broadcast semi-filter, not a window
        # (the banded frame is corpus x bands — a count window would
        # re-shuffle it; the distinct (band, val) frame is tiny)
        stats = (
            banded.groupBy("band", "val")
            .agg(F.count("*").alias("__bc"), F.min("id").alias("__rep"))
        )
        keep = stats.where(F.col("__bc") <= max_bucket).select("band", "val")
        big = stats.where(F.col("__bc") > max_bucket).select("band", "val", "__rep")
        # representative chain for mega-buckets: attach the rep's signature
        # (broadcast the tiny bucket list into the cached sigs, result is
        # one row per oversized bucket), then broadcast THAT into the
        # banded frame — linear, never bucket².  __rep = min(id) < id, so
        # (a, b) ordering holds by construction.
        big_rep = sigs.select(
            F.col("id").alias("__rep"), F.col("simhash").alias("__repsig")
        ).join(F.broadcast(big), "__rep")
        chain = (
            banded.join(F.broadcast(big_rep), ["band", "val"])
            .where(F.col("id") != F.col("__rep"))
            .select(
                F.col("__rep").alias("a"),
                F.col("id").alias("b"),
                F.bit_count(
                    F.col("__repsig").bitwiseXOR(F.col("simhash"))
                ).cast("long").alias("hamming"),
            )
        )
        banded = banded.join(F.broadcast(keep), ["band", "val"], "left_semi")
    left = banded.select("band", "val", F.col("id").alias("a"), F.col("simhash").alias("__sa"))
    right = banded.select("band", "val", F.col("id").alias("b"), F.col("simhash").alias("__sb"))
    pairs = (
        left.join(right, ["band", "val"], "inner")
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("long").alias("hamming"),
        )
    )
    if chain is not None:
        pairs = pairs.unionByName(chain)
    return pairs.distinct()


def simhash_band_pairs_sql(
    table: str, id_sql: str, text_sql: str,
    bits: int = 32, bands: int = 4, seed: int = SIMHASH_SEED,
    max_bucket: int = 1000,
) -> str:
    r = bits // bands
    mask = (1 << r) - 1
    sig_sql = simhash_sql(table, id_sql, text_sql, bits, seed)
    band_selects = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band, (simhash >> {b * r}) & {mask} AS val FROM sigs"
        for b in range(bands)
    )
    if max_bucket is None:
        return f"""
WITH sigs AS MATERIALIZED ({sig_sql}),
banded AS MATERIALIZED ({band_selects})
SELECT DISTINCT l.id AS a, r.id AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
FROM banded l JOIN banded r ON l.band = r.band AND l.val = r.val AND l.id < r.id
"""
    # guarded: small buckets full self-join; oversized buckets contribute a
    # min-id representative chain (rep, id) instead of bucket² pairs —
    # mirrors the Spark side exactly.
    return f"""
WITH sigs AS MATERIALIZED ({sig_sql}),
banded AS MATERIALIZED ({band_selects}),
stats AS MATERIALIZED (
  SELECT band, val, count(*) AS bc, min(id) AS rep
  FROM banded GROUP BY band, val),
banded_f AS MATERIALIZED (
  SELECT b.id, b.simhash, b.band, b.val
  FROM banded b JOIN stats s
    ON b.band = s.band AND b.val = s.val AND s.bc <= {max_bucket}),
chain AS (
  SELECT s.rep AS a, b.id AS b,
         CAST(bit_count(xor(rs.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM banded b
  JOIN stats s ON b.band = s.band AND b.val = s.val AND s.bc > {max_bucket}
  JOIN sigs rs ON rs.id = s.rep
  WHERE b.id <> s.rep)
SELECT DISTINCT a, b, hamming FROM (
  SELECT l.id AS a, r.id AS b,
         CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
  FROM banded_f l JOIN banded_f r
    ON l.band = r.band AND l.val = r.val AND l.id < r.id
  UNION ALL
  SELECT a, b, hamming FROM chain)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 3, threshold: float = 0.05, max_df: int = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct n-gram shingles for pairs sharing ≥ 1
    shingle. ``max_df`` drops shingles present in more than that many docs
    (stop-shingle skew guard — without it one common phrase creates a
    quadratic bucket)."""
    from rust_triplets_spark.functions.caching import cache_scoped

    # sh feeds sizes + the df-filter; sh_f feeds BOTH sides of the shingle
    # self-join — cache each so the shingle explode and the df window run
    # once instead of once per consumer
    sh = cache_scoped(
        _with_shingles(df, id_col, text_col, shingle_n), "dedup.ngram_sh"
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("__sz"))
    w = Window.partitionBy("shingle")
    sh_f = cache_scoped(
        sh.withColumn("__df", F.count("*").over(w)).where(F.col("__df") <= max_df),
        "dedup.ngram_sh_f", eager=True,
    )
    inter = (
        sh_f.alias("l")
        .join(sh_f.alias("r"), "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("__sz").alias("__sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("__sz").alias("__sb")), "b")
        .withColumn("uni", (F.col("__sa") + F.col("__sb") - F.col("inter")).cast("long"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni").cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "uni", "jaccard")
    )
    return out


def ngram_jaccard_pairs_sql(
    table: str, id_sql: str, text_sql: str,
    shingle_n: int = 3, threshold: float = 0.05, max_df: int = 1000,
) -> str:
    return f"""
WITH sh AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, s.shingle
  FROM {table}, UNNEST({_shingles_sql(text_sql, shingle_n)}) AS s(shingle)
), sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
sh_f AS MATERIALIZED (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
  WHERE df <= {max_df}
), inter AS (
  SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS inter
  FROM sh_f l JOIN sh_f r ON l.shingle = r.shingle AND l.id < r.id
  GROUP BY l.id, r.id
)
SELECT i.a, i.b, i.inter,
       CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni,
       CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
FROM inter i JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
WHERE CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= {threshold!r}
"""


def ngram_containment_pairs(
    df: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 3, threshold: float = 0.5, max_df: int = 1000,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT for pairs sharing >= 1 shingle:
    ``containment_a = |A ∩ B| / |A|`` (and symmetrically for b) over
    distinct shingle sets, kept where either side >= ``threshold``.

    Containment is the near-dup measure Jaccard structurally misses: a
    short document quoted whole inside a long one has Jaccard ≈ |A|/|B|
    (tiny) but containment_a = 1.0 — the Broder (1997) "resemblance vs
    containment" distinction. Candidate generation, skew guard
    (``max_df`` stop-shingles), and the shingle self-join are the exact
    ngram_jaccard_pairs shapes — cost is Σ bucket², never corpus².

    Both |A ∩ B| AND the denominators |A|, |B| are computed over the
    ``max_df``-FILTERED shingle universe: stop-shingles are excluded
    from numerator and denominator alike, so a short document quoted
    whole still scores containment 1.0 even when some of its shingles
    are corpus-common. (Sizing from the unfiltered sets while
    intersecting filtered ones — the r9 shape — biased containment
    toward 0 for exactly the quoted-short-doc class this operator
    exists to catch.) Any pair emitted shares ≥ 1 surviving shingle,
    so filtered sizes are ≥ 1 — no division by zero."""
    from rust_triplets_spark.functions.caching import cache_scoped

    sh = cache_scoped(
        _with_shingles(df, id_col, text_col, shingle_n), "dedup.ngram_sh"
    )
    w = Window.partitionBy("shingle")
    sh_f = cache_scoped(
        sh.withColumn("__df", F.count("*").over(w)).where(F.col("__df") <= max_df),
        "dedup.ngram_sh_f", eager=True,
    )
    sizes = sh_f.groupBy("id").agg(F.count("*").alias("__sz"))
    inter = (
        sh_f.alias("l")
        .join(sh_f.alias("r"), "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    c_a = F.col("inter").cast("double") / F.col("__sa").cast("double")
    c_b = F.col("inter").cast("double") / F.col("__sb").cast("double")
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("__sz").alias("__sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("__sz").alias("__sb")), "b")
        .withColumn("containment_a", c_a)
        .withColumn("containment_b", c_b)
        .where((F.col("containment_a") >= threshold) | (F.col("containment_b") >= threshold))
        .select("a", "b", "inter", "containment_a", "containment_b")
    )


def ngram_containment_pairs_sql(
    table: str, id_sql: str, text_sql: str,
    shingle_n: int = 3, threshold: float = 0.5, max_df: int = 1000,
) -> str:
    """DuckDB twin of :func:`ngram_containment_pairs` (sizes over the
    max_df-filtered shingle universe, matching the Spark side)."""
    return f"""
WITH csh AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, s.shingle
  FROM {table}, UNNEST({_shingles_sql(text_sql, shingle_n)}) AS s(shingle)
), csh_f AS MATERIALIZED (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM csh)
  WHERE df <= {max_df}
), csizes AS (SELECT id, count(*) AS sz FROM csh_f GROUP BY id),
cinter AS (
  SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS inter
  FROM csh_f l JOIN csh_f r ON l.shingle = r.shingle AND l.id < r.id
  GROUP BY l.id, r.id
)
SELECT i.a, i.b, i.inter,
       CAST(i.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment_a,
       CAST(i.inter AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS containment_b
FROM cinter i JOIN csizes sa ON sa.id = i.a JOIN csizes sb ON sb.id = i.b
WHERE CAST(i.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= {threshold!r}
   OR CAST(i.inter AS DOUBLE) / CAST(sb.sz AS DOUBLE) >= {threshold!r}
"""


# ---------------------------------------------------------------------------
# near-dup clusters: connected components over candidate pairs
# ---------------------------------------------------------------------------

def neardup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Collapse near-duplicate candidate PAIRS into CLUSTERS: connected
    components with the minimum member id as the canonical representative —
    the step that turns pairwise dedup output into per-document keep/drop
    decisions. Returns (id, rep, cluster_size) for EVERY input document
    (singletons are their own cluster of 1).

    ``pairs`` defaults to :func:`minhash_lsh_pairs`. Components are found
    by iterative min-label propagation over the undirected edge set, with
    one pointer-jumping step per round (``rep ← rep[rep]``) so chains
    collapse in O(log diameter) rounds, not O(diameter); each round is two
    equi-joins + a groupBy, each iteration's result is localCheckpoint-ed
    (plan truncation — iterative lineage otherwise grows superlinearly),
    and the loop stops at the monotone fixpoint (sum of labels stops
    decreasing — one tiny aggregate per round). The fixpoint is the unique
    per-component minimum, so the result is iteration-order independent
    and matches the oracle's recursive-CTE closure exactly.
    """
    edges = (
        pairs if pairs is not None else minhash_lsh_pairs(df, id_col, text_col)
    ).select(F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b"))
    nodes = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    und = und.localCheckpoint(eager=True)

    labels = nodes.select("id", F.col("id").alias("rep")).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("rep")).collect()[0][0] or 0
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("rep").alias("__nrep"))
            .withColumnRenamed("a", "id")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.least(F.col("rep"), F.coalesce(F.col("__nrep"), F.col("rep"))).alias("rep")
        )
        # pointer jumping: rep ← rep's own label
        jumped = stepped.alias("l").join(
            stepped.select(F.col("id").alias("rep"), F.col("rep").alias("__rr")).alias("r"),
            "rep", "left",
        ).select("id", F.least(F.col("rep"), F.coalesce(F.col("__rr"), F.col("rep"))).alias("rep"))
        labels = jumped.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("rep")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    size = F.count("*").over(Window.partitionBy("rep"))
    return labels.select(
        "id", "rep", size.cast("long").alias("cluster_size")
    )


def neardup_clusters_sql(
    table: str, id_sql: str, text_sql: str,
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> str:
    """DuckDB twin of :func:`neardup_clusters` over the same MinHash-LSH
    pairs: transitive closure via a recursive CTE (UNION dedup bounds the
    walk), then rep = min reachable id — the same unique fixpoint the
    Spark propagation converges to."""
    pairs_sql = minhash_lsh_pairs_sql(table, id_sql, text_sql, num_hashes, bands, shingle_n, seed)
    return f"""
WITH RECURSIVE nd_edges AS MATERIALIZED ({pairs_sql}),
nd_und AS MATERIALIZED (
  SELECT a, b FROM nd_edges UNION ALL SELECT b, a FROM nd_edges
),
nd_nodes AS MATERIALIZED (SELECT DISTINCT CAST({id_sql} AS BIGINT) AS id FROM {table}),
reach(id, r) AS (
  SELECT id, id FROM nd_nodes
  UNION
  SELECT reach.id, e.b FROM reach JOIN nd_und e ON e.a = reach.r
),
labels AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
SELECT id, rep, CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS cluster_size
FROM labels
"""


def exact_dedup_verified(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup with collision VERIFICATION: the fingerprint pass
    (:func:`exact_dedup`'s (hash31, length) key) finds candidate groups,
    then only rows whose fingerprint occurs more than once are re-compared
    on the full normalized text. Semantically identical to grouping by the
    text itself — but the full document string enters a shuffle ONLY for
    the duplicate candidates (typically a small corpus fraction), never
    for the singleton majority. Returns (rep_id, n_dups) per distinct
    normalized text."""
    norm = normalize_inline_whitespace_col(text_col)
    fp = df.select(
        F.col(id_col).cast("long").alias("__id"),
        hash31_str_col(norm).alias("__h"),
        F.length(norm).cast("long").alias("__len"),
    )
    from rust_triplets_spark.functions.caching import cache_scoped

    fp = cache_scoped(fp, "dedup.exact_verified.fp")
    dup_fps = (
        fp.groupBy("__h", "__len").agg(F.count("*").alias("__c"))
        .where(F.col("__c") > 1)
        .select("__h", "__len")
    )
    # candidates re-read WITH text (only these rows shuffle the string)
    cand = (
        df.select(
            F.col(id_col).cast("long").alias("__id"), norm.alias("__norm")
        )
        .withColumn("__h", hash31_str_col(F.col("__norm")))
        .withColumn("__len", F.length("__norm").cast("long"))
        .join(dup_fps, ["__h", "__len"], "leftsemi")
    )
    dup_groups = (
        cand.groupBy("__h", "__len", "__norm")
        .agg(F.min("__id").alias("rep_id"), F.count("*").cast("long").alias("n_dups"))
        .select("rep_id", "n_dups")
    )
    singles = (
        fp.join(dup_fps, ["__h", "__len"], "left_anti")
        .select(F.col("__id").alias("rep_id"), F.lit(1).cast("long").alias("n_dups"))
    )
    return dup_groups.unionByName(singles)


def exact_dedup_verified_sql(table: str, id_sql: str, text_sql: str) -> str:
    """DuckDB twin: grouping by the normalized text directly IS the
    verified semantics."""
    return f"""
SELECT CAST(min({id_sql}) AS BIGINT) AS rep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM {table}
GROUP BY {normalize_inline_whitespace_sql(text_sql)}
"""


# ---------------------------------------------------------------------------
# incremental per-source signature maintenance (the dedup-family analog of
# the BM25 index refresh, reference bm25_backend.rs:343-390: rebuild only
# refreshed sources, keep the rest): a standing near-dup index at ingest
# time re-signs only the sources a refresh touched — the non-refreshed
# remainder is filtered, never re-shingled.
# ---------------------------------------------------------------------------

def minhash_signature_index(
    df: DataFrame, id_col: str, source_col: str, text_col: str,
    num_hashes: int = 32, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> DataFrame:
    """Source-partitioned MinHash signature frame ``(source, id, mh_*)`` —
    the persistable state a streaming/refresh ingest maintains so LSH
    banding (:func:`minhash_lsh_pairs`'s band step) never re-reads old
    text. Same per-id values as :func:`minhash_signatures` — both twins
    run through :func:`_minhash_sig_agg`, so the measured codegen shape
    cannot drift between them."""
    base = df.select(
        F.col(source_col).alias("source"), F.col(id_col).alias("__mid"), F.col(text_col).alias("__mtext")
    )
    return _minhash_sig_agg(
        base, "__mid", "__mtext", ("source",), num_hashes, shingle_n, seed
    )


def refresh_minhash_signature_index(
    index: DataFrame,
    refreshed_docs: DataFrame,
    refreshed_sources: list[str],
    id_col: str,
    source_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = MINHASH_SEED,
) -> DataFrame:
    """Re-sign ONLY ``refreshed_sources`` from ``refreshed_docs`` and
    union with the untouched remainder of ``index``. With the index
    persisted partitioned by ``source``, the anti-filter is partition
    pruning — the refresh cost is proportional to the refreshed sources,
    not the corpus. Result equals a full rebuild over the updated corpus
    (pytest-proven), including NULL-source rows: ``NOT isin(...)``
    evaluates to NULL (not true) for a NULL key under three-valued
    logic, so the keep-filter must pass NULLs through explicitly or
    every refresh would silently delete them from the index."""
    if not refreshed_sources:
        return index
    fresh = minhash_signature_index(
        refreshed_docs.where(F.col(source_col).isin(list(refreshed_sources))),
        id_col, source_col, text_col, num_hashes, shingle_n, seed,
    )
    keep = index.where(
        F.col("source").isNull() | ~F.col("source").isin(list(refreshed_sources))
    )
    return keep.unionByName(fresh)


# ---------------------------------------------------------------------------
# repeated-span detection (approximate span dedup, after Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better": spans that
# recur across the corpus are memorization fuel; the exact suffix-array
# method is replaced by the standard n-gram-frequency approximation)
# ---------------------------------------------------------------------------

REPEAT_SPAN_SEED = 4100


def repeated_ngram_spans(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 8, min_docs: int = 3, seed: int = REPEAT_SPAN_SEED,
) -> DataFrame:
    """Per-document repeated-span report: which fraction of a document's
    tokens sits inside an ``n``-gram that occurs in ``>= min_docs``
    distinct documents.

    Coverage is the EXACT union of the repeated grams' [pos, pos+n)
    token intervals, computed with one ``lag`` window per doc over the
    matched positions (each hit contributes ``min(n, pos - prev_pos)``)
    — no per-token explode, no approximation. Returns
    ``(id, n_tok, n_grams, n_repeated, covered_tokens, covered_frac)``.

    Scale shape: one posexplode of row-local gram fingerprints (int64,
    positions attached), one partial-aggregable corpus frequency groupBy
    keyed by the fingerprint, a linear join back, and a per-doc window
    over MATCHED rows only. Same fingerprint machinery as
    decontamination (polymix31 — linear in n), so a collision maps both
    engines to the same collision and the oracle stays exact. The gram
    frame feeds BOTH the frequency aggregate and the hit-join side (and
    ``base`` both the explode and the final join), so both are
    scope-cached — the DuckDB twin marks the same CTEs MATERIALIZED;
    without the cache Spark re-runs the tokenize+fingerprint explode per
    consumer (the measured 2-3x self-join trap the minhash pipeline
    documents).
    """
    from rust_triplets_spark.functions.caching import cache_scoped

    if n < 1 or min_docs < 2:
        raise ValueError(f"need n >= 1 and min_docs >= 2, got {n}/{min_docs}")
    gram_arr = ngram_fingerprint_array_col(
        F.col(text_col), n, seed, "polymix31", distinct=False
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("__toks"),
        gram_arr.alias("__grams"),
    ).select(
        "id",
        F.size("__toks").cast("long").alias("n_tok"),
        F.size("__grams").cast("long").alias("n_grams"),
        "__grams",
    )
    base = cache_scoped(base, "dedup.repeated_spans.base", eager=True)
    grams = cache_scoped(
        base.select("id", F.posexplode("__grams").alias("pos", "fp")),
        "dedup.repeated_spans.grams",
        eager=True,
    )
    rep = (
        grams.groupBy("fp")
        .agg(F.countDistinct("id").alias("__d"))
        .where(F.col("__d") >= min_docs)
        .select("fp")
    )
    w = Window.partitionBy("id").orderBy("pos")
    hits = (
        grams.join(rep, "fp")
        .withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__add",
            F.when(F.col("__prev").isNull(), F.lit(n)).otherwise(
                F.least(F.lit(n), F.col("pos") - F.col("__prev"))
            ),
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_repeated"),
            F.sum("__add").cast("long").alias("covered_tokens"),
        )
    )
    out = base.drop("__grams").join(hits, "id", "left")
    covered = F.coalesce("covered_tokens", F.lit(0)).cast("long")
    return out.select(
        "id",
        "n_tok",
        "n_grams",
        F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
        covered.alias("covered_tokens"),
        F.when(F.col("n_tok") > 0, covered.cast("double") / F.col("n_tok"))
        .otherwise(F.lit(0.0))
        .alias("covered_frac"),
    )


def repeated_ngram_spans_sql(
    table: str, id_sql: str, text_sql: str,
    n: int = 8, min_docs: int = 3, seed: int = REPEAT_SPAN_SEED,
) -> str:
    """DuckDB twin of :func:`repeated_ngram_spans`."""
    if n < 1 or min_docs < 2:
        raise ValueError(f"need n >= 1 and min_docs >= 2, got {n}/{min_docs}")
    gram_arr = ngram_fingerprint_array_sql(text_sql, n, seed, "polymix31", distinct=False)
    toks = tokens_sql(text_sql)
    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id,
         CAST(len({toks}) AS BIGINT) AS n_tok,
         {gram_arr} AS grams
  FROM {table}
), g AS MATERIALIZED (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS pos, grams[u.i] AS fp
  FROM base, UNNEST(range(1, len(grams) + 1)) AS u(i)
), rep AS (
  SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT id) >= {int(min_docs)}
), hits AS (
  SELECT g.id, g.pos, lag(g.pos) OVER (PARTITION BY g.id ORDER BY g.pos) AS prev
  FROM g JOIN rep USING (fp)
), agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_repeated,
         CAST(sum(CASE WHEN prev IS NULL THEN {int(n)}
                       ELSE least({int(n)}, pos - prev) END) AS BIGINT)
           AS covered_tokens
  FROM hits GROUP BY id
)
SELECT b.id, b.n_tok, CAST(len(b.grams) AS BIGINT) AS n_grams,
       COALESCE(a.n_repeated, 0) AS n_repeated,
       COALESCE(a.covered_tokens, 0) AS covered_tokens,
       CASE WHEN b.n_tok > 0
            THEN CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE) / b.n_tok
            ELSE 0.0 END AS covered_frac
FROM base b LEFT JOIN agg a ON b.id = a.id
"""


def minhash_dedup_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """The user-facing dedup DECISION frame: compose
    :func:`neardup_clusters` (connected components over MinHash-LSH
    candidate pairs) with the min-id survivor policy — ``keep`` is true
    exactly for each cluster's representative (and every singleton).
    Returns ``(id, rep, keep, cluster_size)`` for EVERY document, i.e.
    the frame a pipeline semi-joins against to materialize the deduped
    corpus. Same O(log diameter) propagation cost as the cluster pass;
    the keep column is a row-local comparison on top."""
    labels = neardup_clusters(df, id_col, text_col, pairs=pairs, max_iter=max_iter)
    return labels.select(
        "id",
        "rep",
        (F.col("id") == F.col("rep")).alias("keep"),
        "cluster_size",
    )


def minhash_dedup_keep_sql(
    table: str, id_sql: str, text_sql: str,
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3, seed: int = MINHASH_SEED,
) -> str:
    """DuckDB twin of :func:`minhash_dedup_keep` over the same recursive
    closure as :func:`neardup_clusters_sql`."""
    clusters = neardup_clusters_sql(
        table, id_sql, text_sql, num_hashes, bands, shingle_n, seed
    )
    return f"""
SELECT id, rep, (id = rep) AS keep, cluster_size
FROM ({clusters})
"""


def minhash_signature_array_col(
    text_col, num_hashes: int = 32, shingle_n: int = 3, seed: int = MINHASH_SEED,
):
    """ROW-LOCAL MinHash signature: ``array<bigint>`` of the k per-shingle
    minima — value-identical to :func:`minhash_signatures`'s aggregate
    (same hash31 → mix31_step fold, pinned by pytest), but computed as a
    pure column expression with no explode/groupBy.

    This exists for STREAMING: signatures via aggregation would make every
    downstream op a stateful streaming aggregate, while a row-local
    expression keeps the query map-only (append mode, no watermark, no
    state store). The cost is the known higher-order-function penalty
    (CodegenFallback, no CSE across the k mins — the measured reason
    :func:`minhash_signatures` uses the aggregate shape for batch); in a
    stream that price buys statelessness, and each row pays it once at
    ingest. Docs with < shingle_n tokens yield NULL (the aggregate's
    no-row analog)."""
    from rust_triplets_spark.functions.hashing import mix31_step_col

    sh = shingle_fingerprints_col(text_col, shingle_n, seed)

    # closure factory, NOT `lambda s, i=i: ...` — F.transform dispatches on
    # lambda ARITY, so a two-parameter lambda (even with a default) is
    # called as (element, index) and the array index silently overrides
    # the bound slot number, collapsing all k slots to one value
    def _slot(i: int):
        return lambda s: mix31_step_col(hash31_col(s, seed), F.lit(i), seed)

    mins = [
        F.array_min(F.transform(sh, _slot(i))).cast("long")
        for i in range(num_hashes)
    ]
    return F.when(F.size(sh) > 0, F.array(*mins))


def minhash_band_structs_col(
    sig_col, num_hashes: int, bands: int,
):
    """``array<struct<band int, sig bigint>>`` over a row-local signature
    array (:func:`minhash_signature_array_col`) — the same band mix as
    :func:`minhash_lsh_pairs` (``mix31(mh[b*r .. b*r+r-1], BAND_SEED+b)``),
    ready for one explode into (band, sig) join keys."""
    from rust_triplets_spark.functions.hashing import mix31_col

    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    r = num_hashes // bands
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            mix31_col(
                [F.element_at(sig_col, b * r + j + 1) for j in range(r)],
                BAND_SEED + b,
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    return F.array(*structs)


def simhash_dedup_keep(
    df: DataFrame, id_col: str, text_col: str,
    bits: int = 32, bands: int = 4, seed: int = SIMHASH_SEED,
    max_bucket: int = 1000, max_hamming: int = 3, max_iter: int = 20,
) -> DataFrame:
    """The SimHash family's dedup DECISION frame — the
    :func:`minhash_dedup_keep` analog over :func:`simhash_band_pairs`
    candidates filtered to ``hamming <= max_hamming``: connected
    components + min-id survivor policy, returning ``(id, rep, keep,
    cluster_size)`` for every document. SimHash clusters on weighted
    bit-agreement (cheap, one 64-bit signature per doc — the crawl-scale
    first pass), MinHash on shingle Jaccard; pipelines often run both and
    union the keep frames.

    Caveat inherited from the stop-band guard (simhash_band_pairs
    docstring): hub pairs in oversized buckets are subject to the same
    ``max_hamming`` filter as clique pairs, so tight thresholds over
    low-entropy mega-families can still split a family — raise
    ``max_bucket`` if that matters."""
    pairs = simhash_band_pairs(
        df, id_col, text_col, bits, bands, seed, max_bucket
    ).where(F.col("hamming") <= max_hamming)
    labels = neardup_clusters(df, id_col, text_col, pairs=pairs, max_iter=max_iter)
    return labels.select(
        "id", "rep", (F.col("id") == F.col("rep")).alias("keep"), "cluster_size"
    )


def simhash_dedup_keep_sql(
    table: str, id_sql: str, text_sql: str,
    bits: int = 32, bands: int = 4, seed: int = SIMHASH_SEED,
    max_bucket: int = 1000, max_hamming: int = 3,
) -> str:
    """DuckDB twin of :func:`simhash_dedup_keep`: the same recursive-CTE
    transitive closure as :func:`neardup_clusters_sql`, over simhash band
    pairs filtered by the same hamming threshold."""
    pairs_sql = simhash_band_pairs_sql(
        table, id_sql, text_sql, bits, bands, seed, max_bucket
    )
    return f"""
WITH RECURSIVE sk_edges AS MATERIALIZED (
  SELECT a, b FROM ({pairs_sql}) WHERE hamming <= {max_hamming}
),
sk_und AS MATERIALIZED (
  SELECT a, b FROM sk_edges UNION ALL SELECT b, a FROM sk_edges
),
sk_nodes AS MATERIALIZED (SELECT DISTINCT CAST({id_sql} AS BIGINT) AS id FROM {table}),
sk_reach(id, r) AS (
  SELECT id, id FROM sk_nodes
  UNION
  SELECT sk_reach.id, e.b FROM sk_reach JOIN sk_und e ON e.a = sk_reach.r
),
sk_labels AS (SELECT id, min(r) AS rep FROM sk_reach GROUP BY id)
SELECT id, rep, (id = rep) AS keep,
       CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS cluster_size
FROM sk_labels
"""
