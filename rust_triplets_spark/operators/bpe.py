"""Byte-pair-encoding merge training + application (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the full
tokenizer-fitting loop the reference's whitespace tokenizer
(``/root/reference/src/tokenizer.rs:25-65``) stops short of, composed from
the already-oracle-checked distributed pair-count step
(``operators/sketches.bpe_merge_candidates``).

Training is the classic iteration: count adjacent token pairs (weighted by
word frequency), merge the most frequent pair everywhere (left-to-right,
non-overlapping), repeat. The expensive step — the corpus-scale pair count
— runs ONCE up front (one token-scale explode into a word-frequency
table); every merge round after that operates on the VOCABULARY-scale
word table, exactly like the reference BPE implementations (the word-freq
table is why BPE training is tractable at all). The driver-side loop is
the same shape as the connected-components loop in ``operators/dedup``:
N rounds of distributed jobs, each collecting ONE scalar row (the winning
pair) — never the corpus.

Cross-engine exactness: merge application is a left fold over the word's
token list carried as a ``chr(31)``-delimited string, with "last token ==
left" tested as a suffix check — the SAME fold evaluates in Spark
(``F.aggregate``) and DuckDB (``list_reduce``), so ties, overlaps
("aaaa" + merge(a,a) → "aa","aa"), and exhaustion behave identically and
the DuckDB twin hash-matches the merge table bit-for-bit. Winner
selection is a total order (count desc, left asc, right asc — binary
collation in both engines, the ``bpe_merge_candidates`` precedent).

Scale shape at 100 TB: the explode + groupBy word is one partial-agg
shuffle of fixed-width rows; every subsequent round touches only the
word-frequency frame (≈ vocabulary size — millions of rows, not
corpus-scale), each round one partial-agg groupBy + a LIMIT 1
TakeOrdered collect of a single row. Application (``bpe_fertility``)
re-tokenizes the DISTINCT word table, never each document occurrence."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col, tokens_sql

# tokens never contain whitespace (they come from the WS split), and the
# unit separator is not in the pinned WS class — but the fold is exact
# even if a token DID contain chr(31): both engines encode and decode with
# the same delimiter, so they'd mis-split identically.
_DELIM = "\x1f"
_DELIM_SQL = "chr(31)"


def _chars_state_col(word: Column) -> Column:
    """Initial BPE state: the word's characters joined by the delimiter."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substr(word, i, F.lit(1)),
        ),
        _DELIM,
    )


def _pairs_from_state_col(state: Column) -> Column:
    """Adjacent (l, r) struct array from a delimited-state string."""
    toks = F.split(state, _DELIM)
    empty = F.array().cast("array<struct<l:string,r:string>>")
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("l"),
                F.element_at(toks, i + 1).alias("r"),
            ),
        ),
    ).otherwise(empty)


def apply_merge_col(state: Column, left: str, right: str) -> Column:
    """Apply one merge (left, right) to a delimited-state string: the
    left-to-right non-overlapping fold. Merging is appending ``right``
    WITHOUT a delimiter (the last token already ends with ``left``)."""
    toks = F.split(state, _DELIM)
    first = F.element_at(toks, 1)
    rest = F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0)))
    R = F.lit(right)
    L = F.lit(left)
    return F.aggregate(
        rest,
        first,
        lambda acc, x: F.when(
            (x == R) & ((acc == L) | acc.endswith(_DELIM + left)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(_DELIM), x)),
    )


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """``(w, cnt)`` — the corpus word-frequency table (the one
    corpus-scale job in BPE training)."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 12
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns ``(merges, words)`` where
    ``merges`` is ``[(rank, left, right, merged, pair_count), …]`` (may be
    shorter than ``n_merges`` if pairs run dry) and ``words`` is the
    cached word-frequency frame for downstream application."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = word_freq_table(df, text_col)
    # one localCheckpoint per round (the CC-loop pattern, dedup.py): each
    # round's fold references the PREVIOUS round's state ~4x (split /
    # element_at / slice / aggregate), so without a lineage barrier
    # Catalyst inlines the chain into a 4^N expression tree and the
    # codegen OOMs. The state frame is vocabulary-scale, so the barrier
    # is cheap; lineage truncation also makes re-execution after cache
    # release safe.
    cur = words.select(
        _chars_state_col(F.col("w")).alias("s"), F.col("cnt")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            cur.select(
                F.explode(_pairs_from_state_col(F.col("s"))).alias("__p"),
                F.col("cnt"),
            )
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # no adjacent pairs left anywhere
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, l, r, l + r, c))
        if rank < n_merges:
            cur = cur.select(
                apply_merge_col(F.col("s"), l, r).alias("s"), F.col("cnt")
            ).localCheckpoint(eager=True)
    return merges, words


def bpe_vocab(df: DataFrame, text_col: str, n_merges: int = 12) -> DataFrame:
    """The trained merge table as a DataFrame: ``(merge_rank, left, right,
    merged, pair_count)`` ordered by rank — the artifact a tokenizer
    ships. Computation is distributed (N pair-count jobs over the
    vocabulary-scale word table); only the N winning rows ever reach the
    driver."""
    merges, _ = bpe_train(df, text_col, n_merges)
    spark = df.sparkSession
    schema = (
        "merge_rank INT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT"
    )
    return spark.createDataFrame(merges, schema)


def _sql_pairs_top1(state_cte: str, name: str) -> str:
    """One merge round's winner CTE body: top-1 weighted pair from the
    delimited-state frame ``state_cte``."""
    pairs = (
        "CASE WHEN len(tk) >= 2 THEN "
        "list_transform(range(1, len(tk)), "
        "i -> struct_pack(l := tk[i], r := tk[i + 1])) "
        "ELSE CAST([] AS STRUCT(l VARCHAR, r VARCHAR)[]) END"
    )
    return f"""
{name} AS MATERIALIZED (
  SELECT l, r, c FROM (
    SELECT p.pr.l AS l, p.pr.r AS r, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT string_split(s, {_DELIM_SQL}) AS tk, cnt FROM {state_cte}),
         UNNEST({pairs}) AS p(pr)
    GROUP BY 1, 2
  ) ORDER BY c DESC, l ASC, r ASC LIMIT 1
)"""


def _sql_apply_merge(state_cte: str, merge_cte: str, name: str) -> str:
    """One merge round's application CTE body: LEFT JOIN the (possibly
    empty) 1-row winner so an exhausted round leaves the state unchanged —
    the exact twin of the Spark loop's early ``break``."""
    fold = (
        f"list_reduce(string_split(s, {_DELIM_SQL}), (acc, x) -> "
        f"CASE WHEN x = m.r AND (acc = m.l OR ends_with(acc, {_DELIM_SQL} || m.l)) "
        f"THEN acc || x ELSE acc || {_DELIM_SQL} || x END)"
    )
    return f"""
{name} AS MATERIALIZED (
  SELECT CASE WHEN m.l IS NULL THEN s ELSE {fold} END AS s, cnt
  FROM {state_cte} LEFT JOIN {merge_cte} m ON TRUE
)"""


def _sql_word_state_ctes(
    table: str, text_sql: str, n_merges: int, prefix: str
) -> tuple[list[str], str]:
    """Shared CTE chain: word-freq table → initial char state → n rounds
    of (winner, apply). Returns ``(cte_bodies, last_state_name)``."""
    toks = tokens_sql(text_sql)
    ctes = [
        f"""
{prefix}_words AS MATERIALIZED (
  SELECT u.tok AS w, CAST(count(*) AS BIGINT) AS cnt
  FROM {table} t, UNNEST({toks}) AS u(tok)
  GROUP BY 1
)""",
        f"""
{prefix}_s0 AS MATERIALIZED (
  SELECT array_to_string(
           list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)),
           {_DELIM_SQL}) AS s,
         cnt
  FROM {prefix}_words
)""",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(_sql_pairs_top1(f"{prefix}_s{k - 1}", f"{prefix}_m{k}"))
        ctes.append(
            _sql_apply_merge(f"{prefix}_s{k - 1}", f"{prefix}_m{k}", f"{prefix}_s{k}")
        )
    return ctes, f"{prefix}_s{n_merges}"


def bpe_vocab_sql(table: str, text_sql: str, n_merges: int = 12) -> str:
    """DuckDB twin of :func:`bpe_vocab` — the merge loop UNROLLED as a CTE
    chain (round k's winner feeds round k's state feeds round k+1's
    count), the generated-oracle counterpart of the driver-side loop."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    ctes, _ = _sql_word_state_ctes(table, text_sql, n_merges, "bpev")
    unions = "\nUNION ALL\n".join(
        f'SELECT {k} AS merge_rank, l AS "left", r AS "right", '
        f"l || r AS merged, c AS pair_count FROM bpev_m{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {','.join(ctes)}\nSELECT * FROM (\n{unions}\n) ORDER BY merge_rank"


def bpe_fertility(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n_merges: int = 12,
) -> DataFrame:
    """Per-source fertility audit under the corpus-trained merges:
    ``(source, n_words, n_tokens, fertility)`` where ``n_tokens`` is the
    BPE token count after applying all trained merges and ``fertility`` =
    tokens per word (1.0 = every word a single token; the lower the
    better a tokenizer fits a domain — the metric tokenizer papers report
    per language/domain). Merges train corpus-global; application runs on
    the DISTINCT (source, word) table, never per occurrence."""
    merges, _ = bpe_train(df, text_col, n_merges)
    sw = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("w"),
    ).groupBy("source", "w").agg(F.count("*").cast("long").alias("cnt"))
    # same lineage-barrier cadence as the training loop (see bpe_train):
    # the application chain is N folds deep, vocabulary-scale rows
    cur = sw.select(
        "source", _chars_state_col(F.col("w")).alias("s"), "cnt"
    ).localCheckpoint(eager=True)
    for _, l, r, _, _ in merges:
        cur = cur.select(
            "source", apply_merge_col(F.col("s"), l, r).alias("s"), "cnt"
        ).localCheckpoint(eager=True)
    n_tok = F.size(F.split(F.col("s"), _DELIM)).cast("long")
    return (
        cur.select(
            F.col("source"),
            F.col("cnt"),
            (n_tok * F.col("cnt")).alias("__tok"),
        )
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum("__tok").cast("long").alias("n_tokens"),
            (
                F.sum("__tok").cast("double") / F.sum("cnt").cast("double")
            ).alias("fertility"),
        )
    )


def bpe_fertility_sql(
    table: str, source_sql: str, text_sql: str, n_merges: int = 12
) -> str:
    """DuckDB twin of :func:`bpe_fertility`: the same unrolled merge chain,
    then the per-(source, word) application chain (each round LEFT JOINs
    its winner so exhaustion degrades identically), then one aggregate."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    ctes, _ = _sql_word_state_ctes(table, text_sql, n_merges, "bpef")
    toks = tokens_sql(text_sql)
    ctes.append(f"""
bpef_e0 AS MATERIALIZED (
  SELECT source, array_to_string(
           list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)),
           {_DELIM_SQL}) AS s,
         cnt
  FROM (
    SELECT {source_sql} AS source, u.tok AS w, CAST(count(*) AS BIGINT) AS cnt
    FROM {table} t, UNNEST({toks}) AS u(tok)
    GROUP BY 1, 2
  )
)""")
    for k in range(1, n_merges + 1):
        fold = (
            f"list_reduce(string_split(s, {_DELIM_SQL}), (acc, x) -> "
            f"CASE WHEN x = m.r AND (acc = m.l OR ends_with(acc, {_DELIM_SQL} || m.l)) "
            f"THEN acc || x ELSE acc || {_DELIM_SQL} || x END)"
        )
        ctes.append(f"""
bpef_e{k} AS MATERIALIZED (
  SELECT source, CASE WHEN m.l IS NULL THEN s ELSE {fold} END AS s, cnt
  FROM bpef_e{k - 1} LEFT JOIN bpef_m{k} m ON TRUE
)""")
    return f"""WITH {','.join(ctes)}
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(len(string_split(s, {_DELIM_SQL})) * cnt) AS BIGINT) AS n_tokens,
       CAST(sum(len(string_split(s, {_DELIM_SQL})) * cnt) AS DOUBLE)
         / CAST(sum(cnt) AS DOUBLE) AS fertility
FROM bpef_e{n_merges}
GROUP BY source
"""


def bpe_apply_py(word: str, ranks: dict) -> list:
    """Reference/deploy merge application: greedy lowest-rank-first (the
    classic BPE apply, e.g. GPT-2's) — equivalent to replaying the
    merges in training order, because a later merge's inputs can only be
    produced by earlier merges. ``ranks`` maps ``(left, right) -> rank``."""
    toks = list(word)
    while len(toks) > 1:
        best_i, best_r = -1, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        # merge ALL occurrences of the best pair left-to-right (ties in
        # position resolve left-first, matching the training fold)
        l, rgt = toks[best_i], toks[best_i + 1]
        out = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == rgt:
                out.append(l + rgt)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_encode_udf(merges: list):
    """Deploy-shape tokenizer kernel: an Arrow-batched pandas UDF mapping
    a text column to ``array<string>`` BPE tokens under the trained
    ``merges`` (the :func:`bpe_train` output). The expression-fold chain
    used for training/oracle parity costs one fold PER MERGE — fine for
    the 12-merge oracle fixtures, unusable at a production 32k-merge
    vocabulary; this kernel is O(tokens·log-ish) per word with the merge
    table as a plain dict riding the closure (a 32k-merge table is <2 MB
    — broadcast-sized BY CONSTRUCTION). Per-word results are memoised
    per batch (Zipf: the hot words dominate). Parity with the training
    fold is pytest-pinned."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from rust_triplets_spark.functions.text import WS
    import re

    ranks = {(l, r): rank for rank, l, r, _, _ in merges}
    ws = re.compile(WS)

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts):
        import pandas as pd

        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks = []
            # no str.strip(): it strips ALL Unicode whitespace while the
            # pinned WS class is ASCII-only — leading/trailing WS-class
            # runs just yield '' tokens the filter below discards, which
            # is exactly tokens_col's behavior
            for w in ws.split(t):
                if not w:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = bpe_apply_py(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _encode


# ---------------------------------------------------------------------------
# Batched merge rounds — the 100 TB training path. One Spark job per merge
# (bpe_train) is exact but serializes a 30k-merge vocabulary into 30k
# sequential rounds; this variant accepts a BATCH of merges per round while
# PROVABLY reproducing the sequential merge table (pytest-pinned at 256+
# merges against a pure-Python sequential reference, and against the
# unrolled DuckDB oracle at the 12-merge fixture size).
#
# Sequential-equivalence argument (the "frequency-gap-safe batch"): fetch
# the top (M+1) pairs in the sequential total order (count desc, l, r) and
# accept the maximal PREFIX p_1..p_k such that
#
#   (1) accepted pairs are mutually SYMBOL-DISJOINT, and no accepted
#       symbol equals another accepted pair's concatenation — so applying
#       p_1..p_{i-1} leaves every occurrence of p_i untouched (neither of
#       its symbols participates in an earlier merge, and no earlier merge
#       mints its symbols), i.e. count(p_i) is unchanged at step i;
#   (2) the prefix has no gaps — the first rejected candidate caps every
#       later candidate's count. Any pair TOUCHING an accepted symbol is,
#       by (1), not in the accepted prefix, so its count is <= c_{k+1};
#       pairs created by merging p_j are (x, l_j+r_j) / (l_j+r_j, y) with
#       count <= count((x, l_j)) / count((r_j, y)) <= c_{k+1};
#   (3) count(p_k) > c_{k+1} STRICTLY — so at every sequential step i <= k
#       the argmax over {unchanged accepted (>= c_k), decayed originals
#       (<= c_{k+1} < c_k), created pairs (<= c_{k+1} < c_k)} is exactly
#       p_i, including ties among accepted pairs (the fetch order IS the
#       sequential tie order).
#
# Application: because accepted pairs are symbol/concat-disjoint, applying
# them simultaneously in ONE left-to-right fold equals applying them
# sequentially (no merge can produce or consume another's symbols), so a
# round costs one fold regardless of k — never a k-deep fold chain (the
# 4^N Catalyst blowup this module's sequential loop checkpoints against).
# ---------------------------------------------------------------------------


def _accept_batch(rows: list, max_batch: int) -> list[tuple[str, str, int]]:
    """Greedy maximal frequency-gap-safe prefix of the sorted top list.
    ``rows`` must hold at least one extra candidate beyond ``max_batch``
    when available (the gap sentinel)."""
    symbols: set[str] = set()
    concats: set[str] = set()
    prefix: list[tuple[str, str, int]] = []
    for row in rows[:max_batch]:
        l, r, c = row["l"], row["r"], int(row["c"])
        merged = l + r
        if (
            l in symbols or r in symbols or merged in symbols
            or l in concats or r in concats or merged in concats
        ):
            break  # prefix rule: the first interaction cuts the batch
        symbols.update((l, r))
        concats.add(merged)
        prefix.append((l, r, c))
    # strict-gap rule: shrink until count(p_k) > count of the first
    # non-accepted candidate (k=1 is always sequential-exact)
    k = len(prefix)
    while k > 1 and k < len(rows) and prefix[k - 1][2] <= int(rows[k]["c"]):
        k -= 1
    return prefix[:k]


def apply_merges_col(state: Column, batch: list[tuple[str, str]]) -> Column:
    """Apply a SYMBOL-DISJOINT merge batch in one left-to-right fold —
    value-equal to applying the merges sequentially (see the section
    comment). Expression size is linear in the batch, and there is one
    fold total, so rounds never chain folds."""
    toks = F.split(state, _DELIM)
    first = F.element_at(toks, 1)
    rest = F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        chain = None
        for l, r in batch:
            cond = (x == F.lit(r)) & (
                (acc == F.lit(l)) | acc.endswith(_DELIM + l)
            )
            chain = (
                F.when(cond, F.concat(acc, x))
                if chain is None
                else chain.when(cond, F.concat(acc, x))
            )
        fallback = F.concat(acc, F.lit(_DELIM), x)
        return fallback if chain is None else chain.otherwise(fallback)

    return F.aggregate(rest, first, step)


def bpe_train_batched(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_batch: int = 32,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Batched-round BPE training with the sequential merge-table
    contract: returns exactly what :func:`bpe_train` returns, in
    ceil(n_merges / accepted-batch-size) Spark jobs instead of
    n_merges. Each round collects ``max_batch + 1`` rows (the +1 is the
    frequency-gap sentinel), never the corpus."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    words = word_freq_table(df, text_col)
    cur = words.select(
        _chars_state_col(F.col("w")).alias("s"), F.col("cnt")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        want = min(max_batch, n_merges - len(merges))
        rows = (
            cur.select(
                F.explode(_pairs_from_state_col(F.col("s"))).alias("__p"),
                F.col("cnt"),
            )
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(want + 1)
            .collect()
        )
        if not rows:
            break  # no adjacent pairs left anywhere
        batch = _accept_batch(rows, want)
        for l, r, c in batch:
            merges.append((len(merges) + 1, l, r, l + r, c))
        if len(merges) < n_merges:
            cur = cur.select(
                apply_merges_col(F.col("s"), [(l, r) for l, r, _ in batch])
                .alias("s"),
                F.col("cnt"),
            ).localCheckpoint(eager=True)
    return merges, words


def bpe_vocab_batched(
    df: DataFrame, text_col: str, n_merges: int = 12, max_batch: int = 32
) -> DataFrame:
    """:func:`bpe_vocab` computed by batched rounds — same merge table
    (the equivalence :func:`bpe_train_batched` guarantees and pytest
    pins), a fraction of the jobs."""
    merges, _ = bpe_train_batched(df, text_col, n_merges, max_batch)
    spark = df.sparkSession
    schema = (
        "merge_rank INT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT"
    )
    return spark.createDataFrame(merges, schema)
