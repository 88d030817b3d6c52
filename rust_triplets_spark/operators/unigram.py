"""Unigram-LM subword tokenizer training (SentencePiece's algorithm
family: Kudo 2018, "Subword Regularization") — the second real subword
tokenizer next to BPE (:mod:`operators.bpe`), completing the pair every
production tokenizer toolkit ships.

Same distribution shape as BPE training: the ONE corpus-scale job is the
word-frequency aggregation; everything after runs on the
vocabulary-shaped distinct-word table, with the piece table (bounded:
alphabet + ``seed_multi`` rows) riding pandas-UDF closures exactly like
the DSIR bucket model. Per EM round: one distributed Viterbi-segmentation
job over distinct words, one bounded collect (≤ |seed| rows). No chained
lineage between rounds (each round re-reads the SAME cached word table),
so — unlike the BPE merge loop — no localCheckpoint is needed.

Determinism contract (what makes the DuckDB twin bit-exact):

- training considers words of ≤ ``max_word_len`` chars (the DP unroll
  length; the longer tail is excluded IDENTICALLY in both engines),
- seed = every single char + the top ``seed_multi`` substrings of length
  2..``max_piece_len`` by (occurrence-weighted count DESC, piece ASC),
- piece scores are integer-quantized log-probs on the 1/LM_QSCALE grid
  (the repo's established cross-engine float strategy: dsir, lm_quality,
  token_entropy): ``s = q(ln(usage+1)) − q(ln(Σ(usage+1)))`` with
  half-up rounding, Laplace +1 keeping every seed piece alive through EM,
- hard-EM (Viterbi counts, not expected counts): the segmentation
  maximizes the quantized score sum; score ties prefer the LONGER last
  piece (checked longest-first in both engines),
- final vocab = alphabet + top ``vocab_multi`` multi-char pieces by
  (last-round usage DESC, piece ASC).

The oracle twin unrolls the whole loop in SQL: per-position DP columns
(chained CTEs), argmax piece lengths, a recursive-CTE walk reconstructing
each word's segmentation, usage re-aggregation — one chain per EM round.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col, tokens_sql
from rust_triplets_spark.operators.lm_quality import LM_QSCALE

MAX_WORD_LEN = 16
MAX_PIECE_LEN = 5
SEED_MULTI = 32
EM_ROUNDS = 3
VOCAB_MULTI = 12


def _q(n: int) -> int:
    """Quantized ln on the 1/LM_QSCALE grid, half-up (n >= 1 → ln >= 0,
    so half-up == away-from-zero == both engines' round())."""
    return int(math.floor(math.log(n) * LM_QSCALE + 0.5))


def unigram_word_freq(df: DataFrame, text_col: str,
                      max_word_len: int = MAX_WORD_LEN) -> DataFrame:
    """``(w, cnt)`` over words of ≤ ``max_word_len`` chars — the corpus-
    scale job; everything downstream is vocabulary-shaped."""
    w = F.explode(tokens_col(F.col(text_col))).alias("w")
    return (
        df.select(w)
        .where(F.length("w") <= max_word_len)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _substrings_col(max_piece_len: int) -> Column:
    """All substrings of ``w`` with length 1..P, one entry per start
    position — native array expressions (Spark's two-arg ``sequence``
    DESCENDS when stop < start, so the p > length(w) case needs an
    explicit empty-array guard; DuckDB's ``range`` is end-exclusive
    ascending and needs none)."""
    return F.expr(
        "flatten(transform(sequence(1, {P}), p -> "
        "CASE WHEN length(w) >= p THEN "
        "transform(sequence(1, length(w) - p + 1), i -> substring(w, i, p)) "
        "ELSE array() END))".format(P=max_piece_len)
    )


def _seed_pieces(words: DataFrame, max_piece_len: int,
                 seed_multi: int) -> dict:
    """Distributed seed: substring occurrence scores aggregated on the
    cluster; only the BOUNDED result reaches the driver (the alphabet —
    charset-sized — plus the top ``seed_multi`` multi-char pieces via
    TakeOrdered). Never collects the word table itself."""
    subs = (
        words.select(F.explode(_substrings_col(max_piece_len)).alias("piece"),
                     "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("score"))
    )
    alpha = subs.where(F.length("piece") == 1).collect()
    multi = (
        subs.where(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(seed_multi)
        .collect()
    )
    return {r["piece"]: int(r["score"]) for r in [*alpha, *multi]}


def viterbi_segment(w: str, scores: dict, max_piece_len: int) -> list:
    """Max-score segmentation under integer piece scores; ties prefer the
    longer last piece (checked longest-first — the oracle's CASE order)."""
    n = len(w)
    dp = [0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best, best_p = None, 0
        for p in range(min(max_piece_len, i), 0, -1):  # longest first
            s = scores.get(w[i - p:i])
            if s is None or dp[i - p] is None:
                continue
            cand = dp[i - p] + s
            if best is None or cand > best:
                best, best_p = cand, p
        dp[i] = best
        back[i] = best_p
    pieces = []
    pos = n
    while pos > 0:
        p = back[pos]
        pieces.append(w[pos - p:pos])
        pos -= p
    pieces.reverse()
    return pieces


def _segment_udf(scores: dict, max_piece_len: int):
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _seg(ws):
        import pandas as pd

        return pd.Series(
            [viterbi_segment(w, scores, max_piece_len) for w in ws]
        )

    return _seg


def _rescore(usage: dict) -> dict:
    """Laplace-smoothed quantized log-probs from a usage table."""
    total = sum(u + 1 for u in usage.values())
    qt = _q(total)
    return {piece: _q(u + 1) - qt for piece, u in usage.items()}


def train_unigram(
    df: DataFrame,
    text_col: str,
    *,
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_multi: int = SEED_MULTI,
    em_rounds: int = EM_ROUNDS,
    vocab_multi: int = VOCAB_MULTI,
    prune_frac: float = 0.0,
) -> tuple[list, DataFrame]:
    """Run the trainer; returns ``(rows, words)`` where ``rows`` is the
    final ``[(piece, piece_len, usage, lrq)]`` vocabulary (alphabet +
    top ``vocab_multi`` multi-char pieces) and ``words`` the cached word
    table for downstream application.

    ``prune_frac`` enables Kudo 2018 §4's vocabulary pruning: real
    unigram training starts from a LARGE seed (several times the target)
    and, after each EM round, drops the worst ``prune_frac`` of
    multi-char pieces — here by (usage ASC, piece DESC), the quantized
    hard-EM counterpart of least-likelihood-loss — never below the
    ``vocab_multi`` target and never touching the alphabet (every word
    must stay segmentable). Pruned pieces leave the score table, so
    later rounds re-segment without them and their counts flow to the
    survivors. The default ``0.0`` is the one-shot top-K demo shape the
    registered oracle query pins bit-exactly (the SQL twin unrolls the
    unpruned loop); tokenizer-real runs (seed ≈ 3× target, ≥4k pieces,
    sf1) use ``prune_frac ≈ 0.2`` — parity against a driver-side pure-
    Python reference trainer is pinned in tests/test_unigram.py and the
    sf1 run is recorded in SCALE.md. Scale shape is unchanged: pruning
    is a driver-side sort of the ALREADY-collected bounded usage table
    (alphabet + ≤ seed_multi rows)."""
    from rust_triplets_spark.functions.caching import cache_scoped

    if not 0.0 <= prune_frac < 1.0:
        raise ValueError(f"prune_frac {prune_frac} outside [0, 1)")

    words = cache_scoped(
        unigram_word_freq(df, text_col, max_word_len), "unigram.words"
    )
    seed_scores = _seed_pieces(words, max_piece_len, seed_multi)
    total = sum(seed_scores.values())
    qt = _q(total)
    scores = {k: _q(v) - qt for k, v in seed_scores.items()}

    usage: dict[str, int] = {}
    for _ in range(em_rounds):
        seg = _segment_udf(scores, max_piece_len)
        counts = (
            words.select(F.explode(seg(F.col("w"))).alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("u"))
            .collect()
        )
        used = {r["piece"]: int(r["u"]) for r in counts}
        usage = {piece: used.get(piece, 0) for piece in scores}
        if prune_frac:
            multi = sorted(
                ((k, u) for k, u in usage.items() if len(k) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            keep = max(vocab_multi, int(len(multi) * (1.0 - prune_frac)))
            if keep < len(multi):
                kept = {k for k, _ in multi[:keep]}
                usage = {
                    k: u for k, u in usage.items()
                    if len(k) == 1 or k in kept
                }
        scores = _rescore(usage)

    alpha = [(k, u) for k, u in usage.items() if len(k) == 1]
    multi = sorted(
        ((k, u) for k, u in usage.items() if len(k) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:vocab_multi]
    rows = [
        (piece, len(piece), u, scores[piece])
        for piece, u in sorted(alpha) + multi
    ]
    return rows, words


def unigram_vocab(df: DataFrame, text_col: str, **kw) -> DataFrame:
    """The trained vocabulary as a frame: ``(piece, piece_len, usage,
    lrq)`` — the artifact a tokenizer ships. Distributed per-round
    segmentation jobs; only piece tables (bounded) reach the driver."""
    rows, _ = train_unigram(df, text_col, **kw)
    return df.sparkSession.createDataFrame(
        rows, "piece STRING, piece_len BIGINT, usage BIGINT, lrq BIGINT"
    )


def unigram_fertility(
    df: DataFrame, text_col: str, source_col: str, **kw
) -> DataFrame:
    """Per-source fertility (pieces per word, milli-units) under the
    FINAL pruned vocabulary — the deploy-side audit of what the trained
    tokenizer does to each corpus slice. Distinct words are segmented
    once; per-source word counts join the per-word piece counts."""
    rows, words = train_unigram(df, text_col, **kw)
    max_piece_len = kw.get("max_piece_len", MAX_PIECE_LEN)
    max_word_len = kw.get("max_word_len", MAX_WORD_LEN)
    final_scores = {r[0]: r[3] for r in rows}
    seg = _segment_udf(final_scores, max_piece_len)
    per_word = words.select(
        "w", F.size(seg(F.col("w"))).cast("long").alias("n_pieces")
    )
    src_words = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(tokens_col(F.col(text_col))).alias("w"),
        )
        .where(F.length("w") <= max_word_len)
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        src_words.join(per_word, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_pieces")).cast("long")
            .alias("n_pieces"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            F.expr("(n_pieces * 1000) DIV n_words").cast("long")
            .alias("fert_milli"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins: the EM loop UNROLLED. Per round — a piece-score map,
# 1 chained CTE per DP position (GREATEST over ≤P staged lookups; a
# Generate-free Project chain on the Spark side's mirror has no analogue
# here because SQL has no per-row loop), an unpivot computing the argmax
# piece length per position (longest-first CASE = the tie-break), a
# recursive-CTE walk reconstructing each word's segmentation, and the
# usage re-aggregation. The chain runs on the vocabulary-shaped word
# table, so the oracle stays DuckDB-sized despite its textual bulk.
# ---------------------------------------------------------------------------


def _sql_q(expr: str) -> str:
    return f"CAST(round(ln(CAST({expr} AS DOUBLE)) * {LM_QSCALE}) AS BIGINT)"


def _sql_dp_chain(
    words_cte: str, pieces_cte: str, name: str,
    max_word_len: int, max_piece_len: int,
) -> tuple[list, str]:
    """CTE bodies computing ``{name}_used`` (w, cnt, piece per
    segmentation step) for ``words_cte`` under ``pieces_cte`` scores.
    Returns ``(ctes, used_cte_name)``."""
    W, P = max_word_len, max_piece_len
    ctes = [
        f"{name}_map AS (SELECT map(list(piece ORDER BY piece), "
        f"list(s ORDER BY piece)) AS m FROM {pieces_cte})",
        f"{name}_c0 AS (SELECT w.w, w.cnt, mm.m, CAST(0 AS BIGINT) AS d0 "
        f"FROM {words_cte} w CROSS JOIN {name}_map mm)",
    ]

    def look(i: int, p: int) -> str:
        return f"map_extract(m, substring(w, {i - p + 1}, {p}))[1]"

    for i in range(1, W + 1):
        terms = [
            f"(d{i - p} + {look(i, p)})"
            for p in range(1, min(P, i) + 1)
        ]
        ctes.append(
            f"{name}_c{i} AS (SELECT *, CASE WHEN length(w) >= {i} THEN "
            f"GREATEST({', '.join(terms)}) END AS d{i} FROM {name}_c{i - 1})"
        )
    branches = []
    for i in range(1, W + 1):
        whens = " ".join(
            f"WHEN (d{i - p} + {look(i, p)}) IS NOT DISTINCT FROM d{i} "
            f"THEN {p}"
            for p in range(min(P, i), 1, -1)
        )
        p_expr = f"CASE {whens} ELSE 1 END" if whens else "1"
        branches.append(
            f"SELECT w, cnt, {i} AS pos, {p_expr} AS p FROM {name}_c{W} "
            f"WHERE length(w) >= {i}"
        )
    ctes.append(
        f"{name}_dp AS MATERIALIZED ({' UNION ALL '.join(branches)})"
    )
    ctes.append(
        f"{name}_walk(w, pos) AS ("
        f"SELECT w, length(w) FROM {words_cte} "
        f"UNION ALL "
        f"SELECT k.w, k.pos - d.p FROM {name}_walk k "
        f"JOIN {name}_dp d ON k.w = d.w AND k.pos = d.pos WHERE k.pos > 0)"
    )
    ctes.append(
        f"{name}_used AS MATERIALIZED ("
        f"SELECT d.w, d.cnt, substring(d.w, d.pos - d.p + 1, d.p) AS piece "
        f"FROM {name}_walk k JOIN {name}_dp d "
        f"ON k.w = d.w AND k.pos = d.pos WHERE k.pos > 0)"
    )
    return ctes, f"{name}_used"


def _sql_train_ctes(
    table: str, text_sql: str, *,
    max_word_len: int, max_piece_len: int, seed_multi: int, em_rounds: int,
) -> tuple[list, str, str]:
    """The full unrolled trainer. Returns ``(ctes, last_usage_cte,
    last_pieces_cte)``."""
    W, P = max_word_len, max_piece_len
    toks = tokens_sql(text_sql)
    ctes = [
        f"""
ug_words AS MATERIALIZED (
  SELECT u.tok AS w, CAST(count(*) AS BIGINT) AS cnt
  FROM {table} t, UNNEST({toks}) AS u(tok)
  WHERE length(u.tok) <= {W}
  GROUP BY 1
)""",
        # p unrolled to constants: DuckDB cannot correlate an outer row
        # column through a NESTED lambda (single-level lambdas bind fine)
        f"""
ug_subs AS MATERIALIZED (
  SELECT s.piece AS piece, CAST(sum(w.cnt) AS BIGINT) AS score
  FROM ug_words w, UNNEST(flatten([{", ".join(
      f"list_transform(range(1, length(w.w) - {p} + 2), "
      f"i -> substring(w.w, CAST(i AS INT), {p}))"
      for p in range(1, P + 1)
  )}])) AS s(piece)
  GROUP BY 1
)""",
        f"""
ug_seed AS MATERIALIZED (
  SELECT piece, score FROM ug_subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece, score FROM (
    SELECT piece, score FROM ug_subs WHERE length(piece) > 1
    ORDER BY score DESC, piece LIMIT {seed_multi})
)""",
        f"""
ug_p0 AS MATERIALIZED (
  SELECT piece, {_sql_q("score")}
       - (SELECT {_sql_q("sum(score)")} FROM ug_seed) AS s
  FROM ug_seed
)""",
    ]
    pieces = "ug_p0"
    usage = ""
    for r in range(1, em_rounds + 1):
        chain, used = _sql_dp_chain("ug_words", pieces, f"ug_r{r}", W, P)
        ctes.extend(chain)
        usage = f"ug_r{r}_usage"
        ctes.append(
            f"{usage} AS MATERIALIZED ("
            f"SELECT pp.piece, CAST(COALESCE(uu.c, 0) AS BIGINT) AS usage "
            f"FROM {pieces} pp LEFT JOIN ("
            f"SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM {used} "
            f"GROUP BY 1) uu ON pp.piece = uu.piece)"
        )
        pieces = f"ug_p{r}"
        ctes.append(
            f"{pieces} AS MATERIALIZED ("
            f"SELECT piece, {_sql_q('usage + 1')}"
            f" - (SELECT {_sql_q('sum(usage + 1)')} FROM {usage}) AS s "
            f"FROM {usage})"
        )
    return ctes, usage, pieces


def _sql_final_vocab(usage: str, pieces: str, vocab_multi: int) -> str:
    return f"""(
  SELECT f.piece, f.usage, p.s
  FROM (
    SELECT piece, usage FROM {usage} WHERE length(piece) = 1
    UNION ALL
    SELECT piece, usage FROM (
      SELECT piece, usage FROM {usage} WHERE length(piece) > 1
      ORDER BY usage DESC, piece LIMIT {vocab_multi})
  ) f JOIN {pieces} p USING (piece)
)"""


def unigram_vocab_sql(
    table: str, text_sql: str, *,
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_multi: int = SEED_MULTI,
    em_rounds: int = EM_ROUNDS,
    vocab_multi: int = VOCAB_MULTI,
) -> str:
    ctes, usage, pieces = _sql_train_ctes(
        table, text_sql, max_word_len=max_word_len,
        max_piece_len=max_piece_len, seed_multi=seed_multi,
        em_rounds=em_rounds,
    )
    final = _sql_final_vocab(usage, pieces, vocab_multi)
    return (
        "WITH RECURSIVE " + ",".join(ctes)
        + f"\nSELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, "
        f"usage, s AS lrq FROM {final} v"
    )


def unigram_fertility_sql(
    table: str, text_sql: str, source_sql: str, *,
    max_word_len: int = MAX_WORD_LEN,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_multi: int = SEED_MULTI,
    em_rounds: int = EM_ROUNDS,
    vocab_multi: int = VOCAB_MULTI,
) -> str:
    ctes, usage, pieces = _sql_train_ctes(
        table, text_sql, max_word_len=max_word_len,
        max_piece_len=max_piece_len, seed_multi=seed_multi,
        em_rounds=em_rounds,
    )
    ctes.append(
        "ug_pf AS MATERIALIZED (SELECT piece, s FROM "
        + _sql_final_vocab(usage, pieces, vocab_multi) + " vf)"
    )
    chain, used = _sql_dp_chain(
        "ug_words", "ug_pf", "ug_f", max_word_len, max_piece_len
    )
    ctes.extend(chain)
    toks = tokens_sql(text_sql)
    ctes.append(
        f"""
ug_npieces AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n_pieces FROM {used} GROUP BY 1
)"""
    )
    ctes.append(
        f"""
ug_srcw AS MATERIALIZED (
  SELECT {source_sql} AS source, u.tok AS w, CAST(count(*) AS BIGINT) AS cnt
  FROM {table} t, UNNEST({toks}) AS u(tok)
  WHERE length(u.tok) <= {max_word_len}
  GROUP BY 1, 2
)"""
    )
    return (
        "WITH RECURSIVE " + ",".join(ctes)
        + """
SELECT s.source,
       CAST(sum(s.cnt) AS BIGINT) AS n_words,
       CAST(sum(s.cnt * n.n_pieces) AS BIGINT) AS n_pieces,
       CAST((sum(s.cnt * n.n_pieces) * 1000) // sum(s.cnt) AS BIGINT)
         AS fert_milli
FROM ug_srcw s JOIN ug_npieces n ON s.w = n.w
GROUP BY 1"""
    )
