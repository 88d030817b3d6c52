"""WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
tokenizer family) — the third subword trainer next to BPE
(``operators/bpe.py``) and unigram-LM (``operators/unigram.py``),
completing the tokenizer lineup the reference's whitespace tokenizer
(``/root/reference/src/tokenizer.rs:25-65``) stops short of.

WordPiece training is BPE's merge loop with a different objective: each
round merges the adjacent symbol pair maximising the LIKELIHOOD score

    score(l, r) = count(l, r) / (count(l) * count(r))

(the pair that most increases a unigram LM's corpus likelihood when
fused, up to a constant — the scoring HuggingFace ``tokenizers``
documents for its WordPieceTrainer), instead of the raw pair count.
Non-initial symbols carry the ``##`` continuation prefix, and merging
``(l, ##x)`` yields ``l + x`` — the prefix marks word-internal
position, so it never survives a fusion.

Cross-engine exactness: counts are exact BIGINTs; the score is ONE IEEE
double division ``c / (cl*cr)`` on exactly-representable operands
(``cl*cr`` computed in BIGINT first), and IEEE-754 division is exactly
rounded — Spark and DuckDB produce bit-identical doubles, so the winner
order (score desc, l asc, r asc — binary collation both sides) is
identical even when two scores round to the same double. The
``cl*cr < 2**63`` precondition is asserted LOUDLY up front from the
total token count (the r10-advice ``quantize_col`` lesson: don't let
Spark's non-ANSI wrap diverge silently from DuckDB's overflow error).
Merge application reuses the BPE delimited-state fold
(``bpe.apply_merge_col`` shape), appending the right symbol WITHOUT its
``##`` prefix.

Scale shape at 100 TB: identical to BPE training — one corpus-scale
explode into the word-frequency table, then every round touches only
vocabulary-scale frames: one symbol-count aggregate, one pair-count
aggregate, two broadcast-sized equi-joins, a LIMIT-1 TakeOrdered
collect of a single row. ``localCheckpoint`` per round truncates the
fold-chain lineage (the 4^N Catalyst blowup guard, see bpe.py).

Why there is no ``wordpiece_train_batched``: BPE's frequency-gap batch
proof (bpe.py) bounds a CREATED pair's count by the gap sentinel — but
WordPiece ranks by ``c/(cl*cr)``, and a pair minted by a merge has the
fresh (small) merged-symbol count in its DENOMINATOR, so a created pair
can outrank every fetched candidate no matter how large the frequency
gap. Sequential exactness therefore requires re-scoring every round;
at a 30k-piece production vocabulary the honest scale lever is coarser
(shard-and-merge approximate training), not silent batch acceptance.

Caveat (standard WordPiece): raw words containing literal ``#`` can
collide with the continuation prefix. Both engines encode identically,
so the twins stay exact; real deployments pre-normalize. Words here
come from the pinned ASCII whitespace split (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import tokens_col, tokens_sql
from rust_triplets_spark.operators.bpe import (
    _DELIM,
    _DELIM_SQL,
    _pairs_from_state_col,
    word_freq_table,
)

_CONT = "##"


def _wp_state_col(word: Column) -> Column:
    """Initial WordPiece state: first char bare, every later char with
    the ``##`` continuation prefix, joined by the delimiter."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.when(i == 1, F.substr(word, i, F.lit(1))).otherwise(
                F.concat(F.lit(_CONT), F.substr(word, i, F.lit(1)))
            ),
        ),
        _DELIM,
    )


def _wp_state_sql(w: str) -> str:
    """DuckDB twin of :func:`_wp_state_col`."""
    return (
        f"array_to_string(list_transform(range(1, length({w}) + 1), "
        f"i -> CASE WHEN i = 1 THEN substring({w}, i, 1) "
        f"ELSE '{_CONT}' || substring({w}, i, 1) END), {_DELIM_SQL})"
    )


def wp_merged(left: str, right: str) -> str:
    """The fused symbol: right's continuation prefix never survives."""
    return left + (right[len(_CONT):] if right.startswith(_CONT) else right)


def apply_wp_merge_col(state: Column, left: str, right: str) -> Column:
    """Apply one WordPiece merge to a delimited-state string — the BPE
    left-to-right non-overlapping fold, but the appended text is the
    right symbol with its ``##`` prefix stripped."""
    toks = F.split(state, _DELIM)
    first = F.element_at(toks, 1)
    rest = F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0)))
    tail = F.lit(right[len(_CONT):] if right.startswith(_CONT) else right)
    R = F.lit(right)
    L = F.lit(left)
    return F.aggregate(
        rest,
        first,
        lambda acc, x: F.when(
            (x == R) & ((acc == L) | acc.endswith(_DELIM + left)),
            F.concat(acc, tail),
        ).otherwise(F.concat(acc, F.lit(_DELIM), x)),
    )


def _assert_count_product_safe(words: DataFrame) -> None:
    """Loud overflow guard: every symbol count is bounded by the total
    token count T, so ``T*T < 2**63`` guarantees the BIGINT product
    ``cl*cr`` never wraps (Spark non-ANSI) / errors (DuckDB). One scalar
    collect per training call."""
    total = words.select(
        F.sum(F.col("cnt") * F.length("w")).cast("long")
    ).collect()[0][0]
    total = int(total or 0)
    if total * total >= 2**63:
        raise ValueError(
            f"wordpiece score denominator may overflow int64: total symbol "
            f"count {total} has {total}^2 >= 2^63; shard the corpus or "
            f"subsample the trainer input"
        )


def wordpiece_train(
    df: DataFrame, text_col: str, n_merges: int = 12
) -> tuple[list[tuple[int, str, str, str, int, int, int, float]], DataFrame]:
    """Train ``n_merges`` WordPiece merges. Returns ``(merges, words)``
    where ``merges`` rows are ``(rank, left, right, merged, pair_count,
    left_count, right_count, score)`` (may be shorter if pairs run
    dry)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = word_freq_table(df, text_col)
    _assert_count_product_safe(words)
    cur = words.select(
        _wp_state_col(F.col("w")).alias("s"), F.col("cnt")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int, int, int, float]] = []
    for rank in range(1, n_merges + 1):
        syms = (
            cur.select(
                F.explode(F.split(F.col("s"), _DELIM)).alias("t"),
                F.col("cnt"),
            )
            .groupBy("t")
            .agg(F.sum("cnt").cast("long").alias("sc"))
        )
        pairs = (
            cur.select(
                F.explode(_pairs_from_state_col(F.col("s"))).alias("__p"),
                F.col("cnt"),
            )
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        top = (
            pairs.join(syms.select(F.col("t").alias("l"), F.col("sc").alias("lc")), "l")
            .join(syms.select(F.col("t").alias("r"), F.col("sc").alias("rc")), "r")
            .select(
                "l",
                "r",
                "c",
                "lc",
                "rc",
                (
                    F.col("c").cast("double")
                    / (F.col("lc") * F.col("rc")).cast("double")
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # no adjacent pairs left anywhere
        row = top[0]
        l, r = row["l"], row["r"]
        merges.append(
            (
                rank,
                l,
                r,
                wp_merged(l, r),
                int(row["c"]),
                int(row["lc"]),
                int(row["rc"]),
                float(row["score"]),
            )
        )
        if rank < n_merges:
            cur = cur.select(
                apply_wp_merge_col(F.col("s"), l, r).alias("s"), F.col("cnt")
            ).localCheckpoint(eager=True)
    return merges, words


def wordpiece_vocab(
    df: DataFrame, text_col: str, n_merges: int = 12
) -> DataFrame:
    """The trained WordPiece merge table: ``(merge_rank, left, right,
    merged, pair_count, left_count, right_count, score)`` ordered by
    rank — the artifact a BERT-family tokenizer ships (its vocab is the
    alphabet plus every ``merged``). Distributed exactly like
    ``bpe_vocab``; only the N winning rows reach the driver."""
    merges, _ = wordpiece_train(df, text_col, n_merges)
    spark = df.sparkSession
    schema = (
        "merge_rank INT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT, left_count BIGINT, right_count BIGINT, "
        "score DOUBLE"
    )
    return spark.createDataFrame(merges, schema)


def _sql_wp_top1(state_cte: str, name: str) -> str:
    """One round's winner CTE: symbol counts + pair counts from the
    state frame, likelihood score as the single IEEE double division."""
    pairs = (
        "CASE WHEN len(tk) >= 2 THEN "
        "list_transform(range(1, len(tk)), "
        "i -> struct_pack(l := tk[i], r := tk[i + 1])) "
        "ELSE CAST([] AS STRUCT(l VARCHAR, r VARCHAR)[]) END"
    )
    return f"""
{name} AS MATERIALIZED (
  SELECT l, r, c, lc, rc, score FROM (
    SELECT p.l, p.r, p.c, sl.sc AS lc, sr.sc AS rc,
           CAST(p.c AS DOUBLE) / CAST(sl.sc * sr.sc AS DOUBLE) AS score
    FROM (
      SELECT q.pr.l AS l, q.pr.r AS r, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT string_split(s, {_DELIM_SQL}) AS tk, cnt FROM {state_cte}),
           UNNEST({pairs}) AS q(pr)
      GROUP BY 1, 2
    ) p
    JOIN (
      SELECT u.tok AS t, CAST(sum(cnt) AS BIGINT) AS sc
      FROM (SELECT string_split(s, {_DELIM_SQL}) AS tk, cnt FROM {state_cte}),
           UNNEST(tk) AS u(tok)
      GROUP BY 1
    ) sl ON p.l = sl.t
    JOIN (
      SELECT u.tok AS t, CAST(sum(cnt) AS BIGINT) AS sc
      FROM (SELECT string_split(s, {_DELIM_SQL}) AS tk, cnt FROM {state_cte}),
           UNNEST(tk) AS u(tok)
      GROUP BY 1
    ) sr ON p.r = sr.t
  ) ORDER BY score DESC, l ASC, r ASC LIMIT 1
)"""


def _sql_wp_apply(state_cte: str, merge_cte: str, name: str) -> str:
    """One round's application CTE: the BPE fold with the right symbol's
    ``##`` prefix stripped on fusion; LEFT JOIN so an exhausted round
    leaves the state unchanged (the Spark loop's early ``break``)."""
    strip = (
        f"CASE WHEN starts_with(x, '{_CONT}') "
        f"THEN substring(x, {len(_CONT) + 1}) ELSE x END"
    )
    fold = (
        f"list_reduce(string_split(s, {_DELIM_SQL}), (acc, x) -> "
        f"CASE WHEN x = m.r AND (acc = m.l OR ends_with(acc, {_DELIM_SQL} || m.l)) "
        f"THEN acc || {strip} ELSE acc || {_DELIM_SQL} || x END)"
    )
    return f"""
{name} AS MATERIALIZED (
  SELECT CASE WHEN m.l IS NULL THEN s ELSE {fold} END AS s, cnt
  FROM {state_cte} LEFT JOIN {merge_cte} m ON TRUE
)"""


def _sql_wp_ctes(
    table: str, text_sql: str, n_merges: int, prefix: str
) -> tuple[list[str], str]:
    """Shared CTE chain: word-freq → ``##``-prefixed char state → n
    rounds of (winner, apply). Returns ``(cte_bodies, last_state)``."""
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
  SELECT {_wp_state_sql('w')} AS s, cnt FROM {prefix}_words
)""",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(_sql_wp_top1(f"{prefix}_s{k - 1}", f"{prefix}_m{k}"))
        ctes.append(
            _sql_wp_apply(f"{prefix}_s{k - 1}", f"{prefix}_m{k}", f"{prefix}_s{k}")
        )
    return ctes, f"{prefix}_s{n_merges}"


def wordpiece_vocab_sql(table: str, text_sql: str, n_merges: int = 12) -> str:
    """DuckDB twin of :func:`wordpiece_vocab` — the likelihood-scored
    merge loop UNROLLED as a CTE chain (round k's winner feeds round
    k's state feeds round k+1's counts), the bpe_vocab_sql pattern with
    the symbol-count joins added."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    ctes, _ = _sql_wp_ctes(table, text_sql, n_merges, "wpv")
    strip = (
        f"CASE WHEN starts_with(r, '{_CONT}') "
        f"THEN substring(r, {len(_CONT) + 1}) ELSE r END"
    )
    unions = "\nUNION ALL\n".join(
        f'SELECT {k} AS merge_rank, l AS "left", r AS "right", '
        f"l || {strip} AS merged, c AS pair_count, lc AS left_count, "
        f"rc AS right_count, score FROM wpv_m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        f"WITH {','.join(ctes)}\n"
        f"SELECT * FROM (\n{unions}\n) ORDER BY merge_rank"
    )


def wordpiece_fertility(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n_merges: int = 12,
) -> DataFrame:
    """Per-source fertility under the corpus-trained WordPiece merges:
    ``(source, n_words, n_tokens, fertility)`` — the training-time
    segmentation replayed on the DISTINCT (source, word) table (the
    bpe_fertility shape; deploy-side MaxMatch segmentation is the
    pytest-pinned :func:`wordpiece_encode_udf`)."""
    merges, _ = wordpiece_train(df, text_col, n_merges)
    sw = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("w"),
    ).groupBy("source", "w").agg(F.count("*").cast("long").alias("cnt"))
    cur = sw.select(
        "source", _wp_state_col(F.col("w")).alias("s"), "cnt"
    ).localCheckpoint(eager=True)
    for _, l, r, *_ in merges:
        cur = cur.select(
            "source", apply_wp_merge_col(F.col("s"), l, r).alias("s"), "cnt"
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


def wordpiece_fertility_sql(
    table: str, source_sql: str, text_sql: str, n_merges: int = 12
) -> str:
    """DuckDB twin of :func:`wordpiece_fertility`: the unrolled merge
    chain, then the per-(source, word) application chain, then one
    aggregate — bpe_fertility_sql with the ``##``-stripping fold."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    ctes, _ = _sql_wp_ctes(table, text_sql, n_merges, "wpf")
    toks = tokens_sql(text_sql)
    ctes.append(f"""
wpf_e0 AS MATERIALIZED (
  SELECT source, {_wp_state_sql('w')} AS s, cnt
  FROM (
    SELECT {source_sql} AS source, u.tok AS w, CAST(count(*) AS BIGINT) AS cnt
    FROM {table} t, UNNEST({toks}) AS u(tok)
    GROUP BY 1, 2
  )
)""")
    strip = (
        f"CASE WHEN starts_with(x, '{_CONT}') "
        f"THEN substring(x, {len(_CONT) + 1}) ELSE x END"
    )
    for k in range(1, n_merges + 1):
        fold = (
            f"list_reduce(string_split(s, {_DELIM_SQL}), (acc, x) -> "
            f"CASE WHEN x = m.r AND (acc = m.l OR ends_with(acc, {_DELIM_SQL} || m.l)) "
            f"THEN acc || {strip} ELSE acc || {_DELIM_SQL} || x END)"
        )
        ctes.append(f"""
wpf_e{k} AS MATERIALIZED (
  SELECT source, CASE WHEN m.l IS NULL THEN s ELSE {fold} END AS s, cnt
  FROM wpf_e{k - 1} LEFT JOIN wpf_m{k} m ON TRUE
)""")
    return f"""WITH {','.join(ctes)}
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(len(string_split(s, {_DELIM_SQL})) * cnt) AS BIGINT) AS n_tokens,
       CAST(sum(len(string_split(s, {_DELIM_SQL})) * cnt) AS DOUBLE)
         / CAST(sum(cnt) AS DOUBLE) AS fertility
FROM wpf_e{n_merges}
GROUP BY source
"""


def wordpiece_maxmatch_py(
    word: str, vocab: frozenset, max_piece_len: int, unk: str = "[UNK]"
) -> list:
    """Deploy-side WordPiece segmentation: greedy longest-match-first
    (MaxMatch — what BERT's tokenizer runs at inference; NOT always
    equal to training-merge replay, the known WordPiece train/deploy
    asymmetry). A word with any unmatchable position becomes one
    ``unk`` token, per the BERT reference behavior."""
    out = []
    pos = 0
    n = len(word)
    while pos < n:
        end = min(n, pos + max_piece_len)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = _CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        pos = end
    return out


def wordpiece_encode_udf(merges: list, alphabet: set):
    """Arrow-batched pandas UDF mapping text to ``array<string>``
    WordPiece tokens via MaxMatch under the trained vocab (alphabet +
    every merged symbol + their ``##`` forms). The 30k-entry production
    vocab is <2 MB riding the closure — broadcast-sized by
    construction; per-word results memoised per batch (Zipf)."""
    from pyspark.sql.types import ArrayType, StringType

    from rust_triplets_spark.functions.text import WS
    import re

    vocab = set()
    for ch in alphabet:
        vocab.add(ch)
        vocab.add(_CONT + ch)
    for row in merges:
        merged = row[3]
        vocab.add(merged)
        vocab.add(_CONT + merged)
    fvocab = frozenset(vocab)
    max_len = max((len(v) for v in fvocab), default=1)
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
            for w in ws.split(t):
                if not w:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = wordpiece_maxmatch_py(w, fvocab, max_len)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _encode
