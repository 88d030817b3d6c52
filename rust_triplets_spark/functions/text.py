"""Scalar text functions (SURVEY §2.2) — whitespace normalization, the
whitespace tokenizer, sentence splitting, and the text-analysis extensions
(language ID, quality scoring, fingerprinting).

Everything here except the sentence splitter is a native column expression
(JVM-side, codegen'd). Each portable function has a DuckDB SQL twin so the
driver's oracle can replay it.

Whitespace: the reference uses Rust's Unicode-aware ``split_whitespace``
(src/tokenizer.rs:25-65, src/utils.rs:18-33). For cross-engine parity we pin
an explicit ASCII class (Java regex and RE2 disagree on ``\\s`` — Java
includes U+000B, RE2 does not); Unicode spaces in real corpora should be
normalized at ingest.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from rust_triplets_spark.functions.hashing import M31, hash31_str_col, hash31_str_sql, mix31_col

WS = "[ \\t\\n\\r\\f]+"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# normalization / tokenization
# ---------------------------------------------------------------------------

def normalize_inline_whitespace_col(col) -> Column:
    """Collapse whitespace runs to single spaces and trim
    (src/utils.rs:18-33)."""
    return F.trim(F.regexp_replace(_c(col), WS, " "))


def normalize_inline_whitespace_sql(col: str) -> str:
    return f"trim(regexp_replace({col}, '{WS}', ' ', 'g'))"


def tokens_col(col) -> Column:
    """Whitespace tokenizer (src/tokenizer.rs:25-65): split on whitespace
    runs, drop empty tokens (leading/trailing whitespace artifacts)."""
    return F.filter(F.split(F.trim(_c(col)), WS), lambda t: t != F.lit(""))


def tokens_sql(col: str) -> str:
    return f"list_filter(regexp_split_to_array(trim({col}), '{WS}'), t -> t <> '')"


def token_count_col(col) -> Column:
    """``token_count`` (src/tokenizer.rs:57-65) as BIGINT."""
    return F.size(tokens_col(col)).cast("long")


def token_count_sql(col: str) -> str:
    return f"CAST(len({tokens_sql(col)}) AS BIGINT)"


# ---------------------------------------------------------------------------
# sentence splitting (src/utils.rs:37-121) — genuinely iterative; Python UDF
# applied batch-wise. Used by ingest, not the hot sampling path.
# ---------------------------------------------------------------------------

_ABBREV_SAFE = None  # placeholder: heuristics below mirror the reference


def split_sentences_py(text: str) -> list[str]:
    """Heuristic sentence splitter mirroring src/utils.rs:37-121:
    paragraphs split on blank lines; sentence boundary on ``.!?`` followed by
    whitespace, except decimals (``3.14``), dot-tickers (``BRK.B``), and
    ellipses (``...``)."""
    out: list[str] = []
    for block in text.split("\n\n"):
        block = " ".join(block.split())
        if not block:
            continue
        cur: list[str] = []
        i = 0
        n = len(block)
        while i < n:
            ch = block[i]
            cur.append(ch)
            if ch in ".!?":
                nxt = block[i + 1] if i + 1 < n else " "
                prev = block[i - 1] if i > 0 else " "
                is_ellipsis = ch == "." and (nxt == "." or prev == ".")
                # decimal (3.14) or ticker (BRK.B): alnum on both sides of '.'
                is_inner = ch == "." and prev.isalnum() and nxt.isalnum()
                if not is_ellipsis and not is_inner and nxt.isspace():
                    sent = "".join(cur).strip()
                    if sent:
                        out.append(sent)
                    cur = []
                    i += 1  # consume the boundary space
            i += 1
        tail = "".join(cur).strip()
        if tail:
            out.append(tail)
    return out


def split_sentences_udf():
    @F.pandas_udf(ArrayType(StringType()))
    def _split(s: pd.Series) -> pd.Series:
        return s.map(lambda t: split_sentences_py(t) if t is not None else None)

    return _split


# Native (JVM-side, oracle-checkable) sentence splitter. Same contract as
# split_sentences_py for the reference's tested cases (decimals, tickers,
# ellipses — src/utils.rs:161-255): a boundary is `.!?` followed by a space
# (post-normalization), EXCEPT a '.' preceded by another '.' (ellipsis).
# Decimals (3.14) and tickers (BRK.B) need no special casing — their '.' is
# not followed by whitespace. Capture-group rewriting instead of lookbehind
# keeps the regexes inside both Java-regex (Spark) and RE2 (DuckDB).
_SENT_MARK = "\x01"


def sentences_native_col(col) -> Column:
    """Array of sentences: blocks on blank lines, whitespace-normalized,
    boundary-marked, split, trimmed, empties dropped."""

    def per_block(b):
        norm = F.trim(F.regexp_replace(b, WS, " "))
        marked = F.regexp_replace(norm, "([!?]) ", "$1" + _SENT_MARK)
        marked = F.regexp_replace(marked, "([^.])(\\.) ", "$1$2" + _SENT_MARK)
        return F.split(marked, _SENT_MARK)

    sents = F.flatten(F.transform(F.split(_c(col), "\n\n"), per_block))
    return F.filter(F.transform(sents, F.trim), lambda s: s != F.lit(""))


def sentences_native_sql(col: str) -> str:
    norm = f"trim(regexp_replace(b, '{WS}', ' ', 'g'))"
    m1 = f"regexp_replace({norm}, '([!?]) ', '\\1' || chr(1), 'g')"
    m2 = f"regexp_replace({m1}, '([^.])(\\.) ', '\\1\\2' || chr(1), 'g')"
    return (
        f"list_filter(list_transform(flatten(list_transform("
        f"string_split({col}, chr(10) || chr(10)), b -> string_split({m2}, chr(1)))), "
        f"s -> trim(s)), s -> s <> '')"
    )


# ---------------------------------------------------------------------------
# text analysis extensions (driver north star; not in the reference)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenization (GPT-2-style coarse classes, no merges): letter
# runs, digit runs, and non-space punctuation runs each count as one token.
# The class is spelled out (no \s) because Java regex and RE2 disagree on
# \s (U+000B).
BPE_WORD = "[A-Za-z]+"
BPE_DIGIT = "[0-9]+"
BPE_PUNCT = "[^A-Za-z0-9 \\t\\n\\r\\f]+"
BPE_TOKEN = f"{BPE_WORD}|{BPE_DIGIT}|{BPE_PUNCT}"


def bpe_token_count_col(col, pattern: str = BPE_TOKEN) -> Column:
    """Count BPE-ish pre-tokens (JVM-side regexp_count)."""
    return F.regexp_count(_c(col), F.lit(pattern)).cast("long")


def bpe_token_count_sql(col: str, pattern: str = BPE_TOKEN) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{pattern}')) AS BIGINT)"


STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def lang_id_col(col) -> Column:
    """N-gram-free language-ID heuristic: stopword hit-rate per language,
    argmax with alphabetical tie-break; 'und' (undetermined) when no hits.

    Single pass: tokenize + lowercase ONCE, fold per-language hit counts
    through one ``aggregate`` (the accumulator is a bound lambda variable,
    so referencing it per language does not re-evaluate any subtree), then
    argmax inside the finish lambda via ``array_max`` over
    ``(score, -rank, lang)`` structs — lexicographic struct order gives
    highest score, ties to the alphabetically first language. A when-chain
    fold with the tokenizer inlined per reference grows the expression
    tree exponentially (measured 19.5 s → ~1 s at sf0.1)."""
    langs = sorted(STOPWORDS)
    lower_toks = F.transform(tokens_col(col), F.lower)
    zero = F.array(*[F.lit(0).cast("long") for _ in langs])
    sws = [F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs]

    def merge(acc, t):
        return F.array(*[
            acc[i] + F.array_contains(sws[i], t).cast("long") for i in range(len(langs))
        ])

    def finish(acc):
        entries = [
            F.struct(acc[i].alias("s"), F.lit(-i).cast("long").alias("r"),
                     F.lit(lang).alias("l"))
            for i, lang in enumerate(langs)
        ]
        best = F.array_max(F.array(*entries))
        return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))

    return F.aggregate(lower_toks, zero, merge, finish)


def lang_id_sql(col: str) -> str:
    toks = f"list_transform({tokens_sql(col)}, t -> lower(t))"
    score = {
        lang: f"CAST(len(list_filter({toks}, t -> list_contains({STOPWORDS[lang]!r}, t))) AS BIGINT)"
        for lang in sorted(STOPWORDS)
    }
    # same fold order as the Column version: later langs win only on strict >
    expr_lang, expr_score = "'und'", "CAST(0 AS BIGINT)"
    for lang, sc in score.items():
        expr_lang = f"CASE WHEN {sc} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {sc} > {expr_score} THEN {sc} ELSE {expr_score} END"
    return expr_lang


def quality_score_col(col) -> Column:
    """Cheap quality score in [0,1]: blend of length signal, alpha ratio,
    stopword ratio, and mean token length sanity. Deterministic double math
    (identical expression tree in the SQL twin)."""
    toks = tokens_col(col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(_c(col)).cast("double")
    alpha = F.length(F.regexp_replace(_c(col), "[^A-Za-z]", "")).cast("double")
    all_sw = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(all_sw, F.lower(t)))).cast("double")
    len_sig = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    tok_sane = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_sig * F.lit(0.3) + alpha_ratio * F.lit(0.3)
            + F.least(sw_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.2) + tok_sane * F.lit(0.2))


def quality_score_sql(col: str) -> str:
    toks = tokens_sql(col)
    all_sw = [w for ws in STOPWORDS.values() for w in ws]
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    n_chars = f"CAST(length({col}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    sw_hits = f"CAST(len(list_filter({toks}, t -> list_contains({all_sw!r}, lower(t)))) AS DOUBLE)"
    len_sig = f"least({n_tok} / 100.0, 1.0)"
    alpha_ratio = f"CASE WHEN {n_chars} > 0 THEN {alpha} / {n_chars} ELSE 0.0 END"
    sw_ratio = f"CASE WHEN {n_tok} > 0 THEN {sw_hits} / {n_tok} ELSE 0.0 END"
    mean_tok = f"CASE WHEN {n_tok} > 0 THEN {n_chars} / {n_tok} ELSE 0.0 END"
    tok_sane = f"CASE WHEN {mean_tok} >= 3.0 AND {mean_tok} <= 12.0 THEN 1.0 ELSE 0.5 END"
    return (f"({len_sig} * 0.3 + ({alpha_ratio}) * 0.3 "
            f"+ least(({sw_ratio}) * 4.0, 1.0) * 0.2 + ({tok_sane}) * 0.2)")


def fingerprint_col(col, seed: int = 42) -> Column:
    """Order-aware document fingerprint: position-weighted sum of token
    hashes mod M31, mixed with the token count. Rolling-hash flavored but
    commutative-sum based so it distributes (partial aggregation works)."""
    toks = tokens_col(col)
    # index-aware transform binds each token once — element_at(tokens_expr, i)
    # would re-evaluate the tokenizer split per access (O(n²) blowup)
    weighted = F.aggregate(
        F.transform(
            toks,
            lambda t, i: F.pmod(
                hash31_str_col(t, seed) * F.pmod((i + 1).cast("long"), F.lit(M31)),
                F.lit(M31),
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc + x, F.lit(M31)),
    )
    return (
        F.when(F.size(toks) > 0, mix31_col([weighted, F.size(toks)], seed))
        .otherwise(F.lit(0).cast("long"))
    )


def fingerprint_sql(col: str, seed: int = 42) -> str:
    from rust_triplets_spark.functions.hashing import mix31_sql

    toks = tokens_sql(col)
    # NB: outer lambda var must NOT be `i` — strfold_sql's inner
    # char-iteration lambda uses `i` and would capture it
    th = hash31_str_sql(f"({toks})[j]", seed)
    weighted = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len({toks}) + 1), "
        f"j -> ({th} * (CAST(j AS BIGINT) % {M31})) % {M31})), (acc, x) -> (acc + x) % {M31})"
    )
    mixed = mix31_sql([weighted, f"len({toks})"], seed)
    return f"CAST(CASE WHEN len({toks}) > 0 THEN {mixed} ELSE 0 END AS BIGINT)"


def fingerprint_agg_sql(table: str, id_sql: str, text_sql: str, seed: int = 42) -> str:
    """Full-query DuckDB twin of :func:`fingerprint_col` that hash-
    accumulates ROW-WISE instead of through nested list lambdas.

    The scalar :func:`fingerprint_sql` inlines ``tokens_sql`` (a regexp
    split) inside a per-token lambda whose ``hash31_str_sql`` body iterates
    per CHARACTER — DuckDB re-evaluates the tokenizer for every character
    access, which measured 26 min at sf1 (SCALE.md). This twin tokenizes
    once per document, UNNESTs to (doc, position, token) rows so each
    token is a plain VARCHAR column hashed exactly once, and folds with a
    modular SUM. ``sum(x) % M31`` equals the sequential
    ``(acc + x) % M31`` fold because modular addition is associative and
    every addend is already reduced mod M31 (and the unreduced BIGINT sum
    cannot overflow: < M31 × token_count ≤ 2^31 × 2^32). Returns
    (doc_id, fingerprint) — value-identical to the scalar twin, pinned by
    test_text_functions parity."""
    from rust_triplets_spark.functions.hashing import mix31_sql

    th = hash31_str_sql("tok", seed)
    mixed = mix31_sql(["w", "n"], seed)
    return f"""
WITH __fp_toks AS (
  SELECT CAST({id_sql} AS BIGINT) AS doc_id, {tokens_sql(text_sql)} AS tokens
  FROM {table}
), __fp_rows AS (
  SELECT doc_id, tokens[j] AS tok, CAST(j AS BIGINT) AS j
  FROM __fp_toks, UNNEST(range(1, len(tokens) + 1)) AS r(j)
), __fp_agg AS (
  SELECT doc_id, sum(({th} * (j % {M31})) % {M31}) % {M31} AS w,
         CAST(count(*) AS BIGINT) AS n
  FROM __fp_rows GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(CASE WHEN a.doc_id IS NOT NULL THEN {mixed} ELSE 0 END AS BIGINT) AS fingerprint
FROM __fp_toks t LEFT JOIN __fp_agg a ON a.doc_id = t.doc_id
"""
