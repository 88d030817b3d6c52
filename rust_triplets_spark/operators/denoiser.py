"""Three-gate OCR/markdown denoiser (SURVEY §2.3, reference
``src/preprocessor/backends/denoiser_preprocessor.rs``).

Gate semantics (denoiser_preprocessor.rs:221-268):

1. **markdown pipe-tables**: a trimmed line starting with ``|`` containing
   ≥ 2 ``|`` total is a table row; *separator* rows (only ``| - : space
   tab``) are dropped, header/data rows have pipes stripped and the cell
   text re-evaluated by gates 2-3;
2. **no-alpha**: lines with zero alphabetic characters are dropped;
3. **digit-ratio**: lines with ``digits/(digits+alpha) > max_digit_ratio``
   go through *iterative wave expansion* (seed keep-set with alpha tokens,
   rescue ±1 neighbors while the cumulative ratio stays within budget,
   denoiser_preprocessor.rs:70-140); if nothing survives the line drops.
   A section whose every line drops produces NO chunks (returns NULL).

Spark split: gates 1-2 and the gate-3 *predicate* are native array
expressions (JVM, codegen); the wave expansion is genuinely iterative and
runs as an Arrow-batched Pandas UDF — the one place in this engine where
Python touches row data, deliberately off the hot sampling path.
"""

from __future__ import annotations

import pandas as pd

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@dataclass(frozen=True)
class DenoiserConfig:
    """Mirrors src/config.rs:12-42."""

    enabled: bool = True
    max_digit_ratio: float = 0.35
    strip_markdown: bool = True


# Regexes shared by both engines (Java regex and DuckDB RE2 both support
# the \p{L} Unicode letter class). Alpha counting MUST be Unicode — the
# reference counts via Rust's is_alphabetic() and the Python twin via
# str.isalpha(); an ASCII [A-Za-z] class would drop whole non-Latin lines
# (Cyrillic, CJK, accented) that the reference keeps. Digits stay [0-9]
# (the reference counts is_ascii_digit only).
SEPARATOR_RE = "^[ \\t]*\\|[-|: \\t]*$"
TABLE_LINE_RE = "^[ \\t]*\\|.*\\|"  # trimmed starts with | and has >= 2 pipes
HAS_ALPHA_RE = "\\p{L}"
NON_ALPHA_RE = "[^\\p{L}]"
WS_SPLIT_RE = "[\\s\\p{Z}\\x{85}]+"  # Unicode whitespace, approximating Rust
# split_whitespace / Python str.split(): ASCII \s + Z-category separators + NEL


LINE_SPLIT_RE = "\\r\\n|\\r|\\n"  # regex split avoids engine-specific
# escape handling in string literals (DuckDB plain strings don't process \n)


def _lines(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, LINE_SPLIT_RE)


def _strip_pipes(line: Column) -> Column:
    """'| a | b |' -> 'a b' (strip_table_pipes, denoiser.rs:177-183)."""
    cells = F.filter(
        F.transform(F.split(line, "\\|"), lambda cell: F.trim(cell)),
        lambda cell: cell != F.lit(""),
    )
    return F.array_join(cells, " ")


def denoise_gates12_col(col, cfg: DenoiserConfig = DenoiserConfig()) -> Column:
    """Gates 1-2 plus the gate-3 *line-drop predicate* (ratio > budget ⇒
    drop the whole line — the conservative native approximation; the UDF
    path rescues tokens instead). NULL when every line is removed."""
    lines = _lines(col)

    # evaluate gate 1 ONCE per line into an array (separator rows → null),
    # then gates 2-3 run on the bound element — re-deriving `effective`
    # inside each gate predicate would re-run the pipe-strip transform and
    # regexes several times per line
    def gate1(line: Column) -> Column:
        if not cfg.strip_markdown:
            return line
        is_sep = line.rlike(SEPARATOR_RE)
        is_table = line.rlike(TABLE_LINE_RE)
        return F.when(is_sep, F.lit(None).cast("string")).otherwise(
            F.when(is_table, _strip_pipes(line)).otherwise(line)
        )

    def keep(eff: Column) -> Column:
        digits = F.length(F.regexp_replace(eff, "[^0-9]", "")).cast("double")
        alpha = F.length(F.regexp_replace(eff, NON_ALPHA_RE, "")).cast("double")
        ratio_ok = digits / (digits + alpha) <= F.lit(cfg.max_digit_ratio)
        # gate 2 is (alpha > 0) — a separate HAS_ALPHA rlike would be a
        # third regex pass per line for a predicate the count already holds
        return eff.isNotNull() & (alpha > 0) & ratio_ok

    cleaned = F.filter(F.transform(lines, gate1), keep)
    out = F.array_join(cleaned, "\n")
    return F.when(F.size(cleaned) > 0, out).otherwise(F.lit(None).cast("string"))


def denoise_gates12_sql(col: str, cfg: DenoiserConfig = DenoiserConfig()) -> str:
    """DuckDB twin of :func:`denoise_gates12_col`."""
    lines = f"regexp_split_to_array({col}, '{LINE_SPLIT_RE}')"
    strip = (
        "array_to_string(list_filter(list_transform(string_split(l, '|'), "
        "c -> trim(c)), c -> c <> ''), ' ')"
    )
    eff = (
        f"CASE WHEN regexp_matches(l, '{TABLE_LINE_RE}') THEN {strip} ELSE l END"
        if cfg.strip_markdown
        else "l"
    )
    digits = f"CAST(length(regexp_replace(({eff}), '[^0-9]', '', 'g')) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace(({eff}), '{NON_ALPHA_RE}', '', 'g')) AS DOUBLE)"
    sep = (
        f"NOT regexp_matches(l, '{SEPARATOR_RE}') AND "
        if cfg.strip_markdown
        else ""
    )
    keep = (
        f"{sep}({alpha}) > 0 "
        f"AND {digits} / ({digits} + {alpha}) <= {cfg.max_digit_ratio!r}"
    )
    cleaned = f"list_transform(list_filter({lines}, l -> {keep}), l -> {eff})"
    return (
        f"CASE WHEN len({cleaned}) > 0 THEN array_to_string({cleaned}, chr(10)) "
        f"ELSE NULL END"
    )


# ---------------------------------------------------------------------------
# full reference semantics (wave expansion) — NATIVE closed form
# ---------------------------------------------------------------------------
#
# The gate-3 iterative wave expansion (denoiser_preprocessor.rs:70-140) has
# a closed form: waves expand the keep-set outward from the alpha-seed
# tokens in whole distance-layers (wave k == the tokens at distance k from
# the nearest seed), admitted while the CUMULATIVE digit-ratio through
# layer k stays within budget, stopping at the first violation. So
#
#   K    = min{k >= 1 : cum_ratio(k) > budget} - 1   (else infinity)
#   keep = {token : dist_to_nearest_seed <= K}
#
# which is pure window arithmetic — no iteration, no Python. Both engines
# run the identical expression tree; distances are contiguous integers, so
# the layer walk is exactly the reference's wave order.


def _bind(arr_expr, fn):
    """Bind an array expression as a lambda variable so ``fn`` can reference
    it many times without Catalyst inlining (and re-evaluating) the whole
    sub-expression at every use — the 1-element-array trick (see
    dedup.shingle_fingerprints_col for the measured blowup this avoids)."""
    return F.element_at(F.transform(F.array(arr_expr), fn), 1)


def _wave_retained(eff: Column, budget: float) -> Column:
    """Gate-3 wave expansion over one line, as a single column expression
    (the closed form above): tokens, per-token digit/alpha counts, distance
    to the nearest alpha-seed token, one fold over the distance layers to
    find K, then the kept tokens re-joined. Empty result → empty string."""
    INF = 1_000_000_000
    toks_expr = F.filter(F.split(eff, WS_SPLIT_RE), lambda t: t != F.lit(""))

    def with_toks(tk):
        cnts_expr = F.transform(
            tk,
            lambda t: F.struct(
                F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double").alias("d"),
                F.length(F.regexp_replace(t, NON_ALPHA_RE, "")).cast("double").alias("a"),
            ),
        )

        def with_cnts(cnts):
            n = F.size(cnts)
            seeds_expr = F.filter(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.element_at(cnts, i)["a"] > 0,
            )

            def with_seeds(seeds):
                dist_expr = F.transform(
                    F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                    lambda i: F.coalesce(
                        F.array_min(F.transform(seeds, lambda s2: F.abs(s2 - i))),
                        F.lit(INF),
                    ),
                )

                def with_dist(dst):
                    layers = F.array_sort(F.array_distinct(dst))

                    def layer_sum(field, k):
                        return F.aggregate(
                            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                            F.lit(0.0),
                            lambda acc, i: acc
                            + F.when(
                                (F.element_at(dst, i) == k) & (n > 0),
                                F.element_at(cnts, i)[field],
                            ).otherwise(F.lit(0.0)),
                        )

                    fold = F.aggregate(
                        layers,
                        F.struct(
                            F.lit(0.0).alias("cd"),
                            F.lit(0.0).alias("ca"),
                            F.lit(INF).alias("kk"),
                            F.lit(False).alias("stop"),
                        ),
                        lambda acc, k: F.when(acc["stop"], acc).otherwise(
                            _fold_step(acc, k, layer_sum("d", k), layer_sum("a", k), budget)
                        ),
                        lambda acc: acc["kk"],
                    )

                    def with_kk(kkarr):
                        kk = F.element_at(kkarr, 1)
                        kept = F.filter(
                            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                            lambda i: (n > 0) & (F.element_at(dst, i) <= kk),
                        )
                        return F.when(n == 0, F.lit("")).otherwise(
                            F.array_join(
                                F.transform(kept, lambda i: F.element_at(tk, i)), " "
                            )
                        )

                    return _bind(F.array(fold), with_kk)

                return _bind(dist_expr, with_dist)

            return _bind(seeds_expr, with_seeds)

        return _bind(cnts_expr, with_cnts)

    return _bind(toks_expr, with_toks)


def _fold_step(acc, k, ld, la, budget: float):
    ncd = acc["cd"] + ld
    nca = acc["ca"] + la
    fail = (k >= 1) & (ncd / (ncd + nca) > F.lit(budget))
    return F.when(
        fail,
        F.struct(
            acc["cd"].alias("cd"), acc["ca"].alias("ca"),
            (k - 1).alias("kk"), F.lit(True).alias("stop"),
        ),
    ).otherwise(
        F.struct(
            ncd.alias("cd"), nca.alias("ca"),
            acc["kk"].alias("kk"), F.lit(False).alias("stop"),
        )
    )


def denoise_doc_col(col, cfg: DenoiserConfig = DenoiserConfig()) -> Column:
    """The ENTIRE three-gate denoiser — wave expansion included — as one
    column expression: lines → per-line gates → reassembly, all row-local.
    No explode, no window, no join, no shuffle: the ideal narrow-map shape
    at corpus scale (an earlier explode+window formulation was measured
    ~2x slower at sf0.1 and cost five shuffles). NULL when every line
    drops."""
    if not cfg.enabled:
        return F.col(col) if isinstance(col, str) else col
    budget = float(cfg.max_digit_ratio)

    def per_line(line):
        if cfg.strip_markdown:
            is_sep = line.rlike(SEPARATOR_RE)
            eff = F.when(line.rlike(TABLE_LINE_RE), _strip_pipes(line)).otherwise(line)
        else:
            is_sep = F.lit(False)
            eff = line

        def with_eff(effb):
            e = F.element_at(effb, 1)
            d = F.length(F.regexp_replace(e, "[^0-9]", "")).cast("double")
            a = F.length(F.regexp_replace(e, NON_ALPHA_RE, "")).cast("double")
            retained = _wave_retained(e, budget)
            return (
                F.when(a == 0, F.lit(None).cast("string"))
                .when(d / (d + a) <= budget, e)
                .otherwise(F.when(retained != "", retained))
            )

        return F.when(is_sep, F.lit(None).cast("string")).otherwise(
            _bind(F.array(eff), with_eff)
        )

    cleaned = F.filter(F.transform(_lines(col), per_line), lambda x: x.isNotNull())
    return F.when(F.size(cleaned) > 0, F.array_join(cleaned, "\n"))


def denoise_full(df: DataFrame, id_col: str, text_col: str,
                 cfg: DenoiserConfig = DenoiserConfig()) -> DataFrame:
    """All three gates with EXACT gate-3 wave-expansion semantics, fully
    native (the Pandas-UDF path below remains as the cross-check).
    Returns (id, text_clean); NULL when every line drops."""
    return df.select(
        F.col(id_col).alias("id"), denoise_doc_col(text_col, cfg).alias("text_clean")
    )


def denoise_full_sql(table: str, id_sql: str, text_sql: str,
                     cfg: DenoiserConfig = DenoiserConfig()) -> str:
    """DuckDB twin of :func:`denoise_full` — identical layer arithmetic."""
    budget = float(cfg.max_digit_ratio)
    strip = (
        "array_to_string(list_filter(list_transform(string_split(line, '|'), "
        "c -> trim(c)), c -> c <> ''), ' ')"
    )
    eff = (
        f"CASE WHEN regexp_matches(line, '{TABLE_LINE_RE}') THEN {strip} ELSE line END"
        if cfg.strip_markdown
        else "line"
    )
    sep_filter = (
        f"WHERE NOT regexp_matches(line, '{SEPARATOR_RE}')"
        if cfg.strip_markdown
        else ""
    )
    return f"""
WITH src AS MATERIALIZED (SELECT {id_sql} AS id, {text_sql} AS t FROM {table}),
lines0 AS (
  SELECT id, CAST(u.i - 1 AS BIGINT) AS lineno, arr[u.i] AS line
  FROM (SELECT id, regexp_split_to_array(t, '{LINE_SPLIT_RE}') AS arr FROM src),
       UNNEST(range(1, len(arr) + 1)) AS u(i)
),
lines AS (
  SELECT id, lineno, {eff} AS eff FROM lines0 {sep_filter}
),
g2 AS (
  SELECT id, lineno, eff,
         CAST(length(regexp_replace(eff, '[^0-9]', '', 'g')) AS DOUBLE) AS d,
         CAST(length(regexp_replace(eff, '{NON_ALPHA_RE}', '', 'g')) AS DOUBLE) AS a
  FROM lines
  WHERE length(regexp_replace(eff, '{NON_ALPHA_RE}', '', 'g')) > 0
),
easy AS (SELECT id, lineno, eff AS out_line FROM g2 WHERE d / (d + a) <= {budget!r}),
hard AS (SELECT id, lineno, eff FROM g2 WHERE d / (d + a) > {budget!r}),
toks AS (
  SELECT id, lineno, CAST(u.i - 1 AS BIGINT) AS pos, tarr[u.i] AS tok,
         CAST(length(regexp_replace(tarr[u.i], '[^0-9]', '', 'g')) AS DOUBLE) AS td,
         CAST(length(regexp_replace(tarr[u.i], '{NON_ALPHA_RE}', '', 'g')) AS DOUBLE) AS ta
  FROM (SELECT id, lineno,
               list_filter(string_split_regex(eff, '{WS_SPLIT_RE}'), x -> x <> '') AS tarr
        FROM hard),
       UNNEST(range(1, len(tarr) + 1)) AS u(i)
),
dists AS (
  SELECT *, least(
    coalesce(pos - max(CASE WHEN ta > 0 THEN pos END) OVER
      (PARTITION BY id, lineno ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1000000000),
    coalesce(min(CASE WHEN ta > 0 THEN pos END) OVER
      (PARTITION BY id, lineno ORDER BY pos ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) - pos, 1000000000)
  ) AS dist
  FROM toks
),
layers AS (
  SELECT id, lineno, dist, sum(td) AS ld, sum(ta) AS la
  FROM dists GROUP BY 1, 2, 3
),
cum AS (
  SELECT *, sum(ld) OVER w AS cd, sum(la) OVER w AS ca
  FROM layers
  WINDOW w AS (PARTITION BY id, lineno ORDER BY dist ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
kmax AS (
  SELECT id, lineno,
         coalesce(min(CASE WHEN dist >= 1 AND cd / (cd + ca) > {budget!r} THEN dist END) - 1,
                  1000000000) AS kk
  FROM cum GROUP BY 1, 2
),
retained AS (
  SELECT t.id, t.lineno, string_agg(t.tok, ' ' ORDER BY t.pos) AS out_line
  FROM dists t JOIN kmax k ON k.id = t.id AND k.lineno = t.lineno
  WHERE t.dist <= k.kk
  GROUP BY 1, 2
),
alllines AS (SELECT * FROM easy UNION ALL SELECT * FROM retained),
docs AS (
  SELECT id, string_agg(out_line, chr(10) ORDER BY lineno) AS text_clean
  FROM alllines GROUP BY id
)
SELECT s.id, d.text_clean FROM src s LEFT JOIN docs d USING (id)
"""


# ---------------------------------------------------------------------------
# full reference semantics (wave expansion) — Python + Pandas UDF
# ---------------------------------------------------------------------------

def _count_digit_alpha(text: str) -> tuple[int, int]:
    d = sum(ch.isdigit() and ch.isascii() for ch in text)
    a = sum(ch.isalpha() for ch in text)
    return d, a


def _strip_digit_tokens(line: str, max_digit_ratio: float) -> str:
    """Iterative wave expansion (denoiser_preprocessor.rs:70-140)."""
    tokens = line.split()
    if not tokens:
        return ""
    n = len(tokens)
    counts = [_count_digit_alpha(t) for t in tokens]
    keep = [any(c.isalpha() for c in t) for t in tokens]
    d = sum(counts[i][0] for i in range(n) if keep[i])
    a = sum(counts[i][1] for i in range(n) if keep[i])
    while True:
        wave = [
            i for i in range(n)
            if not keep[i] and ((i > 0 and keep[i - 1]) or (i + 1 < n and keep[i + 1]))
        ]
        if not wave:
            break
        wd = sum(counts[i][0] for i in wave)
        wa = sum(counts[i][1] for i in wave)
        total = d + wd + a + wa
        ratio = 0.0 if total == 0 else (d + wd) / total
        if ratio > max_digit_ratio:
            break
        for i in wave:
            keep[i] = True
        d += wd
        a += wa
    return " ".join(t for i, t in enumerate(tokens) if keep[i])


def denoise_text_py(text: str, cfg: DenoiserConfig = DenoiserConfig()) -> str | None:
    """Full reference pipeline (denoise_text, denoiser.rs:221-268)."""
    if not cfg.enabled:
        return text
    out: list[str] = []
    for line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        trimmed = line.strip()
        effective = line
        if cfg.strip_markdown and trimmed.startswith("|") and trimmed.count("|") >= 2:
            if all(c in "|-: \t" for c in trimmed):
                continue  # separator row
            effective = " ".join(c.strip() for c in line.split("|") if c.strip())
        d, a = _count_digit_alpha(effective)
        if a == 0:
            continue
        ratio = 0.0 if d + a == 0 else d / (d + a)
        if ratio > cfg.max_digit_ratio:
            retained = _strip_digit_tokens(effective, cfg.max_digit_ratio)
            if retained:
                out.append(retained)
        else:
            out.append(effective)
    return "\n".join(out) if out else None


def denoise_udf(cfg: DenoiserConfig = DenoiserConfig()):
    """Arrow-batched Pandas UDF wrapping :func:`denoise_text_py`."""
    @F.pandas_udf(StringType())
    def _denoise(s: pd.Series) -> pd.Series:
        return s.map(lambda t: denoise_text_py(t, cfg) if t is not None else None)

    return _denoise
