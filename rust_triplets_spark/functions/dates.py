"""Folder-name publication-date parsing — all four reference formats
(src/source/indexing/date_helpers.rs:6-95), as native column expressions
with DuckDB SQL twins:

1. plain folder: ``MM-DD-YYYY`` or ``YYYY-MM-DD`` (``-`` or ``_``
   separators, strict full-string match, no trimming);
2. year folder + date folder: ``2026/02-14-2026``, ``2026/02-14``,
   ``--suffix`` stripped, trimmed (``date_helpers.rs:20-37``) — the whole
   parse fails when the year string is not an integer;
3. bare ``MM-DD`` completed with the year folder, extra ``-parts``
   ignored (``parse_month_day`` reads only the first two, rs:55-65);
4. month-range folder: ``"Dec 2025 + Jan 2026"`` → last month token +
   year folder, day 1 (rs:41-51, 68-95).

Both engines parse via regex-guarded ``try_*`` conversions: the guards
pin chrono's strict semantics (DuckDB's ``strptime`` tolerates
surrounding whitespace, chrono does not) and make the Spark and DuckDB
expression trees accept exactly the same language.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MDY_RE = "^[0-9]{1,2}-[0-9]{1,2}-[0-9]{4}$"
_YMD_RE = "^[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}$"
_MD_RE = "^([0-9]{1,2})-([0-9]{1,2})(-.*)?$"

# every alias the reference accepts (month_token_to_number, rs:80-95);
# all map to the month number via their first three letters.
_MONTH_TOKENS = (
    "jan", "january", "feb", "february", "mar", "march", "apr", "april",
    "may", "jun", "june", "jul", "july", "aug", "august",
    "sep", "sept", "september", "oct", "october", "nov", "november",
    "dec", "december",
)
_ABBR3 = ("jan", "feb", "mar", "apr", "may", "jun",
          "jul", "aug", "sep", "oct", "nov", "dec")


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _norm(folder) -> Column:
    return F.regexp_replace(_col(folder), "_", "-")


def folder_date_col(folder) -> Column:
    """``parse_publication_date_from_folder`` (rs:6-16): strict
    ``MM-DD-YYYY`` then ``YYYY-MM-DD`` on the ``_``→``-`` normalized name."""
    n = _norm(folder)
    return (
        F.when(n.rlike(_MDY_RE), F.try_to_date(n, "M-d-yyyy"))
        .when(n.rlike(_YMD_RE), F.try_to_date(n, "yyyy-M-d"))
    )


def folder_date_sql(folder_sql: str) -> str:
    # plain inline expression (no CTE/subquery): must stay usable as a
    # correlated scalar inside generated oracle queries.
    s = f"replace({folder_sql}, '_', '-')"
    return f"""CASE
    WHEN regexp_matches({s}, '{_MDY_RE}') THEN CAST(try_strptime({s}, '%m-%d-%Y') AS DATE)
    WHEN regexp_matches({s}, '{_YMD_RE}') THEN CAST(try_strptime({s}, '%Y-%m-%d') AS DATE)
  END"""


def year_folder_date_col(year_str, folder) -> Column:
    """``parse_publication_date_from_year_folder`` (rs:20-37): requires an
    integer year; strips ``--suffix``; trims; tries the two full formats,
    then ``MM-DD`` (first two dash-parts) completed with the year."""
    year = F.try_to_number(_col(year_str), F.lit("9999999999"))
    core = F.regexp_replace(F.trim(F.substring_index(_col(folder), "--", 1)), "_", "-")
    md = F.concat(
        _col(year_str).cast("string"), F.lit("-"),
        F.regexp_extract(core, _MD_RE, 1), F.lit("-"),
        F.regexp_extract(core, _MD_RE, 2),
    )
    return F.when(
        year.isNotNull(),
        F.coalesce(folder_date_col(core), F.try_to_date(md, "y-M-d")),
    )


_YEAR_DIGITS_RE = "^[0-9]{1,10}$"  # mirrors Spark try_to_number('9999999999'):
# digits only, no sign, no surrounding whitespace (try_cast alone would trim
# and accept '+2026' — chrono's str::parse does not)


def year_folder_date_sql(year_sql: str, folder_sql: str) -> str:
    y = f"CAST({year_sql} AS VARCHAR)"
    s = f"replace(trim(split_part({folder_sql}, '--', 1)), '_', '-')"
    return f"""CASE WHEN regexp_matches({y}, '{_YEAR_DIGITS_RE}') THEN
    coalesce(
      {folder_date_sql(f"trim(split_part({folder_sql}, '--', 1))")},
      CAST(try_strptime(
        {y} || '-' || regexp_extract({s}, '{_MD_RE}', 1) || '-' || regexp_extract({s}, '{_MD_RE}', 2),
        '%Y-%m-%d') AS DATE)
    )
  END"""


def _month_from_token(tok: Column) -> Column:
    """Lower-cased month token → month number (1-12) via 3-letter prefix."""
    three = F.substring(tok, 1, 3)
    out = F.lit(None).cast("int")
    for i, abbr in enumerate(_ABBR3, start=1):
        out = F.when(three == abbr, F.lit(i)).otherwise(out)
    return out


def month_range_date_col(year_str, folder) -> Column:
    """``parse_publication_date_from_month_range_folder`` (rs:41-51):
    split on non-alphanumerics, keep month-name tokens, take the LAST one
    (``"Dec 2025 + Jan 2026"`` → Jan), anchor to day 1 of the year folder."""
    year = F.try_to_number(_col(year_str), F.lit("9999999999")).cast("int")
    toks = F.filter(
        F.split(F.lower(_col(folder)), "[^a-z0-9]+"),
        lambda t: t.isin(*_MONTH_TOKENS),
    )
    last = F.try_element_at(toks, F.lit(-1))
    month = _month_from_token(last)
    ymd = F.concat_ws("-", year.cast("string"), month.cast("string"), F.lit("1"))
    return F.when(year.isNotNull() & month.isNotNull(), F.try_to_date(ymd, "y-M-d"))


def month_range_date_sql(year_sql: str, folder_sql: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _MONTH_TOKENS)
    whens = "\n      ".join(
        f"WHEN '{abbr}' THEN {i}" for i, abbr in enumerate(_ABBR3, start=1)
    )
    last_tok = f"""list_filter(
        string_split_regex(lower({folder_sql}), '[^a-z0-9]+'),
        tok -> list_contains([{toks}], tok)
      )[-1]"""
    mo = f"""CASE substr({last_tok}, 1, 3)
      {whens}
    END"""
    ys = f"CAST({year_sql} AS VARCHAR)"
    y = f"try_cast({ys} AS BIGINT)"
    return f"""CASE WHEN regexp_matches({ys}, '{_YEAR_DIGITS_RE}') AND ({mo}) IS NOT NULL
    THEN CAST(try_strptime({y} || '-' || ({mo}) || '-1', '%Y-%m-%d') AS DATE) END"""
