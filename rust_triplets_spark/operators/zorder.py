"""Z-order (Morton) data layout + a measured scan-pruning audit.

The 100 TB lever this operator encodes: at scale, the dominant cost of a
selective query is HOW MANY FILES the scan must open, and that is purely
a function of data LAYOUT — every columnar format (parquet row groups,
Delta/Iceberg data files) carries per-file min/max statistics that let
the planner skip files whose range cannot match. A table laid out in
arrival order clusters only its arrival dimension; a multi-dimensional
workload ("this user's events in this window") then overlaps EVERY file.
Interleaving the bits of the quantized dimensions (the Z-order / Morton
curve — Morton 1966; the technique behind Delta OPTIMIZE ZORDER and
Iceberg sort orders) makes file ranges tight in ALL interleaved
dimensions at once.

This module does the whole loop, engine-exactly:

1. quantize each dimension to ``bits`` integer buckets over its global
   min/max (pure BIGINT math),
2. interleave the bits into the z-key (shift/and/or expressions — no
   UDF),
3. assign rows to ``n_files`` equal-count files by z-key rank — the
   global rank runs on :func:`functions.ordering.bucketed_position`
   (range-bucketed parallel rank), NEVER a single-partition window,
4. compute each file's per-dimension min/max — exactly the stats a
   parquet footer would carry,
5. replay a deterministic probe workload (dimension slices + combined
   cells) against those stats for THREE layouts — Hilbert, Z-order,
   arrival order — and report files-scanned side by side (measured at
   sf0.01: Hilbert 3 files/cell vs Morton 4-5 vs arrival 8-9 of 32;
   the curve-locality textbook result, now a number, not folklore).

The output is the pruning-effectiveness table a layout decision needs,
and the whole computation is integer arithmetic shared verbatim with the
DuckDB twin (the oracle keeps the plain ``row_number`` form of the rank;
``bucketed_position``'s equality to it is its own contract). The
row-level probe match counts ride a broadcast nested-loop against the
tiny probe frame — linear × n_probes, map-only, no shuffle.

Scale shape: two global aggregates (bounds), one parallel rank, one
``n_files``-row stats aggregate per layout, and one broadcast
nested-loop — nothing quadratic, no blob columns, no driver collect
beyond the bounded stats frames Spark aggregates anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rust_triplets_spark.functions.caching import cache_scoped
from rust_triplets_spark.functions.ordering import (
    bucketed_position,
    bucketed_position_numeric,
)

DEFAULT_BITS = 8
DEFAULT_FILES = 32
DEFAULT_SLICES = 4


def quantize_col(v: str, vmin: str, vmax: str, bits: int) -> Column:
    """``(v - vmin) * 2^bits // (vmax - vmin + 1)`` on BIGINT (named
    columns; ``DIV`` is Spark's integer division — epoch-micro scale
    values overflow double-precision float division, so never ``/``) —
    monotone, engine-exact, in ``[0, 2^bits)`` for ``v`` in
    ``[vmin, vmax]``.

    Precondition: ``(vmax - vmin) < 2^(63-bits)`` or the BIGINT product
    overflows — Spark (non-ANSI) would silently wrap where DuckDB raises,
    so the expression guards it with ``assert_true`` and BOTH engines
    fail loudly instead of diverging (r10 advice). Epoch-micros at
    ``bits<=16`` sit ~5 orders of magnitude under the bound; the guard
    exists for arbitrary integer columns the public API accepts."""
    lim = 1 << (63 - bits)
    guard = F.expr(
        f"assert_true(({vmax} - {vmin}) < {lim}L, "
        f"'quantize_col: value range >= 2^{63 - bits} overflows BIGINT "
        f"at bits={bits}')"
    )
    return F.when(
        guard.isNull(),
        F.expr(f"(({v} - {vmin}) * {1 << bits}) DIV ({vmax} - {vmin} + 1)"),
    ).cast("long")


def _q_sql(v: str, vmin: str, vmax: str, bits: int) -> str:
    return f"(({v} - {vmin}) * {1 << bits} // ({vmax} - {vmin} + 1))"


def zorder_key_col(qa: Column, qb: Column, bits: int) -> Column:
    """Interleave two ``bits``-bit quantized values: bit ``i`` of ``qa``
    lands at position ``2i+1``, of ``qb`` at ``2i`` — pure shift/and
    column expressions, 2·bits terms."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(qa.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z + F.shiftleft(
            F.shiftright(qb.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
    return z


def _z_sql(qa: str, qb: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def _probes_sql(n_slices: int, bits: int) -> str:
    """The deterministic probe workload over the QUANTIZED grid: per
    slice s — a dim-a slice (full b), a dim-b slice (full a), and the
    (s, s) diagonal cell. Quantized-grid bounds are integers shared by
    both engines; slice s covers ``[s*2^bits//n, (s+1)*2^bits//n - 1]``."""
    full = (1 << bits) - 1
    rows = []
    for s in range(n_slices):
        lo = s * (1 << bits) // n_slices
        hi = (s + 1) * (1 << bits) // n_slices - 1
        rows.append(f"('a_slice', {s}, {lo}, {hi}, 0, {full})")
        rows.append(f"('b_slice', {s}, 0, {full}, {lo}, {hi})")
        rows.append(f"('cell', {s}, {lo}, {hi}, {lo}, {hi})")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS probes(probe_kind, probe_id, a_lo, a_hi, b_lo, b_hi)"
    )


def _probe_rows(n_slices: int, bits: int) -> list[tuple]:
    full = (1 << bits) - 1
    out = []
    for s in range(n_slices):
        lo = s * (1 << bits) // n_slices
        hi = (s + 1) * (1 << bits) // n_slices - 1
        out.append(("a_slice", s, lo, hi, 0, full))
        out.append(("b_slice", s, 0, full, lo, hi))
        out.append(("cell", s, lo, hi, lo, hi))
    return out


def zorder_pruning_audit(
    df: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    *,
    bits: int = DEFAULT_BITS,
    n_files: int = DEFAULT_FILES,
    n_slices: int = DEFAULT_SLICES,
) -> DataFrame:
    """Per-probe pruning effectiveness of Hilbert and Z-order layouts vs
    the arrival (id-order) layout: ``(probe_kind, probe_id, rows_matched,
    files_hilbert, files_zorder, files_linear, files_total)``.

    ``a_col``/``b_col`` must be integer-valued (cast timestamps to epoch
    micros first); ``id_col`` is the arrival order AND the z tie-break,
    so both layouts are total orders and the result is engine-exact."""
    spark = df.sparkSession
    ident = F.col(id_col).cast("long")
    base = df.select(
        ident.alias("__id"),
        F.col(a_col).cast("long").alias("__a"),
        F.col(b_col).cast("long").alias("__b"),
    )
    bounds = base.agg(
        F.min("__a").alias("__amin"), F.max("__a").alias("__amax"),
        F.min("__b").alias("__bmin"), F.max("__b").alias("__bmax"),
    )
    q = base.crossJoin(F.broadcast(bounds)).select(
        "__id",
        quantize_col("__a", "__amin", "__amax", bits).alias("__qa"),
        quantize_col("__b", "__bmin", "__bmax", bits).alias("__qb"),
    )
    q = q.withColumn(
        "__z", zorder_key_col(F.col("__qa"), F.col("__qb"), bits)
    )
    q = with_hilbert_key(q, "__qa", "__qb", bits, "__h")
    q = cache_scoped(q, "zorder.quantized")  # reused by all layouts + probes

    total = q.count()  # scalar; also fixes the file-size arithmetic
    if total == 0:
        return spark.createDataFrame(
            [],
            "probe_kind string, probe_id bigint, rows_matched bigint, "
            "files_hilbert bigint, files_zorder bigint, "
            "files_linear bigint, files_total bigint",
        )

    def _stats(ranked: DataFrame, out: str) -> DataFrame:
        return (
            ranked.withColumn(
                "__f",
                F.expr(f"(__pos * {n_files}) DIV {total}").cast("long"),
            )
            .groupBy("__f")
            .agg(
                F.min("__qa").alias("a_min"), F.max("__qa").alias("a_max"),
                F.min("__qb").alias("b_min"), F.max("__qb").alias("b_max"),
            )
            .select(F.lit(out).alias("layout"), "__f",
                    "a_min", "a_max", "b_min", "b_max")
        )

    z_files = _stats(
        bucketed_position(
            q, "__z", tiebreak=["__id"], key_space=1 << (2 * bits),
            out_col="__pos",
        ),
        "zorder",
    )
    h_files = _stats(
        bucketed_position(
            q, "__h", tiebreak=["__id"], key_space=1 << (2 * bits),
            out_col="__pos",
        ),
        "hilbert",
    )
    # arrival order: ids are arbitrary non-negative longs — the numeric
    # variant derives its bucket bounds from the data (no extra collect)
    lin_files = _stats(
        bucketed_position_numeric(q, "__id", out_col="__pos"), "linear"
    )

    files = z_files.unionByName(h_files).unionByName(lin_files)

    probes = spark.createDataFrame(
        _probe_rows(n_slices, bits),
        "probe_kind string, probe_id bigint, a_lo bigint, a_hi bigint, "
        "b_lo bigint, b_hi bigint",
    )
    overlap = (
        files.crossJoin(F.broadcast(probes))
        .where(
            (F.col("a_min") <= F.col("a_hi")) & (F.col("a_max") >= F.col("a_lo"))
            & (F.col("b_min") <= F.col("b_hi")) & (F.col("b_max") >= F.col("b_lo"))
        )
        .groupBy("probe_kind", "probe_id")
        .agg(
            F.count_if(F.col("layout") == "hilbert").alias("hilbert"),
            F.count_if(F.col("layout") == "zorder").alias("zorder"),
            F.count_if(F.col("layout") == "linear").alias("linear"),
        )
    )
    matched = (
        q.crossJoin(F.broadcast(probes))
        .where(
            F.col("__qa").between(F.col("a_lo"), F.col("a_hi"))
            & F.col("__qb").between(F.col("b_lo"), F.col("b_hi"))
        )
        .groupBy("probe_kind", "probe_id")
        .agg(F.count("*").cast("long").alias("rows_matched"))
    )
    return (
        probes.select("probe_kind", "probe_id")
        .join(matched, ["probe_kind", "probe_id"], "left")
        .join(overlap, ["probe_kind", "probe_id"], "left")
        .select(
            "probe_kind",
            "probe_id",
            F.coalesce("rows_matched", F.lit(0)).cast("long")
            .alias("rows_matched"),
            F.coalesce("hilbert", F.lit(0)).cast("long")
            .alias("files_hilbert"),
            F.coalesce("zorder", F.lit(0)).cast("long").alias("files_zorder"),
            F.coalesce("linear", F.lit(0)).cast("long").alias("files_linear"),
            F.lit(n_files).cast("long").alias("files_total"),
        )
    )


def zorder_pruning_audit_sql(
    src_sql: str,
    id_sql: str,
    a_sql: str,
    b_sql: str,
    *,
    bits: int = DEFAULT_BITS,
    n_files: int = DEFAULT_FILES,
    n_slices: int = DEFAULT_SLICES,
) -> str:
    """DuckDB twin: plain ``row_number`` global ranks (the oracle keeps
    the canonical form; the Spark side's bucketed rank equals it by
    construction), identical quantize/interleave/file/probe integer
    math."""
    q_a = _q_sql("__a", "__amin", "__amax", bits)
    q_b = _q_sql("__b", "__bmin", "__bmax", bits)
    h_ctes, h_final = _hilbert_sql_ctes("zq", "__qa", "__qb", bits, "zh")
    hilbert_chain = ",".join(h_ctes)
    return f"""
WITH zbase AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS __id,
         CAST({a_sql} AS BIGINT) AS __a,
         CAST({b_sql} AS BIGINT) AS __b
  FROM ({src_sql}) t
),
zbounds AS (
  SELECT min(__a) AS __amin, max(__a) AS __amax,
         min(__b) AS __bmin, max(__b) AS __bmax,
         count(*) AS __n
  FROM zbase
),
zq AS MATERIALIZED (
  SELECT __id, {q_a} AS __qa, {q_b} AS __qb, __n
  FROM zbase CROSS JOIN zbounds
),
zk AS MATERIALIZED (
  SELECT __id, __qa, __qb, __n, {_z_sql("__qa", "__qb", bits)} AS __z
  FROM zq
),
{hilbert_chain},
zhk AS MATERIALIZED (
  SELECT __id, __qa, __qb, __n, hd AS __h FROM {h_final}
),
zfiles AS (
  SELECT 'zorder' AS layout,
         ((row_number() OVER (ORDER BY __z, __id) - 1) * {n_files}) // __n
           AS __f,
         __qa, __qb
  FROM zk
),
hfiles AS (
  SELECT 'hilbert' AS layout,
         ((row_number() OVER (ORDER BY __h, __id) - 1) * {n_files}) // __n
           AS __f,
         __qa, __qb
  FROM zhk
),
lfiles AS (
  SELECT 'linear' AS layout,
         ((row_number() OVER (ORDER BY __id) - 1) * {n_files}) // __n AS __f,
         __qa, __qb
  FROM zk
),
stats AS MATERIALIZED (
  SELECT layout, __f,
         min(__qa) AS a_min, max(__qa) AS a_max,
         min(__qb) AS b_min, max(__qb) AS b_max
  FROM (SELECT * FROM zfiles UNION ALL SELECT * FROM hfiles
        UNION ALL SELECT * FROM lfiles) u
  GROUP BY layout, __f
),
probes AS ({_probes_sql(n_slices, bits)}),
overlap AS (
  SELECT p.probe_kind, p.probe_id,
         count(*) FILTER (WHERE s.layout = 'hilbert') AS files_hilbert,
         count(*) FILTER (WHERE s.layout = 'zorder') AS files_zorder,
         count(*) FILTER (WHERE s.layout = 'linear') AS files_linear
  FROM probes p JOIN stats s
    ON s.a_min <= p.a_hi AND s.a_max >= p.a_lo
   AND s.b_min <= p.b_hi AND s.b_max >= p.b_lo
  GROUP BY p.probe_kind, p.probe_id
),
matched AS (
  SELECT p.probe_kind, p.probe_id, count(*) AS rows_matched
  FROM probes p JOIN zk
    ON __qa BETWEEN p.a_lo AND p.a_hi AND __qb BETWEEN p.b_lo AND p.b_hi
  GROUP BY p.probe_kind, p.probe_id
)
SELECT p.probe_kind, CAST(p.probe_id AS BIGINT) AS probe_id,
       CAST(COALESCE(m.rows_matched, 0) AS BIGINT) AS rows_matched,
       CAST(COALESCE(o.files_hilbert, 0) AS BIGINT) AS files_hilbert,
       CAST(COALESCE(o.files_zorder, 0) AS BIGINT) AS files_zorder,
       CAST(COALESCE(o.files_linear, 0) AS BIGINT) AS files_linear,
       CAST({n_files} AS BIGINT) AS files_total
FROM probes p
LEFT JOIN matched m ON p.probe_kind = m.probe_kind AND p.probe_id = m.probe_id
LEFT JOIN overlap o ON p.probe_kind = o.probe_kind AND p.probe_id = o.probe_id
"""


# ---------------------------------------------------------------------------
# sort-order-preserving compaction planning — the OTHER half of the layout
# story. Z-ordering decides WHERE rows go; compaction decides how many
# FILES carry them: a 100 TB table accretes small files (streaming
# commits, partitioned writes, late data), every one of which costs a
# scan task + a footer read + an open. Table formats' OPTIMIZE coalesces
# ADJACENT files (preserving the sort/cluster order, so the min/max
# pruning the layout bought stays intact) into target-size outputs.
# Adjacent greedy packing = running-total arithmetic, which is why this
# plan is engine-exact: out_group = cumulative_bytes_before DIV target.
# ---------------------------------------------------------------------------


def compaction_plan(
    files: DataFrame,
    file_col: str,
    bytes_col: str,
    *,
    target_bytes: int,
) -> DataFrame:
    """Assign each input file (ordered by ``file_col`` — the sort/cluster
    order) to an output group: ``out_group = (running total of PRIOR
    files' bytes) DIV target_bytes``. An oversized file is never split
    (splitting is the writer's job, not the planner's); it simply
    advances the running total past multiple group boundaries, so it may
    share its group with small files that preceded it (e.g. sizes
    ``[0.5t, 3t]`` both land in group 0) while everything after it
    starts fresh groups. Emits the per-group audit:
    ``(out_group, n_files, total_bytes, fill_milli)`` where
    ``fill_milli = total_bytes * 1000 // target_bytes``.

    The running total is a single-sequence window over FILE STATS —
    thousands of rows for a 100 TB table (files, not rows), which is
    exactly the frame a metadata layer hands the planner; the window
    never touches row-level data, so the one-partition sort is fine
    here (and deliberate: adjacency IS the semantics)."""
    planned = files.select(
        F.col(file_col).alias("__f"),
        F.col(bytes_col).cast("long").alias("__b"),
    ).withColumn(
        "out_group",
        F.expr(
            f"COALESCE(sum(__b) OVER (ORDER BY __f ASC ROWS BETWEEN "
            f"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) DIV {target_bytes}"
        ).cast("long"),
    )
    return (
        planned.groupBy("out_group")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("__b").cast("long").alias("total_bytes"),
        )
        .select(
            "out_group",
            "n_files",
            "total_bytes",
            F.expr(f"(total_bytes * 1000) DIV {target_bytes}").cast("long")
            .alias("fill_milli"),
        )
    )


def compaction_plan_sql(
    files_sql: str, file_sql: str, bytes_sql: str, *, target_bytes: int
) -> str:
    """DuckDB twin — identical running-total arithmetic."""
    return f"""
WITH cp_files AS MATERIALIZED (
  SELECT {file_sql} AS __f, CAST({bytes_sql} AS BIGINT) AS __b
  FROM ({files_sql}) t
),
cp_plan AS (
  SELECT __f, __b,
         COALESCE(sum(__b) OVER (ORDER BY __f ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {target_bytes} AS out_group
  FROM cp_files
)
SELECT CAST(out_group AS BIGINT) AS out_group,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(__b) AS BIGINT) AS total_bytes,
       CAST((sum(__b) * 1000) // {target_bytes} AS BIGINT) AS fill_milli
FROM cp_plan
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# op-typed CDC application — the other half of the lakehouse ingest story
# next to upsert-to-latest: real change feeds (Debezium, DMS, binlog
# tailers) carry INSERT/UPDATE/DELETE rows, and applying them means
# last-writer-wins per key PLUS tombstone filtering when a key's final
# op is a delete. Same rank-window shape as cdc_upsert_latest: the
# window partitions on the composite key (millions of small partitions
# at scale — never a global sort), audit counts ride the same window.
# ---------------------------------------------------------------------------


def cdc_apply_changes(
    changes: DataFrame,
    key_cols: list,
    seq_cols: list,
    op_col: str,
) -> DataFrame:
    """Apply an op-typed change feed to current state: per key (ordered
    by ``seq_cols`` DESC — the change sequence, ties broken by later
    ``seq_cols`` entries), keep the LAST change; if that change is a
    delete (``op_col = 'D'``) the key is tombstoned and emits nothing.
    Survivors keep all input columns plus the audit counts
    ``n_changes`` / ``n_deletes`` over the key's full history (I and U
    both materialize — an out-of-order I after U must not resurrect old
    state, which last-writer-wins by sequence guarantees)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    wk = Window.partitionBy(*key_cols)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(wk).cast("long"))
        .withColumn(
            "n_deletes",
            F.sum(
                F.when(F.col(op_col) == "D", F.lit(1)).otherwise(F.lit(0))
            ).over(wk).cast("long"),
        )
        .where((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn")
    )


def cdc_apply_changes_sql(
    changes_sql: str,
    key_sqls: list,
    seq_sqls: list,
    op_sql: str,
    value_sqls: list,
) -> str:
    """DuckDB twin — identical rank window + tombstone filter.
    ``value_sqls`` are ``(expr, alias)`` pairs for the emitted columns
    (keys + payload), so the projection matches the Spark side
    name-for-name."""
    keys = ", ".join(key_sqls)
    order = ", ".join(f"{s} DESC" for s in seq_sqls)
    proj = ",\n       ".join(f"{e} AS {a}" for e, a in value_sqls)
    return f"""
WITH cdc_feed AS MATERIALIZED (
  SELECT t.*,
         row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS __rn,
         CAST(count(*) OVER (PARTITION BY {keys}) AS BIGINT) AS n_changes,
         CAST(sum(CASE WHEN {op_sql} = 'D' THEN 1 ELSE 0 END)
              OVER (PARTITION BY {keys}) AS BIGINT) AS n_deletes
  FROM ({changes_sql}) t
)
SELECT {proj},
       n_changes, n_deletes
FROM cdc_feed WHERE __rn = 1 AND {op_sql} <> 'D'
"""


# ---------------------------------------------------------------------------
# Hilbert curve — the stronger space-filling layout. Morton interleave is
# cheap but takes long diagonal jumps between quadrants; the Hilbert
# curve's rotate-and-reflect recursion keeps every successive cell
# ADJACENT, so equal-count file cuts get tighter per-dimension ranges
# (Hilbert & Peano 1890s; the standard iterative form below is the
# rot/flip walk from Warren's "Hacker's Delight" — public algorithm).
# The audit runs all three layouts side by side so the choice is a
# measured one, not folklore.
# ---------------------------------------------------------------------------


def hilbert_d_py(qa: int, qb: int, bits: int) -> int:
    """Reference Python Hilbert index (x=qa, y=qb on the 2^bits grid)."""
    x, y, d = qa, qb, 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def with_hilbert_key(
    df: DataFrame, qa_col: str, qb_col: str, bits: int, out_col: str
) -> DataFrame:
    """Append the Hilbert index of ``(qa, qb)`` as ``out_col`` — the
    rot/flip walk unrolled over ``bits`` rounds, each round STAGED as its
    own projection (the per-round update references x and y several
    times; inlining all rounds into one expression grows the tree
    ~3^bits — the same Catalyst blowup class the MinHash staging note
    documents, avoided the same way)."""
    x, y, d = f"__hx_{qa_col}", f"__hy_{qa_col}", out_col
    cur = df.withColumn(x, F.col(qa_col).cast("long")) \
            .withColumn(y, F.col(qb_col).cast("long")) \
            .withColumn(d, F.lit(0).cast("long"))
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        cur = cur.withColumn(
            "__hd", F.expr(f"{d} + {s * s} * ((3 * {rx}) ^ {ry})")
            .cast("long"),
        ).withColumn(
            "__hx2",
            F.expr(
                f"CASE WHEN {ry} = 0 THEN "
                f"  CASE WHEN {rx} = 1 THEN {s - 1} - {y} ELSE {y} END "
                f"ELSE {x} END"
            ).cast("long"),
        ).withColumn(
            "__hy2",
            F.expr(
                f"CASE WHEN {ry} = 0 THEN "
                f"  CASE WHEN {rx} = 1 THEN {s - 1} - {x} ELSE {x} END "
                f"ELSE {y} END"
            ).cast("long"),
        ).drop(x, y, d) \
         .withColumnRenamed("__hx2", x) \
         .withColumnRenamed("__hy2", y) \
         .withColumnRenamed("__hd", d)
    return cur.drop(x, y)


def _hilbert_sql_ctes(src_cte: str, qa: str, qb: str, bits: int,
                      prefix: str) -> tuple[list, str]:
    """Chained-CTE DuckDB twin of :func:`with_hilbert_key`: one CTE per
    round carrying (x, y, d) forward. Returns (ctes, final_cte)."""
    ctes = [
        f"{prefix}_r{bits} AS (SELECT *, CAST({qa} AS BIGINT) AS hx, "
        f"CAST({qb} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM {src_cte})"
    ]
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        prev = f"{prefix}_r{k + 1}"
        ctes.append(
            f"{prefix}_r{k} AS (SELECT * EXCLUDE (hx, hy, hd), "
            f"CAST(CASE WHEN {ry} = 0 THEN "
            f"  CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END "
            f"ELSE hx END AS BIGINT) AS hx, "
            f"CAST(CASE WHEN {ry} = 0 THEN "
            f"  CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END "
            f"ELSE hy END AS BIGINT) AS hy, "
            # xor(): DuckDB's ^ is POWER (PostgreSQL heritage), unlike
            # Spark SQL's bitwise ^ — the named function is unambiguous
            f"CAST(hd + {s * s} * xor(3 * {rx}, {ry}) AS BIGINT) AS hd "
            f"FROM {prev})"
        )
    return ctes, f"{prefix}_r0"
