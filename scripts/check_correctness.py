"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at the
given scale factor; compare row count, column names, and exact values
(order-insensitive). Exact value equality is stricter than the driver's
hash — if this passes, any reasonable hash matches.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duck={d_cols}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if sc.dtype.kind == "f" or dc.dtype.kind == "f":
            import numpy as np
            sa, da = sc.astype(float).to_numpy(), dc.astype(float).to_numpy()
            eq = (sa == da) | (np.isnan(sa) & np.isnan(da))
            if not eq.all():
                i = int((~eq).argmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"spark={sa[i]!r} duck={da[i]!r} (delta={sa[i]-da[i]!r})"
                )
        else:
            eq = sc.astype(str).to_numpy() == dc.astype(str).to_numpy()
            if not eq.all():
                i = int((~eq).argmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rust_triplets_spark.session import get_spark

    spark = get_spark("check_correctness", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # bounded memory + disk spill: heavyweight oracles (bm25's postings
    # self-join at sf1) otherwise grow unbounded and get OOM-killed with
    # the whole process — a spilling oracle is slow but finishes, and a
    # failed query stays a per-query FAIL instead of killing the gate.
    try:
        con.execute("SET memory_limit='40GB'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    except Exception:
        pass  # older duckdb without these pragmas
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(sdf)} rows, no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems[:5]:
                print(f"  - {p}")
            n_fail += 1
        else:
            print(f"pass {name}: {len(sdf)} rows exact-match [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
