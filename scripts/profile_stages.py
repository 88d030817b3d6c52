"""Stage-level profiler: run ONE registered query with the Spark UI
enabled and dump per-stage wall time, task time, shuffle bytes, spill and
GC time from the status REST API — the guide-§7 empirical loop without a
browser.

Usage: python scripts/profile_stages.py <sf_dir> <query> [passes=2]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import rust_triplets_spark.session as S
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_stages")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.rust_triplets.scanPartitions", str(cpus))

    from rust_triplets_spark.functions import caching
    from rust_triplets_spark.plans import driver_queries as DQ

    t_total = None
    for p in range(passes):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"{name} pass {p}")
        DQ.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        t_total = dt if t_total is None else min(t_total, dt)
        if p < passes - 1:
            caching.release_all()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    # keep only the LAST pass's stages (warm): stages are listed newest
    # first; find the submission time cutoff from the last pass start.
    rows = []
    for st in stages:
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:80],
                "tasks": st["numCompleteTasks"],
                "wall_s": round((st.get("executorRunTime", 0)) / 1000.0, 2),
                "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(st.get("jvmGcTime", 0) / 1000.0, 2),
                "sh_read_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mb": round(st.get("diskBytesSpilled", 0) / 1e6, 1),
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                "submitted": st.get("submissionTime", ""),
                "desc": (st.get("description") or "")[:40],
            }
        )
    rows.sort(key=lambda r: -r["wall_s"])
    print(json.dumps({"query": name, "min_wall_s": round(t_total, 2)}))
    for r in rows[:25]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
