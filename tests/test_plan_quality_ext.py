"""Plan-quality guards for the r11 extension operators — the same
100 TB properties the main guard file asserts, on the actual physical
plans at sf0.001: sketch estimate joins broadcast their cell frames,
graph rounds stay equi-joins, the drift lattice broadcasts its tiny
sides, and the row-local fold operators never shuffle at all before
their output ordering."""

import re

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_countmin_cells_join_is_broadcast(spark):
    """The estimate pass joins the vocabulary frame against the
    depth×width cell frame — the cell side must arrive broadcast (it is
    bounded by construction), and nothing may be cartesian."""
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["countmin_heavy_hitters"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    # the scalar-total crossJoin is the only nested-loop allowed, and it
    # must build the broadcast (1-row) side
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight" in line or "BuildLeft" in line, line


def test_pagerank_rounds_are_equi_joins(spark):
    """Every power-iteration round is one src equi-join + one groupBy —
    no cartesian anywhere, and the final in/out-weight decoration joins
    stay hash/sort-merge equi-joins."""
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["pagerank_centrality"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hll_is_two_aggregates_no_join_explosion(spark):
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["hll_distinct_tokens"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial aggregation must be present (map-side combine on the
    # register max / truth count)
    assert "partial" in plan.lower()


def test_psi_lattice_sides_broadcast(spark):
    """The dense slice×bin grid and per-bin baseline are tiny by
    construction; they must reach the slice counts as broadcasts."""
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["source_drift_psi"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_row_local_folds_scan_only_needed_columns(spark):
    """span_corruption and the wordpiece word-frequency pass must prune
    the documents scan to the columns they read — a scan dragging
    lang/n_chars along is the 100 TB I/O bug."""
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["span_corruption"](spark, SF))
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans
    for cols in scans:
        names = {c.split("#")[0] for c in cols.split(",") if c}
        assert names <= {"doc_id", "text"}, names
    # the fold itself is shuffle-free: the only exchange allowed is the
    # output ordering's range partitioning
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    for ln in exchanges:
        assert "rangepartitioning" in ln.lower(), ln


def test_quantile_sketch_no_cartesian(spark):
    from rust_triplets_spark.plans import driver_queries as DQ

    plan = _physical(DQ.QUERIES["quantile_sketch"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_media_audits_are_map_only(spark):
    """The EXIF/ID3 audits must be pure map stages over the fixture:
    one scan, one Arrow eval, no shuffle at all."""
    from rust_triplets_spark.plans import driver_queries as DQ

    for q in ["exif_metadata_audit", "exif_gps_scrub",
              "id3_metadata_audit", "id3_pii_scrub"]:
        plan = _physical(DQ.QUERIES[q](spark, SF))
        assert "Exchange" not in plan, q
        assert "MapInPandas" in plan or "mapInPandas" in plan.lower(), q
