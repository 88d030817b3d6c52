"""Weighted PageRank centrality with INTEGER-EXACT iterations — the
crawl-frontier / domain-ranking shape (Common Crawl publishes exactly
this: per-domain centrality from the host link graph, used to
prioritize what gets crawled and how much of it enters the corpus).
The reference has no graph operators; this extends the repo's graph
lane (pointer-jumping connected components, operators/dedup.py) with
the weighted-iteration family.

Why integer-exact: a float PageRank's per-node sums depend on
reduction order, so Spark and DuckDB (and any two Spark runs with
different partitioning) drift in the last ulps and hash-compare
equality dies. Here rank mass lives on an integer grid (Q = 10^9
micro-units): each edge contributes ``(r_u * w_uv) div W_u`` (floor
per edge — order-independent integer sums), each round applies

    r'(v) = (15 * Q) div (100 * N)  +  (85 * inflow(v)) div 100

i.e. damping 0.85 in exact hundredths. The result is a deterministic
variant of PageRank (floor residue stays bounded: each round drops at
most 1 unit per edge + 1 per node, ~1e-6 of Q at fixture scale) whose
ORDER and values are bit-identical across engines — the repo's
LM_QSCALE quantization precedent applied to graph iteration.

Dangling nodes (no out-edges) simply evaporate their mass — the
documented "ignore dangling" simplification; with the teleport term no
rank goes to zero and the ordering stays meaningful. At fixture scale
the trade graph is dense enough that no node dangles.

Scale shape at 100 TB (a billion-host web graph): per round ONE
edge×rank equi-join on src (edges pre-partitioned by src, rank frame
co-partitioned — the standard edge-partitioned power iteration) and
one partial-aggregable groupBy dst. K rounds = K bounded jobs with a
``localCheckpoint`` lineage barrier per round (the CC-loop pattern);
nothing ever collects to the driver. The oracle unrolls the K rounds
as chained CTEs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_Q = 1_000_000_000  # rank grid: 1.0 == 1e9 micro-units
PR_DAMP_NUM = 85      # damping 0.85 in exact hundredths
PR_ROUNDS = 5


def pagerank_quantized(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    rounds: int = PR_ROUNDS,
) -> DataFrame:
    """Integer-grid weighted PageRank over an edge list. Returns
    ``(node, rank_q, in_weight, out_weight)`` ordered by rank desc then
    node asc — ``rank_q`` on the Q = 1e9 grid."""
    if rounds < 1:
        raise ValueError(f"pagerank: rounds must be >= 1, got {rounds}")
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # scalar: the only driver-side value
    out_w = e.groupBy("src").agg(F.sum("w").cast("long").alias("tot_w"))
    in_w = e.groupBy("dst").agg(F.sum("w").cast("long").alias("in_weight"))
    base = (15 * PR_Q) // (100 * n_nodes)
    r = nodes.select("node", F.lit(PR_Q // n_nodes).cast("long").alias("r"))
    for _ in range(rounds):
        contrib = (
            e.join(r.withColumnRenamed("node", "src"), "src")
            .join(out_w, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("r * w div tot_w").cast("long").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(
            F.sum("c").cast("long").alias("inflow")
        )
        r = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{PR_DAMP_NUM} * coalesce(inflow, 0) div 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        r.join(in_w.withColumnRenamed("dst", "node"), "node", "left")
        .join(
            out_w.select(
                F.col("src").alias("node"), F.col("tot_w").alias("out_weight")
            ),
            "node",
            "left",
        )
        .select(
            "node",
            F.col("r").alias("rank_q"),
            F.coalesce("in_weight", F.lit(0)).cast("long").alias("in_weight"),
            F.coalesce("out_weight", F.lit(0)).cast("long")
            .alias("out_weight"),
        )
        .orderBy(F.col("rank_q").desc(), F.col("node").asc())
    )


def pagerank_quantized_sql(
    edges_sql: str, rounds: int = PR_ROUNDS
) -> str:
    """DuckDB twin of :func:`pagerank_quantized`: ``edges_sql`` must
    yield (src, dst, w); the K rounds unroll as chained CTEs with the
    same integer floor math."""
    if rounds < 1:
        raise ValueError(f"pagerank: rounds must be >= 1, got {rounds}")
    ctes = [
        f"pr_e AS MATERIALIZED ({edges_sql})",
        """pr_nodes AS MATERIALIZED (
  SELECT src AS node FROM pr_e UNION SELECT dst FROM pr_e
)""",
        "pr_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pr_nodes)",
        """pr_outw AS MATERIALIZED (
  SELECT src, CAST(sum(w) AS BIGINT) AS tot_w FROM pr_e GROUP BY src
)""",
        """pr_inw AS (
  SELECT dst, CAST(sum(w) AS BIGINT) AS in_weight FROM pr_e GROUP BY dst
)""",
        f"""pr_r0 AS (
  SELECT node, CAST({PR_Q} // n AS BIGINT) AS r FROM pr_nodes, pr_n
)""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(f"""pr_in{k} AS (
  SELECT e.dst AS node, CAST(sum(r.r * e.w // o.tot_w) AS BIGINT) AS inflow
  FROM pr_e e JOIN pr_r{k - 1} r ON e.src = r.node
  JOIN pr_outw o ON e.src = o.src
  GROUP BY e.dst
)""")
        ctes.append(f"""pr_r{k} AS MATERIALIZED (
  SELECT n.node,
         CAST({15 * PR_Q} // (100 * pn.n)
              + ({PR_DAMP_NUM} * coalesce(i.inflow, 0)) // 100
              AS BIGINT) AS r
  FROM pr_nodes n LEFT JOIN pr_in{k} i ON n.node = i.node, pr_n pn
)""")
    return f"""WITH {','.join(ctes)}
SELECT r.node, r.r AS rank_q,
       CAST(coalesce(i.in_weight, 0) AS BIGINT) AS in_weight,
       CAST(coalesce(o.tot_w, 0) AS BIGINT) AS out_weight
FROM pr_r{rounds} r
LEFT JOIN pr_inw i ON r.node = i.dst
LEFT JOIN pr_outw o ON r.node = o.src
ORDER BY rank_q DESC, node ASC
"""


def trade_graph_edges(
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """The nation-level trade graph: one directed edge per (customer
    nation → supplier nation) with order-line counts as weights — the
    fixture-scale stand-in for a host link graph (the dims are
    broadcast; the fact-side joins are the usual star shape)."""
    cn = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select(
        F.col("c_custkey"), F.col("n_name").alias("cust_nation")
    )
    sn = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select(
        F.col("s_suppkey"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("cust_nation").alias("src"),
            F.col("supp_nation").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )


TRADE_EDGES_SQL = """
SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""
