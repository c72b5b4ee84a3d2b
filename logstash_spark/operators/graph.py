"""Host-graph link analysis: integer-exact PageRank over an edge table.

Why it's here: web curation pipelines use link-graph authority as a
document quality prior (Common Crawl publishes host- and domain-level
webgraphs with harmonic centrality / rank for exactly this use); the
`extract_links` → host edge table → rank loop turns raw crawl pages
into that prior inside the same engine.

Spark shape per iteration (the classic relational PageRank):

  contributions — edges JOIN current ranks JOIN out-degrees on src
      (one keyed shuffle on src, or zero when all three share the src
      partitioning), then groupBy(dst) with map-side partial sums
      (second keyed shuffle). Shuffle bytes ∝ |E|, never |V|².
  update        — nodes LEFT JOIN contribution sums (same dst key).

`iters` is small (authority priors converge in ~10 rounds; the gate
unrolls 2); at scale checkpoint each iteration's rank table to cut the
lineage, exactly like the kmeans trainer stores its centroids.

Cross-engine exactness: ranks live in a scaled int64 space
(RANK_SCALE = 10^12 total mass). Each step is integer algebra —
per-edge share = rank div outdeg, damped update =
base + (85 · Σshares) div 100 — and every operand is non-negative, so
Spark's `div` ≡ DuckDB's `//` and an unrolled SQL replay is
bit-identical. Dangling-node mass is dropped (the standard simplified
variant — constant relative ordering cost, documented); ranks are a
PRIOR, not a probability, so mass conservation is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total initial mass, split evenly: r0 = RANK_SCALE div N per node.
RANK_SCALE = 10**12
#: damping as an integer rational (d = DAMP_NUM/DAMP_DEN = 0.85)
DAMP_NUM = 85
DAMP_DEN = 100


def graph_nodes(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct node set of an edge table (one column: `node`)."""
    return (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = False,
) -> DataFrame:
    """`iters` damped PageRank rounds over (src, dst) edges; returns
    (node, rank) in the scaled-int64 space (see module docstring).

    One driver-side action (the node count, a single long — same tiny
    round-trip as kmeans' centroids); everything else stays lazy. With
    ``checkpoint=True`` each round's rank table is localCheckpoint'd to
    truncate lineage (use a reliable checkpoint dir on a cluster)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    ).distinct()
    nodes = graph_nodes(e)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = RANK_SCALE // n
    base = ((RANK_SCALE // n) * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("odeg"))
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iters):
        shares = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                # non-negative int64: div ≡ // in any engine
                F.expr("rank div odeg").alias("share"),
            )
        )
        contrib = shares.groupBy("node").agg(
            F.sum("share").cast("long").alias("s")
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("rank"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 2,
) -> str:
    """DuckDB rendering of `pagerank(edges, iters)`: same node set, same
    integer algebra, iterations unrolled as CTE layers. `edges_sql`
    must yield (src, dst) rows (dups/self-loops removed here, same as
    the operator)."""
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src != dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg "
        "FROM e GROUP BY src)",
        f"r0 AS (SELECT node, {RANK_SCALE} // nn.n AS rank FROM nodes, nn)",
    ]
    base = (
        f"(({RANK_SCALE} // nn.n) * {DAMP_DEN - DAMP_NUM}) // {DAMP_DEN}"
    )
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"CAST(sum(r.rank // o.odeg) AS BIGINT) AS s "
            f"FROM e JOIN {prev} r ON e.src = r.node "
            "JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} + "
            f"({DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN} AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node, nn)"
        )
        prev = f"r{i}"
    return ",\n".join(parts) + f"\nSELECT node, rank FROM {prev}"


__all__ = ["RANK_SCALE", "graph_nodes", "pagerank", "pagerank_oracle_sql"]
