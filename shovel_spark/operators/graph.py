"""Link-graph analytics for web-corpus curation — PageRank over an edge list.

A Common-Crawl-scale corpus is a graph: pages link to pages, and link-based
authority (PageRank) is a standard corpus-curation signal (seed-list
expansion, quality priors for sampling, spam demotion). The reference engine
has no graph stage — this extends the pipeline the same way dedup/ANN do
(SURVEY.md §2.8 "beyond the reference").

Scale shape (the part that must survive 100×):
  - each iteration is two key-shuffles (ranks ⋈ edges on src, groupBy dst) —
    no all-pairs, no driver-side state; the rank vector is one row per node;
  - the edge list is joined with out-degrees ONCE and localCheckpoint'ed, so
    iterations re-scan a materialized, already-partitioned edge table instead
    of re-running upstream candidate generation (same lineage-truncation
    pattern as operators/dedup.connected_components);
  - dangling mass (nodes with no out-links) is folded back uniformly via a
    1-row broadcast aggregate — no collect() in the loop;
  - deterministic: fixed iteration count, pure float math — a SQL oracle can
    replay every iteration as a CTE (see demo_queries.docs_pagerank_mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank; returns ``(node, rank)`` with sum(rank)=1.

    ``edges`` is a directed edge list (parallel edges count as extra weight,
    matching the classic formulation on a multigraph). Nodes are everything
    appearing as ``src`` or ``dst``. Nodes with no out-links are dangling:
    their mass is redistributed uniformly each iteration, so total rank mass
    stays exactly 1 and the result is a proper probability distribution.

    ``checkpoint=True`` localCheckpoints the weighted edge list, node list,
    and each iteration's rank vector — without it the plan doubles per
    iteration and Spark re-executes edge generation every pass.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ew = e.join(outdeg, "src")
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    # static across iterations: nodes with no out-links (dangling set)
    dangling = nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
        dangling = dangling.localCheckpoint(eager=False)

    # n is collected ONCE before the loop (one count over the checkpointed
    # node list) — driver-side 1/n and (1-d)/n are the same IEEE doubles the
    # JVM would produce, and the loop stays free of per-iteration broadcasts
    # of constants (only the rank-dependent dangling mass is in-plan).
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    damp = F.lit(float(damping))
    teleport_over_n = F.lit((1.0 - float(damping)) / n)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        # mass sitting on dangling nodes this iteration (1 row, broadcast)
        dmass = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dmass"))
        )
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("__contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dmass))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    teleport_over_n
                    + damp
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dmass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
