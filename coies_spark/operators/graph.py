"""Connected components over an edge DataFrame (canonicalization core).

Iterative min-label propagation expressed purely in DataFrame ops
(GraphFrames-style; cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — our variant is the simple
neighborhood-min propagation, adequate for the short-diameter alias
graphs entity canonicalization produces).  Each iteration is one
shuffle (groupBy node); lineage is cut with ``localCheckpoint`` every
few rounds so the plan does not grow unboundedly (SURVEY.md §7 risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """→ (node string, component string): component = min node id
    reachable from node (undirected).  Converges in O(diameter)
    iterations; raises if max_iter is hit before convergence.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for it in range(max_iter):
        # neighbor-min message pass: node's new label = min(own label,
        # labels of all neighbors)
        msgs = (
            sym.join(labels, sym.b == labels.node)
            .select(sym.a.alias("node"), "component")
            .union(labels.select("node", "component"))
        )
        new_labels = msgs.groupBy("node").agg(
            F.min("component").alias("component")
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} iters")
