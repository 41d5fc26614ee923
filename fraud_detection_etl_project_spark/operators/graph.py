"""Iterative graph operators: connected components for near-dup clustering.

The reference has no graph surface (single-table pipeline — SURVEY.md §2.3);
this supplies the standard LLM-corpus dedup step the north star requires:
LSH banding proposes candidate pairs (operators/dedup.py), connected
components groups the pairs into duplicate clusters, and one canonical
document per cluster survives.

Scale design (the part that matters at 100 TB):

- **Min-label propagation with path compression.** Each iteration does
  (a) a neighbor-min step — join labels to the symmetrized edge list and
  take the min component id seen across neighbors — and (b) a pointer-jump
  step — re-join labels to themselves so every node adopts its component
  representative's *current* label (``comp := comp[comp]``). The jump is
  what turns O(diameter) convergence into O(log diameter), the same
  mechanism as the large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14).
- **Everything shuffled is (id, id) pairs** — never document payloads.
  Join keys are the node ids; with AQE on, the per-iteration joins get
  runtime-sized partitions.
- **``localCheckpoint`` per iteration** truncates the lineage chain —
  without it the plan doubles every iteration and the driver OOMs on plan
  serialization long before data is the problem.
- **Convergence check is one ``isEmpty`` on the changed-label set** —
  an action per iteration is inherent to iterative algorithms; the check
  short-circuits on the first changed row.

Determinism: min-label is order-free (min is commutative/associative), so
results are bit-stable across partitionings and engines — the DuckDB
oracle (plans/llm_queries.py) reproduces the exact component assignment
with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node; component = min node id reachable
    over the undirected edge set. Singletons keep their own id.

    ``nodes`` must contain every vertex (edge endpoints may be a subset).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)  # edge list reused every iteration

    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("comp"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr = sym.join(labels.withColumnRenamed("node", "b"), "b").select(
            F.col("a").alias("node"), F.col("comp")
        )
        merged = labels.unionByName(nbr).groupBy("node").agg(F.min("comp").alias("comp"))
        # pointer jump: adopt the representative's current label
        jumped = (
            merged.alias("x")
            .join(
                merged.select(F.col("node").alias("comp"), F.col("comp").alias("cc")).alias("y"),
                "comp",
                "left",
            )
            .select(F.col("node"), F.coalesce(F.col("cc"), F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
        )
        labels = jumped
        if changed.isEmpty():
            break
    return labels


def canonical_per_component(components: DataFrame) -> DataFrame:
    """Deduplicated node set: one row per component (the min-id node, which
    under min-label propagation IS the component id), with cluster size."""
    sizes = components.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.select(F.col("comp").alias("node"), "cluster_size")
