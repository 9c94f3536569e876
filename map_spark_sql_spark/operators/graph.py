"""Connected components over a pair/edge table — dedup cluster assignment.

The near-dup operators (``operators/dedup.py``) emit *pairs* ``(a_id, b_id)``;
turning pairs into clusters (every doc -> canonical representative) requires a
transitive closure, which no single SQL pass expresses. This module implements
iterative **min-label propagation**: every vertex starts labeled with its own
id; each round every vertex takes the min of its own label and its neighbors'
labels; fixpoint = each component uniformly labeled with its smallest member
id (the canonical document).

Scale notes (the 100 TB story):
- Each round is one shuffle: an equi-join of the (vertex, label) table with
  the symmetrized edge table on vertex id, followed by a min-aggregate keyed
  on the neighbor — both hash-partitioned on well-distributed ids.
- Rounds needed = component diameter. Near-dup graphs are overwhelmingly
  small dense clusters (diameter 2-4); a ``max_iter`` bound plus an explicit
  convergence check (count of changed labels, a bounded scalar per round)
  terminates early. For adversarial long-chain graphs the classic
  large-star/small-star rewiring (Kiveris et al., "Connected Components in
  MapReduce and Beyond") drops rounds to O(log n); the propagation loop here
  keeps the same join shape, so swapping the step function is local.
- ``localCheckpoint`` after every round cuts the lineage chain — without it
  the logical plan doubles per iteration and planning time, not the data,
  becomes the bottleneck (on a cluster with HDFS, ``checkpoint`` to durable
  storage is the restart-safe variant).

Reference parity: the reference has no graph operator (SURVEY.md §2.3 — no
JOIN at all); this is a north-star training-pipeline extension (SURVEY §2.8):
MinHash/Jaccard pairs -> components -> keep one doc per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the min vertex id reachable from it.

    ``edges``: undirected pair table (one row per pair, either orientation).
    ``vertices``: optional (id) table; vertices absent from ``edges`` become
    singleton clusters. Returns (id, cluster_id).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=False)

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
    else:
        verts = sym.select("u").distinct()

    labels = verts.select("u", F.col("u").alias("label"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint()  # cut lineage; also materializes for the check
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "u")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))


def connected_components_oracle(pairs_sql: str, vertices_sql: str, id_col: str = "id") -> str:
    """DuckDB twin: transitive closure via WITH RECURSIVE reachability, then
    min reachable id per vertex. ``pairs_sql`` must yield (a_id, b_id);
    ``vertices_sql`` must yield (<id_col>). Exponential-state-free because
    UNION (not UNION ALL) dedups the frontier."""
    return f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({pairs_sql}) p),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id AS u, a_id AS v FROM pairs
),
verts AS (SELECT DISTINCT {id_col} AS u FROM ({vertices_sql}) vv),
walk(u, reach) AS (
  SELECT u, u FROM verts
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.reach = e.u
)
SELECT u AS {id_col}, min(reach) AS cluster_id FROM walk GROUP BY u
"""
