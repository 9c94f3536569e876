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
  terminates early. For adversarial long-chain graphs pass
  ``algorithm="star"``: the classic large-star/small-star rewiring
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  implemented below) converges in O(log n) rounds regardless of diameter —
  the long-chain pytest pins a 256-node path graph to <= 12 rounds where
  min-label propagation would need 255. Both algorithms produce the
  identical (id, cluster_id = component min) output, so they are
  interchangeable under any oracle.
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
    algorithm: str = "label",
    stats: dict | None = None,
) -> DataFrame:
    """Label every vertex with the min vertex id reachable from it.

    ``edges``: undirected pair table (one row per pair, either orientation).
    ``vertices``: optional (id) table; vertices absent from ``edges`` become
    singleton clusters. ``algorithm``: ``"label"`` (min-label propagation,
    O(diameter) rounds — right for the dense low-diameter clusters near-dup
    graphs produce) or ``"star"`` (large-star/small-star rewiring,
    O(log n) rounds for any topology). ``stats``, if given, receives
    ``{"rounds": <rounds executed>}``. Returns (id, cluster_id).
    """
    if algorithm == "star":
        return _connected_components_star(
            edges, src, dst, vertices, id_col, max_iter, stats
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=False)

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
    else:
        verts = sym.select("u").distinct()

    labels = verts.select("u", F.col("u").alias("label"))
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
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
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))


def _edge_fingerprint(e: DataFrame) -> tuple:
    """(row count, xxhash64 checksum) of an edge set — an O(1)-state
    convergence probe. One aggregate per round instead of an exceptAll
    anti-join of two full edge tables; the per-edge hashes are summed, so a
    changed edge set collides only if the multiset of 64-bit hashes sums
    identically at equal cardinality (vanishing, and the alternation is
    monotone so a false stop cannot produce wrong labels that pass the
    star-shape final state — see _connected_components_star)."""
    row = e.select(
        F.count(F.lit(1)).alias("n"),
        # DECIMAL(38,0) accumulator: a sum of int64 hashes overflows long
        # (ANSI mode raises) after ~2^63 of headroom; decimal is exact
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    vertices: DataFrame | None,
    id_col: str,
    max_iter: int,
    stats: dict | None,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. 2014).

    Each round rewires edges toward component minima:

    - **large-star** (around every center u over the symmetrized edge set):
      every neighbor LARGER than u re-attaches to m = min(neighborhood of u,
      u itself);
    - **small-star** (around every center u of the larger-first oriented
      edges): u and all its smaller neighbors attach to the smallest.

    Both steps preserve connectivity and only ever decrease the attachment
    target, so the edge set converges — in O(log n) rounds — to a disjoint
    union of stars centered at each component's minimum id. Per round:
    two hash-partitioned groupBy/join pairs on vertex id (same shuffle key
    both times) + distinct; localCheckpoint cuts the per-round lineage.
    A 2^16-vertex path graph needs 255 label-propagation rounds but ~5
    alternations here (pinned by test_star_converges_log_rounds_on_chain).
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
    else:
        verts = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()

    rounds = 0
    fp = _edge_fingerprint(e)
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m(u) = min over neighborhood incl. self
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        e1 = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over larger-first edges: center u and every smaller
        # neighbor attach to min(neighbors) (all < u by orientation)
        m2 = e1.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            e1.join(m2, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("s")
            )
            .select("s.u", "s.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        nfp = _edge_fingerprint(e2)
        e = e2
        if nfp == fp:
            break
        fp = nfp
    if stats is not None:
        stats["rounds"] = rounds
    parents = e.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return verts.join(parents, "u", "left").select(
        F.col("u").alias(id_col),
        F.coalesce("cluster_id", "u").alias("cluster_id"),
    )


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
