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
    # r11 optimization: cut the edge-builder lineage BEFORE symmetrizing —
    # both union legs otherwise re-run the caller's whole edge pipeline
    # (in the curation funnel that is the full MinHash/LSH pair build,
    # measured ~2.3 s, computed twice inside one job).
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=False
    )
    sym = base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=False)

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
    else:
        verts = sym.select("u").distinct()

    # lazy checkpoint: round 1's probe job materializes the seed labels,
    # so later legs scan the stored blocks instead of recomputing the
    # vertex derivation
    labels = verts.select("u", F.col("u").alias("label")).localCheckpoint(eager=False)

    # r11 optimization: convergence is detected with a monotone sum probe
    # instead of a per-round join of new-vs-old labels. Every label is
    # non-increasing round over round (least of own and neighbors'), so the
    # label sum is non-increasing and stays equal exactly when NO label
    # changed — one aggregate over the (lazily checkpointed) new label
    # table replaces a full join + count job per round, and the aggregate
    # itself materializes the checkpoint. DECIMAL(38,0) keeps the sum
    # exact for any int64 id multiset.
    # r11 (2nd pass): the seed label-sum is the vertex-id sum, and the new
    # label table carries one row per vertex — so round 1's probe can read
    # BOTH sums (sum(label) for convergence, sum(u) for the seed baseline)
    # in one aggregate, dropping the separate seed-probe job + its compile.
    def _label_sum(tbl: DataFrame, with_seed: bool = False):
        aggs = [F.sum(F.col("label").cast("decimal(38,0)")).alias("s")]
        if with_seed:
            aggs.append(F.sum(F.col("u").cast("decimal(38,0)")).alias("su"))
        return tbl.agg(*aggs).first()

    prev_sum = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # r11 optimization: one round = ONE aggregation. The old form
        # (join sym->labels, groupBy neighbor-min, left-join back onto
        # labels, coalesce) shuffled the label table twice per round; here
        # the vertex's own label rides along as a union self-row, so
        # min(label) over (self-row ∪ neighbor rows) IS the update —
        # vertices without neighbors keep their label via the self-row,
        # exactly the old coalesce semantics. Per round: one join + one
        # groupBy, map-side partial min (guide §2.3 "aggregate before you
        # shuffle", §2.4 fewer exchanges).
        nbr = sym.join(labels.withColumnRenamed("u", "v"), "v").select("u", "label")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)  # materialized by the probe below
        )
        row = _label_sum(new_labels, with_seed=prev_sum is None)
        if prev_sum is None:
            prev_sum = row["su"]
        new_sum = row["s"]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
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
        # lazy: the fingerprint probe below materializes it in one job
        .localCheckpoint(eager=False)
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
    else:
        verts = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()

    rounds = 0
    fp = _edge_fingerprint(e)
    # r11 note: a min-over-window variant (fusing each star's groupBy+join
    # into one window) was measured and REVERTED — the window forces a full
    # shuffle+sort of the symmetrized edge table per star, where the
    # groupBy form shuffles only pre-aggregated per-center minima and lets
    # AQE broadcast them back (sf0.1 ER graph: 2.7s -> 5.2s regression).
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m(u) = min over neighborhood incl. self
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        # r11: no distinct on e1. Its set is irrelevant downstream — m2's
        # min absorbs duplicate (u, m) rows in the partial aggregate, the
        # e1-m2 join emits exactly one output row per e1 row either way
        # (m2 is one row per u), and e2's final distinct collapses the
        # set. The removed exchange+aggregate cost one full shuffle of e1
        # per round to save shuffling duplicate rows into the next two
        # operators — but e1's row count is bounded by |sym| regardless
        # (one output row per filtered sym row), so the duplicate mass the
        # distinct collapsed is at most what the join shuffles anyway.
        # Measured on the sf0.1 ER graph: 2.89 -> 2.25 s, labels
        # identical row-for-row.
        e1 = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
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
            # lazy: the per-round fingerprint probe materializes it, so
            # the eager-checkpoint job per round is folded into the probe
            .localCheckpoint(eager=False)
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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 10**12,
    id_col: str = "id",
    rank_col: str = "rank_pp12",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Integer-exact PageRank power iteration over a directed edge table.

    PageRank (Page et al., 1999) as a fixed number of Pregel-style rounds,
    with the classic float recurrence replaced by an exact integer one so
    the result is bit-identical across engines and partitionings (the
    text_lm_score micro-nat lesson applied to an iterative algorithm):

        r0(v)     = scale div N
        c(u)      = r(u) div outdeg(u)          (per-edge contribution)
        r'(v)     = (15 * (scale div N)) div 100
                    + (85 * sum of c(u) over in-edges u->v) div 100

    i.e. damping 0.85 with every division an integer floor. Floors make
    each round lose a few units of mass (bounded by N + in-degree count),
    which is irrelevant for the ranking use and buys full determinism:
    the per-edge contributions are exact int64, their sum is
    order-independent, and no float ever crosses the engine hash.
    ``85 * sum(c)`` is bounded by ``85 * scale`` ~ 8.5e13, far inside
    int64.

    Scale shape (the 100 TB story): outdegrees are computed once and
    joined onto the edge table once (both hash-partitioned on ``src``);
    each round is then ONE shuffle — join ranks to the pre-degreed edges
    on ``src``, partial-aggregate contributions map-side, final aggregate
    keyed on ``dst`` — plus a left join back onto the vertex table to
    keep rank-sink vertices (no in-edges) at the base value.
    ``localCheckpoint`` after every round cuts the lineage chain exactly
    as in :func:`connected_components`. Vertices with no out-edges leak
    their mass (no dangling redistribution) — fine for centrality
    ranking, and kNN-graph inputs give every vertex out-degree k anyway.

    **Personalized PageRank**: pass ``seeds`` (a one-column DataFrame of
    vertex ids) and the teleport mass goes ONLY to seed vertices —
    ``r0(v) = scale div |S|`` for seeds (0 otherwise), and the per-round
    base term ``(15 * (scale div |S|)) div 100`` likewise lands on seeds
    only. Ranks then measure proximity to the seed set — the "expand this
    trusted seed corpus" curation primitive (Haveliwala, WWW'02), with
    the identical integer recurrence and scale shape (the seed flag is
    one extra broadcast-or-hash left join on the vertex table).

    Returns ``(id_col, rank_col)`` with the rank in parts-per-scale.
    """
    # checkpoint the edge projection itself: it feeds BOTH the vertex
    # derivation and the degree join, and an expensive upstream edge
    # builder (a kNN construction, an LSH pair join) would otherwise be
    # evaluated once per consumer
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).localCheckpoint(
        eager=False
    )
    verts = (
        e.select(F.col("s").alias("v"))
        .union(e.select(F.col("t").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if seeds is not None:
        seed_v = (
            seeds.select(F.col(seeds.columns[0]).alias("v"))
            .distinct()
            .join(verts, "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        n = seed_v.count()
        verts = verts.join(
            seed_v.select("v", F.lit(True).alias("is_seed")), "v", "left"
        ).select("v", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
    else:
        n = verts.count()
        verts = verts.select("v", F.lit(True).alias("is_seed"))
    verts = verts.localCheckpoint(eager=False)
    base0 = scale // n
    base = (15 * base0) // 100
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "s").localCheckpoint(eager=False)

    ranks = verts.select(
        "v",
        F.when(F.col("is_seed"), F.lit(base0).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("r"),
    )
    # r11 optimization: one round = one join + ONE aggregation. The old
    # form summed contributions per target and then LEFT-JOINED the result
    # back onto the vertex table to add the teleport base and keep
    # rank-sinks — a second shuffle of the rank table every round. Here the
    # constant per-vertex base rides along as union rows (c=0, b=base), so
    # groupBy(v) computes `(85*sum(c)) div 100 + sum(b)` in one pass:
    # exactly one base row per vertex reproduces the old
    # `base + (85*coalesce(m,0)) div 100` bit-for-bit (sum(c)=0 for
    # sinks), with map-side partial sums (guide §2.3/§2.4).
    base_rows = verts.select(
        "v",
        F.lit(0).cast("bigint").alias("c"),
        F.when(F.col("is_seed"), F.lit(base).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("b"),
    ).localCheckpoint(eager=False)
    for i in range(iters):
        contrib = ed.join(ranks.withColumnRenamed("v", "s"), "s").select(
            F.col("t").alias("v"),
            F.expr("r div outdeg").alias("c"),
            F.lit(0).cast("bigint").alias("b"),
        )
        ranks = (
            base_rows.unionByName(contrib)
            .groupBy("v")
            .agg(
                (F.expr("(85 * sum(c)) div 100") + F.sum("b"))
                .cast("bigint")
                .alias("r")
            )
        )
        # r11 (2nd pass): `ranks` is referenced exactly ONCE per round (the
        # contrib join), so the un-checkpointed plan nests LINEARLY and a
        # per-round barrier buys nothing — but costs a full Catalyst
        # compile per round, because even a lazy localCheckpoint plans the
        # accumulated query eagerly on the driver (Dataset.checkpoint
        # builds the RDD at call time). Measured at sf0.1: 7.5 s -> 5.5 s
        # for the 5-round central query, bit-identical ranks. A barrier
        # every 8th round keeps very deep iteration counts from compiling
        # O(depth^2) plan text while still letting the common shallow runs
        # (5 rounds here) compile exactly once at the caller's action.
        if (i + 1) % 8 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("v").alias(id_col), F.col("r").alias(rank_col))


def pagerank_oracle(
    edges_sql: str,
    iters: int = 5,
    scale: int = 10**12,
    id_col: str = "id",
    rank_col: str = "rank_pp12",
    seeds_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`pagerank`: the power iteration unrolled into
    one CTE chain per round (fixed ``iters``, so no recursion needed).
    ``edges_sql`` must yield ``(src, dst)``; ``seeds_sql``, if given, must
    yield one column of seed vertex ids (personalized teleport). Every
    arithmetic step mirrors the Spark side's integer recurrence exactly
    (`//` floors like Spark's ``div`` on the non-negative operands used
    here)."""
    parts = [
        f"WITH edges AS (SELECT src, dst FROM ({edges_sql}) e0)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "av AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges "
        "UNION ALL SELECT dst FROM edges) uv)",
    ]
    if seeds_sql is None:
        parts.append("verts AS (SELECT v, TRUE AS is_seed FROM av)")
        parts.append(
            f"nn AS (SELECT {scale} // count(*) AS base0, "
            f"(15 * ({scale} // count(*))) // 100 AS base FROM av)"
        )
    else:
        parts.append(
            f"sv AS (SELECT DISTINCT c AS v FROM ({seeds_sql}) s0(c) "
            "WHERE c IN (SELECT v FROM av))"
        )
        parts.append(
            "verts AS (SELECT av.v, av.v IN (SELECT v FROM sv) AS is_seed FROM av)"
        )
        parts.append(
            f"nn AS (SELECT {scale} // count(*) AS base0, "
            f"(15 * ({scale} // count(*))) // 100 AS base FROM sv)"
        )
    parts.append(
        "r0 AS (SELECT v, CAST(CASE WHEN is_seed THEN base0 ELSE 0 END AS BIGINT) AS r "
        "FROM verts CROSS JOIN nn)"
    )
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS (SELECT e.dst AS v, sum(r.r // g.outdeg) AS m "
            f"FROM edges e JOIN r{i - 1} r ON e.src = r.v "
            "JOIN deg g ON e.src = g.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT verts.v, CAST("
            "CASE WHEN verts.is_seed THEN nn.base ELSE 0 END + "
            f"(85 * COALESCE(s{i}.m, 0)) // 100 AS BIGINT) AS r "
            f"FROM verts CROSS JOIN nn LEFT JOIN s{i} ON verts.v = s{i}.v)"
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT v AS {id_col}, r AS {rank_col} FROM r{iters}"


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Per-vertex triangle counts via the degree-oriented node-iterator
    (Schank & Wagner 2005; the MapReduce formulation of Suri & Vassilvitskii,
    WWW'11). Triangles measure neighborhood density — on a near-dup or kNN
    graph they separate tight duplicate cliques from chance collisions
    (a band-LSH false positive rarely closes a triangle).

    The naive 3-way edge self-join explodes on hub vertices (a degree-d
    hub contributes d^2 wedge rows). Orienting every undirected edge from
    the (degree, id)-SMALLER endpoint to the larger makes each vertex's
    out-degree O(sqrt(|E|)) — the classic bound — so the wedge join
    ``e(a,b) x e(a,c)`` fans out quadratically only in the SMALL per-hub
    out-degrees, and each triangle appears exactly once (its unique
    order-minimal vertex is the wedge center). Three hash shuffles total:
    degree count, wedge build keyed on the center, wedge-closure join
    keyed on the (b, c) edge. Returns ``(id_col, triangles)`` for
    vertices in at least one triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): edge goes from the smaller (d, id) endpoint
    ordered = (
        und.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=False)
    )
    wedges = (
        ordered.select(F.col("a"), F.col("b").alias("w1"))
        .join(ordered.select(F.col("a"), F.col("b").alias("w2")), "a")
        .filter(F.col("w1") < F.col("w2"))
    )
    tris = wedges.join(
        und.select(F.col("u").alias("w1"), F.col("v").alias("w2")),
        ["w1", "w2"],
    )
    return (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("w1"), F.col("w2"))).alias(id_col)
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )


def triangle_counts_oracle(edges_sql: str, id_col: str = "id") -> str:
    """DuckDB twin of :func:`triangle_counts` — the same oriented wedge
    join, so hub behavior and output agree structurally."""
    return f"""
WITH e0 AS (SELECT src, dst FROM ({edges_sql}) q),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT x, count(*) AS d FROM (
    SELECT u AS x FROM und UNION ALL SELECT v FROM und
  ) t GROUP BY x
),
ordered AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v)
              THEN und.u ELSE und.v END AS a,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v)
              THEN und.v ELSE und.u END AS b
  FROM und JOIN deg du ON und.u = du.x JOIN deg dv ON und.v = dv.x
),
tris AS (
  SELECT w.a, w.w1, w.w2
  FROM (SELECT x.a, x.b AS w1, y.b AS w2
        FROM ordered x JOIN ordered y ON x.a = y.a AND x.b < y.b) w
  JOIN und ON und.u = w.w1 AND und.v = w.w2
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS triangles
FROM (
  SELECT a AS {id_col} FROM tris
  UNION ALL SELECT w1 FROM tris
  UNION ALL SELECT w2 FROM tris
) x GROUP BY {id_col}
"""


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


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """k-core decomposition by iterative peeling (Batagelj & Zaveršnik
    2003; the distributed round-synchronous form): repeatedly drop every
    vertex whose degree in the SURVIVING graph is < k, until stable. On a
    near-dup or kNN graph the k-core isolates the dense duplicate families
    — vertices kept only by chains of weak links peel away, cores of
    mutually-similar documents survive.

    ``rounds`` is a FIXED bound, not a convergence test: both this and the
    oracle run exactly ``rounds`` peel passes, then report the degree of
    every vertex still meeting the bar, so the two engines agree even on a
    graph that has not converged (pytest pins convergence on a long chain,
    where each pass removes only the endpoints — the adversarial case).

    r12 shape: the edge set is SYMMETRIZED once (every undirected edge as
    two directed rows), so a vertex's degree is one partial-aggregable
    ``groupBy(s).count()`` per pass — the map side collapses each vertex's
    rows before the (vertex, count) exchange, so the shuffle carries one
    tiny row per vertex instead of every edge row, and nothing sorts. The
    pass then drops edges whose either endpoint FAILED the bar via two
    left-ANTI joins against the failing set (``deg < k``): on a peeling
    graph the failing set is far smaller than the surviving set, so the
    planner broadcasts it (and keeps SMJ freedom when it is not small).
    Both endpoints' memberships are decided against the same round-start
    snapshot, so the symmetry invariant holds round to round and the
    semantics are the exact Batagelj-Zaveršnik round peel. A lazy
    ``localCheckpoint`` every SECOND pass bounds the plan (between
    barriers the surviving table is referenced twice per pass — degree +
    join — so an unbarriered chain re-executes its subtree 2^rounds
    times: measured 9.7 s with no mid barriers vs 2.2 s with one per two
    passes at sf0.1).

    History: the r10 form (unordered edge table, union-both-roles degree,
    two semi joins, checkpoint EVERY pass) measured 3.66 s on the r12 box;
    the r11 form (two window counts per pass, zero checkpoints — one
    linear plan) removed the per-pass Catalyst compile that dominated on a
    slow box but pays two full sort+shuffles of the edge table per pass,
    and REGRESSED on the driver board (2.46 -> 4.49 s; 3.98 s on the r12
    box). This form keeps the cheap-compile property (3 bounded compiles
    for 6 rounds) and replaces every sort with a partial aggregation:
    min-of-5 isolated 2.24 s vs 3.98 s (window) on the same box, identical
    rows across all three forms. At scale the per-pass cost is one scan of
    stored edge blocks + a per-vertex exchange + the anti-join probes — no
    corpus-sized sort anywhere.

    Returns ``(id_col, core_degree)`` — vertices of the ``rounds``-peeled
    graph with degree >= k, and that degree.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    s = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .union(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint(eager=False)
    )
    for i in range(rounds):
        deg = s.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
        bad = deg.filter(F.col("dg") < k).select(F.col("s").alias("x"))
        s = (
            s.join(bad.withColumnRenamed("x", "s"), "s", "left_anti")
            .join(bad.withColumnRenamed("x", "d"), "d", "left_anti")
            .select("s", "d")
        )
        if (i + 1) % 2 == 0 and i != rounds - 1:
            s = s.localCheckpoint(eager=False)
    final = s.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).filter(
        F.col("dg") >= k
    )
    return final.select(
        F.col("s").alias(id_col), F.col("dg").cast("bigint").alias("core_degree")
    )


def kcore_oracle(
    edges_sql: str, k: int = 3, rounds: int = 6, id_col: str = "id"
) -> str:
    """DuckDB twin of :func:`kcore`: the same fixed number of peel passes
    unrolled into a CTE chain (degree -> survivors -> filtered edges per
    pass), so the engines agree round-for-round with no convergence
    assumption."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each peel
    # round references the previous one ~5x (FROM + two IN-subqueries via
    # the degree CTE), so an inlined chain expands 5^rounds copies of the
    # base scan and dies on file handles before it dies on CPU
    parts = [
        f"WITH e0raw AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) q)",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM e0raw WHERE src <> dst)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT x, count(*) AS d FROM "
            f"(SELECT u AS x FROM e{i-1} UNION ALL SELECT v FROM e{i-1}) t GROUP BY x)"
        )
        parts.append(f"s{i} AS MATERIALIZED (SELECT x FROM d{i} WHERE d >= {k})")
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM e{i-1} "
            f"WHERE u IN (SELECT x FROM s{i}) AND v IN (SELECT x FROM s{i}))"
        )
    parts.append(
        f"dfin AS (SELECT x, count(*) AS d FROM "
        f"(SELECT u AS x FROM e{rounds} UNION ALL SELECT v FROM e{rounds}) t GROUP BY x)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\nSELECT x AS {id_col}, CAST(d AS BIGINT) AS core_degree "
        f"FROM dfin WHERE d >= {k}"
    )
