"""Graph analytics over relational edge lists — triangle counting with the
degree-ordered orientation that makes it tractable at warehouse scale.

Reference analog: none (the reference has no graph surface); this extends the
engine the same way `nation_pagerank` (statistics.py) does — graph algorithms
expressed as joins/aggregations so Catalyst plans them like any other query.

Why orientation matters at 100 TB: naive triangle counting joins the edge
list with itself on shared endpoints — the wedge (2-path) relation, whose
size is Σ_v deg(v)², quadratic in the degree of hub nodes.  Orienting every
edge from its lower-(degree, id) endpoint to the higher one keeps each
triangle exactly once AND bounds every node's *out*-degree by O(√m), so the
oriented wedge join materializes at most O(m^1.5) rows regardless of hub
skew — the standard MapReduce/MPC result (Suri & Vassilvitskii, WWW'11).
The final wedge-closure check is an equi-join against the oriented edge
list itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.checkpoints import round_checkpoint
from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
from e_commerce_streaming_datapipeline_spark.functions.scalars import scalar_join
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def supplier_triangles(lineitem: DataFrame) -> DataFrame:
    """Triangle census of the supplier co-part graph.

    Graph: suppliers are nodes; an undirected edge links two suppliers that
    ship at least one common part (derived from lineitem's part→supplier
    incidence, deduplicated first so fact-table row counts never inflate the
    edge list).  Output is one row: node/edge/wedge/triangle counts and the
    global clustering coefficient 3·triangles / wedges.

    Plan shape: distinct(part,supp) → per-part pair expansion (bounded by
    suppliers-per-part, the natural cap replication factor) → distinct edges
    → degree agg → degree-oriented wedge self-join → closure equi-join →
    single-row agg.  Every join is an equi-join on supplier/part keys; the
    only quadratic-risk step (per-part pairs) is bounded by the incidence
    fan-out, which a real deployment caps with a `HAVING count <= k` guard
    on promiscuous parts (the same guard `minhash_near_dups` applies to
    oversized LSH buckets).
    """
    # edge definition is selective on purpose: an edge needs a shared
    # *high-volume* part (l_quantity >= 49).  Without the predicate the
    # synthetic fixture's uniform part→supplier incidence makes the co-part
    # graph near-complete (every supplier pair shares SOME part), and a
    # triangle census of a near-complete graph is Θ(n³) answers — noise,
    # not structure.  The threshold keeps avg degree ~30 at sf0.1.
    ps = (
        lineitem.where(F.col("l_quantity") >= 49)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient: lower (deg, id) -> higher (deg, id); total order => acyclic
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
    )
    w1 = oriented.select(F.col("src"), F.col("dst").alias("x"))
    w2 = oriented.select(F.col("src"), F.col("dst").alias("y"))
    # out-neighbour pairs, canonicalized by node id (x < y).  The closing
    # edge may carry either degree-orientation, so the closure side is
    # re-canonicalized to (least, greatest) before the equi-join.
    wedges_o = w1.join(w2, "src").where(F.col("x") < F.col("y"))
    closure = oriented.select(
        F.least("src", "dst").alias("x"),
        F.greatest("src", "dst").alias("y"),
        F.lit(1).alias("closed"),
    )
    # outer coalesce: SUM over an empty wedge relation is NULL while the
    # oracle's COUNT(*) is 0 — pin the empty-graph case to 0 on both engines
    tri = wedges_o.join(closure, ["x", "y"], "left").agg(
        F.coalesce(
            F.sum(F.coalesce(F.col("closed"), F.lit(0))), F.lit(0)
        ).alias("n_triangles")
    )
    counts = scalar_join(
        edges.agg(F.count("*").alias("n_edges")),
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
        ),
    )
    return scalar_join(counts, tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        fround(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
            "global_clustering"
        ),
    )


_TRIANGLE_ORACLE = """
WITH ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
    FROM lineitem WHERE l_quantity >= 49
), edges AS (
    SELECT DISTINCT a.sk AS u, b.sk AS v
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
), deg AS (
    SELECT node, count(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
    ) GROUP BY node
), oriented AS (
    SELECT
        CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
             THEN e.u ELSE e.v END AS src,
        CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
             THEN e.v ELSE e.u END AS dst
    FROM edges e
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
), closure AS (
    SELECT least(src, dst) AS x, greatest(src, dst) AS y FROM oriented
), tri AS (
    SELECT count(*) AS n_triangles
    FROM oriented w1
    JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst
    JOIN closure c ON c.x = w1.dst AND c.y = w2.dst
)
SELECT
    (SELECT count(*) FROM deg) AS n_nodes,
    (SELECT count(*) FROM edges) AS n_edges,
    (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
    n_triangles,
    round(3.0 * n_triangles / (SELECT sum(deg * (deg - 1) // 2) FROM deg)
          * 1000000) / 1000000 AS global_clustering
FROM tri
"""


@query("supplier_triangles", oracle=_TRIANGLE_ORACLE)
def q_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle count + global clustering coefficient of the
    supplier co-part graph (O(m^1.5) oriented wedge join, hub-skew safe)."""
    return supplier_triangles(load_table(spark, "lineitem", sf_dir))


_COPURCHASE_TOPK = 20


@query(
    "copurchase_pairs",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), n AS (
    SELECT count(DISTINCT ok) AS n_orders FROM op
), part_cnt AS (
    SELECT pk, count(*) AS cnt FROM op GROUP BY pk
), pairs AS (
    SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS support
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
)
SELECT part_a, part_b, support,
       ca.cnt AS count_a, cb.cnt AS count_b,
       round(CAST(support AS DOUBLE) * n.n_orders / (ca.cnt * cb.cnt)
             * 10000) / 10000 AS lift
FROM pairs, n
JOIN part_cnt ca ON ca.pk = part_a
JOIN part_cnt cb ON cb.pk = part_b
ORDER BY support DESC, part_a, part_b
LIMIT {_COPURCHASE_TOPK}
""",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: top-20 part pairs by
    co-occurrence support across orders, with lift
    (support·N / (count_a·count_b)) — the association signal a
    recommendation pipeline derives from the order fact table.

    Plan shape: distinct (order, part) incidence first (fact-row counts
    never inflate supports), pair expansion via self-equi-join on the order
    key — bounded by items-per-order (TPC-H ≤ 7, so ≤ 21 pairs/order;
    a real deployment guards promiscuous baskets with HAVING count <= k
    like the LSH buckets) — then a hash-agg on the pair and two broadcast
    joins against the tiny per-part count relation.  Top-k is a
    TakeOrdered over the pair relation, never a global sort."""
    op = (
        load_table(spark, "lineitem", sf_dir)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n_orders = op.select(F.count_distinct("ok").alias("n_orders"))
    part_cnt = op.groupBy("pk").agg(F.count("*").alias("cnt"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count("*").alias("support"))
    )
    ca = part_cnt.select(F.col("pk").alias("part_a"), F.col("cnt").alias("count_a"))
    cb = part_cnt.select(F.col("pk").alias("part_b"), F.col("cnt").alias("count_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .transform(lambda d: scalar_join(d, n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            "count_a",
            "count_b",
            fround(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("count_a") * F.col("count_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(_COPURCHASE_TOPK)
    )


# --------------------------------------------------------------------------
# Recursive-CTE BFS reachability (Spark 4 WITH RECURSIVE surface)
# --------------------------------------------------------------------------

_REACHABILITY_SQL = """
WITH RECURSIVE ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
    FROM lineitem WHERE l_quantity >= 49
), edges AS (
    SELECT a.sk AS u, b.sk AS v
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk <> b.sk
    GROUP BY 1, 2
), seed AS (
    SELECT min(u) AS s FROM edges
), walk(node, depth) AS (
    SELECT s, 0 FROM seed
    UNION ALL
    SELECT e.v, w.depth + 1
    FROM walk w JOIN edges e ON e.u = w.node
    WHERE w.depth < 3
)
SELECT node AS suppkey,
       CAST(min(depth) AS BIGINT) AS hops,
       CAST(count(*) AS BIGINT)   AS n_walks
FROM walk
GROUP BY node
ORDER BY suppkey
"""


@query("recursive_reachability", oracle=_REACHABILITY_SQL)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE graph traversal (``WITH RECURSIVE``, new SQL surface
    in Spark 4): breadth-first walk of the supplier co-part graph (same
    selective edge rule as ``supplier_triangles``) from the minimum-key
    supplier, bounded at 3 hops; per reached supplier, the minimum hop
    count and the number of distinct ≤3-hop walks arriving there.  The
    iterate-until-frontier-empty shape behind org-chart rollups,
    bill-of-materials explosions, and category-tree traversals — expressed
    in pure SQL instead of a driver-side loop.

    Shared-dialect discipline (the `ansi_shared_sql_revenue` pattern): the
    SAME SQL text is submitted to Spark and to the DuckDB oracle — the
    recursion semantics themselves are what's being parity-checked, and
    every value is integer arithmetic so the match is exact.

    Scale: the recursion is UNION ALL with an explicit depth bound, so each
    step is one equi-join of the frontier against the edge list — a plan
    Catalyst shuffles on the join key like any other join; walk count grows
    as deg^depth, which the depth bound caps (and a production BFS over a
    hub-skewed graph would switch to per-level ``min(depth)`` dedup — the
    UNION-distinct form — to keep frontiers linear in nodes).  The edge
    build (the only corpus-sized stage) is the triangle census's bounded
    per-part pair expansion, computed once before recursion starts."""
    from e_commerce_streaming_datapipeline_spark.sources.batch import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REACHABILITY_SQL)


# --------------------------------------------------------------------------
# Connected components (iterative min-label propagation)
# --------------------------------------------------------------------------

_COMPONENTS_ORACLE = """
WITH RECURSIVE ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
    FROM lineitem WHERE l_quantity >= 49
), edges AS (
    SELECT a.sk AS u, b.sk AS v
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk <> b.sk
    GROUP BY 1, 2
), nodes AS (
    SELECT DISTINCT sk AS node FROM ps
), reach(src, node) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
), comp AS (
    SELECT src AS node, min(node) AS component_id FROM reach GROUP BY src
)
SELECT component_id,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       max(node)                AS max_suppkey
FROM comp
GROUP BY 1
"""


@query("supplier_components", oracle=_COMPONENTS_ORACLE)
def q_supplier_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the supplier co-part graph by ITERATIVE
    min-label propagation — the driver-loop-until-converged algorithm family
    (alongside the bounded-iteration Lloyd step and the pure-SQL
    ``WITH RECURSIVE`` BFS): every node starts labeled with its own id, each
    round takes the min of its own and its neighbors' labels, and the loop
    stops when a round changes nothing.  Output: one row per component
    (id = min supplier key, size, max member).

    The oracle computes the same components by recursive closure (UNION-
    distinct reachability → min reachable id), so the fixed point itself is
    hash-checked — not just row counts.

    Scale shape: each round is ONE equi-join of the directed edge list
    against the current labels plus a min-aggregate — Catalyst shuffles on
    the node key like any join; labels relation stays node-sized all the
    way.  Convergence here is O(diameter) rounds (assert-capped); at
    10⁹-node scale the same loop uses the large-star/small-star rewiring
    (Kiveris et al., SoCC'14) to collapse rounds to O(log n), and each
    round checkpoints its frontier exactly as done here (lineage
    truncation — without it the plan, not the data, is what blows up).
    """
    ps = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_quantity") >= 49)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") != F.col("b.sk")))
        .select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist) per round: each round's labels are read
    # by TWO consumers of the NEXT round (neighbor join + left join), so
    # without lineage truncation the logical plan grows ~3x per round and
    # the driver spends more time PLANNING the final aggregate than the
    # executors spend running it (r9 measurement: the persisted-loop plan
    # was 16,889 lines / 2,363 Exchange nodes; checkpointed it is
    # round-count-independent) — the star variant already does exactly
    # this, for the same reason.
    labels = (
        ps.select(F.col("sk").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .transform(round_checkpoint)
    )
    try:
        for _round in range(30):
            neighbor_min = (
                edges.join(labels, edges["u"] == labels["node"])
                .select(F.col("v").alias("node"), "label")
                .groupBy("node")
                .agg(F.min("label").alias("nbr_label"))
            )
            # old label rides along so convergence is a filter+count on the
            # checkpointed round output — the former separate old⋈new join
            # re-shuffled the node relation once per round just to count
            # changes (one full equi-join removed per round, guide §2.4)
            joined = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.col("label").alias("__old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            ).transform(round_checkpoint)
            changed = joined.where(
                F.col("label") != F.col("__old_label")
            ).count()
            labels = joined.select("node", "label")
            if changed == 0:
                break
        else:  # pragma: no cover - diameter 30 would be a fixture anomaly
            raise AssertionError("label propagation did not converge in 30 rounds")
        return (
            labels.groupBy(F.col("label").alias("component_id"))
            .agg(
                F.count("*").alias("n_suppliers"),
                F.max("node").alias("max_suppkey"),
            )
        )
    finally:
        edges.unpersist()


# --------------------------------------------------------------------------
# Connected components (large-star / small-star, O(log n) rounds)
# --------------------------------------------------------------------------


@query("supplier_components_star", oracle=_COMPONENTS_ORACLE)
def q_supplier_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by LARGE-STAR / SMALL-STAR edge rewiring
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round algorithm that `supplier_components`'
    docstring names as the 10⁹-node upgrade over O(diameter) min-label
    propagation.  Same graph (supplier co-part, `l_quantity >= 49` edge
    rule), same output schema, same recursive-closure oracle — so the two
    algorithms are hash-checked against each other through DuckDB.

    Each round rewrites the edge set twice:

    * **large-star**: every node u connects its strictly-LARGER neighbors
      to m = min(N(u) ∪ {u}) — one symmetric-neighborhood min-aggregate
      plus one equi-join back on u.
    * **small-star**: with edges oriented (hi → lo), every node u connects
      its (all smaller) neighbors AND itself to m = min(N(u)) — one
      min-aggregate + equi-join on the same key.

    The fixed point is a forest of stars whose centers are the component
    minima; labels fall out of one left join (isolated suppliers keep
    their own key).  Convergence is checked with a count + one-sided
    `exceptAll` (equal-size distinct sets with empty difference are
    equal); a petabyte deployment would swap that for the cheap
    (count, xor-of-edge-hashes) checksum the docstring trade here makes
    explicit.

    Scale shape: every step is an equi-join or hash-aggregate keyed on a
    node id — no global sorts, no driver state beyond the loop counter;
    each round's relation is bounded by |E| + |V| (large-star emits at
    most one edge per input edge; small-star adds at most one (u, min)
    edge per node) and collapses toward |V| − #components as stars form.
    Rounds are O(log n) versus propagation's O(diameter) — on a 10⁹-node
    web graph with diameter ~500 that is ~30 jobs instead of ~500, which
    is exactly why this variant exists alongside the simpler loop."""
    ps = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_quantity") >= 49)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    # canonical (hi, lo) orientation from the start: u > v, no self loops
    edges = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") > F.col("b.sk")))
        .select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .distinct()
    )
    nodes = ps.select(F.col("sk").alias("node")).distinct()
    labels = star_component_labels(edges, nodes)
    return labels.groupBy(F.col("label").alias("component_id")).agg(
        F.count("*").alias("n_suppliers"),
        F.max("node").alias("max_suppkey"),
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: connect every node's strictly-larger neighbors
    to the min of its closed neighborhood.  Input/output edges are canonical
    (u > v)."""
    # symmetric neighborhoods; m = min over N(u) ∪ {u}
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("mn", "u").alias("m")
    )
    # v > u >= m, so output is already (hi, lo) canonical
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: connect every node's (all smaller) neighbors
    and the node itself to its min neighbor.  Canonical (u > v) in/out."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        e.join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionAll(mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return (
        rewired.where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )


def star_component_labels(
    edges: DataFrame,
    nodes: DataFrame,
    max_rounds: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Run alternating large-star/small-star to the fixed point and return
    ``(node, label)`` where label is the component's minimum node id.

    ``edges`` must be canonical (u > v, no self loops, distinct);
    ``nodes`` is one ``node`` column covering every vertex (isolated nodes
    label themselves).  Factored out of the registered query so property
    tests can drive crafted graphs (chains, cliques, isolated nodes)
    through the exact production loop."""
    first = edges.persist()  # handle kept: the one REAL persist to release
    edges = first
    n_old = edges.count()  # carried across rounds: one count job per round
    try:
        for _round in range(max_rounds):
            # localCheckpoint truncates lineage: one LS+SS round references
            # its input ~6 times, so without truncation the logical plan
            # grows exponentially in rounds and the DRIVER (not executors)
            # dies planning it — the canonical iterative-algorithm pitfall.
            # A fault-tolerant cluster deployment uses reliable checkpoint()
            # to HDFS instead; same plan, durable blocks.
            new_edges = _small_star(_large_star(edges)).transform(round_checkpoint)
            n_new = new_edges.count()
            # exceptAll (the exact set compare) runs only when the cheap
            # cardinality check already matches — near convergence, not
            # every round
            unchanged = n_new == n_old and new_edges.exceptAll(edges).count() == 0
            if edges is first:
                first.unpersist()
            # checkpointed rounds have NO unpersist: Dataset.unpersist is a
            # no-op on localCheckpoint blocks (they live at the RDD layer),
            # so pretending to free them is misleading — they are released
            # by the ContextCleaner as each round's reference drops, and the
            # live set is bounded by the O(log n) round count
            edges, n_old = new_edges, n_new
            if stats is not None:
                stats["rounds"] = _round + 1
            if unchanged:
                break
        else:  # pragma: no cover - log2(fixture graph) << max_rounds
            raise AssertionError(
                f"star rewiring did not converge in {max_rounds} rounds"
            )
        # fixed point = stars: every non-root points at its component min
        return nodes.join(
            edges.select(F.col("u").alias("node"), F.col("v").alias("label")),
            "node",
            "left",
        ).select("node", F.coalesce("label", "node").alias("label"))
    finally:
        if edges is first:  # converged in round 0 exit paths / errors
            first.unpersist()


# --------------------------------------------------------------------------
# Link prediction: neighborhood Jaccard over the supplier co-part graph
# --------------------------------------------------------------------------

_LINK_PRED_K = 20


@query(
    "supplier_link_prediction",
    oracle=f"""
WITH inc AS (
    SELECT DISTINCT l_suppkey AS s, l_partkey AS p
    FROM lineitem WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
), deg AS (
    SELECT s, count(*) AS degree FROM inc GROUP BY 1
), common AS (
    SELECT a.s AS s_a, b.s AS s_b, count(*) AS common_parts
    FROM inc a JOIN inc b ON a.p = b.p AND a.s < b.s
    GROUP BY 1, 2
), scored AS (
    SELECT c.s_a, c.s_b,
           CAST(c.common_parts AS BIGINT) AS common_parts,
           CAST(da.degree AS BIGINT)      AS deg_a,
           CAST(db.degree AS BIGINT)      AS deg_b,
           CAST(c.common_parts * 1000000
                // (da.degree + db.degree - c.common_parts) AS BIGINT)
               AS jaccard_x1e6
    FROM common c
    JOIN deg da ON da.s = c.s_a
    JOIN deg db ON db.s = c.s_b
)
SELECT * FROM scored
ORDER BY jaccard_x1e6 DESC, s_a, s_b
LIMIT {_LINK_PRED_K}
""",
)
def q_supplier_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION over the supplier co-part graph: the
    top-{_LINK_PRED_K} supplier pairs by neighborhood Jaccard (shared
    parts over the union of part sets) — the classic common-neighbors
    recommender ("suppliers likely to stock each other's catalog next",
    and the blocking score entity-resolution pipelines use to merge
    vendor records).  Where `supplier_triangles` summarizes the graph's
    closure into one number, this ranks the OPEN wedges most likely to
    close.

    Plan shape: the pair expansion is the same degree-bounded wedge join
    as the triangle census — incidence self-joined on the PART key, so
    blow-up per part is (suppliers-per-part choose 2), never all supplier
    pairs; degrees join back on the supplier key (dim-sized broadcast);
    the final ranking is TakeOrdered on the QUANTIZED integer score
    (exact scaled division — no float ties for engines to break
    differently).  At 100 TB hot parts get the same df-cap treatment as
    hot shingles in the dedup family (documented, not silently applied).

    NULL supplier/part keys cannot form graph edges and drop on both
    engines (lineitem-edge pin)."""
    inc = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_suppkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = inc.groupBy("s").agg(F.count("*").alias("degree"))
    a = inc.select(F.col("s").alias("s_a"), "p")
    b = inc.select(F.col("s").alias("s_b"), "p")
    common = (
        a.join(b, "p")
        .where(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count("*").alias("common_parts"))
    )
    scored = (
        common.join(
            F.broadcast(deg.select(F.col("s").alias("s_a"), F.col("degree").alias("deg_a"))),
            "s_a",
        )
        .join(
            F.broadcast(deg.select(F.col("s").alias("s_b"), F.col("degree").alias("deg_b"))),
            "s_b",
        )
        .select(
            "s_a",
            "s_b",
            F.col("common_parts").cast("long").alias("common_parts"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            F.expr(
                "(common_parts * 1000000) div (deg_a + deg_b - common_parts)"
            ).alias("jaccard_x1e6"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_x1e6").desc(), "s_a", "s_b"
    ).limit(_LINK_PRED_K)


# --------------------------------------------------------------------------
# Label-propagation community detection (mode-of-neighbors, synchronous)
# --------------------------------------------------------------------------

_LPA_ROUNDS = 3

_LPA_ORACLE = f"""
WITH ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
    FROM lineitem WHERE l_quantity >= 49
), e AS (
    SELECT DISTINCT a.sk AS u, b.sk AS v
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
), adj AS (
    SELECT u AS node, v AS nbr FROM e
    UNION ALL
    SELECT v AS node, u AS nbr FROM e
), l0 AS (
    SELECT DISTINCT node, node AS label FROM adj
), l1 AS (
    SELECT node, label FROM (
        SELECT a.node, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY a.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM adj a JOIN l0 l ON l.node = a.nbr
        GROUP BY a.node, l.label
    ) WHERE rn = 1
), l2 AS (
    SELECT node, label FROM (
        SELECT a.node, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY a.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM adj a JOIN l1 l ON l.node = a.nbr
        GROUP BY a.node, l.label
    ) WHERE rn = 1
), l3 AS (
    SELECT node, label FROM (
        SELECT a.node, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY a.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM adj a JOIN l2 l ON l.node = a.nbr
        GROUP BY a.node, l.label
    ) WHERE rn = 1
)
SELECT
    CAST(label AS BIGINT)    AS community_id,
    CAST(count(*) AS BIGINT) AS n_members,
    CAST(min(node) AS BIGINT) AS min_member,
    CAST(max(node) AS BIGINT) AS max_member
FROM l3
GROUP BY label
ORDER BY community_id
"""


@query("label_propagation_communities", oracle=_LPA_ORACLE)
def q_label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007, public) over the supplier co-part graph — the DENSITY
    clustering that completes the graph family: `supplier_components`
    answers "what is connected at all" (min-label fixed point),
    this answers "which suppliers cluster together" (each node adopts the
    MODE of its neighbors' labels for {_LPA_ROUNDS} synchronous rounds,
    ties broken to the smallest label so the run is deterministic — the
    async/random variant of the published algorithm is deliberately not
    used, determinism is a correctness requirement here).  Output: one
    row per surviving community with size and member span.

    Plan shape: each round is ONE equi-join of the adjacency list against
    the node-sized label relation plus a hash aggregate on (node, label)
    and a node-partitioned top-1 window (PARTITION BY node — parallel,
    never a global window); {_LPA_ROUNDS} rounds are unrolled statically,
    so there is no driver loop and no collect.  The label relation stays
    node-sized every round; the vote relation is edge-sized — the same
    shuffle budget as one PageRank step.  The oracle unrolls the identical
    rounds as CTEs, so the fixed labels themselves are hash-checked."""
    ps = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_quantity") >= 49)
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    a = ps.select(F.col("pk"), F.col("sk").alias("u"))
    b = ps.select(F.col("pk"), F.col("sk").alias("v"))
    edges = (
        a.join(b, "pk")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    top1 = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label")
                ),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(top1))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_member"),
            F.max("node").cast("long").alias("max_member"),
        )
        .select(
            F.col("label").cast("long").alias("community_id"),
            "n_members",
            "min_member",
            "max_member",
        )
        .orderBy("community_id")
    )


# --------------------------------------------------------------------------
# k-core decomposition (iterative degree peeling, statically unrolled)
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4

_KCORE_ORACLE = f"""
WITH ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
    FROM lineitem WHERE l_quantity >= 49
), e AS (
    SELECT DISTINCT a.sk AS u, b.sk AS v
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
), a0 AS (
    SELECT u AS node, v AS nbr FROM e
    UNION ALL SELECT v, u FROM e
),
k1 AS (SELECT node FROM a0 GROUP BY node HAVING count(*) >= {_KCORE_K}),
a1 AS (SELECT a.node, a.nbr FROM a0 a
       JOIN k1 x ON x.node = a.node JOIN k1 y ON y.node = a.nbr),
k2 AS (SELECT node FROM a1 GROUP BY node HAVING count(*) >= {_KCORE_K}),
a2 AS (SELECT a.node, a.nbr FROM a1 a
       JOIN k2 x ON x.node = a.node JOIN k2 y ON y.node = a.nbr),
k3 AS (SELECT node FROM a2 GROUP BY node HAVING count(*) >= {_KCORE_K}),
a3 AS (SELECT a.node, a.nbr FROM a2 a
       JOIN k3 x ON x.node = a.node JOIN k3 y ON y.node = a.nbr),
k4 AS (SELECT node FROM a3 GROUP BY node HAVING count(*) >= {_KCORE_K}),
a4 AS (SELECT a.node, a.nbr FROM a3 a
       JOIN k4 x ON x.node = a.node JOIN k4 y ON y.node = a.nbr),
conv AS (
    SELECT (SELECT count(*) FROM k4) = (SELECT count(*) FROM k3) AS converged
)
SELECT
    CAST(a.node AS BIGINT)   AS node,
    CAST(count(*) AS BIGINT) AS core_degree,
    conv.converged           AS converged
FROM a4 a CROSS JOIN conv
GROUP BY a.node, conv.converged
ORDER BY node
"""


@query("kcore_decomposition", oracle=_KCORE_ORACLE)
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Seidman 1983, public) of the supplier
    co-part graph — the dense-subgraph peel completing the graph family's
    fourth axis (connectivity = components, closure = triangles,
    influence = PageRank, clusters = LPA; cores = ENGAGEMENT TIERS):
    repeatedly delete nodes with degree < k until stable; what survives
    is the maximal subgraph where everyone keeps >= k ties.  k=3,
    statically unrolled to 4 peel rounds with a `converged` column
    (round-4 node census == round-3's) so a fixture needing deeper
    peeling is VISIBLE in the hashed result, never silently truncated.

    Plan shape: each round is one hash aggregate (degrees) + two
    node-keyed semi-style joins filtering the adjacency — the same
    shuffle budget per round as a PageRank step; the adjacency only
    shrinks.  Each round is eagerly checkpoint-materialized (one
    driver-submitted job per peel round at build time — the price of
    keeping the plan round-count-independent); no data is collected to
    the driver, and the convergence flag attaches via `scalar_join`
    (1-row broadcast).  At 10^9 nodes the identical loop runs until
    fixpoint — O(peel-depth) rounds, each edge-linear, with
    SPARK_GRAFT_CHECKPOINT_DIR making each round's materialization a
    reliable HDFS checkpoint (executor-loss-safe) instead of
    executor-local blocks."""
    ps = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_quantity") >= 49)
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    a = ps.select("pk", F.col("sk").alias("u"))
    b = ps.select("pk", F.col("sk").alias("v"))
    edges = (
        a.join(b, "pk").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
    keeps = []
    for _ in range(_KCORE_ROUNDS):
        keep = (
            adj.groupBy("node")
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("node")
        )
        keeps.append(keep)
        # each round's adjacency is read by THREE consumers (next round's
        # degree census, the next join, and ultimately the core/convergence
        # outputs): materialize it per round so no consumer re-executes the
        # peel lineage above it (r8 fix, measured 7.6 s -> 4.7 s warm at
        # sf0.1), and localCheckpoint rather than persist so the LINEAGE is
        # truncated too — each reference to a persisted round re-embeds the
        # whole upstream plan (the r8 plan was 7,019 lines / 1,172 Exchange
        # nodes and the driver re-optimized all of it per run; checkpointed
        # rounds keep the plan round-count-independent, the
        # star_component_labels discipline).  Blocks are reclaimed by the
        # ContextCleaner as round references drop.  round_checkpoint flips
        # to reliable checkpoint() under SPARK_GRAFT_CHECKPOINT_DIR —
        # executor-local blocks are lost on executor failure/decommission,
        # which would fail the loop on a real cluster (r9 ADVICE #3).
        adj = (
            adj.join(keep, "node")
            .join(keep.select(F.col("node").alias("nbr")), "nbr")
            .transform(round_checkpoint)
        )
    # convergence: the last round's survivor census equals the one before
    n_last = keeps[-1].agg(F.count("*").alias("n_after"))
    n_prev = keeps[-2].agg(F.count("*").alias("n_before"))
    core = adj.groupBy("node").agg(F.count("*").alias("core_degree"))
    flags = scalar_join(n_last, n_prev).select(
        (F.col("n_after") == F.col("n_before")).alias("converged")
    )
    return (
        scalar_join(core, flags)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("core_degree").cast("long").alias("core_degree"),
            "converged",
        )
        .orderBy("node")
    )
