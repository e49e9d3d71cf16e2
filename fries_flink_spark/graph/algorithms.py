"""Gelly-parity graph algorithms over DataFrame edge lists.

Reference surface (flink-libraries/flink-gelly/.../graph/library/):

- vertex degrees            -> metric/directed|undirected VertexMetrics
- triangle_listing          -> TriangleEnumerator.java,
                               clustering/undirected/TriangleListing.java
- clustering coefficients   -> clustering/undirected/{Local,Global,Average}
                               ClusteringCoefficient.java
- single_source_shortest_paths -> SingleSourceShortestPaths.java (scatter-
                               gather min-distance propagation)
- label_propagation         -> LabelPropagation.java (adopt most frequent
                               neighbor label, ties -> min label)
- hits                      -> linkanalysis/HITS.java
- jaccard_index             -> similarity/JaccardIndex.java
- adamic_adar               -> similarity/AdamicAdar.java
- connected components      -> ConnectedComponents.java — already provided by
                               ``dedup/clusters.connected_components`` (frontier
                               delta iteration); PageRank by
                               ``queries/iterate_queries.iter_pagerank``.

Conventions: an *undirected* graph is an edge list canonicalized to
``(a, b)`` with ``a < b`` and no self-loops; a *directed* graph is ``(src,
dst[, weight])``. Vertex ids are integral.

Scale design (100 TB / billions of edges):

- **Triangle enumeration is degree-ordered**: each undirected edge is
  oriented from its lower-(degree, id) endpoint to the higher one before the
  wedge self-join, so wedges are generated only at each edge's *low-degree*
  endpoint. This is the standard O(m^{3/2}) bound (Gelly's TriangleListing
  does the same re-ordering) — without it one celebrity vertex of degree d
  generates d² wedge candidates.
- **Similarity scores are wedge-joins, not all-pairs**: Jaccard/Adamic-Adar
  only emit vertex pairs that share ≥1 neighbor, produced by a self-join on
  the *neighbor* key. The per-neighbor fan-out is deg(z)²/2; a hub cap
  (``max_neighbor_degree``) bounds it exactly like Gelly's
  ``JaccardIndex.setMaximumScore`` group-limit mitigation and LSH's hot
  bucket cap — capped vertices are dropped with a documented semantic, not
  silently exploded.
- **Iterative algorithms** (SSSP, label propagation, HITS) run a driver loop
  with per-step lineage truncation (operators/iterate.iterate); each
  superstep is one shuffle of messages on the destination key. SSSP work is
  proportional to the improved frontier when run via iterate_delta-style
  min-merge; label counts use a two-phase (partial+final) aggregation that
  Catalyst provides automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.iterate import iterate

__all__ = [
    "adamic_adar",
    "clustering_coefficients",
    "clustering_coefficients_directed",
    "community_detection",
    "hits",
    "jaccard_index",
    "label_propagation",
    "local_clustering_coefficient",
    "single_source_shortest_paths",
    "triadic_census",
    "triadic_census_directed",
    "triangle_listing",
    "vertex_degrees",
]


def _symmetrize(und: DataFrame) -> DataFrame:
    """Undirected (a<b) edge list -> both-direction (u, v) adjacency."""
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def vertex_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex (id, out_degree, in_degree, degree) for a directed edge list.

    Gelly: graph/library/metric/directed/VertexMetrics.java (degree
    annotations). One shuffle per direction, two-phase counts; the full-outer
    merge is co-partitioned on the id.
    """
    outd = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    ind = edges.groupBy(F.col(dst).alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        outd.join(ind, "id", "full")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def triangle_listing(und: DataFrame, distinct_edges: bool = False) -> DataFrame:
    """All triangles (a < b < c) of an undirected graph.

    Gelly: TriangleEnumerator.java / clustering/undirected/TriangleListing.java.
    Degree-ordered enumeration: orient every edge from its lower-(deg, id)
    endpoint, build wedges at the low end, close them against oriented edges.

    ``distinct_edges=True`` asserts the caller already deduplicated ``und``
    (e.g. it comes from an aggregated pair table), skipping the closer-side
    distinct — one shuffle saved.
    """
    deg = (
        _symmetrize(und)
        .groupBy(F.col("u").alias("id"))
        .agg(F.expr("count(1) AS d"))
    )
    # Orient each edge low-(deg,id) -> high-(deg,id).
    e = (
        und.join(deg.selectExpr("id AS a", "d AS da"), "a")
        .join(deg.selectExpr("id AS b", "d AS db"), "b")
        .selectExpr(
            "IF(da < db OR (da = db AND a < b), a, b) AS lo",
            "IF(da < db OR (da = db AND a < b), b, a) AS hi",
        )
    )
    # Wedges at the low-degree apex: (apex -> x, apex -> y), ordered x < y.
    e1 = e.selectExpr("lo AS apex", "hi AS x")
    e2 = e.selectExpr("lo AS apex", "hi AS y")
    wedges = e1.join(e2, "apex").filter(F.expr("x < y"))
    # Close the wedge: the x–y edge exists (in either orientation — both
    # endpoints outrank the apex, so orientation between x and y is unknown).
    closer = e.selectExpr("least(lo, hi) AS x2", "greatest(lo, hi) AS y2")
    if not distinct_edges:
        closer = closer.distinct()
    tri = wedges.join(closer, F.expr("x = x2 AND y = y2")).select(
        "apex", "x", "y"
    )
    # Canonical (a<b<c) output regardless of which vertex was the apex.
    return tri.selectExpr(
        "least(apex, x, y) AS a",
        "CASE WHEN x > least(apex, x, y) AND x < greatest(apex, x, y) THEN x"
        "     WHEN y > least(apex, x, y) AND y < greatest(apex, x, y) THEN y"
        "     ELSE apex END AS b",
        "greatest(apex, x, y) AS c",
    )


def local_clustering_coefficient(und: DataFrame) -> DataFrame:
    """(id, degree, triangle_count, coefficient) per vertex; coefficient =
    2·tri / (d·(d−1)), 0 when d < 2.

    Gelly: clustering/undirected/LocalClusteringCoefficient.java.
    """
    deg = (
        _symmetrize(und)
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_listing(und)
    per_vertex = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangle_count"))
    )
    return (
        deg.join(per_vertex, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangle_count", F.lit(0)).alias("triangle_count"),
        )
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangle_count") / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
        )
    )


def clustering_coefficients(und: DataFrame) -> DataFrame:
    """One-row global metrics: triangle_count, global coefficient
    (3·triangles / open+closed triplets) and average local coefficient.

    Gelly: clustering/undirected/{Global,Average}ClusteringCoefficient.java,
    TriadicCensus.java (triplet counting).
    """
    lcc = local_clustering_coefficient(und)
    return lcc.agg(
        (F.sum("triangle_count") / 3).cast("long").alias("triangle_count"),
        (
            F.sum("triangle_count")
            / F.sum(F.col("degree") * (F.col("degree") - 1) / 2.0)
        ).alias("global_coefficient"),
        F.avg("coefficient").alias("average_coefficient"),
    )


def triadic_census(und: DataFrame) -> DataFrame:
    """One-row census of all C(n,3) vertex triples of an undirected graph by
    edge count: ``t0`` (empty), ``t1`` (one edge), ``t2`` (open wedge),
    ``t3`` (closed triangle).

    Gelly: clustering/undirected/TriadicCensus.java — same four counts,
    derived there from VertexMetrics + GlobalClusteringCoefficient rather
    than triple enumeration. This uses the identical closed-form derivation:

        t3 = triangles
        t2 = wedges − 3·t3            (wedges = Σ_v C(d_v, 2))
        t1 = m·(n−2) − 2·wedges + 3·t3
        t0 = C(n,3) − t1 − t2 − t3

    so the cost is one degree aggregation plus the O(m^{3/2}) triangle count
    — never a scan of the O(n³) triples. All quantities are exact bigints.
    """
    deg = (
        _symmetrize(und)
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Per-term casts keep everything in bigint arithmetic (d·(d−1) is always
    # even, Σd is always even) — no double rounding at any degree.
    sums = deg.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("d") / 2).cast("long").alias("m"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("wedges"),
    )
    tri = triangle_listing(und).agg(F.count(F.lit(1)).alias("t3"))
    return sums.crossJoin(tri).select(
        (
            F.col("n") * (F.col("n") - 1) * (F.col("n") - 2) / 6
            - (F.col("m") * (F.col("n") - 2) - 2 * F.col("wedges") + 3 * F.col("t3"))
            - (F.col("wedges") - 3 * F.col("t3"))
            - F.col("t3")
        ).cast("long").alias("t0"),
        (F.col("m") * (F.col("n") - 2) - 2 * F.col("wedges") + 3 * F.col("t3"))
        .cast("long")
        .alias("t1"),
        (F.col("wedges") - 3 * F.col("t3")).cast("long").alias("t2"),
        F.col("t3").cast("long").alias("t3"),
    )


def triadic_census_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row DIRECTED triadic census: all 16 MAN (mutual-asymmetric-null)
    triad types over the C(n,3) vertex triples of a directed graph.

    Gelly: clustering/directed/TriadicCensus.java — identical derivation:
    per-vertex degree metrics give the raw center-based triplet counts
    (VertexDegreesHelper:297-318: 021d/u/c, 111d/u, 201 from the
    unidirectional-as-source/-as-target/bidirectional splits), triangles are
    classified into the seven 3-edge types (TriangleListingHelper's
    Batagelj–Mrvar type table, here as direct CASE logic on the six pair
    direction flags), open-triplet counts subtract each triangle's
    contributions and the 012/102/003 rows close the census in O(1)
    arithmetic (getResult:102-195). Cost: the O(m^{3/2}) degree-ordered
    triangle join + two degree aggregations — never an O(n³) triple scan.
    All counts are exact bigints.

    Column order follows the reference Result: t003, t012, t102, t021d,
    t021u, t021c, t111d, t111u, t030t, t030c, t201, t120d, t120u, t120c,
    t210, t300.
    """
    # Unordered pair flags: fwd = lower→higher edge exists, rev = opposite.
    # The max-aggregation dedups raw directed edges, so no prior distinct is
    # needed. Cached (not eagerly checkpointed): the pair table feeds ~10
    # consumers (triangle join internals, three flag joins, degree union) —
    # persist() substitutes one shared InMemoryRelation into all of them,
    # materializes inside the single query job (no separate pre-job), keeps
    # lineage for executor-loss recompute, and the cache manager dedups the
    # entry across repeated invocations of the same census.
    pairs = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .select(
            F.least("u", "v").alias("x"),
            F.greatest("u", "v").alias("y"),
            (F.col("u") < F.col("v")).cast("int").alias("f"),
            (F.col("u") > F.col("v")).cast("int").alias("r"),
        )
        .groupBy("x", "y")
        .agg(F.max("f").alias("fwd"), F.max("r").alias("rev"))
        .persist()
    )
    # NOTE on style: everything below builds the plan with SQL expression
    # strings (selectExpr / F.expr) rather than Column algebra. Semantically
    # identical, but each string is ONE py4j round-trip parsed JVM-side —
    # the Column form of this function made ~7,000 py4j socket calls and
    # cost ~1.1 s of pure driver-side plan construction per invocation
    # (cProfile: 0.74 s in socket recv), the bulk of the query's round-7
    # 28x stage-floor reading.
    #
    # Per-vertex metrics FIRST: degree/out/in derive from the pair flags
    # (x→y exists iff fwd, y→x iff rev), and the same table both feeds the
    # closed-form triplet counts and supplies the degree used to orient the
    # triangle enumeration — one aggregation where round-7 ran three.
    dv = (
        pairs.selectExpr("x AS id", "fwd AS o", "rev AS i")
        .unionByName(pairs.selectExpr("y AS id", "rev AS o", "fwd AS i"))
        .groupBy("id")
        .agg(
            F.expr("count(1) AS degree"),
            F.expr("sum(o) AS outd"),
            F.expr("sum(i) AS ind"),
        )
        .persist()
    )

    # Flag-carrying degree-ordered triangle listing (TriangleEnumerator
    # shape): orient each pair low-(deg,id) → high-(deg,id), build wedges at
    # the apex, close against the third edge. The fwd/rev flags (always
    # value-canonical: fwd = least→greatest edge exists) TRAVEL WITH the
    # edges, so no post-hoc flag joins are needed — round 7 re-joined the
    # pair table three times here, three avoidable exchanges.
    e = (
        pairs.join(dv.selectExpr("id AS x", "degree AS dx"), "x")
        .join(dv.selectExpr("id AS y", "degree AS dy"), "y")
        .selectExpr(
            "IF(dx < dy OR (dx = dy AND x < y), x, y) AS lo",
            "IF(dx < dy OR (dx = dy AND x < y), y, x) AS hi",
            "fwd", "rev",
        )
    )
    e1 = e.selectExpr("lo AS apex", "hi AS x", "fwd AS f1", "rev AS r1")
    e2 = e.selectExpr("lo AS apex", "hi AS y", "fwd AS f2", "rev AS r2")
    wedges = e1.join(e2, "apex").filter(F.expr("x < y"))
    closer = e.selectExpr(
        "least(lo, hi) AS x2", "greatest(lo, hi) AS y2",
        "fwd AS f3", "rev AS r3",
    )  # pairs are distinct by construction: no dedup needed
    tf = wedges.join(closer, F.expr("x = x2 AND y = y2")).selectExpr(
        "least(apex, x, y) AS a",
        "CASE WHEN x > least(apex, x, y) AND x < greatest(apex, x, y) THEN x"
        "     WHEN y > least(apex, x, y) AND y < greatest(apex, x, y) THEN y"
        "     ELSE apex END AS b",
        "greatest(apex, x, y) AS c",
        "least(apex, x) AS e1a", "greatest(apex, x) AS e1b", "f1", "r1",
        "least(apex, y) AS e2a", "greatest(apex, y) AS e2b", "f2", "r2",
        "x AS e3a", "y AS e3b", "f3", "r3",
    )
    # Reassign each carried edge's flags to its role (ab/bc/ac) in the
    # canonical a<b<c triple: exactly one of the three edges matches each
    # vertex pair, and the flags stay valid because both the pair keys and
    # the flags are value-canonical.
    flag_sel = [
        f"CASE WHEN e1a = {u} AND e1b = {v} THEN {fl}1"
        f" WHEN e2a = {u} AND e2b = {v} THEN {fl}2 ELSE {fl}3 END"
        f" AS {fl}_{nm}"
        for (u, v, nm) in (("a", "b", "ab"), ("b", "c", "bc"), ("a", "c", "ac"))
        for fl in ("f", "r")
    ]
    tfx = tf.selectExpr(*flag_sel)
    # Batagelj–Mrvar 3-edge triangle types from the six pair direction
    # flags; for nbi=1 the third vertex either sources both (120d), sinks
    # both (120u) or mixes (120c), relative to the one mutual pair.
    typ_case = """
    CASE f_ab*r_ab + f_bc*r_bc + f_ac*r_ac
      WHEN 3 THEN '300'
      WHEN 2 THEN '210'
      WHEN 1 THEN CASE
        WHEN f_ab*r_ab = 1 THEN
          CASE WHEN r_ac = 1 AND r_bc = 1 THEN '120d'
               WHEN f_ac = 1 AND f_bc = 1 THEN '120u'
               ELSE '120c' END
        WHEN f_bc*r_bc = 1 THEN
          CASE WHEN f_ab = 1 AND f_ac = 1 THEN '120d'
               WHEN r_ab = 1 AND r_ac = 1 THEN '120u'
               ELSE '120c' END
        ELSE
          CASE WHEN r_ab = 1 AND f_bc = 1 THEN '120d'
               WHEN f_ab = 1 AND r_bc = 1 THEN '120u'
               ELSE '120c' END
        END
      ELSE CASE WHEN f_ab*f_bc*r_ac + r_ab*r_bc*f_ac > 0
                THEN '030c' ELSE '030t' END
    END
    """
    # Conditional sums, not pivot: one aggregate, and a triangle-free graph
    # still yields exactly one (all-zero) row.
    tcnt = tfx.selectExpr(f"{typ_case} AS typ").agg(
        *[
            F.expr(f"coalesce(sum(if(typ = '{t}', 1, 0)), 0) AS t{t}")
            for t in ("030t", "030c", "120d", "120u", "120c", "210", "300")
        ]
    )

    # Raw center-based triplet counts (VertexDegreesHelper) from the shared
    # per-vertex metric table.
    vm = dv.selectExpr(
        "degree",
        "outd",
        "ind",
        "degree - ind AS us",
        "degree - outd AS ut",
        "ind + outd - degree AS bi",
    )
    raw = vm.agg(
        F.expr("count(1) AS vc"),
        F.expr("CAST(sum(us + ut) / 2 AS BIGINT) AS uec"),
        F.expr("CAST(sum(bi) / 2 AS BIGINT) AS bec"),
        F.expr("sum(CAST(us * (us - 1) / 2 AS BIGINT)) AS r021d"),
        F.expr("sum(CAST(ut * (ut - 1) / 2 AS BIGINT)) AS r021u"),
        F.expr("sum(us * ut) AS r021c"),
        F.expr("sum(ut * bi) AS r111d"),
        F.expr("sum(us * bi) AS r111u"),
        F.expr("sum(CAST(bi * (bi - 1) / 2 AS BIGINT)) AS r201"),
    )
    j = raw.crossJoin(tcnt)
    # Open-triplet corrections + 012/102/003 closure (getResult:102-195),
    # LAYERED so each level references the previous level's columns BY NAME.
    # Inlining t012/t102/t003 as Column expressions duplicates the whole
    # t111*/t021*/t201 subtrees inside every reference — an exponentially
    # nested expression tree that cost ~1 s of driver-side plan
    # construction/analysis per call (the bulk of this query's round-7
    # 28x stage-floor reading); three named layers make it milliseconds.
    lvl1 = j.selectExpr(
        "*",
        "r201 - 3 * t300 - t210 AS t201",
        "r111d - t210 - t120c - 2 * t120d AS t111d",
        "r111u - t210 - t120c - 2 * t120u AS t111u",
        "r021c - t120c - 3 * t030c - t030t AS t021c",
        "r021u - t120u - t030t AS t021u",
        "r021d - t120d - t030t AS t021d",
    )
    lvl2 = lvl1.selectExpr(
        "*",
        "bec * (vc - 2) - t111d - t111u - 2 * t201"
        " - t120d - t120u - t120c - 2 * t210 - 3 * t300 AS t102",
        "uec * (vc - 2) - 2 * t021d - 2 * t021u - 2 * t021c"
        " - t111d - t111u - 3 * t030t - 3 * t030c"
        " - 2 * (t120d + t120u + t120c) - t210 AS t012",
    )
    lvl3 = lvl2.selectExpr(
        "*",
        "CAST(vc * (vc - 1) * (vc - 2) / 6 AS BIGINT)"
        " - t012 - t102 - t021d - t021u - t021c - t111d - t111u"
        " - t030t - t030c - t201 - t120d - t120u - t120c"
        " - t210 - t300 AS t003",
    )
    return lvl3.selectExpr(
        *[
            f"CAST({t} AS BIGINT) AS {t}"
            for t in (
                "t003", "t012", "t102", "t021d", "t021u", "t021c", "t111d",
                "t111u", "t030t", "t030c", "t201", "t120d", "t120u", "t120c",
                "t210", "t300",
            )
        ]
    )


def clustering_coefficients_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, degree, tri_edges, coefficient) per vertex of a DIRECTED graph:
    ``tri_edges`` counts the directed edges among the vertex's neighbors and
    ``coefficient = tri_edges / (degree·(degree−1))`` with degree = distinct
    neighbors (0.0 when degree < 2, matching the undirected variant here;
    the reference emits NaN).

    Gelly: clustering/directed/LocalClusteringCoefficient.java — same
    derivation: each triangle contributes to each member vertex 1 or 2
    depending on whether the edge between the OTHER two members is
    unidirectional or mutual (SplitTriangles:146-175 bitmask pairs), so the
    cost is the O(m^{3/2}) degree-ordered triangle join, never a per-hub
    neighbor-pair explosion.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    pairs = (
        e.select(
            F.least("u", "v").alias("x"),
            F.greatest("u", "v").alias("y"),
            (F.col("u") < F.col("v")).cast("int").alias("f"),
            (F.col("u") > F.col("v")).cast("int").alias("r"),
        )
        .groupBy("x", "y")
        .agg(F.max("f").alias("fwd"), F.max("r").alias("rev"))
        .localCheckpoint(eager=True)  # same multi-consumer pinning as the census
    )
    und = pairs.select(F.col("x").alias("a"), F.col("y").alias("b"))
    tri = triangle_listing(und)

    def flags(xc, yc, p):
        t = pairs.select(
            F.col("x").alias(f"__x{p}"),
            F.col("y").alias(f"__y{p}"),
            (F.col("fwd") + F.col("rev")).alias(f"w_{p}"),
        )
        return t, (F.col(xc) == F.col(f"__x{p}")) & (F.col(yc) == F.col(f"__y{p}"))

    t_ab, c_ab = flags("a", "b", "ab")
    t_bc, c_bc = flags("b", "c", "bc")
    t_ac, c_ac = flags("a", "c", "ac")
    tf = tri.join(t_ab, c_ab).join(t_bc, c_bc).join(t_ac, c_ac)
    contrib = (
        tf.select(F.col("a").alias("id"), F.col("w_bc").alias("w"))
        .unionByName(tf.select(F.col("b").alias("id"), F.col("w_ac").alias("w")))
        .unionByName(tf.select(F.col("c").alias("id"), F.col("w_ab").alias("w")))
        .groupBy("id")
        .agg(F.sum("w").alias("tri_edges"))
    )
    deg = (
        pairs.select(F.col("x").alias("id"))
        .unionByName(pairs.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(contrib, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("tri_edges", F.lit(0)).alias("tri_edges"),
        )
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                F.col("tri_edges")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def community_detection(
    edges: DataFrame,
    iterations: int,
    delta: float = 0.5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Score-attenuated label propagation (Leung et al. hop attenuation), the
    weighted community-detection variant of :func:`label_propagation`.
    Returns (id, label, score).

    Gelly: library/CommunityDetection.java:94-173 — vertices start with
    their own id as label and score 1.0; messages carry ``(label,
    score·edge_weight)`` (LabelMessenger:98); the receiver adopts the label
    with the highest weighted-score SUM, its new score is the highest single
    weighted score received for that label (labelsWithHighestScore:139), and
    hop attenuation ``delta / superstep`` applies only when the label
    actually changes (VertexLabelUpdater:166-168). Equal-sum ties go to the
    smallest label — the reference iterates a TreeMap with a strict ``>``
    (line 150-158), so this is exact parity, not a divergence.

    Superstep cost: one shuffle of (neighbor, label, weighted score)
    messages keyed on the receiving vertex + a two-phase (id, label)
    aggregation; winner + rescore are per-vertex WindowGroupLimit and one
    |V|-sized join against the previous labels. Same scale shape as
    label_propagation — holds at billions of edges.

    Engine-exactness note: with integer weights and dyadic ``delta``, every
    score stays an exact double through superstep 2; superstep 3 introduces
    ``delta/3`` (non-dyadic), after which weighted-score sums become
    order-sensitive in the last ulp — strict cross-engine comparison is
    guaranteed only for ``iterations ≤ 2`` (the oracled query's setting).
    """
    symw = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
        )
        .unionByName(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"), F.col(weight).alias("w")
            )
        )
        .distinct()
    )
    state0 = (
        symw.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"), F.lit(1.0).alias("score"))
    )
    w_win = Window.partitionBy("id").orderBy(F.col("tot").desc(), F.col("label").asc())

    def step(state: DataFrame, i: int) -> DataFrame:
        prev = state.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        cand = (
            symw.join(state, symw["u"] == state["id"])
            .select(
                F.col("v").alias("id"),
                "label",
                (F.col("score") * F.col("w")).alias("ws"),
            )
            .groupBy("id", "label")
            .agg(F.sum("ws").alias("tot"), F.max("ws").alias("mx"))
        )
        win = cand.withColumn("rn", F.row_number().over(w_win)).filter(
            F.col("rn") == 1
        )
        return win.join(prev, win["id"] == prev["pid"]).select(
            "id",
            "label",
            F.when(
                F.col("label") != F.col("plabel"),
                F.col("mx") - F.lit(delta) / F.lit(float(i + 1)),
            )
            .otherwise(F.col("mx"))
            .alias("score"),
        )

    return iterate(state0, step, max_iterations=iterations)


def single_source_shortest_paths(
    edges: DataFrame,
    source_id: int,
    steps: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Bellman–Ford distance propagation from ``source_id`` for a fixed number
    of supersteps; returns (id, distance) for vertices reached so far.

    Gelly: SingleSourceShortestPaths.java — scatter-gather where each vertex
    relaxes ``min(d(v), min_u d(u)+w(u,v))`` per superstep. ``steps`` bounds
    the hop count exactly like Gelly's ``maxIterations``; a run to the graph
    diameter yields exact distances. Each superstep is one shuffle of
    candidate distances on the destination key, merged by min — work shrinks
    to the improving frontier under iterate's lineage truncation.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    )
    nodes = e.select(F.col("u").alias("id")).unionByName(
        e.select(F.col("v").alias("id"))
    ).distinct()
    dist0 = nodes.select(
        "id",
        F.when(F.col("id") == source_id, F.lit(0)).alias("distance"),
    )

    def step(dist: DataFrame, _i: int) -> DataFrame:
        cand = (
            e.join(dist.filter(F.col("distance").isNotNull()), e["u"] == dist["id"])
            .select(F.col("v").alias("id"), (F.col("distance") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        return (
            dist.join(cand, "id", "left")
            .select("id", F.least("distance", "nd").alias("distance"))
        )

    out = iterate(dist0, step, max_iterations=steps)
    return out.filter(F.col("distance").isNotNull())


def label_propagation(und: DataFrame, iterations: int) -> DataFrame:
    """Synchronous label propagation for community detection: every superstep
    each vertex adopts the most frequent label among its neighbors, ties
    broken toward the smallest label. Returns (id, label).

    Gelly: LabelPropagation.java (min-label tie break, fixed iteration
    count). Deterministic by construction — integer labels, count-desc /
    label-asc ordering — so results are engine-exact. Superstep cost: one
    shuffle of (neighbor, label) messages + a two-phase count; the argmax is
    a per-vertex WindowGroupLimit, not a global sort.
    """
    sym = _symmetrize(und)
    labels0 = sym.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    w = Window.partitionBy("id").orderBy(F.col("cnt").desc(), F.col("label").asc())

    def step(labels: DataFrame, _i: int) -> DataFrame:
        counts = (
            sym.join(labels, sym["u"] == labels["id"])
            .select(F.col("v").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "label")
        )

    return iterate(labels0, step, max_iterations=iterations)


def hits(
    edges: DataFrame,
    iterations: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Hubs-and-authorities: per superstep authority(v) = Σ hub(u) over in-
    edges then L2-normalize, hub(u) = Σ authority(v) over out-edges then
    L2-normalize. Returns (id, hub, authority).

    Gelly: linkanalysis/HITS.java (same mutual-recurrence with score
    normalization per iteration). The L2 norm is a scalar aggregate
    broadcast back into the next projection — no driver-side data movement
    beyond one double per superstep.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct().persist()
    nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    state0 = nodes.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        # The raw-score frames are consumed twice (norm scalar + projection):
        # pin them so each superstep's joins run once, not per downstream use.
        auth = (
            e.join(state, e["u"] == state["id"])
            .select(F.col("v").alias("id"), F.col("hub"))
            .groupBy("id")
            .agg(F.sum("hub").alias("a_raw"))
            .localCheckpoint(eager=True)
        )
        a_norm = auth.agg(F.sqrt(F.sum(F.col("a_raw") * F.col("a_raw")))).first()[0]
        auth = auth.select("id", (F.col("a_raw") / F.lit(a_norm)).alias("authority"))
        hub = (
            e.join(auth, e["v"] == auth["id"])
            .select(F.col("u").alias("id"), F.col("authority"))
            .groupBy("id")
            .agg(F.sum("authority").alias("h_raw"))
            .localCheckpoint(eager=True)
        )
        h_norm = hub.agg(F.sqrt(F.sum(F.col("h_raw") * F.col("h_raw")))).first()[0]
        hub = hub.select("id", (F.col("h_raw") / F.lit(h_norm)).alias("hub"))
        return (
            nodes.join(hub, "id", "left")
            .join(auth, "id", "left")
            .select(
                "id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
        )

    out = iterate(state0, step, max_iterations=iterations)
    e.unpersist()
    nodes.unpersist()
    return out


def summarize_graph(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Collapse a vertex-labeled directed graph into its label-level
    multigraph: one row per (src_label, dst_label) with the member edge
    count plus the distinct vertex count on each side.

    Gelly: library/Summarization.java (vertices grouped by value, edges
    between groups with counts). Two broadcast-or-shuffle joins on the
    vertex id (labels is |V|-sized — co-partitioned joins at scale) and one
    two-phase count aggregation on the label pair.
    """
    lsrc = labels.select(F.col("id").alias("__s"), F.col("label").alias("src_label"))
    ldst = labels.select(F.col("id").alias("__d"), F.col("label").alias("dst_label"))
    e = edges.join(lsrc, edges[src] == lsrc["__s"]).join(
        ldst, edges[dst] == ldst["__d"]
    )
    return e.groupBy("src_label", "dst_label").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct(src).alias("n_src_vertices"),
        F.countDistinct(dst).alias("n_dst_vertices"),
    )


def _common_neighbors(und: DataFrame, max_neighbor_degree: int | None) -> DataFrame:
    """(x, y, z) — pairs x<y sharing neighbor z, the wedge join both
    similarity scores build on. Optionally drops hub apexes with degree >
    ``max_neighbor_degree`` (fan-out is deg(z)²/2 per apex)."""
    sym = _symmetrize(und)
    if max_neighbor_degree is not None:
        deg = sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") <= max_neighbor_degree).select("id")
        sym = sym.join(keep, sym["u"] == keep["id"]).drop("id")
    n1 = sym.select(F.col("u").alias("z"), F.col("v").alias("x"))
    n2 = sym.select(F.col("u").alias("z"), F.col("v").alias("y"))
    return n1.join(n2, "z").filter(F.col("x") < F.col("y"))


def jaccard_index(und: DataFrame, max_neighbor_degree: int | None = None) -> DataFrame:
    """(x, y, shared, jaccard) for all vertex pairs with ≥1 common neighbor;
    jaccard = |N(x)∩N(y)| / |N(x)∪N(y)|.

    Gelly: similarity/JaccardIndex.java. Wedge join on the shared-neighbor
    key — never an all-pairs product; see module docstring for the hub cap.
    """
    deg = (
        _symmetrize(und)
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    shared = (
        _common_neighbors(und, max_neighbor_degree)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(deg.select(F.col("id").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("id").alias("y"), F.col("d").alias("dy")), "y")
        .select(
            "x",
            "y",
            "shared",
            (
                F.col("shared") / (F.col("dx") + F.col("dy") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def adamic_adar(und: DataFrame, max_neighbor_degree: int | None = None) -> DataFrame:
    """(x, y, score) with score = Σ_{z ∈ N(x)∩N(y)} 1/ln(deg(z)) — common
    neighbors weighted inversely by their (log) popularity.

    Gelly: similarity/AdamicAdar.java. Same wedge-join shape as Jaccard; the
    per-apex weight 1/ln(d(z)) is attached before the pair aggregation so
    the score is a plain sum.
    """
    deg = (
        _symmetrize(und)
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = _common_neighbors(und, max_neighbor_degree)
    return (
        wedges.join(deg.select(F.col("id").alias("z"), F.col("d")), "z")
        .filter(F.col("d") > 1)
        .select("x", "y", (F.lit(1.0) / F.log(F.col("d"))).alias("w"))
        .groupBy("x", "y")
        .agg(F.sum("w").alias("score"))
    )
