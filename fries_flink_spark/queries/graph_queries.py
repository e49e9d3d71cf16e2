"""Graph library queries (Gelly parity — SURVEY §2 Gelly row).

Reference: flink-libraries/flink-gelly/.../graph/library/ — degrees
(metric/), TriangleListing + clustering coefficients (clustering/
undirected/), SingleSourceShortestPaths.java, LabelPropagation.java,
linkanalysis/HITS.java, similarity/{JaccardIndex,AdamicAdar}.java.
ConnectedComponents / PageRank are covered by ``dedup_clusters`` /
``iter_pagerank``.

The graph is derived deterministically from ``orders``: directed edges
``src = o_custkey % 60 → dst = o_orderkey % 60`` (distinct, no self-loops),
sparsified to ~20% density by the hash predicate ``(src*13 + dst*17) % 5 = 0``
so degrees/communities are non-trivial at every scale factor, with integer
weight ``(src*3 + dst*7) % 5 + 1``; the undirected graph is the canonicalized
``(least, greatest)`` pair set. Iterative algorithms
(SSSP / label propagation / HITS) run a fixed number of supersteps and the
oracle unrolls the same supersteps as chained CTEs, so the comparison is
exact (integer algorithms) or 6-decimal rounded on both engines (HITS).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..graph.algorithms import (
    adamic_adar,
    clustering_coefficients,
    hits,
    jaccard_index,
    label_propagation,
    single_source_shortest_paths,
    triangle_listing,
    vertex_degrees,
)
from ..registry import micro, query

_MOD = 60

# Shared SQL prologue: the deterministic graph.
_G = f"""
e AS (
  SELECT DISTINCT o_custkey % {_MOD} AS src, o_orderkey % {_MOD} AS dst,
         ((o_custkey % {_MOD}) * 3 + (o_orderkey % {_MOD}) * 7) % 5 + 1 AS weight
  FROM orders WHERE o_custkey % {_MOD} <> o_orderkey % {_MOD}
    AND ((o_custkey % {_MOD}) * 13 + (o_orderkey % {_MOD}) * 17) % 5 = 0),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
sym AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
nodes AS (SELECT DISTINCT u AS id FROM sym)
"""


def _edges(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            (F.col("o_custkey") % _MOD).alias("src"),
            (F.col("o_orderkey") % _MOD).alias("dst"),
        )
        .where(
            (F.col("src") != F.col("dst"))
            & ((F.col("src") * 13 + F.col("dst") * 17) % 5 == 0)
        )
        .distinct()
        .withColumn("weight", (F.col("src") * 3 + F.col("dst") * 7) % 5 + 1)
    )


def _und(spark, sf_dir):
    return (
        _edges(spark, sf_dir)
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )


@query(
    "graph_degrees",
    oracle=f"""
WITH {_G},
outd AS (SELECT src AS id, count(*) AS c FROM e GROUP BY src),
ind  AS (SELECT dst AS id, count(*) AS c FROM e GROUP BY dst),
ids  AS (SELECT id FROM outd UNION SELECT id FROM ind)
SELECT ids.id,
       coalesce(outd.c, 0) AS out_degree,
       coalesce(ind.c, 0) AS in_degree,
       coalesce(outd.c, 0) + coalesce(ind.c, 0) AS degree
FROM ids LEFT JOIN outd USING (id) LEFT JOIN ind USING (id)
ORDER BY ids.id
""",
)
def graph_degrees(spark, sf_dir):
    """Directed in/out/total vertex degrees (Gelly metric/directed
    VertexMetrics)."""
    return vertex_degrees(_edges(spark, sf_dir)).orderBy("id")


@query(
    "graph_triangles",
    oracle=f"""
WITH {_G}
SELECT e1.a AS a, e1.b AS b, e2.b AS c
FROM und e1
JOIN und e2 ON e2.a = e1.b
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
ORDER BY a, b, c
""",
)
def graph_triangles(spark, sf_dir):
    """Triangle listing via degree-ordered wedge enumeration
    (TriangleEnumerator.java); each triangle exactly once, (a<b<c)."""
    return triangle_listing(_und(spark, sf_dir)).orderBy("a", "b", "c")


@query(
    "graph_clustering",
    oracle=f"""
WITH {_G},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1 JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
pv AS (
  SELECT id, count(*) AS t FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY id),
lcc AS (
  SELECT deg.id, deg.d, coalesce(pv.t, 0) AS t,
         CASE WHEN deg.d >= 2 THEN 2.0 * coalesce(pv.t, 0) / (deg.d * (deg.d - 1))
              ELSE 0.0 END AS coeff
  FROM deg LEFT JOIN pv USING (id))
SELECT CAST(sum(t) // 3 AS BIGINT) AS triangle_count,
       CAST(floor((sum(t) / sum(d * (d - 1) / 2.0)) * 1e6 + 0.5) AS BIGINT)
         AS global_coefficient,
       CAST(floor(avg(coeff) * 1e6 + 0.5) AS BIGINT) AS average_coefficient
FROM lcc
""",
)
def graph_clustering(spark, sf_dir):
    """Global + average clustering coefficient and triangle count
    (clustering/undirected/{Global,Average}ClusteringCoefficient.java)."""
    return clustering_coefficients(_und(spark, sf_dir)).select(
        "triangle_count",
        micro(F.col("global_coefficient")).alias("global_coefficient"),
        micro(F.col("average_coefficient")).alias("average_coefficient"),
    )


_SSSP_STEPS = 6
_SSSP_SRC = 1

_SSSP_STEP = """
d{i} AS (
  SELECT d.id, least(d.dist, m.nd) AS dist
  FROM d{p} d LEFT JOIN (
    SELECT e.dst AS id, min(d2.dist + e.weight) AS nd
    FROM e JOIN d{p} d2 ON d2.id = e.src AND d2.dist IS NOT NULL
    GROUP BY e.dst) m ON m.id = d.id)"""


def _sssp_oracle() -> str:
    steps = ",".join(_SSSP_STEP.format(i=i, p=i - 1) for i in range(1, _SSSP_STEPS + 1))
    return f"""
WITH {_G},
d0 AS (SELECT id, CASE WHEN id = {_SSSP_SRC} THEN 0 END AS dist FROM nodes),
{steps}
SELECT id, dist AS distance FROM d{_SSSP_STEPS} WHERE dist IS NOT NULL ORDER BY id
"""


@query("graph_sssp", oracle=_sssp_oracle())
def graph_sssp(spark, sf_dir):
    """Single-source shortest paths, {n} Bellman–Ford supersteps from vertex
    {s} (SingleSourceShortestPaths.java); integer weights so the comparison
    is exact.""".format(n=_SSSP_STEPS, s=_SSSP_SRC)
    out = single_source_shortest_paths(
        _edges(spark, sf_dir), source_id=_SSSP_SRC, steps=_SSSP_STEPS
    )
    return out.orderBy("id")


_LP_ITERS = 3

_LP_STEP = """
l{i} AS (
  SELECT id, label FROM (
    SELECT s.v AS id, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY s.v
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM sym s JOIN l{p} l ON l.id = s.u
    GROUP BY s.v, l.label) t
  WHERE rn = 1)"""


def _lp_oracle() -> str:
    steps = ",".join(_LP_STEP.format(i=i, p=i - 1) for i in range(1, _LP_ITERS + 1))
    return f"""
WITH {_G},
l0 AS (SELECT id, id AS label FROM nodes),
{steps}
SELECT id, label FROM l{_LP_ITERS} ORDER BY id
"""


@query("graph_label_prop", oracle=_lp_oracle())
def graph_label_prop(spark, sf_dir):
    """Synchronous label propagation, 3 supersteps, min-label tie break
    (LabelPropagation.java) — integer labels, engine-exact."""
    return label_propagation(_und(spark, sf_dir), iterations=_LP_ITERS).orderBy("id")


_HITS_ITERS = 3

# MATERIALIZED: DuckDB inlines CTEs by default, so without it every norm
# scalar subquery re-expands the whole upstream superstep chain
# (exponential re-evaluation — observed 156 s vs <1 s materialized).
_HITS_STEP = """
ar{i} AS MATERIALIZED (
  SELECT e.dst AS id, sum(s{p}.hub) AS a_raw
  FROM e JOIN s{p} ON s{p}.id = e.src GROUP BY e.dst),
a{i} AS MATERIALIZED (
  SELECT id, a_raw / (SELECT sqrt(sum(a_raw * a_raw)) FROM ar{i}) AS authority
  FROM ar{i}),
hr{i} AS MATERIALIZED (
  SELECT e.src AS id, sum(a{i}.authority) AS h_raw
  FROM e JOIN a{i} ON a{i}.id = e.dst GROUP BY e.src),
h{i} AS MATERIALIZED (
  SELECT id, h_raw / (SELECT sqrt(sum(h_raw * h_raw)) FROM hr{i}) AS hub
  FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT n.id, coalesce(h{i}.hub, 0.0) AS hub,
         coalesce(a{i}.authority, 0.0) AS authority
  FROM nodes n LEFT JOIN h{i} ON h{i}.id = n.id
  LEFT JOIN a{i} ON a{i}.id = n.id)"""


def _hits_oracle() -> str:
    steps = ",".join(_HITS_STEP.format(i=i, p=i - 1) for i in range(1, _HITS_ITERS + 1))
    return f"""
WITH {_G},
s0 AS (SELECT id, 1.0 AS hub, 1.0 AS authority FROM nodes),
{steps}
SELECT id, CAST(floor(hub * 1e6 + 0.5) AS BIGINT) AS hub,
       CAST(floor(authority * 1e6 + 0.5) AS BIGINT) AS authority
FROM s{_HITS_ITERS} ORDER BY id
"""


@query("graph_hits", oracle=_hits_oracle())
def graph_hits(spark, sf_dir):
    """HITS hubs/authorities, 3 L2-normalized supersteps
    (linkanalysis/HITS.java); 6-decimal rounding on both engines."""
    out = hits(_edges(spark, sf_dir), iterations=_HITS_ITERS)
    return out.select(
        "id",
        micro(F.col("hub")).alias("hub"),
        micro(F.col("authority")).alias("authority"),
    ).orderBy("id")


@query(
    "graph_jaccard",
    oracle=f"""
WITH {_G},
deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
shared AS (
  SELECT n1.v AS x, n2.v AS y, count(*) AS shared
  FROM sym n1 JOIN sym n2 ON n1.u = n2.u AND n1.v < n2.v
  GROUP BY n1.v, n2.v)
SELECT s.x, s.y, s.shared,
       s.shared * 1.0 / (dx.d + dy.d - s.shared) AS jaccard
FROM shared s JOIN deg dx ON dx.id = s.x JOIN deg dy ON dy.id = s.y
ORDER BY s.x, s.y
""",
)
def graph_jaccard(spark, sf_dir):
    """Jaccard neighborhood similarity for pairs sharing ≥1 neighbor
    (similarity/JaccardIndex.java) — wedge join, never all-pairs. Exact:
    integer operands, one double division."""
    return jaccard_index(_und(spark, sf_dir)).orderBy("x", "y")


@query(
    "graph_adamic_adar",
    oracle=f"""
WITH {_G},
deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
wedge AS (
  SELECT n1.u AS z, n1.v AS x, n2.v AS y
  FROM sym n1 JOIN sym n2 ON n1.u = n2.u AND n1.v < n2.v)
SELECT w.x, w.y,
       CAST(floor(sum(1.0 / ln(deg.d)) * 1e6 + 0.5) AS BIGINT) AS score
FROM wedge w JOIN deg ON deg.id = w.z
WHERE deg.d > 1
GROUP BY w.x, w.y
ORDER BY w.x, w.y
""",
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic–Adar link-prediction score (similarity/AdamicAdar.java);
    6-decimal rounding on both engines (ln + sum are float)."""
    out = adamic_adar(_und(spark, sf_dir))
    return out.select(
        "x", "y", micro(F.col("score")).alias("score")
    ).orderBy("x", "y")


def _summarize_oracle() -> str:
    steps = ",".join(_LP_STEP.format(i=i, p=i - 1) for i in range(1, _LP_ITERS + 1))
    return f"""
WITH {_G},
l0 AS (SELECT id, id AS label FROM nodes),
{steps}
SELECT ls.label AS src_label, ld.label AS dst_label,
       count(*) AS n_edges,
       count(DISTINCT e.src) AS n_src_vertices,
       count(DISTINCT e.dst) AS n_dst_vertices
FROM e
JOIN l{_LP_ITERS} ls ON ls.id = e.src
JOIN l{_LP_ITERS} ld ON ld.id = e.dst
GROUP BY ls.label, ld.label
ORDER BY src_label, dst_label
"""


@query("graph_summarize", oracle=_summarize_oracle())
def graph_summarize(spark, sf_dir):
    """Graph summarization (Summarization.java): collapse the directed graph
    into its community-level multigraph, communities from 3-superstep label
    propagation — integer-exact end to end."""
    from ..graph.algorithms import summarize_graph

    edges = _edges(spark, sf_dir)
    labels = label_propagation(_und(spark, sf_dir), iterations=_LP_ITERS)
    return summarize_graph(edges, labels).orderBy("src_label", "dst_label")


@query(
    "graph_triadic_census",
    oracle=f"""
WITH {_G},
deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
s AS (SELECT count(*) AS n, CAST(sum(d) // 2 AS BIGINT) AS m,
             sum(CAST((d * (d - 1)) // 2 AS BIGINT)) AS wedges
      FROM deg),
tri AS (SELECT count(*) AS t3 FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST((n * (n-1) * (n-2)) // 6
            - (m * (n-2) - 2 * wedges + 3 * t3)
            - (wedges - 3 * t3) - t3 AS BIGINT) AS t0,
       CAST(m * (n-2) - 2 * wedges + 3 * t3 AS BIGINT) AS t1,
       CAST(wedges - 3 * t3 AS BIGINT) AS t2,
       CAST(t3 AS BIGINT) AS t3
FROM s CROSS JOIN tri
""",
)
def graph_triadic_census(spark, sf_dir):
    """Undirected triadic census (TriadicCensus.java): triple counts by edge
    count, closed-form from degrees + the triangle count — integer-exact."""
    from ..graph.algorithms import triadic_census

    return triadic_census(_und(spark, sf_dir))


_CD_ITERS = 2  # scores stay dyadic-exact through superstep 2 (delta/3 is not)
_CD_DELTA = 0.5

_CD_STEP = """
c{i} AS (
  SELECT t.id, t.label,
         CASE WHEN t.label <> p.label THEN t.mx - 0.5 / {i} ELSE t.mx END AS score
  FROM (
    SELECT m.v AS id, c.label, sum(c.score * m.w) AS tot,
           max(c.score * m.w) AS mx,
           row_number() OVER (PARTITION BY m.v
                              ORDER BY sum(c.score * m.w) DESC, c.label ASC) AS rn
    FROM symw m JOIN c{p} c ON c.id = m.u
    GROUP BY m.v, c.label) t
  JOIN c{p} p ON p.id = t.id
  WHERE t.rn = 1)"""


def _cd_oracle() -> str:
    steps = ",".join(_CD_STEP.format(i=i, p=i - 1) for i in range(1, _CD_ITERS + 1))
    return f"""
WITH {_G},
symw AS (SELECT src AS u, dst AS v, weight AS w FROM e
         UNION SELECT dst AS u, src AS v, weight AS w FROM e),
c0 AS (SELECT DISTINCT u AS id, u AS label, 1.0 AS score FROM symw),
{steps}
SELECT id, label, score FROM c{_CD_ITERS} ORDER BY id
"""


@query("graph_community", oracle=_cd_oracle())
def graph_community(spark, sf_dir):
    """Community detection with hop attenuation (CommunityDetection.java:94-173),
    2 supersteps, delta=0.5 — weighted-score messages, attenuation delta/superstep
    on label change only, TreeMap min-label tie break; dyadic scores and integer
    weights keep every double exact at <=2 supersteps, so the comparison is strict."""
    from ..graph.algorithms import community_detection

    out = community_detection(_edges(spark, sf_dir), iterations=_CD_ITERS, delta=_CD_DELTA)
    return out.orderBy("id")


@query(
    "graph_triadic_census_directed",
    oracle=f"""
WITH {_G},
prs AS (
  SELECT least(src, dst) AS x, greatest(src, dst) AS y,
         max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
         max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS rev
  FROM e GROUP BY 1, 2),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tf AS (
  SELECT pab.fwd AS f_ab, pab.rev AS r_ab, pbc.fwd AS f_bc, pbc.rev AS r_bc,
         pac.fwd AS f_ac, pac.rev AS r_ac,
         pab.fwd * pab.rev + pbc.fwd * pbc.rev + pac.fwd * pac.rev AS nbi
  FROM tri t
  JOIN prs pab ON pab.x = t.a AND pab.y = t.b
  JOIN prs pbc ON pbc.x = t.b AND pbc.y = t.c
  JOIN prs pac ON pac.x = t.a AND pac.y = t.c),
tclass AS (
  SELECT CASE
    WHEN nbi = 3 THEN '300'
    WHEN nbi = 2 THEN '210'
    WHEN nbi = 1 THEN
      CASE WHEN f_ab * r_ab = 1 THEN
             CASE WHEN r_ac = 1 AND r_bc = 1 THEN '120d'
                  WHEN f_ac = 1 AND f_bc = 1 THEN '120u'
                  ELSE '120c' END
           WHEN f_bc * r_bc = 1 THEN
             CASE WHEN f_ab = 1 AND f_ac = 1 THEN '120d'
                  WHEN r_ab = 1 AND r_ac = 1 THEN '120u'
                  ELSE '120c' END
           ELSE
             CASE WHEN r_ab = 1 AND f_bc = 1 THEN '120d'
                  WHEN f_ab = 1 AND r_bc = 1 THEN '120u'
                  ELSE '120c' END END
    WHEN f_ab * f_bc * r_ac = 1 OR r_ab * r_bc * f_ac = 1 THEN '030c'
    ELSE '030t' END AS typ
  FROM tf),
tc AS (
  SELECT count(*) FILTER (typ = '030t') AS t030t,
         count(*) FILTER (typ = '030c') AS t030c,
         count(*) FILTER (typ = '120d') AS t120d,
         count(*) FILTER (typ = '120u') AS t120u,
         count(*) FILTER (typ = '120c') AS t120c,
         count(*) FILTER (typ = '210')  AS t210,
         count(*) FILTER (typ = '300')  AS t300
  FROM tclass),
deg AS (
  SELECT id, count(*) AS degree FROM (
    SELECT x AS id FROM prs UNION ALL SELECT y FROM prs) GROUP BY id),
outd AS (SELECT src AS id, count(*) AS od FROM e GROUP BY src),
ind  AS (SELECT dst AS id, count(*) AS idg FROM e GROUP BY dst),
vm AS (
  SELECT d.degree, coalesce(o.od, 0) AS od, coalesce(i.idg, 0) AS idg,
         d.degree - coalesce(i.idg, 0) AS us,
         d.degree - coalesce(o.od, 0) AS ut,
         coalesce(i.idg, 0) + coalesce(o.od, 0) - d.degree AS bi
  FROM deg d LEFT JOIN outd o ON o.id = d.id LEFT JOIN ind i ON i.id = d.id),
raw AS (
  SELECT count(*) AS vc,
         CAST(sum(us + ut) // 2 AS BIGINT) AS uec,
         CAST(sum(bi) // 2 AS BIGINT) AS bec,
         sum(CAST((us * (us - 1)) // 2 AS BIGINT)) AS r021d,
         sum(CAST((ut * (ut - 1)) // 2 AS BIGINT)) AS r021u,
         sum(us * ut) AS r021c,
         sum(ut * bi) AS r111d,
         sum(us * bi) AS r111u,
         sum(CAST((bi * (bi - 1)) // 2 AS BIGINT)) AS r201
  FROM vm),
fin AS (
  SELECT vc, uec, bec, t030t, t030c, t120d, t120u, t120c, t210, t300,
         r201 - 3 * t300 - t210 AS t201,
         r111d - t210 - t120c - 2 * t120d AS t111d,
         r111u - t210 - t120c - 2 * t120u AS t111u,
         r021c - t120c - 3 * t030c - t030t AS t021c,
         r021u - t120u - t030t AS t021u,
         r021d - t120d - t030t AS t021d
  FROM raw CROSS JOIN tc),
fin2 AS (
  SELECT *,
         bec * (vc - 2) - t111d - t111u - 2 * t201
           - t120d - t120u - t120c - 2 * t210 - 3 * t300 AS t102,
         uec * (vc - 2) - 2 * t021d - 2 * t021u - 2 * t021c - t111d - t111u
           - 3 * t030t - 3 * t030c - 2 * (t120d + t120u + t120c) - t210 AS t012
  FROM fin)
SELECT CAST((vc * (vc - 1) * (vc - 2)) // 6
         - t012 - t102 - t021d - t021u - t021c - t111d - t111u
         - t030t - t030c - t201 - t120d - t120u - t120c - t210 - t300
         AS BIGINT) AS t003,
       CAST(t012 AS BIGINT) AS t012, CAST(t102 AS BIGINT) AS t102,
       CAST(t021d AS BIGINT) AS t021d, CAST(t021u AS BIGINT) AS t021u,
       CAST(t021c AS BIGINT) AS t021c, CAST(t111d AS BIGINT) AS t111d,
       CAST(t111u AS BIGINT) AS t111u, CAST(t030t AS BIGINT) AS t030t,
       CAST(t030c AS BIGINT) AS t030c, CAST(t201 AS BIGINT) AS t201,
       CAST(t120d AS BIGINT) AS t120d, CAST(t120u AS BIGINT) AS t120u,
       CAST(t120c AS BIGINT) AS t120c, CAST(t210 AS BIGINT) AS t210,
       CAST(t300 AS BIGINT) AS t300
FROM fin2
""",
)
def graph_triadic_census_directed(spark, sf_dir):
    """Directed 16-type MAN triadic census
    (clustering/directed/TriadicCensus.java): degree-metric raw triplets +
    pair-flag triangle classification + closed-form closure — integer-exact,
    never an O(n^3) triple scan. Validated against an independent per-triple
    brute force in tests/test_graph.py."""
    from ..graph.algorithms import triadic_census_directed

    return triadic_census_directed(_edges(spark, sf_dir))


@query(
    "graph_clustering_directed",
    oracle=f"""
WITH {_G},
prs AS (
  SELECT least(src, dst) AS x, greatest(src, dst) AS y,
         max(CASE WHEN src < dst THEN 1 ELSE 0 END)
           + max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS w
  FROM e GROUP BY 1, 2),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
contrib AS (
  SELECT id, sum(w) AS tri_edges FROM (
    SELECT t.a AS id, p.w FROM tri t JOIN prs p ON p.x = t.b AND p.y = t.c
    UNION ALL
    SELECT t.b AS id, p.w FROM tri t JOIN prs p ON p.x = t.a AND p.y = t.c
    UNION ALL
    SELECT t.c AS id, p.w FROM tri t JOIN prs p ON p.x = t.a AND p.y = t.b)
  GROUP BY id),
deg AS (
  SELECT id, count(*) AS degree FROM (
    SELECT x AS id FROM prs UNION ALL SELECT y FROM prs) GROUP BY id)
SELECT d.id, d.degree, CAST(coalesce(c.tri_edges, 0) AS BIGINT) AS tri_edges,
       CASE WHEN d.degree >= 2
            THEN CAST((coalesce(c.tri_edges, 0) * 1000000)
                      // (d.degree * (d.degree - 1)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS coeff_micro
FROM deg d LEFT JOIN contrib c ON c.id = d.id
ORDER BY d.id
""",
)
def graph_clustering_directed(spark, sf_dir):
    """Directed local clustering coefficients
    (clustering/directed/LocalClusteringCoefficient.java): directed edges
    among neighbors / d(d-1), via the O(m^{3/2}) triangle join with mutual
    pairs weighted 2 (SplitTriangles bitmask semantics). The compared
    coefficient is integer micro-units (floor(x*1e6) via integer division) so
    the oracle is engine-version-proof — no float rounding on either side."""
    from ..graph.algorithms import clustering_coefficients_directed

    out = clustering_coefficients_directed(_edges(spark, sf_dir))
    return out.select(
        "id",
        "degree",
        "tri_edges",
        F.when(
            F.col("degree") >= 2,
            F.expr("(tri_edges * CAST(1000000 AS BIGINT)) div (degree * (degree - 1))"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("coeff_micro"),
    ).orderBy("id")
