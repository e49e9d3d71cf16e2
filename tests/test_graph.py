"""Graph library (Gelly parity) unit tests on hand-checkable graphs.

Reference semantics: flink-libraries/flink-gelly/.../graph/library/
{TriangleEnumerator,SingleSourceShortestPaths,LabelPropagation,HITS}.java,
clustering/undirected/LocalClusteringCoefficient.java,
similarity/{JaccardIndex,AdamicAdar}.java.
"""

from __future__ import annotations

import math

import pytest

from fries_flink_spark.graph import (
    adamic_adar,
    clustering_coefficients,
    hits,
    jaccard_index,
    label_propagation,
    local_clustering_coefficient,
    single_source_shortest_paths,
    triangle_listing,
    vertex_degrees,
)


def _und(spark, pairs):
    return spark.createDataFrame(pairs, "a int, b int")


def _dir(spark, triples):
    return spark.createDataFrame(triples, "src int, dst int, weight int")


def test_vertex_degrees(spark):
    e = _dir(spark, [(1, 2, 1), (1, 3, 1), (2, 3, 1), (4, 1, 1)])
    rows = {r["id"]: r for r in vertex_degrees(e).collect()}
    assert rows[1]["out_degree"] == 2 and rows[1]["in_degree"] == 1
    assert rows[3]["out_degree"] == 0 and rows[3]["in_degree"] == 2
    assert rows[4]["out_degree"] == 1 and rows[4]["in_degree"] == 0
    assert all(r["degree"] == r["out_degree"] + r["in_degree"] for r in rows.values())


def test_triangle_listing_exact(spark):
    # K4 on {1,2,3,4} plus a pendant 5: C(4,3)=4 triangles, none through 5.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tri = sorted(
        tuple(r) for r in triangle_listing(_und(spark, k4 + [(4, 5)])).collect()
    )
    assert tri == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_local_clustering_coefficient(spark):
    # Triangle 1-2-3 with pendant 4 on vertex 3.
    lcc = {
        r["id"]: r
        for r in local_clustering_coefficient(
            _und(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert lcc[1]["coefficient"] == 1.0  # deg 2, 1 triangle
    assert lcc[3]["triangle_count"] == 1 and lcc[3]["degree"] == 3
    assert lcc[3]["coefficient"] == pytest.approx(1 / 3)
    assert lcc[4]["coefficient"] == 0.0


def test_global_clustering(spark):
    row = clustering_coefficients(
        _und(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    ).first()
    assert row["triangle_count"] == 1
    # triplets: sum d(d-1)/2 = 1+1+3+0 = 5; global = 3*1/5
    assert row["global_coefficient"] == pytest.approx(0.6)
    assert row["average_coefficient"] == pytest.approx((1 + 1 + 1 / 3 + 0) / 4)


def test_sssp_exact_distances(spark):
    e = _dir(
        spark,
        [(1, 2, 1), (2, 3, 2), (1, 3, 10), (3, 4, 1), (5, 1, 1), (4, 5, 7)],
    )
    d = {r["id"]: r["distance"] for r in
         single_source_shortest_paths(e, source_id=1, steps=5).collect()}
    assert d == {1: 0, 2: 1, 3: 3, 4: 4, 5: 11}


def test_sssp_step_bound_limits_hops(spark):
    # A pure path 1→2→3→4: one superstep reaches only vertex 2.
    e = _dir(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    d = {r["id"]: r["distance"] for r in
         single_source_shortest_paths(e, source_id=1, steps=1).collect()}
    assert d == {1: 0, 2: 1}


def test_label_propagation_two_cliques(spark):
    # Two triangles bridged by one edge: each clique converges to its min id.
    left = [(1, 2), (2, 3), (1, 3)]
    right = [(4, 5), (5, 6), (4, 6)]
    labels = {
        r["id"]: r["label"]
        for r in label_propagation(
            _und(spark, left + right + [(3, 4)]), iterations=4
        ).collect()
    }
    assert labels[1] == labels[2] == 1
    assert labels[5] == labels[6]


def test_hits_star(spark):
    # Star 1→{2,3,4}: 1 is the only hub, 2/3/4 equal authorities.
    e = _dir(spark, [(1, 2, 1), (1, 3, 1), (1, 4, 1)])
    rows = {r["id"]: r for r in hits(e, iterations=2).collect()}
    assert rows[1]["hub"] == pytest.approx(1.0)
    assert rows[1]["authority"] == 0.0
    for v in (2, 3, 4):
        assert rows[v]["authority"] == pytest.approx(1 / math.sqrt(3))
        assert rows[v]["hub"] == 0.0


def test_hits_l2_normalized(spark):
    e = _dir(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 1)])
    rows = hits(e, iterations=3).collect()
    assert sum(r["hub"] ** 2 for r in rows) == pytest.approx(1.0)
    assert sum(r["authority"] ** 2 for r in rows) == pytest.approx(1.0)


def test_jaccard_index(spark):
    # N(1)={2,3}, N(4)={2,3}: J(1,4) = 2/2 = 1; J(2,3) = |{1,4}∩{1,4}|/2 = 1.
    j = {
        (r["x"], r["y"]): r["jaccard"]
        for r in jaccard_index(_und(spark, [(1, 2), (1, 3), (4, 2), (4, 3)])).collect()
    }
    assert j[(1, 4)] == pytest.approx(1.0)
    assert j[(2, 3)] == pytest.approx(1.0)
    assert len(j) == 2


def test_adamic_adar(spark):
    # 1 and 4 share neighbors {2,3}; deg(2)=deg(3)=2 → score = 2/ln(2).
    s = {
        (r["x"], r["y"]): r["score"]
        for r in adamic_adar(_und(spark, [(1, 2), (1, 3), (4, 2), (4, 3)])).collect()
    }
    assert s[(1, 4)] == pytest.approx(2 / math.log(2))


def test_hub_cap_drops_celebrity_wedges(spark):
    # Vertex 9 connects to everyone; capping at degree 3 removes its wedges.
    star = [(i, 9) for i in range(1, 6)] + [(1, 2)]
    full = jaccard_index(_und(spark, star)).collect()
    capped = jaccard_index(_und(spark, star), max_neighbor_degree=3).collect()
    assert len(capped) < len(full)
    # Wedges through low-degree vertices survive the cap.
    assert any(r["x"] == 2 and r["y"] == 9 for r in capped)


def test_summarize_graph(spark):
    from fries_flink_spark.graph.algorithms import summarize_graph

    e = _dir(spark, [(1, 2, 1), (2, 1, 1), (1, 3, 1), (4, 3, 1), (4, 5, 1)])
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 40)], "id int, label int"
    )
    rows = {
        (r["src_label"], r["dst_label"]): r
        for r in summarize_graph(e, labels).collect()
    }
    assert rows[(10, 10)]["n_edges"] == 3
    assert rows[(10, 10)]["n_src_vertices"] == 2  # 1 and 2
    assert rows[(40, 10)]["n_edges"] == 1  # 4 -> 3 crosses communities
    assert rows[(40, 40)]["n_edges"] == 1


def test_triadic_census_closed_form(spark):
    from fries_flink_spark.graph.algorithms import triadic_census

    # Graph: triangle {1,2,3} plus pendant 4-1 and isolated-ish 5 via 4-5.
    # n=5, m=5, degrees: 1:3, 2:2, 3:2, 4:2, 5:1 → wedges=3+1+1+1=6, tri=1.
    und = _und(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (4, 5)])
    r = triadic_census(und).collect()[0]
    # t3=1; t2=6-3=3; t1=m(n-2)-2w+3t3 = 15-12+3=6; t0=C(5,3)-1-3-6=0.
    assert (r["t0"], r["t1"], r["t2"], r["t3"]) == (0, 6, 3, 1)
    # Census always partitions the C(n,3) triples.
    assert r["t0"] + r["t1"] + r["t2"] + r["t3"] == 10


def test_community_detection_two_cliques(spark):
    from fries_flink_spark.graph.algorithms import community_detection

    # Two triangles bridged by one weak edge: communities = min ids {1, 4}.
    e = _dir(
        spark,
        [(1, 2, 5), (1, 3, 5), (2, 3, 5), (4, 5, 5), (4, 6, 5), (5, 6, 5), (3, 4, 1)],
    )
    rows = {r["id"]: r for r in community_detection(e, iterations=4).collect()}
    assert rows[1]["label"] == rows[2]["label"] == rows[3]["label"]
    assert rows[4]["label"] == rows[5]["label"] == rows[6]["label"]
    assert rows[1]["label"] != rows[4]["label"]
    # Reference semantics: scores are weighted maxima (LabelMessenger sends
    # score*edge_weight), so they GROW with strong in-community edges.
    assert all(r["score"] > 1.0 for r in rows.values())


def _census_brute(nodes, edges):
    """Independent pure-Python 16-type MAN classifier over all triples."""
    import itertools
    from collections import Counter

    E = set(edges)
    out = Counter()

    def flags(x, y):
        return (x, y) in E, (y, x) in E

    for a, b, c in itertools.combinations(sorted(nodes), 3):
        ps = {("ab"): flags(a, b), ("bc"): flags(b, c), ("ac"): flags(a, c)}
        m = sum(f and r for f, r in ps.values())
        s = sum(f != r for f, r in ps.values())
        if (m, s) == (0, 0):
            t = "t003"
        elif (m, s) == (0, 1):
            t = "t012"
        elif (m, s) == (1, 0):
            t = "t102"
        elif (m, s) == (2, 0):
            t = "t201"
        elif (m, s) == (2, 1):
            t = "t210"
        elif (m, s) == (3, 0):
            t = "t300"
        else:
            singles = [
                (x, y) for (x, y) in [(a, b), (b, a), (b, c), (c, b), (a, c), (c, a)]
                if (x, y) in E and (y, x) not in E
            ]
            if (m, s) == (0, 2):
                (u1, v1), (u2, v2) = singles
                if u1 == u2:
                    t = "t021d"  # shared center sources both
                elif v1 == v2:
                    t = "t021u"
                else:
                    t = "t021c"
            elif (m, s) == (1, 1):
                mut = next(p for p, (f, r) in ps.items() if f and r)
                pairv = {"ab": (a, b), "bc": (b, c), "ac": (a, c)}[mut]
                (u1, v1) = singles[0]
                t = "t111d" if v1 in pairv else "t111u"
            elif (m, s) == (1, 2):
                mut = next(p for p, (f, r) in ps.items() if f and r)
                pairv = {"ab": (a, b), "bc": (b, c), "ac": (a, c)}[mut]
                z = next(v for v in (a, b, c) if v not in pairv)
                outs = sum(1 for (u, v) in singles if u == z)
                t = {2: "t120d", 0: "t120u", 1: "t120c"}[outs]
            else:  # (0, 3)
                cyc = ({(a, b), (b, c), (c, a)} <= E) or ({(b, a), (c, b), (a, c)} <= E)
                t = "t030c" if cyc else "t030t"
        out[t] += 1
    return out


def test_directed_triadic_census_vs_bruteforce(spark):
    import random

    from fries_flink_spark.graph.algorithms import triadic_census_directed

    rng = random.Random(11)
    nodes = list(range(12))
    edges = [
        (u, v) for u in nodes for v in nodes if u != v and rng.random() < 0.25
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = triadic_census_directed(df).collect()[0].asDict()
    want = _census_brute(nodes, edges)
    for k in got:
        assert got[k] == want.get(k, 0), (k, got[k], want.get(k, 0))
    assert sum(got.values()) == 220  # C(12,3)


def test_directed_clustering_coefficient(spark):
    from fries_flink_spark.graph.algorithms import clustering_coefficients_directed

    # Triangle 1->2, 2->3, 3->1 plus mutual 1<->2 (extra reverse edge 2->1).
    # Neighborhood of 3 = {1,2}; directed edges among them: 1->2 and 2->1 =>
    # tri_edges(3) = 2, coefficient = 2 / (2*1) = 1.0.
    e = _dir(spark, [(1, 2, 1), (2, 1, 1), (2, 3, 1), (3, 1, 1)])
    rows = {r["id"]: r for r in clustering_coefficients_directed(e).collect()}
    assert rows[3]["tri_edges"] == 2 and rows[3]["coefficient"] == 1.0
    # Neighborhood of 1 = {2,3}: edges among them = 2->3 only => 1/(2*1).
    assert rows[1]["tri_edges"] == 1 and rows[1]["coefficient"] == 0.5
    assert rows[2]["tri_edges"] == 1 and rows[2]["coefficient"] == 0.5
