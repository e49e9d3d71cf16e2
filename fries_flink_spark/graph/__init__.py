"""Graph algorithm library (Gelly parity, SURVEY §2 descope now closed).

Reference: flink-libraries/flink-gelly/src/main/java/org/apache/flink/graph/
library/ — ConnectedComponents, SingleSourceShortestPaths, LabelPropagation,
TriangleEnumerator, clustering/{Local,Global,Average}ClusteringCoefficient,
linkanalysis/{PageRank,HITS}, similarity/{JaccardIndex,AdamicAdar},
metric vertex degrees.

Everything here is DataFrame-native: joins + aggregations per superstep, with
the iteration discipline (frontier delta iterations, lineage truncation) from
``operators/iterate.py``.
"""

from .algorithms import (
    adamic_adar,
    clustering_coefficients,
    clustering_coefficients_directed,
    community_detection,
    hits,
    jaccard_index,
    label_propagation,
    local_clustering_coefficient,
    single_source_shortest_paths,
    triadic_census,
    triadic_census_directed,
    triangle_listing,
    vertex_degrees,
)

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
