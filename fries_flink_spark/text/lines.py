"""Line-level corpus dedup / boilerplate removal (beyond-reference:
C4-style training-data cleaning; cf. the text/ and dedup/ families).

The classic web-corpus cleanups operate on LINES (or fixed spans) rather
than whole documents:

- **Exact line dedup, keep-first**: a line that occurs anywhere else in the
  corpus keeps only its first occurrence (C4's "discard all but one of any
  three-sentence span occurring more than once" is this shape).
- **Boilerplate strip**: a line occurring in >= N distinct documents is
  boilerplate (nav bars, cookie banners, license headers) and is removed
  from EVERY document, which is then re-assembled from its surviving lines.

Scale design (100 TB):
- the line explode is linear, no shuffle; line identity shuffles ONCE on the
  line value (hash-partitioned agg with map-side partial min/count — no
  window sort anywhere);
- the boilerplate line set is vocabulary-sized (lines seen in >= N docs),
  so the strip is a BROADCAST anti-join, not a second corpus shuffle;
- document reassembly shuffles once on doc id with array_sort on (line_no)
  — a per-doc sort, never a global one.

For corpora without newline structure (this repo's synthetic documents are
single-line), ``chunk_lines`` cuts deterministic fixed-word pseudo-lines so
the same operators apply; real corpora use ``split_lines``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Explode documents into (id, line_no, line) on newlines."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )


def chunk_lines(
    df: DataFrame, text_col: str, id_col: str, words_per_line: int = 10
) -> DataFrame:
    """Deterministic pseudo-lines: consecutive ``words_per_line``-word chunks
    (for corpora without newline structure). Emits (id, line_no, line)."""
    w = words_per_line
    words = F.split(F.col(text_col), " ")
    n_lines = F.ceil(F.size(words) / F.lit(float(w))).cast("int")
    return (
        df.filter(F.size(words) > 0)
        .select(
            F.col(id_col),
            words.alias("__w"),
            F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("line_no"),
        )
        .select(
            id_col,
            F.col("line_no").cast("long").alias("line_no"),
            F.array_join(
                F.slice(F.col("__w"), F.col("line_no") * w + 1, w), " "
            ).alias("line"),
        )
    )


def line_dedup_keep_first(
    lines: DataFrame,
    id_col: str = "doc_id",
    no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Global exact line dedup keeping the first occurrence — first meaning
    the lexicographically least (id, line_no), the stable deterministic
    reading of "first seen". ONE hash shuffle on the line value.

    The pair-min aggregates over a DECIMAL(38,0) packing of
    ``id * 10^10 + line_no`` rather than ``min(struct(id, line_no))``: a
    struct aggregation buffer is unsupported by HashAggregateExec, so the
    struct form silently planned as SortAggregate — a per-partition sort of
    every exploded line on the line string. The packed decimal is a
    fixed-width buffer (hash aggregation, map-side partials) and its min is
    the exact lexicographic pair-min for non-negative ids with
    ``line_no < 10^10`` (line numbers are within-document offsets; any
    int64 id fits: 9.2e18 * 10^10 < 10^38)."""
    pack = (
        F.col(id_col).cast("decimal(28,0)") * F.lit(10_000_000_000)
        + F.col(no_col)
    )
    return (
        lines.groupBy(line_col)
        .agg(F.min(pack).alias("__first"))
        .select(
            F.expr("CAST(__first DIV 10000000000 AS BIGINT)").alias(id_col),
            F.expr("CAST(__first % 10000000000 AS BIGINT)").alias(no_col),
            line_col,
        )
    )


def boilerplate_lines(
    lines: DataFrame, min_docs: int, id_col: str = "doc_id", line_col: str = "line"
) -> DataFrame:
    """Lines occurring in >= ``min_docs`` DISTINCT documents. Two-phase:
    distinct (doc, line) first (map-side combinable), then a plain count —
    the count_distinct rewrite that avoids re-shuffling raw occurrences."""
    return (
        lines.select(id_col, line_col)
        .distinct()
        .groupBy(line_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int,
    words_per_line: int = 10,
) -> DataFrame:
    """Remove boilerplate lines (>= min_docs distinct docs) from every
    document and re-assemble the survivors in line order.

    Output: id, ``n_kept``, ``n_removed``, ``cleaned`` (empty string when
    every line was boilerplate — the caller decides whether to drop empties,
    as C4 does). The boilerplate set is broadcast (vocabulary-sized); the
    reassembly is the single doc-id shuffle."""
    lines = chunk_lines(df, text_col, id_col, words_per_line)
    bp = boilerplate_lines(lines, min_docs, id_col=id_col).select(
        "line", F.lit(True).alias("__bp")
    )
    tagged = lines.join(F.broadcast(bp), "line", "left")
    kept_struct = F.when(
        F.col("__bp").isNull(), F.struct(F.col("line_no"), F.col("line"))
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("__bp").isNull(), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("__bp").isNotNull(), 1).otherwise(0)).alias("n_removed"),
            # collect_list drops the nulls the WHEN leaves for boilerplate rows
            F.array_sort(F.collect_list(kept_struct)).alias("__lines"),
        )
        .select(
            id_col,
            "n_kept",
            "n_removed",
            F.array_join(
                F.transform(F.col("__lines"), lambda s: s["line"]), " "
            ).alias("cleaned"),
        )
    )
