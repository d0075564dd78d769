"""Graph-analytics plans over the near-dup candidate graph.

The MinHash-LSH candidate pairs (shared CTE with the dedup family, so
the oracle runs on the exact same edges) form an undirected graph;
these queries value-check the two graph primitives in
operators/graph.py: PageRank centrality (hub/canonical-doc scoring)
and per-node triangle counts (cluster-density diagnostics). Both are
north-star LLM-pipeline surface — the reference (a 515-line scraper)
has no analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.operators.dedup import minhash_lsh_pairs
from stupp_exclusion_etl_spark.operators.graph import (
    pagerank,
    symmetrize,
    triangle_counts,
)
from stupp_exclusion_etl_spark.plans.dedup import (
    _BAND_SIZE,
    _MINHASH_PAIRS_CTES,
    _N_HASHES,
)
from stupp_exclusion_etl_spark.plans.registry import register

PR_ITERS = 5
PR_DAMPING = 0.85


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared candidate-pair edge list (same parameters as
    dedup_minhash_lsh / dedup_groups_cc, ids canonical long)."""
    d = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=_N_HASHES, band_size=_BAND_SIZE, shingle_k=3
    ).select(F.col("id1").cast("long"), F.col("id2").cast("long"))


def _pagerank_oracle(iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    """Unrolled-CTE twin of operators.graph.pagerank: each iteration is
    one edges⋈rank⋈deg join-aggregate CTE — same uniform init, same
    float expressions (per-edge pr/outdeg, (1-d)/n base), so values
    agree to ~1e-15, far inside the 6-dp rounding of the ~1.0-scale
    normalized output."""
    ctes = [
        "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs"
        " UNION ALL SELECT id2, id1 FROM pairs)",
        "nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg"
        " FROM edges GROUP BY src)",
        "r0 AS (SELECT DISTINCT e.src AS node, 1.0 / nn.n AS pr"
        " FROM edges e CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT e.dst AS node,
                     (1.0 - {damping}) / nn.n
                       + {damping} * SUM(r.pr / d.outdeg) AS pr
              FROM edges e
              JOIN r{i - 1} r ON r.node = e.src
              JOIN deg d ON d.src = e.src
              CROSS JOIN nn
              GROUP BY e.dst, nn.n)"""
        )
    return f"""
    WITH {_MINHASH_PAIRS_CTES}, {", ".join(ctes)}
    SELECT r.node AS doc_id, ROUND(r.pr * nn.n, 6) AS rank_rel
    FROM r{iters} r CROSS JOIN nn
    """


@register("graph_pagerank", oracle=_pagerank_oracle(), tags=("B9",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup candidate graph
    (operators.graph.pagerank, fixed 5 iterations, damping 0.85):
    which document is the HUB of its near-dup neighborhood — a
    structure-aware canonical-representative score where min-id CC
    grouping is arbitrary. Output is normalized rank (pr × N, uniform
    = 1.0) per document in the graph; the oracle replays the identical
    unrolled iterations as chained CTEs over the same shared LSH-pair
    CTE, value-checking the whole trajectory like ml_logreg's."""
    pairs = _lsh_pairs(spark, sf_dir)
    ranks = pagerank(symmetrize(pairs), iters=PR_ITERS, damping=PR_DAMPING)
    # Normalization factor: ranks is the checkpointed node frame, so
    # this count is a metadata-scale scan, no recompute of the pairs.
    n_nodes = float(ranks.count())
    return ranks.select(
        F.col("node").cast("long").alias("doc_id"),
        F.round(F.col("pr") * F.lit(n_nodes), 6).alias("rank_rel"),
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTES},
    tri AS (
      SELECT p1.id1 AS a, p1.id2 AS b, p2.id2 AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.id1 = p1.id2
      JOIN pairs p3 ON p3.id1 = p1.id1 AND p3.id2 = p2.id2),
    member AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM member GROUP BY node
    """,
    tags=("B9",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation in the near-dup candidate
    graph (operators.graph.triangle_counts, degree-ordered orientation
    so wedge fan-out is bounded by O(sqrt(2m)) even under a viral
    boilerplate hub): dense-clique members are true duplicate blobs,
    low-triangle chains are marginal LSH matches worth a verify pass.
    The id-ordered oracle enumerates the same orientation-invariant
    triangle set directly from the shared pair CTE."""
    pairs = _lsh_pairs(spark, sf_dir)
    return triangle_counts(pairs).select(
        F.col("node").cast("long").alias("doc_id"), "n_triangles"
    )
