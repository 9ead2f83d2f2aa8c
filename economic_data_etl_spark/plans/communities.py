"""Community detection over the harvested link graph: deterministic
label propagation + Newman modularity certification.

Sits next to PageRank/TrustRank/HITS (plans/linkgraph.py) on the same
planted 64-doc certification universe: the edge replay is shared, so
the oracle here replays the FULL algorithm — symmetrization, every
synchronous vote round with its (count desc, label asc) tie-break
unrolled as CTE stages, and the modularity arithmetic — not just the
output shape. A tie-break bug, an off-by-one round, or a modularity
slip is a value-hash mismatch.

Scale: one vote shuffle per round over the edge list (map-side-trimmed
argmax via WindowGroupLimit), the same per-round profile as PageRank;
the modularity pass is two edges-sized joins against the final
node-sized label table. See operators/labelprop.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.plans.linkgraph import _EDGES_SQL, _link_edges

_LPA_ITERS = 4


def _lpa_sql_tail(iterations: int) -> str:
    """The unrolled DuckDB replay: symmetrize, N synchronous vote
    rounds, then the per-community modularity summary."""
    parts = [
        """
    , e0 AS (
        SELECT src_url AS src, dst_url AS dst FROM edges
        WHERE src_url <> dst_url
    ), und AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0
            UNION ALL SELECT dst, src FROM e0
        )
    ), deg AS (
        SELECT src AS node, COUNT(*) AS d FROM und GROUP BY 1
    ), m AS (
        SELECT COUNT(*) // 2 AS m FROM und
    ), lbl0 AS (
        SELECT DISTINCT src AS node, src AS lab FROM und
    )
    """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""
    , v{i} AS (
        SELECT u.src AS node, l.lab AS lab, COUNT(*) AS c
        FROM und u JOIN lbl{i - 1} l ON l.node = u.dst
        GROUP BY 1, 2
    ), lbl{i} AS (
        SELECT node, lab FROM (
            SELECT node, lab,
                   ROW_NUMBER() OVER (
                       PARTITION BY node ORDER BY c DESC, lab
                   ) AS rn
            FROM v{i}
        ) WHERE rn = 1
    )
    """
        )
    parts.append(
        f"""
    , sized AS (
        SELECT l.lab AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg.d) AS BIGINT) AS degree_sum
        FROM lbl{iterations} l JOIN deg USING (node)
        GROUP BY 1
    ), intra AS (
        SELECT a.lab AS community,
               CAST(COUNT(*) // 2 AS BIGINT) AS intra_edges
        FROM und u
        JOIN lbl{iterations} a ON a.node = u.src
        JOIN lbl{iterations} b ON b.node = u.dst
        WHERE a.lab = b.lab
        GROUP BY 1
    )
    SELECT s.community, s.n_nodes,
           CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           s.degree_sum,
           ROUND(5e-10
                 + CAST(COALESCE(i.intra_edges, 0) AS DOUBLE)
                   / (SELECT CAST(m AS DOUBLE) FROM m)
                 - (s.degree_sum
                    / (2.0 * (SELECT CAST(m AS DOUBLE) FROM m)))
                   * (s.degree_sum
                      / (2.0 * (SELECT CAST(m AS DOUBLE) FROM m))),
                 4) AS q_contrib
    FROM sized s LEFT JOIN intra i USING (community)
    ORDER BY n_nodes DESC, community
    LIMIT 20
    """
    )
    return "".join(parts)


@register(
    "crawl_labelprop_communities",
    oracle=_EDGES_SQL + _lpa_sql_tail(_LPA_ITERS),
    doc="Label-propagation communities over the harvested link graph "
    "(Raghavan et al. 2007), DERANDOMIZED: synchronous rounds (every "
    "node votes on the previous round's labels — no visit order "
    "exists) with (count desc, label asc) tie-breaks, 4 rounds, then "
    "the Newman modularity contribution per community from exact "
    "integer L_c / d_c / m. One edges-sized vote shuffle per round "
    "with a WindowGroupLimit argmax — the PageRank cost profile. "
    "Oracle unrolls all 4 rounds as CTE stages over the replayed "
    "planted edge set and recomputes the modularity arithmetic, so a "
    "tie-break or round-count slip is a value mismatch.",
)
def crawl_labelprop_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.labelprop import (
        community_summary,
        label_propagation,
    )

    edges = _link_edges(spark, sf_dir).select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    )
    # The extractor lane feeds both LPA and the modularity pass:
    # checkpoint so the Arrow page-parse runs once.
    edges = edges.localCheckpoint(eager=False)
    labels = label_propagation(edges, iterations=_LPA_ITERS)
    return (
        community_summary(edges, labels, round_fn=biased_round)
        .orderBy(F.desc("n_nodes"), "community")
        .limit(20)
    )
