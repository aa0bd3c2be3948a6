"""Iterative PageRank over KG entity edges — DataFrame joins, exact
integer arithmetic.

Entity-importance scoring for the constructed knowledge graph (no
reference counterpart — r2rml-parser emits triples and stops; ranking
the emitted entities is the downstream-analytics half a KG pipeline
needs for entity salience, sampling weights, and canonicalization
tie-breaks). Same iterative-DataFrame shape as connected components
(`operators/components.py`): k bounded rounds of join → groupBy,
lineage cut with ``localCheckpoint`` each round.

Determinism is the design constraint: ranks are SCALED INTEGERS
(``rank ≈ probability × 10^scale`` in a BIGINT) and every step uses
integer division, so there is no floating-point summation order to
disagree about — the DuckDB oracle replays the exact per-iteration
values with the same ``//`` operations unrolled, and the driver's
value-hash comparison is bit-exact. The classic float formulation
would differ between engines in the last ulp because SUM order is
nondeterministic in both.

Update rule (textbook, damping d = num/den as a rational):

    R0(v)   = 10^scale // N
    base    = ((den - num) * (10^scale // N)) // den
    S_i(v)  = Σ_{u→v} ( R_{i-1}(u) // outdeg(u) )
    R_i(v)  = base + (num * S_i(v)) // den

Dangling nodes (no out-edges) keep their rank but redistribute
nothing — their mass decays into the base term (documented standard
simplification; ranks then need not sum to 10^scale).

Scale shape: edges is corpus-sized, everything else is per-node.
Each iteration is ONE shuffle (groupBy dst with map-side partial
sums) plus a broadcast-eligible join of the node-sized rank relation;
outdeg is computed once and reused. High-degree hubs skew the groupBy
like any aggregation — AQE's skew handling applies, and the
contribution rows are pre-shrunk to (dst, contrib) longs before the
exchange. The node count N is the only driver-side scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank unit: rank 10^9 == probability 1.0
DEFAULT_SCALE = 9


def kg_entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct IRI→IRI (src, dst) entity edges of a 7-column triples
    DF — the KG link structure, excluding literals/bnodes and
    self-loops."""
    return (
        triples.where(
            (F.col("subj_kind") == "iri")
            & (F.col("obj_kind") == "iri")
            & (F.col("subj") != F.col("obj"))
        )
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .dropDuplicates()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds; rank is a scaled
    BIGINT (10^scale = probability 1). Exact-integer formulation —
    see module docstring; a SQL twin unrolling the same ``//`` steps
    reproduces every value bit-for-bit."""
    unit = 10 ** scale
    # one materialization: every iteration re-reads the edge relation
    # (and nodes/outdeg derive from it) — without this the upstream
    # producer (e.g. the whole mapping engine) would re-run per round
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    nodes = nodes.localCheckpoint()
    n = nodes.count()  # the one driver-side scalar
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = unit // n
    base = ((damping_den - damping_num) * r0) // damping_den

    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    rank = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for _ in range(iterations):
        contribs = (
            edges.join(rank, edges.src == rank.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("contrib"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        rank = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()  # cut lineage: plans stay O(1) per round
        )
    return rank


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin: unrolled CTE per iteration replaying the exact
    integer steps (``//`` = floor division; all values non-negative,
    so floor == Spark's ``div``). ``edges_sql`` must yield (src, dst),
    already distinct."""
    unit = 10 ** scale
    parts = [
        f"WITH edges AS ({edges_sql}),",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        "outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),",
        f"r0 AS (SELECT node, {unit} // nn.n AS rank FROM nodes, nn),",
    ]
    base = (
        f"(({damping_den - damping_num} * ({unit} // nn.n)) // {damping_den})"
    )
    for i in range(1, iterations + 1):
        parts.append(
            f"s{i} AS (SELECT e.dst AS node,"
            f" SUM(r.rank // d.deg) AS s FROM edges e"
            f" JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN outdeg d ON d.src = e.src GROUP BY e.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node, {base} +"
            f" (({damping_num} * COALESCE(s{i}.s, 0)) // {damping_den})"
            f" AS rank FROM nodes CROSS JOIN nn"
            f" LEFT JOIN s{i} ON s{i}.node = nodes.node)"
            + ("," if i < iterations else "")
        )
    # Cast to BIGINT: DuckDB's `//` chain infers HUGEINT, which pandas/Arrow
    # materializes as float64 while Spark's rank stays int64 — the driver's
    # value hash then diverges on representation despite identical values.
    parts.append(f"SELECT node, CAST(rank AS BIGINT) AS rank FROM r{iterations}")
    return "\n".join(parts)
