"""Iterative connected components: large-star / small-star DataFrame joins.

Canonicalization backbone (BASELINE.json north_star: "iterative
connected-components canonicalization (large-star/small-star via
DataFrame self-joins) to merge co-referent subject IRIs"). No reference
counterpart — the closest analogue is the reference's in-memory
"all subjects of the parent map" linkage (Generator.java:522-540).

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public): alternate

  large-star: ∀u: ∀v ∈ Γ(u), v > u  →  emit (v, m(u))
  small-star: ∀u (edges canonical v ≤ u): emit (v, m(u)) ∪ (u, m(u))

where m(u) = min(Γ(u) ∪ {u}), until the edge set reaches a fixpoint;
the result is a star forest: every node points at its component's
minimum. Converges in O(log n) rounds on pathological chains.

Scale notes: each round is two shuffles (groupBy u + dedup);
``localCheckpoint`` cuts the lineage so plans don't grow exponentially;
convergence is checked with a cheap count+hash aggregate, not collect.
High-degree hubs are exactly what large-star splits, which is the
skew-handling story for power-law graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """m(u) = min(Γ(u) ∪ {u}) for the given directed edge list."""
    return edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))


def _large_star(edges: DataFrame) -> DataFrame:
    both = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = _min_neighbor(both)
    return (
        both.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = _min_neighbor(canon)
    joined = canon.join(m, "u")
    out = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
        joined.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).dropDuplicates()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (sum(xxhash64) throws
    # ARITHMETIC_OVERFLOW under ANSI mode)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the (already-blocked, sparse) edge
    list and run union-find on the driver, broadcast back as a DataFrame.

    Same output contract as the iterative path: every non-isolated node →
    min node id of its component. LSH-blocked near-dup graphs are tiny
    relative to the corpus (edges ≪ docs), so this is the CC analogue of
    a broadcast join — it removes O(log n) barrier rounds of small
    shuffle jobs whose fixed latency doesn't scale with executors."""
    # toPandas(): one job, Arrow-batched both ways — measured ~2× faster
    # than Row-object collect + list createDataFrame at 10^5 edges; the
    # threshold bounds driver memory. Node ids are then FACTORIZED to
    # dense int codes (vectorized) and union-find runs over int arrays
    # with ranks in VALUE order, so "union by min id" stays exact while
    # the hot loop touches numpy ints, not string-keyed dicts — this
    # whole function is driver-side FIXED cost in the build, so every
    # ms here is a direct win on the N→4N scaling ratio (r4).
    import numpy as np
    import pandas as pd

    pdf = edges.toPandas()
    spark = edges.sparkSession
    out_schema = edges.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).schema
    if not len(pdf):
        return spark.createDataFrame([], out_schema)
    codes, uniques = pd.factorize(
        pd.concat([pdf.iloc[:, 0], pdf.iloc[:, 1]], ignore_index=True), sort=False
    )
    n = len(uniques)
    m = len(pdf)
    # rank[c] = position of uniques[c] in sorted value order: union by
    # min RANK ≡ union by min node id
    rank = np.empty(n, dtype=np.int64)
    rank[np.argsort(uniques)] = np.arange(n)
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    us, vs = codes[:m], codes[m:]
    for i in range(m):
        ru, rv = find(us[i]), find(vs[i])
        if ru != rv:
            if rank[ru] <= rank[rv]:
                parent[rv] = ru
            else:
                parent[ru] = rv
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    out = pd.DataFrame({"node": uniques, "component": uniques[roots]})
    return spark.createDataFrame(out, out_schema)


def connected_components(
    edges: DataFrame, max_iterations: int = 25, checkpoint_every: int = 1,
    collect_threshold: int = 1_000_000,
) -> DataFrame:
    """Undirected edges (u, v) → assignments (node, component) where
    component is the minimum node id of the component.

    Node/id columns may be any orderable type (string IRIs included).
    Isolated nodes don't appear in edges and keep themselves as their
    component implicitly. Edge sets of ≤ ``collect_threshold`` rows run
    as driver-side union-find (see _driver_union_find); larger graphs
    run the large-star/small-star fixpoint. Set the threshold to 0 to
    force the distributed path.
    """
    def _cut_lineage(df: DataFrame) -> DataFrame:
        # reliable checkpoint when the session has a checkpoint dir
        # (cluster runs: survives executor loss); localCheckpoint
        # otherwise (single-JVM test/bench: no HDFS round-trip)
        if df.sparkSession.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    cur = _cut_lineage(
        edges.select("u", "v")
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        # materialize the input once: upstream edge derivations (e.g. the
        # whole MinHash pipeline) must not re-execute per CC iteration.
        # NO input dropDuplicates: parallel edges are harmless to both
        # paths (union-find is idempotent; the first large-star round
        # ends in its own dropDuplicates), and skipping it removes a
        # full shuffle + checkpoint — fixed cost that doesn't scale
        # with executors (r4 phase profile: the rewrite phase's driver-
        # side constants were ~40% of its wall at local[8])
    )
    if collect_threshold and cur.count() <= collect_threshold:
        return _driver_union_find(cur)
    prev_fp = None
    for i in range(max_iterations):
        cur = _small_star(_large_star(cur))
        if (i + 1) % checkpoint_every == 0:
            cur = _cut_lineage(cur)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")

    # star forest: u → v(=min). Component roots map to themselves.
    nodes = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).dropDuplicates().withColumn(
        "component", F.col("node")
    )
    return nodes.unionByName(roots).dropDuplicates()


def canonical_mapping(edges: DataFrame) -> DataFrame:
    """sameAs edge list → (iri, canonical_iri) rewrite table (includes
    identity rows only for merged nodes)."""
    cc = connected_components(edges)
    return cc.select(F.col("node").alias("iri"), F.col("component").alias("canonical_iri"))


def rewrite_subjects(
    triples: DataFrame, mapping: DataFrame, *, assume_distinct: bool = False
) -> DataFrame:
    """Apply a canonicalization mapping to subject AND object IRIs of a
    triples DataFrame (broadcast when small; it usually is), restoring
    set semantics afterwards.

    With ``assume_distinct=False`` (default) the whole result goes
    through ``dropDuplicates`` — one full-graph shuffle.

    With ``assume_distinct=True`` the caller asserts the *input* is
    already duplicate-free; then only the rows the mapping actually
    touched are deduplicated, and the (typically ≫ larger) untouched
    rest streams through shuffle-free. This is exact, not a heuristic:
    ``canonical_mapping`` emits an identity row for every canonical
    target (component roots map to themselves), so after rewriting,

      * a subj-touched row has subj ∈ mapping keys, while every
        untouched row has subj ∉ mapping keys (else its left join would
        have matched) — they can never be equal;
      * an obj-touched row has obj ∈ mapping keys; an untouched row's
        IRI obj ∉ mapping keys — never equal;
      * two untouched rows are distinct by the input assumption.

    Hence all duplicates live inside the touched subset. At bench scale
    this cut the post-canonicalization dedup exchange from the full
    graph (17.9M wide rows) to the near-dup-cluster slice of it.
    """
    m = F.broadcast(mapping)
    t = (
        triples.join(m.withColumnRenamed("iri", "subj").withColumnRenamed(
            "canonical_iri", "_subj_canon"), "subj", "left")
        .join(m.withColumnRenamed("iri", "obj").withColumnRenamed(
            "canonical_iri", "_obj_canon"), "obj", "left")
    )
    touched = F.col("_subj_canon").isNotNull() | (
        F.col("_obj_canon").isNotNull() & (F.col("obj_kind") == "iri")
    )
    rewritten = (
        t.withColumn("subj", F.coalesce(F.col("_subj_canon"), F.col("subj")))
        .withColumn(
            "obj",
            F.when(F.col("obj_kind") == "iri", F.coalesce(F.col("_obj_canon"), F.col("obj")))
            .otherwise(F.col("obj")),
        )
    )
    out_cols = triples.columns
    if not assume_distinct:
        return rewritten.select(*out_cols).dropDuplicates()
    untouched = rewritten.where(~touched).select(*out_cols)
    touched_dedup = rewritten.where(touched).select(*out_cols).dropDuplicates()
    return untouched.unionByName(touched_dedup)
