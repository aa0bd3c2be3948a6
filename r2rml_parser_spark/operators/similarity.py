"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``       — brute-force exact top-k (baseline; one
  broadcast nested-loop of queries × corpus, JVM higher-order
  functions for the dot product — no Python).
* ``ivf_topk``          — IVF-style scale path: centroids per coarse
  cell (the ``label`` column or k-means-lite assignment), probe the
  nearest ``nprobe`` cells only; turns the N×M cross join into
  N×(M/cells·nprobe).
* ``embedding_neardup`` — cosine ≥ threshold near-duplicate pairs.

Scores are computed in double precision with a deterministic
left-to-right fold so the DuckDB oracle (list_dot_product on doubles)
matches after rounding to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    ``queries`` is small → broadcast; corpus side streams through one
    whole-stage-codegen'd projection, then a per-query top-k window.
    Ties break on corpus id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("corpus_id")).select(
        "query_id",
        "corpus_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def ivf_centroids(embeddings: DataFrame, cell_col: str = "label",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-cell centroid = element-wise mean (posexplode + groupBy —
    the one shuffle of index build)."""
    e = embeddings.select(F.col(cell_col).alias("cell"),
                          F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"))
    return (
        e.groupBy("cell", "i").agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_im"))
        .select("cell", F.transform("_im", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding", cell_col: str = "label",
) -> DataFrame:
    """Approximate top-k: route each query to its ``nprobe`` nearest cell
    centroids, brute-force only inside those cells. The corpus join is an
    equi-join on cell — co-partitioned, broadcast-able routing table."""
    from pyspark.sql.window import Window

    cents = ivf_centroids(embeddings, cell_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    routed = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cell", cosine(F.col("qv"), F.col("centroid")).alias("cscore")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("cell"))
    probes = routed.withColumn("r", F.row_number().over(wr)).where(F.col("r") <= nprobe).select(
        "query_id", "qv", "cell"
    )
    c = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = probes.join(c, "cell").where(F.col("query_id") != F.col("corpus_id")).select(
        "query_id", "corpus_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def embedding_neardup(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding", cell_col: str = "label",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, blocked by cell (true
    near-dups land in the same coarse cell with high probability — the
    standard LSH/IVF blocking trade-off, documented approximation)."""
    e = embeddings.select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    a = e.select("cell", F.col("id").alias("a"), F.col("v").alias("va"))
    b = e.select("cell", F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, "cell")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"))
        .where(F.col("score") >= threshold)
    )


def assign_cells(
    embeddings: DataFrame, n_cells: int = 16, iterations: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """k-means-lite coarse quantizer for corpora WITHOUT a cell column:
    returns the input plus an assigned ``label`` cell, making the IVF
    index (ivf_topk / embedding_neardup) self-contained.

    Deterministic seeding (no RNG — resumable plans can't call
    Math.random): the ``n_cells`` rows with the smallest
    xxhash64(id) become the initial centroids — a uniform pseudo-random
    sample under any id distribution. Each iteration is one broadcast
    join (centroids are tiny) + the centroid-rebuild shuffle of
    ivf_centroids; Lloyd converges enough for ROUTING purposes in 1-2
    rounds (the quantizer only needs stable-ish cells, not optimal
    clustering — mis-assignment trades recall, not correctness, and the
    verify/score stage downstream is exact either way)."""
    from pyspark.sql.window import Window

    e = embeddings.select(F.col(id_col).alias("_aid"), _as_double(F.col(vec_col)).alias("_v"))
    seeds = (
        e.withColumn("_h", F.xxhash64(F.col("_aid")))
        .orderBy("_h")
        .limit(n_cells)
        .withColumn("cell", F.row_number().over(Window.orderBy("_aid")) - 1)
        .select("cell", F.col("_v").alias("centroid"))
    )
    w = Window.partitionBy("_aid").orderBy(F.desc("_s"), F.asc("cell"))

    def best_cell(cents):
        scored = e.crossJoin(cents).select(
            "_aid", "_v", "cell", cosine(F.col("_v"), F.col("centroid")).alias("_s")
        )
        return scored.withColumn("_r", F.row_number().over(w)).where(F.col("_r") == 1)

    cents = F.broadcast(seeds)
    for _ in range(iterations):
        cents = F.broadcast(
            ivf_centroids(
                best_cell(cents).select(
                    F.col("cell").alias("label"), F.col("_v").alias("embedding")
                ),
                cell_col="label", vec_col="embedding",
            )
        )
    lab = best_cell(cents).select(F.col("_aid").alias(id_col), F.col("cell").alias("label"))
    return embeddings.drop("label").join(lab, id_col)
