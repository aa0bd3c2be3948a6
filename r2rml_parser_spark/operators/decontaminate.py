"""Benchmark decontamination: n-gram collision against an eval set.

The standard training-data hygiene stage (no reference counterpart —
r2rml-parser has no corpus operators at all): a training document is
CONTAMINATED when it shares at least one word n-gram with any document
of a benchmark/eval set, and must be dropped (or flagged) before
training. The classic operating point is 13-gram collision; ``n`` is a
parameter because short-form benchmarks use 8–10.

Scale shape (the corpus is 100 TB, the benchmark is not):

* the benchmark side reduces to its DISTINCT n-gram md5 hashes — one
  shuffle over benchmark-sized data only, then a broadcast;
* the corpus side explodes its (already per-doc-distinct) n-grams
  in-row — whole-stage codegen, NO corpus shuffle — and inner-joins
  the broadcast gram set, so only HIT rows ever reach an exchange;
* per-doc hit counts are a map-side-partial groupBy over the hit rows
  (grams are distinct within a doc, so ``count(1)`` is the distinct
  collision count);
* ``decontaminate`` skips even that: a broadcast anti join keeps the
  clean docs without aggregating anything.

Hashes are md5-hex so the DuckDB oracle replays the exact join keys
(oracles.decontamination_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.operators.dedup import shingles

#: GPT-3-style default collision width (word n-grams)
DEFAULT_NGRAM = 13


def benchmark_grams(
    benchmark: DataFrame, n: int = DEFAULT_NGRAM, text_col: str = "text"
) -> DataFrame:
    """Benchmark docs → one-column DF of distinct n-gram md5 hashes
    (``gram_hash``). Benchmark-sized, built once, broadcast by callers."""
    return (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("gram_hash"))
        .dropDuplicates()
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_hit_grams) for every doc sharing ≥1 word n-gram with the
    benchmark. Docs with no collision are absent (anti-join or left-join
    the result to flag the rest)."""
    bg = benchmark_grams(benchmark, n, bench_text_col or text_col)
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select(id_col, F.md5("g").alias("gram_hash"))
    hits = doc_grams.join(F.broadcast(bg), "gram_hash")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit_grams"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Docs with every benchmark-colliding document REMOVED (broadcast
    anti join on the hit ids — the corpus never shuffles)."""
    bg = benchmark_grams(benchmark, n, bench_text_col or text_col)
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select(id_col, F.md5("g").alias("gram_hash"))
    hit_ids = doc_grams.join(F.broadcast(bg), "gram_hash").select(id_col).dropDuplicates()
    return docs.join(F.broadcast(hit_ids), id_col, "anti")
