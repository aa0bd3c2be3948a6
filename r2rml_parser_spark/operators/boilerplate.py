"""Corpus-level boilerplate removal over interleaved span sequences.

The CCNet/RefinedWeb-style hygiene stage (public pipeline literature;
no reference counterpart — r2rml-parser has no corpus operators): a
text unit that recurs VERBATIM across many documents is boilerplate
(headers, footers, nav chrome, license blurbs) and should be dropped
from every document before training. Here the unit is the graft's
native one — the text SPAN of the interleaved (kind, text, media_ref,
offset) sequence — so media spans and document structure pass through
untouched and the output composes with every downstream span consumer
(mapping engine, reassembly, mention detection).

Scale shape (the corpus is 100 TB, the boilerplate table is not):

* the frequency pass groups text spans by normalized-text md5 and
  counts DISTINCT documents — one shuffle over text spans only, with
  two-phase partial aggregation (the per-partition distinct collapse
  happens map-side);
* the hot set (``n_docs >= min_docs``) is tiny by construction —
  boilerplate is the head of the frequency distribution — so the strip
  pass is a BROADCAST anti join against the span scan: the corpus
  itself never shuffles, and the whole strip stays in one codegen
  stage;
* nothing driver-side: the hot set moves executor-to-executor as a
  broadcast relation, never through ``collect()``.

Normalization matches the dedup family (``dedup.normalized_text`` —
lower/trim/whitespace-collapse), so the DuckDB oracle
(oracles `_NORM`) replays the exact md5 keys byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.operators.dedup import normalized_text

#: a span text seen verbatim in this many distinct docs is boilerplate
DEFAULT_MIN_DOCS = 3


def boilerplate_span_texts(
    spans: DataFrame,
    min_docs: int = DEFAULT_MIN_DOCS,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    kind_col: str = "kind",
) -> DataFrame:
    """(text_hash, n_docs) for every text-span content that occurs in at
    least ``min_docs`` distinct documents. One shuffle (two-phase
    distinct count) over text spans; output is hot-set-sized."""
    return (
        spans.where(F.col(kind_col) == "text")
        .select(
            F.md5(normalized_text(F.col(text_col))).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    spans: DataFrame,
    min_docs: int = DEFAULT_MIN_DOCS,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    kind_col: str = "kind",
) -> DataFrame:
    """Span rows with boilerplate text spans removed (media spans and
    non-recurring text spans untouched; all input columns preserved).
    Broadcast anti join — the corpus side never shuffles."""
    hot = boilerplate_span_texts(
        spans, min_docs, text_col=text_col, id_col=id_col, kind_col=kind_col
    ).select("text_hash")
    keyed = spans.withColumn(
        "_bp_hash",
        F.when(
            F.col(kind_col) == "text", F.md5(normalized_text(F.col(text_col)))
        ),
    )
    return (
        keyed.join(
            F.broadcast(hot),
            keyed["_bp_hash"] == hot["text_hash"],
            "left_anti",
        )
        .drop("_bp_hash")
    )
