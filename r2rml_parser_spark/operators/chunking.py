"""Document chunking into overlapping token windows.

The long-document half of sequence construction (the token-budget
packer in `operators/sampling.py` is the short-document half): split
each document into fixed-size whitespace-token windows with a
configurable overlap, the standard context-window preparation for
training and retrieval indexing. No reference counterpart —
r2rml-parser has no corpus operators.

Scale shape: one scan, no shuffle at all — every chunk derives from
its own document's row (split → per-row chunk-index ``sequence`` →
``explode`` → ``slice``/``concat_ws``, all codegen collection
functions; no window, no groupBy), so the operator scales linearly
and partition-locally at any corpus size. Chunk counts are
per-document (``ceil((n - overlap) / stride)``, min 1), so one giant
document fans out to many rows without skewing any exchange — there
is none.

Determinism / oracle: whitespace tokenization (``\\s+`` on the
trimmed text, matching ``textstats.token_count``), 0-based chunk ids,
1-based inclusive slices — DuckDB replays every step exactly
(``string_split_regex`` + ``generate_series`` + ``list_slice`` +
``array_to_string``), no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_TOKENS = 100
DEFAULT_OVERLAP = 10


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc, chunk_id, chunk_text, n_tokens) — one row per window.

    Windows start every ``stride = chunk_tokens - overlap`` tokens and
    carry up to ``chunk_tokens`` tokens; the last window truncates at
    the document end. A document with ≤ ``chunk_tokens`` tokens yields
    exactly one chunk; blank documents yield none."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc"),
        toks.alias("__toks"),
        n_chunks.alias("__nc"),
    )
    chunked = base.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        F.col("__toks"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return chunked.select(
        "doc",
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def chunk_documents_oracle_sql(
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
    table: str = "documents",
) -> str:
    """DuckDB twin: identical tokenization, chunk-count formula, and
    1-based inclusive slicing."""
    stride = chunk_tokens - overlap
    return f"""
WITH base AS (
  SELECT doc_id AS doc,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM {table} WHERE length(trim(text)) > 0
),
info AS (
  SELECT doc, toks,
         GREATEST(1, CAST(ceil((len(toks) - {overlap}) * 1.0 / {stride}) AS INT))
           AS nc
  FROM base
),
chunks AS (
  SELECT doc, toks, unnest(generate_series(0, nc - 1)) AS chunk_id
  FROM info
)
SELECT doc, chunk_id,
       array_to_string(
         list_slice(toks, chunk_id * {stride} + 1,
                    chunk_id * {stride} + {chunk_tokens}), ' ') AS chunk_text,
       len(list_slice(toks, chunk_id * {stride} + 1,
                      chunk_id * {stride} + {chunk_tokens})) AS n_tokens
FROM chunks
"""
