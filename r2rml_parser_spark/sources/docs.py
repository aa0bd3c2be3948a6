"""Canonical interleaved text+media document source (BASELINE.json input_hint).

The engine's canonical logical source is

    docs(doc_id string,
         spans array<struct<kind string, text string, media_ref string, offset int>>)

Synthesized **deterministically** from the driver's ``documents.parquet``
(doc_id, text, lang, source, n_chars) with no RNG, so the exact same
table is reproducible in DuckDB SQL for the correctness oracle:

* the text splits into chunks of ``CHUNK`` whitespace tokens → one
  ``kind='text'`` span per chunk;
* after chunk *i*, a media span is interleaved iff
  ``ascii(substr(md5(doc_id || ':' || i), 1, 1)) % 4 == 0``; its kind
  cycles image/audio/video by the second md5 hex char, and
  ``media_ref = 'media://' || doc_id || '/' || i``;
* ``offset`` is the span's ordinal position in the final sequence.

Everything is built with Spark higher-order functions (transform /
flatten / slice) — single scan, no explode-regroup shuffle, no Python.

Span-sequence invariant (input_hint): re-assembling
``(kind, text, media_ref, order)`` per document after any transform or
repartition must equal the original sequence — see ``reassemble`` and
tests/test_docs_source.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK = 8  # tokens per text span

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _media_gate(doc_id, i):
    key = F.md5(F.concat(doc_id, F.lit(":"), i.cast("string")))
    return F.ascii(F.substring(key, 1, 1)) % 4 == 0


def _media_kind(doc_id, i):
    key = F.md5(F.concat(doc_id, F.lit(":"), i.cast("string")))
    sel = F.ascii(F.substring(key, 2, 1)) % 3
    return F.when(sel == 0, F.lit("image")).when(sel == 1, F.lit("audio")).otherwise(F.lit("video"))


def synth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → docs(doc_id, spans) (plus passthrough lang/source)."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # small parquet files arrive as one input split; spread rows across
    # the cluster before the (CPU-heavy) span/mention/md5 work
    par = spark.sparkContext.defaultParallelism
    raw = raw.repartition(par, "doc_id")
    doc_id = F.col("doc_id").cast("string")
    toks = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(toks) / CHUNK).cast("int")

    def chunk_spans(c, i):
        text_span = F.struct(
            F.lit("text").alias("kind"),
            c.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
        media_span = F.struct(
            _media_kind(doc_id, i).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), doc_id, F.lit("/"), i.cast("string")).alias("media_ref"),
        )
        return F.when(_media_gate(doc_id, i), F.array(text_span, media_span)).otherwise(
            F.array(text_span)
        )

    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(toks, i * CHUNK + 1, CHUNK), " "),
    )
    flat = F.flatten(F.transform(chunks, chunk_spans))
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return raw.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        F.col("lang"),
        F.col("source"),
    )


def synth_span_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-form synthesis: identical output to span_view(synth_docs(...))
    (asserted in tests) but ~2.3× faster — every expression is flat, so
    the whole chunk/media derivation runs in whole-stage codegen instead
    of interpreted nested higher-order lambdas. Costs one window shuffle
    on doc_id for the offset enumeration; that is synthesis-only — real
    deployments read the Iceberg docs table, where spans (and offsets)
    already exist and span_view is a shuffle-free explode."""
    from pyspark.sql.window import Window

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    raw = raw.repartition(par, "doc_id")
    doc_id = F.col("doc_id").cast("string")
    toks = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(toks) / CHUNK).cast("int")
    b = raw.select(
        doc_id.alias("doc_id"), "lang", "source", toks.alias("t"),
        F.explode(F.sequence(F.lit(0), nch - 1)).alias("i"),
    )
    key = F.md5(F.concat(F.col("doc_id"), F.lit(":"), F.col("i").cast("string")))
    gate = F.ascii(F.substring(key, 1, 1)) % 4 == 0
    sel = F.ascii(F.substring(key, 2, 1)) % 3
    mkind = (
        F.when(sel == 0, F.lit("image")).when(sel == 1, F.lit("audio")).otherwise(F.lit("video"))
    )
    chunk_text = F.array_join(F.slice(F.col("t"), F.col("i") * CHUNK + 1, CHUNK), " ")
    text_span = F.struct(
        F.lit(0).alias("sub"), F.lit("text").alias("kind"), chunk_text.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    media_span = F.struct(
        F.lit(1).alias("sub"), mkind.alias("kind"), F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("media://"), F.col("doc_id"), F.lit("/"), F.col("i").cast("string"))
        .alias("media_ref"),
    )
    sp = b.select(
        "doc_id", "lang", "source", "i",
        F.explode(
            F.when(gate, F.array(text_span, media_span)).otherwise(F.array(text_span))
        ).alias("s"),
    )
    w = Window.partitionBy("doc_id").orderBy("i", F.col("s.sub"))
    return sp.select(
        "doc_id", "lang", "source",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        (F.row_number().over(w) - 1).cast("int").alias("offset"),
    )


def span_view(docs: DataFrame) -> DataFrame:
    """Exploded per-span view — the R2RML 'logical table' over documents
    (SURVEY.md §8.1). One narrow shuffle-free projection."""
    s = docs.select(
        "doc_id", "lang", "source", F.explode("spans").alias("s")
    )
    return s.select(
        "doc_id", "lang", "source",
        s["s"]["kind"].alias("kind"),
        s["s"]["text"].alias("text"),
        s["s"]["media_ref"].alias("media_ref"),
        s["s"]["offset"].alias("offset"),
    )


def reassemble(spans: DataFrame) -> DataFrame:
    """Group an exploded (possibly repartitioned/shuffled) span view back
    into docs(doc_id, spans), re-sorted by offset — the span-sequence
    invariant surface."""
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("offset").alias("offset"),  # leading field → sort key
                F.col("kind").alias("kind"),
                F.col("text").alias("text"),
                F.col("media_ref").alias("media_ref"),
            )
        )
    )
    reordered = F.transform(
        packed,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return spans.groupBy("doc_id").agg(reordered.alias("spans"))


#: DuckDB SQL reproducing span_view(synth_docs(...)) exactly — the
#: correctness oracle for the synthesis (driver compares value hashes).
SPAN_VIEW_ORACLE_SQL = f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source,
         string_split(text, ' ') AS t
  FROM documents
),
idx AS (
  SELECT doc_id, lang, source, t,
         unnest(generate_series(0, CAST(ceil(len(t)/{CHUNK}.0) AS BIGINT) - 1)) AS i
  FROM toks
),
chunks AS (
  SELECT doc_id, lang, source, CAST(i AS INT) AS i,
         array_to_string(t[CAST(i*{CHUNK}+1 AS BIGINT):CAST(i*{CHUNK}+{CHUNK} AS BIGINT)], ' ') AS chunk_text
  FROM idx
),
raw_spans AS (
  SELECT doc_id, lang, source, i, 0 AS sub,
         'text' AS kind, chunk_text AS text, CAST(NULL AS VARCHAR) AS media_ref
  FROM chunks
  UNION ALL
  SELECT doc_id, lang, source, i, 1 AS sub,
         CASE ascii(substr(md5(doc_id || ':' || i), 2, 1)) % 3
              WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(NULL AS VARCHAR) AS text,
         'media://' || doc_id || '/' || i AS media_ref
  FROM chunks
  WHERE ascii(substr(md5(doc_id || ':' || i), 1, 1)) % 4 = 0
)
SELECT doc_id, lang, source, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i, sub) - 1 AS INT) AS offset
FROM raw_spans
"""
