"""Structured-Streaming ingestion: continuous KG construction.

The reference is strictly batch (SURVEY.md §3.7); this is the
Spark-native generalization of its incremental mode: newly arriving
document files become triples continuously, exactly-once per micro-batch
via the streaming checkpoint + idempotent batch-id output directories.

* ``stream_docs_to_triples`` — file-source stream over a docs directory
  → foreachBatch runs the SAME MappingEngine used in batch mode (one
  code path for both, the Kappa-style setup) and appends triples.
* ``windowed_event_counts`` — watermark + tumbling-window aggregation
  over the events table shape (late data handled by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from r2rml_parser_spark.mapping.parse import parse_mapping_document
from r2rml_parser_spark.plans.engine import MappingEngine

STREAM_MAPPING_TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://kg.example/ontology#> .
<#DocMap> rr:logicalTable [ rr:tableName "stream_docs" ];
  rr:subjectMap [ rr:template "http://kg.example/doc/{doc_id}"; rr:class ex:Document ];
  rr:predicateObjectMap [ rr:predicate ex:lang;   rr:objectMap [ rr:column "lang" ] ];
  rr:predicateObjectMap [ rr:predicate ex:source; rr:objectMap [ rr:column "source" ] ] .
"""


def stream_docs_to_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Stream document parquet files → triples parquet appends.

    Returns the StreamingQuery; with ``available_now`` the query drains
    everything currently present and stops (test/batch-catchup mode)."""
    schema = "doc_id string, lang string, source string, text string"
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def emit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        doc = parse_mapping_document(STREAM_MAPPING_TTL)
        engine = MappingEngine(spark, doc, sources={"stream_docs": batch_df})
        triples = engine.triples(lineage=True).withColumn("batch_id", F.lit(batch_id))
        triples.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(emit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type event counts with late-data watermark.
    Works on both static and streaming DataFrames (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def stream_dedup_docs(
    docs: DataFrame, *, watermark: str = "1 hour", ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Stateful streaming exact-dedup: keep exactly one arrival of each
    normalized-text hash within the watermark horizon, dropping the rest
    (which row survives is engine-chosen, per
    ``dropDuplicatesWithinWatermark`` semantics); state is evicted past
    the horizon, bounding memory — the streaming analogue of
    operators.dedup.exact_dedup's batch groupBy.

    Works on both streaming and static frames (same plan); on a stream
    it uses ``dropDuplicatesWithinWatermark`` so two duplicates that
    arrive within the horizon dedup exactly, and state never grows
    unboundedly at 10^12-doc scale."""
    from r2rml_parser_spark.operators.dedup import normalized_text

    keyed = docs.withColumn("text_hash", F.md5(normalized_text(F.col(text_col))))
    wm = keyed.withWatermark(ts_col, watermark)
    if docs.isStreaming:
        return wm.dropDuplicatesWithinWatermark(["text_hash"])
    return wm.dropDuplicates(["text_hash"])
