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


def stream_sessionize_events(
    events: DataFrame, *, gap_seconds: int = 1800, watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based event-time
    sessionization via ``applyInPandasWithState`` — the streaming twin
    of ``operators.events.sessionize`` (same output schema: user_id,
    session_seq, n_events, session_start, session_end, duration_us;
    same TS_FMT second-precision rendering).

    Semantics: per user, events within ``gap_seconds`` of the running
    session's last event extend it; a larger gap closes it and starts
    the next (session_seq increments per closed session, carried in
    state so it survives micro-batch boundaries). A session is EMITTED
    when (a) a later in-batch event closes it, or (b) the event-time
    watermark passes last_event + gap (EventTimeTimeout) — so output is
    append-mode final, never updated. State per user is one fixed-width
    row (seq, start_us, last_us, n), evicted on timeout; memory is
    O(active users in the horizon), not O(events) — the property that
    makes this runnable against an unbounded 10^12-event stream.
    Arrow-batched pandas on the state path, no per-row Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000
    out_schema = (
        "user_id string, session_seq bigint, n_events bigint, "
        "session_start string, session_end string, duration_us bigint"
    )
    state_schema = "seq bigint, start_us bigint, last_us bigint, n bigint"

    def _emit(user_id, seq, start_us, last_us, n) -> "pd.DataFrame":
        fmt = "%Y-%m-%d %H:%M:%S"
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_seq": [seq],
                "n_events": [n],
                "session_start": [
                    pd.Timestamp(start_us, unit="us").strftime(fmt)
                ],
                "session_end": [pd.Timestamp(last_us, unit="us").strftime(fmt)],
                "duration_us": [last_us - start_us],
            }
        )

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        closed = []
        if state.hasTimedOut:
            seq, start_us, last_us, n = state.get
            closed.append(_emit(user_id, seq, start_us, last_us, n))
            state.remove()
        else:
            parts = [p for p in pdfs if len(p)]
            seq, start_us, last_us, n = (
                state.get if state.exists else (0, None, None, 0)
            )
            if parts:
                rows = pd.concat(parts).sort_values("ts")
                # ns-resolution pandas timestamps → epoch microseconds
                ts_us = (
                    pd.to_datetime(rows["ts"]).astype("int64") // 1_000
                ).tolist()
                for t in ts_us:
                    if start_us is None:
                        seq, start_us, last_us, n = seq + 1, t, t, 1
                    elif t - last_us <= gap_us:
                        last_us, n = max(last_us, t), n + 1
                    else:
                        closed.append(_emit(user_id, seq, start_us, last_us, n))
                        seq, start_us, last_us, n = seq + 1, t, t, 1
            if start_us is not None:
                state.update((seq, start_us, last_us, n))
                # fire once the watermark passes last event + gap; the
                # timeout must sit above the current watermark
                state.setTimeoutTimestamp(
                    max(last_us // 1_000 + gap_ms,
                        state.getCurrentWatermarkMs() + 1)
                )
        yield from closed or [
            pd.DataFrame(
                columns=[
                    "user_id", "session_seq", "n_events",
                    "session_start", "session_end", "duration_us",
                ]
            )
        ]

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
