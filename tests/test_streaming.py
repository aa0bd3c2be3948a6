"""Streaming ingestion: exactly-once triple emission across restarts,
and watermarked windowed aggregation over the events shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from r2rml_parser_spark.streaming.incremental import (
    stream_docs_to_triples,
    windowed_event_counts,
)


def test_stream_docs_to_triples_exactly_once(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame(
        [("d1", "en", "s1", "hello"), ("d2", "es", "s2", "hola")],
        "doc_id string, lang string, source string, text string",
    )
    batch1.write.mode("append").parquet(inp)

    q = stream_docs_to_triples(spark, inp, out, ckpt)
    q.awaitTermination(120)
    t1 = spark.read.parquet(out)
    assert t1.count() == 6  # 2 docs × (type + lang + source)

    # new file arrives; restart drains ONLY the new file (checkpoint)
    spark.createDataFrame(
        [("d3", "de", "s3", "hallo")],
        "doc_id string, lang string, source string, text string",
    ).write.mode("append").parquet(inp)
    q2 = stream_docs_to_triples(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    t2 = spark.read.parquet(out)
    assert t2.count() == 9
    assert t2.where(F.col("subj") == "http://kg.example/doc/d1").count() == 3  # no dup emit
    assert set(t2.select("source_map").distinct().toPandas()["source_map"]) == {"#DocMap"}


def test_windowed_event_counts_static(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(events, window="1 day", watermark="2 days")
    rows = out.collect()
    assert rows and all(r.n_events > 0 for r in rows)
    total = sum(r.n_events for r in rows)
    assert total == events.where(F.col("ts").isNotNull()).count()


def test_stream_dedup_docs_drops_in_horizon_duplicates(spark, tmp_path):
    from r2rml_parser_spark.streaming.incremental import stream_dedup_docs

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:00:00", "same text here"),
        (2, "2024-01-01 00:10:00", "same  TEXT  here"),  # dup after normalize
        (3, "2024-01-01 00:20:00", "different text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ts_s", "text"]).select(
        "doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text"
    )
    df.write.parquet(str(src / "batch0.parquet"))
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        str(src / "*.parquet")
    )
    q = (
        stream_dedup_docs(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    kept = sorted(r.doc_id for r in got.collect())
    # exactly one survivor per normalized text: {1 or 2} plus 3 (which of
    # the duplicate pair survives is engine-chosen)
    assert len(kept) == 2 and kept[1] == 3 and kept[0] in (1, 2)

    # static frame: same operator, batch semantics
    static = stream_dedup_docs(df)
    assert static.count() == 2


def test_streamed_kg_is_sparql_queryable(spark, tmp_path):
    """Composition: continuous construction → the accumulated triples
    relation answers the full r3 SPARQL surface (EXISTS, aggregates) —
    one engine for both arrival and query, the Kappa-style loop."""
    from r2rml_parser_spark.plans.sparql import sparql_ask, sparql_select

    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    spark.createDataFrame(
        [("d1", "en", "s1", "x"), ("d2", "es", "s1", "y"), ("d3", "en", "s2", "z")],
        "doc_id string, lang string, source string, text string",
    ).write.mode("append").parquet(inp)
    stream_docs_to_triples(spark, inp, out, ckpt).awaitTermination(120)
    kg = spark.read.parquet(out).select(
        "subj", "subj_kind", "pred", "obj", "obj_kind", "lang", "dtype"
    )
    q = """PREFIX ex: <http://kg.example/ontology#>
    SELECT ?l (COUNT(?d) AS ?n) WHERE {
      ?d a ex:Document . ?d ex:lang ?l .
      FILTER EXISTS { ?d ex:source ?s }
    } GROUP BY ?l ORDER BY ?l"""
    got = [(r.l, r.n) for r in sparql_select(kg, q).collect()]
    assert got == [("en", 2), ("es", 1)]
    assert sparql_ask(
        kg, 'PREFIX ex: <http://kg.example/ontology#> ASK { ?d ex:lang "en" }'
    )


def test_stream_sessionize_events_apply_in_pandas_with_state(spark, tmp_path):
    """Custom stateful operator: sessions close on in-batch gaps AND on
    event-time timeout (watermark passing last_event + gap), surviving
    restarts through the state checkpoint."""
    from r2rml_parser_spark.streaming.incremental import stream_sessionize_events

    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    schema = "user_id string, ts timestamp, event_id bigint"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        sess = stream_sessionize_events(stream, gap_seconds=1800, watermark="1 hour")
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", 1),
            ("u1", "2024-01-01 10:05:00", 2),
            ("u2", "2024-01-01 10:00:00", 3),
        ],
        "user_id string, ts string, event_id bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)
    run_once()

    # a 3h-later u1 event closes u1's first session IN BATCH
    spark.createDataFrame(
        [("u1", "2024-01-01 13:00:00", 4)],
        "user_id string, ts string, event_id bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)
    run_once()

    got = {
        (r.user_id, r.session_seq): r
        for r in spark.read.parquet(out).collect()
    }
    u1 = got[("u1", 1)]
    assert u1.n_events == 2
    assert u1.session_start == "2024-01-01 10:00:00"
    assert u1.session_end == "2024-01-01 10:05:00"
    assert u1.duration_us == 300 * 1_000_000

    # u2's single-event session closes by TIMEOUT once the watermark
    # (13:00 - 1h = 12:00) passes 10:00 + 30min; give the engine one
    # more restart in case the timer fires in the next no-data batch
    if ("u2", 1) not in got:
        spark.createDataFrame(
            [("u3", "2024-01-01 14:00:00", 5)],
            "user_id string, ts string, event_id bigint",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)
        run_once()
        got = {
            (r.user_id, r.session_seq): r
            for r in spark.read.parquet(out).collect()
        }
    u2 = got[("u2", 1)]
    assert u2.n_events == 1 and u2.duration_us == 0
    assert u2.session_start == "2024-01-01 10:00:00"
