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
