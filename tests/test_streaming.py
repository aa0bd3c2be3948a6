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
