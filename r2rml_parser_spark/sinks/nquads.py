"""Deterministic N-Quads serialization (W3C N-Quads, r5).

Completes the named-graph pipeline end-to-end: ``MappingEngine.quads()``
/ ``lineage_quads()`` → GRAPH-aware SPARQL → this sink. Same design as
the N-Triples sink (``sinks/ntriples.py`` — ONE Catalyst expression per
line, global sort for determinism, ranged partitions at cluster scale);
the only delta is the optional fourth position: a default-graph quad
(NULL ``graph``) renders as a plain triple line, exactly the N-Quads
grammar's optional-graph-label production, so a quads dump of an
all-default dataset is byte-identical to the N-Triples dump.

The reference has no quad serialization at all (its rr:graphMap
parsing is a log-only stub, Parser.java:241-270).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.sinks.ntriples import obj_term, subj_term


def nq_line(df: DataFrame) -> Column:
    """Render one N-Quads line from the 8 quad columns (7 + graph)."""
    pred = F.concat(F.lit("<"), df["pred"], F.lit(">"))
    graph = F.when(
        df["graph"].isNotNull(),
        F.concat(F.lit(" <"), df["graph"], F.lit(">")),
    ).otherwise(F.lit(""))
    return F.concat(
        subj_term(df), F.lit(" "), pred, F.lit(" "), obj_term(df),
        graph, F.lit(" ."),
    )


def to_nq_lines(quads: DataFrame) -> DataFrame:
    """Quads DF → single-column DF of rendered, globally sorted lines."""
    return quads.select(nq_line(quads).alias("value")).sort("value")


def dump_string(quads: DataFrame) -> str:
    """Driver-side dump for tests / small graphs."""
    return "\n".join(r.value for r in to_nq_lines(quads).collect())


def write_sorted(quads: DataFrame, path: str, partitions: int | None = None) -> None:
    """Cluster-scale deterministic dump: range-partition on the rendered
    line, sort within partitions → globally ordered part files."""
    lines = quads.select(nq_line(quads).alias("value"))
    if partitions:
        lines = lines.repartitionByRange(partitions, "value").sortWithinPartitions("value")
    else:
        lines = lines.sort("value")
    lines.write.mode("overwrite").text(path)
