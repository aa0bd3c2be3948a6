"""TriG dump sink (W3C TriG 1.1, r5) — the dataset twin of the Turtle
sink, completing the quad serialization pair next to N-Quads.

Reuses the Turtle machinery wholesale: prefix/QName tables from the
shared ``turtle_tables`` (so Turtle, RDF/XML, and TriG dumps agree on
prefixes), per-subject blocks from ``turtle_blocks`` with the quad
``graph`` column threaded through the folds as an extra key. Named
blocks render as ``<graph-iri> { block }`` — TriG permits repeated
graph labels (the dataset is the union of their contents, exactly like
repeated Turtle subjects), which is what makes the per-subject block
shape distributable: no graph's content ever has to assemble on one
executor. Default-graph quads render as top-level Turtle statements.

The reference has no quad serialization (rr:graphMap is a log-only
stub, Parser.java:241-270).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.sinks.turtle import (
    PREFIX_FILE,
    prefix_header,
    turtle_blocks,
    turtle_tables,
)

GRAPH_COLUMN = "graph"


def trig_lines(quads: DataFrame, sort: bool = True) -> DataFrame:
    """Quads → one-column DF of TriG statements: plain Turtle blocks
    for the default graph, ``<g> { block }`` wrapped blocks for named
    graphs. Deterministic under ``sort``."""
    prefixes, qnames, class_qnames = turtle_tables(
        quads.drop(GRAPH_COLUMN)
    )
    default = quads.where(F.col(GRAPH_COLUMN).isNull()).drop(GRAPH_COLUMN)
    named = quads.where(F.col(GRAPH_COLUMN).isNotNull())
    dblocks = turtle_blocks(
        default, qnames, sort=False, class_qnames=class_qnames
    )
    nblocks = turtle_blocks(
        named, qnames, sort=False, class_qnames=class_qnames,
        extra_keys=[GRAPH_COLUMN],
    ).select(
        F.concat(
            F.lit("<"), F.col(GRAPH_COLUMN), F.lit("> {\n"),
            F.col("value"), F.lit("\n}"),
        ).alias("value")
    )
    lines = dblocks.unionByName(nblocks)
    return lines.sort("value") if sort else lines


def dump_string(quads: DataFrame) -> str:
    """Driver-side TriG dump for tests / small datasets."""
    prefixes, _qnames, _c = turtle_tables(quads.drop(GRAPH_COLUMN))
    body = "\n\n".join(r.value for r in trig_lines(quads).collect())
    head = prefix_header(prefixes)
    return f"{head}\n\n{body}\n" if head else body + "\n"


def write_trig_parts(
    quads: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Cluster-scale TriG dump: sorted part files of statements plus a
    driver-written prefix sidecar — the ``write_turtle_parts``
    pattern; the document is the files concatenated in filename
    order."""
    prefixes, _qnames, _c = turtle_tables(quads.drop(GRAPH_COLUMN))
    lines = trig_lines(quads, sort=False)
    if partitions:
        lines = lines.repartitionByRange(partitions, "value").sortWithinPartitions(
            "value"
        )
    else:
        lines = lines.sort("value")
    lines.write.mode("overwrite").text(path)
    with open(os.path.join(path, PREFIX_FILE), "w", encoding="utf-8") as f:
        head = prefix_header(prefixes)
        f.write(head + "\n\n" if head else "")
