"""Deterministic N-Triples serialization (S6/A2).

The reference serializes the whole Jena model through a single-threaded
writer with ORDER BY injected into source queries for determinism
(Generator.java:623-699, Parser.java:600-616). Here the rendered line is
ONE Catalyst expression; determinism comes from a global sort. At test
scale the sorted dump collapses to one file; at cluster scale
``write_sorted`` uses ranged partitions (repartitionByRange +
sortWithinPartitions) so files are globally ordered without a
single-reducer bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.plans.compile import TRIPLE_COLUMNS


def _escape(col: Column) -> Column:
    """N-Triples literal escaping (terms.py:escape_literal, columnar)."""
    for pat, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        col = F.replace(col, F.lit(pat), F.lit(rep))
    return col


def subj_term(df: DataFrame) -> Column:
    """Rendered N-Triples subject term (<iri> or _:label)."""
    return F.when(df["subj_kind"] == "bnode", F.concat(F.lit("_:"), df["subj"])).otherwise(
        F.concat(F.lit("<"), df["subj"], F.lit(">"))
    )


def obj_term(df: DataFrame) -> Column:
    """Rendered N-Triples object term (IRI / bnode / literal)."""
    lit_body = F.concat(F.lit('"'), _escape(df["obj"]), F.lit('"'))
    return (
        F.when(df["obj_kind"] == "iri", F.concat(F.lit("<"), df["obj"], F.lit(">")))
        .when(df["obj_kind"] == "bnode", F.concat(F.lit("_:"), df["obj"]))
        .when(df["lang"].isNotNull(), F.concat(lit_body, F.lit("@"), df["lang"]))
        .when(df["dtype"].isNotNull(), F.concat(lit_body, F.lit("^^<"), df["dtype"], F.lit(">")))
        .otherwise(lit_body)
    )


def nt_line(df: DataFrame) -> Column:
    """Render one N-Triples line from the 7 term columns."""
    pred = F.concat(F.lit("<"), df["pred"], F.lit(">"))
    return F.concat(subj_term(df), F.lit(" "), pred, F.lit(" "), obj_term(df), F.lit(" ."))


def to_nt_lines(triples: DataFrame) -> DataFrame:
    """Triples DF → single-column DF of rendered, globally sorted lines."""
    return (
        triples.select(nt_line(triples).alias("value"))
        .sort("value")
    )


def dump_string(triples: DataFrame) -> str:
    """Driver-side dump for tests / small graphs."""
    return "\n".join(r.value for r in to_nt_lines(triples).collect())


def write_sorted(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Cluster-scale deterministic dump: range-partition on the rendered
    line, sort within partitions → globally ordered part files."""
    lines = triples.select(nt_line(triples).alias("value"))
    if partitions:
        lines = lines.repartitionByRange(partitions, "value").sortWithinPartitions("value")
    else:
        lines = lines.sort("value")
    lines.write.mode("overwrite").text(path)
