"""Turtle/N3 dump sink (S6: ``jena.destinationFileSyntax`` TURTLE/TTL/N3).

The reference writes its Jena model in the configured syntax
(``Generator.java:572-659``; ``r2rml.properties`` names RDF/XML,
RDF/XML-ABBREV, N-TRIPLE, TURTLE (TTL), N3 as valid syntaxes) — this
closes the last dump format the engine lacked. One sink serves
TURTLE/TTL/N3: every Turtle document is valid N3.

Spark-first shape: per-triple term rendering is whole-stage-codegen
concat (the N-Triples renderers are reused verbatim for subjects and
objects); subject blocks fold with TWO groupBys — objects of one
(subject, predicate) join with ``,``, predicates of one subject join
with ``;`` — both map-side-partial collects over mapping-bounded
group sizes. Predicate QNames come from the same mapping-sized prefix
table as the RDF/XML sink, so the two dumps agree on prefixes.
Determinism: object and predicate lists are codepoint-sorted in the
fold, blocks globally sorted (or range-partitioned for part files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.sinks.ntriples import obj_term, subj_term
from r2rml_parser_spark.sinks.rdfxml import _build_tables

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PREFIX_FILE = "_00_prefixes.ttl"


def _pn_local_ok(local: str) -> bool:
    """Is an NCName local part also a valid Turtle PN_LOCAL? NCName is
    almost a subset, except a trailing '.' (valid XML, invalid Turtle —
    PN_LOCAL may contain dots only in the middle, ADVICE r3)."""
    return not local.endswith(".")


def turtle_tables(
    triples: DataFrame,
) -> tuple[dict[str, str], dict[str, str], dict[str, str]]:
    """(prefix→namespace, predicate→QName, class-IRI→QName), derived
    from the distinct predicates and rdf:type objects — mapping-sized,
    never corpus-sized (same tables as the RDF/XML-ABBREV sink, so the
    dumps agree on prefixes). Unlike RDF/XML — where a property element
    NEEDS a QName and an unsplittable predicate is fatal — Turtle can
    always write the full ``<iri>`` form, so predicates whose IRI has
    no QName-safe local part (ends in '/', '#', all-digit local,
    trailing-dot local) are simply skipped here and the block renderer
    coalesces to ``<iri>`` (ADVICE r3); locals are validated against
    Turtle PN_LOCAL rules, not just NCName."""
    return _build_tables(
        triples, include_classes=True, pred_fallback=True, local_ok=_pn_local_ok
    )


def turtle_blocks(
    triples: DataFrame, qnames: dict[str, str], sort: bool = True,
    class_qnames: dict[str, str] | None = None, chunk_size: int = 10_000,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Triples → one-column DF of per-subject Turtle blocks, chunked at
    ``chunk_size`` objects per (subject, predicate) and predicate lines
    per subject — a hot subject emits continuation blocks (valid
    Turtle, same graph) instead of one unbounded collect_list row
    (VERDICT r3 #4).

    ``extra_keys`` (r5, the TriG sink): additional grouping columns —
    e.g. the quad ``graph`` column — threaded through both folds and
    RETAINED on the output next to ``value``, so the caller can wrap
    each block per key (subjects shared across graphs stay separate
    blocks)."""
    if qnames:
        qmap = F.create_map(*[F.lit(x) for kv in qnames.items() for x in kv])
        pred_abbrev = qmap[F.col("pred")]
    else:
        pred_abbrev = F.lit(None).cast("string")
    pred_txt = F.when(F.col("pred") == RDF_TYPE, F.lit("a")).otherwise(
        F.coalesce(pred_abbrev, F.concat(F.lit("<"), F.col("pred"), F.lit(">")))
    )
    obj_txt = obj_term(triples)
    if class_qnames:
        cmap = F.create_map(*[F.lit(x) for kv in class_qnames.items() for x in kv])
        obj_txt = F.when(
            (F.col("pred") == RDF_TYPE)
            & (F.col("obj_kind") == "iri")
            & cmap[F.col("obj")].isNotNull(),
            cmap[F.col("obj")],
        ).otherwise(obj_txt)
    from r2rml_parser_spark.sinks.rdfxml import _fold_buckets

    ek = list(extra_keys or [])
    po = triples.select(
        *ek,
        subj_term(triples).alias("s"),
        pred_txt.alias("p"),
        obj_txt.alias("o"),
    )
    by_pred = (
        _fold_buckets(po, [*ek, "s", "p"], "o", chunk_size)
        .groupBy(*ek, "s", "p", "_b")
        .agg(F.array_join(F.sort_array(F.collect_list("o")), ", ").alias("objs"))
    )
    # the object-level chunk key flows into the subject fold: each
    # object chunk is its own continuation block (otherwise the subject
    # fold would re-merge all chunks into one unbounded row); a second
    # bucket level bounds subjects hot in predicate-LINE count too
    lines = by_pred.select(
        *ek, "s", F.col("_b").alias("_bo"),
        F.concat(F.col("p"), F.lit(" "), F.col("objs")).alias("po"),
    )
    by_subj = (
        _fold_buckets(lines, [*ek, "s", "_bo"], "po", chunk_size)
        .groupBy(*ek, "s", "_bo", "_b")
        .agg(
            F.array_join(F.sort_array(F.collect_list("po")), " ;\n    ").alias("body")
        )
    )
    blocks = by_subj.select(
        *ek,
        F.concat(F.col("s"), F.lit(" "), F.col("body"), F.lit(" .")).alias("value"),
    )
    return blocks.sort(*ek, "value") if sort else blocks


def prefix_header(prefixes: dict[str, str]) -> str:
    return "\n".join(
        f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())
    )


def dump_string(triples: DataFrame) -> str:
    """Driver-side Turtle dump for tests / small graphs."""
    prefixes, qnames, class_qnames = turtle_tables(triples)
    body = "\n\n".join(
        r.value
        for r in turtle_blocks(triples, qnames, class_qnames=class_qnames).collect()
    )
    head = prefix_header(prefixes)
    return f"{head}\n\n{body}\n" if head else body + "\n"


def write_turtle_parts(
    triples: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Cluster-scale Turtle dump: sorted part FILES of subject blocks
    plus a driver-written prefix sidecar (mapping-sized); the document
    is the files concatenated in filename order — the leading
    underscore keeps Spark text readers off the sidecar and sorts it
    first, the ``write_rdfxml_parts`` pattern."""
    prefixes, qnames, class_qnames = turtle_tables(triples)
    blocks = turtle_blocks(triples, qnames, sort=False, class_qnames=class_qnames)
    if partitions:
        blocks = blocks.repartitionByRange(partitions, "value").sortWithinPartitions(
            "value"
        )
    else:
        blocks = blocks.sort("value")
    blocks.write.mode("overwrite").text(path)
    with open(os.path.join(path, PREFIX_FILE), "w", encoding="utf-8") as f:
        head = prefix_header(prefixes)
        f.write(head + "\n\n" if head else "")


def assemble_turtle_parts(path: str) -> str:
    """Concatenate a parts directory back into one Turtle document
    (test-scale convenience; at cluster scale use ``cat`` or a
    composite reader in filename order)."""
    names = [PREFIX_FILE] + sorted(
        n for n in os.listdir(path) if n.startswith("part-") and n.endswith(".txt")
    )
    chunks = []
    for n in names:
        p = os.path.join(path, n)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                chunks.append(f.read())
    return "".join(chunks)
