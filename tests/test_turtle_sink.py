"""Turtle/N3 dump sink: round-trip parity with the N-Triples dump.

Reference behavior: jena.destinationFileSyntax accepts TURTLE/TTL/N3
(r2rml.properties syntax list; Generator.java:572-659 writes the model
in that syntax via Jena). Contract: dumping Turtle and parsing it back
with the repo's own Turtle parser yields a graph isomorphic to the
N-Triples dump of the same triples DataFrame.
"""

from __future__ import annotations

from r2rml_parser_spark.rdf.isomorphism import isomorphic
from r2rml_parser_spark.rdf.turtle import parse_ntriples, parse_turtle
from r2rml_parser_spark.sinks.ntriples import dump_string as nt_dump
from r2rml_parser_spark.sinks.turtle import (
    assemble_turtle_parts,
    dump_string,
    write_turtle_parts,
)

COLS = "subj subj_kind pred obj obj_kind lang dtype".split()


def _df(spark, rows):
    return spark.createDataFrame(rows, ", ".join(f"{c} string" for c in COLS))


def test_turtle_roundtrip_all_term_shapes(spark):
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        ("http://x/a", "iri", "http://p/name", 'Ada "quoted"\nline', "literal", None, None),
        ("http://x/a", "iri", "http://p/name", "日本語", "literal", "ja", None),
        ("http://x/a", "iri", "http://p/age", "30", "literal", None, xsd + "integer"),
        ("http://x/a", "iri", "http://p/ref", "http://x/b?q=1", "iri", None, None),
        ("http://x/a", "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://p/Thing", "iri", None, None),
        ("b0", "bnode", "http://p/name", "anon", "literal", None, None),
        ("http://x/a", "iri", "http://p/link", "b0", "bnode", None, None),
    ]
    triples = _df(spark, rows)
    ttl = dump_string(triples)
    got, _prefixes, _base = parse_turtle(ttl)
    want = parse_ntriples(nt_dump(triples))
    assert len(got) == len(rows)
    assert isomorphic(got, want)
    # subject grouping actually happened: one block for http://x/a
    assert ttl.count("<http://x/a> ") == 1
    # predicates are abbreviated through the shared prefix table and
    # rdf:type renders as 'a'
    assert " a " in ttl and "@prefix" in ttl


def test_turtle_dump_is_deterministic(spark):
    rows = [
        (f"http://x/{i}", "iri", "http://p/v", str(i % 7), "literal", None, None)
        for i in range(20)
    ]
    a = dump_string(_df(spark, rows))
    b = dump_string(_df(spark, list(reversed(rows))).repartition(5))
    assert a == b


def test_turtle_parts_assemble_isomorphic(spark, tmp_path):
    rows = [
        (f"http://x/s{i % 4}", "iri", f"http://p/p{i % 3}", f"v{i}", "literal", None, None)
        for i in range(12)
    ]
    triples = _df(spark, rows)
    out = str(tmp_path / "ttl")
    write_turtle_parts(triples, out, partitions=3)
    doc = assemble_turtle_parts(out)
    got, _p, _b = parse_turtle(doc)
    want = parse_ntriples(nt_dump(triples))
    assert isomorphic(got, want)
