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


def test_turtle_unsplittable_predicate_falls_back_to_full_iri(spark):
    # predicates with no QName-safe local part (trailing '/', all-digit
    # local, trailing-dot local) must render as <full-iri>, not crash
    # with an RDF/XML split error (ADVICE r3)
    rows = [
        ("http://x/a", "iri", "http://p/path/", "v1", "literal", None, None),
        ("http://x/a", "iri", "http://p/p/123", "v2", "literal", None, None),
        ("http://x/a", "iri", "http://p/dot.", "v3", "literal", None, None),
        ("http://x/a", "iri", "http://p/fine", "v4", "literal", None, None),
    ]
    triples = _df(spark, rows)
    ttl = dump_string(triples)
    got, _p, _b = parse_turtle(ttl)
    assert isomorphic(got, parse_ntriples(nt_dump(triples)))
    assert "<http://p/path/>" in ttl and "<http://p/p/123>" in ttl
    assert "<http://p/dot.>" in ttl  # NCName-valid but PN_LOCAL-invalid
    assert ":fine" in ttl  # splittable predicates still abbreviate


def test_turtle_hot_subject_chunked_fold(spark, tmp_path):
    # one subject with many objects for one predicate: the fold must
    # chunk into continuation blocks (bounded rows), and the assembled
    # document must re-parse to the identical graph (VERDICT r3 #4)
    rows = [
        ("http://x/hot", "iri", "http://p/v", f"o{i:05d}", "literal", None, None)
        for i in range(1000)
    ] + [("http://x/cold", "iri", "http://p/v", "one", "literal", None, None)]
    triples = _df(spark, rows)
    from r2rml_parser_spark.sinks.rdfxml import _build_tables

    prefixes, qnames, cq = _build_tables(
        triples, include_classes=True, pred_fallback=True
    )
    from r2rml_parser_spark.sinks import turtle as T

    blocks = T.turtle_blocks(triples, qnames, class_qnames=cq, chunk_size=100)
    vals = [r.value for r in blocks.collect()]
    hot_blocks = [v for v in vals if v.startswith("<http://x/hot>")]
    assert len(hot_blocks) >= 10  # ~1000/100 continuation blocks
    assert all(v.count(",") < 250 for v in hot_blocks)  # bounded rows
    doc = T.prefix_header(prefixes) + "\n\n" + "\n\n".join(vals) + "\n"
    got, _p, _b = parse_turtle(doc)
    assert isomorphic(got, parse_ntriples(nt_dump(triples)))
    # write_turtle_parts end-to-end with the default chunk size
    out = str(tmp_path / "hot_parts")
    write_turtle_parts(triples, out, partitions=3)
    got2, _p2, _b2 = parse_turtle(assemble_turtle_parts(out))
    assert isomorphic(got2, parse_ntriples(nt_dump(triples)))


def test_turtle_small_groups_byte_identical_to_unchunked(spark):
    # groups under chunk_size land in bucket 0: output identical to the
    # pre-chunking fold (r3 dumps stay byte-stable)
    rows = [
        (f"http://x/{i}", "iri", "http://p/v", f"val{j}", "literal", None, None)
        for i in range(5) for j in range(4)
    ]
    triples = _df(spark, rows)
    ttl = dump_string(triples)
    assert ttl.count("<http://x/0>") == 1  # one block per subject
    assert ttl.count("val0") == 5
