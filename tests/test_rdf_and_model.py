"""Fast driver-side unit tests: Turtle/RDF-XML parsing, templates,
isomorphism, term rendering."""

from __future__ import annotations

import pytest

from r2rml_parser_spark.mapping.model import Template, strip_sql_quotes
from r2rml_parser_spark.mapping.parse import MappingError, parse_mapping_document
from r2rml_parser_spark.rdf.isomorphism import isomorphic, precision_recall
from r2rml_parser_spark.rdf.rdfxml import parse_rdfxml
from r2rml_parser_spark.rdf.terms import BNode, IRI, Literal
from r2rml_parser_spark.rdf.turtle import parse_ntriples, parse_turtle


def test_template_parse_fields_and_quotes():
    t = Template.parse('http://e/{"A B"}/x{C};{D}')
    assert t.fields == ("A B", "C", "D")
    assert t.parts == ("http://e/", "/x", ";", "")
    esc = Template.parse(r"lit\{notafield\}{real}")
    assert esc.fields == ("real",)
    assert esc.parts[0] == "lit{notafield}"


def test_strip_sql_quotes():
    assert strip_sql_quotes('"Name"') == "Name"
    assert strip_sql_quotes("Name") == "Name"
    assert strip_sql_quotes('"a"b"') == 'a"b'


def test_turtle_literals_and_bnodes():
    ttl = """
    @prefix ex: <http://e/> .
    ex:s ex:p "plain", "tagged"@en, "typed"^^ex:dt, 'single', '''long ' quote''' ;
         ex:q [ ex:r 42 ] .
    """
    triples, prefixes, base = parse_turtle(ttl)
    objs = {o.nt() for s, p, o in triples if p.value == "http://e/p"}
    assert '"plain"' in objs and '"tagged"@en' in objs
    assert '"typed"^^<http://e/dt>' in objs and '"single"' in objs
    assert "\"long ' quote\"" in objs
    ints = [o for s, p, o in triples if isinstance(o, Literal) and o.lexical == "42"]
    assert ints and ints[0].datatype.endswith("integer")


def test_ntriples_roundtrip_escapes():
    line = '<http://s> <http://p> "a\\"b\\nc" .'
    (t,) = parse_ntriples(line)
    assert t[2].lexical == 'a"b\nc'
    assert t[2].nt() == '"a\\"b\\nc"'


def test_rdfxml_basic():
    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/">
      <ex:Thing rdf:about="http://e/s">
        <ex:name xml:lang="en">hello</ex:name>
        <ex:ref rdf:resource="http://e/o"/>
        <ex:nested><rdf:Description><ex:x>1</ex:x></rdf:Description></ex:nested>
      </ex:Thing>
    </rdf:RDF>"""
    triples = parse_rdfxml(xml)
    rendered = {(s.nt() if not isinstance(s, BNode) else "_:b", p.nt(), o.nt() if not isinstance(o, BNode) else "_:b") for s, p, o in triples}
    assert ("<http://e/s>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://e/Thing>") in rendered
    assert ("<http://e/s>", "<http://e/name>", '"hello"@en') in rendered
    assert ("<http://e/s>", "<http://e/ref>", "<http://e/o>") in rendered
    assert ("_:b", "<http://e/x>", '"1"') in rendered


def test_isomorphism_blank_node_permutations():
    a = parse_ntriples('_:x <http://p> _:y .\n_:y <http://p> "leaf" .')
    b = parse_ntriples('_:q <http://p> _:r .\n_:r <http://p> "leaf" .')
    c = parse_ntriples('_:q <http://p> _:r .\n_:q <http://p> "leaf" .')
    assert isomorphic(a, b)
    assert not isomorphic(a, c)
    p, r = precision_recall(a, b)
    assert p == 1.0 and r == 1.0


def test_mapping_errors():
    bad = """@prefix rr: <http://www.w3.org/ns/r2rml#> .
    <#m> rr:logicalTable [ rr:tableName "t" ];
      rr:subjectMap [ rr:template "x{a}" ];
      rr:predicateObjectMap [ rr:predicate <http://p>;
        rr:objectMap [ rr:column "c"; rr:language "notalang!" ] ] ."""
    with pytest.raises(MappingError, match="language"):
        parse_mapping_document(bad)


def test_iri_and_literal_rendering():
    assert IRI("http://x").nt() == "<http://x>"
    assert BNode("b1").nt() == "_:b1"
    assert Literal("a", lang="en").nt() == '"a"@en'
    assert Literal("1", datatype="http://dt").nt() == '"1"^^<http://dt>'
