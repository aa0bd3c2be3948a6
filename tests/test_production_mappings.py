"""Run the reference's PRODUCTION mapping documents (DSpace, N3 with
single-quoted strings; 38-42 triples maps) through the engine — the
'a user of the reference could switch' test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from r2rml_parser_spark.mapping.parse import parse_mapping_document
from r2rml_parser_spark.plans.engine import MappingEngine
from r2rml_parser_spark.sources.dspace_fixture import eperson_tables

EPERSONS = "/root/reference/dspace/epersons-mapping.rdf"

needs_ref = pytest.mark.skipif(not os.path.exists(EPERSONS), reason="reference not present")


@needs_ref
def test_epersons_mapping_end_to_end(spark):
    sources = eperson_tables(spark, n_persons=200, n_groups=10, memberships_per_person=2)
    doc = parse_mapping_document(open(EPERSONS).read())
    assert len(doc.triples_maps) == 3
    engine = MappingEngine(spark, doc, sources=sources)
    engine.register_sources()
    triples = engine.triples(lineage=True)

    by_pred = {r["pred"]: r["count"] for r in triples.groupBy("pred").count().collect()}
    FOAF = "http://xmlns.com/foaf/0.1/"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert by_pred[FOAF + "member"] <= 400  # dedup may collapse repeats
    assert by_pred[FOAF + "member"] > 300
    assert by_pred[FOAF + "name"] == 210  # 200 persons + 10 groups
    assert by_pred[RDF_TYPE] == 210

    person_name = triples.where(
        (F.col("pred") == FOAF + "name")
        & F.col("subj").contains("/person/")
    ).limit(1).collect()[0]
    assert person_name["obj_kind"] == "literal"
    assert person_name["obj"].startswith("First") and " Last" in person_name["obj"]

    member = triples.where(F.col("pred") == FOAF + "member").limit(1).collect()[0]
    assert member["obj_kind"] == "iri"
    assert member["subj"].startswith("http://data.example.org/repository/group/")
    assert member["obj"].startswith("http://data.example.org/repository/person/")

    # lineage column names the producing triples map
    lin = {r["source_map"] for r in triples.select("source_map").distinct().collect()}
    assert {"#groups", "#persons", "#persons-groups"} <= {x.split("/")[-1] for x in lin} or len(lin) == 3


@needs_ref
@pytest.mark.parametrize("path", [
    "/root/reference/dspace/dspace-mapping.rdf",
    "/root/reference/dspace/dspace-edm-mapping.rdf",
    "/root/reference/dspace5/dspace-mapping.rdf",
    "/root/reference/iswc/iswc-mapping_test.rdf",
])
def test_production_mappings_parse_and_compile_templates(path):
    doc = parse_mapping_document(open(path).read())
    assert doc.triples_maps
    # every subject map carries a template/column/constant; template
    # fields extracted and quote-stripped
    for tm in doc.triples_maps:
        sm = tm.subject_map
        assert sm.template or sm.column or sm.constant_iri
        if sm.template:
            assert "{" not in "".join(sm.template.parts)
    doc.topo_sorted()
