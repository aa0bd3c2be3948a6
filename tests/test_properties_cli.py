"""End-to-end tests for the r2rml.properties runner — the reference's
``-p r2rml.properties`` entry point (Main.java:34-73) driving the Spark
engine over parquet sources."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r2rml_parser_spark.properties_cli import (  # noqa: E402
    load_properties,
    run_properties,
    triples_df_from_rdf,
)

MAPPING_TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.com/> .
<#Nation> a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "nation" ] ;
  rr:subjectMap [ rr:template "http://example.com/nation/{n_nationkey}" ; rr:class ex:Nation ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rr:column "n_name" ] ] .
"""

INPUT_NT = '<http://example.com/base> <http://example.com/note> "seed" .\n'


def test_load_properties_java_syntax():
    props = load_properties(
        "# comment\n! bang comment\nmapping.file=m.ttl\n"
        "default.namespace: http://x/\nlong.key=a\\\nb\n"
    )
    assert props["mapping.file"] == "m.ttl"
    assert props["default.namespace"] == "http://x/"
    assert props["long.key"] == "ab"


def test_properties_run_end_to_end(spark, tmp_path):
    # lay out a reference-style working dir: mapping, input model, tables
    (tmp_path / "mapping.ttl").write_text(MAPPING_TTL)
    (tmp_path / "input.nt").write_text(INPUT_NT)
    tables = tmp_path / "tables"
    tables.mkdir()
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src.write.parquet(str(tables / "nation.parquet"))

    props = load_properties(
        "mapping.file=mapping.ttl\n"
        "mapping.file.type=TURTLE\n"
        "default.namespace=http://example.com/base#\n"
        "input.model=input.nt\n"
        "input.model.type=N-TRIPLE\n"
        "spark.tables.dir=tables\n"
        "jena.destinationFileName=dump.nt\n"
        "jena.destinationFileSyntax=N-TRIPLE\n"
        "default.log=status\n"
    )
    summary = run_properties(spark, props, base_dir=str(tmp_path))
    n_nations = src.count()
    # class triple + name triple per nation + 1 input-model triple
    assert summary["triples"] == 2 * n_nations + 1
    assert summary["dump"] == "dump.nt"

    # sorted single-file dump contains the input-model triple and IRIs
    part = next(
        f for f in os.listdir(tmp_path / "dump.nt") if f.startswith("part-")
    )
    lines = (tmp_path / "dump.nt" / part).read_text().splitlines()
    assert len(lines) == summary["triples"]
    assert lines == sorted(lines)
    assert '<http://example.com/base> <http://example.com/note> "seed" .' in lines
    assert any("/nation/0>" in ln for ln in lines)

    status = json.loads((tmp_path / "status.json").read_text())
    assert status["triples"] == summary["triples"]


def test_properties_incremental_store_run(spark, tmp_path):
    (tmp_path / "mapping.ttl").write_text(MAPPING_TTL)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").write.parquet(
        str(tables / "nation.parquet")
    )
    text = (
        "mapping.file=mapping.ttl\n"
        "spark.tables.dir=tables\n"
        "default.incremental=true\n"
        "jena.storeOutputModelUsingTdb=true\n"
        "jena.cleanTdbOnStartup=false\n"
        "jena.tdb.directory=store\n"
    )
    first = run_properties(spark, load_properties(text), base_dir=str(tmp_path))
    second = run_properties(spark, load_properties(text), base_dir=str(tmp_path))
    assert first["triples"] == second["triples"]
    # second run skips the unchanged mapping (the incremental hash check)
    assert first["incremental"]["generated"] and not first["incremental"]["skipped"]
    assert second["incremental"]["skipped"] and not second["incremental"]["generated"]


def test_reference_shipped_epersons_mapping_via_properties(spark, tmp_path):
    """The literal switch story: the reference's own RDF/XML production
    mapping (dspace/epersons-mapping.rdf) + a reference-style properties
    file, parquet tables standing in for the Postgres db.* source."""
    import pytest

    ref = "/root/reference/dspace/epersons-mapping.rdf"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not present")
    from r2rml_parser_spark.sources.dspace_fixture import eperson_tables

    tables = tmp_path / "tables"
    tables.mkdir()
    for name, df in eperson_tables(
        spark, n_persons=50, n_groups=5, memberships_per_person=2
    ).items():
        df.write.parquet(str(tables / f"{name}.parquet"))

    props = load_properties(
        f"mapping.file={ref}\n"
        "mapping.file.type=TURTLE\n"  # the reference's r2rml.properties value

        "default.namespace=http://localhost/\n"
        "spark.tables.dir=tables\n"
        "jena.destinationFileName=dump.nt\n"
        "jena.destinationFileSyntax=N-TRIPLE\n"
    )
    summary = run_properties(spark, props, base_dir=str(tmp_path))
    assert summary["mappings"] == 3
    part = next(f for f in os.listdir(tmp_path / "dump.nt") if f.startswith("part-"))
    lines = (tmp_path / "dump.nt" / part).read_text().splitlines()
    assert len(lines) == summary["triples"] > 100
    assert any("foaf" in ln and "/name" in ln.lower() for ln in lines)


def test_triples_df_from_rdf_turtle(spark):
    df = triples_df_from_rdf(
        spark, '@prefix ex: <http://e/> . ex:s ex:p "v"@en .', "TURTLE"
    )
    row = df.collect()[0]
    assert (row.subj, row.pred, row.obj, row.obj_kind, row.lang) == (
        "http://e/s", "http://e/p", "v", "literal", "en",
    )
