"""Reference-compatible ``r2rml.properties`` runner.

The reference's only user entry point is ``r2rml-parser.sh -p
r2rml.properties`` (Main.java:34-73); this module lets that same
properties file drive the Spark engine, so a reference user can switch
without rewriting their configuration. Knob mapping (reference key →
engine behavior):

  mapping.file / mapping.file.type   parse_mapping_document (TURTLE / N3
                                     / N-TRIPLE / RDF/XML, Parser.java:695)
  default.namespace                  MappingEngine(base_ns=...)
  default.forceURI                   force_uris (Generator.java:372-383)
  jena.encodeURLs                    form_encoding=True — Java URLEncoder
                                     semantics (UtilImpl.java:83-121); the
                                     default (false) uses the engine's
                                     IRI-safe percent-encoding, the
                                     documented delta vs the reference
  input.model / input.model.type     parsed → triples DF merged via
                                     engine.triples(extra=...) (Parser.java:702-714)
  default.incremental                IncrementalRunner over the graph store
  jena.storeOutputModelUsingTdb /    GraphStore at jena.tdb.directory
    jena.tdb.directory               (partitioned parquet + manifest —
                                     the TDB re-imagination, SURVEY §2.4)
  jena.cleanTdbOnStartup             wipe the store dir first
  jena.destinationFileName /         sorted N-Triples dump for N3 /
    jena.destinationFileSyntax       N-TRIPLE / NT, TURTLE / TTL / N3
                                     (sinks.turtle — every Turtle doc
                                     is valid N3), RDF/XML and
                                     RDF/XML-ABBREV via sinks.rdfxml
  jena.showXmlDeclaration            leading <?xml ...?> on RDF/XML
                                     dumps (Generator.java:653-660)
  default.log                        run manifest JSON (status.rdf analogue)

  db.url / db.login / db.password /  JDBC sources via spark.read.jdbc:
    db.driver                        rr:tableName → dbtable=name;
                                     rr:sqlQuery → the whole view SQL
                                     pushed down as a dbtable subquery,
                                     so the DATABASE parses its own
                                     dialect (like the reference's
                                     Statement path, Generator.java:281)
  spark.tables.dir                   ENGINE EXTENSION replacing db.*: a
                                     directory of ``<table>.parquet``
                                     registered as the logical tables

Unknown keys are ignored (the reference does the same via Properties).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from r2rml_parser_spark.mapping.parse import MappingError, parse_mapping_document
from r2rml_parser_spark.plans.compile import TRIPLE_COLUMNS
from r2rml_parser_spark.plans.engine import MappingEngine
from r2rml_parser_spark.rdf.terms import BNode, IRI, Literal
from r2rml_parser_spark.sinks.ntriples import write_sorted


def load_properties(text: str) -> dict[str, str]:
    """Minimal java.util.Properties parser: ``k=v`` / ``k: v`` lines,
    ``#``/``!`` comments, trailing-backslash continuations."""
    props: dict[str, str] = {}
    pending = ""
    for raw in text.splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line.lstrip()[:1] in ("#", "!"):
            continue
        if line.endswith("\\"):
            pending = line[:-1]
            continue
        # java.util.Properties splits at the FIRST separator encountered,
        # whichever kind — 'db.url: jdbc:x://h/db?user=a' must split at
        # the ':', not at the '=' inside the value (ADVICE r1)
        positions = [i for i in (line.find("="), line.find(":")) if i >= 0]
        if positions:
            cut = min(positions)
            props[line[:cut].strip()] = line[cut + 1:].strip()
    return props


def _flag(props: dict[str, str], key: str, default: bool = False) -> bool:
    return props.get(key, str(default)).strip().lower() == "true"


_FORMATS = {
    "TURTLE": "turtle", "TTL": "turtle", "N3": "turtle",
    "N-TRIPLE": "ntriples", "N-TRIPLES": "ntriples", "NTRIPLE": "ntriples",
    "NTRIPLES": "ntriples", "NT": "ntriples",
    "RDF/XML": "rdfxml", "RDF/XML-ABBREV": "rdfxml", "RDFXML": "rdfxml",
}


def triples_df_from_rdf(spark: SparkSession, text: str, fmt: str = "auto") -> DataFrame:
    """Parse an RDF document (input model) into the engine's 7-column
    triples DataFrame (S2, Parser.java:702-714)."""
    from r2rml_parser_spark.rdf.rdfxml import parse_rdfxml
    from r2rml_parser_spark.rdf.turtle import parse_ntriples, parse_turtle

    fmt = _FORMATS.get(fmt.upper(), fmt) if fmt != "auto" else fmt
    if fmt == "auto":
        head = text.lstrip()[:200]
        fmt = "rdfxml" if head.startswith("<?xml") or "<rdf:RDF" in head else "turtle"
    if fmt == "rdfxml":
        triples = parse_rdfxml(text)
    elif fmt == "ntriples":
        triples = parse_ntriples(text)
    else:
        triples, _, _ = parse_turtle(text)

    def term_cols(t):
        if isinstance(t, IRI):
            return t.value, "iri", None, None
        if isinstance(t, BNode):
            return t.label, "bnode", None, None
        assert isinstance(t, Literal)
        return t.lexical, "literal", t.lang, t.datatype

    rows = []
    for s, p, o in triples:
        sv, sk, _, _ = term_cols(s)
        pv, _, _, _ = term_cols(p)
        ov, ok, lang, dtype = term_cols(o)
        rows.append((sv, sk, pv, ov, ok, lang, dtype))
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType(), True) for c in TRIPLE_COLUMNS])
    return spark.createDataFrame(rows, schema)


def _jdbc_sources(
    spark: SparkSession, props: dict[str, str], doc, *, read_jdbc=None
) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
    """(table sources, view_sources) for the db.* path.

    rr:tableName tables load as plain ``dbtable=name``. rr:sqlQuery
    views push the ENTIRE view SQL to the database as a
    ``dbtable=(sql) r2rml_view`` subquery — the database parses its own
    dialect (quoted/schema-qualified identifiers, vendor functions),
    exactly like the reference's JDBC Statement execution
    (Generator.java:281). This replaces the old per-referenced-table
    regex loads, which both mis-parsed quoted names and silently
    re-dialected vendor SQL through Spark SQL (ADVICE r1).

    ``read_jdbc(dbtable) -> DataFrame`` is injectable for tests (no
    live database ships in this environment)."""
    url = props["db.url"]
    opts = {"url": url, "user": props.get("db.login", ""), "password": props.get("db.password", "")}
    if props.get("db.driver"):
        opts["driver"] = props["db.driver"]
    if read_jdbc is None:
        def read_jdbc(dbtable: str) -> DataFrame:
            return spark.read.format("jdbc").options(dbtable=dbtable, **opts).load()
    tables: dict[str, DataFrame] = {}
    views: dict[str, DataFrame] = {}
    for tm in doc.triples_maps:
        lt = tm.logical_table
        if lt.table_name and lt.table_name not in tables:
            tables[lt.table_name] = read_jdbc(lt.table_name)
        elif lt.sql_query and lt.sql_query not in views:
            views[lt.sql_query] = read_jdbc(
                f"({lt.sql_query.rstrip().rstrip(';')}) r2rml_view"
            )
    return tables, views


def _parquet_sources(spark: SparkSession, tables_dir: str) -> dict[str, DataFrame]:
    sources = {}
    for entry in sorted(os.listdir(tables_dir)):
        if entry.endswith(".parquet"):
            sources[entry[: -len(".parquet")]] = spark.read.parquet(
                os.path.join(tables_dir, entry)
            )
    return sources


def run_properties(
    spark: SparkSession,
    props: dict[str, str],
    *,
    base_dir: str = ".",
    sources: dict[str, DataFrame] | None = None,
) -> dict:
    """Execute one reference-style run; returns a summary dict (the
    status.rdf analogue, also written to ``default.log`` as JSON)."""
    t0 = time.monotonic()

    def p(path: str) -> str:
        return path if os.path.isabs(path) else os.path.join(base_dir, path)

    mapping_path = props.get("mapping.file")
    if not mapping_path:
        raise MappingError("mapping.file is required")
    with open(p(mapping_path)) as f:
        mapping_text = f.read()
    fmt = _FORMATS.get(props.get("mapping.file.type", "auto").upper(), "auto")
    doc = parse_mapping_document(
        mapping_text, format="rdfxml" if fmt == "rdfxml" else ("turtle" if fmt != "auto" else "auto")
    )

    view_sources: dict[str, DataFrame] | None = None
    if sources is None:
        if props.get("spark.tables.dir"):
            sources = _parquet_sources(spark, p(props["spark.tables.dir"]))
        elif props.get("db.url"):
            sources, view_sources = _jdbc_sources(spark, props, doc)
        else:
            raise MappingError("no sources: set spark.tables.dir or db.url")

    engine = MappingEngine(
        spark,
        doc,
        sources=sources,
        base_ns=props.get("default.namespace"),
        force_uris=_flag(props, "default.forceURI"),
        form_encoding=_flag(props, "jena.encodeURLs"),
        view_sources=view_sources,
    )
    engine.register_sources()

    extra = None
    if props.get("input.model"):
        with open(p(props["input.model"])) as f:
            extra = triples_df_from_rdf(
                spark, f.read(), props.get("input.model.type", "auto")
            )

    summary: dict = {"mappings": len(doc.triples_maps)}

    use_store = _flag(props, "jena.storeOutputModelUsingTdb")
    incremental = _flag(props, "default.incremental")
    if use_store or incremental:
        from r2rml_parser_spark.sinks.checkpoint import GraphStore, IncrementalRunner

        store_dir = p(props.get("jena.tdb.directory", "tdb"))
        if _flag(props, "jena.cleanTdbOnStartup"):
            shutil.rmtree(store_dir, ignore_errors=True)
        store = GraphStore(spark, store_dir)
        if incremental:
            result = IncrementalRunner(engine, store).run()
            summary["incremental"] = result
        else:
            # reference TDB semantics without incremental: set-difference
            # sync — apply exactly removed/added (Generator.java:701-748)
            summary["sync"] = store.sync(engine.triples(lineage=True))
        triples = store.read()
        if extra is not None:
            triples = triples.unionByName(extra).dropDuplicates(TRIPLE_COLUMNS)
    else:
        triples = engine.triples(extra=extra, lineage=False)

    dest = props.get("jena.destinationFileName")
    if dest:
        syntax = props.get("jena.destinationFileSyntax", "N-TRIPLE").upper()
        if _FORMATS.get(syntax) == "rdfxml":
            from r2rml_parser_spark.sinks.rdfxml import write_rdfxml

            write_rdfxml(
                triples.select(*TRIPLE_COLUMNS), p(dest),
                xml_declaration=_flag(props, "jena.showXmlDeclaration"),
                abbrev="ABBREV" in syntax,
            )
        elif _FORMATS.get(syntax) == "turtle":
            from r2rml_parser_spark.sinks.turtle import dump_string as ttl_dump

            with open(p(dest), "w", encoding="utf-8") as f:
                f.write(ttl_dump(triples.select(*TRIPLE_COLUMNS)))
        else:
            write_sorted(triples.select(*TRIPLE_COLUMNS), p(dest))
        summary["dump"] = dest

    summary["triples"] = triples.count()
    summary["seconds"] = round(time.monotonic() - t0, 3)
    log_path = props.get("default.log")
    if log_path:
        with open(p(log_path if log_path.endswith(".json") else log_path + ".json"), "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    return summary


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Run an r2rml.properties file against the Spark engine"
    )
    ap.add_argument("-p", "--properties", required=True)
    args = ap.parse_args(argv)
    with open(args.properties) as f:
        props = load_properties(f.read())
    from r2rml_parser_spark.session import build_session

    spark = build_session(app_name="r2rml-properties-run")
    summary = run_properties(
        spark, props, base_dir=os.path.dirname(os.path.abspath(args.properties))
    )
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
