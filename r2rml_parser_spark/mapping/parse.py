"""R2RML mapping-document → IR extraction.

Re-implements (fresh, driver-side) the extraction rules of the reference's
Parser (reference: beans/Parser.java:151-454 for term maps,
Parser.java:456-623 for logical tables): rr:logicalTable with rr:tableName
or rr:sqlQuery, subject maps (template / column / constant, rr:termType,
rr:class), predicate-object maps (rr:predicate constants, rr:predicateMap,
rr:object / rr:objectMap with template / column / constant / ref-object,
rr:language, rr:datatype, rr:joinCondition).

Where the reference navigates the mapping graph with Jena + SPARQL
(UtilImpl.java:148-210), we use a plain adjacency index over the parsed
Turtle triples — the mapping document is tiny and driver-side.
"""

from __future__ import annotations

import re
from collections import defaultdict

from r2rml_parser_spark.mapping.model import (
    JoinCondition,
    LogicalTable,
    MappingDocument,
    PredicateObjectMap,
    RefObjectMap,
    Template,
    TermMap,
    TermType,
    TriplesMap,
    strip_sql_quotes,
)
from r2rml_parser_spark.rdf.terms import RR, XSD, BNode, IRI, Literal, Term
from r2rml_parser_spark.rdf.turtle import parse_turtle


class MappingError(ValueError):
    """Invalid mapping document (replaces the reference's System.exit paths)."""


class _Graph:
    def __init__(self, triples):
        self.index: dict[Term, dict[str, list[Term]]] = defaultdict(lambda: defaultdict(list))
        for s, p, o in triples:
            if isinstance(p, IRI):
                self.index[s][p.value].append(o)

    def objects(self, s: Term, pred_local: str) -> list[Term]:
        return self.index[s].get(RR + pred_local, [])

    def one(self, s: Term, pred_local: str) -> Term | None:
        objs = self.objects(s, pred_local)
        return objs[0] if objs else None

    def subjects_with(self, pred_local: str) -> list[Term]:
        return [s for s, props in self.index.items() if RR + pred_local in props]


def _term_type(g: _Graph, node: Term, default: TermType) -> TermType:
    tt = g.one(node, "termType")
    if tt is None:
        return default
    if not isinstance(tt, IRI) or not tt.value.startswith(RR):
        raise MappingError(f"invalid rr:termType: {tt}")
    name = tt.value[len(RR) :]
    try:
        return {"IRI": TermType.IRI, "BlankNode": TermType.BLANK_NODE, "Literal": TermType.LITERAL}[name]
    except KeyError:
        raise MappingError(f"unknown rr:termType rr:{name}") from None


def _expand_datatype(dt: Term) -> str:
    if isinstance(dt, IRI):
        return dt.value
    if isinstance(dt, Literal):  # tolerated: datatype given as string
        v = dt.lexical
        return v if v.startswith("http") else XSD + v.split(":")[-1]
    raise MappingError(f"invalid rr:datatype: {dt}")


def _lit(node: Term, what: str) -> str:
    if not isinstance(node, Literal):
        raise MappingError(f"{what} must be a literal, got {node}")
    return node.lexical


_LANG_RE = re.compile(r"^[a-zA-Z]{2,3}(-[a-zA-Z0-9]{1,8})*$")


def _check_language(lang: str) -> str:
    """Reject malformed BCP47 tags (W3C TC0015b: 'english' is a data
    error; 'en', 'en-US', 'ja' are fine)."""
    if not _LANG_RE.match(lang):
        raise MappingError(f"invalid rr:language tag {lang!r}")
    return lang


#: rr:defaultGraph — a constant graph map naming it targets the
#: DEFAULT graph, not a named graph (R2RML spec §9)
RR_DEFAULT_GRAPH = "http://www.w3.org/ns/r2rml#defaultGraph"


def _graph_maps(g: _Graph, node: Term) -> tuple[TermMap, ...]:
    """rr:graphMap (template/column/constant) + rr:graph shortcut terms
    of a subject map or predicate-object map (r5 — beyond the
    reference's log-only stub, Parser.java:241-270). Graph terms must
    be IRIs (W3C TC0007h); a constant rr:defaultGraph stays in the
    list and the engine maps it to the NULL default graph."""
    out: list[TermMap] = []
    for gm in g.objects(node, "graphMap"):
        if _term_type(g, gm, TermType.IRI) != TermType.IRI:
            raise MappingError("rr:graphMap terms must be IRIs")
        tmpl = g.one(gm, "template")
        col = g.one(gm, "column")
        const = g.one(gm, "constant")
        if tmpl is not None:
            out.append(TermMap(template=Template.parse(_lit(tmpl, "rr:template"))))
        elif col is not None:
            out.append(TermMap(column=strip_sql_quotes(_lit(col, "rr:column"))))
        elif const is not None:
            if not isinstance(const, IRI):
                raise MappingError("rr:graphMap constant must be an IRI")
            out.append(TermMap(constant_iri=const.value))
        else:
            raise MappingError("graph map needs template/column/constant")
    for gshort in g.objects(node, "graph"):  # rr:graph shortcut constant
        if not isinstance(gshort, IRI):
            raise MappingError("rr:graph must be an IRI")
        out.append(TermMap(constant_iri=gshort.value))
    return tuple(out)


def _subject_map(
    g: _Graph, tm_node: Term
) -> tuple[TermMap, tuple[str, ...], tuple[TermMap, ...]]:
    classes: list[str] = []
    sms = g.objects(tm_node, "subjectMap")
    if len(sms) > 1:
        # exactly one subject map per triples map (W3C TC0012d)
        raise MappingError(f"triples map {tm_node} has {len(sms)} subjectMaps")
    sm = sms[0] if sms else None
    if sm is None:
        # rr:subject shortcut — constant subject (Parser.java:261-269)
        const = g.one(tm_node, "subject")
        if const is None:
            raise MappingError(f"triples map {tm_node} has no subjectMap/subject")
        if not isinstance(const, IRI):
            raise MappingError("rr:subject must be an IRI")
        return TermMap(constant_iri=const.value), (), ()
    for c in g.objects(sm, "class"):
        if not isinstance(c, IRI):
            raise MappingError(f"rr:class must be an IRI, got {c}")
        classes.append(c.value)

    graphs = _graph_maps(g, sm)

    tmpl = g.one(sm, "template")
    col = g.one(sm, "column")
    const = g.one(sm, "constant")
    if tmpl is not None:
        tt = _term_type(g, sm, TermType.IRI)
        if tt == TermType.LITERAL:
            raise MappingError("subject map may not produce literals")
        return (
            TermMap(template=Template.parse(_lit(tmpl, "rr:template")), term_type=tt),
            tuple(classes),
            graphs,
        )
    if col is not None:
        tt = _term_type(g, sm, TermType.IRI)
        if tt == TermType.LITERAL:
            raise MappingError("subject map may not produce literals")
        return (
            TermMap(column=strip_sql_quotes(_lit(col, "rr:column")), term_type=tt),
            tuple(classes),
            graphs,
        )
    if const is not None:
        if isinstance(const, IRI):
            return TermMap(constant_iri=const.value), tuple(classes), graphs
        raise MappingError("constant subject must be an IRI")
    raise MappingError(f"subject map of {tm_node} has no template/column/constant")


def _object_map(g: _Graph, om: Term) -> TermMap | RefObjectMap:
    parent = g.one(om, "parentTriplesMap")
    if parent is not None:
        if not isinstance(parent, IRI):
            raise MappingError("rr:parentTriplesMap must be an IRI")
        joins = []
        for jc in g.objects(om, "joinCondition"):
            child = g.one(jc, "child")
            par = g.one(jc, "parent")
            if child is None or par is None:
                raise MappingError("rr:joinCondition needs rr:child and rr:parent")
            joins.append(
                JoinCondition(
                    child=strip_sql_quotes(_lit(child, "rr:child")),
                    parent=strip_sql_quotes(_lit(par, "rr:parent")),
                )
            )
        return RefObjectMap(parent_triples_map=parent.value, join_conditions=tuple(joins))

    lang_node = g.one(om, "language")
    lang = _check_language(_lit(lang_node, "rr:language")) if lang_node is not None else None
    dt_node = g.one(om, "datatype")
    datatype = _expand_datatype(dt_node) if dt_node is not None else None

    tmpl = g.one(om, "template")
    if tmpl is not None:
        tt = _term_type(g, om, TermType.IRI)
        return TermMap(
            template=Template.parse(_lit(tmpl, "rr:template")),
            term_type=tt,
            language=lang,
            datatype=datatype,
        )
    col = g.one(om, "column")
    if col is not None:
        # column object defaults to AUTO: literal with inferred datatype
        # (Parser.java:354, Generator.java:426-462)
        tt = _term_type(g, om, TermType.AUTO)
        return TermMap(
            column=strip_sql_quotes(_lit(col, "rr:column")),
            term_type=tt,
            language=lang,
            datatype=datatype,
        )
    const = g.one(om, "constant")
    if const is not None:
        return _constant_object(const, lang, datatype)
    raise MappingError(f"object map {om} has no template/column/constant/parentTriplesMap")


def _constant_object(const: Term, lang: str | None = None, datatype: str | None = None) -> TermMap:
    if isinstance(const, IRI):
        return TermMap(constant_iri=const.value)
    if isinstance(const, Literal):
        return TermMap(
            constant_literal=const.lexical,
            term_type=TermType.LITERAL,
            language=lang or const.lang,
            datatype=datatype or const.datatype,
        )
    raise MappingError(f"invalid constant object: {const}")


def _predicate_object_maps(g: _Graph, tm_node: Term) -> tuple[PredicateObjectMap, ...]:
    poms: list[PredicateObjectMap] = []
    for pom in g.objects(tm_node, "predicateObjectMap"):
        predicates: list[str] = []
        for p in g.objects(pom, "predicate"):
            if not isinstance(p, IRI):
                raise MappingError(f"rr:predicate must be an IRI, got {p}")
            predicates.append(p.value)
        for pm in g.objects(pom, "predicateMap"):
            const = g.one(pm, "constant")
            if const is None or not isinstance(const, IRI):
                raise MappingError("rr:predicateMap needs an IRI rr:constant")
            predicates.append(const.value)
        if not predicates:
            raise MappingError("predicateObjectMap without predicate")

        objects: list[TermMap] = []
        refs: list[RefObjectMap] = []
        for o in g.objects(pom, "object"):  # rr:object shortcut constant
            objects.append(_constant_object(o))
        for om in g.objects(pom, "objectMap"):
            got = _object_map(g, om)
            if isinstance(got, RefObjectMap):
                refs.append(got)
            else:
                objects.append(got)
        if not objects and not refs:
            raise MappingError("predicateObjectMap without object")
        poms.append(
            PredicateObjectMap(
                predicates=tuple(predicates), objects=tuple(objects),
                ref_objects=tuple(refs), graph_maps=_graph_maps(g, pom),
            )
        )
    return tuple(poms)


def parse_mapping_document(text: str, base_ns: str = "", format: str = "auto") -> MappingDocument:
    """Parse an R2RML mapping document (Turtle or RDF/XML) into the IR.

    The reference reads both via Jena (``mapping.file.type`` knob,
    Parser.java:695); format 'auto' sniffs XML documents."""
    if format == "auto":
        head = text.lstrip()[:200]
        format = "rdfxml" if head.startswith("<?xml") or "<rdf:RDF" in head else "turtle"
    if format == "rdfxml":
        from r2rml_parser_spark.rdf.rdfxml import parse_rdfxml

        triples, prefixes, base = parse_rdfxml(text), {}, ""
    else:
        triples, prefixes, base = parse_turtle(text)
    g = _Graph(triples)

    tm_nodes = g.subjects_with("logicalTable")
    # tolerate triples maps declaring rr:tableName/rr:sqlQuery directly
    for s in g.subjects_with("subjectMap"):
        if s not in tm_nodes:
            tm_nodes.append(s)

    maps: list[TriplesMap] = []
    for node in tm_nodes:
        lt_node = g.one(node, "logicalTable") or node
        table = g.one(lt_node, "tableName")
        sql = g.one(lt_node, "sqlQuery")
        sql_version = g.one(lt_node, "sqlVersion")
        if sql_version is not None and not (
            isinstance(sql_version, IRI) and sql_version.value == RR + "SQL2008"
        ):
            # only the core SQL2008 identifier is valid (W3C TC0003a)
            raise MappingError(f"unsupported rr:sqlVersion: {sql_version}")
        if table is not None:
            lt = LogicalTable(table_name=strip_sql_quotes(_lit(table, "rr:tableName")))
        elif sql is not None:
            q = _lit(sql, "rr:sqlQuery").strip().rstrip(";").strip()
            lt = LogicalTable(sql_query=q)
        else:
            raise MappingError(f"logical table of {node} has no tableName/sqlQuery")

        subject, classes, graphs = _subject_map(g, node)
        poms = _predicate_object_maps(g, node)
        uri = node.value if isinstance(node, IRI) else f"_:{node.label}"
        maps.append(
            TriplesMap(
                uri=uri,
                logical_table=lt,
                subject_map=subject,
                classes=classes,
                predicate_object_maps=poms,
                graph_maps=graphs,
            )
        )

    # stable order: document subjects-with-logicalTable order
    doc = MappingDocument(
        triples_maps=tuple(maps), prefixes=prefixes, base=base, base_ns=base_ns or base
    )
    doc.topo_sorted()  # validate: no cycles, all parent refs resolvable
    return doc
