"""Mapping intermediate representation (IR).

Fresh dataclass design carrying the same information the reference's
entity beans hold (reference: entities/MappingDocument.java,
LogicalTableMapping.java, SubjectMap.java, PredicateObjectMap.java,
RefObjectMap.java, Template.java, TermType.java) — but immutable,
engine-agnostic, and compiled to Catalyst expressions instead of being
interpreted row-at-a-time.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from enum import Enum


class TermType(Enum):
    """rr:termType values + AUTO (column object → datatype-inferred literal).

    Mirrors the reference's TermType enum (TermType.java:7-15).
    """

    IRI = "IRI"
    BLANK_NODE = "BlankNode"
    LITERAL = "Literal"
    AUTO = "Auto"


_FIELD_RE = re.compile(r"\{([^{}]*)\}")


def strip_sql_quotes(name: str) -> str:
    """`"Name"` → `Name` — the reference strips double quotes from column
    references before JDBC lookup (UtilImpl.java:62-65, Parser.java:527-536)."""
    n = name.strip()
    if len(n) >= 2 and n.startswith('"') and n.endswith('"'):
        return n[1:-1]
    return n


@dataclass(frozen=True)
class Template:
    """An rr:template string split into constant parts and column fields.

    ``parts`` has len(fields)+1 constant segments; the rendered value is
    parts[0] + v(fields[0]) + parts[1] + ... Escaped ``\\{`` braces are
    treated as constant text (Template.java:68-78).
    """

    text: str
    parts: tuple[str, ...]
    fields: tuple[str, ...]

    @staticmethod
    def parse(text: str) -> "Template":
        # Protect escaped braces, split on {field} groups.
        sentinel_o, sentinel_c = "\x00", "\x01"
        protected = text.replace("\\{", sentinel_o).replace("\\}", sentinel_c)
        parts: list[str] = []
        fields: list[str] = []
        last = 0
        for m in _FIELD_RE.finditer(protected):
            parts.append(protected[last : m.start()])
            fields.append(strip_sql_quotes(m.group(1)))
            last = m.end()
        parts.append(protected[last:])
        unprot = [p.replace(sentinel_o, "{").replace(sentinel_c, "}") for p in parts]
        return Template(text=text, parts=tuple(unprot), fields=tuple(fields))


@dataclass(frozen=True)
class TermMap:
    """A subject/predicate/object term map: exactly one of template /
    column / constant is set."""

    template: Template | None = None
    column: str | None = None
    constant_iri: str | None = None
    constant_literal: str | None = None
    term_type: TermType = TermType.IRI
    language: str | None = None
    datatype: str | None = None  # expanded XSD IRI

    def kind(self) -> str:
        if self.template is not None:
            return "template"
        if self.column is not None:
            return "column"
        return "constant"


@dataclass(frozen=True)
class JoinCondition:
    child: str
    parent: str


@dataclass(frozen=True)
class RefObjectMap:
    """rr:parentTriplesMap object (+ optional rr:joinCondition).

    Without a join condition the semantics are "link to every subject the
    parent map generated" (reference: Generator.java:522-540)."""

    parent_triples_map: str
    join_conditions: tuple[JoinCondition, ...] = ()


@dataclass(frozen=True)
class PredicateObjectMap:
    predicates: tuple[str, ...]  # constant predicate IRIs (fan-out, P9)
    objects: tuple[TermMap, ...] = ()
    ref_objects: tuple[RefObjectMap, ...] = ()
    #: rr:graphMap / rr:graph terms scoped to this POM (r5 — the
    #: reference only logs these, Parser.java:241-270); IRI-valued
    #: template/column/constant TermMaps. Per the R2RML spec the POM's
    #: triples land in the UNION of these and the subject map's graphs;
    #: empty union → the default graph.
    graph_maps: tuple[TermMap, ...] = ()


@dataclass(frozen=True)
class LogicalTable:
    """rr:tableName or rr:sqlQuery (exactly one set)."""

    table_name: str | None = None
    sql_query: str | None = None

    def source_key(self) -> str:
        return self.table_name if self.table_name is not None else self.sql_query


@dataclass(frozen=True)
class TriplesMap:
    uri: str
    logical_table: LogicalTable
    subject_map: TermMap
    classes: tuple[str, ...] = ()
    predicate_object_maps: tuple[PredicateObjectMap, ...] = ()
    #: subject-map-level rr:graphMap / rr:graph terms (r5): apply to
    #: the map's class triples and, unioned with each POM's own
    #: graph_maps, to every POM emission.
    graph_maps: tuple[TermMap, ...] = ()

    def definition_hash(self) -> str:
        """Stable content hash of the mapping definition — the Spark-side
        replacement for the reference's logicalTableMappingHash
        (UtilImpl.java:395-437), used by incremental skip logic."""
        return hashlib.md5(repr(self).encode("utf-8")).hexdigest()

    def parent_refs(self, unconditioned_only: bool = False) -> tuple[str, ...]:
        return tuple(
            ro.parent_triples_map
            for pom in self.predicate_object_maps
            for ro in pom.ref_objects
            if not (unconditioned_only and ro.join_conditions)
        )


@dataclass(frozen=True)
class MappingDocument:
    triples_maps: tuple[TriplesMap, ...]
    prefixes: dict[str, str] = field(default_factory=dict)
    base: str = ""
    base_ns: str = ""  # default.namespace — IRI fallback prefix (P2)

    def by_uri(self, uri: str) -> TriplesMap:
        for tm in self.triples_maps:
            if tm.uri == uri:
                return tm
        raise KeyError(uri)

    def topo_sorted(self) -> tuple[TriplesMap, ...]:
        """Parents before children — generalizes the reference's
        'no-parent-ref first' ordering (Parser.java:117-132) to a real
        topological sort. Only CONDITION-LESS ref objects (J2: "link to
        every parent subject") impose ordering/acyclicity — joins with
        rr:joinCondition re-derive both sides from sources and are
        order-independent (self-referencing hierarchies like
        iswc-mapping's #Concept are valid)."""
        order: list[TriplesMap] = []
        seen: set[str] = set()

        def visit(tm: TriplesMap, stack: tuple[str, ...]) -> None:
            if tm.uri in seen:
                return
            if tm.uri in stack:
                raise ValueError(f"cyclic condition-less rr:parentTriplesMap chain via {tm.uri}")
            for parent in tm.parent_refs(unconditioned_only=True):
                visit(self.by_uri(parent), stack + (tm.uri,))
            seen.add(tm.uri)
            order.append(tm)

        for tm in self.triples_maps:
            visit(tm, ())
        # resolvability check for conditioned refs too
        for tm in self.triples_maps:
            for parent in tm.parent_refs():
                self.by_uri(parent)
        return tuple(order)
