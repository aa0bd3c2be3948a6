"""Minimal RDF/XML reader for mapping documents.

The reference accepts mapping docs in TURTLE / RDF/XML / N3 / N-TRIPLE
(knob ``mapping.file.type``, Parser.java:695); its production DSpace
mappings (`/root/reference/dspace/*.rdf`) are RDF/XML. This implements
the RDF/XML subset those documents use: rdf:Description / typed node
elements, rdf:about / rdf:ID / rdf:resource / rdf:nodeID, nested
(anonymous) node elements, literal property elements with xml:lang or
rdf:datatype, and rdf:parseType="Resource".

Driver-side only — mapping documents are small.
"""

from __future__ import annotations

import itertools
import xml.etree.ElementTree as ET

from r2rml_parser_spark.rdf.terms import BNode, IRI, Literal, Term, Triple

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF = "{" + RDF_NS + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"


class RdfXmlError(ValueError):
    pass


def _expand(tag: str) -> str:
    if not tag.startswith("{"):
        raise RdfXmlError(f"unqualified element {tag!r}")
    ns, local = tag[1:].split("}", 1)
    return ns + local


def _resolve(base: str, ref: str) -> str:
    if ref.startswith("#") and base:
        return base.split("#")[0] + ref
    if "://" in ref or not base:
        return ref
    return base.rstrip("/") + "/" + ref


class _Reader:
    def __init__(self, base: str = ""):
        self.base = base
        self.triples: list[Triple] = []
        self._bn = itertools.count()

    def _subject_of(self, el: ET.Element, base: str) -> Term:
        about = el.get(_RDF + "about")
        rid = el.get(_RDF + "ID")
        nodeid = el.get(_RDF + "nodeID")
        if about is not None:
            return IRI(_resolve(base, about))
        if rid is not None:
            return IRI(_resolve(base, "#" + rid))
        if nodeid is not None:
            return BNode(nodeid)
        return BNode(f"rx{next(self._bn)}")

    def node_element(self, el: ET.Element, base: str) -> Term:
        base = el.get(_XML_BASE, base)
        subj = self._subject_of(el, base)
        tag = _expand(el.tag)
        if tag != RDF_NS + "Description":
            self.triples.append((subj, IRI(RDF_NS + "type"), IRI(tag)))
        for prop in el:
            self.property_element(subj, prop, base)
        return subj

    def property_element(self, subj: Term, el: ET.Element, base: str) -> None:
        pred = IRI(_expand(el.tag))
        resource = el.get(_RDF + "resource")
        nodeid = el.get(_RDF + "nodeID")
        datatype = el.get(_RDF + "datatype")
        lang = el.get(_XML_LANG)
        parse_type = el.get(_RDF + "parseType")

        if resource is not None:
            self.triples.append((subj, pred, IRI(_resolve(base, resource))))
            return
        if nodeid is not None:
            self.triples.append((subj, pred, BNode(nodeid)))
            return
        if parse_type == "Resource":
            inner = BNode(f"rx{next(self._bn)}")
            self.triples.append((subj, pred, inner))
            for sub in el:
                self.property_element(inner, sub, base)
            return
        children = list(el)
        if children:
            if len(children) != 1:
                raise RdfXmlError(f"property {pred.value} has {len(children)} node children")
            obj = self.node_element(children[0], base)
            self.triples.append((subj, pred, obj))
            return
        text = el.text or ""
        self.triples.append((subj, pred, Literal(text, lang=lang, datatype=datatype)))


def parse_rdfxml(text: str) -> list[Triple]:
    root = ET.fromstring(text)
    if _expand(root.tag) != RDF_NS + "RDF":
        raise RdfXmlError(f"root element is {root.tag!r}, expected rdf:RDF")
    reader = _Reader(base=root.get(_XML_BASE, ""))
    for el in root:
        reader.node_element(el, reader.base)
    return reader.triples
