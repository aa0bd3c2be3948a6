"""RDF term model + N-Triples lexical rendering.

Driver-side only (mapping documents, golden-file comparison). The
distributed triple representation is columnar — see
``r2rml_parser_spark.plans.compile`` (subj/pred/obj/obj_is_iri/lang/dtype
columns), mirroring the reference's Jena ``Model`` of typed terms
(reference: entities/Template.java, beans/Generator.java:293-462).
"""

from __future__ import annotations

from dataclasses import dataclass

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RR = "http://www.w3.org/ns/r2rml#"


@dataclass(frozen=True)
class IRI:
    value: str

    def nt(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BNode:
    label: str

    def nt(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class Literal:
    lexical: str
    lang: str | None = None
    datatype: str | None = None

    def nt(self) -> str:
        body = '"%s"' % escape_literal(self.lexical)
        if self.lang:
            return f"{body}@{self.lang}"
        if self.datatype:
            return f"{body}^^<{self.datatype}>"
        return body


Term = IRI | BNode | Literal
Triple = tuple[Term, Term, Term]


def escape_literal(s: str) -> str:
    """N-Triples string escaping (backslash, quote, control chars)."""
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def unescape_literal(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            mapped = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}.get(n)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if n in ("u", "U"):
                width = 4 if n == "u" else 8
                out.append(chr(int(s[i + 2 : i + 2 + width], 16)))
                i += 2 + width
                continue
        out.append(c)
        i += 1
    return "".join(out)
