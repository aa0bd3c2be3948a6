"""Mapping IR → Catalyst Column compilation.

This is the central compile step of the engine: where the reference fills
templates row-at-a-time in Java (UtilImpl.java:51-127) and builds Jena
term objects per row (Generator.java:293-462), we compile each term map
ONCE into a NULL-propagating Catalyst expression tree, so the whole
triples map runs inside whole-stage codegen with zero per-row Python.

Distributed triple representation (columnar; see SURVEY.md §2.4):

    subj      string  — IRI text or blank-node label
    subj_kind string  — 'iri' | 'bnode'
    pred      string  — predicate IRI
    obj       string  — IRI text, blank-node label, or literal lexical
    obj_kind  string  — 'iri' | 'bnode' | 'literal'
    lang      string? — BCP47 tag for lang literals
    dtype     string? — XSD datatype IRI for typed literals
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from r2rml_parser_spark.functions.encoding import form_encode, iri_safe_encode
from r2rml_parser_spark.functions.lexical import (
    lexical,
    template_field_lexical,
    xsd_datatype_for,
)
from r2rml_parser_spark.mapping.model import Template, TermMap, TermType
from r2rml_parser_spark.mapping.parse import MappingError

TRIPLE_COLUMNS = ["subj", "subj_kind", "pred", "obj", "obj_kind", "lang", "dtype"]

#: any-scheme IRI detector (http, https, data, urn, ...) — compile-time on
#: template text, runtime (rlike) for column-valued IRI terms.
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_SCHEME_RLIKE = "^[A-Za-z][A-Za-z0-9+.-]*:"


@dataclass
class CompiledTerm:
    """A term map compiled to Catalyst expressions (NULL value ⇒ the row
    emits no triple for this term — P10 NULL propagation)."""

    value: Column
    kind: Column  # 'iri' | 'bnode' | 'literal'
    lang: Column
    dtype: Column

    def as_struct(
        self, pred: Column, graph: Column | None = None,
        gdef: Column | None = None,
    ) -> Column:
        fields = [
            pred.alias("pred"),
            self.value.alias("obj"),
            self.kind.alias("obj_kind"),
            self.lang.alias("lang"),
            self.dtype.alias("dtype"),
        ]
        if graph is not None:
            # quad emission (r5): the target graph IRI plus a marker
            # distinguishing the DEFAULT graph (graph NULL, keep) from
            # a FAILED named-graph term (graph NULL, drop — R2RML term
            # generation error suppresses the triple)
            fields += [graph.alias("graph"), gdef.alias("gdef")]
        return F.struct(*fields)


def resolve_column(df: DataFrame, name: str) -> tuple[Column, T.DataType]:
    """Resolve a template field / rr:column name against the source schema.

    Exact match first, then unique case-insensitive match (the reference
    resolves via JDBC's case-insensitive ``rs.getString``,
    UtilImpl.java:66-73). Missing or ambiguous names raise MappingError —
    the engine's replacement for the reference's System.exit on bad
    columns (D002 r2rmlc negative case).
    """
    fields = df.schema.fields
    exact = [f for f in fields if f.name == name]
    if len(exact) == 1:
        return df[f"`{name}`"], exact[0].dataType
    if len(exact) > 1:
        raise MappingError(f"ambiguous column reference {name!r}")
    ci = [f for f in fields if f.name.lower() == name.lower()]
    if len(ci) == 1:
        return df[f"`{ci[0].name}`"], ci[0].dataType
    if len(ci) > 1:
        raise MappingError(f"ambiguous column reference {name!r}")
    raise MappingError(
        f"column {name!r} not found in logical table (have: {[f.name for f in fields]})"
    )


def _sanitize_bnode(col: Column) -> Column:
    """Blank-node labels must be N-Triples-safe; graph comparison is
    label-agnostic so lossy char replacement is fine."""
    return F.regexp_replace(col, r"[^A-Za-z0-9_.-]", "_")


class TermCompiler:
    """Compiles TermMaps against one logical-table DataFrame."""

    def __init__(self, df: DataFrame, base_ns: str, encode_iris: bool = True,
                 form_encoding: bool = False):
        self.df = df
        self.base_ns = (base_ns or "").rstrip("/#")
        self.encode_iris = encode_iris
        self._encode = form_encode if form_encoding else iri_safe_encode

    # -- template -----------------------------------------------------
    def _fill(self, tpl: Template, encode_fields: bool) -> Column:
        """Template fill as one NULL-propagating concat chain (P1)."""
        pieces: list[Column] = []
        for i, part in enumerate(tpl.parts):
            if part:
                pieces.append(F.lit(part))
            if i < len(tpl.fields):
                col, dt = resolve_column(self.df, tpl.fields[i])
                val = template_field_lexical(col, dt)
                if encode_fields:
                    val = self._encode(val)
                pieces.append(val)
        if not pieces:
            return F.lit("")
        return F.concat(*pieces)

    def _iri_from_template(self, tpl: Template) -> Column:
        filled = self._fill(tpl, encode_fields=self.encode_iris)
        if _SCHEME_RE.match(tpl.parts[0] or ""):
            return filled
        # non-absolute template → resolve against the base namespace
        # (reference: UtilImpl.java:79-91 prefixes default.namespace)
        if not self.base_ns:
            return filled
        return F.concat(F.lit(self.base_ns + "/"), filled)

    def _iri_from_value(self, value: Column) -> Column:
        """Column-valued IRI term: absolute values pass through, relative
        values resolve against the base namespace (runtime isUri heuristic,
        UtilImpl.java:458-470). Per the W3C semantics (D019 golden +
        manifest), column IRIs are NOT percent-encoded — a value that is
        not a valid IRI is a *data error* that aborts the run."""
        resolved = value
        if self.base_ns:
            resolved = F.when(value.rlike(_SCHEME_RLIKE), value).otherwise(
                F.concat(F.lit(self.base_ns + "/"), value)
            )
        invalid = resolved.rlike(r'[\x00-\x20<>"{}|^`\\]')
        return F.when(invalid & resolved.isNotNull(),
                      F.raise_error(F.concat(F.lit("R2RML data error: invalid IRI: "), resolved))
                      ).otherwise(resolved)

    # -- public -------------------------------------------------------
    def compile(self, tm: TermMap) -> CompiledTerm:
        null_s = F.lit(None).cast("string")

        if tm.constant_iri is not None:
            return CompiledTerm(F.lit(tm.constant_iri), F.lit("iri"), null_s, null_s)
        if tm.constant_literal is not None:
            return CompiledTerm(
                F.lit(tm.constant_literal),
                F.lit("literal"),
                F.lit(tm.language).cast("string"),
                F.lit(tm.datatype).cast("string"),
            )

        if tm.template is not None:
            if tm.term_type == TermType.BLANK_NODE:
                label = _sanitize_bnode(self._fill(tm.template, encode_fields=False))
                return CompiledTerm(label, F.lit("bnode"), null_s, null_s)
            if tm.term_type == TermType.LITERAL:
                val = self._fill(tm.template, encode_fields=False)
                return CompiledTerm(
                    val, F.lit("literal"),
                    F.lit(tm.language).cast("string"),
                    F.lit(tm.datatype).cast("string"),
                )
            return CompiledTerm(self._iri_from_template(tm.template), F.lit("iri"), null_s, null_s)

        if tm.column is not None:
            col, dt = resolve_column(self.df, tm.column)
            if tm.term_type == TermType.BLANK_NODE:
                return CompiledTerm(
                    _sanitize_bnode(lexical(col, dt)), F.lit("bnode"), null_s, null_s
                )
            if tm.term_type == TermType.IRI:
                return CompiledTerm(
                    self._iri_from_value(lexical(col, dt)), F.lit("iri"), null_s, null_s
                )
            # LITERAL / AUTO: typed literal; explicit rr:datatype wins,
            # else infer from the Spark column type (§2.3); language tag
            # forces a plain lang literal.
            dtype = tm.datatype if tm.datatype is not None else xsd_datatype_for(dt)
            if tm.language is not None:
                dtype = None
            return CompiledTerm(
                lexical(col, dt),
                F.lit("literal"),
                F.lit(tm.language).cast("string"),
                F.lit(dtype).cast("string"),
            )

        raise MappingError(f"uncompilable term map: {tm}")


def force_uri(term: CompiledTerm) -> CompiledTerm:
    """P6 forceURI: literal values that start with ``http`` become IRIs
    (reference: Generator.java:372-383, knob r2rml.properties:23)."""
    is_url = term.value.startswith("http")
    return CompiledTerm(
        value=term.value,
        kind=F.when((term.kind == "literal") & is_url, F.lit("iri")).otherwise(term.kind),
        lang=F.when((term.kind == "literal") & is_url, F.lit(None).cast("string")).otherwise(term.lang),
        dtype=F.when((term.kind == "literal") & is_url, F.lit(None).cast("string")).otherwise(term.dtype),
    )
