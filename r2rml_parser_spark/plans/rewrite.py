"""Template-pruned canonical rewrite — the scale path for subject merging.

``operators.components.rewrite_subjects`` joins the canonical mapping
against EVERY triple and (with ``assume_distinct``) splits the stream
into touched/untouched branches — which re-executes the whole emission
pipeline once per branch. At bench scale that double scan plus the
per-row broadcast probes made the rewrite phase the worst-scaling stage
of the KG build (phase profile: 0.45 at local[2]→local[8] vs 0.92 for
the dominant LSH phase — BENCH/BASELINE.md §4.3).

This module removes both costs with STATIC template analysis. The
canonical mapping's keys are not arbitrary strings: they are renderings
of one known IRI template (the doc-subject template — both endpoints of
every near-dup edge). An emission branch can only be affected by the
rewrite if one of its term maps could EVER render a string inside that
key template's value space. Because IRI template fields are
percent-encoded (functions/encoding.py), a rendered value's separator
characters (``:/#`` … anything outside the unreserved+``%`` charset)
come from the template's static parts alone — so two templates whose
static separator skeletons differ can never render equal strings, for
any field values.

With that analysis:

* branches whose subject AND objects are provably outside the key space
  stream through untouched — no join, no dedup shuffle, ONE scan (in
  the docs KG that is the mention + span-literal traffic, ~90% of all
  triples);
* matchable branches take the broadcast rewrite joins (only on the
  sides that may match) and ONE bounded ``dropDuplicates`` over their
  union — no touched/untouched split, so the emission pipeline runs
  exactly once.

Exactness (set semantics) — requires (a) the raw emissions are globally
duplicate-free (the same precondition ``rewrite_subjects(...,
assume_distinct=True)`` documents) and (b) every mapping key AND value
is a rendering of ``key_template`` (true by construction: edges connect
doc IRIs, and a component minimum of doc IRIs is a doc IRI):

* duplicates can only be CREATED by changing a term, and a changed term
  equals a mapping value ∈ key-template space;
* every term of every passthrough branch is provably ∉ key-template
  space, so a passthrough row can never equal a modified row (they
  differ at the modified position) — and it can never equal an
  unmodified row (input uniqueness). Hence all possible duplicates live
  inside the matchable union, which is exactly the slice deduplicated.

Reference counterpart: none (the reference is single-threaded and has
no canonicalization stage); this implements the BASELINE.json
north_star canonicalization at the plan level Catalyst can't reach —
Catalyst cannot know that two string templates are disjoint.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r2rml_parser_spark.mapping.model import Template, TermMap, TermType
from r2rml_parser_spark.plans.compile import TRIPLE_COLUMNS

#: chars a percent-encoded template field can render (RFC 3986 unreserved
#: + '%'; see functions/encoding.py — everything else becomes %XX)
ENCODED_FIELD_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~%"
)
#: chars a sanitized blank-node label can contain (compile._sanitize_bnode)
BNODE_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.-"
)

_FIELD_MARK = "\x00"


def effective_iri_template(tpl: Template, base_ns: str) -> Template:
    """The template as actually rendered by TermCompiler._iri_from_template:
    non-absolute templates get the base namespace folded into parts[0]."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", tpl.parts[0] or ""):
        return tpl
    base = (base_ns or "").rstrip("/#")
    if not base:
        return tpl
    return Template(
        text=base + "/" + tpl.text,
        parts=(base + "/" + tpl.parts[0],) + tpl.parts[1:],
        fields=tpl.fields,
    )


def _sep_profile(tpl: Template, field_chars: frozenset[str]) -> tuple[str, list[tuple[str, bool]]]:
    """Split a template's rendered-value pattern on separator characters
    (static chars outside ``field_chars``, which no field value can
    produce). Returns (separator string, segments), where each segment is
    (pattern text with fields as \\x00 marks, has_field)."""
    seps: list[str] = []
    segments: list[tuple[str, bool]] = []
    cur: list[str] = []
    has_field = False
    nf = len(tpl.fields)
    for i, part in enumerate(tpl.parts):
        for ch in part:
            if ch in field_chars:
                cur.append(ch)
            else:
                seps.append(ch)
                segments.append(("".join(cur), has_field))
                cur, has_field = [], False
        if i < nf:
            cur.append(_FIELD_MARK)
            has_field = True
    segments.append(("".join(cur), has_field))
    return "".join(seps), segments


def _segment_may_match(ta: str, fa: bool, tb: str, fb: bool) -> bool:
    """May two inter-separator segments render equal? Sound, conservative."""
    if not fa and not fb:
        return ta == tb
    if fa and fb:
        return True
    pure, pattern = (ta, tb) if not fa else (tb, ta)
    pieces = pattern.split(_FIELD_MARK)
    # anchored in-order embedding: fields match [field_chars]* (maybe empty)
    if not pure.startswith(pieces[0]):
        return False
    s = pure[len(pieces[0]):]
    if not s.endswith(pieces[-1]):
        return False
    s = s[: len(s) - len(pieces[-1])] if pieces[-1] else s
    for mid in pieces[1:-1]:
        idx = s.find(mid)
        if idx == -1:
            return False
        s = s[idx + len(mid):]
    return True


def templates_may_collide(a: Template, b: Template, field_chars: frozenset[str] = ENCODED_FIELD_CHARS) -> bool:
    """False ⇒ no field values make render(a) == render(b) (PROVEN by the
    separator-skeleton argument); True ⇒ unknown, must join."""
    sa, ga = _sep_profile(a, field_chars)
    sb, gb = _sep_profile(b, field_chars)
    if sa != sb:
        return False
    return all(_segment_may_match(ta, fa, tb, fb) for (ta, fa), (tb, fb) in zip(ga, gb))


def _constant_may_match(value: str, key: Template, field_chars: frozenset[str]) -> bool:
    """May a constant string be a rendering of the key template?"""
    field_re = "[" + re.escape("".join(sorted(field_chars))) + "]*"
    pat = field_re.join(re.escape(p) for p in key.parts)
    return re.fullmatch(pat, value) is not None


def _value_outside_charset(key: Template, charset: frozenset[str]) -> bool:
    """True when EVERY rendering of ``key`` contains a char outside
    ``charset`` (every rendering contains all static-part chars)."""
    return any(ch not in charset for part in key.parts for ch in part)


def term_may_match(
    term: TermMap,
    key: Template,
    *,
    base_ns: str,
    encode_iris: bool,
    position: str,  # 'subj' | 'obj'
) -> bool:
    """May a value rendered by ``term`` ever equal a rendering of the
    (effective, encoded-field) ``key`` template — i.e. could the rewrite
    join ever hit this branch? False only when statically provable.

    Mirrors rewrite-join semantics exactly: the obj-side join is guarded
    by ``obj_kind == 'iri'`` (components.rewrite_subjects), so literal
    and bnode objects can never be rewritten; the subj side has no kind
    guard, so subjects are analyzed on value space alone.
    """
    renders_literal = (
        term.constant_literal is not None
        or term.language is not None
        or (term.template is not None and term.term_type == TermType.LITERAL)
        or (term.column is not None and term.term_type in (TermType.LITERAL, TermType.AUTO))
    )
    is_bnode = term.term_type == TermType.BLANK_NODE

    if position == "obj" and (renders_literal or is_bnode):
        return False  # join guard: obj_kind == 'iri' never holds

    if is_bnode:
        # sanitized labels can't contain key separators (e.g. ':', '/')
        return not _value_outside_charset(key, BNODE_CHARS)

    if term.constant_iri is not None:
        return _constant_may_match(term.constant_iri, key, ENCODED_FIELD_CHARS)
    if term.constant_literal is not None:  # subj position only
        return _constant_may_match(term.constant_literal, key, ENCODED_FIELD_CHARS)

    if term.template is not None:
        if term.term_type == TermType.LITERAL or not encode_iris:
            # literal-template fields (and unencoded IRI fields) can
            # contain separators — the skeleton argument doesn't apply
            return True
        eff = effective_iri_template(term.template, base_ns)
        return templates_may_collide(eff, key)

    # column-valued term: value space unknown
    return True


@dataclass
class PartFlags:
    subj_may: bool
    obj_may: bool
    #: rewrite may touch this branch's objects but can NEVER create a
    #: duplicate row — the branch takes the broadcast obj join and then
    #: STREAMS past the set-dedup exchange (see ``analyze_parts`` for
    #: the exactness conditions)
    dedup_exempt: bool = False

    @property
    def matchable(self) -> bool:
        return self.subj_may or self.obj_may


def analyze_part(
    subj_map: TermMap,
    obj_maps: tuple[TermMap, ...],
    key: Template,
    *,
    base_ns: str,
    encode_iris: bool,
) -> PartFlags:
    """Static flags for one emission branch: may its subject / any of its
    objects land in the key template's value space?"""
    return PartFlags(
        subj_may=term_may_match(
            subj_map, key, base_ns=base_ns, encode_iris=encode_iris, position="subj"
        ),
        obj_may=any(
            term_may_match(om, key, base_ns=base_ns, encode_iris=encode_iris, position="obj")
            for om in obj_maps
        ),
    )


def analyze_parts(
    parts,
    key: Template,
    *,
    base_ns: str,
    encode_iris: bool,
    unique_subjects: bool = False,
) -> list["tuple[DataFrame, PartFlags]"]:
    """Flag every emission branch (``TriplePart`` list) for the pruned
    rewrite, including the dedup EXEMPTION for obj-only-matchable
    branches whose rows can provably never become duplicates.

    The set-dedup after the rewrite exists because merging subjects (or
    objects) can make two previously-distinct rows equal. A branch is
    exempt — it takes the broadcast obj join but skips the dedup
    exchange — when all of the following hold:

    static (checked here):
      * ``subj_may`` is False: its subjects are never rewritten, and
        are provably outside the key-template space;
      * its emitted predicate list is duplicate-free (``TriplePart.
        preds``): rows sharing a subject (one source row's fan-out)
        differ in ``pred``, so no obj rewrite can make them equal;
      * its subject value space is disjoint from every subj_may
        branch's ORIGINAL subject space (template skeleton check) —
        post-rewrite those branches' subjects live in key space, which
        ``subj_may=False`` already excludes.

    caller contract (``unique_subjects=True``):
      * across all obj-only matchable branches, each subject VALUE
        identifies at most one source row of one branch (e.g. the
        span view's (doc_id, offset) primary key rendered through an
        injective IRI template — the docs pipeline's span-sequence
        invariant, pinned by the ``docs_reassembled`` oracle).

    Under these, any two exempt rows differ in subject or pred after
    the rewrite; exempt rows never equal passthrough rows (the
    modified position is in key space, passthrough terms are not;
    unmodified pairs fall under the raw emissions' global uniqueness)
    and never equal deduped-branch rows (disjoint subject spaces). So
    dropping them from the dedup union is exact — and the dedup
    exchange shrinks from corpus-proportional (every span/mention
    link) to metadata-proportional (doc-level rows only)."""
    flags = [
        analyze_part(
            p.subj_map, p.obj_maps, key, base_ns=base_ns, encode_iris=encode_iris
        )
        for p in parts
    ]
    if unique_subjects:
        dedup_subj_templates = []
        usable = True
        for p, f in zip(parts, flags):
            if f.subj_may:
                t = p.subj_map.template
                if (
                    t is None
                    or p.subj_map.term_type != TermType.IRI
                    or not encode_iris
                ):
                    # subject space unbounded — cannot prove any
                    # disjointness against it
                    usable = False
                else:
                    dedup_subj_templates.append(
                        effective_iri_template(t, base_ns)
                    )
        for p, f in zip(parts, flags):
            if not (usable and f.matchable and not f.subj_may):
                continue
            preds_ok = p.preds is not None and len(set(p.preds)) == len(p.preds)
            cross_ok = all(
                not term_may_match(
                    p.subj_map, dt, base_ns=base_ns,
                    encode_iris=encode_iris, position="subj",
                )
                for dt in dedup_subj_templates
            )
            f.dedup_exempt = preds_ok and cross_ok
    return [(p.df, f) for p, f in zip(parts, flags)]


def rewrite_triple_parts(
    parts: list[tuple[DataFrame, PartFlags]],
    mapping: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Apply the canonical mapping per emission branch, joining only the
    statically-matchable branches on only their matchable sides, then
    set-dedup the NON-EXEMPT matchable union ONLY (exactness proofs:
    module docstring for passthrough, ``analyze_parts`` for the
    dedup-exempt obj-only branches). Every branch is scanned exactly
    once; non-matchable branches carry no join and no shuffle, and
    exempt branches carry the broadcast obj join but no shuffle."""
    cols = columns or TRIPLE_COLUMNS
    m = F.broadcast(mapping)
    passthrough: list[DataFrame] = []
    matchable: list[DataFrame] = []
    for df, flags in parts:
        if not flags.matchable:
            passthrough.append(df.select(*cols))
            continue
        out = df
        if flags.subj_may:
            out = out.join(
                m.withColumnRenamed("iri", "subj").withColumnRenamed(
                    "canonical_iri", "_subj_canon"),
                "subj", "left",
            ).withColumn("subj", F.coalesce(F.col("_subj_canon"), F.col("subj")))
        if flags.obj_may:
            out = out.join(
                m.withColumnRenamed("iri", "obj").withColumnRenamed(
                    "canonical_iri", "_obj_canon"),
                "obj", "left",
            ).withColumn(
                "obj",
                F.when(
                    F.col("obj_kind") == "iri",
                    F.coalesce(F.col("_obj_canon"), F.col("obj")),
                ).otherwise(F.col("obj")),
            )
        if flags.dedup_exempt:
            # obj join applied, but the branch's rows can never become
            # duplicates (analyze_parts) — stream past the exchange
            passthrough.append(out.select(*cols))
        else:
            matchable.append(out.select(*cols))

    pieces = list(passthrough)
    if matchable:
        merged = matchable[0]
        for part in matchable[1:]:
            merged = merged.unionByName(part)
        pieces.append(merged.dropDuplicates())
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
