"""Blank-node-safe RDF graph comparison (driver-side, golden files).

Golden outputs contain blank nodes with arbitrary labels (D001
``mappedb.nq``), so byte comparison is wrong; graphs are compared
isomorphically: iterative color refinement over blank nodes narrows the
candidate bijections, then a backtracking search inside same-color
groups finds an exact match (corpus graphs are tiny).
"""

from __future__ import annotations

from hashlib import md5

from r2rml_parser_spark.rdf.terms import BNode, Triple


def _ground_key(t) -> str:
    return "_" if isinstance(t, BNode) else t.nt()


def _refine(triples: list[Triple]) -> dict[str, str]:
    """Blank label → refined color (stable across relabeling)."""
    bnodes = {t.label for tr in triples for t in tr if isinstance(t, BNode)}
    colors = dict.fromkeys(bnodes, "0")
    for _ in range(max(1, len(bnodes))):
        new: dict[str, str] = {}
        for b in bnodes:
            sig: list[str] = [colors[b]]
            for s, p, o in triples:
                if isinstance(s, BNode) and s.label == b:
                    oc = colors[o.label] if isinstance(o, BNode) else _ground_key(o)
                    sig.append(f"out|{p.nt()}|{oc}")
                if isinstance(o, BNode) and o.label == b:
                    sc = colors[s.label] if isinstance(s, BNode) else _ground_key(s)
                    sig.append(f"in|{p.nt()}|{sc}")
            new[b] = md5("\n".join(sorted(sig)).encode()).hexdigest()
        if new == colors:
            break
        colors = new
    return colors


def _rendered(triples: list[Triple], bnode_map: dict[str, str]) -> frozenset:
    out = set()
    for s, p, o in triples:
        s2 = "_:" + bnode_map[s.label] if isinstance(s, BNode) else s.nt()
        o2 = "_:" + bnode_map[o.label] if isinstance(o, BNode) else o.nt()
        out.add((s2, p.nt(), o2))
    return frozenset(out)


def isomorphic(a: list[Triple], b: list[Triple]) -> bool:
    a, b = list(set(a)), list(set(b))
    if len(a) != len(b):
        return False
    ca, cb = _refine(a), _refine(b)
    if sorted(ca.values()) != sorted(cb.values()):
        return False
    target = _rendered(a, {label: label for label in ca})

    labels_b = sorted(cb)
    candidates = {lb: sorted(la for la in ca if ca[la] == cb[lb]) for lb in labels_b}

    def search(i: int, mapping: dict[str, str], used: set[str]) -> bool:
        if i == len(labels_b):
            return _rendered(b, mapping) == target
        lb = labels_b[i]
        for la in candidates[lb]:
            if la in used:
                continue
            mapping[lb] = la
            used.add(la)
            if search(i + 1, mapping, used):
                return True
            used.discard(la)
            del mapping[lb]
        return False

    return search(0, {}, set())


def diff_ground(a: list[Triple], b: list[Triple]) -> tuple[set, set]:
    """(only-in-a, only-in-b) over ground renderings — debugging helper."""
    sa = {(s.nt(), p.nt(), o.nt()) for s, p, o in a}
    sb = {(s.nt(), p.nt(), o.nt()) for s, p, o in b}
    return sa - sb, sb - sa


def precision_recall(got: list[Triple], expected: list[Triple]) -> tuple[float, float]:
    """Triple-level P/R after canonical color relabeling (exact on the
    corpus, where refinement fully separates blank nodes)."""
    rg = _rendered(got, _refine(got))
    re_ = _rendered(expected, _refine(expected))
    inter = len(rg & re_)
    p = inter / len(rg) if rg else 1.0
    r = inter / len(re_) if re_ else 1.0
    return p, r
