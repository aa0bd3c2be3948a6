"""Distributed triple-level precision/recall between two graphs.

The acceptance metric the reference's regression strategy implies —
"does the generated dump contain the triples the golden dump contains"
(ComplianceTests.java compares generated output against checked-in
golden files; rdf/isomorphism.py holds the driver-side, test-scale
twin of this check) — expressed as a Spark job so two corpus-scale
graphs (the built KG vs a reference export) can be scored without
collecting either: P = |got ∩ expected| / |got|, R = |got ∩ expected|
/ |expected|, F1 = harmonic mean, all over the DISTINCT triple sets
(graphs are sets).

Blank nodes carry run-local labels that never match across graphs, so
grounded comparison would score every bnode triple wrong. Before
comparing, each graph's bnode labels are rewritten to
Weisfeiler-Leman-style structural signatures: a bnode's color is the
hash of the sorted multiset of its incident (predicate, direction,
neighbor-color) triples, refined for ``bnode_rounds`` rounds from a
uniform start, with ground terms contributing their full-term hash.
Deterministic and label-free, so isomorphic neighborhoods on the two
sides converge to the SAME signature and the rewritten triples compare
as plain strings. Standard WL caveat: non-isomorphic bnodes whose
k-round neighborhoods are WL-indistinguishable share a signature, so
structurally symmetric (automorphic) bnodes collapse — on BOTH sides
equally — which leaves the set comparison correct for them; a
WL-indistinguishable non-isomorphic pair could in principle
false-match, the same limitation every signature-based isomorphism
checker (including the reference corpus's own golden comparison here,
rdf/isomorphism.py) accepts.

Scale shape: the grounded slice (typically ~all triples — the mapping
engine mints IRIs, bnodes come only from bnode-producing term maps) is
compared with one distinct + one inner join per side, both on the full
7-column key, so AQE/broadcast handles the small side; the WL
refinement touches only bnode-INCIDENT triples (filtered first) and is
``bnode_rounds`` groupBy passes over that slice. Nothing is collected:
the output is a single aggregated row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the engine's 7-column triple schema
_COLS = ["subj", "subj_kind", "pred", "obj", "obj_kind", "lang", "dtype"]


def _ground_color(value, kind, lang, dtype):
    """Full-term hash for a non-bnode endpoint (label-independent)."""
    return F.sha2(
        F.concat_ws(
            "\x1f",
            kind,
            value,
            F.coalesce(lang, F.lit("")),
            F.coalesce(dtype, F.lit("")),
        ),
        256,
    )


def _canonicalize_bnodes(triples: DataFrame, rounds: int) -> DataFrame:
    """Rewrite bnode labels to WL structural signatures (see module
    docstring). Triples without a bnode endpoint pass through; the
    refinement runs only over the bnode-incident slice."""
    has_bnode = (F.col("subj_kind") == "bnode") | (F.col("obj_kind") == "bnode")
    slice_ = triples.where(has_bnode)
    if slice_.isEmpty():
        return triples
    ground = triples.where(~has_bnode)

    # directed incidences seen from each bnode endpoint: (node, pred,
    # dir, neighbor term parts). Out-edges from a bnode subject,
    # in-edges into a bnode object.
    out_e = slice_.where(F.col("subj_kind") == "bnode").select(
        F.col("subj").alias("node"),
        F.col("pred"),
        F.lit("o").alias("dir"),
        F.col("obj").alias("nval"),
        F.col("obj_kind").alias("nkind"),
        F.col("lang").alias("nlang"),
        F.col("dtype").alias("ndtype"),
    )
    in_e = slice_.where(F.col("obj_kind") == "bnode").select(
        F.col("obj").alias("node"),
        F.col("pred"),
        F.lit("i").alias("dir"),
        F.col("subj").alias("nval"),
        F.col("subj_kind").alias("nkind"),
        F.lit(None).cast("string").alias("nlang"),
        F.lit(None).cast("string").alias("ndtype"),
    )
    edges = out_e.unionByName(in_e)

    # colors: bnodes start uniform, ground neighbors contribute their
    # full-term hash from round one
    colors = (
        edges.select("node").distinct().withColumn("color", F.lit("b0"))
    )
    for _ in range(max(1, rounds)):
        nb = edges.join(
            colors.select(
                F.col("node").alias("nval"), F.col("color").alias("ncolor")
            ),
            on="nval",
            how="left",
        ).select(
            "node",
            F.concat_ws(
                "\x1f",
                F.col("pred"),
                F.col("dir"),
                F.when(F.col("nkind") == "bnode", F.col("ncolor")).otherwise(
                    _ground_color(
                        F.col("nval"), F.col("nkind"), F.col("nlang"), F.col("ndtype")
                    )
                ),
            ).alias("sig"),
        )
        colors = nb.groupBy("node").agg(
            F.sha2(F.concat_ws("\x1e", F.sort_array(F.collect_list("sig"))), 256)
            .alias("color")
        ).localCheckpoint(eager=False)

    relab = colors.select(
        F.col("node"), F.concat(F.lit("_wl:"), F.col("color")).alias("label")
    )
    rew = (
        slice_.join(
            relab.select(F.col("node").alias("subj"), F.col("label").alias("_sl")),
            on="subj",
            how="left",
        )
        .join(
            relab.select(F.col("node").alias("obj"), F.col("label").alias("_ol")),
            on="obj",
            how="left",
        )
        .select(
            F.when(F.col("subj_kind") == "bnode", F.col("_sl"))
            .otherwise(F.col("subj"))
            .alias("subj"),
            F.col("subj_kind"),
            F.col("pred"),
            F.when(F.col("obj_kind") == "bnode", F.col("_ol"))
            .otherwise(F.col("obj"))
            .alias("obj"),
            F.col("obj_kind"),
            F.col("lang"),
            F.col("dtype"),
        )
    )
    return ground.select(*_COLS).unionByName(rew.select(*_COLS))


def triple_prf(
    got: DataFrame, expected: DataFrame, bnode_rounds: int = 3
) -> DataFrame:
    """Triple-level precision/recall/F1 of ``got`` against ``expected``.

    Returns ONE row: (got_n, expected_n, matched, precision, recall,
    f1) — counts are over the distinct triple sets after bnode
    canonicalization (bigint), scores are doubles (0.0 when the
    denominator is empty). The north-rule gate is ``precision >= 0.95
    and recall >= 0.95``.
    """
    g = _canonicalize_bnodes(got.select(*_COLS), bnode_rounds).distinct()
    e = _canonicalize_bnodes(expected.select(*_COLS), bnode_rounds).distinct()
    inter = g.intersect(e)

    def _n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    row = (
        _n(g, "got_n")
        .crossJoin(_n(e, "expected_n"))
        .crossJoin(_n(inter, "matched"))
    )
    prec = F.when(
        F.col("got_n") > 0, F.col("matched") / F.col("got_n")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("expected_n") > 0, F.col("matched") / F.col("expected_n")
    ).otherwise(F.lit(0.0))
    return row.select(
        "got_n",
        "expected_n",
        "matched",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (prec + rec) > 0, 2 * prec * rec / (prec + rec)
        ).otherwise(F.lit(0.0)).alias("f1"),
    )
