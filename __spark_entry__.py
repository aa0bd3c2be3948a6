"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full docs→KG pipeline (span synthesis,
mention detection, mapping-driven triple emission, MinHash+CC
canonicalization) at sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §3 + the data-ops additions; DuckDB oracles reproduce each
result bit-for-bit (md5-based hashing, identical folds, rounded
doubles). Iterative CC is oracled via a DuckDB recursive-CTE closure;
even the mapInPandas feature extraction is oracled — its fake decode
is a hex-string md5 chain DuckDB can replay exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from r2rml_parser_spark.pipeline import build_kg

    return build_kg(spark, "/root/testdata/sf0.001", canonicalize=True)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small single-split parquet: spread rows so md5/shingle-heavy
    # operators use every core (no-op effect on results)
    par = spark.sparkContext.defaultParallelism
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    par = spark.sparkContext.defaultParallelism
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(par)


# -- KG construction ---------------------------------------------------

def q_kg_docs_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.pipeline import build_kg

    return build_kg(spark, sf_dir, canonicalize=False)


def q_kg_tpch_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.tpch_kg import build_tpch_kg

    return build_tpch_kg(spark, sf_dir)


def q_sparql_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL BGP+FILTER answered over the KG the engine just built
    (the reference's own test pattern, ComplianceTests.java:147-168)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql

    return run_tpch_sparql(spark, sf_dir)


def q_sparql_agg_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregates (GROUP BY + COUNT/COUNT DISTINCT) over the
    generated KG — customers-per-nation rollup."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_agg

    return run_tpch_sparql_agg(spark, sf_dir)


def q_sparql_typed_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL datatype() accessor + numeric FILTER over xsd:integer
    literals (SPARQL 1.1 operator dispatch)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_typed

    return run_tpch_sparql_typed(spark, sf_dir)


def q_sparql_str_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL string builtins (STRENDS, CONTAINS over STR()) + VALUES
    inline bindings over the generated KG."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_str

    return run_tpch_sparql_str(spark, sf_dir)


def q_sparql_exists_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER NOT EXISTS (anti join) over the generated KG —
    nations with no BUILDING-segment customer."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_exists

    return run_tpch_sparql_exists(spark, sf_dir)


def q_sparql_construct_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT over the generated KG — derives a new
    customer→region graph (7-column triples result)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_construct

    return run_tpch_sparql_construct(spark, sf_dir)


def q_sparql_path_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property path (two-hop sequence) + BIND IRI-minting over
    the generated KG."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_path

    return run_tpch_sparql_path(spark, sf_dir)


def q_sparql_closure_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL closure path (partOf+) over a CONSTRUCT-derived
    hierarchy — path-doubling reachability, recursive-CTE oracle."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_closure

    return run_tpch_sparql_closure(spark, sf_dir)


def q_sparql_store_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL answered from the persisted range-clustered GraphStore
    (sync -> parquet partitions sorted on (subj, pred, obj) -> BGP over
    the store read path with scan-level pruning)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_store

    return run_tpch_sparql_store(spark, sf_dir)


def q_sparql_store_graph_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-as-dataset (r5): GRAPH ?g over the persisted GraphStore —
    each mapping's partition is a named graph (IRI = triples-map URI),
    so per-mapping provenance counts come off the store layout."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_store_graph

    return run_tpch_sparql_store_graph(spark, sf_dir)


def q_sparql_closure_seeded_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL closure with VARIABLE endpoints seeded by sibling
    patterns (multi-source frontier walk, not full reachability);
    recursive-CTE oracle replays the seeded expansion."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_closure_seeded

    return run_tpch_sparql_closure_seeded(spark, sf_dir)


def q_sparql_pathx_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL path grammar: alternation over a sequence
    ((p1/p2)|p3 → UNION branches) + closure over a parenthesized
    group ((p1/p2)+ → fixpoint over a derived edge relation)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_pathx

    return run_tpch_sparql_pathx(spark, sf_dir)


def q_sparql_union_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-variable UNION (branches bind DIFFERENT vars) joined to a
    required pattern via the exact compatible-join decomposition
    (unbound ?cname takes the pattern's binding — SPARQL §18.5)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_union

    return run_tpch_sparql_union(spark, sf_dir)


def q_sparql_optfilter_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-group OPTIONAL filter — LeftJoin(A, G, F) with F comparing
    a group var against a required-side var, compiled into the
    left-join condition (non-matching rows keep ?nname unbound)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_optfilter

    return run_tpch_sparql_optfilter(spark, sf_dir)


def q_sparql_exists_expr_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS composing inside a boolean FILTER expression (|| with a
    string test), compiled to a per-row flag via a key-distinct left
    join rather than the standalone semi-join."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_exists_expr

    return run_tpch_sparql_exists_expr(spark, sf_dir)


def q_sparql_alt_opt_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple forward alternation inside an OPTIONAL group (r4 predset
    collapse: one pred-IN scan, legal in braced groups) — customers
    extend twice, nations take the left join's NULL row."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_alt_opt

    return run_tpch_sparql_alt_opt(spark, sf_dir)


def q_sparql_groupbind_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-local BIND inside an OPTIONAL feeding the group's FILTER
    (r4), plus numeric-function BIND (FLOOR over arithmetic) at the
    top level — both oracle-pinned."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_groupbind

    return run_tpch_sparql_groupbind(spark, sf_dir)


def q_sparql_ebv_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§17.2.2 effective boolean values (late r4): numeric EBV of a
    bare arithmetic FILTER operand, a boolean-comparison BIND, and
    EBV of the minted xsd:boolean composing with ||."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_ebv

    return run_tpch_sparql_ebv(spark, sf_dir)


def q_sparql_existsnull_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-OPTIONAL-nullable EXISTS correlation key (late r4): the
    inert key leaves the correlation — NOT EXISTS reduces to the
    required part's existence, keeping exactly the nation subjects."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_existsnull

    return run_tpch_sparql_existsnull(spark, sf_dir)


def q_sparql_twoside_filter_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-group filter x two-sided compatible LEFT join (late r4
    session 2, the last formerly-rejected LeftJoin form): deferred F
    over the outer ?cname, shared ?nat nullable on both sides."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_twoside_filter

    return run_tpch_sparql_twoside_filter(spark, sf_dir)


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity PageRank over the generated KG (iterative DataFrame
    joins, exact-integer arithmetic so the DuckDB unrolled-CTE twin
    is bit-for-bit — operators/pagerank.py)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_pagerank

    return run_tpch_pagerank(spark, sf_dir)


def q_kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered negative sampling over KG edges (KGE training pairs):
    corrupt entity = entities[md5(s|p|o|slot) mod N], collisions and
    already-true edges filtered - fully deterministic, DuckDB-exact."""
    from r2rml_parser_spark.tpch_kg import run_tpch_negatives

    return run_tpch_negatives(spark, sf_dir)


def q_sparql_boolbind_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-valued BIND expressions (§17.2, late r4): a bare EXISTS
    probe (flagged at the BIND's own timeline point) and a comparison
    ladder, each minting "true"/"false"^^xsd:boolean terms."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_boolbind

    return run_tpch_sparql_boolbind(spark, sf_dir)


def q_sparql_npspath_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-grammar residue in one query (r4): a closure whose closed
    group itself contains a closure ((inNation+/inRegion)* — evaluated
    by the recursive derived-relation path, seeded from the
    sibling-bound ?c side), a negated property set with mixed
    forward+inverse members (§9.1 split), and alternation branches
    carrying a sequence INSIDE an OPTIONAL group (one "pathrel"
    derived-relation pattern)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_npspath

    return run_tpch_sparql_npspath(spark, sf_dir)


def q_sparql_arith_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§19.8 expression ladder (r4): parenthesized arithmetic groups as
    primaries — nested value groups in a FILTER comparison, a
    value-expression IN member, a negated comparison group, and a BIND
    multiplying two parenthesized sums."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_arith

    return run_tpch_sparql_arith(spark, sf_dir)


def q_sparql_values_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES with UNDEF (r4): the unbound row is §18.5-compatible with
    every solution — compiled through the same compatible-join
    decomposition mixed-variable UNIONs use."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_values

    return run_tpch_sparql_values(spark, sf_dir)


def q_sparql_aggsem_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict aggregate semantics (late r4): grouping the whole KG by
    predicate — SUM is unbound for any group holding a bound
    non-numeric value (§18.5.1.5 error propagation, the W3C agg-err
    behavior) and MIN/MAX are value-aware extrema under the ORDER BY
    total order (numeric terms by VALUE before non-numeric terms by
    codepoint)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_aggsem

    return run_tpch_sparql_aggsem(spark, sf_dir)


def q_sparql_latejoin_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual-order Join(LeftJoin(A,G),B) (late r4): a pattern after
    an OPTIONAL sharing ?r compiles as a late segment compatible-joined
    after the left join — unbound ?r rows take the pattern's binding."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_latejoin

    return run_tpch_sparql_latejoin(spark, sf_dir)


def q_sparql_optcompat_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left compatible join (full r4, formerly rejected): the second
    OPTIONAL joins on ?n, which the first OPTIONAL may have left
    unbound — the sliced LeftJoin decomposition. All three §18.5
    kept-μ cases fire: bound-matched, bound-unmatched (kept, ?r
    unbound), and unbound-?n taking the group's (?n, ?r) binding."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_optcompat

    return run_tpch_sparql_optcompat(spark, sf_dir)


def q_sparql_optdisjoint_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint-domain OPTIONAL (full r4, formerly rejected): the group
    shares no variable, so every group solution is compatible with
    every outer one — a bag cross product whose multiplicity counts
    the unprojected ?x bindings."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_optdisjoint

    return run_tpch_sparql_optdisjoint(spark, sf_dir)


def q_sparql_nestedopt_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-OPTIONAL compatible join (late r4, formerly rejected):
    inside the OPTIONAL group the second nested OPTIONAL joins on
    ?nation, which the first nested OPTIONAL leaves unbound for most
    rows — the kept-mu merge via the nested slice decomposition."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_nestedopt

    return run_tpch_sparql_nestedopt(spark, sf_dir)


def q_sparql_unionopt_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL inside a UNION branch (late r4, formerly rejected):
    the branch compiles as a group via the recursive LeftJoin
    machinery; its OPTIONAL-nullable var is union-nullable."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_unionopt

    return run_tpch_sparql_unionopt(spark, sf_dir)


def q_sparql_twoside_left_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided compatible LEFT join (late r4, formerly the last
    LeftJoin rejection): the shared key is nullable on the outer side
    (earlier OPTIONAL) and the group side (its nested OPTIONAL)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_twoside_left

    return run_tpch_sparql_twoside_left(spark, sf_dir)


def q_sparql_minusopt_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINUS with a nested OPTIONAL (late r4, formerly rejected): the
    shared key is nullable on both sides — the two-sided SPARQL 8.3
    slice decomposition where disjoint-domain pairs remove nothing."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_minusopt

    return run_tpch_sparql_minusopt(spark, sf_dir)


def q_sparql_minus_scope_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINUS snapshot domain (late r4): Minus evaluates at its textual
    point, so a variable first bound by a LATER OPTIONAL never keys the
    anti join — LeftJoin(Minus(A,M),G), not Minus(LeftJoin(A,G),M)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_minus_scope

    return run_tpch_sparql_minus_scope(spark, sf_dir)


def q_sparql_timeline_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual timeline (full r4, formerly rejected): a pattern run
    after an OPTIONAL sharing its nullable variable joins at ITS
    textual position — Join(LeftJoin(A,G),B) with the §18.5 compatible
    join (unbound ?n takes every nation's binding)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_timeline

    return run_tpch_sparql_timeline(spark, sf_dir)


def q_sparql_minus_timeline_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join(Minus(A,M),B) in textual order (full r4), discriminating:
    the MINUS removes only the rows whose ?n is bound AT ITS POINT
    (BUILDING customers); the pattern then rebinds ?n — a MINUS hoisted
    to the end would see the rebound ?n and empty the result."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_minus_timeline

    return run_tpch_sparql_minus_timeline(spark, sf_dir)


def q_sparql_aggdistinct_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG(DISTINCT) (r4): §18.5.1 Distinct over RDF TERMS — the
    doubled bag (each ?k reaches the group via two predicates) dedups
    by full term before the numeric fold."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_aggdistinct

    return run_tpch_sparql_aggdistinct(spark, sf_dir)


def q_sparql_orderexpr_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY expression (r4): DESC(?k * 2 - 1) over a NON-projected
    variable, sorted over the solution relation before projection
    (§18.2.5), LIMIT making the ordering observable in the result set."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_orderexpr

    return run_tpch_sparql_orderexpr(spark, sf_dir)


def q_sparql_selectexpr_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation SELECT expressions (r4): (?s - ?n) over
    aggregate aliases and UCASE(STR(?key)) over a group key, evaluated
    after the groupBy per SPARQL 1.1 section 18.2.4.4."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_selectexpr

    return run_tpch_sparql_selectexpr(spark, sf_dir)


def q_sparql_having_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw aggregate calls in HAVING and ORDER BY (r4): hoisted into
    internal aliased items computed by the same groupBy."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_having

    return run_tpch_sparql_having(spark, sf_dir)


def q_sparql_aggexpr_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an expression (r4): SUM(?k * 2 + 1) per nation —
    the TPC-H Q1 shape; the argument evaluates as a hidden
    pre-aggregation BIND."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_aggexpr

    return run_tpch_sparql_aggexpr(spark, sf_dir)


def q_sparql_pathn_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded path quantifier p{n,m} (r5): (inNation|inRegion){1,2}
    desugared to the alternation of 1- and 2-fold sequences (§9.3 bag
    union) — nation at one step, region at two."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_pathn

    return run_tpch_sparql_pathn(spark, sf_dir)


def q_sparql_graph_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named graphs (r5): rr:graphMap-materialized quads + GRAPH ?g
    aggregation — per-provenance-graph triple counts over the
    per-nation customer graphs (§13.3; the reference's rr:graphMap is
    a log-only stub, Parser.java:241-270)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_graph

    return run_tpch_sparql_graph(spark, sf_dir)


def q_sparql_graphiri_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH <iri> dataset slice joined with a GRAPH ?g block (r5):
    nation names live only in the constant reference graph, inNation
    edges in per-nation graphs — the join crosses graph boundaries
    through the shared variable."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_graphiri

    return run_tpch_sparql_graphiri(spark, sf_dir)


def q_sparql_nested_exists_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS nested inside EXISTS (late r4): recursive
    Filter(EXISTS(P), G) — the inner probe filters the outer probe's
    solutions before the outer semi-join."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_nested_exists

    return run_tpch_sparql_nested_exists(spark, sf_dir)


def q_sparql_subq_postagg_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation SELECT expression INSIDE a { SELECT } subquery
    (late r4, §18.2.4.4): (SUM(?k) * 2 - COUNT(?k) AS ?adj) with
    subquery HAVING, group key joined to the outer pattern, derived
    alias carried through and sorted numerically."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_subq_postagg

    return run_tpch_sparql_subq_postagg(spark, sf_dir)


def q_sparql_twosided_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided unbound-compatible join (late r4): two mixed-variable
    UNIONs sharing ?seg, which either side may leave unbound — the
    slice-pair decomposition (full §18.5 Join compatibility)."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_twosided

    return run_tpch_sparql_twosided(spark, sf_dir)


def q_sparql_cast_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath constructor casts (late r4, §17.5): SUBSTR + xsd:integer
    over the customer name drives a numeric FILTER."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_cast

    return run_tpch_sparql_cast(spark, sf_dir)


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixing (curriculum construction): keep 50% of
    en, 20% of de, 5% of every other language — deterministic
    per-group md5-prefix cut, no shuffle, oracle-exact."""
    from r2rml_parser_spark.operators.sampling import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    return domain_mix(docs, "lang", {"en": 0.5, "de": 0.2}, default=0.05)


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (r4): deterministic PII-ish tokens are seeded
    into every 5th document, then redacted with per-kind counts —
    one codegen projection, no shuffle; the DuckDB oracle replays the
    seeding and the engine-portable regex set exactly."""
    from r2rml_parser_spark.operators.scrub import scrub_pii

    docs = _docs(spark, sf_dir)
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.org or +1-555-0142 at 10.0."),
                F.col("doc_id") % 200,
                F.lit(".7"),
            ),
        ).otherwise(F.col("text")),
    )
    return scrub_pii(seeded).select(
        "doc_id", "text", "n_email", "n_phone", "n_ipv4"
    )


def q_triple_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triple-level P/R (r4): the north rule's own
    acceptance metric ("matching the reference's emitted (subj, pred,
    obj) triples, P/R >= 0.95") as a Spark job — got = the TPC-H KG
    minus its ex:segment triples plus one synthetic wrong triple,
    expected = the full KG, so precision < 1 and recall < 1 are both
    exercised with closed-form values at any SF."""
    from r2rml_parser_spark.operators.evaluate import triple_prf
    from r2rml_parser_spark.tpch_kg import KG, ONT, build_tpch_kg

    kg = build_tpch_kg(spark, sf_dir).localCheckpoint(eager=False)
    bogus = spark.createDataFrame(
        [
            (
                f"{KG}/synthetic/x",
                "iri",
                f"{ONT}bogus",
                f"{KG}/synthetic/y",
                "iri",
                None,
                None,
            )
        ],
        "subj string, subj_kind string, pred string, obj string, "
        "obj_kind string, lang string, dtype string",
    )
    got = kg.where(F.col("pred") != f"{ONT}segment").unionByName(bogus)
    return triple_prf(got, kg)


def q_sparql_describe_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE (concise bounded description) of every Nation
    in the generated KG."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_describe

    return run_tpch_sparql_describe(spark, sf_dir)


def q_sparql_subquery_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subquery (aggregate-then-join) over the generated KG."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_subquery

    return run_tpch_sparql_subquery(spark, sf_dir)


def q_sparql_groupconcat_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GROUP_CONCAT(DISTINCT)/SAMPLE aggregates over the KG."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_groupconcat

    return run_tpch_sparql_groupconcat(spark, sf_dir)


def q_sparql_datetime_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL datetime accessors (YEAR/HOURS) over an events KG with
    canonical xsd:dateTime literals."""
    from r2rml_parser_spark.tpch_kg import run_tpch_sparql_datetime

    return run_tpch_sparql_datetime(spark, sf_dir)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (batch construction) over the
    documents table; char counts stand in for tokens so the DuckDB
    oracle replays the packing exactly."""
    from pyspark.sql import functions as FF

    from r2rml_parser_spark.operators.sampling import pack_sequences

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", FF.length("text").cast("bigint").alias("n_tokens"))
    )
    return pack_sequences(docs, budget=5000)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample (training-data curation
    op): ≤20 docs per lang by md5(doc_id) order."""
    from r2rml_parser_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 20)


def q_proportional_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% corpus sample via the md5 hex-prefix cut."""
    from r2rml_parser_spark.operators.sampling import proportional_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return proportional_sample(docs, 0.25)


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc count of word 8-grams shared
    with a deterministic md5-cut 'benchmark' subset of the corpus —
    benchmark grams broadcast, corpus side never shuffles."""
    from r2rml_parser_spark.operators.decontaminate import contaminated_ids

    docs = _docs(spark, sf_dir)
    bench = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "08"
    )
    return contaminated_ids(docs, bench, n=8)


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal over the interleaved span
    sequence: text spans recurring verbatim in ≥3 distinct docs are
    dropped via a broadcast anti join (the corpus never shuffles);
    media spans pass through untouched."""
    from r2rml_parser_spark.operators.boilerplate import strip_boilerplate
    from r2rml_parser_spark.sources.docs import synth_span_rows

    spans = synth_span_rows(spark, sf_dir)
    return strip_boilerplate(spans, min_docs=3).select(
        "doc_id",
        F.col("offset").alias("span_offset"),
        "kind",
        F.md5(F.coalesce("text", "media_ref")).alias("content_md5"),
    )


def q_span_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.sources.docs import span_view, synth_docs

    return span_view(synth_docs(spark, sf_dir)).withColumnRenamed("offset", "span_offset")


def q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.mentions import detect_mentions, entity_dictionary
    from r2rml_parser_spark.sources.docs import span_view, synth_docs

    spans = span_view(synth_docs(spark, sf_dir))
    return detect_mentions(spans, entity_dictionary(spark)).withColumnRenamed(
        "offset", "span_offset"
    )


# -- dedup family ------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.dedup import minhash_band_buckets

    return minhash_band_buckets(_docs(spark, sf_dir))


def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.dedup import neardup_edges

    # fused single-shingle-pass form; identical output to the
    # minhash_candidate_pairs + jaccard_pairs composition (tested)
    return neardup_edges(_docs(spark, sf_dir), threshold=0.8, hash_family="md5")


def q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.dedup import simhash_groups

    return simhash_groups(_docs(spark, sf_dir))


# -- text analysis -----------------------------------------------------

def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (60-token windows, 12-token
    overlap): shuffle-free per-document fan-out, exact DuckDB twin."""
    from r2rml_parser_spark.operators.chunking import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), 60, 12)


def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 tokens by occurrence count with
    document frequency (deterministic head, two-phase counts)."""
    from r2rml_parser_spark.operators.keywords import token_frequencies

    return token_frequencies(_docs(spark, sf_dir), 50)


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (corpus-global smoothed idf;
    rounded-doubles oracle, window ordered on the rounded score)."""
    from r2rml_parser_spark.operators.keywords import tfidf_keywords

    return tfidf_keywords(_docs(spark, sf_dir), 3)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.textstats import quality_stats

    return quality_stats(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.textstats import bpe_ish_token_count, token_count

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_pieces"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.textstats import gopher_rules

    return gopher_rules(_docs(spark, sf_dir))


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc duplicate/top word-bigram fractions (Gopher repetition
    filters) — zero-shuffle in-row signals over one documents scan."""
    from r2rml_parser_spark.operators.textstats import repetition_signals

    return repetition_signals(_docs(spark, sf_dir), n=2)


# -- event analytics ---------------------------------------------------

def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.events import windowed_event_stats

    return windowed_event_stats(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.events import sessionize

    return sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))


# -- similarity search -------------------------------------------------

def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.similarity import cosine_topk

    emb = _embeddings(spark, sf_dir)
    return cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.similarity import embedding_neardup

    return embedding_neardup(_embeddings(spark, sf_dir), threshold=0.8)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark, sf_dir)
    return ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5, nprobe=2)


# -- non-SQL-expressible (rows-only checks) ----------------------------

def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from r2rml_parser_spark.operators.components import connected_components
    from r2rml_parser_spark.operators.dedup import minhash_candidate_pairs

    docs = _docs(spark, sf_dir)
    edges = minhash_candidate_pairs(docs).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    return connected_components(edges)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction, projected to scalar double
    columns (feat_0..feat_7) so the driver canonicalizer can sort/hash
    the frame — and so the md5-arithmetic DuckDB oracle can check the
    actual feature values, not just row counts."""
    from r2rml_parser_spark.operators.multimodal import features_checkable, synth_media_table
    from r2rml_parser_spark.sources.docs import span_view, synth_docs

    media = synth_media_table(span_view(synth_docs(spark, sf_dir)))
    return features_checkable(media)


def q_docs_reassembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence invariant surface: explode → shuffle → reassemble,
    returning per-doc sequence fingerprints (SQL-checkable)."""
    from r2rml_parser_spark.sources.docs import reassemble, span_view, synth_docs

    docs = reassemble(span_view(synth_docs(spark, sf_dir)).repartition(32, "kind"))
    seq = F.transform(
        "spans",
        lambda s: F.concat_ws(
            "\x01",
            s["kind"], F.coalesce(s["text"], F.lit("")),
            F.coalesce(s["media_ref"], F.lit("")), s["offset"].cast("string"),
        ),
    )
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.md5(F.array_join(seq, "\x02")).alias("sequence_md5"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_docs_triples": q_kg_docs_triples,
        "kg_tpch_triples": q_kg_tpch_triples,
        "sparql_kg": q_sparql_kg,
        "sparql_store_kg": q_sparql_store_kg,
        "sparql_store_graph_kg": q_sparql_store_graph_kg,
        "sparql_agg_kg": q_sparql_agg_kg,
        "sparql_typed_kg": q_sparql_typed_kg,
        "sparql_str_kg": q_sparql_str_kg,
        "sparql_exists_kg": q_sparql_exists_kg,
        "sparql_construct_kg": q_sparql_construct_kg,
        "sparql_path_kg": q_sparql_path_kg,
        "sparql_closure_kg": q_sparql_closure_kg,
        "sparql_closure_seeded_kg": q_sparql_closure_seeded_kg,
        "sparql_pathx_kg": q_sparql_pathx_kg,
        "sparql_union_kg": q_sparql_union_kg,
        "sparql_optfilter_kg": q_sparql_optfilter_kg,
        "sparql_exists_expr_kg": q_sparql_exists_expr_kg,
        "sparql_alt_opt_kg": q_sparql_alt_opt_kg,
        "sparql_npspath_kg": q_sparql_npspath_kg,
        "sparql_groupbind_kg": q_sparql_groupbind_kg,
        "sparql_boolbind_kg": q_sparql_boolbind_kg,
        "kg_pagerank": q_kg_pagerank,
        "kg_negatives": q_kg_negatives,
        "sparql_twoside_filter_kg": q_sparql_twoside_filter_kg,
        "sparql_ebv_kg": q_sparql_ebv_kg,
        "sparql_existsnull_kg": q_sparql_existsnull_kg,
        "sparql_arith_kg": q_sparql_arith_kg,
        "sparql_values_kg": q_sparql_values_kg,
        "sparql_aggdistinct_kg": q_sparql_aggdistinct_kg,
        "sparql_aggsem_kg": q_sparql_aggsem_kg,
        "sparql_latejoin_kg": q_sparql_latejoin_kg,
        "sparql_minus_scope_kg": q_sparql_minus_scope_kg,
        "sparql_timeline_kg": q_sparql_timeline_kg,
        "sparql_minus_timeline_kg": q_sparql_minus_timeline_kg,
        "sparql_optcompat_kg": q_sparql_optcompat_kg,
        "sparql_optdisjoint_kg": q_sparql_optdisjoint_kg,
        "sparql_nestedopt_kg": q_sparql_nestedopt_kg,
        "sparql_unionopt_kg": q_sparql_unionopt_kg,
        "sparql_twoside_left_kg": q_sparql_twoside_left_kg,
        "sparql_minusopt_kg": q_sparql_minusopt_kg,
        "sparql_orderexpr_kg": q_sparql_orderexpr_kg,
        "sparql_selectexpr_kg": q_sparql_selectexpr_kg,
        "sparql_having_kg": q_sparql_having_kg,
        "sparql_aggexpr_kg": q_sparql_aggexpr_kg,
        "sparql_nested_exists_kg": q_sparql_nested_exists_kg,
        "sparql_subq_postagg_kg": q_sparql_subq_postagg_kg,
        "sparql_twosided_kg": q_sparql_twosided_kg,
        "sparql_cast_kg": q_sparql_cast_kg,
        "sparql_pathn_kg": q_sparql_pathn_kg,
        "sparql_graph_kg": q_sparql_graph_kg,
        "sparql_graphiri_kg": q_sparql_graphiri_kg,
        "domain_mix": q_domain_mix,
        "scrub_pii": q_scrub_pii,
        "triple_prf": q_triple_prf,
        "sparql_describe_kg": q_sparql_describe_kg,
        "sparql_subquery_kg": q_sparql_subquery_kg,
        "sparql_groupconcat_kg": q_sparql_groupconcat_kg,
        "sparql_datetime_kg": q_sparql_datetime_kg,
        "span_view": q_span_view,
        "mentions": q_mentions,
        "pack_sequences": q_pack_sequences,
        "stratified_sample": q_stratified_sample,
        "proportional_sample": q_proportional_sample,
        "decontamination": q_decontamination,
        "strip_boilerplate": q_strip_boilerplate,
        "dedup_exact": q_dedup_exact,
        "minhash_bands": q_minhash_bands,
        "neardup_pairs": q_neardup_pairs,
        "simhash_groups": q_simhash_groups,
        "text_quality": q_text_quality,
        "tfidf_keywords": q_tfidf_keywords,
        "token_frequencies": q_token_frequencies,
        "chunk_docs": q_chunk_docs,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "gopher_rules": q_gopher_rules,
        "repetition_signals": q_repetition_signals,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_neardup": q_embedding_neardup,
        "windowed_events": q_windowed_events,
        "sessionized_events": q_sessionized_events,
        "docs_reassembled": q_docs_reassembled,
        "connected_components": q_connected_components,
        "ann_ivf_topk": q_ann_ivf_topk,
        "media_features": q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    from r2rml_parser_spark import oracles
    from r2rml_parser_spark.operators import events as events_ops
    from r2rml_parser_spark.operators.mentions import mentions_oracle_sql
    from r2rml_parser_spark.operators.multimodal import media_features_sql
    from r2rml_parser_spark.pipeline import kg_oracle_sql
    from r2rml_parser_spark.sources.docs import SPAN_VIEW_ORACLE_SQL
    from r2rml_parser_spark.tpch_kg import (
        KG as TPCH_KG_NS,
        ONT as TPCH_ONT,
        TPCH_KG_ORACLE_SQL,
        TPCH_SPARQL_AGG_ORACLE_SQL,
        TPCH_SPARQL_ORACLE_SQL,
        TPCH_SPARQL_CLOSURE_ORACLE_SQL,
        TPCH_SPARQL_CLOSURE_SEEDED_ORACLE_SQL,
        TPCH_SPARQL_PATHX_ORACLE_SQL,
        TPCH_SPARQL_CONSTRUCT_ORACLE_SQL,
        TPCH_SPARQL_DATETIME_ORACLE_SQL,
        TPCH_SPARQL_DESCRIBE_ORACLE_SQL,
        TPCH_SPARQL_EXISTS_ORACLE_SQL,
        TPCH_SPARQL_EXISTS_EXPR_ORACLE_SQL,
        TPCH_SPARQL_ALT_OPT_ORACLE_SQL,
        TPCH_SPARQL_NPSPATH_ORACLE_SQL,
        TPCH_SPARQL_GROUPBIND_ORACLE_SQL,
        TPCH_SPARQL_BOOLBIND_ORACLE_SQL,
        TPCH_PAGERANK_ORACLE_SQL,
        TPCH_NEGATIVES_ORACLE_SQL,
        TPCH_SPARQL_TWOSIDE_FILTER_ORACLE_SQL,
        TPCH_SPARQL_EBV_ORACLE_SQL,
        TPCH_SPARQL_EXISTSNULL_ORACLE_SQL,
        TPCH_SPARQL_ARITH_ORACLE_SQL,
        TPCH_SPARQL_VALUES_ORACLE_SQL,
        TPCH_SPARQL_AGGDISTINCT_ORACLE_SQL,
        TPCH_SPARQL_AGGSEM_ORACLE_SQL,
        TPCH_SPARQL_LATEJOIN_ORACLE_SQL,
        TPCH_SPARQL_MINUS_SCOPE_ORACLE_SQL,
        TPCH_SPARQL_TIMELINE_ORACLE_SQL,
        TPCH_SPARQL_MINUS_TIMELINE_ORACLE_SQL,
        TPCH_SPARQL_OPTCOMPAT_ORACLE_SQL,
        TPCH_SPARQL_OPTDISJOINT_ORACLE_SQL,
        TPCH_SPARQL_NESTEDOPT_ORACLE_SQL,
        TPCH_SPARQL_UNIONOPT_ORACLE_SQL,
        TPCH_SPARQL_TWOSIDE_LEFT_ORACLE_SQL,
        TPCH_SPARQL_MINUSOPT_ORACLE_SQL,
        TPCH_SPARQL_ORDEREXPR_ORACLE_SQL,
        TPCH_SPARQL_SELECTEXPR_ORACLE_SQL,
        TPCH_SPARQL_HAVING_ORACLE_SQL,
        TPCH_SPARQL_AGGEXPR_ORACLE_SQL,
        TPCH_SPARQL_NESTED_EXISTS_ORACLE_SQL,
        TPCH_SPARQL_SUBQ_POSTAGG_ORACLE_SQL,
        TPCH_SPARQL_TWOSIDED_ORACLE_SQL,
        TPCH_SPARQL_CAST_ORACLE_SQL,
        TPCH_SPARQL_GRAPH_ORACLE_SQL,
        TPCH_SPARQL_GRAPHIRI_ORACLE_SQL,
        TPCH_SPARQL_PATHN_ORACLE_SQL,
        TPCH_SPARQL_STORE_GRAPH_ORACLE_SQL,
        TPCH_SPARQL_UNION_ORACLE_SQL,
        TPCH_SPARQL_OPTFILTER_ORACLE_SQL,
        TPCH_SPARQL_GROUPCONCAT_ORACLE_SQL,
        TPCH_SPARQL_SUBQUERY_ORACLE_SQL,
        TPCH_SPARQL_PATH_ORACLE_SQL,
        TPCH_SPARQL_STR_ORACLE_SQL,
        TPCH_SPARQL_TYPED_ORACLE_SQL,
    )

    span_sql = f"SELECT doc_id, lang, source, kind, text, media_ref, \"offset\" AS span_offset FROM ({SPAN_VIEW_ORACLE_SQL}) v"
    reassembled_sql = f"""
WITH sv AS ({SPAN_VIEW_ORACLE_SQL}),
seq AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             list_sort(list(
               {{'o': "offset", 'line': kind || chr(1) || coalesce(text, '') ||
                 chr(1) || coalesce(media_ref, '') || chr(1) || "offset"}})),
             x -> x.line),
           chr(2)) AS joined,
         count(*) AS n_spans
  FROM sv GROUP BY doc_id
)
SELECT doc_id, CAST(n_spans AS INT) AS n_spans, md5(joined) AS sequence_md5 FROM seq
"""
    return {
        "kg_docs_triples": kg_oracle_sql(),
        "kg_tpch_triples": TPCH_KG_ORACLE_SQL,
        "sparql_kg": TPCH_SPARQL_ORACLE_SQL,
        # same result set as sparql_kg, read back from the store
        "sparql_store_kg": TPCH_SPARQL_ORACLE_SQL,
        "sparql_store_graph_kg": TPCH_SPARQL_STORE_GRAPH_ORACLE_SQL,
        "sparql_agg_kg": TPCH_SPARQL_AGG_ORACLE_SQL,
        "sparql_typed_kg": TPCH_SPARQL_TYPED_ORACLE_SQL,
        "sparql_str_kg": TPCH_SPARQL_STR_ORACLE_SQL,
        "sparql_exists_kg": TPCH_SPARQL_EXISTS_ORACLE_SQL,
        "sparql_construct_kg": TPCH_SPARQL_CONSTRUCT_ORACLE_SQL,
        "sparql_path_kg": TPCH_SPARQL_PATH_ORACLE_SQL,
        "sparql_closure_kg": TPCH_SPARQL_CLOSURE_ORACLE_SQL,
        "sparql_closure_seeded_kg": TPCH_SPARQL_CLOSURE_SEEDED_ORACLE_SQL,
        "sparql_pathx_kg": TPCH_SPARQL_PATHX_ORACLE_SQL,
        "sparql_union_kg": TPCH_SPARQL_UNION_ORACLE_SQL,
        "sparql_optfilter_kg": TPCH_SPARQL_OPTFILTER_ORACLE_SQL,
        "sparql_exists_expr_kg": TPCH_SPARQL_EXISTS_EXPR_ORACLE_SQL,
        "sparql_alt_opt_kg": TPCH_SPARQL_ALT_OPT_ORACLE_SQL,
        "sparql_npspath_kg": TPCH_SPARQL_NPSPATH_ORACLE_SQL,
        "sparql_groupbind_kg": TPCH_SPARQL_GROUPBIND_ORACLE_SQL,
        "sparql_boolbind_kg": TPCH_SPARQL_BOOLBIND_ORACLE_SQL,
        "kg_pagerank": TPCH_PAGERANK_ORACLE_SQL,
        "kg_negatives": TPCH_NEGATIVES_ORACLE_SQL,
        "sparql_twoside_filter_kg": TPCH_SPARQL_TWOSIDE_FILTER_ORACLE_SQL,
        "sparql_ebv_kg": TPCH_SPARQL_EBV_ORACLE_SQL,
        "sparql_existsnull_kg": TPCH_SPARQL_EXISTSNULL_ORACLE_SQL,
        "sparql_arith_kg": TPCH_SPARQL_ARITH_ORACLE_SQL,
        "sparql_values_kg": TPCH_SPARQL_VALUES_ORACLE_SQL,
        "sparql_aggdistinct_kg": TPCH_SPARQL_AGGDISTINCT_ORACLE_SQL,
        "sparql_aggsem_kg": TPCH_SPARQL_AGGSEM_ORACLE_SQL,
        "sparql_latejoin_kg": TPCH_SPARQL_LATEJOIN_ORACLE_SQL,
        "sparql_minus_scope_kg": TPCH_SPARQL_MINUS_SCOPE_ORACLE_SQL,
        "sparql_timeline_kg": TPCH_SPARQL_TIMELINE_ORACLE_SQL,
        "sparql_minus_timeline_kg": TPCH_SPARQL_MINUS_TIMELINE_ORACLE_SQL,
        "sparql_optcompat_kg": TPCH_SPARQL_OPTCOMPAT_ORACLE_SQL,
        "sparql_optdisjoint_kg": TPCH_SPARQL_OPTDISJOINT_ORACLE_SQL,
        "sparql_nestedopt_kg": TPCH_SPARQL_NESTEDOPT_ORACLE_SQL,
        "sparql_unionopt_kg": TPCH_SPARQL_UNIONOPT_ORACLE_SQL,
        "sparql_twoside_left_kg": TPCH_SPARQL_TWOSIDE_LEFT_ORACLE_SQL,
        "sparql_minusopt_kg": TPCH_SPARQL_MINUSOPT_ORACLE_SQL,
        "sparql_orderexpr_kg": TPCH_SPARQL_ORDEREXPR_ORACLE_SQL,
        "sparql_selectexpr_kg": TPCH_SPARQL_SELECTEXPR_ORACLE_SQL,
        "sparql_having_kg": TPCH_SPARQL_HAVING_ORACLE_SQL,
        "sparql_aggexpr_kg": TPCH_SPARQL_AGGEXPR_ORACLE_SQL,
        "sparql_nested_exists_kg": TPCH_SPARQL_NESTED_EXISTS_ORACLE_SQL,
        "sparql_subq_postagg_kg": TPCH_SPARQL_SUBQ_POSTAGG_ORACLE_SQL,
        "sparql_twosided_kg": TPCH_SPARQL_TWOSIDED_ORACLE_SQL,
        "sparql_cast_kg": TPCH_SPARQL_CAST_ORACLE_SQL,
        "sparql_pathn_kg": TPCH_SPARQL_PATHN_ORACLE_SQL,
        "sparql_graph_kg": TPCH_SPARQL_GRAPH_ORACLE_SQL,
        "sparql_graphiri_kg": TPCH_SPARQL_GRAPHIRI_ORACLE_SQL,
        "domain_mix": """
SELECT doc_id, lang FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) <
  CASE lang WHEN 'en' THEN '800000000000000' WHEN 'de' THEN '333333333333340'
            ELSE '0ccccccccccccd0' END
""",
        "scrub_pii": r"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id
                   || '@example.org or +1-555-0142 at 10.0.'
                   || (doc_id % 200) || '.7'
              ELSE text END AS text
  FROM documents
), s1 AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM seeded
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1, '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
         regexp_replace(t1, '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text,
       n_email, n_phone,
       CAST(len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4
FROM s2
""",
        # the intersect computes |got ∩ expected| independently of how
        # the driver query perturbed the got side (set semantics,
        # NULL-equal — same as Spark INTERSECT)
        "triple_prf": f"""
WITH triples AS ({TPCH_KG_ORACLE_SQL}),
got AS (
  SELECT * FROM triples WHERE pred <> '{TPCH_ONT}segment'
  UNION ALL
  SELECT '{TPCH_KG_NS}/synthetic/x', 'iri', '{TPCH_ONT}bogus',
         '{TPCH_KG_NS}/synthetic/y', 'iri', NULL, NULL
),
n AS (
  SELECT
    (SELECT COUNT(*) FROM got) AS got_n,
    (SELECT COUNT(*) FROM triples) AS expected_n,
    (SELECT COUNT(*) FROM
       (SELECT * FROM got INTERSECT SELECT * FROM triples)) AS matched
)
SELECT CAST(got_n AS BIGINT) AS got_n,
       CAST(expected_n AS BIGINT) AS expected_n,
       CAST(matched AS BIGINT) AS matched,
       matched * 1.0 / got_n AS "precision",
       matched * 1.0 / expected_n AS recall,
       2.0 * (matched * 1.0 / got_n) * (matched * 1.0 / expected_n)
         / ((matched * 1.0 / got_n) + (matched * 1.0 / expected_n)) AS f1
FROM n
""",
        "sparql_describe_kg": TPCH_SPARQL_DESCRIBE_ORACLE_SQL,
        "sparql_subquery_kg": TPCH_SPARQL_SUBQUERY_ORACLE_SQL,
        "sparql_groupconcat_kg": TPCH_SPARQL_GROUPCONCAT_ORACLE_SQL,
        "sparql_datetime_kg": TPCH_SPARQL_DATETIME_ORACLE_SQL,
        "span_view": span_sql,
        "mentions": mentions_oracle_sql(SPAN_VIEW_ORACLE_SQL),
        "pack_sequences": oracles.pack_sequences_sql(5000),
        "stratified_sample": oracles.stratified_sample_sql(20),
        "proportional_sample": oracles.proportional_sample_sql(0.25),
        "decontamination": oracles.decontamination_sql(8, "08"),
        "strip_boilerplate": oracles.strip_boilerplate_sql(3),
        "dedup_exact": oracles.DEDUP_EXACT_SQL,
        "minhash_bands": oracles.minhash_bands_sql(),
        "neardup_pairs": oracles.neardup_pairs_sql(0.8),
        "simhash_groups": oracles.simhash_groups_sql(),
        "text_quality": oracles.text_quality_sql(),
        "tfidf_keywords": __import__(
            "r2rml_parser_spark.operators.keywords", fromlist=["x"]
        ).tfidf_keywords_oracle_sql(3),
        "token_frequencies": __import__(
            "r2rml_parser_spark.operators.keywords", fromlist=["x"]
        ).token_frequencies_oracle_sql(50),
        "chunk_docs": __import__(
            "r2rml_parser_spark.operators.chunking", fromlist=["x"]
        ).chunk_documents_oracle_sql(60, 12),
        "lang_id": oracles.lang_id_sql(),
        "token_counts": oracles.token_counts_sql(),
        "fingerprints": oracles.fingerprints_sql(),
        "gopher_rules": oracles.gopher_rules_sql(),
        "repetition_signals": oracles.repetition_signals_sql(2),
        "ann_cosine_topk": oracles.ann_cosine_topk_sql(5, 10),
        "ann_ivf_topk": oracles.ann_ivf_topk_sql(5, 2, 10),
        "embedding_neardup": oracles.embedding_neardup_sql(0.8),
        "windowed_events": events_ops.windowed_event_stats_sql(),
        "sessionized_events": events_ops.sessionize_sql(),
        "docs_reassembled": reassembled_sql,
        "connected_components": oracles.connected_components_sql(),
        # the fake decode chain is pure (hex-string) md5 arithmetic —
        # fully replayable in DuckDB, upgrading this from rows-only
        "media_features": media_features_sql(SPAN_VIEW_ORACLE_SQL),
    }
