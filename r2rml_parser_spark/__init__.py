"""r2rml_parser_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-imagination of the capabilities of nkons/r2rml-parser
(reference at /root/reference, Java 7 + Jena): R2RML-style mapping documents
are compiled into Spark Catalyst Column expressions; triples are produced as
DataFrames, deduplicated with set semantics, joined via ordinary equi-joins
(instead of the reference's per-row correlated JDBC subqueries,
Generator.java:463-521), and dumped as deterministic sorted N-Triples.

On top of the reference's surface the engine adds the stages required for a
large-scale training-data / KG pipeline: interleaved text+media span sources,
vectorized mention detection + entity-link scoring, MinHash-LSH blocking,
large-star/small-star connected-components canonicalization, dedup and
similarity operators, and per-partition lineage checkpointing.
"""

__version__ = "0.1.0"

from r2rml_parser_spark.mapping.parse import parse_mapping_document  # noqa: E402,F401
from r2rml_parser_spark.plans.engine import MappingEngine, lineage_quads  # noqa: E402,F401
