"""Reproduce the driver-side dtype/hash divergence for the 5 r4-red rows.

Runs each failing query via __spark_entry__.queries() at sf0.01, runs its
oracle in DuckDB, materializes both to pandas, and prints per-column dtypes
plus the first rows where stringified values differ — mimicking a driver that
sorts columns by name and hashes the value matrix.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entry
from r2rml_parser_spark.session import build_session

SF = "/root/testdata/sf0.01"
FAILING = [
    "kg_pagerank",
    "sparql_aggdistinct_kg",
    "sparql_aggsem_kg",
    "sparql_selectexpr_kg",
    "sparql_aggexpr_kg",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    spark = build_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = sys.argv[1:] or FAILING
    for name in only:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(oracles[name]).df()
        sdf = sdf[sorted(sdf.columns)].sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
        odf = odf[sorted(odf.columns)].sort_values(list(sorted(odf.columns))).reset_index(drop=True)
        print(f"=== {name} rows spark={len(sdf)} oracle={len(odf)}")
        for c in sorted(sdf.columns):
            sv = sdf[c]
            ov = odf[c]
            s_str = sv.map(lambda v: repr(v))
            o_str = ov.map(lambda v: repr(v))
            same = (s_str == o_str).all() if len(sv) == len(ov) else False
            print(f"  col {c}: spark dtype={sv.dtype} oracle dtype={ov.dtype} repr_equal={same}")
            if not same and len(sv) == len(ov):
                diff = s_str != o_str
                for i in list(sv.index[diff])[:3]:
                    print(f"    row {i}: spark={s_str[i]} oracle={o_str[i]}")
    spark.stop()


if __name__ == "__main__":
    main()
