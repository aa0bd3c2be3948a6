#!/usr/bin/env python
"""spark-submit entrypoint: full KG build → triples table + sorted dump.

Cluster launch (north_rule: `spark-submit --py-files` on a multi-executor
cluster; see scripts/submit.sh):

    spark-submit --master <cluster> \\
        --py-files dist/r2rml_parser_spark.zip \\
        scripts/kg_job.py --sf-dir <input> --out <output_dir> \\
        [--no-canonicalize] [--dump-nt] [--checkpoint <ckpt_dir>]

The session is obtained with getOrCreate() and NO master override, so
whatever cluster manager spark-submit wired up (YARN/K8s/standalone)
is used; running the script bare falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# bare `python scripts/kg_job.py` runs resolve the package from the repo
# checkout; under spark-submit the --py-files zip takes precedence
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="input dir with documents.parquet")
    ap.add_argument("--out", required=True, help="output dir (triples parquet + dump)")
    ap.add_argument("--no-canonicalize", action="store_true")
    ap.add_argument("--dump-nt", action="store_true", help="also write sorted N-Triples")
    ap.add_argument("--checkpoint", default=None, help="checkpoint/metrics table dir")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # engine-required configs (NULL-propagating casts, AQE) WITHOUT a
    # master override — spark-submit's cluster manager wins; bare runs
    # fall back to local[*]
    spark = (
        SparkSession.builder.appName("r2rml-kg-build")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from r2rml_parser_spark.pipeline import build_kg

    t0 = time.monotonic()
    triples = build_kg(spark, args.sf_dir, canonicalize=not args.no_canonicalize)
    triples.write.mode("overwrite").parquet(f"{args.out}/triples.parquet")
    if args.dump_nt:
        from r2rml_parser_spark.sinks.ntriples import write_sorted

        write_sorted(spark.read.parquet(f"{args.out}/triples.parquet"),
                     f"{args.out}/dump.nt")
    n = spark.read.parquet(f"{args.out}/triples.parquet").count()
    dt = time.monotonic() - t0
    if args.checkpoint:
        os.makedirs(args.checkpoint, exist_ok=True)
        with open(f"{args.checkpoint}/kg_job_metrics.json", "w") as fh:
            json.dump({"triples": n, "seconds": round(dt, 3)}, fh)
    print(json.dumps({"triples": n, "seconds": round(dt, 3),
                      "triples_per_sec": round(n / dt, 1)}))


if __name__ == "__main__":
    main(sys.argv[1:])
