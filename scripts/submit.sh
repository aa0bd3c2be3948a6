#!/usr/bin/env bash
# Cluster submission for the KG build (north_rule: spark-submit --py-files
# at two cluster sizes). MASTER defaults to local[32] in this sandbox;
# point it at yarn / k8s / spark:// for a real cluster.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[32]}"
EXECUTORS="${EXECUTORS:-}"          # e.g. --num-executors 250
SF_DIR="${SF_DIR:-/root/testdata/sf0.1}"
OUT="${OUT:-/tmp/kg_out}"

python scripts/package.py

exec spark-submit \
  --master "$MASTER" \
  ${EXECUTORS} \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-256}" \
  --py-files dist/r2rml_parser_spark.zip \
  scripts/kg_job.py --sf-dir "$SF_DIR" --out "$OUT" --dump-nt "$@"
