#!/usr/bin/env bash
# spark-submit path for the packaged library: stock spark-submit, the
# GraftExtensions SparkSessionExtensions (salt_key SQL function + the
# salted-aggregate optimizer rule), local master standing in for a
# cluster master URL. Build the jar first: sbt -batch package
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=$(ls target/scala-2.13/crawlfirstspark_2.13-*.jar | grep -v -- -tests | head -1)
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.extensions=graft.plans.GraftExtensions \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --class graft.SubmitSmoke \
  "$JAR" "${1:-/root/testdata/sf0.001}"
