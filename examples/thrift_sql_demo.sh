#!/usr/bin/env bash
# End-to-end JDBC demo: a HiveServer2 (Spark Thrift server) with the
# ariadne JVM extension serves index-pruned SQL to beeline — no
# Python anywhere in the query path.
#
# Prereq: index state at $STORE (e.g. run examples/jvm_sql_demo.py
# first, which builds /tmp/ariadne_jvm_demo/store), and a full Spark
# distribution (SPARK_DIST) for sbin/start-thriftserver.sh + beeline.
set -euo pipefail

SPARK_DIST="${SPARK_DIST:-/opt/spark-4.1.2-bin-hadoop3}"
STORE="${STORE:-/tmp/ariadne_jvm_demo/store}"
JAR="$(cd "$(dirname "$0")/.." && pwd)/jvm/ariadne-spark-ext.jar"
PORT="${PORT:-10123}"

export SPARK_HOME="$SPARK_DIST"
"$SPARK_DIST/sbin/start-thriftserver.sh" --master "local[4]" \
  --jars "$JAR" \
  --conf spark.sql.extensions=ariadnespark.ext.AriadneExtensions \
  --conf "spark.ariadne.storagePath=$STORE" \
  --conf spark.ui.enabled=false \
  --hiveconf "hive.server2.thrift.port=$PORT"

trap '"$SPARK_DIST/sbin/stop-thriftserver.sh" || true' EXIT
for _ in $(seq 30); do
  ss -ltn | grep -q ":$PORT" && break
  sleep 2
done

"$SPARK_DIST/bin/beeline" -u "jdbc:hive2://localhost:$PORT" -e \
  "SELECT count(*) AS n FROM ariadne.orders_demo WHERE o_custkey = 7;"

# temporal JOIN (r06): latest-version dedup + W2 latest-file pruning,
# all server-side — the probe VALUES join on the temporal key
KEYS="$(cat "${STORE%/store}/demo_keys.txt" 2>/dev/null || echo 7)"
VALS="$(echo "$KEYS" | sed 's/\([0-9][0-9]*\)/(\1)/g')"
"$SPARK_DIST/bin/beeline" -u "jdbc:hive2://localhost:$PORT" -e \
  "SELECT count(*) AS n_latest, min(t.o_orderkey) AS min_okey
   FROM ariadne.orders_versions t
   JOIN (VALUES $VALS) AS p(k) ON t.o_custkey = p.k;"

echo "--- prune evidence from the server log:"
grep -h "ariadne" "$SPARK_DIST"/logs/*HiveThriftServer2*.out | grep -i "pruned" | tail -5
