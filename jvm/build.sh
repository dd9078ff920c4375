#!/usr/bin/env bash
# Compile the ariadne JVM SQL extension against the pyspark-bundled
# Spark jars, using the scala-compiler jar Spark itself ships — no
# network, no sbt bootstrap needed.
set -euo pipefail
cd "$(dirname "$0")"

JARS="${SPARK_JARS_DIR:-$(python - <<'EOF'
import os, pyspark
print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
EOF
)}"

rm -rf classes && mkdir -p classes
"${JAVA_HOME:-/usr/lib/jvm/java-17-openjdk-amd64}/bin/java" \
  -cp "$JARS/*" scala.tools.nsc.Main \
  -classpath "$JARS/*" \
  -release 17 \
  -d classes \
  src/AriadneExtensions.scala
"${JAVA_HOME:-/usr/lib/jvm/java-17-openjdk-amd64}/bin/jar" \
  cf ariadne-spark-ext.jar -C classes .
echo "built $(pwd)/ariadne-spark-ext.jar"
