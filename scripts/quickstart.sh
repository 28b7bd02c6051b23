#!/bin/bash
# Library packaging smoke: build the jar with `sbt package`, then run the
# graft.Quickstart recipes from a FRESH directory with ONLY the packaged
# jar + the Spark distribution on the classpath — no repo target/classes,
# no sbt. This is exactly how a spark-submit user would consume the
# library; if it passes, the artifact is self-contained.
set -euo pipefail
cd /root/repo
sbt -batch package > /dev/null
JAR=$(ls /root/repo/target/scala-2.13/furchildspark_2.13-*.jar | head -1)
echo "[quickstart] jar: $JAR"
WORK=$(mktemp -d)
cd "$WORK" # fresh cwd: nothing from the repo is implicitly reachable
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $OPENS -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" graft.Quickstart "${1:-/root/testdata/sf0.001}"
