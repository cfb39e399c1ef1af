#!/bin/bash
# Run a graft main directly from the compiled classes (bypasses sbt, so
# long sweeps/generators can run in the background without holding the
# sbt project lock while the build iterates). Mirrors build.sbt's
# javaOptions (JDK17 add-opens + SPARK_DRIVER_MEM heap).
# Usage: scripts/run_main.sh graft.ScaleSweep tpchgen 1000
set -euo pipefail
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
