#!/bin/bash
# Direct-JVM launcher for graft mains — same flags build.sbt gives forked
# runs (JDK17 add-opens, UTC, UI off, SPARK_DRIVER_MEM heap), but without
# the sbt launch/lock overhead, so benches/profiles/ScaleUp can run while
# sbt is busy and stdout is never "[info] "-prefixed. Classpath comes from
# `sbt "export Runtime/fullClasspath"` cached in /tmp/cp.txt (regenerate
# after dependency changes; class files are read live from target/).
# Usage: tools/jrun.sh graft.Bench [args...]
set -e
CP=$(cat /tmp/cp.txt)
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$CP" "$@"
