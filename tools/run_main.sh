#!/bin/bash
# Run a graft main class directly (faster than sbt runMain, clean stdout).
CLASS=$1; shift
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
ADDOPENS=""
for p in $OPENS; do ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"; done
# 1g code cache matches build.sbt: 512m flushes + C2 recompile storms
# across the widened query set (measured; see Bench.scala cache note)
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-48g} -XX:ReservedCodeCacheSize=${CODE_CACHE:-1g} -XX:-DontCompileHugeMethods \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$CLASS" "$@"
