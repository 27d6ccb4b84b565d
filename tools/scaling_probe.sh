#!/bin/bash
# Dev probe: one pipeline bench measurement per child JVM.
# Usage: scaling_probe.sh <cores> <sf> <heap> [timed_runs]
set -e
CORES=$1; SF=$2; HEAP=${3:-8g}; RUNS=${4:-3}
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
GRAFT_TIMED_RUNS=$RUNS java -Xmx$HEAP -XX:+UseParallelGC \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $ADD_OPENS -cp "$CP" graft.RunPipeline $SF $CORES --bench 2>/dev/null
