#!/bin/bash
# SF-linearity diagnostic: probe-bracketed stage-timed SF=1 vs SF=2 pair
# at local[8]/12g under the bench child protocol (AQE off, dim broadcast
# AUTO — plain shuffle joins, matching Bench.childRun since round 5;
# override GRAFT_DIM_BROADCAST to diagnose other configs). Diagnostic
# only — per-stage actions change the total vs the fused protocol, but
# both legs run identically so the SF2/SF1 rate ratio isolates
# data-scale behavior.
set -u
CP=$(cat /tmp/graft_cp.txt)
JAVA=$(ls -d /usr/lib/jvm/*17*/bin/java 2>/dev/null | head -1)
[ -z "$JAVA" ] && JAVA=java
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_AQE=${SPARK_GRAFT_AQE:-false}
export GRAFT_DIM_BROADCAST=${GRAFT_DIM_BROADCAST:-auto}
export GRAFT_TIMED_RUNS=${GRAFT_TIMED_RUNS:-2}
export GRAFT_STAGE_TIMING=${GRAFT_STAGE_TIMING:-1}

probe() {
  echo "== probe $1"
  $JAVA $OPENS -cp "$CP" graft.ProbeStats 3 2>/dev/null | grep '\[probe\]'
}

run_leg() { # sf
  echo "== leg sf=$1 local[8] 12g"
  $JAVA -Xmx12g -XX:+UseParallelGC -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC $OPENS -cp "$CP" \
    graft.RunPipeline "$1" 8 --bench 2>/dev/null | grep '"sf"\|stage_timing'
}

probe before
run_leg 1.0
probe mid
run_leg 2.0
probe after
