#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# bypassing sbt startup. Usage: tools/run.sh graft.Verify <args...>
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens $p=ALL-UNNAMED"; done
# ParallelGC maximizes throughput at bench heaps (<=32g); big-heap scale
# probes (50M-row aggregations at -Xmx64g) override with GRAFT_GC=G1 (or
# GRAFT_GC=-XX:+UseG1GC -- any full -XX flags pass through verbatim) -- a
# ParallelGC full collection over a ~40 GB live execution-memory heap
# pauses the whole local[32] driver past Spark's 120 s heartbeat timeout and
# kills the app, while G1 bounds pauses.
case "${GRAFT_GC:-}" in
  G1|g1) GRAFT_GC="-XX:+UseG1GC" ;;
  Parallel|parallel) GRAFT_GC="-XX:+UseParallelGC" ;;
esac
exec java $FLAGS $EXTRA_JVM ${GRAFT_GC:--XX:+UseParallelGC} -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
