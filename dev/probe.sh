#!/bin/bash
# Run a graft main class directly against the compiled classes (no sbt
# lock contention; sbt -batch compile must have run first). Usage:
#   SPARK_GRAFT_CPUS=16 dev/probe.sh graft.tools.ScaleProbe 100000 50 360 linear soak3 30
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# -XX:-OmitStackTraceInFastThrow: the streaming disposition classifies by
# throw site; fast-throw would strip stacks mid-replay-loop
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -XX:-OmitStackTraceInFastThrow \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
