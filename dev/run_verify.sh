#!/bin/bash
# Local dev loop: run graft.Verify directly (bypasses sbt startup).
# Usage: dev/run_verify.sh [sfDir] [outDir]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx8g -cp "$CP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  graft.Verify "$SF" "$OUT"
