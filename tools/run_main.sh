#!/usr/bin/env bash
# Run a graft main (Verify/Bench) outside sbt with the same JVM setup sbt's
# `run / fork` uses: JDK17 module opens for Spark 4 + a SNAPSHOT of the
# compiled classes, so recompiling while a run is in flight can't clobber
# class files the running JVM hasn't loaded yet (lazy classloading made that
# a real, hard-to-diagnose failure mode: half-new half-old classes).
# usage: tools/run_main.sh <mainClass> [args...]
set -euo pipefail
MAIN="$1"; shift
SNAP=$(mktemp -d /tmp/graft-classes-XXXX)
cp -r /root/repo/target/scala-2.13/classes/* "$SNAP"/
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" "$MAIN" "$@"
