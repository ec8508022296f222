#!/usr/bin/env bash
# Isolated-query bench (r11): run graft.Bench on a comma-separated query
# subset against a FROZEN snapshot of target/scala-2.13/classes, so source
# edits during a run can't swap class files under the JVM and no sbt lock
# is held. Usage:
#   tools/bench_subset.sh <outfile> <q_a,q_b,...> [cpus] [sfdir]
# Prints the per_query line and total. Same JVM flags/heap as
# tools/bench_ab.sh so numbers are comparable with the committed boards.
set -u
OUT=${1:?outfile}
QUERIES=${2:?query list}
CPUS=${3:-32}
SFDIR=${4:-/root/testdata/sf0.1}
SNAP=${SNAP_DIR:-/tmp/bench_snap}
if [ "${REUSE_SNAP:-0}" != "1" ] || [ ! -d "$SNAP" ]; then
  rm -rf "$SNAP"
  cp -a /root/repo/target/scala-2.13/classes "$SNAP"
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_QUERIES="$QUERIES" \
java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-4g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench \
  > "$OUT" 2> "${OUT%.out}.err"
grep '"metric":"per_query"\|"metric":"total"\|"metric":"load_index"' "$OUT"
