#!/usr/bin/env bash
# Pin-residency A/B (r8: VERDICT r7 item 1; r10: VERDICT r9 item 1): run
# the full sf0.1/32 board under (a) the committed config — all pinned
# views resident board-wide — and (b) the same binary with the pins
# under test demoted to per-query transients via
# SPARK_GRAFT_TRANSIENT_PINS (default: the r10 single-consumer roster;
# override with AB_PINS=tag,tag). Interleaved A,B,A,B so slow machine
# drift cancels across configs. Because every pin in the roster has a
# DISJOINT single consumer, the per-query diff attributes each pin
# individually from one group A/B.
#
# Runs from a FROZEN snapshot of target/scala-2.13/classes via java -cp
# (no sbt lock held, and source edits during the runs can't swap class
# files under the running JVM). Usage: tools/bench_ab.sh <outdir>
set -u
OUT=${1:-/tmp/bench_ab}
mkdir -p "$OUT"
SNAP="$OUT/classes_snapshot"
rm -rf "$SNAP"
cp -a /root/repo/target/scala-2.13/classes "$SNAP"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run() { # run <label> <transient_pins>
  local label=$1 pins=$2
  echo "=== $label (SPARK_GRAFT_TRANSIENT_PINS='$pins') $(date -u +%H:%M:%S) ==="
  # 4g matches SBT_OPTS' -Xmx for the local `sbt runMain graft.Bench`
  # boards — the committed A/B mem lines in BASELINE.md were measured at
  # this heap; changing it breaks comparability with those numbers.
  # (Comment must stay OUTSIDE the continuation chain below: a comment
  # between backslash-continued lines would detach the env prefix from
  # the java command, silently dropping SF_DIR/CPUS/TRANSIENT_PINS.)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_TRANSIENT_PINS="$pins" \
  java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-4g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$SNAP:/opt/spark/jars/*" graft.Bench \
    > "$OUT/$label.out" 2> "$OUT/$label.err"
  grep '"metric":"total"\|"metric":"pin_build"\|"metric":"mem"' "$OUT/$label.out"
}

# r10 roster: every session pin whose build serves exactly ONE
# registered query (audit in BASELINE.md "Round-10 pin residency A/B").
# r8's roster was simhashCand16x4,bandIndex8x4 (measured: residency won).
PINS=${AB_PINS:-conformalSplit,conformalResiduals,shipLagEvidence,custPartEdges,hitsAuthorityRaw,coOrderEdgesByParity,ndcgPerSrc5,qtyWeightDistByFlag,winnowFpBuckets,winnowPairCounts,ngramContainment0.6,ngramJaccard0.3}
run a1 ""
run b1 "$PINS"
run a2 ""
run b2 "$PINS"
echo "DONE_AB_$?"
