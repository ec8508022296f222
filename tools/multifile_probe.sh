#!/usr/bin/env bash
# Multi-file fixture probe (BASELINE.md "known fixture artifacts"):
# rewrites sf0.1 as 32-file parquet and benches the heaviest queries
# against both layouts at 32 threads — the cheapest empirical check of
# the scan-parallelism story the plans are designed for. Same data, so
# no oracle re-check; results are committed as a table in BASELINE.md.
#
# Usage: tools/multifile_probe.sh [sfDir] [multiDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
MULTI_DIR="${2:-/tmp/sf0.1-multifile}"
# the sf0.1 slow tail (driver BENCH_r05 + judge isolated audit)
QUERIES="q_tpch_q21,q_harmonic,q_abc_xyz,q_tpch_q11,q_link_predict,q_zone_map,q_resource_alloc,q_salted_join,q_freq_bins,q_topk,q_lift,q_mutual_knn,q_graph_census,q_clustering_coeff,q_forecast_recon,q_tpch_q4,q_mad_outliers,q_conformal,q_copy_detect,q_dedup_clusters"

sbt -batch "runMain graft.RewriteFixture $SF_DIR $MULTI_DIR 32"

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_QUERIES="$QUERIES" \
  sbt -batch "runMain graft.Bench" | tee /tmp/probe_singlefile.txt
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$MULTI_DIR" SPARK_GRAFT_QUERIES="$QUERIES" \
  sbt -batch "runMain graft.Bench" | tee /tmp/probe_multifile.txt

echo "== single-file vs multi-file (32 files, 32 threads) =="
python3 tools/bench_diff.py /tmp/probe_singlefile.txt /tmp/probe_multifile.txt 1.2
