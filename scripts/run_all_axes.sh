#!/bin/bash
# Re-run the twelve scale-gate axes + the 7-scenario fault gate on the
# current surface (the standing per-round regression discipline).
# Sequential on purpose: each axis owns the box while it runs.
cd "$(dirname "$0")/.." || exit 1
LOG=.scale/axes_run.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" | tee -a "$LOG"
}

run python scripts/scale_gate.py
run python scripts/scale_gate.py --tag sf1text seq_packing leakage_split \
    doc_line_dedup doc_profile corpus_curation quality_score
run env SPARK_GRAFT_DRIVER_MEM=4g python scripts/scale_gate.py --tag mem4g
run python scripts/skew_data.py
run python scripts/scale_gate.py --dir .scale/skew
run env SPARK_GRAFT_DRIVER_MEM=4g python scripts/scale_gate.py --dir .scale/skew --tag skew_mem4g
run python scripts/perm_data.py
run python scripts/scale_gate.py --dir .scale/perm
run env SPARK_GRAFT_PERM_SRC=/root/repo/.scale/skew \
    SPARK_GRAFT_PERM_OUT=/root/repo/.scale/permskew python scripts/perm_data.py
run python scripts/scale_gate.py --dir .scale/permskew
run python scripts/edge_data.py
run python scripts/scale_gate.py --dir .scale/edge
run env SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_DRIVER_MEM=8g \
    python scripts/scale_gate.py --dir .scale/edge --tag edge_cluster
run python scripts/foreign_data.py
run python scripts/scale_gate.py --dir .scale/foreign_duckdb
run python scripts/scale_gate.py --dir .scale/foreign_arrow
run env SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_DRIVER_MEM=8g \
    python scripts/scale_gate.py --dir /root/testdata/sf0.01 --tag cluster
run python scripts/fault_gate.py
echo "ALL AXES DONE $(date +%H:%M:%S)" | tee -a "$LOG"
