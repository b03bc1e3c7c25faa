#!/bin/sh
# Run every bench config sequentially on the attached chip and collect
# one JSON line per config under .bench_results/ (later runs reuse the
# cached fixtures in .bench_cache/).  Configs are ordered cheap -> dear;
# a tunnel outage mid-sweep leaves the completed results on disk.
#
#   sh scripts/run_benches.sh            # full sweep
#   BENCH_ONLY="gll exodus" sh scripts/run_benches.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .bench_results
configs="${BENCH_ONLY:-grid2d gll exodus gll_big exodus_gll gll_file sharded gll100m}"
for c in $configs; do
    echo "=== BENCH_CONFIG=$c ==="
    BENCH_CONFIG="$c" timeout 1800 python bench.py \
        > ".bench_results/$c.json" 2> ".bench_results/$c.log"
    rc=$?
    if [ $rc -eq 0 ]; then
        cat ".bench_results/$c.json"
    else
        echo "FAILED rc=$rc (see .bench_results/$c.log)"
    fi
done
