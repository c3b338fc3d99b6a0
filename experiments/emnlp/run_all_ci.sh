#!/usr/bin/env bash
# CI-scale reproduction of the paper's experiment sections (the analogue of
# the reference's group_*.sh drivers, runnable offline on CPU).
# Usage: bash experiments/emnlp/run_all_ci.sh [out_dir]
set -e
cd "$(dirname "$0")"
OUT="${1:-/tmp/emnlp_ci}"

run () {
  echo "=== $1 ==="
  shift
  python "$@"
  retVal=$?
  if [ $retVal -ne 0 ]; then
    echo "FAILED ($retVal)"
    exit $retVal
  fi
}

run "section 1 variance"      section_1_variance.py     --synthetic --save_dir "$OUT/sec1_variance"
run "section 4.2 perplexity"  section_4_2_perplexity.py --synthetic --save_dir "$OUT/sec42_ppl"
run "section 4.2 downstream"  section_4_2_downstream.py --synthetic --save_dir "$OUT/sec42_downstream"
run "section 4.3 QAT"         section_4_3_qat.py        --synthetic --save_dir "$OUT/sec43_qat"
run "section 4.4 search"      section_4_4_search.py     --synthetic --save_dir "$OUT/sec44_search"
echo "all sections OK -> $OUT"
