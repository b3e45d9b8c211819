#!/usr/bin/env bash
# CI entry point: run the FULL test suite green, reproducibly.
#
# One monolithic pytest process accumulates XLA/program state over ~90 min
# and can segfault late (round-1 'full-suite fragility'); this runner shards
# the suite into one pytest PROCESS PER MODULE so each starts from a clean
# interpreter, and fails if any module fails.
#
# Usage:
#   tools/run_tests.sh            # full suite (quick modules batched + slow)
#   tools/run_tests.sh --quick    # quick tier only (~10 min)
set -u
cd "$(dirname "$0")/.."

QUICK_ONLY=0
[ "${1:-}" = "--quick" ] && QUICK_ONLY=1

PY=${PYTHON:-python}
FAILED=()
run() {
  echo "=== pytest $* ==="
  if ! $PY -m pytest "$@" -q; then
    FAILED+=("$*")
  fi
}

# quick tier: small modules grouped per process by subsystem
run tests/test_lie.py tests/test_components.py tests/test_gaussian.py \
    tests/test_datasets.py tests/test_aux.py tests/test_colmap.py -m "not slow"
run tests/test_binning.py tests/test_rasterizer.py -m "not slow"
run tests/test_rasterizer_pallas.py -m "not slow"
run tests/test_slam_steps.py tests/test_converters.py -m "not slow"
run tests/test_mast3r.py tests/test_cloud_opt.py \
    tests/test_oracle_prior.py tests/test_coarse_to_fine.py -m "not slow"
run tests/test_groundingdino.py tests/test_sam.py \
    tests/test_gdino_torch_parity.py -m "not slow"
run tests/test_sam_hf_parity.py tests/test_swin_bert_hf_parity.py \
    tests/test_gdino_full_hf_parity.py -m "not slow"

if [ "$QUICK_ONLY" = "0" ]; then
  # slow tier: isolated processes (full SLAM loops, 8-device mesh)
  run tests/test_e2e_synthetic.py
  run tests/test_e2e_dynamic.py
  run tests/test_street_quality_gate.py tests/test_oracle_prior.py -m slow
  run tests/test_parallel.py
  run tests/test_datasets.py -m slow
fi

if [ "${#FAILED[@]}" -gt 0 ]; then
  echo "FAILED module groups:"
  printf '  %s\n' "${FAILED[@]}"
  exit 1
fi
echo "ALL TEST MODULES GREEN"
