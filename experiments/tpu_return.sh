#!/bin/bash
# TPU-return checklist (ROADMAP.md): run the moment jax.devices() works.
# Usage: bash experiments/tpu_return.sh [logdir]
# Order matters: validation first, then the ablations that pick the
# phase-B config, then bench twice (second run primes .jax_cache for
# the driver).
set -u
LOG=${1:-/tmp/tpu_return_$(date -u +%H%M)}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%S))" | tee -a "$LOG/summary.txt"
  timeout "${STEP_TIMEOUT:-5400}" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -5 "$LOG/$name.log" | sed "s/^/[$name] /" | tee -a "$LOG/summary.txt"
  echo "=== $name rc=$rc (end $(date -u +%H:%M:%S))" | tee -a "$LOG/summary.txt"
}

run devices python -c "import jax; print(jax.devices())"
run validate_march python experiments/validate_march.py
run march_inner_80 python experiments/march_inner.py 80
run phase_b_ablate python experiments/phase_b_ablate.py
run profile_gbuffer python experiments/profile_gbuffer.py
run bench1 python bench.py
run bench2 python bench.py
echo "ALL DONE $(date -u)" | tee -a "$LOG/summary.txt"
