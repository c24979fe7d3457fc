#!/bin/bash
# Poll the axon TPU tunnel; the moment jax.devices() works, fire the
# TPU-return checklist (experiments/tpu_return.sh). Detach with:
#   nohup bash experiments/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while true; do
  echo "probe $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TUNNEL UP $(date -u) — launching tpu_return.sh"
    bash experiments/tpu_return.sh /tmp/tpu_return_auto
    echo "CHECKLIST DONE $(date -u)"
    exit 0
  fi
  sleep 300
done
