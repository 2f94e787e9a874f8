#!/bin/bash
# TPU queue 34: validate the new dft-temporal default via bench.py
# (train then eval), matching what the driver measures at round end.
# Usage: nohup bash scratch/run_queue34.sh > scratch/queue34.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

health() {
  timeout 180 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
a = np.random.default_rng(0).standard_normal((128,128)).astype(np.float32)
got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                            precision="highest"))
assert np.allclose(got, a @ a, atol=1e-2), "numerics"
print("healthy")
EOF
}

wait_healthy() {
  for i in $(seq 1 30); do
    if health >/dev/null 2>&1; then return 0; fi
    echo "  worker unhealthy; waiting 60s ($i/30)"; sleep 60
  done
  echo "  worker never recovered"; return 1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  wait_healthy || exit 1
  timeout "$tmo" stdbuf -oL -eL "$@" 2>&1 | tee -a scratch/queue34_steps.log
  echo "--- $name exit: ${PIPESTATUS[0]} ---"
  sleep 5
}

step "bench train (dft default)" 3600 python bench.py
step "bench eval (dft default)" 3600 python bench.py --mode eval
echo "queue34 complete ($(date +%H:%M:%S))"
