#!/bin/bash
# Serialized TPU work queue: verify smokes -> probe16 -> pallas bisect.
# The chip is exclusive per process; every step is health-gated.
# Usage: nohup bash scratch/run_queue16.sh > scratch/queue16.log 2>&1 &
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
  timeout "$tmo" "$@" 2>&1 | tail -20
  echo "--- $name exit: ${PIPESTATUS[0]} ---"
  sleep 5
}

step "verify: tpu matmul smoke" 600 python scratch/tpu_smoke_matmul.py
step "verify: bench --smoke"    900 python bench.py --smoke
python scripts/make_smoke_data.py
step "verify: smoke train"      900 python -m shift_gcn_tpu.cli.train --config configs/smoke.yaml
step "probe16"                 1800 python scratch/tpu_probe16.py

CASES="standalone reshape_in bn_const_after bn_vec_after bn_real_after relu_add transpose_in two_kernels tconv_after gcn_block full_block"
for c in $CASES; do
  step "bisect: $c" 600 python scratch/pallas_bisect.py "$c"
done
echo "queue16 complete ($(date +%H:%M:%S))"
