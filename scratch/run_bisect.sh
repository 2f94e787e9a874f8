#!/bin/bash
# Sequential pallas bisect: one case per process, health-gated between cases.
# Usage: nohup bash scratch/run_bisect.sh > scratch/bisect.log 2>&1 &
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
  for i in $(seq 1 20); do
    if health >/dev/null 2>&1; then return 0; fi
    echo "  worker unhealthy; waiting 60s ($i/20)" ; sleep 60
  done
  echo "  worker never recovered"; return 1
}

CASES="standalone reshape_in bn_const_after bn_vec_after bn_real_after relu_add transpose_in two_kernels tconv_after gcn_block full_block"
for c in $CASES; do
  echo "=== case $c ($(date +%H:%M:%S)) ==="
  wait_healthy || exit 1
  timeout 600 python scratch/pallas_bisect.py "$c" 2>&1 | tail -5
  echo "--- exit: ${PIPESTATUS[0]} ---"
  sleep 10
done
echo "bisect complete ($(date +%H:%M:%S))"
