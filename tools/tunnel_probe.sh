#!/bin/bash
# Probe the axon TPU tunnel in a loop; append status lines to
# /tmp/tunnel_status.log. Used while the tunnel is down so work can
# switch back to device-blocked items the moment it recovers.
while true; do
  ts=$(date +%H:%M:%S)
  out=$(cd /root/repo && TWILIGHT_DEVICE_INIT_TIMEOUT=90 timeout 150 python - <<'EOF' 2>/dev/null
import os, numpy as np, jax
from twilight_tpu.ops.device_kernel import discover_devices
try:
    devs = discover_devices(jax, "tpu")
    x = jax.device_put(np.ones((8, 128), np.float32), devs[0])
    print("UP", float(np.asarray(x.sum())))
except Exception as e:
    print("DOWN", type(e).__name__)
EOF
)
  echo "$ts $out" >> /tmp/tunnel_status.log
  case "$out" in UP*) exit 0;; esac
  sleep 540
done
