#!/bin/bash
# Device measurement checklist (round-5 pm edition) — run when the
# tunnel is healthy. Results land in /tmp/device_checklist.log; each
# step is timeout-bounded so a mid-run outage cannot wedge the script.
#
# Measurement rules learned rounds 3-5 (BASELINE.md §Kernel bottleneck):
# - only PAIRED interleaved numbers are trustworthy (--compare);
#   sequential runs swing >25% with tunnel weather.
# - ms_per_pair = production-shaped (put + execute + async fetch);
#   ms_per_pair_resident = chip cost. Compare like with like.
# - fixed-order round-robin is poisoned by the tunnel's token-bucket
#   throttle; probe_sweep rotates for this reason.
set -u
cd /root/repo
LOG=/tmp/device_checklist.log
run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout 1800 "$@" >>"$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 1. kernel parity on real hardware (grp16 = production default)
run "fuzz grp16"          python tools/fuzz_g8.py --grp 16
run "fuzz grp8"           python tools/fuzz_g8.py
run "fuzz wide"           python tools/fuzz_g8.py --wide
# 2. kernel throughput: production default + the route table
run "bench freq b128"     python tools/bench_kernel.py --json --batch 128 --iters 8
run "bench leaf b128"     python tools/bench_kernel.py --json --batch 128 --iters 8 --leaf
run "bench protein b128"  python tools/bench_kernel.py --json --batch 128 --iters 8 --protein
run "bench wide"          python tools/bench_kernel.py --json --wide --iters 4
# 3. pinned-trips attribution (rotated; add --watch 0.165 for a
#    good-weather gate)
run "probe sweep"         python tools/probe_sweep.py --rounds 24 --json
# 4. e2e goldens forced through the device (hbm_in / hbm_tb routes)
run "sars_20 FORCE_DEVICE" env TWILIGHT_FORCE_DEVICE=1 python -m twilight_tpu \
    -t /root/reference/dataset/sars_20.nwk -i /root/reference/dataset/sars_20.fa \
    -o /tmp/ck_sars.aln --overwrite --backend tpu
run "sars md5"            md5sum /tmp/ck_sars.aln   # expect 53ccbd43984d20f52d21e79ba9970b82
# 5. driver bench with the device available
run "bench.py"            python bench.py
echo "CHECKLIST DONE $(date)" | tee -a "$LOG"
