#!/bin/bash
# Round-3 device-blocked checklist — run when the axon tunnel returns
# (tools/tunnel_probe.sh flips /tmp/tunnel_status.log to UP).
# Results land in /tmp/device_checklist.log; each step is independently
# timeout-bounded so a mid-run outage cannot wedge the script.
set -u
cd /root/repo
LOG=/tmp/device_checklist.log
run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout 1800 "$@" >>"$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 1. kernel parity on real hardware: grp 8 and 16, nt + protein, wide
run "fuzz g8 grp8"        python tools/fuzz_g8.py
run "fuzz g8 grp16"       python tools/fuzz_g8.py --grp 16
run "fuzz g8 wide"        python tools/fuzz_g8.py --wide
# 2. kernel throughput: grp 8 vs 16, wide-window vs v1
run "bench grp8 b128"     python tools/bench_kernel.py --json --batch 128 --iters 4
run "bench grp16 b128"    python tools/bench_kernel.py --json --batch 128 --iters 4 --grp 16
run "bench wide"          python tools/bench_kernel.py --json --wide --iters 2
# 3. e2e goldens forced through the device (hbm_in / hbm_tb routes)
run "sars_20 FORCE_DEVICE" env TWILIGHT_FORCE_DEVICE=1 python -m twilight_tpu \
    -t /root/reference/dataset/sars_20.nwk -i /root/reference/dataset/sars_20.fa \
    -o /tmp/ck_sars.aln --overwrite --backend tpu
run "sars md5"            md5sum /tmp/ck_sars.aln   # expect 53ccbd43984d20f52d21e79ba9970b82
# 4. driver bench with the device available
run "bench.py"            python bench.py
echo "CHECKLIST DONE $(date)" | tee -a "$LOG"
