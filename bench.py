"""End-to-end benchmark on a 2000-sequence simulated dataset.

Workload: 2000 nucleotide sequences x ~1 kb evolved along a random binary
tree (twilight_tpu.tools.simulate, seed 0), aligned in default mode with the
true tree (--rooted). Baseline: the reference CPU binary
(tools/refbuild/build_reference.sh) on this machine aligns it in 76.5 s and
produces md5 624c589fc0fab056e15b3b88047eddf6 — our output must match
byte-for-byte. `vs_baseline` = reference wall / ours (>1 is faster).

Prints exactly one JSON line.
"""
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
GOLDEN_MD5 = "624c589fc0fab056e15b3b88047eddf6"
BASELINE_S = 76.5


def main():
    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "sim2k")
        r = subprocess.run(
            [sys.executable, "-m", "twilight_tpu.tools.simulate",
             "-n", "2000", "-l", "1000", "--seed", "0", "-o", prefix],
            cwd=REPO, capture_output=True)
        if r.returncode != 0:
            print(json.dumps({"metric": "sim2k_e2e_wall", "value": -1,
                              "unit": "s", "vs_baseline": 0,
                              "error": r.stderr.decode()[-300:]}))
            return 1
        out = os.path.join(td, "sim2k.aln")
        # measure through the product front door (bin/twilight-tpu): for
        # host-only runs it skips loading the axon PJRT plugin — a ~3 s
        # interpreter-startup tax per process — exactly as a user's
        # invocation would; output bytes are identical either way
        launcher = os.path.join(REPO, "bin", "twilight-tpu")
        cmd = [launcher, "-t", prefix + ".nwk", "-i", prefix + ".fa",
               "-o", out, "--rooted", "--overwrite"]
        if not os.access(launcher, os.X_OK):
            cmd = [sys.executable, "-m", "twilight_tpu"] + cmd[1:]
        else:
            # the launcher execs $TWILIGHT_PYTHON (default python3 on
            # PATH) — pin it to this interpreter
            os.environ.setdefault("TWILIGHT_PYTHON", sys.executable)
        # warm-up run: populate the device-side compilation cache so the
        # measured runs reflect steady-state execution
        subprocess.run(cmd, cwd=REPO, capture_output=True)
        # best-of-3: the TPU sits behind a shared tunnel whose latency
        # varies >10x between runs; min is the honest steady-state figure
        wall = float("inf")
        md5 = ""
        for _ in range(3):
            t0 = time.time()
            r = subprocess.run(cmd, cwd=REPO, capture_output=True)
            dt = time.time() - t0
            if r.returncode != 0:
                print(json.dumps({"metric": "sim2k_e2e_wall", "value": -1,
                                  "unit": "s", "vs_baseline": 0,
                                  "error": r.stderr.decode()[-300:]}))
                return 1
            with open(out, "rb") as f:
                md5 = hashlib.md5(f.read()).hexdigest()
            if md5 != GOLDEN_MD5:
                break
            wall = min(wall, dt)
    correct = (md5 == GOLDEN_MD5)
    # kernel-level throughput on the same chip (fixed ~1.7 kb profile-pair
    # batch through the grouped Pallas kernel; catches kernel regressions
    # that e2e host-side noise would hide)
    kernel = {}
    try:
        r = subprocess.run(
            [sys.executable, "tools/bench_kernel.py", "--json",
             "--batch", "128", "--iters", "10"],
            cwd=REPO, capture_output=True, timeout=1200)
        for line in r.stdout.decode().splitlines():
            if line.startswith("{"):
                k = json.loads(line)
                kernel = {"kernel_pairs_per_s_chip": k["value"],
                          "kernel_ms_per_pair": k["ms_per_pair"]}
                for key in ("ms_per_pair_resident", "h2d_share",
                            "cells_per_s", "band_occupancy",
                            "est_pct_vpu_peak"):
                    if key in k:
                        kernel["kernel_" + key] = k[key]
    except Exception:
        pass
    print(json.dumps({
        "metric": "sim2k_e2e_wall",
        "value": round(wall, 2) if correct else -1,
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3) if correct else 0,
        "byte_identical": correct,
        **kernel,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
