"""Kernel-level microbenchmark: profile-pairs aligned per second per chip.

Packs a fixed batch of ~1.7 kb nucleotide profile pairs (the RNASim shape,
BASELINE.md config 2), runs the grouped Pallas TALCO kernel on the real
backend, and reports warm pairs/s (best of N timed launches — the shared
tunnel's latency varies >10x, so min is the steady-state figure).

Usage: python tools/bench_kernel.py [--batch 64] [--len 1700] [--iters 5]
                                    [--flen 512] [--no-g8] [--leaf] [--json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MATCH, MISMATCH, TRANSITION = 18.0, -8.0, -4.0
GO, GE = -50.0, -5.0


def nuc_matrix():
    m = np.zeros((6, 6), dtype=np.float32)
    for i in range(5):
        for j in range(5):
            m[i, j] = MATCH if i == j else (
                TRANSITION if abs(i - j) == 2 else MISMATCH)
    m[4, :5] = m[:5, 4] = 0.0
    return m


def build_batch(batch, length, padlen, off, tot, seed=0):
    from twilight_tpu.ops import talco_pallas
    rng = np.random.default_rng(seed)
    ref_b = np.zeros((batch, 8, tot), dtype=np.float32)
    qry_b = np.zeros((batch, 8, tot), dtype=np.float32)
    rl = np.zeros(batch, np.int32)
    ql = np.zeros(batch, np.int32)
    for i in range(batch):
        n = length + int(rng.integers(-40, 40))
        base = rng.integers(0, 4, n + 16)
        q = base.copy()
        mut = rng.random(len(q)) < 0.1
        q[mut] = rng.integers(0, 4, int(mut.sum()))
        fr = np.zeros((n, 6), np.float32)
        fq = np.zeros((n, 6), np.float32)
        fr[np.arange(n), base[:n]] = 1.0
        fq[np.arange(n), q[:n]] = 1.0
        go = (np.full(n, GO, np.float32), np.full(n, GO, np.float32))
        ge = (np.full(n, GE, np.float32), np.full(n, GE, np.float32))
        talco_pallas.pack_pair_into(ref_b[i], qry_b[i], fr, fq, go, ge,
                                    padlen, off)
        rl[i] = ql[i] = n
    ones = np.ones(batch, np.float32)
    return (rl, ql, ones, ones, np.full(batch, 4096, np.int32),
            np.full(batch, 5000, np.int32), np.full(batch, GE, np.float32),
            np.full(batch, GO, np.float32), np.full(batch, GE, np.float32),
            ref_b, qry_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--len", type=int, dest="length", default=1700)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--flen", type=int, default=512)
    ap.add_argument("--padlen", type=int, default=2048)
    ap.add_argument("--no-g8", action="store_true",
                    help="benchmark the single-pair kernel instead")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--grp", type=int, default=8, choices=(8, 16),
                    help="pairs per grouped-kernel program")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser("~/.cache/twilight_tpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    print(f"[bench_kernel] backend: {plat}", file=sys.stderr)

    mb = nuc_matrix().tobytes()
    if args.no_g8:
        from twilight_tpu.ops import talco_pallas
        kern, maxaln = talco_pallas.get_pallas_kernel(
            args.padlen, args.flen, 6, 1 << 10, mb, 6, args.batch)
        off = args.flen
        tot = args.flen + args.padlen + args.flen + 128
    else:
        from twilight_tpu.ops import talco_pallas_g8
        kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
            args.padlen, args.flen, 6, 1 << 10, mb, 6, args.batch,
            grp=args.grp)
    inputs = build_batch(args.batch, args.length, args.padlen, off, tot)

    # warm-up: compile + one full execution
    for _ in range(2):
        res = kern(*inputs)
        out = np.asarray(res[0])
        if len(res) > 1:
            tail = np.asarray(res[1])
    if len(res) > 1:
        errs = tail[:, 1]
    else:
        errs = out[:, maxaln - 127] if out.ndim == 2 \
            else out[:, 0, maxaln - 127]
    n_ok = int(np.sum(errs == 0))
    if n_ok != args.batch:
        # err-6 = union band outgrew the static window (host/escalation
        # would rerun these); report the rate — it is the cost side of
        # any window-size experiment
        print(f"[bench_kernel] WARNING: {args.batch - n_ok}/{args.batch} "
              f"pairs failed (err counts: "
              f"{dict(zip(*np.unique(errs, return_counts=True)))}) — "
              "timings below exclude their rerun cost", file=sys.stderr)

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        kres = kern(*inputs)
        for r in kres:
            np.asarray(r)
        best = min(best, time.time() - t0)
    pairs_s = args.batch / best
    ms_pair = 1e3 * best / args.batch
    res = {"metric": "kernel_pairs_per_s_chip", "value": round(pairs_s, 1),
           "unit": "pairs/s", "batch": args.batch, "len": args.length,
           "ms_per_pair": round(ms_pair, 3), "backend": plat}

    # efficiency accounting (grouped kernel returns exact work counters in
    # tail[:, 2:4]): DP cells/s = live-band cells actually computed;
    # lane cells/s = diagonals x W lanes x 8 sublanes the VPU really
    # stepped (the band occupies only part of each (8, W) tile).
    # %-of-peak basis (documented in BASELINE.md): ~180 f32 VPU ops per
    # lane per diagonal (similarity 5x5 expected-score sum + exact-div +
    # affine recurrence + X-drop + convergence), against a v5e VPU peak
    # of 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 f32 op/s.
    if len(kres) > 1 and not args.no_g8:
        tail = np.asarray(kres[1])
        cells = int(tail[:, 2].astype(np.int64).sum())
        diags = tail[:, 3].astype(np.int64)
        W = args.flen + 128
        groups = args.batch // 8
        hw_lanes = int(sum(diags[g * 8:(g + 1) * 8].max()
                           for g in range(groups))) * W * 8
        ops_per_lane = 180.0
        vpu_peak = 8 * 128 * 4 * 0.94e9
        pct_peak = 100.0 * (hw_lanes / best) * ops_per_lane / vpu_peak
        res.update(cells_per_s=round(cells / best / 1e6, 1),
                   cells_unit="Mcells/s",
                   lane_cells_per_s=round(hw_lanes / best / 1e6, 1),
                   band_occupancy=round(cells / hw_lanes, 3),
                   est_pct_vpu_peak=round(pct_peak, 1))
    if args.json:
        print(json.dumps(res))
    else:
        print(f"[bench_kernel] {pairs_s:.1f} pairs/s "
              f"({ms_pair:.2f} ms/pair, batch {args.batch}, "
              f"~{args.length} cols)", file=sys.stderr)
        if "cells_per_s" in res:
            print(f"[bench_kernel] {res['cells_per_s']} Mcells/s live-band"
                  f" ({res['lane_cells_per_s']} M lane-cells/s stepped, "
                  f"band occupancy {res['band_occupancy']}, "
                  f"~{res['est_pct_vpu_peak']}% of VPU f32 peak)",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
