"""Kernel-level microbenchmark: profile-pairs aligned per second per chip.

Packs a fixed batch of ~1.7 kb nucleotide profile pairs (the RNASim shape,
BASELINE.md config 2), runs the grouped Pallas TALCO kernel on the real
backend, and reports warm pairs/s (best of N timed launches — the shared
tunnel's latency varies >10x, so min is the steady-state figure).

Usage: python tools/bench_kernel.py [--batch 64] [--len 1700] [--iters 5]
                                    [--flen 512] [--no-g8] [--leaf] [--json]

--wide benchmarks the ESCALATION routes (the decision the batcher's
escalated buckets encode, device_kernel.py: bs = max(32, grp)): the
grouped hbm_tb kernel (FLEN > 1024 -> traceback in HBM via emit ring +
staged walk) vs the v1 single-pair kernel, both at the same escalated
(padlen, flen, batch 32), and reports the speedup ratio. Reference
analogue: the GPU build's per-launch capacity math
(cuda/alignment-gpu.cu:188-221) sizes one launch for all lengths; here
each wide bucket picks a route, and this is the measurement that
justifies the default.
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
    """The PRODUCTION nucleotide matrix (Params.make("n") — 5x5, the
    same float values the pipeline bakes into its kernels) so the
    benchmarked program is byte-identical to the production program and
    a bench run pre-warms the server-side compile for a following
    production run."""
    from twilight_tpu.config import Params
    return Params.make("n").scoring_matrix.astype(np.float32)


def prot_matrix():
    """The PRODUCTION protein matrix (BLOSUM62-based, 21x21)."""
    from twilight_tpu.config import Params
    return Params.make("p").scoring_matrix.astype(np.float32)


def build_batch_protein(batch, length, padlen, off, tot, seed=0):
    """Protein freq-route inputs: P=22 one-hot rows + 2 psgp rows in
    [batch, 24, tot] blocks (3x the nt bytes — the route whose wire
    cost was never separately measured before round-5 pm)."""
    from twilight_tpu.ops import talco_pallas
    rng = np.random.default_rng(seed)
    ref_b = np.zeros((batch, 24, tot), dtype=np.float32)
    qry_b = np.zeros((batch, 24, tot), dtype=np.float32)
    rl = np.zeros(batch, np.int32)
    ql = np.zeros(batch, np.int32)
    for i in range(batch):
        n = length + int(rng.integers(-20, 20))
        base = rng.integers(0, 20, n + 16)
        q = base.copy()
        mut = rng.random(len(q)) < 0.15
        q[mut] = rng.integers(0, 20, int(mut.sum()))
        fr = np.zeros((n, 22), np.float32)
        fq = np.zeros((n, 22), np.float32)
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


def build_batch_leaf(batch, length, padlen, off, tot, seed=0):
    """Leaf-route inputs: int8 letter codes (mirrors
    device_kernel._pack_batch_leaf)."""
    rng = np.random.default_rng(seed)
    ref_b = np.full((batch, 1, tot), 4, dtype=np.int8)
    qry_b = np.full((batch, 1, tot), 4, dtype=np.int8)
    rl = np.zeros(batch, np.int32)
    ql = np.zeros(batch, np.int32)
    for i in range(batch):
        n = length + int(rng.integers(-40, 40))
        base = rng.integers(0, 4, n + 16)
        q = base.copy()
        mut = rng.random(len(q)) < 0.1
        q[mut] = rng.integers(0, 4, int(mut.sum()))
        ref_b[i, 0, off + padlen - n:off + padlen] =             base[:n][::-1].astype(np.int8)
        qry_b[i, 0, off:off + n] = q[:n].astype(np.int8)
        rl[i] = ql[i] = n
    ones = np.ones(batch, np.float32)
    return (rl, ql, ones, ones, np.full(batch, 4096, np.int32),
            np.full(batch, 5000, np.int32), np.full(batch, GE, np.float32),
            np.full(batch, GO, np.float32), np.full(batch, GE, np.float32),
            ref_b, qry_b)


def bench_config(g8, padlen, flen, batch, length, grp, iters, plat,
                 ablate="", marker=1 << 10, leaf=False, prot=False):
    """Build, warm, time one kernel config; returns the result dict."""
    mb = (prot_matrix() if prot else nuc_matrix()).tobytes()
    p, msize = (22, 21) if prot else (6, 5)
    if not g8:
        from twilight_tpu.ops import talco_pallas
        kern, maxaln = talco_pallas.get_pallas_kernel(
            padlen, flen, p, marker, mb, msize, batch)
        off = flen
        tot = flen + padlen + flen + 128
    else:
        from twilight_tpu.ops import talco_pallas_g8
        kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
            padlen, flen, p, marker, mb, msize, batch, grp=grp,
            ablate=ablate, leaf=leaf)
    builder = (build_batch_leaf if leaf else
               build_batch_protein if prot else build_batch)
    inputs = builder(batch, length, padlen, off, tot)

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
    if n_ok != batch:
        # err-6 = union band outgrew the static window (host/escalation
        # would rerun these); report the rate — it is the cost side of
        # any window-size experiment
        print(f"[bench_kernel] WARNING: {batch - n_ok}/{batch} "
              f"pairs failed (err counts: "
              f"{dict(zip(*np.unique(errs, return_counts=True)))}) — "
              "timings below exclude their rerun cost", file=sys.stderr)

    import jax as _jax2

    def _fetch(kres):
        # overlap the per-output D2H round trips (each asarray alone is
        # a ~25-33 ms tunnel RTT)
        try:
            for r in kres:
                r.copy_to_host_async()
        except Exception:
            pass
        for r in kres:
            np.asarray(r)

    best = float("inf")
    for _ in range(iters):
        # production-shaped launch (device_kernel._run): explicit
        # device_put of the big blocks (the execute-argument upload
        # path is ~25x slower than device_put for the same bytes),
        # then async-fetched results
        t0 = time.time()
        args = tuple(inputs[:9]) + tuple(
            _jax2.device_put(a) for a in inputs[9:])
        kres = kern(*args)
        _fetch(kres)
        best = min(best, time.time() - t0)
    # device-resident re-timing: numpy inputs are re-shipped through
    # the tunnel on EVERY launch (~8.4 MB at batch 64 — measured 66.5%
    # of launch time on 2026-08-20, the round-5 "dark matter": every
    # recorded ms/pair figure before this was transfer-dominated).
    # Pre-placing the inputs isolates kernel compute; production pays
    # H2D too, so BOTH figures are real — ms_per_pair is the
    # production-shaped cost, ms_per_pair_resident the chip cost.
    import jax as _jax
    dinp = _jax.device_put(inputs)
    for r in dinp:
        r.block_until_ready()
    best_d = float("inf")
    for _ in range(iters):
        t0 = time.time()
        kres = kern(*dinp)
        _fetch(kres)
        best_d = min(best_d, time.time() - t0)
    pairs_s = batch / best
    ms_pair = 1e3 * best / batch
    res = {"metric": "kernel_pairs_per_s_chip", "value": round(pairs_s, 1),
           "unit": "pairs/s", "batch": batch, "len": length,
           "flen": flen, "padlen": padlen, "g8": bool(g8),
           "err_rate": round(1.0 - n_ok / batch, 3),
           "ms_per_pair": round(ms_pair, 3),
           "ms_per_pair_resident": round(1e3 * best_d / batch, 3),
           "h2d_share": round(1.0 - best_d / best, 3),
           "backend": plat}

    # efficiency accounting (grouped kernel returns exact work counters in
    # tail[:, 2:4]): DP cells/s = live-band cells actually computed;
    # lane cells/s = diagonals x W lanes x 8 sublanes the VPU really
    # stepped (the band occupies only part of each (8, W) tile).
    # %-of-peak basis (documented in BASELINE.md): ~180 f32 VPU ops per
    # lane per diagonal (similarity 5x5 expected-score sum + exact-div +
    # affine recurrence + X-drop + convergence), against a v5e VPU peak
    # of 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 f32 op/s.
    if len(kres) > 1 and g8:
        tail = np.asarray(kres[1])
        cells = int(tail[:, 2].astype(np.int64).sum())
        diags = tail[:, 3].astype(np.int64)
        W = flen + 128
        groups = batch // 8
        group_diags = int(sum(diags[g * 8:(g + 1) * 8].max()
                              for g in range(groups)))
        hw_lanes = group_diags * W * 8
        # us per group-diagonal: the normalization that makes ablation
        # runs comparable (ablations change iteration counts).
        # Efficiency figures use the device-resident timing — the chip
        # cost — since the host-input timing is dominated by tunnel H2D
        res["us_per_diag"] = round(1e6 * best / max(group_diags, 1), 3)
        res["us_per_diag_resident"] = round(
            1e6 * best_d / max(group_diags, 1), 3)
        # nt: ~180 f32 ops/lane/diagonal (5x5 expected-score sum +
        # exact-div + affine + X-drop + conv); protein: the 22x22
        # summation block alone is ~4x that (~700)
        ops_per_lane = 700.0 if prot else 180.0
        vpu_peak = 8 * 128 * 4 * 0.94e9
        pct_peak = 100.0 * (hw_lanes / best_d) * ops_per_lane / vpu_peak
        res.update(cells_per_s=round(cells / best_d / 1e6, 1),
                   cells_unit="Mcells/s",
                   lane_cells_per_s=round(hw_lanes / best_d / 1e6, 1),
                   band_occupancy=round(cells / hw_lanes, 3),
                   est_pct_vpu_peak=round(pct_peak, 1))
    return res


def compare_configs(ablate_a, ablate_b, padlen, flen, batch, length, grp,
                    iters, plat, marker=1 << 10, grp_b=None):
    """Interleaved A/B timing: the shared axon tunnel's throughput
    varies >25% between runs, so independent measurements cannot
    attribute <30% effects. Compiling both kernels in one process and
    alternating launches A,B,A,B,... gives paired samples under the
    same tunnel conditions; the min over rounds of each side is the
    steady-state figure and the ratio is noise-immune."""
    from twilight_tpu.ops import talco_pallas_g8
    mb = nuc_matrix().tobytes()
    kerns = {}
    for name, abl, g in (("a", ablate_a, grp),
                         ("b", ablate_b, grp_b or grp)):
        kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
            padlen, flen, 6, marker, mb, 5, batch, grp=g, ablate=abl)
        kerns[name] = kern
    import jax as _jax
    # device-resident inputs: A/B attribution must measure COMPUTE —
    # with host inputs both sides are ~66% identical H2D transfer and
    # real deltas compress ~3x (the round-5 dark-matter finding)
    inputs = _jax.device_put(build_batch(batch, length, padlen, off, tot))
    for r in inputs:
        r.block_until_ready()
    diags = {}
    for name, kern in kerns.items():   # compile + warm both
        for _ in range(2):
            res = kern(*inputs)
            for r in res:
                np.asarray(r)
        tail = np.asarray(res[1])
        d = tail[:, 3].astype(np.int64)
        diags[name] = int(sum(d[g * 8:(g + 1) * 8].max()
                              for g in range(batch // 8)))
    best = {"a": float("inf"), "b": float("inf")}
    for _ in range(iters):
        for name, kern in kerns.items():
            t0 = time.time()
            res = kern(*inputs)
            try:
                for r in res:
                    r.copy_to_host_async()
            except Exception:
                pass
            for r in res:
                np.asarray(r)
            best[name] = min(best[name], time.time() - t0)
    us_a = 1e6 * best["a"] / max(diags["a"], 1)
    us_b = 1e6 * best["b"] / max(diags["b"], 1)
    return {"metric": "kernel_compare_us_per_diag",
            "a": ablate_a or "baseline", "b": ablate_b or "baseline",
            "us_per_diag_a": round(us_a, 3), "us_per_diag_b": round(us_b, 3),
            "delta_us_per_diag": round(us_b - us_a, 3),
            "b_over_a": round(us_b / us_a, 4),
            "ms_per_pair_a": round(1e3 * best["a"] / batch, 3),
            "ms_per_pair_b": round(1e3 * best["b"] / batch, 3),
            "group_diags_a": diags["a"], "group_diags_b": diags["b"],
            "batch": batch, "flen": flen, "len": length,
            "backend": plat}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--len", type=int, dest="length", default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--flen", type=int, default=None)
    ap.add_argument("--padlen", type=int, default=None)
    ap.add_argument("--no-g8", action="store_true",
                    help="benchmark the single-pair kernel instead")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--grp", type=int, default=16, choices=(8, 16),
                    help="pairs per grouped-kernel program (16 = the "
                         "production device default since round-5 pm)")
    ap.add_argument("--wide", action="store_true",
                    help="escalation-route A/B: grouped hbm_tb vs v1 "
                         "single-pair at escalated (flen, padlen, "
                         "batch 32) — see module docstring")
    ap.add_argument("--ablate", default="",
                    help="comma-separated kernel cost-attribution "
                         "switches (nosim,nodiv,noconv,nored,noroll,"
                         "notb); outputs are WRONG — compare us_per_diag")
    ap.add_argument("--leaf", action="store_true",
                    help="benchmark the leaf (int-code) kernel route")
    ap.add_argument("--protein", action="store_true",
                    help="benchmark the protein freq route (BLOSUM62 "
                         "22x22, P8=24 rows — 3x the nt wire bytes)")
    ap.add_argument("--marker", type=int, default=1 << 10,
                    help="convergence marker / tile span (per-tile-cost "
                         "A/B: a larger marker means fewer, longer tiles;"
                         " outputs differ from the production marker)")
    ap.add_argument("--compare-grp", type=int, default=None,
                    choices=(8, 16),
                    help="with --compare: build side B with this grp "
                         "(paired grp-size comparison)")
    ap.add_argument("--compare", default=None, metavar="A:B",
                    help="interleaved A/B ablate comparison (paired "
                         "launches, tunnel-noise-immune); additive "
                         "tokens: twosim,twodiv,twored,tworoll,twotb,"
                         "twocarry")
    args = ap.parse_args()
    if args.wide:
        flen = args.flen or 2048
        padlen = args.padlen or max(4096, flen * 2)
        batch = args.batch or 32      # device_kernel escalated bucket size
        length = args.length or min(padlen - 400, 3400)
    else:
        flen = args.flen or 512
        padlen = args.padlen or 2048
        batch = args.batch or 64
        length = args.length or 1700

    import jax
    # same dir as DeviceTalco's TPU cache so bench and production runs
    # share client-side compiled artifacts
    cache_dir = os.path.expanduser("~/.cache/twilight_tpu_jax/tpu")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    print(f"[bench_kernel] backend: {plat}", file=sys.stderr)

    if args.compare is not None:
        a, _, b = args.compare.partition(":")
        res = compare_configs(a, b, padlen, flen, batch, length,
                              args.grp, args.iters, plat,
                              marker=args.marker, grp_b=args.compare_grp)
        if args.compare_grp:
            res["grp_a"], res["grp_b"] = args.grp, args.compare_grp
        print(json.dumps(res))
        return 0

    if args.wide:
        res_g8 = bench_config(True, padlen, flen, batch, length, args.grp,
                              args.iters, plat)
        res_v1 = bench_config(False, padlen, flen, batch, length, args.grp,
                              args.iters, plat)
        ratio = round(res_v1["ms_per_pair"] / res_g8["ms_per_pair"], 2)
        res = {"metric": "wide_window_ms_per_pair",
               "value": res_g8["ms_per_pair"], "unit": "ms/pair",
               "flen": flen, "padlen": padlen, "batch": batch,
               "len": length, "backend": plat,
               "g8_hbm_tb": res_g8, "v1_single_pair": res_v1,
               "g8_speedup_vs_v1": ratio}
        if args.json:
            print(json.dumps(res))
        else:
            print(f"[bench_kernel] wide FLEN {flen}: g8 hbm_tb "
                  f"{res_g8['ms_per_pair']:.2f} ms/pair vs v1 "
                  f"{res_v1['ms_per_pair']:.2f} ms/pair "
                  f"({ratio}x, batch {batch}, ~{length} cols)",
                  file=sys.stderr)
        return 0

    if args.protein and args.leaf:
        print("[bench_kernel] --protein --leaf not wired (nt codes "
              "only)", file=sys.stderr)
        return 2
    if args.protein and args.length is None:
        length = 400          # typical protein length
    res = bench_config(not args.no_g8, padlen, flen, batch, length,
                       args.grp, args.iters, plat, ablate=args.ablate,
                       marker=args.marker, leaf=args.leaf,
                       prot=args.protein)
    if args.leaf:
        res["leaf"] = True
    if args.protein:
        res["protein"] = True
    if args.marker != 1 << 10:
        res["marker"] = args.marker
    if args.ablate:
        res["ablate"] = args.ablate
    pairs_s, ms_pair = res["value"], res["ms_per_pair"]
    if args.json:
        print(json.dumps(res))
    else:
        print(f"[bench_kernel] {pairs_s:.1f} pairs/s "
              f"({ms_pair:.2f} ms/pair, batch {batch}, "
              f"~{length} cols)", file=sys.stderr)
        if "cells_per_s" in res:
            print(f"[bench_kernel] {res['cells_per_s']} Mcells/s live-band"
                  f" ({res['lane_cells_per_s']} M lane-cells/s stepped, "
                  f"band occupancy {res['band_occupancy']}, "
                  f"~{res['est_pct_vpu_peak']}% of VPU f32 peak)",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
