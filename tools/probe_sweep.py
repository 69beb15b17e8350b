"""Pinned-trips subtractive sweep of the production grouped kernel.

The round-5 probe campaign showed no SYNTHETIC loop reproduces the
production kernel's ~5 us/diagonal (an op-equivalent body runs ~6x
faster), so this instrument attacks from the production side: the
`probeN` ablate token pins every pair's DP loop to exactly N diagonals
(data-independent exit with the real abort/stop dataflow preserved via
opaque-false poisons, one tile per pair, walk/merge clamped), which
makes the subtractive strip tokens directly comparable — every variant
steps the SAME diagonal count, so paired us/diag deltas attribute
exactly the stripped construct.

All variants are compiled in one process and launched round-robin
interleaved (the shared-tunnel weather rule: only same-phase paired
numbers are trustworthy). The min over rounds per variant is the
steady-state figure.

Usage: python tools/probe_sweep.py [--trips 2048] [--batch 64]
                                   [--rounds 8] [--tokens a,b,...]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# nomask is omitted: the unmasked-rotation passthrough makes a
# loop-carried (8,1) i32 layout-replicated and Mosaic rejects the
# {0,*} -> {*,*} relayout in the pre-marker while carry ("Invalid
# relayout: Non-singleton logical dimension is replicated in
# destination but not in source"); the freeze selects it would strip
# are in the measured-free class anyway.
DEFAULT_TOKENS = [
    # execution strips (the construct's work is removed; regions that
    # wrap it may remain in the IR)
    "nosim", "nodiv", "nored", "notb", "noroll", "noanchor",
    "noband", "noorg", "nocore",
    # REGION strips: an IR census (BASELINE.md round 5) found 92% of
    # the DP body's Mosaic ops inside the pl.when regions (anchor
    # staging + tb store); these remove the regions from the trace
    # entirely — baseline-vs-strip attributes region PRESENCE
    # (scheduler/allocation boundary cost), strip-vs-noX attributes
    # execution
    "stripanchor", "striptb", "stripanchor,striptb",
    "stripanchor,striptb,noroll",
    # everything at once — the residual is the un-strippable loop
    "nosim,nored,noconv,notb,noroll,noanchor,noband,noorg,nomax,"
    "nokill,nolive",
    # ... with regions + affine core stripped too: the production-
    # program equivalent of the synthetic carcass probes
    "nosim,nored,noconv,stripanchor,striptb,noroll,noband,noorg,"
    "nomax,nokill,nolive,nocore",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--len", type=int, dest="length", default=1700)
    ap.add_argument("--flen", type=int, default=512)
    ap.add_argument("--padlen", type=int, default=2048)
    ap.add_argument("--marker", type=int, default=1 << 10)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--tokens", default=None,
                    help="semicolon-separated strip-token sets "
                         "(default: the full single-token sweep)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--watch", type=float, default=0.0,
                    help="good-weather gate: after warming, probe one "
                         "baseline launch every ~4 min and run the "
                         "measurement only when it beats this many "
                         "seconds (e.g. 0.15); keeps the process (and "
                         "its server-compiled programs) alive through "
                         "bad phases")
    ap.add_argument("--watch-hours", type=float, default=6.0)
    args = ap.parse_args()

    from tools.bench_kernel import nuc_matrix, build_batch
    from twilight_tpu.ops import talco_pallas_g8

    import jax
    cache_dir = os.path.expanduser("~/.cache/twilight_tpu_jax/tpu")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    print(f"[probe_sweep] backend: {plat}", file=sys.stderr)

    tokens = (args.tokens.split(";") if args.tokens is not None
              else DEFAULT_TOKENS)
    base = f"probe{args.trips}"
    variants = [("baseline", base)] + \
        [(t, f"{base},{t}") for t in tokens]

    mb = nuc_matrix().tobytes()
    kerns = []
    for name, abl in variants:
        t0 = time.time()
        kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
            args.padlen, args.flen, 6, args.marker, mb, 5, args.batch,
            ablate=abl)
        kerns.append((name, kern))
        print(f"[probe_sweep] built {name} ({time.time() - t0:.1f}s)",
              file=sys.stderr)
    # device-resident inputs: the attribution must measure COMPUTE.
    # With host (numpy) inputs every launch re-ships ~8.4 MB through
    # the tunnel (measured 66.5% of launch time) and all strip deltas
    # drown — the first sweeps measured exactly that (full-strip
    # carcass "only 6.5% faster": the transfer is strip-invariant).
    inputs = jax.device_put(
        build_batch(args.batch, args.length, args.padlen, off, tot))
    for r in inputs:
        r.block_until_ready()

    diags = {}
    for name, kern in kerns:     # first-execution server compile + warm
        t0 = time.time()
        for _ in range(2):
            res = kern(*inputs)
            for r in res:
                np.asarray(r)
        tail = np.asarray(res[1])
        d = tail[:, 3].astype(np.int64)
        diags[name] = int(sum(d[g * 8:(g + 1) * 8].max()
                              for g in range(args.batch // 8)))
        print(f"[probe_sweep] warm {name}: diags={diags[name]} "
              f"({time.time() - t0:.1f}s)", file=sys.stderr)

    if args.watch > 0:
        deadline = time.time() + args.watch_hours * 3600
        name0, kern0 = kerns[0]
        while True:
            t0 = time.time()
            res = kern0(*inputs)
            for r in res:
                np.asarray(r)
            dt = time.time() - t0
            print(f"[probe_sweep] weather probe: {dt:.3f}s "
                  f"(gate {args.watch:.3f})", flush=True, file=sys.stderr)
            if dt < args.watch:
                break
            if time.time() > deadline:
                print("[probe_sweep] watch window expired; measuring "
                      "anyway", file=sys.stderr)
                break
            time.sleep(240)

    # ROTATED round-robin: a first fixed-order run measured every strip
    # SLOWER than baseline, cost rising ~monotonically with position in
    # the round — the tunnel rate-limits bursts (token bucket), so the
    # first launch of each round always hits a refilled bucket. Rotating
    # the start index gives every variant every position; the min over
    # rounds then compares like with like.
    best = {name: float("inf") for name, _ in kerns}
    samples = {name: [] for name, _ in kerns}
    for rnd in range(args.rounds):
        order = kerns[rnd % len(kerns):] + kerns[:rnd % len(kerns)]
        for name, kern in order:
            t0 = time.time()
            res = kern(*inputs)
            for r in res:
                np.asarray(r)
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            samples[name].append(dt)

    us0 = 1e6 * best["baseline"] / max(diags["baseline"], 1)
    rows = []
    for name, _ in kerns:
        us = 1e6 * best[name] / max(diags[name], 1)
        med = 1e6 * float(np.median(samples[name])) \
            / max(diags[name], 1)
        rows.append({"variant": name, "us_per_diag": round(us, 3),
                     "us_per_diag_med": round(med, 3),
                     "delta_vs_base": round(us - us0, 3),
                     "share_pct": round(100.0 * (us0 - us) / us0, 1),
                     "group_diags": diags[name]})
    out = {"metric": "probe_sweep_us_per_diag", "trips": args.trips,
           "batch": args.batch, "len": args.length, "flen": args.flen,
           "backend": plat, "rows": rows}
    if args.json:
        print(json.dumps(out))
    else:
        print(f"pinned trips={args.trips} batch={args.batch} "
              f"flen={args.flen} backend={plat}")
        for r in rows:
            print(f"  {r['variant']:<70} {r['us_per_diag']:>8.3f} us/diag"
                  f" (med {r['us_per_diag_med']:.3f})"
                  f"  ({r['share_pct']:+.1f}%)")


if __name__ == "__main__":
    main()
