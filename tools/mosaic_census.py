"""Mosaic IR census of the grouped Pallas kernel.

Lowers the production (or ablated) kernel client-side on the real
backend (no server compile), decodes the serialized Mosaic module out
of the tpu_custom_call backend_config, and counts ops per while-loop
body — split into straight-line vs inside-scf.if-region ops, and by
result shape class. This is what found the round-5 "dark matter"
structure: 92% of the DP body's ops live in the pl.when regions
(anchor staging + tb store), so region-boundary cost — invisible to
both the execution-level ablation tokens and every flat synthetic
probe — became the prime suspect.

Usage: python tools/mosaic_census.py [--ablate tok,tok] [--flen 512]
       [--padlen 2048] [--batch 8] [--grp 8]
"""
import argparse
import base64
import collections
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def lower_mosaic(padlen, flen, batch, grp, ablate, marker):
    from tools.bench_kernel import nuc_matrix, build_batch
    from twilight_tpu.ops import talco_pallas_g8 as g8
    import jax
    mb = nuc_matrix().tobytes()
    kern, maxaln, off, tot = g8.get_pallas_kernel_g8(
        padlen, flen, 6, marker, mb, 5, batch, grp=grp, ablate=ablate)
    inputs = build_batch(batch, min(padlen - 348, 1700), padlen, off,
                         tot, seed=1)
    txt = jax.jit(lambda *a: kern(*a)).lower(*inputs).as_text()
    m = re.search(r'backend_config = "((?:[^"\\]|\\.)*)"', txt)
    cfg = m.group(1).replace('\\22', '"').replace('\\5c', '\\') \
        .replace('\\0a', '\n')
    body = json.loads(cfg)["custom_call_config"]["body"]
    raw = base64.b64decode(body + "=" * (-len(body) % 4))
    from jax._src.lib.mlir import ir
    import jax._src.interpreters.mlir as jmlir
    ctx = jmlir.make_ir_context()
    ctx.allow_unregistered_dialects = True
    with ctx:
        return str(ir.Module.parse(raw))


def _regions_of(s, start, n=2):
    i = s.index("({", start)
    regs, depth, j, cur = [], 0, i + 1, None
    while True:
        c = s[j]
        if c == "{":
            if depth == 0:
                cur = j
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                regs.append((cur, j))
                if len(regs) == n:
                    return regs
        j += 1


def census(s):
    wls = [m.start()
           for m in re.finditer(r'"stable_mosaic\.scf\.while"', s)]
    spans = [(_regions_of(s, w)[1]) for w in wls]
    # name loops by nesting: the outer (tile) loop contains the rest
    outer = max(range(len(spans)), key=lambda i: spans[i][1] - spans[i][0])
    rows = []
    for i, (lo, hi) in enumerate(spans):
        if i == outer:
            continue
        body = s[lo:hi]
        total = len(re.findall(r'"stable_mosaic\.', body))
        # ops inside scf.if regions of this body
        spans_if = []
        for m in re.finditer(r'"stable_mosaic\.scf\.if"', body):
            regs = _regions_of(body, m.start(), n=2)
            spans_if.append((regs[0][0], regs[-1][1]))
        merged = []
        for a, b in sorted(spans_if):
            if merged and a < merged[-1][1]:
                merged[-1] = (merged[-1][0], max(b, merged[-1][1]))
            else:
                merged.append((a, b))
        inside = sum(len(re.findall(r'"stable_mosaic\.', body[a:b]))
                     for a, b in merged)
        big = len(re.findall(r'8x640', body))
        rot = len(re.findall(r'tpu\.dynamic_rotate', body))
        ld = len(re.findall(r'vector\.load', body))
        st_ = len(re.findall(r'vector\.store', body))
        rows.append({"loop": f"while[{i}]", "bytes": hi - lo,
                     "ops": total, "in_if": inside,
                     "straight": total - inside, "ifs": len(spans_if),
                     "x640_refs": big, "rotates": rot, "loads": ld,
                     "stores": st_})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="")
    ap.add_argument("--flen", type=int, default=512)
    ap.add_argument("--padlen", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grp", type=int, default=8)
    ap.add_argument("--marker", type=int, default=1 << 10)
    args = ap.parse_args()
    s = lower_mosaic(args.padlen, args.flen, args.batch, args.grp,
                     args.ablate, args.marker)
    print(f"ablate='{args.ablate}' module {len(s)} chars")
    for r in census(s):
        print("  " + json.dumps(r))


if __name__ == "__main__":
    main()
