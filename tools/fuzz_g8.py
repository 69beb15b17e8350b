"""On-device parity fuzz for the grouped (8x) Pallas TALCO kernel.

Runs random profile pairs through ops/talco_pallas_g8.py on the real
backend (TPU, or CPU interpret mode with --interpret) and asserts
bit-identical alignment paths vs the NumPy oracle (ops/talco_np.py) —
the executable form of the CLAUDE.md invariant "fuzz them against the
oracle after any change". Covers the freq path and the leaf int-code
path. Exit 0 = all cases matched.

Usage:  python tools/fuzz_g8.py [--n 32] [--seed 0] [--flen 512]
            [--padlen 2048] [--interpret]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

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


def random_pair(rng, ref_len, qry_len, num=1.0, mutate=0.12, indel=0.04):
    base = rng.integers(0, 4, size=max(ref_len, qry_len) + 32)
    ref = base[:ref_len].copy()
    qry = []
    i = 0
    while len(qry) < qry_len and i < len(base):
        r = rng.random()
        if r < indel / 2:
            i += 1
            continue
        if r < indel:
            qry.append(rng.integers(0, 4))
            continue
        c = base[i]
        if rng.random() < mutate:
            c = rng.integers(0, 4)
        qry.append(c)
        i += 1
    while len(qry) < qry_len:
        qry.append(rng.integers(0, 4))
    qry = np.array(qry[:qry_len])
    fr = np.zeros((ref_len, 6), dtype=np.float32)
    fq = np.zeros((qry_len, 6), dtype=np.float32)
    fr[np.arange(ref_len), ref] = num
    fq[np.arange(qry_len), qry] = num
    return fr, fq, ref, qry


def run_oracle(fr, fq, num, gap_char, marker=1 << 10):
    from twilight_tpu.ops import talco_np
    lens = (fr.shape[0], fq.shape[0])
    gap_op = (np.full(lens[0], GO, np.float32),
              np.full(lens[1], GO, np.float32))
    gap_ex = (np.full(lens[0], GE, np.float32),
              np.full(lens[1], GE, np.float32))
    tp = talco_np.TalcoRunParams(nuc_matrix(), GO, GE, gap_char,
                                 int(1000 * -GE), marker=marker)
    return talco_np.align_freq(tp, fr, fq, gap_op, gap_ex, num)


def run_g8(pairs, padlen, flen, leaf=False, interpret=False, nums=None,
           grp=8, marker=1 << 10):
    """pairs: list of (fr, fq) or, for leaf, (ref_codes, qry_codes)."""
    from twilight_tpu.ops import talco_pallas, talco_pallas_g8
    b = len(pairs)
    assert b % grp == 0
    kern, maxaln, off, tot = talco_pallas_g8.get_pallas_kernel_g8(
        padlen, flen, 6, marker, nuc_matrix().tobytes(), 6, b, leaf=leaf,
        interpret=interpret, grp=grp)
    rl = np.ones(b, np.int32)
    ql = np.ones(b, np.int32)
    if leaf:
        ref_b = np.full((b, 1, tot), 4, dtype=np.int8)
        qry_b = np.full((b, 1, tot), 4, dtype=np.int8)
        for i, (rc, qc) in enumerate(pairs):
            rl[i], ql[i] = len(rc), len(qc)
            ref_b[i, 0, off + padlen - len(rc):off + padlen] = rc[::-1]
            qry_b[i, 0, off:off + len(qc)] = qc
        gap_char = np.full(b, GE, np.float32)
    else:
        ref_b = np.zeros((b, 8, tot), dtype=np.float32)
        qry_b = np.zeros((b, 8, tot), dtype=np.float32)
        for i, (fr, fq) in enumerate(pairs):
            rl[i], ql[i] = fr.shape[0], fq.shape[0]
            go = (np.full(rl[i], GO, np.float32),
                  np.full(ql[i], GO, np.float32))
            ge = (np.full(rl[i], GE, np.float32),
                  np.full(ql[i], GE, np.float32))
            talco_pallas.pack_pair_into(ref_b[i], qry_b[i], fr, fq, go, ge,
                                        padlen, off)
        gap_char = np.full(b, GE, np.float32)
    ones = np.ones(b, np.float32) if nums is None \
        else np.asarray(nums, np.float32)
    res = kern(rl, ql, ones, ones, np.full(b, 4096, np.int32),
               np.full(b, int(1000 * -GE), np.int32), gap_char,
               np.full(b, GO, np.float32), np.full(b, GE, np.float32),
               ref_b, qry_b)
    out = np.asarray(res[0])
    tail = np.asarray(res[1])
    return out, tail[:, 0], tail[:, 1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="pairs per mode")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--flen", type=int, default=512)
    ap.add_argument("--padlen", type=int, default=2048)
    ap.add_argument("--interpret", action="store_true",
                    help="force CPU + Pallas interpret mode")
    ap.add_argument("--grp", type=int, default=8, choices=(8, 16),
                    help="pairs per grouped-kernel program")
    ap.add_argument("--paths", default="nt,protein",
                    help="comma list of path families to fuzz: nt "
                         "(freq+leaf) and/or protein (freq+leaf)")
    ap.add_argument("--marker", type=int, default=1 << 10,
                    help="convergence marker (small values let interpret "
                         "runs exercise tiling/convergence with short "
                         "cases)")
    ap.add_argument("--wide", action="store_true",
                    help="force an escalated wide window (flen 2048) so "
                         "the hbm_tb kernel variant is exercised — "
                         "survives the interpret-mode shape clamp")
    args = ap.parse_args()
    path_set = set(args.paths.split(","))

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"[fuzz_g8] backend: {jax.devices()[0].platform}", file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    n = (args.n + args.grp - 1) // args.grp * args.grp
    fails = 0
    skipped = 0   # err-6 (band overflow -> host escalation) cases
    checked = 0   # cases that actually exercised the success/ladder path
    maxlen = 160 if args.interpret else min(args.padlen, 1400)
    if args.interpret:
        args.padlen, args.flen = min(args.padlen, 256), min(args.flen, 256)
    if args.wide:
        args.flen = 2048

    if "nt" in path_set:
        # freq path: mixed lengths, one-hot and 2-seq profiles
        cases = []
        for i in range(n):
            r = int(rng.integers(64, maxlen))
            q = max(32, r + int(rng.integers(-40, 40)))
            num = 1.0 if i % 3 else 2.0
            fr, fq, _, _ = random_pair(rng, r, q, num=1.0)
            if num == 2.0:
                fr2, fq2, _, _ = random_pair(rng, r, q, num=1.0)
                fr, fq = fr + fr2, fq + fq2
            cases.append((fr, fq, num))
        out, lens, errs = run_g8([(fr, fq) for fr, fq, _ in cases],
                                 args.padlen, args.flen,
                                 interpret=args.interpret,
                                 nums=[num for _, _, num in cases],
                                 grp=args.grp, marker=args.marker)
        for i, (fr, fq, num) in enumerate(cases):
            gold, gerr = run_oracle(fr, fq, (num, num), GE,
                                    marker=args.marker)
            if errs[i] == 6:
                skipped += 1
                continue  # union-band overflow: host escalates; not a
                # mismatch
            checked += 1
            ok = (errs[i] == gerr and
                  (gerr != 0 or (lens[i] == len(gold)
                                 and np.array_equal(out[i, :lens[i]],
                                                    gold))))
            if not ok:
                fails += 1
                print(f"[fuzz_g8] freq case {i} MISMATCH: err {errs[i]} "
                      f"vs {gerr}, len {lens[i]} vs {len(gold)}",
                      file=sys.stderr)
        print(f"[fuzz_g8] freq path: {n} cases done", file=sys.stderr)

        # leaf int-code path vs the same pairs' one-hot oracle
        leaf_cases = []
        for i in range(n):
            r = int(rng.integers(64, maxlen))
            q = max(32, r + int(rng.integers(-40, 40)))
            fr, fq, rc, qc = random_pair(rng, r, q)
            leaf_cases.append((fr, fq, rc, qc))
        out, lens, errs = run_g8([(rc, qc) for _, _, rc, qc in leaf_cases],
                                 args.padlen, args.flen, leaf=True,
                                 interpret=args.interpret, grp=args.grp,
                                 marker=args.marker)
        for i, (fr, fq, _, _) in enumerate(leaf_cases):
            gold, gerr = run_oracle(fr, fq, (1.0, 1.0), GE,
                                    marker=args.marker)
            if errs[i] == 6:
                skipped += 1
                continue
            checked += 1
            ok = (errs[i] == gerr and
                  (gerr != 0 or (lens[i] == len(gold)
                                 and np.array_equal(out[i, :lens[i]],
                                                    gold))))
            if not ok:
                fails += 1
                print(f"[fuzz_g8] leaf case {i} MISMATCH: err {errs[i]} "
                      f"vs {gerr}, len {lens[i]} vs {len(gold)}",
                      file=sys.stderr)
        print(f"[fuzz_g8] leaf path: {n} cases done", file=sys.stderr)

    if "protein" in path_set:
        # protein path (BLOSUM62, 24-row packing, distinct similarity order)
        from twilight_tpu.config import Params
        from twilight_tpu.ops import talco_np, talco_pallas, talco_pallas_g8
        param = Params.make("p", blosum=62)
        mat = param.scoring_matrix.astype(np.float32)
        pgo, pge = param.gap_open, param.gap_extend
        P = 22
        pb = args.grp
        pkern, pmaxaln, poff, ptot = talco_pallas_g8.get_pallas_kernel_g8(
            args.padlen, args.flen, P, 1 << 10, mat.tobytes(),
            param.matrix_size, pb, interpret=args.interpret, grp=args.grp)
        ref_b = np.zeros((pb, 24, ptot), np.float32)
        qry_b = np.zeros((pb, 24, ptot), np.float32)
        rl = np.ones(pb, np.int32)
        ql = np.ones(pb, np.int32)
        pcases = []
        for i in range(pb):
            pl = int(rng.integers(64, min(maxlen, 400)))
            base = rng.integers(0, 20, pl + 8)
            qq = base.copy()
            mm = rng.random(len(qq)) < 0.12
            qq[mm] = rng.integers(0, 20, int(mm.sum()))
            fr = np.zeros((pl, P), np.float32)
            fq = np.zeros((pl, P), np.float32)
            fr[np.arange(pl), base[:pl]] = 1.0
            fq[np.arange(pl), qq[:pl]] = 1.0
            go = (np.full(pl, pgo, np.float32),) * 2
            ge = (np.full(pl, pge, np.float32),) * 2
            talco_pallas.pack_pair_into(ref_b[i], qry_b[i], fr, fq, go, ge,
                                        args.padlen, poff)
            rl[i] = ql[i] = pl
            pcases.append((fr, fq, go, ge))
        ones = np.ones(pb, np.float32)
        pres = pkern(
            rl, ql, ones, ones, np.full(pb, 4096, np.int32),
            np.full(pb, int(1000 * -pge), np.int32),
            np.full(pb, pge, np.float32), np.full(pb, pgo, np.float32),
            np.full(pb, pge, np.float32), ref_b, qry_b)
        pout = np.asarray(pres[0])
        ptail = np.asarray(pres[1])
        for i, (fr, fq, go, ge) in enumerate(pcases):
            tp = talco_np.TalcoRunParams(param.scoring_matrix, pgo, pge, pge,
                                         int(1000 * -pge))
            gold, gerr = talco_np.align_freq(tp, fr, fq, go, ge, (1.0, 1.0))
            ln = ptail[i, 0]
            e = ptail[i, 1]
            if e == 6:
                skipped += 1
                continue
            checked += 1
            ok = (e == gerr and (gerr != 0 or (
                ln == len(gold) and np.array_equal(pout[i, :ln], gold))))
            if not ok:
                fails += 1
                print(f"[fuzz_g8] protein case {i} MISMATCH: err {e} vs "
                      f"{gerr}, len {ln} vs {len(gold)}", file=sys.stderr)
        print(f"[fuzz_g8] protein path: {pb} cases done", file=sys.stderr)

        # protein LEAF path (int-code rows, similarity-leaf BLOSUM lookup)
        plkern, plmax, ploff, pltot = talco_pallas_g8.get_pallas_kernel_g8(
            args.padlen, args.flen, P, 1 << 10, mat.tobytes(),
            param.matrix_size, pb, leaf=True, interpret=args.interpret,
            grp=args.grp)
        ref_c = np.full((pb, 1, pltot), 20, dtype=np.int8)
        qry_c = np.full((pb, 1, pltot), 20, dtype=np.int8)
        prl = np.ones(pb, np.int32)
        pql = np.ones(pb, np.int32)
        plcases = []
        for i in range(pb):
            pl = int(rng.integers(64, min(maxlen, 400)))
            base = rng.integers(0, 20, pl + 8)
            qq = base.copy()
            mm = rng.random(len(qq)) < 0.12
            qq[mm] = rng.integers(0, 20, int(mm.sum()))
            rc = base[:pl].astype(np.int8)
            qc = qq[:pl].astype(np.int8)
            ref_c[i, 0, ploff + args.padlen - pl:ploff + args.padlen] = rc[::-1]
            qry_c[i, 0, ploff:ploff + pl] = qc
            prl[i] = pql[i] = pl
            plcases.append((rc, qc))
        ones = np.ones(pb, np.float32)
        plres = plkern(
            prl, pql, ones, ones, np.full(pb, 4096, np.int32),
            np.full(pb, int(1000 * -pge), np.int32),
            np.full(pb, pge, np.float32), np.full(pb, pgo, np.float32),
            np.full(pb, pge, np.float32), ref_c, qry_c)
        plout = np.asarray(plres[0])
        pltail = np.asarray(plres[1])
        for i, (rc, qc) in enumerate(plcases):
            pl = len(rc)
            fr = np.zeros((pl, P), np.float32)
            fq = np.zeros((pl, P), np.float32)
            fr[np.arange(pl), rc] = 1.0
            fq[np.arange(pl), qc] = 1.0
            go = (np.full(pl, pgo, np.float32),) * 2
            ge = (np.full(pl, pge, np.float32),) * 2
            tp = talco_np.TalcoRunParams(param.scoring_matrix, pgo, pge, pge,
                                         int(1000 * -pge))
            gold, gerr = talco_np.align_freq(tp, fr, fq, go, ge, (1.0, 1.0))
            ln = pltail[i, 0]
            e = pltail[i, 1]
            if e == 6:
                skipped += 1
                continue
            checked += 1
            ok = (e == gerr and (gerr != 0 or (
                ln == len(gold) and np.array_equal(plout[i, :ln], gold))))
            if not ok:
                fails += 1
                print(f"[fuzz_g8] protein-leaf case {i} MISMATCH: err {e} vs "
                      f"{gerr}, len {ln} vs {len(gold)}", file=sys.stderr)
        print(f"[fuzz_g8] protein-leaf path: {pb} cases done", file=sys.stderr)

    if fails:
        print(f"[fuzz_g8] FAILED: {fails} mismatches", file=sys.stderr)
        return 1
    # vacuity guard: if a kernel regression made (nearly) every case
    # overflow its band, the parity fuzz would "pass" without checking
    # anything — require the success path to have actually run
    total = checked + skipped
    if total and checked < total // 2:
        print(f"[fuzz_g8] FAILED: only {checked}/{total} cases exercised "
              "the success path (rest hit err-6 band overflow) — "
              "parity not meaningfully tested", file=sys.stderr)
        return 1
    print(f"[fuzz_g8] OK: all cases bit-identical "
          f"({checked} checked, {skipped} err-6 skips)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
