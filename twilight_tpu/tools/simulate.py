"""Synthetic dataset generator: evolve sequences along a random birth tree.

Used for scale benchmarking (the bundled datasets top out at 579 sequences;
production workloads are 10^4-10^6). Produces a FASTA + the true guide tree
in Newick, so default-mode runs need no external tree estimation.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

_ALPHA_NT = np.frombuffer(b"ACGT", dtype=np.uint8)
_ALPHA_AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def simulate(n_seqs: int, length: int, mut_rate: float = 0.05,
             indel_rate: float = 0.005, seed: int = 0, type_: str = "n"):
    """Returns (names, seqs, newick). Random coalescent-ish binary tree by
    repeated pairwise joins; sequences evolve from the root with per-branch
    substitutions and small indels."""
    rng = np.random.default_rng(seed)
    nletters = 4 if type_ == "n" else 20
    root = rng.integers(0, nletters, size=length).astype(np.uint8)

    def evolve(seq, t):
        out = seq.copy()
        m = rng.random(len(out)) < mut_rate * t
        out[m] = rng.integers(0, nletters, int(m.sum()))
        # indels: a few short deletions/insertions
        n_indel = rng.poisson(indel_rate * t * len(out))
        for _ in range(int(n_indel)):
            pos = int(rng.integers(0, len(out)))
            ln = int(rng.integers(1, 8))
            if rng.random() < 0.5 and len(out) > ln + 1:
                out = np.concatenate([out[:pos], out[pos + ln:]])
            else:
                ins = rng.integers(0, nletters, ln).astype(np.uint8)
                out = np.concatenate([out[:pos], ins, out[pos:]])
        return out

    # grow a random binary tree: start from root, split until n_seqs leaves
    leaves = [(root, 1.0, "")]  # (seq, branch time budget, newick fragment)
    names = []
    seqs = []
    counter = [0]

    def grow(seq, budget, n_target):
        if n_target == 1:
            counter[0] += 1
            name = f"S{counter[0]}"
            names.append(name)
            seqs.append(seq)
            return f"{name}:{budget:.4f}"
        left_n = int(rng.integers(1, n_target))
        t1 = float(rng.uniform(0.05, 0.5))
        t2 = float(rng.uniform(0.05, 0.5))
        s1 = evolve(seq, t1)
        s2 = evolve(seq, t2)
        f1 = grow(s1, t1, left_n)
        f2 = grow(s2, t2, n_target - left_n)
        return f"({f1},{f2}):{budget:.4f}"

    sys.setrecursionlimit(max(10000, 4 * n_seqs))
    nwk = grow(root, 0.1, n_seqs)[:-7]  # strip root branch length
    nwk = nwk + ";"
    alpha = _ALPHA_NT if type_ == "n" else _ALPHA_AA
    seq_strs = [bytes(alpha[s]).decode() for s in seqs]
    return names, seq_strs, nwk


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="twilight-tpu-simulate")
    p.add_argument("-n", "--num", type=int, default=1000)
    p.add_argument("-l", "--length", type=int, default=1000)
    p.add_argument("-m", "--mut-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--type", choices=["n", "p"], default="n")
    p.add_argument("-o", "--out-prefix", required=True)
    args = p.parse_args(argv)
    names, seqs, nwk = simulate(args.num, args.length, args.mut_rate,
                                seed=args.seed, type_=args.type)
    with open(args.out_prefix + ".fa", "w") as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")
    with open(args.out_prefix + ".nwk", "w") as f:
        f.write(nwk + "\n")
    print(f"wrote {len(names)} seqs to {args.out_prefix}.fa/.nwk",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
