"""Placement/iterative quality harness: SP-score vs the true tree.

Quantifies the quality of the native workflow components against the
ground truth the reference pipeline's external tools would provide
(epa-ng + gappa placement, MAFFT/RapidNJ guide trees — none of which are
installable in this image): simulate sequences along a KNOWN tree, then
score each strategy's alignment of the SAME sequence set with the
sum-of-pairs metric (twilight_tpu.tools.sp_score), so columns are
directly comparable:

  true-tree     twilight with the simulator's tree (quality ceiling)
  place-w-tree  backbone aligned on the true tree; queries added via
                PLACE_W_TREE with the true tree (reference mode 3)
  graft         backbone aligned on the true tree; queries added by the
                native nearest-leaf grafting workflow (the epa-ng+gappa
                replacement, workflow/placement.py), NO tree given
  iterative     built-in iterative workflow from raw sequences (k-mer
                NJ -> align -> p-distance re-estimate), NO tree given
  [tool]        iterative with an external tree tool when on PATH
                (fasttree / rapidnj / iqtree adapters)

Usage: python tools/quality_harness.py [-n 600] [-l 600] [--seed 2]
           [--backbone-frac 0.8] [--iters 2] [--backend native] [--json]
Reference analogue: workflow/rules/placement.smk, rules/parttree.smk.
"""
import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _read(path):
    from twilight_tpu.seqio.fasta import iter_fasta
    return [(n, s) for n, _, s in iter_fasta(path)]


def _write(path, records):
    with open(path, "w") as f:
        for n, s in records:
            f.write(f">{n}\n{s}\n")


def _sp(path, type_):
    from twilight_tpu.config import Params
    from twilight_tpu.tools.sp_score import sp_score
    rows = [s for _, s in _read(path)]
    param = Params.make(type_)
    n = len(rows)
    return sp_score(rows, type_, param) / (n * (n - 1) / 2)


def _twilight(args_):
    from twilight_tpu import cli
    rc = cli.main(args_)
    if rc != 0:
        raise RuntimeError(f"twilight failed: {args_}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=600)
    ap.add_argument("-l", type=int, default=600)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--backbone-frac", type=float, default=0.8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--backend", default="native")
    ap.add_argument("--type", choices=["n", "p"], default="n")
    ap.add_argument("-d", "--workdir", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import tempfile
    wd = args.workdir or tempfile.mkdtemp(prefix="twq_")
    os.makedirs(wd, exist_ok=True)
    prefix = os.path.join(wd, "sim")
    from twilight_tpu.tools import simulate
    rc = simulate.main(["-n", str(args.n), "-l", str(args.l),
                        "--seed", str(args.seed), "--type", args.type,
                        "-o", prefix])
    assert rc in (0, None)
    all_fa, true_nwk = prefix + ".fa", prefix + ".nwk"
    records = _read(all_fa)
    step = max(2, int(round(1.0 / max(1e-9, 1.0 - args.backbone_frac))))
    backbone = [r for i, r in enumerate(records) if i % step != 0]
    query = [r for i, r in enumerate(records) if i % step == 0]
    bb_fa = os.path.join(wd, "backbone.fa")
    q_fa = os.path.join(wd, "query.fa")
    _write(bb_fa, backbone)
    _write(q_fa, query)

    common = ["--overwrite", "--backend", args.backend]
    if args.type == "p":
        common += ["--type", "p"]
    results = {}
    timing = {}

    # quality ceiling: the true tree, all sequences
    t0 = time.time()
    true_aln = os.path.join(wd, "true.aln")
    _twilight(["-t", true_nwk, "-i", all_fa, "-o", true_aln] + common)
    timing["true-tree"] = time.time() - t0
    results["true-tree"] = _sp(true_aln, args.type)

    # backbone MSA on the true (auto-pruned) tree
    bb_aln = os.path.join(wd, "backbone.aln")
    _twilight(["-t", true_nwk, "-i", bb_fa, "-o", bb_aln] + common)

    # reference mode 3: queries added with the true tree
    t0 = time.time()
    pwt_aln = os.path.join(wd, "pwt.aln")
    _twilight(["-a", bb_aln, "-i", q_fa, "-t", true_nwk, "-o", pwt_aln]
              + common)
    timing["place-w-tree"] = time.time() - t0
    results["place-w-tree"] = _sp(pwt_aln, args.type)

    # native grafting placement (no tree): the epa-ng+gappa replacement
    from twilight_tpu.workflow.placement import run_placement
    t0 = time.time()
    graft_aln = os.path.join(wd, "graft.aln")
    run_placement(q_fa, bb_aln, graft_aln, None, args.iters,
                  os.path.join(wd, "graft_tmp"), args.type, args.backend,
                  [], False)
    timing["graft"] = time.time() - t0
    results["graft"] = _sp(graft_aln, args.type)

    # built-in iterative from raw sequences (no tree at all)
    from twilight_tpu.workflow.iterative import run_iterative
    t0 = time.time()
    iter_aln = os.path.join(wd, "iter.aln")
    run_iterative(all_fa, iter_aln, args.iters,
                  os.path.join(wd, "iter_tmp"), args.type, args.backend,
                  [], False, tree_tool="builtin")
    timing["iterative"] = time.time() - t0
    results["iterative"] = _sp(iter_aln, args.type)

    # external tree tools, when present
    for tool in ("fasttree", "FastTree", "rapidnj", "iqtree"):
        if shutil.which(tool):
            key = f"iterative-{tool.lower()}"
            t0 = time.time()
            out = os.path.join(wd, key + ".aln")
            run_iterative(all_fa, out, args.iters,
                          os.path.join(wd, key + "_tmp"), args.type,
                          args.backend, [], False,
                          tree_tool=tool.lower())
            timing[key] = time.time() - t0
            results[key] = _sp(out, args.type)

    ceiling = results["true-tree"]
    table = {k: {"sp_per_pair": round(v, 2),
                 "pct_of_true_tree": round(100.0 * v / ceiling, 2),
                 "wall_s": round(timing[k], 1)}
             for k, v in results.items()}
    if args.json:
        print(json.dumps({"n": args.n, "l": args.l, "seed": args.seed,
                          "results": table}))
    else:
        print(f"n={args.n} l={args.l} seed={args.seed} "
              f"backbone={len(backbone)} query={len(query)}",
              file=sys.stderr)
        for k, v in table.items():
            print(f"  {k:18s} SP/pair {v['sp_per_pair']:10.2f}  "
                  f"{v['pct_of_true_tree']:6.2f}% of true-tree  "
                  f"({v['wall_s']}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
