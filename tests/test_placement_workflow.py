"""Placement workflow (align -> native graft placement -> realign).

Reference semantics: workflow placement mode (Snakefile:102-104 +
rules/placement.smk epa-ng/gappa grafting), replaced by the native
nearest-leaf grafting in twilight_tpu/workflow/placement.py. Checks:
the workflow runs end-to-end with no external binaries, the final MSA
contains every backbone and query row, query rows degap to the input
sequences, and the grafted tree contains every query as a leaf.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from twilight_tpu.phylo.tree import Tree
from twilight_tpu.seqio.fasta import iter_fasta
from twilight_tpu.workflow.placement import (graft_queries,
                                             nearest_backbone_leaves,
                                             run_placement)

from conftest import REPO


def _simulate(tmp_path, n=40, length=150, seed=11):
    prefix = str(tmp_path / "sim")
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.tools.simulate",
         "-n", str(n), "-l", str(length), "--seed", str(seed),
         "-o", prefix], cwd=REPO, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    return prefix + ".fa", prefix + ".nwk"


def test_placement_workflow_e2e(tmp_path):
    from twilight_tpu import cli

    fa, nwk = _simulate(tmp_path)
    seqs = {n: s for n, _, s in iter_fasta(fa)}
    names = list(seqs)
    backbone_names = names[:32]
    query_names = names[32:]
    bb_fa = str(tmp_path / "backbone.fa")
    q_fa = str(tmp_path / "query.fa")
    with open(bb_fa, "w") as f:
        for n in backbone_names:
            f.write(f">{n}\n{seqs[n]}\n")
    with open(q_fa, "w") as f:
        for n in query_names:
            f.write(f">{n}\n{seqs[n]}\n")

    # backbone MSA + backbone tree (prune the true tree to backbone)
    bb_aln = str(tmp_path / "backbone.aln")
    bb_nwk = str(tmp_path / "backbone.nwk")
    t = Tree.from_newick_file(nwk)
    pruned = t.prune(set(backbone_names))
    with open(bb_nwk, "w") as f:
        f.write(pruned.get_newick_string() + "\n")
    rc = cli.main(["-t", bb_nwk, "-i", bb_fa, "-o", bb_aln,
                   "--backend", "numpy", "--rooted"])
    assert rc == 0

    out = str(tmp_path / "placed.aln")
    run_placement(q_fa, bb_aln, out, backbone_tree=bb_nwk, iterations=2,
                  temp_dir=str(tmp_path / "wf"), backend="numpy",
                  keep_temp=True)

    rows = {n: s for n, _, s in iter_fasta(out)}
    assert set(rows) == set(names)
    lens = {len(s) for s in rows.values()}
    assert len(lens) == 1, "ragged output"
    for n in query_names:
        degapped = rows[n].replace("-", "").replace(".", "")
        assert degapped == seqs[n], f"query {n} corrupted"

    gt = Tree.from_newick_file(str(tmp_path / "wf" / "tree_iter1.nwk"))
    leaf_names = {nd.identifier for nd in gt.root.collect_post_order()
                  if nd.is_leaf()}
    assert set(query_names) <= leaf_names
    assert set(backbone_names) <= leaf_names


def test_nearest_and_graft_units():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 60)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    b1 = letters[base]
    b2 = letters[(base + 2) % 4]           # maximally distant
    q = b1.copy()
    q[:6] = letters[(base[:6] + 1) % 4]    # near b1
    placements = nearest_backbone_leaves(
        ["q"], q[None, :], ["L1", "L2"], np.stack([b1, b2]))
    assert placements == {"q": "L1"}

    tree = Tree()
    tree.parse_newick("(L1:1.0,L2:1.0);")
    graft_queries(tree, {"q": "L1"})
    leaves = {nd.identifier for nd in tree.root.collect_post_order()
              if nd.is_leaf()}
    assert leaves == {"L1", "L2", "q"}
    # L1's edge was split: q and L1 are now siblings
    l1 = [nd for nd in tree.root.collect_post_order()
          if nd.identifier == "L1"][0]
    sibs = {c.identifier for c in l1.parent.children}
    assert sibs == {"L1", "q"}
