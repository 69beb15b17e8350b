"""Guide-tree estimation + iterative workflow tests
(twilight_tpu/trees, twilight_tpu/workflow — the reference workflow layer's
internal replacement)."""
import os

import numpy as np
import pytest

from twilight_tpu.phylo.tree import Tree
from twilight_tpu.seqio.fasta import iter_fasta
from twilight_tpu.trees import (build_guide_tree, kmer_profiles,
                                neighbor_joining, pairwise_distances)
from twilight_tpu.workflow import run_iterative

from conftest import DATA, DATASET


def test_nj_additive_matrix_recovers_branch_lengths():
    # tree ((A:2,B:3):1,C:4,D:5): additive distances
    names = ["A", "B", "C", "D"]
    d = np.array([[0, 5, 7, 8],
                  [5, 0, 8, 9],
                  [7, 8, 0, 9],
                  [8, 9, 0, 0]], dtype=float)
    d[3, 2] = d[2, 3] = 9
    nwk = neighbor_joining(d, names)
    assert "A:2.000000" in nwk
    assert "B:3.000000" in nwk
    # A and B must be siblings
    assert "(A:2.000000,B:3.000000)" in nwk or \
           "(B:3.000000,A:2.000000)" in nwk
    t = Tree()
    t.parse_newick(nwk)
    leaves = [n for n in t.all_nodes.values() if n.is_leaf()]
    assert sorted(n.identifier for n in leaves) == names


def test_kmer_distances_separate_families(rng):
    base1 = "".join(rng.choice(list("ACGT"), 200))
    base2 = "".join(rng.choice(list("ACGT"), 200))

    def mutate(s, rate):
        out = list(s)
        for i in range(len(out)):
            if rng.random() < rate:
                out[i] = rng.choice(list("ACGT"))
        return "".join(out)

    seqs = [base1, mutate(base1, 0.05), base2, mutate(base2, 0.05)]
    d = pairwise_distances(kmer_profiles(seqs))
    assert d[0, 1] < d[0, 2]
    assert d[2, 3] < d[2, 1]
    assert np.allclose(np.diag(d), 0.0)


def test_parttree_recursion_covers_all_names(rng):
    seqs = ["".join(rng.choice(list("ACGT"), 120)) for _ in range(30)]
    names = [f"s{i}" for i in range(30)]
    nwk = build_guide_tree(names, seqs, nj_cap=8)
    t = Tree()
    t.parse_newick(nwk)
    leaves = sorted(n.identifier for n in t.all_nodes.values()
                    if n.is_leaf())
    assert leaves == sorted(names)


def test_iterative_workflow_protein(tmp_path):
    out = str(tmp_path / "iter_prot.aln")
    run_iterative(os.path.join(DATA, "prot_16.fa"), out, iterations=2,
                  temp_dir=str(tmp_path / "wtmp"), type_="p",
                  backend="native")
    rows = [(n, s) for n, _, s in iter_fasta(out)]
    assert len(rows) == 16
    assert len({len(s) for _, s in rows}) == 1


@pytest.mark.slow
def test_iterative_workflow_rnasim_sub(tmp_path):
    out = str(tmp_path / "iter_rna.aln")
    run_iterative(os.path.join(DATASET, "RNASim_sub.fa"), out, iterations=2,
                  temp_dir=str(tmp_path / "wtmp"), backend="native")
    rows = [(n, s) for n, _, s in iter_fasta(out)]
    assert len(rows) == 100
    assert len({len(s) for _, s in rows}) == 1
