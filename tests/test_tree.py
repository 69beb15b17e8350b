"""Phylogeny layer tests: Newick parse/emit, prune, reroot, partition.

Goldens produced by the reference binary (tools/refbuild); parity targets are
/root/reference/src/tree.cpp and partitionInfo.cpp.
"""
import os

import pytest

from twilight_tpu.phylo.partition import (PartitionInfo,
                                          construct_tree_from_partitions)
from twilight_tpu.phylo.tree import Tree
from twilight_tpu.seqio.fasta import iter_fasta

from conftest import DATASET, GOLDEN


RNASIM_NWK = os.path.join(DATASET, "RNASim.nwk")
SARS_NWK = os.path.join(DATASET, "sars_20.nwk")


def test_parse_counts():
    t = Tree.from_newick_file(RNASIM_NWK)
    leaves = [n for n in t.all_nodes.values() if n.is_leaf()]
    assert len(leaves) == 579
    assert t.root.num_leaves == 579


def test_newick_roundtrip():
    t = Tree.from_newick_file(SARS_NWK)
    s1 = t.get_newick_string()
    t2 = Tree()
    t2.parse_newick(s1)
    assert t2.get_newick_string() == s1


def test_prune_golden():
    """Pruned RNASim tree must match the reference's --write-prune output."""
    t = Tree.from_newick_file(RNASIM_NWK)
    names = {n for n, _, _ in
             iter_fasta(os.path.join(DATASET, "RNASim_sub.fa"))}
    pruned = t.prune(names)
    with open(os.path.join(GOLDEN, "RNASim.nwk.pruned.nwk")) as f:
        golden = f.read().strip()
    assert pruned.get_newick_string() == golden


def test_seq_weights_normalized():
    t = Tree.from_newick_file(RNASIM_NWK)
    t.cal_seq_weight()
    ws = [n.weight for n in t.all_nodes.values() if n.is_leaf()]
    assert max(ws) == 1.0
    assert min(ws) > 0.0


def test_reroot_reduces_depth():
    t = Tree.from_subtree(Tree.from_newick_file(RNASIM_NWK).root, reroot=True)
    t0 = Tree.from_subtree(Tree.from_newick_file(RNASIM_NWK).root,
                           reroot=False)
    def depth(tree):
        d = 0
        stack = [(tree.root, 0)]
        while stack:
            n, l = stack.pop()
            d = max(d, l)
            for c in n.children:
                stack.append((c, l + 1))
        return d
    assert depth(t) <= depth(t0)
    leaves = [n for n in t.all_nodes.values() if n.is_leaf()]
    assert len(leaves) == 579


@pytest.mark.parametrize("m,lo,hi", [(200, 3, 5), (100, 6, 10)])
def test_partition_sizes(m, lo, hi):
    """Centroid-edge decomposition keeps every part ≤ m leaves
    (reference partitionInfo.cpp:76-110)."""
    t = Tree.from_newick_file(RNASIM_NWK)
    pi = PartitionInfo(m)
    pi.partition_tree(t.root)
    sizes = [cnt for (_, cnt) in pi.partitions_root.values()]
    assert sum(sizes) == 579
    assert all(s <= m for s in sizes)
    assert lo <= len(sizes) <= hi
    meta = construct_tree_from_partitions(t.root, pi)
    assert len(meta.all_nodes) == len(sizes)
    meta_tips = [n for n in meta.all_nodes.values() if not n.children]
    assert meta_tips, "meta-tree must have at least one childless tip"


def test_star_tree():
    t = Tree.star_tree(["a", "b", "c"])
    assert len(t.root.children) == 3
    assert all(c.is_leaf() for c in t.root.children)


def test_parse_fast_slow_equivalence():
    """The regex-assisted tokenizer fast path must produce the same tree
    as the general char loop on random topologies, quoted names, missing
    and zero branch lengths (tree.py parse_newick)."""
    import random

    import numpy as np

    from twilight_tpu.phylo import tree as tree_mod

    def rand_newick(rng, n, quoted=False, drop_bl=False, zero_bl=False):
        names = [f"s{i}" if not (quoted and i % 3 == 0)
                 else f"'q {i}:x'" for i in range(n)]
        items = list(names)
        while len(items) > 1:
            a = items.pop(rng.randrange(len(items)))
            b = items.pop(rng.randrange(len(items)))
            def bl():
                if drop_bl and rng.random() < 0.3:
                    return ""
                if zero_bl and rng.random() < 0.3:
                    return ":0.0"
                return f":{rng.random():.4f}"
            items.append(f"({a}{bl()},{b}{bl()})")
        return items[0] + ";"

    def snap(t):
        return (t.num_leaves, t.max_depth,
                sorted((k, float(np.float32(n.branch_length)),
                        n.parent.identifier if n.parent else None,
                        len(n.children)) for k, n in t.all_nodes.items()))

    rng = random.Random(5)
    cases = [rand_newick(rng, 40),
             rand_newick(rng, 25, quoted=True),
             rand_newick(rng, 25, drop_bl=True),
             rand_newick(rng, 25, zero_bl=True),
             "(A,B,(C,D));",              # no branch lengths at all
             "(A:1e-3,(B:2E2,C:0.0):5);"]  # exponents + zero
    for s in cases:
        try:
            tree_mod._FAST_PARSE = True
            t1 = Tree()
            t1.parse_newick(s)
            tree_mod._FAST_PARSE = False
            t2 = Tree()
            t2.parse_newick(s)
        finally:
            tree_mod._FAST_PARSE = True
        assert snap(t1) == snap(t2), s
        assert t1.get_newick_string() == t2.get_newick_string(), s
        leaves1 = {n.identifier: n.weight for n in t1.all_nodes.values()
                   if n.is_leaf()}
        leaves2 = {n.identifier: n.weight for n in t2.all_nodes.values()
                   if n.is_leaf()}
        assert leaves1 == leaves2, s
