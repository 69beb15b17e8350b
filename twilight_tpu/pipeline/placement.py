"""Placement-tree construction for PLACE_W_TREE.

Reference: /root/reference/src/sequencedb.cpp:148-246 — mark root paths of
placed leaves, pool backbone rows under their nearest placed ancestor, strip
all-gap columns, and clone the placed subgraph into a small tree that the
normal progressive pass aligns.
"""
from __future__ import annotations

import numpy as np

from ..core.seqdb import SequenceDB, GAP
from ..phylo.tree import Node, Tree


def get_placement_tree(tree: Tree, database: SequenceDB) -> Tree:
    # every leaf must carry a sequence (backbone row or new sequence); the
    # reference segfaults on this mismatch (observed on sequencedb.cpp:148
    # path with a 2000-leaf tree and 1600+0 sequences) — fail clearly
    # instead
    missing = [n.identifier for n in tree.all_nodes.values()
               if n.is_leaf() and n.identifier not in database.name_map]
    if missing:
        raise ValueError(
            f"placement tree has {len(missing)} leaves with no sequence in "
            f"either the backbone alignment or the input sequences "
            f"(first: {missing[0]}); prune the tree to the available "
            f"sequences first")
    # mark path from each placed leaf to the root
    for node in tree.all_nodes.values():
        if node.is_leaf() and node.placed:
            cur = node
            while cur.parent is not None:
                if cur.parent.placed:
                    break
                cur.parent.placed = True
                cur = cur.parent

    # pool backbone (non-placed) leaves under each placed node
    def add_backbone(root: Node, node: Node) -> None:
        if node.is_leaf() and not node.placed:
            root.seqs_included.append(database.name_map[node.identifier].id)
        for ch in node.children:
            if not ch.placed:
                add_backbone(root, ch)

    for node in tree.all_nodes.values():
        if node.placed:
            add_backbone(node, node)

    # strip all-gap columns from each pooled backbone block
    for node in tree.all_nodes.values():
        if node.placed and not node.is_leaf() and node.seqs_included:
            length = database.sequences[node.seqs_included[0]].len
            all_gaps = np.ones(length, dtype=bool)
            for s_idx in node.seqs_included:
                all_gaps &= database.sequences[s_idx].aln[:length] == GAP
            keep = ~all_gaps
            new_len = int(np.count_nonzero(keep))
            for s_idx in node.seqs_included:
                seq = database.sequences[s_idx]
                seq.aln = seq.aln[:length][keep].copy()
                seq.len = new_len
            node.aln_len = new_len
            node.aln_num = len(node.seqs_included)
            w = np.float32(0.0)
            for s_idx in node.seqs_included:
                w = np.float32(w + database.sequences[s_idx].weight)
            node.aln_weight = float(w)

    # clone the placed subgraph
    pt = Tree()
    copies = {}
    for name, node in tree.all_nodes.items():
        if node.placed:
            copy = Node(node.identifier, node.branch_length)
            copy.level = node.level
            copy.weight = node.weight
            copy.num_leaves = node.num_leaves
            copy.grp_id = node.grp_id
            copy.seqs_included = list(node.seqs_included)
            copy.aln_len = node.aln_len
            copy.aln_num = node.aln_num
            copy.aln_weight = node.aln_weight
            copy.placed = True
            copies[name] = copy
            pt.all_nodes[name] = copy
    for name, copy in pt.all_nodes.items():
        orig = tree.all_nodes[name]
        for ch in orig.children:
            if ch.placed:
                copy.children.append(copies[ch.identifier])
        if orig.parent is not None:
            copy.parent = copies.get(orig.parent.identifier)
        else:
            copy.parent = None
            pt.root = copy
    num_leaves = sum(1 for n in pt.all_nodes.values() if n.is_leaf())
    pt.num_leaves = num_leaves
    return pt
