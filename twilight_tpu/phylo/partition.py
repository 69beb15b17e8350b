"""Divide-and-conquer tree partitioning (centroid-edge bipartition).

Reference: /root/reference/src/partitionInfo.cpp and phylogeny.cpp:13-39.
Subtrees of <= max_size leaves get distinct grp_ids; partition roots seed the
meta-tree whose progressive merge stitches subalignments back together.
"""
from __future__ import annotations

from typing import Optional, Tuple

from .stdorder import OrderedStrMap
from .tree import Node, Tree


def _num_leaves(node: Node, grp: int) -> int:
    """Reference partitionInfo.cpp:7-14 (children-empty test, not name)."""
    if node.grp_id != grp:
        return 0
    if not node.children:
        return 1
    return sum(_num_leaves(ch, grp) for ch in node.children)


def _set_children_grp(node: Node, org: int, new: int) -> None:
    if node.grp_id != org:
        return
    node.grp_id = new
    for ch in node.children:
        _set_children_grp(ch, org, new)


class PartitionInfo:
    def __init__(self, max_size: int, min_size: int = 0, num_partitions: int = 0):
        self.max_partition_size = max_size
        self.min_partition_size = min_size
        self.num_partitions = num_partitions
        # identifier -> (node, numLeaves); iteration order mirrors the
        # reference's unordered_map (subtree processing order)
        self.partitions_root: OrderedStrMap = OrderedStrMap()

    def _centroid_edge(self, root: Node) -> Node:
        """Reference partitionInfo.cpp:16-38: postorder scan for the edge
        whose removal best balances leaf counts; first strictly-better node
        wins."""
        grp = root.grp_id
        num_leaves = _num_leaves(root, grp)
        half = num_leaves // 2
        if half == 0:
            half = 1
        best = root
        imbalance = num_leaves

        def walk(node: Node) -> None:
            nonlocal best, imbalance
            if node.grp_id != grp or not node.children:
                return
            for ch in node.children:
                walk(ch)
            nd = _num_leaves(node, grp)
            imb = (half - nd) if half > nd else (nd - half)
            if imb < imbalance:
                best = node
                imbalance = imb

        walk(root)
        return best

    def bipartition(self, root: Node, edge: Node) -> Tuple[Node, Node]:
        """Reference partitionInfo.cpp:54-74."""
        tree1_id = 0 if root.grp_id == -1 else root.grp_id
        tree2_id = 1 if root.grp_id == -1 else self.num_partitions + 1
        self.num_partitions += 1
        head = edge.parent
        head_id = edge.parent.grp_id
        while head.parent is not None and head.parent.grp_id == head_id:
            head = head.parent
        tree1, tree2 = head, edge
        _set_children_grp(tree2, tree2.grp_id, tree2_id)
        if tree1.grp_id == -1:
            _set_children_grp(tree1, tree1.grp_id, tree1_id)
        return tree1, tree2

    def partition_tree(self, root: Node) -> None:
        """Reference partitionInfo.cpp:76-110."""
        total = _num_leaves(root, root.grp_id)
        if total <= self.max_partition_size:
            if len(self.partitions_root) == 0:
                _set_children_grp(root, root.grp_id, 0)
                n = _num_leaves(root, root.grp_id)
                self.partitions_root[root.identifier] = (root, n)
            return
        edge = self._centroid_edge(root)
        if edge.identifier == root.identifier:
            return
        tree1, tree2 = self.bipartition(root, edge)
        n1 = _num_leaves(tree1, tree1.grp_id)
        n2 = _num_leaves(tree2, tree2.grp_id)
        if root.parent is None:
            self.partitions_root[tree1.identifier] = (tree1, n2)
        self.partitions_root[tree2.identifier] = (tree2, n2)
        # update (or create) tree1's leaf count, preserving map position
        old = self.partitions_root.get(tree1.identifier)
        self.partitions_root[tree1.identifier] = (
            (old[0] if old is not None else None) or tree1, n1)
        if n2 > self.max_partition_size:
            self.partition_tree(tree2)
        if n1 > self.max_partition_size:
            self.partition_tree(tree1)


def construct_tree_from_partitions(root: Node, p: PartitionInfo) -> Tree:
    """Meta-tree over partition roots (reference phylogeny.cpp:13-39)."""
    t = Tree()

    def pre(parent: Optional[Node], node: Node) -> None:
        nonlocal t
        cur_parent = parent
        if node.identifier in p.partitions_root:
            if len(t.all_nodes) == 0:
                copy = Node(node.identifier, node.branch_length)
                copy.grp_id = -1
                t.root = copy
            else:
                copy = Node(node.identifier, node.branch_length,
                            t.all_nodes[parent.identifier])
                copy.grp_id = -1
            cur_parent = copy
            t.all_nodes[copy.identifier] = copy
        for ch in node.children:
            pre(cur_parent, ch)

    pre(None, root)
    return t


def update_subroot_info(subroot: Node, sub_t: Tree, subtree_idx: int) -> None:
    """Reference tree.cpp:519-526."""
    subroot.seqs_included.append(subtree_idx)
    subroot.aln_len = sub_t.root.aln_len
    subroot.aln_num = len(sub_t.root.seqs_included)
    subroot.msa_freq = sub_t.root.msa_freq
    subroot.aln_weight = sub_t.root.aln_weight
