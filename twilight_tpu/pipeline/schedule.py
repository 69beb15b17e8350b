"""Progressive-alignment scheduling: level-synchronous pair batches.

Reference: /root/reference/src/progressive.cpp:10-124. The guide tree's
postorder is reduced to (node-pair, level) entries; all pairs at one level
are independent and form one device batch.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..core.seqdb import SequenceDB
from ..phylo.tree import Node

NodePair = Tuple[Node, Node]


def get_progressive_pairs(post: List[Node], grp_id: int, mode: int
                          ) -> List[Tuple[NodePair, int]]:
    """mode 0: fresh MSA (children paired two at a time per node);
    mode 1: merge/realign (each child vs its parent);
    mode 2: placement without tree (all leaves vs root, level 0)."""
    order: List[Tuple[NodePair, int]] = []
    node_order: Dict[str, int] = {}
    # `post` is consumed from the end, like popping the reference's stack
    stack = list(post)
    if mode == 0:
        while stack:
            node = stack[-1]
            if not (node.grp_id == -1 or node.grp_id == grp_id) or node.is_leaf():
                stack.pop()
                continue
            children = [ch for ch in node.children if ch.grp_id == grp_id]
            # useless node: no children in subtree, no sequences
            if not children and not node.seqs_included:
                node.grp_id = -2
                stack.pop()
                node.parent.children = [
                    ch for ch in node.parent.children
                    if ch.identifier != node.identifier]
                continue
            # unary node: splice child into parent
            if (len(children) == 1 and node.parent is not None
                    and not node.seqs_included):
                if node.parent.grp_id == grp_id:
                    for idx, ch in enumerate(node.parent.children):
                        if ch.identifier == node.identifier:
                            node.parent.children[idx] = children[0]
                            children[0].branch_length += node.branch_length
                            children[0].parent = node.parent
                            break
                    stack.pop()
                    continue
            if len(children) > 1:
                while len(children) > 1:
                    left = []
                    for i in range(0, len(children) - 1, 2):
                        a, b = children[i], children[i + 1]
                        fi = node_order.get(a.identifier)
                        si = node_order.get(b.identifier)
                        fi = fi + 1 if fi is not None else 0
                        si = si + 1 if si is not None else 0
                        mx = max(fi, si)
                        node_order[a.identifier] = mx
                        node_order[b.identifier] = mx
                        order.append(((a, b), mx))
                        left.append(a)
                    if len(children) % 2 == 1:
                        left.append(children[-1])
                    children = left
            if len(children) == 1 and node.seqs_included:
                fi = node_order.get(node.identifier)
                si = node_order.get(node.children[0].identifier)
                fi = fi + 1 if fi is not None else 0
                si = si + 1 if si is not None else 0
                mx = max(fi, si)
                node_order[node.identifier] = mx
                node_order[node.children[0].identifier] = mx
                order.append(((node, node.children[0]), mx))
            # std::map::operator[] default-inserts 0 for unseen children
            if children:
                node_order[node.identifier] = node_order.setdefault(
                    children[0].identifier, 0)
            stack.pop()
    elif mode == 1:
        while stack:
            node = stack.pop()
            if node.parent is not None:
                fi = node_order.get(node.identifier)
                si = node_order.get(node.parent.identifier)
                fi = fi + 1 if fi is not None else 0
                si = si + 1 if si is not None else 0
                mx = max(fi, si)
                node_order[node.identifier] = mx
                node_order[node.parent.identifier] = mx
                order.append(((node.parent, node), mx))
    else:
        while stack:
            node = stack.pop()
            if node.parent is not None:
                order.append(((node.parent, node), 0))
    return order


def scheduling(root: Node, mode: int) -> List[List[NodePair]]:
    """Bucket pairs per level (reference progressive.cpp:109-124)."""
    post = root.collect_post_order()
    pairs = get_progressive_pairs(post, root.grp_id, mode)
    levels: List[List[NodePair]] = []
    for pair, lvl in pairs:
        while len(levels) < lvl + 1:
            levels.append([])
        levels[lvl].append(pair)
    return levels


def update_node(pairs: List[NodePair], database: SequenceDB) -> None:
    """Lazy leaf init + pass-through child adoption
    (reference progressive.cpp:126-172)."""
    for a, b in pairs:
        for node, partner in ((a, b), (b, a)):
            if node.is_leaf() and not node.seqs_included:
                info = database.name_map[node.identifier]
                node.seqs_included = [info.id]
                node.aln_len = info.len
                node.aln_num = 1
                node.aln_weight = info.weight
            elif not node.seqs_included:
                grp = node.grp_id
                for ch in node.children:
                    if ((ch.grp_id == -1 or ch.grp_id == grp)
                            and ch.identifier != partner.identifier):
                        node.msa_freq = ch.msa_freq
                        ch.msa_freq = None
                        node.seqs_included = ch.seqs_included
                        node.aln_len = ch.aln_len
                        node.aln_num = ch.aln_num
                        node.aln_weight = ch.aln_weight
                        break
