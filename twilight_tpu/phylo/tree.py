"""Guide-tree model: Newick parsing, weights, binarization, rerooting, pruning.

Reimplements the reference semantics (cited per function from
/root/reference/src/tree.cpp, node.cpp, phylogeny.cpp) with one deliberate
platform detail: the reference picks the reroot BFS start leaf from
std::unordered_map iteration order. We reproduce that through
twilight_tpu.phylo.stdorder (a real libstdc++ unordered_map behind ctypes) so
default-mode output is byte-identical; when the native module is unavailable
we fall back to insertion order.
"""
from __future__ import annotations

import re
from collections import deque
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from . import stdorder

# chars the branch-length accumulator keeps (the char loop's
# `c.isdigit() or c in ".eE-+"` filter, ASCII form)
_BL_STRIP_RE = re.compile(r"[^0-9.eE+\-]")
# test hook: force the general char-loop tokenizer so the fast path can
# be equivalence-checked against it (tests/test_tree.py)
_FAST_PARSE = True


class Node:
    __slots__ = ("identifier", "parent", "branch_length", "level", "children",
                 "num_leaves", "weight", "placed", "grp_id", "seqs_included",
                 "msa_freq", "aln_len", "aln_num", "aln_weight")

    def __init__(self, identifier: str, branch_length: float,
                 parent: Optional["Node"] = None):
        self.identifier = identifier
        # branch lengths are float (f32) in the reference; keep all arithmetic
        # in np.float32 so formatted Newick output matches bit-for-bit
        self.branch_length = np.float32(branch_length)
        self.parent = parent
        self.level = 1 if parent is None else parent.level + 1
        if parent is not None:
            parent.children.append(self)
        self.children: List[Node] = []
        self.num_leaves = 0
        self.weight = 0.0
        self.placed = False
        self.grp_id = -1
        self.seqs_included: List[int] = []
        self.msa_freq: Optional[np.ndarray] = None   # [len, profileSize] f32
        self.aln_len = 0
        self.aln_num = 0
        self.aln_weight = 0.0

    def is_leaf(self) -> bool:
        # Reference phylogeny.hpp:24 — leafness is name-based.
        return not self.identifier.startswith("node")

    def collect_post_order(self) -> List["Node"]:
        """Reverse-preorder node list, children filtered by matching grp_id
        (reference node.cpp:58-71). Consuming from the END of the returned
        list reproduces popping the reference's stack."""
        out: List[Node] = []
        s1 = [self]
        while s1:
            cur = s1.pop()
            out.append(cur)
            for ch in reversed(cur.children):
                if ch.grp_id == cur.grp_id:
                    s1.append(ch)
        return out


class Tree:
    def __init__(self):
        self.root: Optional[Node] = None
        self.all_nodes: "stdorder.OrderedStrMap" = stdorder.OrderedStrMap()
        self._curr_internal = 0
        self.num_leaves = 0
        self.max_depth = 0

    def new_internal_id(self) -> str:
        self._curr_internal += 1
        return f"node_{self._curr_internal}"

    # ---------------------------------------------------------------- parse
    @staticmethod
    def from_newick_file(path: str) -> "Tree":
        import sys
        import time
        t0 = time.time()
        with open(path) as f:
            newick = f.readline().rstrip("\n").rstrip("\r")
        t = Tree()
        t.parse_newick(newick)
        # reference tree.cpp:236
        print(f"Newick string read in: {(time.time() - t0) * 1e3:.0f} ms",
              file=sys.stderr)
        return t

    def parse_newick(self, s: str) -> None:
        """Reference tree.cpp:59-223."""
        s = s.strip(" ")
        tokens = _split_quoted(s, ",")

        leaves: List[str] = []
        num_open: List[int] = []
        num_close: List[int] = []
        branch_len: List[deque] = [deque() for _ in range(max(128, len(s)))]
        level = 0
        max_depth = 0

        f32 = np.float32
        _strip_bl = _BL_STRIP_RE.sub
        for tok in tokens:
            # fast path: unquoted token whose opens all lead ("(((name"
            # shape) — the common case by far; same observable semantics
            # as the char loop below (which stays as the general path)
            p = 0
            tl = len(tok)
            while p < tl and tok[p] == "(":
                p += 1
            body = tok[p:]
            if _FAST_PARSE and "'" not in tok and "(" not in body \
                    and tok.isascii():
                level += p
                name_level = level
                # name runs until the first ':' or ')'
                ci, pi = body.find(":"), body.find(")")
                if ci < 0:
                    cut = pi if pi >= 0 else len(body)
                elif pi < 0:
                    cut = ci
                else:
                    cut = min(ci, pi)
                leaf = body[:cut]
                nc = 0
                branch = ""
                k = cut
                blen = len(body)
                while k < blen:
                    c = body[k]
                    k += 1
                    if c == ":":
                        # branch text = filtered run up to next ':'/')'
                        k2 = k
                        while k2 < blen and body[k2] != ":" \
                                and body[k2] != ")":
                            k2 += 1
                        branch = _strip_bl("", body[k:k2])
                        k = k2
                    elif c == ")":
                        nc += 1
                        ln = f32(branch) if branch else f32(0.0)
                        if ln == 0:
                            ln = f32(1.0)
                        branch_len[level].append(ln)
                        level -= 1
                    # other chars outside a ':' run are ignored (the
                    # char loop's branch_start gate)
                leaves.append(leaf)
                num_open.append(p)
                num_close.append(nc)
                branch_len[level].append(f32(branch) if branch
                                         else f32(0.0))
                if leaf:
                    max_depth = max(max_depth, name_level)
                continue
            no = nc = 0
            leaf_depth = 0
            stop = False
            branch_start = False
            name_zone = False
            has_apo = False
            leaf = ""
            branch = ""
            for c in tok:
                if name_zone:
                    leaf += c
                    if c == "'":
                        name_zone = False
                elif c == "'":
                    name_zone = True
                    has_apo = True
                    leaf += c
                elif c == ":":
                    stop = True
                    branch = ""
                    branch_start = True
                elif c == "(":
                    no += 1
                    level += 1
                elif c == ")":
                    stop = True
                    nc += 1
                    ln = np.float32(branch) if branch else np.float32(0.0)
                    if ln == 0:
                        ln = np.float32(1.0)
                    branch_len[level].append(ln)
                    level -= 1
                    branch_start = False
                elif not stop:
                    leaf += c
                    branch_start = False
                    leaf_depth = level
                elif branch_start:
                    if c.isdigit() or c in ".eE-+":
                        branch += c
            if has_apo and leaf.startswith("'") and leaf.endswith("'"):
                leaf = leaf[1:-1]
            leaves.append(leaf)
            num_open.append(no)
            num_close.append(nc)
            branch_len[level].append(np.float32(branch) if branch else np.float32(0.0))
            max_depth = max(max_depth, leaf_depth)

        if level != 0:
            raise ValueError("incorrect Newick format")
        self.max_depth = max_depth
        self.num_leaves = len(leaves)

        parent_stack: List[Node] = []
        tree_root: Optional[Node] = None
        level = 0
        for i, leaf in enumerate(leaves):
            for _ in range(num_open[i]):
                nid = self.new_internal_id()
                if not parent_stack:
                    node = Node(nid, branch_len[level].popleft())
                    tree_root = node
                else:
                    node = Node(nid, branch_len[level].popleft(), parent_stack[-1])
                level += 1
                node.grp_id = -1
                self.all_nodes[nid] = node
                parent_stack.append(node)
            if leaf in self.all_nodes:
                leaf = leaf + "_dup_" + str(len(self.all_nodes))
            leaf_node = Node(leaf, branch_len[level].popleft(), parent_stack[-1])
            leaf_node.grp_id = -1
            self.all_nodes[leaf] = leaf_node
            for _ in range(num_close[i]):
                parent_stack.pop()
                level -= 1

        assert tree_root is not None
        tree_root.branch_length = np.float32(0.0)
        self.root = tree_root

        # Zero/absent branch-length patching (tree.cpp:204-219)
        min_br = float("inf")
        all_zero = True
        for node in self.all_nodes.values():
            if node.branch_length > 0:
                all_zero = False
                if node.branch_length < min_br:
                    min_br = node.branch_length
        for node in self.all_nodes.values():
            if node.identifier == self.root.identifier:
                continue
            if all_zero:
                node.branch_length = np.float32(1.0)
            elif node.branch_length == 0:
                node.branch_length = np.float32(min_br)

        self.cal_leaf_num()
        self.cal_seq_weight()

    # ------------------------------------------------------- derived fields
    def cal_leaf_num(self) -> None:
        """Reference tree.cpp:295-315."""
        order = self.root.collect_post_order()
        for node in reversed(order):
            if node.is_leaf():
                node.num_leaves = 1
            else:
                node.num_leaves = sum(ch.num_leaves for ch in node.children)
        self.num_leaves = self.root.num_leaves

    def cal_seq_weight(self) -> None:
        """ClustalW-style leaf weights, f32 accumulation to match the
        reference's float math (tree.cpp:317-341). All leaves climb to
        the root in lockstep with elementwise f32 adds — one IEEE add
        per (leaf, ancestor) in the same leaf-to-root order as the
        reference's scalar walk, so every weight is bit-identical while
        the walk runs at numpy speed (the scalar version dominated tree
        construction at 10k+ leaves)."""
        nodes = list(self.all_nodes.values())
        if not nodes:
            return
        index = {id(n): i for i, n in enumerate(nodes)}
        n_all = len(nodes)
        # f32(bl) / f32(num_leaves) elementwise: same single IEEE divide
        # per node as the scalar walk (num_leaves < 2^24 converts exactly)
        bl = np.fromiter((n.branch_length for n in nodes), np.float32,
                         n_all)
        nl = np.fromiter((n.num_leaves for n in nodes), np.float32, n_all)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = bl / nl
        parent = np.fromiter(
            (index[id(n.parent)] if n.parent is not None else -1
             for n in nodes), np.int64, n_all)
        leaves = [n for n in nodes if n.is_leaf()]
        if not leaves:
            return
        cur = np.fromiter((index[id(n)] for n in leaves), np.int64,
                          len(leaves))
        w = np.zeros(len(leaves), np.float32)
        alive = np.ones(len(leaves), bool)
        while True:
            sel = cur[alive]
            w[alive] = w[alive] + term[sel]
            nxt = parent[sel]
            up = nxt >= 0
            if not up.any():
                break
            keep = alive.copy()
            keep[np.flatnonzero(alive)[~up]] = False
            cur[keep] = nxt[up]
            alive = keep
        max_w = np.float32(w.max()) if len(w) else np.float32(0.0)
        norm = np.float32(max_w / np.float32(1.0))
        wn = (w / norm).astype(np.float32)
        for i, node in enumerate(leaves):
            node.weight = float(wn[i])

    # ------------------------------------------------------------ builders
    @staticmethod
    def from_subtree(node: Node, reroot: bool) -> "Tree":
        """Copy the grp_id-filtered subtree rooted at `node`
        (reference tree.cpp:239-272)."""
        t = Tree()
        grp = node.grp_id
        root = Node(node.identifier, node.branch_length)
        root.grp_id = -1
        t.all_nodes[root.identifier] = root
        t.root = root
        stack = [node]
        while stack:
            cur = stack.pop()
            if cur.identifier != t.root.identifier:
                copy = Node(cur.identifier, cur.branch_length,
                            t.all_nodes[cur.parent.identifier])
                copy.grp_id = -1
                copy.level = cur.level - (node.level - 1)
                copy.weight = cur.weight
                t.all_nodes[cur.identifier] = copy
            for ch in reversed(cur.children):
                if ch.grp_id == grp:
                    stack.append(ch)
        max_inter = 0
        for name, n in t.all_nodes.items():
            if not n.is_leaf():
                max_inter = max(max_inter, int(name[5:]))
        t._curr_internal = max_inter
        if reroot:
            t.reroot()
        else:
            t.cal_leaf_num()
            t.cal_seq_weight()
        return t

    @staticmethod
    def star_tree(seq_names) -> "Tree":
        """Star tree for PLACE_WO_TREE (reference tree.cpp:274-286).
        `seq_names` must be iterated in the reference's unordered_set order;
        callers pass an stdorder-ordered iterable."""
        t = Tree()
        root = Node("node_1", 0.0)
        root.grp_id = 0
        for name in seq_names:
            n = Node(name, 1.0, root)
            n.weight = 1.0
            n.grp_id = 0
            t.all_nodes[name] = n
        t.root = root
        t.all_nodes[root.identifier] = root
        return t

    # ----------------------------------------------------------- reshaping
    def convert_to_binary(self) -> None:
        """Pair >2-ary children under fresh internal nodes; splice unary
        nodes (reference tree.cpp:528-586)."""
        # reference iterates by popping its postorder stack: reverse-preorder
        order = self.root.collect_post_order()
        for node in order[::-1]:
            if len(node.children) > 2:
                grp = node.grp_id
                temp = list(node.children)
                while len(temp) > 2:
                    node_left = []
                    for i in range(0, len(temp) - 1, 2):
                        name = self.new_internal_id()
                        nn = Node(name, 0.0)
                        nn.children.append(temp[i])
                        nn.children.append(temp[i + 1])
                        nn.grp_id = grp
                        self.all_nodes[name] = nn
                        temp[i].parent = nn
                        temp[i + 1].parent = nn
                        node_left.append(nn)
                    if len(temp) % 2 == 1:
                        node_left.append(temp[-1])
                    temp = node_left
                node.children = [temp[0], temp[1]]
                temp[0].parent = node
                temp[1].parent = node
            elif len(node.children) == 1 and node.parent is not None:
                for idx, ch in enumerate(node.parent.children):
                    if ch.identifier == node.identifier:
                        node.parent.children[idx] = node.children[0]
                        node.children[0].branch_length += node.branch_length
                        node.children[0].parent = node.parent
                        break
            elif (not node.children and not node.is_leaf()
                  and node.seqs_included):
                node.parent.children = [
                    ch for ch in node.parent.children
                    if ch.identifier != node.identifier]
        update_levels(self.root, 1)

    def reroot(self, placement: bool = False) -> None:
        """Diameter-midpoint rerooting to minimize tree depth
        (reference tree.cpp:588-696)."""
        before_convert = max((n.level for n in self.all_nodes.values()),
                             default=0)
        self.convert_to_binary()
        before_reroot = max((n.level for n in self.all_nodes.values()),
                            default=0)
        start = None
        for node in self.all_nodes.values():
            if node.is_leaf() and (node.placed if placement else True):
                start = node
                break
        if start is None:
            return

        def bfs(s: Node) -> Tuple[Node, Dict[int, Optional[Node]]]:
            parent_out: Dict[int, Optional[Node]] = {id(s): None}
            dist = {id(s): 0}
            q = deque([s])
            farthest = s
            while q:
                u = q.popleft()
                neigh = list(u.children)
                if u.parent is not None:
                    neigh.append(u.parent)
                for v in neigh:
                    if id(v) not in dist:
                        dist[id(v)] = dist[id(u)] + 1
                        parent_out[id(v)] = u
                        q.append(v)
                        if placement:
                            if dist[id(v)] > dist[id(farthest)] and v.placed:
                                farthest = v
                        else:
                            if dist[id(v)] > dist[id(farthest)]:
                                farthest = v
            return farthest, parent_out

        a, _ = bfs(start)
        b, parent_b = bfs(a)
        path = []
        cur: Optional[Node] = b
        while cur is not None:
            path.append(cur)
            cur = parent_b[id(cur)]
        path.reverse()
        new_root = path[len(path) // 2]
        if new_root.identifier == self.root.identifier:
            return

        chain = [new_root]
        cur = new_root
        while cur.parent is not None:
            chain.append(cur.parent)
            cur = cur.parent
        chain.reverse()  # [old_root, ..., new_root]
        for i in range(len(chain) - 1):
            node = chain[i]
            node.parent = chain[i + 1]
            node.children = [c for c in node.children if c is not chain[i + 1]]
            node.branch_length = node.parent.branch_length
            if i > 0:
                node.children.append(chain[i - 1])
        new_root.children.append(new_root.parent)
        new_root.parent = None
        new_root.branch_length = np.float32(0.0)
        update_levels(new_root, 1)
        old_root = self.root
        # Swap identifiers so the topological root keeps the old root's name.
        # The reference then erases rootName twice (the second erase is a
        # no-op since new_root now holds that name), re-inserts it, and
        # overwrites the other entry in place — only rootName moves in
        # iteration order (tree.cpp:679-686).
        old_root.identifier, new_root.identifier = (new_root.identifier,
                                                    old_root.identifier)
        self.all_nodes.erase(new_root.identifier)
        self.all_nodes[old_root.identifier] = old_root   # overwrite in place
        self.all_nodes[new_root.identifier] = new_root   # fresh insert
        self.root = new_root
        self.convert_to_binary()
        self.cal_leaf_num()
        self.cal_seq_weight()
        # reference tree.cpp:692-695 (skipped by the early returns above,
        # matching the reference's newRoot==root bail-out)
        import sys
        after_reroot = max((n.level for n in self.all_nodes.values()),
                           default=0)
        print("======== Tree Depth ========", file=sys.stderr)
        print(f"Original: {before_convert}", file=sys.stderr)
        print(f"Binary: {before_reroot}", file=sys.stderr)
        print(f"Reroot: {after_reroot}", file=sys.stderr)

    # -------------------------------------------------------------- output
    def get_newick_string(self) -> str:
        """Reference tree.cpp:492-517 (std::to_string → 6 decimals)."""
        parts: List[str] = []

        def build(node: Node) -> None:
            if node.children:
                parts.append("(")
                for i, ch in enumerate(node.children):
                    if i != 0:
                        parts.append(",")
                    build(ch)
                if node.parent is not None:
                    parts.append("):" + _cxx_float(node.branch_length))
                else:
                    parts.append(")")
            else:
                name = node.identifier
                if any(c in name for c in ",:()"):
                    name = "'" + name + "'"
                parts.append(name + ":" + _cxx_float(node.branch_length))

        build(self.root)
        parts.append(";")
        return "".join(parts)

    # --------------------------------------------------------------- prune
    def prune(self, seqs: Set[str]) -> "Tree":
        """Reference tree.cpp:366-490."""
        import sys
        import time
        t0 = time.time()
        pt = Tree()
        pt.root = Node(self.root.identifier, self.root.branch_length)
        pt.root.grp_id = -1
        pt.all_nodes[pt.root.identifier] = pt.root

        keep: Dict[str, bool] = {}

        def has_keep(node: Node) -> bool:
            if node.is_leaf():
                keep[node.identifier] = node.identifier in seqs
                return keep[node.identifier]
            k = False
            for ch in node.children:
                if has_keep(ch):
                    k = True
            keep[node.identifier] = k
            return k

        has_keep(self.root)

        def build(orig: Node, new_parent: Optional[Node]) -> None:
            if not keep[orig.identifier]:
                return
            if orig.identifier == self.root.identifier:
                for ch in self.root.children:
                    build(ch, self.root)
                return
            keep_children = [ch for ch in orig.children if keep[ch.identifier]]
            if not keep_children:
                if orig.is_leaf():
                    nn = Node(orig.identifier, orig.branch_length,
                              pt.all_nodes[new_parent.identifier])
                    nn.grp_id = -1
                    pt.all_nodes[nn.identifier] = nn
                return
            if len(keep_children) == 1:
                only = keep_children[0]
                combined = orig.branch_length
                while True:
                    combined += only.branch_length
                    temp = [ch for ch in only.children if keep[ch.identifier]]
                    if len(temp) > 1:
                        nn = Node(only.identifier, combined,
                                  pt.all_nodes[new_parent.identifier])
                        nn.grp_id = -1
                        pt.all_nodes[nn.identifier] = nn
                        break
                    if not temp:
                        if only.is_leaf():
                            nn = Node(only.identifier, combined,
                                      pt.all_nodes[new_parent.identifier])
                            nn.grp_id = -1
                            pt.all_nodes[nn.identifier] = nn
                            break
                        return
                    only = temp[0]
                for grandchild in only.children:
                    build(grandchild, only)
            else:
                nn = Node(orig.identifier, orig.branch_length,
                          pt.all_nodes[new_parent.identifier])
                nn.grp_id = -1
                pt.all_nodes[nn.identifier] = nn
                for ch in orig.children:
                    build(ch, orig)

        build(pt.root, None)
        pt.num_leaves = sum(1 for n in pt.all_nodes.values() if n.is_leaf())
        pt.cal_leaf_num()
        pt.cal_seq_weight()
        # reference tree.cpp:480-488
        print(f"Number of Leaves: {self.num_leaves} (before pruning) -> "
              f"{pt.num_leaves} (after pruning)", file=sys.stderr)
        if pt.num_leaves == 0:
            raise ValueError(
                "No sequences from the input sequence file are found in the tree")
        if pt.num_leaves != len(seqs):
            print(f"WARNING: {len(seqs) - pt.num_leaves} sequences are "
                  "missing from the tree and will be ignored.",
                  file=sys.stderr)
        print(f"Tree pruned in: {(time.time() - t0) * 1e3:.0f} ms",
              file=sys.stderr)
        return pt

    def extract_result(self, placement_t: "Tree") -> None:
        """Reference tree.cpp:698-704."""
        self.root.seqs_included = placement_t.root.seqs_included
        if placement_t.root.msa_freq is not None and len(placement_t.root.msa_freq):
            self.root.msa_freq = placement_t.root.msa_freq
        self.root.aln_len = placement_t.root.aln_len
        self.root.aln_num = placement_t.root.aln_num
        self.root.aln_weight = placement_t.root.aln_weight


def update_levels(node: Node, level: int) -> None:
    stack = [(node, level)]
    while stack:
        n, lv = stack.pop()
        n.level = lv
        for ch in n.children:
            stack.append((ch, lv + 1))


def _split_quoted(s: str, delim: str) -> List[str]:
    """Reference tree.cpp stringSplit:15-45 — split on delim, merging pieces
    with unbalanced single quotes."""
    words: List[str] = []
    start = 0
    temp = -1
    while True:
        end = s.find(delim, start)
        if end == -1:
            break
        if temp == -1:
            sub = s[start:end]
            if sub.count("'") % 2 == 1:
                temp = start
            else:
                words.append(sub)
        else:
            sub = s[temp:end]
            if sub.count("'") % 2 == 0:
                temp = -1
                words.append(sub)
        start = end + 1
    last = s[start:]
    if last:
        words.append(last)
    return words


def _cxx_float(x: float) -> str:
    """std::to_string(float): %f with 6 decimals."""
    return "%.6f" % x
