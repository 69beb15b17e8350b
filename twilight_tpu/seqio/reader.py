"""Sequence/alignment readers wired to the database and guide tree.

Reference: /root/reference/src/io.cpp:38-311 — tree-name matching, auto-prune
on leaf/sequence mismatch, low-quality detection (length deviation +
ambiguity), MSA → column-frequency profiles.
"""
from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from ..config import DEFAULT_ALN, PLACE_W_TREE, PLACE_WO_TREE, Options
from ..constants import letter_lut
from ..core.seqdb import SequenceDB
from ..phylo.tree import Node, Tree
from .fasta import iter_fasta, write_fasta

F32 = np.float32


def read_sequences(file_name: str, database: SequenceDB, option: Options,
                   tree: Tree, subtree: int = -1) -> Tree:
    """Reference io.cpp:55-198. Returns the (possibly pruned) tree."""
    import time
    t_read0 = time.time()
    placed = (option.aln_mode == PLACE_W_TREE and file_name == option.seq_file)
    seq_num_init = len(database.sequences)
    seq_num = seq_num_init
    seqs_lens: List[int] = []
    total_len = 0
    max_len, min_len = 0, 1 << 62

    for name_full, _, seq in iter_fasta(file_name):
        name_noblank = name_full.split(" ")[0]
        name = ""
        if name_full in tree.all_nodes:
            name = name_full
        elif name_noblank in tree.all_nodes:
            name = name_noblank
        if name:
            if name in database.name_map:
                print(f"WARNING: duplicate leaf names found in the sequence "
                      f"file! Leaf name: {name}.", file=sys.stderr)
                continue
            subtree_idx = tree.all_nodes[name].grp_id
            n = len(seq)
            max_len = max(max_len, n)
            min_len = min(min_len, n)
            total_len += n
            database.add_sequence(seq_num, name, seq, subtree_idx,
                                  tree.all_nodes[name].weight, option.debug,
                                  option.aln_mode)
            if option.aln_mode == PLACE_WO_TREE:
                database.subtree_aln[database.name_map[name].id] = \
                    np.zeros(n, dtype=np.int8)
            tree.all_nodes[name].placed = placed
            seq_num += 1
            seqs_lens.append(n)

    # prune tree when leaves don't match the sequences (io.cpp:103-118)
    if tree.num_leaves != seq_num and option.aln_mode == DEFAULT_ALN:
        # reference io.cpp:104 prints this to STDOUT via printf
        print("Warning: Mismatch between the number of leaves and the "
              f"number of sequences, ({tree.num_leaves} != {seq_num})")
        for node in tree.all_nodes.values():
            if node.is_leaf() and node.identifier not in database.name_map:
                print(f"Missing {node.identifier}", file=sys.stderr)
        print("Prune the tree according to the existing sequences.",
              file=sys.stderr)
        names = set(database.name_map.keys())
        tree = tree.prune(names)

    if seq_num == seq_num_init:
        raise ValueError("no sequences were read from the input")

    seqs_lens.sort()
    med_len = seqs_lens[(seq_num - seq_num_init) // 2]
    min_th = int(med_len * (1 - option.len_dev)) if option.len_dev > 0 \
        else option.min_len
    max_th = int(med_len * (1 + option.len_dev)) if option.len_dev > 0 \
        else option.max_len

    low_q_records: List[Tuple[str, str]] = []
    num_low_q = 0
    if option.aln_mode != PLACE_W_TREE or placed:
        lut = letter_lut(option.type)
        ambig = 4 if option.type == "n" else 20
        for i in range(seq_num):
            seq = database.sequences[i]
            if (option.aln_mode == PLACE_W_TREE
                    and not tree.all_nodes[seq.name].placed):
                continue
            seq.low_quality = seq.len > max_th or seq.len < min_th
            if not seq.low_quality:
                ambig_count = int(np.count_nonzero(
                    lut[seq.aln[:seq.len]] == ambig))
                seq.low_quality = ambig_count > seq.len * option.max_ambig
            if seq.low_quality:
                num_low_q += 1
                if (not option.no_filter) and option.write_filtered:
                    low_q_records.append((seq.name, seq.aln_str()))
                if not option.no_filter:
                    seq.len = 0

    if low_q_records:
        out_dir = os.path.dirname(option.out_file) or "."
        stem = os.path.splitext(os.path.basename(option.seq_file))[0]
        path = (f"{out_dir}/subtree-{subtree}.filtered.fasta" if subtree != -1
                else f"{out_dir}/{stem}.filtered.fasta")
        write_fasta(path, low_q_records, option.compressed)

    # sequence summary (reference io.cpp:177-198)
    read_ms = int((time.time() - t_read0) * 1000)
    count = seq_num - seq_num_init
    avg_len = total_len // count
    if option.aln_mode != PLACE_W_TREE or placed:
        print("===== Sequence Summary =====", file=sys.stderr)
        print(f"Number : {count}", file=sys.stderr)
        print(f"Max. Length: {max_len}", file=sys.stderr)
        print(f"Min. Length: {min_len}", file=sys.stderr)
        print(f"Avg. Length: {avg_len}", file=sys.stderr)
        print(f"Med. Length: {med_len}", file=sys.stderr)
        if option.no_filter:
            print(f"Deferred sequences: {num_low_q}", file=sys.stderr)
        else:
            print(f"Excluded sequences: {num_low_q}", file=sys.stderr)
        print(f"Sequences read in {read_ms} ms", file=sys.stderr)
    else:
        print("==== Backbone Alignment ====", file=sys.stderr)
        print(f"Number : {count}", file=sys.stderr)
        print(f"Length:  {avg_len}", file=sys.stderr)
        print(f"Backbone alignment read in {read_ms} ms", file=sys.stderr)
    return tree


def read_alignment(msa_file: str, option: Options, node: Node) -> None:
    """MSA file → column-frequency profile on `node`
    (reference io.cpp:200-238)."""
    psize = 6 if option.type == "n" else 22
    lut = letter_lut(option.type)
    seq_num = 0
    msa_len = 0
    freq: Optional[np.ndarray] = None
    cols: Optional[np.ndarray] = None
    for name, _, seq in iter_fasta(msa_file):
        n = len(seq)
        if seq_num == 0:
            msa_len = n
            freq = np.zeros((msa_len, psize), dtype=np.float32)
            cols = np.arange(msa_len)
        elif n != msa_len:
            print(f"WARNING: length of \"{name}\" ({n}) does not match in "
                  f"{msa_file} ({msa_len})", file=sys.stderr)
            continue
        letters = lut[np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)]
        freq[cols, letters] += F32(1.0)
        seq_num += 1
    node.msa_freq = freq
    node.aln_num = seq_num
    node.aln_len = msa_len
    node.aln_weight = float(F32(seq_num))


def read_alignments_and_build_tree(database: SequenceDB, option: Options
                                   ) -> Tree:
    """MERGE_MSA: each file → a profile node; star tree rooted at the
    biggest MSA, children sorted by count desc (reference io.cpp:240-299)."""
    files = []
    for root_dir, _, names in os.walk(option.msa_dir):
        for n in names:
            files.append(os.path.join(root_dir, n))
    files.sort()
    nodes = []
    for idx, path in enumerate(files):
        node = Node(f"node_{idx + 1}", 1.0)
        node.grp_id = 0
        node.seqs_included = [idx]
        read_alignment(path, option, node)
        database.subtree_aln[idx] = np.zeros(len(node.msa_freq), dtype=np.int8)
        nodes.append(node)
        database.sub_aln_files.append((path, idx))
    nodes.sort(key=lambda a: -a.aln_num)
    t = Tree()
    t.root = nodes[0]
    t.all_nodes[nodes[0].identifier] = nodes[0]
    for node in nodes[1:]:
        node.parent = t.root
        t.root.children.append(node)
        t.all_nodes[node.identifier] = node
    from ..phylo.tree import update_levels
    update_levels(t.root, 1)
    return t


def read_backbone_alignment(tree: Tree, database: SequenceDB,
                            option: Options) -> None:
    """Reference io.cpp:301-311."""
    read_alignment(option.backbone_aln_file, option, tree.root)
    database.subtree_aln[-1] = np.zeros(len(tree.root.msa_freq), dtype=np.int8)
    tree.root.seqs_included.append(-1)
