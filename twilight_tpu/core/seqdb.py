"""Sequence database: aligned-sequence storage, low-quality flags, paths.

Mirrors reference msa::SequenceDB (/root/reference/src/sequencedb.cpp,
msa.hpp:111-155). The reference's double-buffered char arrays are a C++
allocation trick; here each sequence holds one numpy byte array that is
replaced on update.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..constants import letter_lut

GAP = ord("-")
DOT = ord(".")


class SeqInfo:
    __slots__ = ("id", "name", "unaligned_seq", "len", "low_quality",
                 "subtree_idx", "weight", "aln")

    def __init__(self, id_: int, name: str, seq: str, subtree_idx: int,
                 weight: float, debug: bool, aln_mode: int):
        self.id = id_
        self.name = name
        self.len = len(seq)
        self.subtree_idx = subtree_idx
        self.weight = np.float32(weight)
        self.low_quality = False
        self.aln = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8).copy()
        if debug:
            if aln_mode == 3:
                seq = seq.replace("-", "")
            self.unaligned_seq = seq
        else:
            self.unaligned_seq = ""

    def aln_str(self, aln_len: Optional[int] = None) -> str:
        n = self.len if aln_len is None else aln_len
        return self.aln[:n].tobytes().decode("latin-1")


class SequenceDB:
    def __init__(self):
        self.current_task = 0          # 0 normal, 1 realign, 2 merge
        self.sequences: List[SeqInfo] = []
        self.fallback_nodes: List = []
        self.name_map: Dict[str, SeqInfo] = {}
        self.subtree_aln: Dict[int, np.ndarray] = {}   # id -> int8 path
        self.sub_aln_files: List = []                  # (file name, subtreeIdx)

    def add_sequence(self, id_: int, name: str, seq: str, subtree_idx: int,
                     weight: float, debug: bool, aln_mode: int) -> None:
        s = SeqInfo(id_, name, seq, subtree_idx, weight, debug, aln_mode)
        self.sequences.append(s)
        self.name_map[name] = s

    def debug_check(self) -> int:
        """--check: degapped alignment rows must equal the original input
        (reference sequencedb.cpp:87-120). Returns number of failures."""
        fails = 0
        aln_len = None
        for seq in self.sequences:
            if seq.low_quality:
                continue
            row = seq.aln[:seq.len]
            if aln_len is None:
                aln_len = seq.len
            elif seq.len != aln_len:
                print(f"{seq.name}: the sequence length ({seq.len}) did not "
                      f"match the MSA length({aln_len})")
                fails += 1
            mask = (row != GAP) & (row != DOT)
            degapped = row[mask].tobytes().decode("latin-1")
            if degapped != seq.unaligned_seq:
                print(f"{seq.name}: after removing the gaps, the alignment "
                      "did not match the original sequence.")
                fails += 1
        return fails

    def store_subtree_profile(self, sub_t, type_: str, subtree_idx: int) -> None:
        """Weighted root profile after a subtree pass
        (reference sequencedb.cpp:122-138)."""
        root = sub_t.root
        self.subtree_aln[subtree_idx] = np.zeros(root.aln_len, dtype=np.int8)
        if root.msa_freq is not None and len(root.msa_freq):
            return
        psize = 6 if type_ == "n" else 22
        lut = letter_lut(type_)
        freq = np.zeros((root.aln_len, psize), dtype=np.float32)
        cols = np.arange(root.aln_len)
        for s_idx in root.seqs_included:
            seq = self.sequences[s_idx]
            letters = lut[seq.aln[:root.aln_len]]
            w = np.float64(seq.weight)
            vals = freq[cols, letters].astype(np.float64) + w
            freq[cols, letters] = vals.astype(np.float32)
        root.msa_freq = freq

    def clean_subtree_db(self) -> None:
        self.sequences.clear()
        self.fallback_nodes.clear()
        self.name_map.clear()
