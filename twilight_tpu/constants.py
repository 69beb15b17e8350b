"""Alphabet tables and fixed algorithm constants.

Semantics mirror the reference TWILIGHT letter lookup
(/root/reference/src/scoring-matrix.cpp:26-79): nucleotide letters map to
{A:0, C:1, G:2, T/U:3, other:4(ambig), -/.:5(gap)}; amino acids map to the
20-letter index below with {other:20(ambig), -/.:21(gap)}.
"""
from __future__ import annotations

import numpy as np

NUC_LETTERS = "ACGTN"          # index 0..4; 5 = gap
AA_LETTERS = "ACDEFGHIKLMNPQRSTVWYX"  # index 0..20; 21 = gap

# Alignment-path codes (shared with the reference's alnPath int8 values).
MATCH, INS, DEL, INSERTION_COL = 0, 1, 2, 3


def _make_lut(type_: str) -> np.ndarray:
    lut = np.empty(256, dtype=np.int32)
    if type_ == "n":
        lut[:] = 4  # ambiguous
        for ch, idx in (("A", 0), ("C", 1), ("G", 2), ("T", 3), ("U", 3)):
            lut[ord(ch)] = idx
            lut[ord(ch.lower())] = idx
        lut[ord("-")] = 5
        lut[ord(".")] = 5
        # lowercase handled by explicit entries above; reference upper-cases
        # before lookup, we bake case-insensitivity into the table.
        for c in range(ord("a"), ord("z") + 1):
            up = chr(c).upper()
            if up in "ACGTU":
                continue
            lut[c] = 4
    else:
        lut[:] = 20
        for idx, ch in enumerate("ACDEFGHIKLMNPQRSTVWY"):
            lut[ord(ch)] = idx
            lut[ord(ch.lower())] = idx
        lut[ord("-")] = 21
        lut[ord(".")] = 21
    return lut


NUC_LUT = _make_lut("n")
AA_LUT = _make_lut("p")


def letter_lut(type_: str) -> np.ndarray:
    return NUC_LUT if type_ == "n" else AA_LUT


def letter_idx(type_: str, ch: str) -> int:
    return int(letter_lut(type_)[ord(ch)])


def profile_size(type_: str) -> int:
    return 6 if type_ == "n" else 22


def matrix_size(type_: str) -> int:
    return 5 if type_ == "n" else 21


# Sequence-type autodetection letter classes
# (reference scoring-matrix.cpp:11-24): these letters only occur in protein
# (or, for U, only in nucleotide) alphabets.
PROTEIN_ONLY = set("EFIJLPQZ")
NUC_ONLY = set("U")


def check_only(ch: str) -> str:
    ch = ch.upper()
    if ch in PROTEIN_ONLY:
        return "p"
    if ch in NUC_ONLY:
        return "n"
    return "x"
