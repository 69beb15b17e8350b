"""Scoring parameter / flag-coverage tests: BLOSUM variants, user matrix,
wildcard, validation (reference scoring-matrix.cpp, option.cpp)."""
import os

import numpy as np
import pytest

from twilight_tpu import cli
from twilight_tpu.config import Params, detect_mode, detect_type
from twilight_tpu.tools.sp_score import sp_score

from conftest import DATA, DATASET, GOLDEN


def test_nucleotide_default_matrix():
    p = Params.make("n")
    m = p.scoring_matrix
    assert m[0, 0] == 18.0          # match
    assert m[0, 2] == -4.0          # A<->G transition
    assert m[0, 1] == -8.0          # transversion
    assert m[4, 0] == 0.0           # ambiguity row without --wildcard
    assert p.xdrop == 3000.0        # 600 * |gap_extend|


def test_wildcard_matrix():
    p = Params.make("n", wildcard=True)
    assert p.scoring_matrix[4, 0] == 18.0


def test_blosum_scaled_5x():
    p = Params.make("p", blosum=62)
    # BLOSUM62 W-W diagonal is 11 -> 55 after the 5x scale
    assert p.scoring_matrix.max() == 55.0
    assert p.matrix_size == 21


def test_user_matrix_file():
    p = Params.make("n",
                    matrix_file=os.path.join(DATASET, "substitution.txt"))
    m = p.scoring_matrix
    assert m[0, 0] == 4.0
    assert m[0, 1] == -1.0
    assert np.all(m[4, :] == 0.0)   # no wildcard -> zero ambiguity row


def test_gap_penalty_validation():
    with pytest.raises(ValueError):
        Params.make("n", gap_open=5.0)
    with pytest.raises(ValueError):
        Params.make("n", xdrop_scale=0.0)


def test_mode_detection():
    from twilight_tpu.config import (DEFAULT_ALN, MERGE_MSA, PLACE_W_TREE,
                                     PLACE_WO_TREE)
    assert detect_mode(True, True, False, False) == DEFAULT_ALN
    assert detect_mode(False, False, True, False) == MERGE_MSA
    assert detect_mode(False, True, False, True) == PLACE_WO_TREE
    assert detect_mode(True, True, False, True) == PLACE_W_TREE
    with pytest.raises(ValueError):
        detect_mode(True, False, True, False)


def test_type_autodetect():
    assert detect_type(os.path.join(DATASET, "RNASim.fa")) == "n"
    assert detect_type(os.path.join(DATA, "prot_16.fa")) == "p"


def test_sp_score_prefers_real_alignment():
    from twilight_tpu.seqio.fasta import iter_fasta
    rows = [s for _, _, s in
            iter_fasta(os.path.join(GOLDEN, "prot_16.aln"))]
    param = Params.make("p")
    good = sp_score(rows, "p", param)
    # scrambling row 0 must lower the score
    import numpy as np
    rng = np.random.default_rng(0)
    chars = list(rows[0])
    rng.shuffle(chars)
    bad_rows = ["".join(chars)] + rows[1:]
    assert sp_score(bad_rows, "p", param) < good


@pytest.mark.slow
def test_blosum45_golden(tmp_path):
    out = str(tmp_path / "b45.aln")
    assert cli.main(["-t", os.path.join(DATA, "prot_16.nwk"),
                     "-i", os.path.join(DATA, "prot_16.fa"),
                     "-o", out, "--type", "p", "-b", "45",
                     "--backend", "numpy"]) == 0
    with open(out, "rb") as f1, \
            open(os.path.join(GOLDEN, "prot_16.b45.aln"), "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.slow
def test_blosum80_golden(tmp_path):
    out = str(tmp_path / "b80.aln")
    assert cli.main(["-t", os.path.join(DATA, "prot_16.nwk"),
                     "-i", os.path.join(DATA, "prot_16.fa"),
                     "-o", out, "--type", "p", "-b", "80",
                     "--backend", "numpy"]) == 0
    with open(out, "rb") as f1, \
            open(os.path.join(GOLDEN, "prot_16.b80.aln"), "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.slow
def test_no_gappy_removal_golden(tmp_path):
    out = str(tmp_path / "r1.aln")
    assert cli.main(["-t", os.path.join(DATASET, "RNASim.nwk"),
                     "-i", os.path.join(DATASET, "RNASim.fa"),
                     "-o", out, "-r", "1", "--rooted",
                     "--backend", "native"]) == 0
    with open(out, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.rooted.r1.aln"), "rb") as f2:
        assert f1.read() == f2.read()
