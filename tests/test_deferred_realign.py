"""Deferred-realign (fallback) path at scale.

With --length-deviation 0.02 on the 2000-sequence simulated dataset, 706
sequences are low-quality and deferred to the task-1 realign pass — this
exercises fallback_to_deferred, the reference's unstable std::sort order
(helpers.sort_fallback via native std::sort) and the one-pair-per-level
realign schedule. The md5 is pinned to the canonical reference build's
output (verified byte-identical on native and tpu backends)."""
import hashlib
import os

import pytest

from twilight_tpu import cli
from twilight_tpu.tools.simulate import simulate

REF_MD5 = "224c800d696d24cac399a1630747c39a"


@pytest.mark.slow
def test_deferred_realign_2k(tmp_path):
    names, seqs, nwk = simulate(2000, 1000, seed=0)
    fa = str(tmp_path / "s.fa")
    tre = str(tmp_path / "s.nwk")
    with open(fa, "w") as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")
    with open(tre, "w") as f:
        f.write(nwk + "\n")
    out = str(tmp_path / "out.aln")
    rc = cli.main(["-t", tre, "-i", fa, "-o", out, "--rooted",
                   "--length-deviation", "0.02", "--backend", "native"])
    assert rc == 0
    with open(out, "rb") as f:
        assert hashlib.md5(f.read()).hexdigest() == REF_MD5


@pytest.mark.slow
def test_deferred_realign_2k_pooled(tmp_path, monkeypatch):
    """Same config under -C 4: the pooled DP must not perturb the
    fallback-detection order that feeds the pinned unstable-sort."""
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    names, seqs, nwk = simulate(2000, 1000, seed=0)
    fa = str(tmp_path / "s.fa")
    tre = str(tmp_path / "s.nwk")
    with open(fa, "w") as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")
    with open(tre, "w") as f:
        f.write(nwk + "\n")
    out = str(tmp_path / "out.aln")
    rc = cli.main(["-t", tre, "-i", fa, "-o", out, "--rooted",
                   "--length-deviation", "0.02", "--backend", "native",
                   "-C", "4"])
    assert rc == 0
    with open(out, "rb") as f:
        assert hashlib.md5(f.read()).hexdigest() == REF_MD5
