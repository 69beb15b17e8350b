"""Cross-level dependency scheduling (TWILIGHT_CROSS_LEVEL=1).

Replaces the reference's per-level barrier (progressive.cpp:174-192) with
a ready-frontier loop (pipeline/progressive.py
progressive_alignment_crosslevel). The output contract is byte
identity with the barrier scheduler on every config, including the
order-sensitive deferred-realign path (fallback list order + the node
state swaps of alignment-helper.cpp:541-591, materialized in global
commit order).

Byte parity was additionally verified offline at 2k scale: sim2k
--length-deviation 0.02 (deferral-heavy) and RNASim default/-m 200 are
md5-equal with the flag on and off (-C 4 pooled).
"""
import os
import subprocess
import sys

from twilight_tpu import cli

from conftest import DATASET, GOLDEN, REPO


def _run(args, env=None):
    e = dict(os.environ)
    e.update(env or {})
    r = subprocess.run([sys.executable, "-m", "twilight_tpu"] + args,
                       cwd=REPO, env=e, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-800:]


def test_crosslevel_matches_golden(tmp_path):
    out = str(tmp_path / "xl.aln")
    _run(["-t", os.path.join(DATASET, "RNASim.nwk"),
          "-i", os.path.join(DATASET, "RNASim.fa"),
          "-o", out, "--backend", "native", "-C", "4"],
         env={"TWILIGHT_CROSS_LEVEL": "1"})
    with open(out, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.aln"), "rb") as f2:
        assert f1.read() == f2.read()


def test_crosslevel_deferred_parity(tmp_path):
    """Deferral-heavy config: the fallback path is the order-sensitive
    part of cross-level scheduling (it swaps node state and feeds the
    reference's unstable sort)."""
    prefix = str(tmp_path / "s")
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.tools.simulate",
         "-n", "300", "-l", "400", "--seed", "11", "-o", prefix],
        cwd=REPO, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    base = str(tmp_path / "base.aln")
    xl = str(tmp_path / "xl.aln")
    args = ["-t", prefix + ".nwk", "-i", prefix + ".fa",
            "--length-deviation", "0.02", "--backend", "native", "-C", "4"]
    _run(args + ["-o", base])
    _run(args + ["-o", xl], env={"TWILIGHT_CROSS_LEVEL": "1"})
    with open(base, "rb") as f1, open(xl, "rb") as f2:
        assert f1.read() == f2.read()


def test_crosslevel_mesh_e2e(tmp_path, monkeypatch):
    """Cross-level scheduling through the 8-device sharded batcher
    (mixed-level device batches) == oracle bytes."""
    import jax
    assert len(jax.devices()) == 8
    prefix = str(tmp_path / "mini")
    r = subprocess.run(
        [sys.executable, "-m", "twilight_tpu.tools.simulate",
         "-n", "24", "-l", "120", "--seed", "7", "-o", prefix],
        cwd=REPO, capture_output=True)
    assert r.returncode == 0
    ref_out = str(tmp_path / "ref.aln")
    mesh_out = str(tmp_path / "mesh.aln")
    rc = cli.main(["-t", prefix + ".nwk", "-i", prefix + ".fa",
                   "-o", ref_out, "--rooted", "--backend", "numpy"])
    assert rc == 0
    monkeypatch.setenv("TWILIGHT_FORCE_DEVICE", "1")
    monkeypatch.setenv("TWILIGHT_NO_STEAL", "1")
    monkeypatch.setenv("TWILIGHT_CROSS_LEVEL", "1")
    rc = cli.main(["-t", prefix + ".nwk", "-i", prefix + ".fa",
                   "-o", mesh_out, "--rooted", "--backend", "cpu",
                   "--pair-batch", "8"])
    assert rc == 0
    with open(ref_out, "rb") as f1, open(mesh_out, "rb") as f2:
        assert f1.read() == f2.read()
