"""Checkpoint/resume of divide-and-conquer subtree state (--resume).

The reference's temp files are only a de-facto restart point (SURVEY §5);
here each finished subtree persists its merge-phase state and --resume
skips it, producing byte-identical output.
"""
import os

from twilight_tpu import cli

from conftest import DATASET, GOLDEN


def test_resume_skips_finished_subtrees(tmp_path, capfd):
    out1 = str(tmp_path / "a.aln")
    temp = str(tmp_path / "ck")
    args = ["-t", os.path.join(DATASET, "RNASim.nwk"),
            "-i", os.path.join(DATASET, "RNASim.fa"),
            "-m", "200", "-d", temp, "-k", "--backend", "native"]
    assert cli.main(args + ["-o", out1]) == 0
    with open(out1, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()
    states = [f for f in os.listdir(temp) if f.endswith(".state.npz")]
    assert len(states) == 4

    out2 = str(tmp_path / "b.aln")
    assert cli.main(args + ["-o", out2, "--resume", "--overwrite"]) == 0
    err = capfd.readouterr().err
    assert err.count("Resumed subtree") == 4
    with open(out2, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()


def test_resume_after_merge_crash(tmp_path, capfd, monkeypatch):
    """A crash during the transitivity-expansion phase must stay
    resumable: under --resume the expanded subalignments are kept (they
    double as checkpoint payload), so the rerun loads every subtree from
    its checkpoint instead of realigning, and the output is still
    byte-identical."""
    import pytest

    from twilight_tpu.seqio import writer as writer_mod

    temp = str(tmp_path / "ck")
    out = str(tmp_path / "crash.aln")
    # no -k: delete_temp is on, the pre-fix behavior removed each
    # expanded subalignment and broke checkpoint loading after a crash
    args = ["-t", os.path.join(DATASET, "RNASim.nwk"),
            "-i", os.path.join(DATASET, "RNASim.fa"),
            "-m", "200", "-d", temp, "--backend", "native",
            "--resume", "-o", out]

    real = writer_mod.update_and_write_alignment
    calls = {"n": 0}

    def crashing(database, option, file_name, subtree_idx):
        total = real(database, option, file_name, subtree_idx)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected merge-phase crash")
        return total

    monkeypatch.setattr(writer_mod, "update_and_write_alignment", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        cli.main(args)
    monkeypatch.setattr(writer_mod, "update_and_write_alignment", real)
    capfd.readouterr()

    # sources of already-expanded subtrees must still exist
    subs = [f for f in os.listdir(temp) if ".subalignment.aln" in f
            and ".final" not in f]
    assert len(subs) == 4, subs

    assert cli.main(args + ["--overwrite"]) == 0
    err = capfd.readouterr().err
    assert err.count("Resumed subtree") == 4, err
    with open(out, "rb") as f1, \
            open(os.path.join(GOLDEN, "RNASim.m200.aln"), "rb") as f2:
        assert f1.read() == f2.read()
